"""Medallion pipeline orchestration: bronze → silver → gold.

The reference's three notebooks as one idempotent, quality-gated
library function (01_bronze_ingest.py / 02_silver_transform.py /
03_gold_metrics.py re-expressed over the testdata star schema).

Layer contract (reference parity, SURVEY.md §1.1/§3):
- Bronze: raw scan + lineage metadata columns (_ingested_at,
  _source_file, _bronze_version — 01_bronze_ingest.py:89-93), non-zero
  row gate, idempotent overwrite.
- Silver: deterministic PK dedup (the reference's nondeterministic
  monotonically_increasing_id tie-break FIXED per SURVEY.md §4.3.1),
  bronze-metadata drop, quality gates (null rate / duplicate rate /
  referential integrity), reconciliation against bronze counts.
- Gold: star-join marts (fct + dims + KPI marts), fact table
  disk-partitioned for downstream partition pruning
  (03_gold_metrics.py:96).

Every write is mode=overwrite (+ overwriteSchema under Delta): the
whole pipeline re-runs from any point with identical results —
exactly the reference's re-runnability contract (01:95-102).

Scale notes: each layer is a separate job chain; silver dedup is the
only full-fact shuffle (window on the PK); gold reuses one cached
enriched base across all marts (reference 03:42-44,73 does the same).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import quality
from .io import read_table, write_table
from .operators.cleanse import dedup_keep_first
from .plans import marts

BRONZE_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
]

# (table → primary key columns). lineitem is None: the synthetic data has
# NO unique natural key there (even (l_orderkey, l_partkey, l_linenumber)
# repeats), mirroring the reference's line-item table where multiple rows
# per key are normal — it gets the inverted lenient duplicate gate
# (reference 02_silver_transform.py:121 uses threshold=0.99) instead of
# dedup.
_SILVER_KEYS: dict[str, list[str] | None] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": None,
}

# Keyless tables still get the lenient inverted duplicate gate on their
# densest natural key: duplication is expected, but a near-totally
# duplicated table (rate > duplicate_rate_lenient) means an upstream
# fan-out bug, not normal line-item multiplicity.
_LENIENT_DUP_KEYS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_partkey", "l_linenumber"],
}

# Null-rate gates enforced at silver, observed on the write pass itself
# (zero extra scans). PK/FK columns must never be null in healthy data;
# threshold is GateThresholds.null_rate_default. (The reference's
# days_since_prior-style lenient threshold applies to genuinely-nullable
# business columns — the star schema has none, so only the default-rate
# gate is wired here; from_yaml still validates both keys.)
_NULL_GATE_COLS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey", "n_regionkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey"],
}

# FK → parent PK edges gated at silver (reference 02_silver_transform.py:59-68)
_RI_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]

BRONZE_VERSION = "bronze_v1"


@dataclass
class PipelineResult:
    """Per-layer row counts + gate outcomes for reconciliation/reporting."""

    bronze_counts: dict[str, int] = field(default_factory=dict)
    silver_counts: dict[str, int] = field(default_factory=dict)
    gold_counts: dict[str, int] = field(default_factory=dict)


def run_bronze(
    spark: SparkSession, sf_dir: str, out_dir: str, result: PipelineResult
) -> dict[str, DataFrame]:
    """Raw → bronze: scan, stamp lineage metadata, gate non-empty, write."""
    out: dict[str, DataFrame] = {}
    for name in BRONZE_TABLES:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet").withColumns(
            {
                "_ingested_at": F.current_timestamp(),
                "_source_file": F.lit(f"{name}.parquet"),
                "_bronze_version": F.lit(BRONZE_VERSION),
            }
        )
        # gate count OBSERVED on the write pass itself — no post-write
        # re-scan job per table (quality.write_with_observed_gates is
        # the general form; here only the non-empty gate applies)
        from pyspark.sql import Observation

        obs = Observation(f"bronze_{name}")
        write_table(
            df.observe(obs, F.count(F.lit(1)).alias("n_rows")),
            f"{out_dir}/bronze/{name}",
        )
        n = int(obs.get["n_rows"])
        quality.assert_row_count_nonzero(n, f"bronze.{name}")
        quality.log_layer_stats("bronze", name, n)
        result.bronze_counts[name] = n
        # read back through the format-aware reader: under Delta an
        # overwrite only logically removes the previous files, so a
        # plain parquet read of the directory would return old+new rows
        # on every re-run
        out[name] = read_table(spark, f"{out_dir}/bronze/{name}")
    return out


def run_silver(
    spark: SparkSession,
    bronze: dict[str, DataFrame],
    out_dir: str,
    result: PipelineResult,
    thresholds: quality.GateThresholds = quality.DEFAULT_THRESHOLDS,
) -> dict[str, DataFrame]:
    """Bronze → silver: deterministic dedup, drop lineage cols, gate, write."""
    out: dict[str, DataFrame] = {}
    for name, keys in _SILVER_KEYS.items():
        df = bronze[name]
        if keys is not None:
            # Tie-break duplicate PK groups by a content hash of the
            # payload columns: _ingested_at is current_timestamp() (one
            # value per run) and the keys are constant within the window
            # partition, so neither totally orders a group — ordering by
            # them alone would make the survivor depend on partition
            # layout when duplicate PKs carry different payloads (the
            # exact nondeterminism SURVEY §4.3.1 exists to prevent).
            # Identical hashes mean identical rows, where any survivor
            # is the same row.
            payload = [
                c
                for c in df.columns
                if c not in keys
                and c not in ("_ingested_at", "_source_file", "_bronze_version")
            ]
            content_hash = F.md5(
                F.concat_ws(
                    "\x1f",
                    *[
                        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
                        for c in payload
                    ],
                )
            )
            df = dedup_keep_first(
                df, keys=keys, order_by=[F.col("_ingested_at"), content_hash]
            )
        cleaned = df.drop("_ingested_at", "_source_file", "_bronze_version")
        from pyspark.sql import Observation

        obs = Observation(f"silver_{name}")
        # null-rate gates ride the same write-pass observation as the
        # row count — zero extra scans per gated column
        null_cols = _NULL_GATE_COLS.get(name, [])
        metrics = [F.count(F.lit(1)).alias("n_rows")] + [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
            for c in null_cols
        ]
        write_table(
            cleaned.observe(obs, *metrics),
            f"{out_dir}/silver/{name}",
        )
        silver_df = read_table(spark, f"{out_dir}/silver/{name}")
        got = dict(obs.get)  # observed on the write pass, no re-scan
        n = int(got["n_rows"])
        for c in null_cols:
            # compare the RAW rate — rounding first would let e.g.
            # 0.0010004 sneak under a 0.001 threshold; the 6-dp form is
            # for the message only (quality.check_null_rate keeps the
            # reference's rounded-compare semantics, utils/quality.py:48;
            # this pipeline gate is ours to make exact)
            rate = (got[f"nulls_{c}"] or 0) / n if n else 0.0
            if rate > thresholds.null_rate_default:
                raise quality.DataQualityError(
                    f"[silver] null rate {rate:.6f} on '{name}.{c}' exceeds "
                    f"threshold {thresholds.null_rate_default}"
                )
        if keys is not None:
            quality.check_duplicate_rate(
                silver_df, keys, thresholds.duplicate_rate, "silver"
            )
        elif name in _LENIENT_DUP_KEYS:
            quality.check_duplicate_rate(
                silver_df,
                _LENIENT_DUP_KEYS[name],
                thresholds.duplicate_rate_lenient,
                "silver",
            )
        quality.reconcile_row_counts(
            result.bronze_counts[name], n, thresholds.reconcile_drift, name
        )
        quality.log_layer_stats("silver", name, n)
        result.silver_counts[name] = n
        out[name] = silver_df

    for child, fk, parent, pk in _RI_EDGES:
        quality.check_referential_integrity(
            out[child], fk, out[parent], pk, "silver", thresholds.referential_integrity
        )
    return out


def run_gold(
    spark: SparkSession,
    silver: dict[str, DataFrame],
    out_dir: str,
    result: PipelineResult,
    versioned_gold: bool = False,
) -> dict[str, DataFrame]:
    """Silver → gold: star marts, fact disk-partitioned, all overwrite.

    ``versioned_gold=True`` commits each mart as a new snapshot version
    (versioned.py manifest protocol) instead of overwriting in place:
    re-runs append to history, readers of the previous version are
    never disturbed mid-write, and any earlier run stays reachable by
    time travel — the Delta semantics the reference gets from
    Databricks (01_bronze_ingest.py:96-102), on plain parquet.
    """
    li = silver["lineitem"].cache()
    orders = silver["orders"].cache()

    gold: dict[str, tuple[DataFrame, list[str] | None]] = {
        "fct_lineitem": (marts.fct_lineitem(li), ["l_returnflag"]),
        "dim_customers": (marts.dim_customers(li, orders), None),
        "dim_parts": (marts.dim_parts(li, orders, silver["part"]), None),
        "mart_region_performance": (
            marts.region_performance(
                li, orders, silver["customer"], silver["nation"], silver["region"]
            ),
            None,
        ),
        "mart_return_velocity": (marts.return_velocity(li, orders), None),
    }
    out: dict[str, DataFrame] = {}
    for name, (df, part_by) in gold.items():
        from pyspark.sql import Observation

        obs = Observation(f"gold_{name}")
        df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
        if versioned_gold:
            from .versioned import read_versioned, write_versioned

            # the non-empty gate runs INSIDE the commit protocol (after
            # the data write, before the manifest publish): a 0-row mart
            # leaves an unpublished orphan and raises — it never becomes
            # the latest readable version
            write_versioned(
                df,
                f"{out_dir}/gold/{name}",
                partition_by=part_by,
                validate=lambda obs=obs, name=name: quality.assert_row_count_nonzero(
                    int(obs.get["n_rows"]), f"gold.{name}"
                ),
            )
            written = read_versioned(spark, f"{out_dir}/gold/{name}")
        else:
            write_table(df, f"{out_dir}/gold/{name}", partition_by=part_by)
            written = read_table(spark, f"{out_dir}/gold/{name}")
        n = int(obs.get["n_rows"])  # observed on the write pass, no re-scan
        quality.assert_row_count_nonzero(n, f"gold.{name}")
        quality.log_layer_stats("gold", name, n)
        result.gold_counts[name] = n
        out[name] = written
    li.unpersist()
    orders.unpersist()
    return out


def run_medallion(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    config_path: str | None = None,
    versioned_gold: bool = False,
) -> PipelineResult:
    """Full bronze→silver→gold run; raises DataQualityError on gate breach.

    ``config_path`` points at a pipeline_config.yml (reference
    configs/pipeline_config.yml shape); omitted → library defaults.
    ``versioned_gold`` snapshots each gold mart through the versioned
    commit protocol (see run_gold).
    """
    thresholds = (
        quality.GateThresholds.from_yaml(config_path)
        if config_path
        else quality.DEFAULT_THRESHOLDS
    )
    result = PipelineResult()
    bronze = run_bronze(spark, sf_dir, out_dir, result)
    silver = run_silver(spark, bronze, out_dir, result, thresholds=thresholds)
    run_gold(spark, silver, out_dir, result, versioned_gold=versioned_gold)
    return result
