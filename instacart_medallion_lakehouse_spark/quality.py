"""Data-quality gates — the reference's distinctive API surface.

Same contract as reference utils/quality.py (SURVEY.md §2.11): driver-side
Python functions that take DataFrames, compose *built-in* operators, and
raise ``DataQualityError`` on breach. Zero row-level Python UDFs.

Scale-first deviations from the reference implementation (same semantics,
better plans at 100 TB):
- ``check_null_rate`` uses ONE conditional aggregation pass instead of two
  full scans (reference utils/quality.py:28-62 runs ``df.count()`` and a
  second ``filter(isNull).count()``).
- ``check_duplicate_rate`` uses ``groupBy(pk).count()`` with map-side
  partial aggregation instead of a count-over-partition window
  (reference utils/quality.py:74-79) — a window shuffles every full row,
  the groupBy shuffles only (key, partial-count) pairs.
- composite keys are supported directly (the reference dedups composite
  keys but gates only single columns).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .logging_util import get_logger

logger = get_logger("quality")


class DataQualityError(Exception):
    """Raised when a quality gate breaches its threshold.

    Exception propagation is the pipeline's halt mechanism (reference
    utils/quality.py:21-23, README.md:78).
    """


@dataclass(frozen=True)
class GateThresholds:
    """Centralized thresholds (reference configs/pipeline_config.yml:12-25).

    The file form lives in ``configs/pipeline_config.yml`` (the ops
    surface: change a threshold without touching code); these defaults
    mirror it for config-less library use.
    """

    null_rate_default: float = 0.001  # 0.1%
    null_rate_days_since_prior: float = 0.07  # 7% — nulls valid for first orders
    duplicate_rate: float = 0.0
    # Inverted lenient gate for tables with NO unique natural key (the
    # reference runs lineitem-style tables through threshold=0.99,
    # 02_silver_transform.py:121): duplication is normal, but a table
    # that is ~entirely duplicate groups signals an upstream fan-out bug.
    duplicate_rate_lenient: float = 0.99
    reconcile_drift: float = 0.001  # 0.1%
    referential_integrity: float = 0.0

    @classmethod
    def from_yaml(cls, path: str) -> "GateThresholds":
        """Load thresholds from a pipeline_config.yml (reference
        configs/pipeline_config.yml:12-25 shape: a ``quality_thresholds``
        mapping). Unknown keys fail fast — a typo'd threshold name must
        not silently fall back to a default."""
        import yaml

        with open(path) as f:
            cfg = yaml.safe_load(f) or {}
        # `or {}` also covers a PRESENT-but-empty section (YAML null):
        # every threshold commented out must mean "all defaults", not a
        # TypeError from iterating None
        section = cfg.get("quality_thresholds") or {}
        known = set(cls.__dataclass_fields__)
        unknown = set(section) - known
        if unknown:
            raise ValueError(
                f"unknown quality_thresholds keys in {path}: {sorted(unknown)}"
            )
        return cls(**{k: float(v) for k, v in section.items()})


DEFAULT_THRESHOLDS = GateThresholds()


def load_pipeline_config(path: str) -> dict:
    """Full parsed pipeline_config.yml (paths/spark/tables sections)."""
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


def check_null_rate(
    df: DataFrame, column: str, threshold: float, layer: str = ""
) -> float:
    """null_rate = nulls/total (0 if total=0), rounded to 6 dp; raise if > threshold.

    Semantics: reference utils/quality.py:28-62. Single aggregation job.
    """
    row = df.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col(column).isNull(), 1).otherwise(0)).alias("nulls"),
    ).collect()[0]
    total, nulls = row["total"], row["nulls"] or 0
    rate = round(nulls / total, 6) if total else 0.0
    if rate > threshold:
        raise DataQualityError(
            f"[{layer}] null rate {rate:.6f} on '{column}' exceeds threshold {threshold}"
        )
    logger.info("NULL_RATE_OK layer=%s column=%s rate=%.6f", layer, column, rate)
    return rate


def check_duplicate_rate(
    df: DataFrame, columns: str | list[str], threshold: float, layer: str = ""
) -> float:
    """Fraction of rows belonging to any key-group of size > 1.

    Counts ALL members of duplicate groups, not just the extras — the
    reference's exact definition (utils/quality.py:65-94).
    """
    cols = [columns] if isinstance(columns, str) else list(columns)
    total = df.count()
    if total == 0:
        return 0.0
    dup_rows = (
        df.groupBy(*cols)
        .agg(F.count(F.lit(1)).alias("_grp_n"))
        .filter(F.col("_grp_n") > 1)
        .agg(F.coalesce(F.sum("_grp_n"), F.lit(0)).alias("dups"))
        .collect()[0]["dups"]
    )
    rate = round(dup_rows / total, 6)
    if rate > threshold:
        raise DataQualityError(
            f"[{layer}] duplicate rate {rate:.6f} on {cols} exceeds threshold {threshold}"
        )
    logger.info("DUPLICATE_RATE_OK layer=%s columns=%s rate=%.6f", layer, cols, rate)
    return rate


def check_referential_integrity(
    child: DataFrame,
    fk: str,
    parent: DataFrame,
    pk: str,
    layer: str = "",
    threshold: float = 0.0,
) -> float:
    """orphan_rate over non-null FK rows; default zero tolerance.

    Semantics: reference utils/quality.py:97-130. The left_anti join
    broadcasts when the parent key set is small; at 100 TB project the
    parent to its key column FIRST (done here) so only keys shuffle.
    """
    non_null = child.filter(F.col(fk).isNotNull())
    total = non_null.count()
    if total == 0:
        return 0.0
    orphans = non_null.join(
        parent.select(F.col(pk).alias("__pk")).distinct(),
        on=F.col(fk) == F.col("__pk"),
        how="left_anti",
    ).count()
    rate = round(orphans / total, 6)
    if rate > threshold:
        raise DataQualityError(
            f"[{layer}] orphan rate {rate:.6f} ({orphans}/{total}) on '{fk}' "
            f"exceeds threshold {threshold}"
        )
    logger.info("RI_OK layer=%s fk=%s rate=%.6f", layer, fk, rate)
    return rate


def reconcile_row_counts(
    source_count: int, target_count: int, threshold: float, table: str = ""
) -> float:
    """drift = |target - source| / source (0 if source = 0).

    Catches both row loss and row explosion (reference utils/quality.py:133-160).
    Pure Python over two already-materialized counts.
    """
    if source_count == 0:
        if target_count != 0:
            raise DataQualityError(
                f"[{table}] source has 0 rows but target has {target_count}"
            )
        return 0.0
    drift = abs(target_count - source_count) / source_count
    if drift > threshold:
        raise DataQualityError(
            f"[{table}] row-count drift {drift:.6f} "
            f"({source_count}->{target_count}) exceeds threshold {threshold}"
        )
    logger.info("RECONCILE_OK table=%s drift=%.6f", table, drift)
    return drift


def assert_row_count_nonzero(count: int, table: str = "") -> None:
    """Raise on 0 rows — empty-source detection (utils/quality.py:163-170)."""
    if count == 0:
        raise DataQualityError(f"[{table}] has 0 rows")


def log_layer_stats(layer: str, table: str, rows: int) -> None:
    """Structured LAYER_COMPLETE line (utils/quality.py:173-178)."""
    logger.info("LAYER_COMPLETE layer=%s table=%s rows=%d", layer, table, rows)


def write_with_observed_gates(
    df: DataFrame,
    path: str,
    null_rate_columns: dict[str, float] | None = None,
    require_nonzero: bool = True,
    layer: str = "",
    mode: str = "overwrite",
) -> dict:
    """Write ``df`` to parquet with the quality gates evaluated as
    OBSERVATIONS of the write job itself — `df.observe` attaches the
    gate aggregates to the write's own pass over the data, so the
    null-rate and non-empty checks cost ZERO extra scans/jobs.

    The separate-job gates above (check_null_rate etc., the reference's
    utils/quality.py shape) re-scan the table once per gate; at 100 TB
    that doubles (or worse) the ingest cost. This is the production
    form: one pass writes AND measures, and the gates are enforced from
    the observed metrics after the action completes. Failing a gate
    raises AFTER the write (the data landed but is not promoted —
    callers pair this with the versioned store so the manifest publish
    is the gate-conditional commit point).

    Returns the observed metrics dict:
    ``{"n_rows": int, "nulls_<col>": int, "null_rate_<col>": float}``.
    """
    from pyspark.sql import Observation

    null_rate_columns = null_rate_columns or {}
    obs = Observation(f"gates_{layer or 'table'}")
    metrics_exprs = [F.count(F.lit(1)).alias("n_rows")]
    for col in null_rate_columns:
        metrics_exprs.append(
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(
                f"nulls_{col}"
            )
        )
    observed = df.observe(obs, *metrics_exprs)
    observed.write.mode(mode).parquet(path)

    got = dict(obs.get)
    n_rows = got.get("n_rows", 0)
    out: dict = {"n_rows": n_rows}
    if require_nonzero and n_rows == 0:
        raise DataQualityError(f"[{layer}] observed write produced 0 rows")
    for col, threshold in null_rate_columns.items():
        nulls = got.get(f"nulls_{col}") or 0
        rate = round(nulls / n_rows, 6) if n_rows else 0.0
        out[f"nulls_{col}"] = nulls
        out[f"null_rate_{col}"] = rate
        if rate > threshold:
            raise DataQualityError(
                f"[{layer}] observed null rate {rate:.6f} on '{col}' "
                f"exceeds threshold {threshold}"
            )
    return out
