"""Spark-SQL API surface — the engine's second front door.

The reference deliberately ships every gold mart twice: DataFrame
algebra (notebooks/03_gold_metrics.py) and SQL text over temp views +
CTAS (notebooks/03_gold_metrics_serverless.py:57-64,78-118). This
module is that dual surface for our engine: register the star schema as
temp views (S6), run any mart as a SQL string, and persist with
CREATE OR REPLACE TABLE ... AS (S5) into the session catalog.

Both faces compile to the same Catalyst plans — parity between them is
asserted in tests (test_sql_api.py), and the SQL face of the flagship
mart is an oracle-checked queries() entry (region_performance_sql).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .io import STAR_TABLES, read_events


def register_star_views(spark: SparkSession, sf_dir: str) -> None:
    """S6: expose every testdata table to SQL as temp views
    (reference 03_gold_metrics_serverless.py:57-64)."""
    for name in STAR_TABLES:
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(name)
    read_events(spark, sf_dir).createOrReplaceTempView("events")


# session -> sf_dir whose views are currently registered. Weak keys: a
# stopped SparkSession must not be pinned alive by this cache.
from weakref import WeakKeyDictionary  # noqa: E402

_VIEWS_REGISTERED: "WeakKeyDictionary[SparkSession, str]" = WeakKeyDictionary()


def ensure_star_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the star views once per (session, sf_dir) — view setup
    belongs in session setup, not in a query's hot path. Re-registers
    when the sf_dir changes OR when any star view has been dropped
    since (the cache alone can't see catalog mutations made by other
    code in a long-lived session). The existence probe is per-call,
    cheap, and catalog-only; a view SHADOWED by foreign
    createOrReplaceTempView under the same name is indistinguishable
    from our own registration — callers owning exotic catalogs should
    call register_star_views explicitly."""
    if _VIEWS_REGISTERED.get(spark) == sf_dir and all(
        spark.catalog.tableExists(t) for t in [*STAR_TABLES, "events"]
    ):
        return
    register_star_views(spark, sf_dir)
    _VIEWS_REGISTERED[spark] = sf_dir


# Flagship KPI mart as Spark SQL text — semantically identical to
# plans/marts.region_performance (the DataFrame face). Rounding uses the
# explicit floor(x*10^d + 0.5)/10^d formula everywhere, matching
# functions.scalar.dround, so all three faces (DataFrame, Spark SQL,
# DuckDB oracle) hash-agree.
REGION_PERFORMANCE_SQL = """
WITH agg AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         count(*) AS total_line_items,
         count(DISTINCT l.l_orderkey) AS unique_orders,
         count(DISTINCT o.o_custkey) AS unique_customers,
         count(DISTINCT l.l_partkey) AS unique_parts,
         CAST(floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 100.0 + 0.5)
              / 100.0 AS DOUBLE) AS revenue,
         CAST(floor(avg(l.l_quantity) * 100.0 + 0.5) / 100.0 AS DOUBLE)
           AS avg_quantity,
         -- 1.0D: Spark SQL parses a bare 1.0 as DECIMAL(2,1), and a
         -- decimal average rounds differently from the double average
         -- the DataFrame face (and DuckDB) compute
         CAST(floor(avg(CASE WHEN l.l_returnflag = 'R' THEN 1.0D ELSE 0.0D END)
              * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS return_share,
         CAST(floor(avg(CASE WHEN l.l_discount >= 0.05 THEN 1.0D ELSE 0.0D END)
              * 10000.0 + 0.5) / 10000.0 AS DOUBLE) AS promo_share
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY r.r_name, n.n_name
)
-- 100.0D/10000.0D: bare decimal literals against the BIGINT counts
-- would make this window compute in DECIMAL(38,14) — exactly 1.5 at
-- rounding midpoints where the double faces (DataFrame + DuckDB) see
-- 1.4999999999999998 — diverging the three-face hash at scale
SELECT *, CAST(floor(100.0D * total_line_items
               / sum(total_line_items) OVER () * 10000.0D + 0.5) / 10000.0D
               AS DOUBLE) AS pct_of_total_items
FROM agg
"""


def run_sql(spark: SparkSession, sql: str) -> DataFrame:
    """Entry point 3 of the reference lifecycle: SQL text → Catalyst
    parse/analyze/optimize → same physical plans as the DataFrame face."""
    return spark.sql(sql)


def create_table_as(
    spark: SparkSession, table: str, select_sql: str, replace: bool = True
) -> DataFrame:
    """S5: CTAS into the session catalog (reference serverless CTAS,
    03_gold_metrics_serverless.py:78-118).

    Uses the default (parquet) provider under spark.sql.warehouse.dir.
    The built-in v1 session catalog doesn't implement atomic
    REPLACE TABLE AS SELECT (that needs a v2 catalog — Unity/Delta,
    where the reference's literal ``CREATE OR REPLACE TABLE`` works
    unchanged), so replacement degrades to DROP + CTAS here; the
    statement SHAPE and idempotent re-run semantics are identical.
    """
    if replace:
        # resolve the table's REAL managed location from the catalog
        # before dropping — string-building it from the warehouse dir
        # ignores the database qualifier (warehouse/<db>.db/<tbl>) and
        # the catalog's lower-casing, which could delete an unrelated
        # same-named table's files or miss the stale location entirely
        location = None
        try:
            location = next(
                r["data_type"]
                for r in spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
                if r["col_name"] == "Location"
            )
        except Exception:
            # table absent: derive the default managed location the
            # catalog WOULD use, so a stale orphan dir from a crashed
            # earlier CTAS (metadata gone, files left) still gets purged
            parts = [p.strip("`").lower() for p in table.split(".")]
            name = parts[-1]
            db = parts[-2] if len(parts) > 1 else spark.catalog.currentDatabase()
            warehouse = spark.conf.get("spark.sql.warehouse.dir")
            base = warehouse if db == "default" else f"{warehouse}/{db}.db"
            location = f"{base}/{name}"
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        # the default in-memory catalog drops METADATA only; purge the
        # managed location too or the re-create hits LOCATION_ALREADY_EXISTS
        jvm = spark.sparkContext._jvm
        path = jvm.org.apache.hadoop.fs.Path(location)
        fs = path.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        fs.delete(path, True)
    spark.sql(f"CREATE TABLE {table} USING parquet AS {select_sql}")
    return spark.table(table)
