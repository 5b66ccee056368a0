"""Silver-layer cleansing operators: deterministic dedup + enrichment.

Reference parity (SURVEY.md §2.5 W1, §2.8 F4):
- dedup keep-first — reference notebooks/02_silver_transform.py:50-56 (single
  PK) and :110-116 (composite PK). The reference orders duplicate groups by
  ``monotonically_increasing_id()``, a NONDETERMINISTIC tie-break that
  depends on partition layout (SURVEY.md §4.3.1). We require explicit
  ordering columns so the survivor is stable across runs and cluster sizes
  — mandatory for oracle-checked results and for idempotent re-runs at
  100 TB.
- case-chain enrichment — 02_silver_transform.py:71-85 (day name, time
  bucket, is_first_order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dedup_keep_first(
    df: DataFrame,
    keys: list[str],
    order_by: list[Column | str],
) -> DataFrame:
    """Keep exactly one row per key group — the first under ``order_by``.

    W1: ``row_number() over (partition by keys order by order_by)`` then
    keep rank 1. One shuffle on the key columns; at scale prefer keys with
    decent cardinality (the window partitions by the dedup key, so key
    skew = task skew; AQE skew-join handling does not apply to windows, so
    a pathological hot key should be pre-salted by the caller).
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def hour_bucket(hour: Column) -> Column:
    """4-way time-of-day bucket (reference 02_silver_transform.py:80-83)."""
    return (
        F.when(hour.between(5, 11), "morning")
        .when(hour.between(12, 16), "afternoon")
        .when(hour.between(17, 20), "evening")
        .otherwise("night")
    )


# ISO day-of-week (1=Monday .. 7=Sunday) -> name. Using an explicit 7-way
# case chain (reference's pattern, 02_silver_transform.py:73-79) rather than
# locale-dependent date_format names.
_DAY_NAMES = [
    (1, "Monday"),
    (2, "Tuesday"),
    (3, "Wednesday"),
    (4, "Thursday"),
    (5, "Friday"),
    (6, "Saturday"),
    (7, "Sunday"),
]


def day_name(iso_dow: Column) -> Column:
    """7-way day-name case chain over an ISO day-of-week column."""
    expr = F.when(iso_dow == _DAY_NAMES[0][0], _DAY_NAMES[0][1])
    for num, name in _DAY_NAMES[1:]:
        expr = expr.when(iso_dow == num, name)
    return expr.otherwise("unknown")


def enrich_events_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Derive hour / time-bucket / day-name columns from a timestamp.

    Transposition of the reference's order enrichment (02:71-85) onto the
    events table: pure narrow projection, no shuffle, stays entirely inside
    whole-stage codegen.
    """
    ts = F.col(ts_col)
    iso_dow = F.dayofweek(ts)  # Spark: 1=Sunday..7=Saturday
    # convert to ISO 1=Monday..7=Sunday
    iso = F.when(iso_dow == 1, 7).otherwise(iso_dow - 1)
    return df.withColumns(
        {
            "event_hour": F.hour(ts),
            "event_time_bucket": hour_bucket(F.hour(ts)),
            "event_day_name": day_name(iso),
        }
    )
