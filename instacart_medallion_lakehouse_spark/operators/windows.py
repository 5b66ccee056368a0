"""Window operators: sequence ranks, lag, sessionization.

Reference parity (SURVEY.md §2.5):
- W2 sequence rank — notebooks/03_gold_metrics.py:298-306 (purchase rank
  per (user, product) by order_number)
- W3 lag with default — 03_gold_metrics.py:303
- W4 count-over-partition — utils/quality.py:74-76

Scale note: every ``Window.partitionBy`` is a full-row shuffle on the
partition keys. Rank/lag windows here partition on composite keys with
high cardinality ((custkey, partkey), (user_id)) so partitions stay small;
never window-partition on a low-cardinality column at scale — use
groupBy aggregation instead (see quality.check_duplicate_rate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sequence_rank(
    df: DataFrame,
    partition_by: list[str],
    order_by: list[Column | str],
    rank_col: str = "sequence_rank",
) -> DataFrame:
    """W2: 1-based rank of each row within its partition under order_by.

    The order_by MUST be a deterministic total order within each partition
    (SURVEY.md §4.3.1) — callers pass a unique tie-breaker column.
    """
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(rank_col, F.row_number().over(w))


def lag_with_default(
    df: DataFrame,
    col: str,
    partition_by: list[str],
    order_by: list[Column | str],
    default: object = 0,
    out_col: str | None = None,
) -> DataFrame:
    """W3: ``lag(col, 1, default)`` over the same window shape as W2."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(out_col or f"prev_{col}", F.lag(col, 1, default).over(w))


def global_row_number(
    df: DataFrame,
    order_by: list[Column | str],
    rank_col: str = "_grank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed global row_number: two-pass range-partitioned rank
    instead of a single-partition ``Window.orderBy``.

    A partitionless window funnels the whole input through ONE task —
    the classic global-sort straggler at scale. This operator gets the
    identical result distributed:

      1. range-partition by the order keys (ascending partition ids hold
         ascending key ranges — a sampling pass + one range exchange,
         exactly what a global sort does anyway);
      2. per-partition local row_number, partitioned on
         ``spark_partition_id()`` so no further shuffle;
      3. per-partition row counts (numPartitions rows — driver-scale)
         → exclusive prefix sums via a broadcast inequality self-join
         (O(p²) pairs of the p-row count table; NO single-partition
         stage anywhere) → broadcast back as offsets;
         global rank = local rank + partition offset.

    ``order_by`` must be a deterministic TOTAL order (pass a unique
    tie-break column) — the same contract as every rank in this module.
    Ascending order only; wrap descending needs as ascending on a
    negated/complemented key.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    part = (
        df.repartitionByRange(num_partitions, *cols)
        if num_partitions
        else df.repartitionByRange(*cols)
    )
    local = part.withColumn("_pid", F.spark_partition_id()).withColumn(
        "_lrn",
        F.row_number().over(Window.partitionBy("_pid").orderBy(*cols)),
    )
    counts = local.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt"))
    prior = counts.select(
        F.col("_pid").alias("_ppid"), F.col("_cnt").alias("_pcnt")
    )
    offsets = (
        counts.join(
            F.broadcast(prior), F.col("_ppid") < F.col("_pid"), "left"
        )
        .groupBy("_pid")
        .agg(F.coalesce(F.sum("_pcnt"), F.lit(0)).alias("_off"))
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(rank_col, F.col("_lrn") + F.col("_off"))
        .drop("_pid", "_lrn", "_off")
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Batch gaps-and-islands sessionization over an event stream.

    New session when the gap to the previous event of the same user
    exceeds ``gap_minutes``; session_id = running count of session starts.
    Two stacked windows over the SAME (partition, order) → one shuffle,
    one sort, both computed in a single window physical operator.

    This is the batch twin of Structured Streaming session windows
    (``F.session_window`` — see streaming/events.py); the batch form is
    DuckDB-oracle-checkable, the streaming form is rows-only.
    """
    ts = F.col(ts_col)
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_sec = F.unix_timestamp(ts) - F.unix_timestamp(F.lag(ts_col, 1).over(w))
    is_new = F.when(
        gap_sec.isNull() | (gap_sec > gap_minutes * 60), 1
    ).otherwise(0)
    running = Window.partitionBy(user_col).orderBy(ts_col, "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("_new_session", is_new).withColumn(
        "session_seq", F.sum("_new_session").over(running)
    ).drop("_new_session")
