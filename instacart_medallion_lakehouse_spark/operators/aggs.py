"""Aggregation operators: rollups, conditional shares, pct-of-total.

Reference parity (SURVEY.md §2.4 A1-A9). All aggregation is hash
aggregation via ``groupBy().agg()`` — Catalyst plans partial (map-side)
+ final HashAggregate automatically, so shuffles move partial states,
not rows.

Scale notes:
- ``pct_of_total`` keeps the grand total IN-PLAN via an empty-partition
  window instead of the reference's collect-then-literal pattern
  (03_gold_metrics.py:242,266 pulls a count to the driver and re-embeds
  it) — no extra driver round-trip, one plan, works under AQE. The
  single-partition window runs over the already-aggregated (tiny) group
  table, not the fact table, so it is safe.
- exact ``countDistinct`` shuffles per distinct value; every rollup here
  also exposes an ``approx=`` switch that swaps in HyperLogLog++
  (``approx_count_distinct``) for the 100 TB path (SURVEY.md §7.4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import dround


def count_distinct(col: str, approx: bool = False, rsd: float = 0.01) -> Column:
    """Exact or HLL++ distinct count — the scale switch for A4."""
    return F.approx_count_distinct(col, rsd) if approx else F.countDistinct(col)


def conditional_share(cond: Column, digits: int = 4) -> Column:
    """A5: share of rows satisfying ``cond`` = avg(when(cond,1).otherwise(0))."""
    return dround(F.avg(F.when(cond, 1.0).otherwise(0.0)), digits)


def pct_of_total(count_col: Column, digits: int = 4) -> Column:
    """A6: group count as a percentage of the grand total, in-plan.

    ``sum(count) over ()`` over the post-aggregation result (tiny) —
    replaces the reference's driver-side scalar collect.
    """
    total = F.sum(count_col).over(Window.partitionBy())
    return dround(100.0 * count_col / total, digits)


def avg_fixedpoint(col: Column, scale: int, digits: int) -> Column:
    """Order-independent average of discrete-valued doubles.

    Quantizes each value to an integer at ``scale`` (exact, deterministic),
    sums as LONG (exact — no FP accumulation-order noise), divides by the
    non-null count, rescales, and drounds. Needed because a plain
    ``avg(double)`` sums in engine-specific order: when the true mean sits
    exactly on a decimal rounding midpoint (common for 2-dp-discrete
    columns like discounts), a 1-ulp order difference flips the rounded
    digit between Spark and the DuckDB oracle. The identical formula in
    SQL: ``round(sum(CAST(floor(x*S + 0.5) AS BIGINT)) * 1.0
    / count(x) / S, d)``.
    """
    s = float(scale)
    quantized = F.floor(col * F.lit(s) + F.lit(0.5)).cast("long")
    return dround(F.sum(quantized) / F.count(col) / F.lit(s), digits)


def rollup_orders(lineitem: DataFrame) -> DataFrame:
    """A1: per-order rollup (reference order_stats, 03_gold_metrics.py:111-122).

    basket_size = count(*), return_items = sum(flag),
    order_return_rate = return_items / nullif(basket_size, 0).

    ``return_rate_e8`` is the same rate as an exact fixed-point integer
    (1e8 scale, floor division) — downstream averages of per-order rates
    use it so the outer sum is exact integer arithmetic (see
    avg_fixedpoint rationale).
    """
    is_return = F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
    return lineitem.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("basket_size"),
        F.sum(is_return).alias("return_items"),
        (
            F.sum(is_return).cast("double")
            / F.nullif(F.count(F.lit(1)), F.lit(0)).cast("double")
        ).alias("order_return_rate"),
        F.expr(
            "CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)"
            " * 100000000L div count(*)"
        ).alias("return_rate_e8"),
    )
