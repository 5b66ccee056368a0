"""Gold-layer mart builders, transposed onto the driver testdata schema.

Each function mirrors one reference gold mart (SURVEY.md §7.3 mapping):

| builder              | reference mart          | reference site                 |
|----------------------|-------------------------|--------------------------------|
| fct_lineitem         | fct_orders              | 03_gold_metrics.py:78-100      |
| dim_customers        | dim_users               | 03_gold_metrics.py:104-157     |
| dim_parts            | dim_products            | 03_gold_metrics.py:161-228     |
| region_performance   | mart_dept_performance   | 03_gold_metrics.py:232-277     |
| return_velocity      | mart_reorder_velocity   | 03_gold_metrics.py:281-333     |

Role mapping (FIXTURES.md §C): lineitem≈order_products, orders≈orders,
customer/nation/region≈products/aisles/departments dim chain,
``l_returnflag = 'R'``≈the reordered 0/1 measure, o_orderstatus≈eval_set.

Where the reference's twin notebooks disagree we follow the SQL-notebook
semantics (SURVEY.md §7.4.3) and the DataFrame + oracle SQL here are kept
in exact lockstep (same aliases, same rounding) for the driver's
hash-compare.

Scale design, per mart:
- dims broadcast; the fact table never shuffles for enrichment.
- all rollups are groupBy hash aggregations (map-side partial agg).
- grand totals stay in-plan via empty-partition windows over
  POST-aggregation (tiny) results — never via driver collect.
- exact countDistinct is kept for oracle parity; each call site notes the
  approx_count_distinct swap for the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import (
    customer_segment,
    dround,
    popularity_tier,
    position_bucket,
    surrogate_key,
)
from ..operators.aggs import conditional_share, pct_of_total, rollup_orders
from ..operators.joins import enriched_lineitem

def _is_return() -> "F.Column":
    """The reordered-0/1 measure analog: l_returnflag = 'R' (FIXTURES.md §C)."""
    return F.when(F.col("l_returnflag") == "R", 1).otherwise(0)


def fct_lineitem(lineitem: DataFrame) -> DataFrame:
    """Fact table at line-item grain with deterministic surrogate key.

    Reference fct_orders (03_gold_metrics.py:78-100): md5 surrogate key
    over the composite business key + pass-through measures. Narrow
    projection — no shuffle; at scale this writes partitioned by
    l_returnflag (the eval_set analog) for partition pruning.
    """
    return lineitem.select(
        surrogate_key("l_orderkey", "l_partkey", "l_linenumber").alias("line_key"),
        "l_orderkey",
        "l_partkey",
        "l_suppkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_returnflag",
        "l_linestatus",
    )


def dim_customers(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-customer dimension: order rollup -> customer rollup -> segment.

    Reference dim_users (03_gold_metrics.py:104-157): per-order stats
    (A1), then per-user stats (A2), then a 3-way segment case chain (F4).
    Two hash aggregations; the orders join is on o_orderkey (high
    cardinality, no skew). All orders survive via LEFT join from orders to
    order_stats (J3) so customers with empty orders still count them.
    """
    order_stats = rollup_orders(lineitem)
    orders_keyed = orders.select("o_orderkey", "o_custkey", "o_totalprice")
    per_order = orders_keyed.join(
        order_stats, orders_keyed["o_orderkey"] == order_stats["l_orderkey"], "left"
    )
    out = per_order.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("total_orders"),
        F.coalesce(F.sum("basket_size"), F.lit(0)).alias("total_items"),
        F.max("basket_size").alias("max_basket_size"),
        dround(F.avg("basket_size"), 2).alias("avg_basket_size"),
        # exact fixed-point mean of per-order rates: the outer sum is over
        # LONGs so it is summation-order-independent (oracle-hash-stable)
        dround(
            F.sum("return_rate_e8") / F.count("return_rate_e8") / F.lit(1e8), 4
        ).alias("avg_return_rate"),
        dround(F.sum("o_totalprice"), 2).alias("lifetime_value"),
    )
    return out.withColumn("customer_segment", customer_segment(F.col("total_orders")))


def dim_parts(lineitem: DataFrame, orders: DataFrame, part: DataFrame) -> DataFrame:
    """Per-part dimension with distinct-customer reach and popularity tier.

    Reference dim_products (03_gold_metrics.py:161-228, the *clean*
    variant — the dead block at :166-179 is intentionally not
    reproduced; SURVEY.md §4.4). LEFT join keeps never-ordered parts with
    COALESCE(0) bridging (A8, serverless:221-224).

    Scale shape (r11 rewrite, VERDICT r10 #2): the naive form —
    ``groupBy(l_partkey).agg(..., countDistinct(o_custkey))`` straight
    off the orderkey join — plans an Expand (2x the joined rows) plus
    TWO full-width exchanges. Here the distinct is a TWO-LEVEL
    aggregation instead: one ``repartition(l_partkey)`` of a 4-column
    projection, then ``groupBy(l_partkey, o_custkey)`` and
    ``groupBy(l_partkey)`` both run EXCHANGE-FREE on top of it
    (HashPartitioning(partkey) satisfies the (partkey, custkey)
    clustering), with ``count(*)`` of the first level as the exact
    distinct-customer count. Semantically identical on any input —
    inner-join multiplicity included, so it does NOT assume lineitem
    referential integrity. The ``repartition(l_partkey)`` sits BEFORE
    the orderkey join on purpose: a broadcast-hash join preserves the
    streamed side's partitioning, so the probe + both agg levels run
    at full width while the single-row-group scan task only writes
    shuffle blocks — repartitioning AFTER the join left probe+project
    serialized in the 1-task scan stage (interleaved A/B sf0.1:
    median 2.02s after-join vs 1.10s before-join, identical output).
    The orderkey join carries no hint: at bench scale AQE broadcasts
    the 2-column orders projection at runtime; at 100 TB (orders too
    big to broadcast) it shuffles on orderkey — serve both sides from
    a `write_bucketed(o_orderkey)` store to make it exchange-free,
    and the pre-join repartition then becomes the bucketed scan's
    own layout. Naive r10 form was 2.35s (9.85x its DuckDB twin). At
    100 TB swap the exact distinct for ``F.approx_count_distinct``
    (rsd 1%) to drop level one entirely (SURVEY.md §7.4.4).
    """
    li = (
        lineitem.select("l_orderkey", "l_partkey", "l_returnflag", "l_linenumber")
        .repartition("l_partkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "inner",
        )
        .select(
            "l_partkey",
            "o_custkey",
            _is_return().alias("_ret1"),
            F.col("l_linenumber").cast("long").alias("_lnum"),
        )
    )
    per_cust = li.groupBy("l_partkey", "o_custkey").agg(
        F.count(F.lit(1)).alias("_cnt"),
        F.sum("_ret1").alias("_ret"),
        F.sum("_lnum").alias("_lsum"),
    )
    stats = per_cust.groupBy("l_partkey").agg(
        F.sum("_cnt").alias("times_ordered"),
        F.sum("_ret").alias("return_count"),
        dround(F.sum("_ret").cast("double") / F.sum("_cnt"), 4).alias("return_rate"),
        dround(F.sum("_lsum").cast("double") / F.sum("_cnt"), 2).alias(
            "avg_cart_position"
        ),
        F.count(F.lit(1)).alias("unique_customers"),
    )
    out = (
        part.select("p_partkey", "p_name", "p_brand", "p_type", "p_retailprice")
        .join(stats, part["p_partkey"] == stats["l_partkey"], "left")
        .drop("l_partkey")
        .withColumns(
            {
                "times_ordered": F.coalesce(F.col("times_ordered"), F.lit(0)),
                "return_count": F.coalesce(F.col("return_count"), F.lit(0)),
                "return_rate": F.coalesce(F.col("return_rate"), F.lit(0.0)),
                "unique_customers": F.coalesce(F.col("unique_customers"), F.lit(0)),
            }
        )
    )
    return out.withColumn("popularity_tier", popularity_tier(F.col("times_ordered")))


def region_performance(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    approx_distinct: bool = False,
) -> DataFrame:
    """KPI mart per (region, nation): the engine's flagship query.

    Reference mart_dept_performance (03_gold_metrics.py:232-277):
    5-way star join (J1) filtered to completed orders (the eval_set
    'prior' analog: o_orderstatus='F'), grouped with exact distinct
    counts (A4), conditional shares (A5), pct-of-grand-total (A6) and a
    descending sort (O1).

    One broadcast-join stage over the fact scan, one hash-agg shuffle on
    25 (nation) keys, then a single-partition window over 25 rows for the
    grand total — in-plan, replacing the reference's driver-side
    collect-then-literal (SURVEY.md §3.2).

    ``approx_distinct=True`` swaps exact countDistinct for
    HyperLogLog++ (rsd 5%, Spark's default) — the 100 TB form: exact
    distinct expands each group into one row per distinct value before
    re-aggregating, while the sketch shuffles fixed-size registers
    (SURVEY.md §7.4). Register count scales as (1.04/rsd)^2 — rsd 1%
    means 2^14 registers (~12 KB serialized per group-column), which
    made the sketch SLOWER than exact at bench scale; 5% is ~512
    registers and the right accuracy for share-of-total KPIs. Tighten
    rsd only when the distinct counts feed decisions that need it.
    """
    enriched = enriched_lineitem(lineitem, orders, customer, nation, region).filter(
        F.col("o_orderstatus") == "F"
    )
    grp = [
        F.col("r_name").alias("region_name"),
        F.col("n_name").alias("nation_name"),
    ]
    if approx_distinct:
        # HLL sketches merge without row expansion — the single-pass
        # form is already optimal for the approx variant
        distinct = lambda c: F.approx_count_distinct(c, 0.05)  # noqa: E731
        agg = enriched.groupBy(*grp).agg(
            F.count(F.lit(1)).alias("total_line_items"),
            distinct("l_orderkey").alias("unique_orders"),
            distinct("o_custkey").alias("unique_customers"),
            distinct("l_partkey").alias("unique_parts"),
            dround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            dround(F.avg("l_quantity"), 2).alias("avg_quantity"),
            conditional_share(F.col("l_returnflag") == "R").alias("return_share"),
            conditional_share(F.col("l_discount") >= 0.05).alias("promo_share"),
        )
        out = agg.withColumn(
            "pct_of_total_items", pct_of_total(F.col("total_line_items"))
        )
        return out.orderBy(F.col("total_line_items").desc(), F.col("nation_name"))

    # EXACT form: split the three countDistincts instead of taking
    # Catalyst's Expand plan. Three distinct columns make Spark expand
    # every fact row x4 before the partial aggregate; splitting into
    # (a) an order-grain pre-aggregate (o_custkey is constant per
    # order, so unique_orders becomes a plain count and
    # unique_customers a single-distinct over ~|orders| rows) and
    # (b) a parts-only single-distinct chain halves the aggregate
    # input and removes the Expand entirely. The two chains share
    # byte-identical broadcast builds (ReuseExchange serves both) and
    # rejoin on the 25-row (region, nation) grain. sf0.1 A/B, 3 runs
    # each, steady state: expand form 2.57s vs split form 1.59s.
    # Trade-off at 100 TB: the fact scan runs twice (column-pruned) vs
    # one scan pushing 4x rows through the partial aggregate — partial
    # aggregation is the dominant cost of this plan at any scale, so
    # the split wins there too; flip back to the single-pass form only
    # if the scan itself (e.g. remote cold storage) dominates.
    per_order = enriched.groupBy(*grp, F.col("l_orderkey")).agg(
        F.count(F.lit(1)).alias("_items"),
        F.min("o_custkey").alias("_ck"),
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("_rev"),
        F.sum("l_quantity").alias("_qty"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("_ret"),
        F.sum(F.when(F.col("l_discount") >= 0.05, 1).otherwise(0)).alias("_promo"),
    )
    agg = per_order.groupBy("region_name", "nation_name").agg(
        F.sum("_items").alias("total_line_items"),
        F.count(F.lit(1)).alias("unique_orders"),
        F.countDistinct("_ck").alias("unique_customers"),
        dround(F.sum("_rev"), 2).alias("revenue"),
        dround(F.sum("_qty") / F.sum("_items"), 2).alias("avg_quantity"),
        dround(F.sum("_ret") * F.lit(1.0) / F.sum("_items"), 4).alias(
            "return_share"
        ),
        dround(F.sum("_promo") * F.lit(1.0) / F.sum("_items"), 4).alias(
            "promo_share"
        ),
    )
    parts = enriched.groupBy(*grp).agg(
        F.countDistinct("l_partkey").alias("unique_parts")
    )
    out = (
        # both sides are (region, nation)-grain (25 rows); hint the
        # parts side so the static plan is a broadcast join rather
        # than waiting for AQE to discover the size at runtime
        agg.join(F.broadcast(parts), ["region_name", "nation_name"])
        .select(
            "region_name",
            "nation_name",
            "total_line_items",
            "unique_orders",
            "unique_customers",
            "unique_parts",
            "revenue",
            "avg_quantity",
            "return_share",
            "promo_share",
        )
        .withColumn("pct_of_total_items", pct_of_total(F.col("total_line_items")))
    )
    return out.orderBy(F.col("total_line_items").desc(), F.col("nation_name"))


def return_velocity(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Return rate by purchase-position bucket (habit-formation analog).

    Reference mart_reorder_velocity (03_gold_metrics.py:281-333): rank
    each (customer, part) purchase sequence by order date (W2), lag the
    previous return flag (W3 — computed-but-unused in the reference;
    reproduced for API parity), bucket the rank (F4), aggregate with a
    HAVING floor (A7).

    Deterministic ordering: (o_orderdate, o_orderkey, l_linenumber) is a
    total order within each (custkey, partkey) partition — the reference's
    order_number tie is reproduced with an explicit unique tie-break
    (SURVEY.md §4.3.1). Window partitions on a high-cardinality composite
    key → even task distribution at scale.
    """
    li = (
        lineitem.select("l_orderkey", "l_partkey", "l_linenumber", "l_returnflag")
        .join(
            orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "inner",
        )
        .filter(F.col("o_orderstatus") == "F")
    )
    w = Window.partitionBy("o_custkey", "l_partkey").orderBy(
        "o_orderdate", "o_orderkey", "l_linenumber"
    )
    ranked = li.withColumns(
        {
            "purchase_rank": F.row_number().over(w),
            "is_return": _is_return(),
            "prev_return": F.lag(F.when(F.col("l_returnflag") == "R", 1).otherwise(0), 1, 0).over(w),
        }
    ).withColumn("order_position_bucket", position_bucket(F.col("purchase_rank")))
    return (
        ranked.groupBy("order_position_bucket")
        .agg(
            F.count(F.lit(1)).alias("purchase_count"),
            dround(F.avg(F.col("is_return").cast("double")), 4).alias("return_rate"),
        )
        .filter(F.col("purchase_count") >= 50)
        .orderBy("order_position_bucket")
    )


def top_returned_parts(lineitem: DataFrame, part: DataFrame, k: int = 10) -> DataFrame:
    """O3 top-k: parts by return rate with a support floor.

    Reference verification query (03_gold_metrics_serverless.py:429-436).
    orderBy+limit plans as TakeOrderedAndProject — each partition keeps a
    k-heap, the driver merges k*partitions rows; no global sort at scale.
    Tie-break on p_partkey makes top-k deterministic for the oracle.
    """
    stats = lineitem.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("times_ordered"),
        dround(F.avg(_is_return().cast("double")), 4).alias("return_rate"),
    )
    return (
        stats.filter(F.col("times_ordered") >= 20)
        .join(F.broadcast(part.select("p_partkey", "p_name")), stats["l_partkey"] == F.col("p_partkey"))
        .select("p_partkey", "p_name", "times_ordered", "return_rate")
        .orderBy(F.col("return_rate").desc(), F.col("p_partkey"))
        .limit(k)
    )
