"""Guards for the round-4 TPC-H additions (queries_tpch.py).

Value correctness is oracle-gated (tools/check_oracle.py / the driver);
these tests pin what the oracle cannot see: physical plan shape (dims
broadcast, facts not shuffled needlessly) and the subquery semantics
that the adaptations re-express as semi/anti joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from instacart_medallion_lakehouse_spark import queries as q


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


class TestPlanShapes:
    def test_q9_all_dim_joins_broadcast(self, spark, sf_dir):
        plan = _plan(q.queries()["q9_profit_by_nation_year"](spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan, plan

    def test_q19_part_side_broadcasts(self, spark, sf_dir):
        plan = _plan(q.queries()["q19_disjunctive_revenue"](spark, sf_dir))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan, plan

    def test_q20_semi_join_on_aggregated_side(self, spark, sf_dir):
        plan = _plan(q.queries()["q20_excess_suppliers"](spark, sf_dir))
        assert "LeftSemi" in plan
        assert "SortMergeJoin" not in plan, plan

    def test_q16_exclusion_is_broadcast_anti(self, spark, sf_dir):
        plan = _plan(q.queries()["q16_supplier_part_counts"](spark, sf_dir))
        assert "LeftAnti" in plan
        # the 6-key complaint list must never justify a shuffle
        assert "BroadcastHashJoin" in plan

    def test_q2_single_fact_shuffle_before_window(self, spark, sf_dir):
        # fact scan -> broadcast dims -> ONE hash aggregate exchange;
        # the window min runs over the offer (part-grain) table only
        plan = _plan(q.queries()["q2_min_cost_supplier"](spark, sf_dir))
        assert "SortMergeJoin" not in plan, plan
        assert "Window" in plan

    def test_q4_semi_join_no_distinct(self, spark, sf_dir):
        plan = _plan(q.queries()["q4_priority_exists"](spark, sf_dir))
        assert "LeftSemi" in plan


class TestSubquerySemantics:
    def test_q4_counts_match_exists_recomputation(self, spark, sf_dir):
        got = {
            r.o_orderpriority: r.order_count
            for r in q.queries()["q4_priority_exists"](spark, sf_dir).collect()
        }
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        # independent recomputation: inner join + distinct orderkeys
        late_keys = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
            .select("o_orderkey", "o_orderpriority")
            .distinct()
        )
        want = {
            r.o_orderpriority: r.n
            for r in late_keys.groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == want

    def test_q11_cut_is_exact_on_both_sides(self, spark, sf_dir):
        rows = q.queries()["q11_important_parts"](spark, sf_dir).collect()
        assert rows, "threshold degenerate: no important parts at this sf"
        # recompute the grand total and assert every returned part
        # clears the cut and every omitted part does not
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
            F.col("n_regionkey") == 2
        )
        per_part = (
            li.join(sup, li["l_suppkey"] == sup["s_suppkey"])
            .join(nat, sup["s_nationkey"] == nat["n_nationkey"])
            .groupBy("l_partkey")
            .agg(F.sum("l_quantity").alias("val"))
            .collect()
        )
        total = sum(r.val for r in per_part)
        want = {r.l_partkey: int(r.val) for r in per_part if r.val > 0.001 * total}
        assert {r.p_partkey: r.qty_value for r in rows} == want

    def test_q21_alone_late_in_multi_supplier_order(self, spark, sf_dir):
        rows = q.queries()["q21_waiting_suppliers"](spark, sf_dir).collect()
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderstatus") == "F"
        )
        late = (
            li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .filter(
                F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 120 DAYS")
            )
            .select("l_orderkey", "l_suppkey")
            .collect()
        )
        all_pairs = li.select("l_orderkey", "l_suppkey").collect()
        supp_of_order: dict[int, set[int]] = {}
        for r in all_pairs:
            supp_of_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
        late_supp_of_order: dict[int, set[int]] = {}
        for r in late:
            late_supp_of_order.setdefault(r.l_orderkey, set()).add(r.l_suppkey)
        names = {
            r.s_suppkey: r.s_name
            for r in spark.read.parquet(f"{sf_dir}/supplier.parquet").collect()
        }
        want: dict[str, int] = {}
        for r in late:
            others = supp_of_order[r.l_orderkey] - {r.l_suppkey}
            other_late = late_supp_of_order[r.l_orderkey] - {r.l_suppkey}
            if others and not other_late:
                name = names[r.l_suppkey]
                want[name] = want.get(name, 0) + 1
        assert {r.s_name: r.numwait for r in rows} == want

    def test_q2_returns_true_minimum_per_part(self, spark, sf_dir):
        rows = q.queries()["q2_min_cost_supplier"](spark, sf_dir).collect()
        if not rows:
            return  # degenerate at tiny sf; oracle run covers sf0.01
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        p = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
            (F.col("p_type") == "SMALL") & (F.col("p_size") <= 15)
        )
        sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
            F.col("n_regionkey") == 3
        )
        mins = {
            r.l_partkey: r.m
            for r in li.join(p, li["l_partkey"] == p["p_partkey"])
            .join(sup, li["l_suppkey"] == sup["s_suppkey"])
            .join(nat, sup["s_nationkey"] == nat["n_nationkey"])
            .groupBy("l_partkey")
            .agg(F.min("l_extendedprice").alias("m"))
            .collect()
        }
        import math

        for r in rows:
            # dround semantics (HALF_UP), not Python's banker's round
            want = math.floor(mins[r.p_partkey] * 100.0 + 0.5) / 100.0
            assert r.supply_price == want
