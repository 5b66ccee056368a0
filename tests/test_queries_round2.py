"""Round-2 query additions: streaming dedup drain, CUBE grouping sets,
salted skew join, TPC-H Q5, ntile quartiles, TF-IDF keyword extraction.

Each query's value-level parity vs DuckDB is covered by
tools/check_oracle.py (the driver gate); these tests pin the structural
invariants the oracle can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from instacart_medallion_lakehouse_spark import queries_ext as qx


class TestStreamDedup:
    def test_drained_result_equals_pristine_events(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.io import read_events

        out = qx.stream_dedup(spark, sf_dir)
        base = read_events(spark, sf_dir).select(
            "event_id", "ts", "user_id", "event_type", "value"
        )
        assert out.count() == base.count()
        # injected duplicates were exact copies -> symmetric difference empty
        assert out.exceptAll(base).count() == 0
        assert base.exceptAll(out).count() == 0


class TestCubeRevenue:
    def test_grouping_set_structure(self, spark, sf_dir):
        rows = qx.cube_revenue(spark, sf_dir).collect()
        # exactly one grand-total row, flagged on both dimensions
        grand = [r for r in rows if r.is_status_total and r.is_priority_total]
        assert len(grand) == 1
        assert grand[0].order_status is None and grand[0].order_priority is None
        # grand total equals the sum of the finest-grain cells
        fine = [r for r in rows if not r.is_status_total and not r.is_priority_total]
        assert sum(r.n_orders for r in fine) == grand[0].n_orders
        # cube = 4 grouping sets: fine + status-only + priority-only + grand
        status_totals = [r for r in rows if not r.is_status_total and r.is_priority_total]
        priority_totals = [r for r in rows if r.is_status_total and not r.is_priority_total]
        assert len(rows) == len(fine) + len(status_totals) + len(priority_totals) + 1


class TestSaltedJoinRollup:
    def test_no_salt_column_leaks(self, spark, sf_dir):
        df = qx.salted_join_rollup(spark, sf_dir)
        assert "_salt" not in df.columns


class TestQ5:
    def test_single_region_only(self, spark, sf_dir):
        df = qx.q5_local_supplier(spark, sf_dir)
        # every output nation belongs to ASIA
        nations = {r.nation_name for r in df.collect()}
        region = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
            F.col("r_name") == "ASIA"
        )
        nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
        asia_nations = {
            r.n_name
            for r in nation.join(
                region, nation["n_regionkey"] == region["r_regionkey"]
            ).collect()
        }
        assert nations <= asia_nations


class TestCustomerQuartiles:
    def test_equal_height_and_ordered_bounds(self, spark, sf_dir):
        rows = {r.quartile: r for r in qx.customer_quartiles(spark, sf_dir).collect()}
        assert set(rows) == {1, 2, 3, 4}
        counts = [rows[q].n_customers for q in (1, 2, 3, 4)]
        assert max(counts) - min(counts) <= 1  # ntile equal-height contract
        # bucket ranges are non-overlapping and increasing
        for q in (1, 2, 3):
            assert rows[q].hi_bal <= rows[q + 1].lo_bal


class TestTfidf:
    def test_top3_per_doc_rank_contract(self, spark, sf_dir):
        rows = qx.tfidf_top_terms(spark, sf_dir).collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, rs in by_doc.items():
            ranks = sorted(r.term_rank for r in rs)
            assert ranks == list(range(1, len(rs) + 1)) and len(rs) <= 3
            # scores weakly decrease with rank
            rs.sort(key=lambda r: r.term_rank)
            for a, b in zip(rs, rs[1:]):
                assert a.tfidf >= b.tfidf


class TestApproxPercentiles:
    def test_sketch_close_to_exact(self, spark, sf_dir):
        exact = {r.o_orderstatus: r for r in qx.__dict__["price_percentiles"](
            spark, sf_dir
        ).collect()} if "price_percentiles" in qx.__dict__ else None
        if exact is None:
            from instacart_medallion_lakehouse_spark import queries as q

            exact = {
                r.o_orderstatus: r
                for r in q.queries()["price_percentiles"](spark, sf_dir).collect()
            }
        approx = {
            r.o_orderstatus: r
            for r in qx.price_percentiles_approx(spark, sf_dir).collect()
        }
        assert exact.keys() == approx.keys()
        for k, e in exact.items():
            a = approx[k]
            for col in ("p50", "p90", "p99"):
                # GK sketch at accuracy 10000 on a few hundred rows is
                # near-exact; allow 2% relative slack
                assert abs(a[col] - e[col]) <= 0.02 * abs(e[col]) + 1e-9


class TestComponents:
    def test_converged_and_valid_clustering(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.operators.graph import (
            label_propagation,
        )

        edges = qx.fuzzy_name_pairs(spark, sf_dir).select("id_a", "id_b").cache()
        six = {r.node: r.component for r in
               label_propagation(edges, iterations=3).collect()}
        seven = {r.node: r.component for r in
                 label_propagation(edges, iterations=4).collect()}
        assert six == seven  # a 4th round changes nothing -> converged
        # every edge joins two nodes of the SAME component
        for e in edges.collect():
            assert six[e.id_a] == six[e.id_b]
        # each component is labeled by its minimum member
        comps: dict[int, list[int]] = {}
        for node, comp in six.items():
            comps.setdefault(comp, []).append(node)
        for comp, members in comps.items():
            assert comp == min(members)
        edges.unpersist()
