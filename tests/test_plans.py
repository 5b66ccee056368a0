"""Physical-plan regression tests: the scale properties (broadcast
joins, filter pushdown, column pruning) are asserted, not assumed —
a plan that silently degrades to sort-merge or full-width scans is a
bug even when results stay correct.
"""

from __future__ import annotations

import pytest

from instacart_medallion_lakehouse_spark import queries as q


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark, sf_dir):
    names = ["region_performance", "star_enriched", "q1_pricing_summary"]
    out = {}
    for n in names:
        df = q.queries()[n](spark, sf_dir)
        # execute THIS DataFrame's own QueryExecution so AQE finalizes it
        # (count() would plan/execute a separate wrapped query)
        df.collect()
        out[n] = _plan(df)
    return out


class TestJoinStrategy:
    def test_star_join_broadcasts_all_dims(self, plans):
        p = plans["star_enriched"]
        # AQE final plans can print a join node more than once; the
        # invariant is: broadcast joins present, NO sort-merge anywhere
        assert p.count("BroadcastHashJoin") >= 4
        assert "SortMergeJoin" not in p

    def test_flagship_mart_broadcasts(self, plans):
        p = plans["region_performance"]
        assert p.count("BroadcastHashJoin") >= 4
        assert "SortMergeJoin" not in p


class TestScanEfficiency:
    def test_q1_filter_pushed_to_scan(self, plans):
        p = plans["q1_pricing_summary"]
        assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in p

    def test_q1_column_pruning(self, plans):
        # 7 needed columns of 16+ — the scan must not read the rest
        p = plans["q1_pricing_summary"]
        scan = next(line for line in p.split("\n") if "FileScan parquet" in line)
        assert "l_orderkey" not in scan  # unused key column pruned
        assert "l_comment" not in scan

    def test_status_filter_pushed_in_mart(self, plans):
        p = plans["region_performance"]
        assert "EqualTo(o_orderstatus,F)" in p.replace(" ", "") or (
            "PushedFilters" in p and "o_orderstatus" in p
        )


class TestCodegen:
    def test_q1_is_whole_stage_codegen(self, plans):
        # toString marks codegen'd stages with the "*(n)" prefix
        assert "*(1)" in plans["q1_pricing_summary"]


@pytest.fixture(scope="module")
def plans2(spark, sf_dir):
    from instacart_medallion_lakehouse_spark import queries_ext as qx

    names = ["q5_local_supplier", "cube_revenue", "tfidf_top_terms"]
    out = {}
    for n in names:
        df = qx.__dict__[n](spark, sf_dir)
        df.collect()
        out[n] = _plan(df)
    return out


class TestRound2Plans:
    def test_q5_broadcasts_every_dim(self, plans2):
        # only lineitem<->orders may shuffle; customer/supplier/nation/
        # region must ride broadcasts
        p = plans2["q5_local_supplier"]
        assert p.count("BroadcastHashJoin") >= 4

    def test_q5_date_filter_pushed(self, plans2):
        p = plans2["q5_local_supplier"]
        assert "PushedFilters" in p and "o_orderdate" in p

    def test_cube_is_single_scan_expand(self, plans2):
        # CUBE = one scan + one Expand, not a scan per grouping set
        # (AQE toString repeats the plan as "Initial Plan"; count only
        # the final one)
        p = plans2["cube_revenue"].split("== Initial Plan ==")[0]
        assert p.count("FileScan parquet") == 1
        assert "Expand" in p

    def test_tfidf_doc_filter_pushed_below_window(self, plans2):
        # the doc_id < 20 output filter must reach the documents scan on
        # the tf/dl side (doc_id is the window partition key, so Catalyst
        # can push it through row_number)
        p = plans2["tfidf_top_terms"]
        assert "PushedFilters" in p and "LessThan(doc_id,20)" in p


@pytest.fixture(scope="module")
def plans3(spark, sf_dir):
    from instacart_medallion_lakehouse_spark import queries_ext as qx

    names = ["q18_large_orders", "q10_returned_items", "q7_volume_shipping"]
    out = {}
    for n in names:
        df = qx.__dict__[n](spark, sf_dir)
        df.collect()
        out[n] = _plan(df)
    return out


class TestTpchPlans:
    def test_q18_aggregated_side_broadcasts(self, plans3):
        # the HAVING rollup result (tiny) broadcasts into orders; the
        # fact table must not sort-merge against orders
        p = plans3["q18_large_orders"]
        assert p.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in p

    def test_q10_filters_pushed(self, plans3):
        p = plans3["q10_returned_items"]
        assert "PushedFilters" in p
        assert "l_returnflag" in p and "o_orderdate" in p
        assert p.count("BroadcastHashJoin") >= 2

    def test_q7_dims_broadcast(self, plans3):
        p = plans3["q7_volume_shipping"]
        assert p.count("BroadcastHashJoin") >= 4
        assert "PushedFilters" in p and "l_shipdate" in p


class TestRound8Plans:
    def test_curated_docs_v2_has_no_sort_merge_join(self, spark, sf_dir):
        """Round-8 invariant: the final anti-join broadcasts the
        near-dup loser-id set (detection output, ids only), so the
        deepest plan in the registry carries ZERO sort-merge joins —
        a silent fallback to SMJ here means Catalyst lost the hint."""
        df = q.queries()["curated_docs_v2"](spark, sf_dir)
        plan = _plan(df)
        assert "SortMergeJoin" not in plan
        q.release_pins()

    def test_span_run_index_is_a_store_scan(self, spark, sf_dir):
        """The substring-dedup index is served from the persisted
        store: once built, the registry entry plans as a parquet scan
        with no shuffle (the posexplode+window build pipeline must not
        re-run per consumer)."""
        q.queries()["span_run_index"](spark, sf_dir).count()  # build
        plan = _plan(q.queries()["span_run_index"](spark, sf_dir))
        assert "Exchange" not in plan
        assert "window" not in plan.lower()
        q.release_pins()


class TestRound10ExtensionPlans:
    def test_bm25_broadcasts_query_set_no_smj(self, spark, sf_dir):
        """BM25's scale contract: the 5-term query set and the 1-row
        corpus stats join the token table as BROADCASTS (scoring is a
        map-side join over postings), the top-10 is TakeOrdered, and
        nothing falls back to sort-merge."""
        df = q.queries()["bm25_topk"](spark, sf_dir)
        df.collect()
        p = _plan(df)
        assert p.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in p
        assert "TakeOrderedAndProject" in p
        q.release_pins()

    def test_hybrid_rrf_fusion_has_no_sort_merge_join(self, spark, sf_dir):
        """The RRF fusion is a union + hash aggregate BY DESIGN — a
        full-outer formulation would plan a SortMergeJoin (full outer
        cannot broadcast). This pins the rewrite."""
        df = q.queries()["hybrid_rrf_topk"](spark, sf_dir)
        df.collect()
        p = _plan(df)
        assert "SortMergeJoin" not in p
        q.release_pins()

    def test_snapshot_reconcile_is_the_documented_full_outer_smj(
        self, spark, sf_dir
    ):
        """The one deliberate non-fact-fact SMJ in the registry: a FULL
        OUTER join cannot broadcast, so the plan MUST carry exactly the
        sort-merge the docstring documents — and classify via the join,
        not a fallback nested loop."""
        df = q.queries()["snapshot_reconcile_diff"](spark, sf_dir)
        df.collect()
        p = _plan(df)
        assert "FullOuter" in p
        assert "SortMergeJoin" in p
        assert "BroadcastNestedLoopJoin" not in p
        q.release_pins()

    def test_fingerprint_dedup_consumers_scan_the_store(self, spark, sf_dir):
        """After the build entry commits the fingerprint store, the
        dedup consumer's plan must contain ZERO Python decode stages —
        it scans the one-int64-per-item signature parquet (re-decoding
        per consumer is exactly what the store exists to prevent)."""
        q.queries()["audio_fp_table"](spark, sf_dir).count()  # build
        df = q.queries()["audio_fp_dedup"](spark, sf_dir)
        df.collect()
        p = _plan(df)
        assert "MapInPandas" not in p
        assert "FileScan parquet" in p
        q.release_pins()
