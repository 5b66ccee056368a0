"""Round-3 guards: driver-window composition and the tfidf ln() boundary.

The external harness hash-compares the FIRST 50 entries of ``queries()``
against the DuckDB oracle. These tests pin the invariants that make that
window trustworthy: every in-window query has an oracle twin, the window
is exactly the curated priority list, and the one transcendental in the
compared surface (``ln`` inside tfidf_top_terms) sits far enough from
every 4-dp rounding boundary that a 1-ulp libm-vs-Math.log divergence
cannot flip a hashed value.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from instacart_medallion_lakehouse_spark import queries as q


# The registry's three deliberate no-oracle entries (approximate /
# streaming-rate results that hash differently by design): in-window
# they earn the driver's weaker rows-only record, which is exactly the
# standing signal round 4 rotates them in for.
_ROWS_ONLY = {
    "region_performance_approx",
    "stream_running_totals",
    "price_percentiles_approx",
}


class TestDriverWindow:
    def test_window_is_oracle_twinned_except_rows_only(self):
        names = list(q.queries())
        oracle = q.oracle_sql()
        assert len(names) == len(set(names))
        window = names[:50]
        missing = [
            n for n in window if n not in oracle and n not in _ROWS_ONLY
        ]
        assert missing == [], f"in-window queries without oracle SQL: {missing}"

    def test_priority_list_matches_registry(self):
        # every priority name resolves; the window starts with the list
        names = list(q.queries())
        assert names[: len(q._WINDOW_PRIORITY)] == list(q._WINDOW_PRIORITY)
        # round 12: exactly the 50 driver slots are allocated — the two
        # r11 oracle-fixed queries, the complete store-build block, the
        # r12 plan rewrites, and the r7 cohort remainder (queries.py
        # documents the rotation plan for the next round)
        assert len(q._WINDOW_PRIORITY) == 50

    def test_round12_window_contract(self):
        """Round 12's rotation contract (VERDICT r11 #1/#8): the two
        queries whose oracles failed the r11 driver gate lead the
        window (the driver must re-verify the fix), the store BUILD
        entries stay pinned ahead of their consumers, every plan r12
        rewrote rotates in, and the r7 cohort remainder fills the
        rest."""
        must_be_in = (
            # the r11 gate-breakers, oracle-fixed this round
            "k_anonymity_profile",
            "stream_window_topk",
            # the complete store-build block
            "shingle_index_table",
            "minhash_signature_table",
            "scored_docs_table",
            "doc_repetition_table",
            "contamination_flags_table",
            "span_run_index",
            "token_table",
            "boilerplate_phrases",
            "image_dhash_table",
            "audio_fp_table",
            "video_fp_table",
            # r12 plan rewrites: bucketed span-run/shingle stores and
            # their consumers, single-asset audio/video builds, shared
            # TWS drain, simhash ReuseExchange form, double-jump CC
            "ngram_jaccard_dedup",
            "ngram_jaccard_dedup_capped",
            "containment_pairs",
            "long_run_overlap",
            "span_dup_clusters",
            "dup_span_coverage",
            "dedup_spans_text",
            "incremental_span_dedup",
            "minhash_lsh_dedup",
            "incremental_minhash_dedup",
            "lsh_bucket_profile",
            "minhash_estimate_error",
            "dedup_clusters",
            "cluster_canonicals",
            "curated_docs_v2",
            "image_dhash_dedup",
            "audio_fp_dedup",
            "video_fp_dedup",
            "simhash_dedup",
            "name_components_converged",
            "stream_tws_final_state",
            "ann_pq_topk",
            # r7 cohort remainder spot checks (full list in queries.py)
            "pivot_status_revenue",
            "region_performance",
            "sessionize",
        )
        names = list(q.queries())
        window = set(names[:50])
        for name in must_be_in:
            assert name in window, name
        # build entries come before every consumer in execution order
        assert names.index("shingle_index_table") < names.index(
            "minhash_signature_table"
        )
        assert names.index("minhash_signature_table") < names.index(
            "minhash_lsh_dedup"
        )
        assert names.index("scored_docs_table") < names.index(
            "curated_docs_v2"
        )
        assert names.index("contamination_flags_table") < names.index(
            "curated_docs_v2"
        )
        assert names.index("boilerplate_phrases") < names.index(
            "doc_boilerplate_ratio"
        )
        assert names.index("span_run_index") < names.index(
            "dup_span_coverage"
        )
        assert names.index("token_table") < names.index("lm_perplexity")
        # fingerprint *_table builds precede their dedup consumers
        for fam in ("image_dhash", "audio_fp", "video_fp"):
            assert names.index(f"{fam}_table") < names.index(
                f"{fam}_dedup"
            )
        # no-oracle entries stay OUT of the window (VERDICT r7 item #2)
        for no_oracle in ("region_performance_approx",
                          "price_percentiles_approx",
                          "stream_running_totals",
                          "stream_tws_totals"):
            assert no_oracle not in window, no_oracle

class TestTfidfRoundingMargin:
    def test_unrounded_scores_clear_the_4dp_boundary(self, spark, sf_dir):
        """dround(x, 4) = floor(x*1e4 + 0.5)/1e4 flips when x*1e4 + 0.5
        crosses an integer. ln() is computed independently by DuckDB's
        libm and the JVM; each is within 1 ulp of the true value, so the
        compared doubles can differ by ~1e-13 absolute at this magnitude.
        Assert every unrounded score in the compared window sits > 1e-9
        from a boundary — four orders of magnitude of margin."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        tok = (
            docs.select(
                "doc_id",
                F.explode(F.split(F.lower("text"), "[^a-z0-9]+")).alias("term"),
            )
            .filter(F.col("term") != "")
        )
        tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("n_td"))
        dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len_d"))
        df_t = (
            tok.select("doc_id", "term")
            .distinct()
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias("df_t"))
        )
        n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
        raw = (
            tf.join(dl, "doc_id")
            .join(df_t, "term")
            .crossJoin(F.broadcast(n_docs))
            .filter(F.col("doc_id") < 20)
            .select(
                (
                    (F.col("n_td") * F.lit(1.0) / F.col("len_d"))
                    * F.log(F.col("n_docs") * F.lit(1.0) / F.col("df_t"))
                ).alias("raw")
            )
            .collect()
        )
        assert raw, "compared window is empty — doc_id<20 filter matched nothing"
        worst = 1.0
        for r in raw:
            scaled = r.raw * 1e4 + 0.5
            dist = abs(scaled - round(scaled))
            worst = min(worst, dist)
        assert worst > 1e-9, (
            f"a tfidf score sits {worst:.2e} from a 4-dp rounding boundary; "
            "switch idf to the exact-rational form before the driver hashes it"
        )

    def test_rank3_boundary_not_decided_by_float_noise(self, spark, sf_dir):
        """The top-3 cut is taken AFTER rounding with a term tie-break, so
        equal rounded scores are ordered deterministically. Verify that at
        sf0.001 the rank-3/rank-4 boundary in every doc differs either in
        rounded score or in term (always true by row_number) — i.e. the
        same rows are selected regardless of engine."""
        out = q.queries()["tfidf_top_terms"](spark, sf_dir).collect()
        per_doc: dict[int, list] = {}
        for r in out:
            per_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, rows in per_doc.items():
            assert len(rows) <= 3
            keys = {(r.term_rank) for r in rows}
            assert keys == set(range(1, len(rows) + 1))
            # rounded scores are exact 4-dp decimals (hashable text-stable)
            for r in rows:
                assert abs(r.tfidf * 1e4 - round(r.tfidf * 1e4)) < 1e-6 or math.isnan(
                    r.tfidf
                ) is False


class TestTrainingAssembly:
    """Invariants for the round-3 training-data assembly queries
    (queries_train.py). Cross-engine equality is covered by the oracle
    gate; these pin the semantic properties the oracle can't express."""

    def test_sequence_packing_conserves_tokens(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_train as qt
        from instacart_medallion_lakehouse_spark.functions.text import tokens

        packs = qt.sequence_packing(spark, sf_dir).collect()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        total_tokens = docs.select(
            F.sum(F.size(tokens(F.col("text")))).alias("t")
        ).first()["t"]
        assert sum(p.pack_tokens for p in packs) == total_tokens
        assert sum(p.n_docs for p in packs) == docs.count()
        # pack ids are contiguous from 0 within every shard
        by_shard: dict[int, list[int]] = {}
        for p in packs:
            by_shard.setdefault(p.shard, []).append(p.pack_id)
        for shard, ids in by_shard.items():
            assert sorted(ids) == list(range(len(ids))), shard
        # a pack holds >= 1 doc and its start boundary honors the budget:
        # every pack except a straddler's tail starts below the next cut
        assert all(p.n_docs >= 1 for p in packs)

    def test_stratified_sample_rates(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_train as qt

        rows = {r.o_orderstatus: r for r in
                qt.stratified_sample(spark, sf_dir).collect()}
        assert set(rows) == {"O", "F", "P"}
        for r in rows.values():
            assert 0 <= r.n_sampled <= r.n_total
            assert 0.0 <= r.achieved_rate <= 1.0
        # deterministic: a second run selects the identical sample
        again = {r.o_orderstatus: r for r in
                 qt.stratified_sample(spark, sf_dir).collect()}
        for k in rows:
            assert rows[k].n_sampled == again[k].n_sampled

    def test_corpus_mixture_token_accounting(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_train as qt

        rows = qt.corpus_mixture(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0 <= r.kept_docs <= r.n_docs
            assert 0 <= r.kept_tokens <= r.total_tokens

    def test_dedup_clusters_cover_corpus_and_respect_pairs(
        self, spark, sf_dir
    ):
        from instacart_medallion_lakehouse_spark import queries_train as qt
        from instacart_medallion_lakehouse_spark.operators import dedup

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        assignment = {r.doc_id: r.cluster for r in
                      qt.dedup_clusters(spark, sf_dir).collect()}
        assert len(assignment) == docs.count()
        pairs = dedup.minhash_lsh_pairs(
            docs, n=3, num_hashes=16, band_rows=2, threshold=0.5
        ).select("id_a", "id_b").collect()
        for p in pairs:
            assert assignment[p.id_a] == assignment[p.id_b]
        # cluster label = the minimum member; unpaired docs label themselves
        members: dict[int, list[int]] = {}
        for doc, c in assignment.items():
            members.setdefault(c, []).append(doc)
        for c, ms in members.items():
            assert c == min(ms)

    def test_grouping_sets_grains_consistent(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_train as qt

        rows = qt.grouping_sets_revenue(spark, sf_dir).collect()
        detail = [r for r in rows if r.grain == 0]
        flag_sub = [r for r in rows if r.grain == 1]
        grand = [r for r in rows if r.grain == 3]
        assert len(grand) == 1 and grand[0].returnflag == "ALL"
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        assert grand[0].n_items == li.count()
        assert sum(r.n_items for r in detail) == li.count()
        assert sum(r.n_items for r in flag_sub) == li.count()
        # each flag subtotal matches the sum of its detail rows (counts
        # exactly; revenue to rounding slack)
        for s in flag_sub:
            ds = [r for r in detail if r.returnflag == s.returnflag]
            assert s.n_items == sum(r.n_items for r in ds)
            assert abs(s.revenue - sum(r.revenue for r in ds)) < 0.05


class TestEventAnalytics:
    """Semantic invariants for queries_analytics.py (cross-engine
    equality is the oracle gate's job)."""

    def test_funnel_is_monotone(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        row = qa.funnel_steps(spark, sf_dir).first()
        assert row.n_users >= row.n_view >= row.n_view_click >= row.n_full_funnel
        assert row.n_full_funnel >= 0

    def test_funnel_respects_order_and_deadline(self, spark, sf_dir):
        # hand-built log: user 1 converts fully; user 2 purchases BEFORE
        # viewing (no conversion); user 3 clicks after the 24h deadline
        from instacart_medallion_lakehouse_spark import queries_analytics as qa
        from instacart_medallion_lakehouse_spark.queries_analytics import (
            funnel_steps,
        )
        import instacart_medallion_lakehouse_spark.queries as q

        rows = [
            (1, "2024-01-01 10:00:00", "view", 1),
            (1, "2024-01-01 10:30:00", "click", 2),
            (1, "2024-01-01 11:00:00", "purchase", 3),
            (2, "2024-01-01 09:00:00", "purchase", 4),
            (2, "2024-01-01 10:00:00", "view", 5),
            (3, "2024-01-01 10:00:00", "view", 6),
            (3, "2024-01-03 10:00:00", "click", 7),
        ]
        df = spark.createDataFrame(
            [(u, t, e, i) for u, t, e, i in rows],
            "user_id long, ts_s string, event_type string, event_id long",
        ).selectExpr(
            "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type", "event_id"
        )
        import unittest.mock as mock

        with mock.patch.object(qa, "_t", lambda s, d, n: df):
            out = funnel_steps(spark, "ignored").first()
        assert out.n_users == 3
        assert out.n_view == 3
        assert out.n_view_click == 1  # only user 1 clicked in time
        assert out.n_full_funnel == 1

    def test_errors_in_sessions_counts(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        out = qa.errors_in_sessions(spark, sf_dir).collect()
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        non_err = ev.filter("event_type <> 'error'").count()
        n_err = ev.filter("event_type = 'error'").count()
        assert sum(r.n_events for r in out) == non_err
        # attributed errors never exceed the error population
        assert sum(r.n_errors for r in out) <= n_err
        assert all(r.n_errors >= 0 for r in out)

    def test_revenue_anomalies_window_semantics(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        out = qa.revenue_anomalies(spark, sf_dir).collect()
        assert out, "no qualifying days"
        for r in out[:50]:
            flag = 1 if abs(r.z) > 2.0 else 0
            assert r.is_anomaly == flag
        assert any(r.is_anomaly == 1 for r in out) or all(
            abs(r.z) <= 2.0 for r in out
        )

    def test_key_skew_profile_shape(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        rows = qa.key_skew_profile(spark, sf_dir).collect()
        assert [r.rnk for r in sorted(rows, key=lambda r: r.rnk)] == [
            1, 2, 3, 4, 5,
        ]
        cnts = [r.cnt for r in sorted(rows, key=lambda r: r.rnk)]
        assert cnts == sorted(cnts, reverse=True)
        assert all(0 < r.share < 1 for r in rows)
        assert all(r.skew_factor >= 1.0 for r in rows)


class TestDecileBuckets:
    def test_equal_height_and_total(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        rows = sorted(qa.decile_buckets(spark, sf_dir).collect(),
                      key=lambda r: r.decile)
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        n = orders.count()
        assert [r.decile for r in rows] == list(range(1, 11))
        assert sum(r.n_orders for r in rows) == n
        # equal-height within one row of n/10 (ties at cutpoints)
        for r in rows:
            assert abs(r.n_orders - n / 10) <= max(2, 0.02 * n)
        # bucket ranges are ordered and non-overlapping
        for lo_r, hi_r in zip(rows, rows[1:]):
            assert lo_r.hi_price <= hi_r.lo_price


class TestPitFeatures:
    def test_features_are_strictly_before_purchase_day(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        rows = qa.pit_features_at_purchase(spark, sf_dir).collect()
        assert rows
        n_with = 0
        for r in rows:
            if r.feat_day is not None:
                assert r.feat_day < r.purchase_ts.date()  # no leakage
                n_with += 1
        assert n_with > 0
        # purchases on the stream's first day have no prior features
        first_day = min(r.purchase_ts.date() for r in rows)
        for r in rows:
            if r.purchase_ts.date() == first_day:
                assert r.feat_day is None

    def test_feature_is_the_latest_prior_day(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from instacart_medallion_lakehouse_spark import queries_analytics as qa
        from instacart_medallion_lakehouse_spark.io import read_events

        rows = qa.pit_features_at_purchase(spark, sf_dir).collect()
        ev = read_events(spark, sf_dir)
        days = {
            (r.user_id, r.day)
            for r in ev.select(
                "user_id", F.col("ts").cast("date").alias("day")
            ).distinct().collect()
        }
        by_user: dict[int, list] = {}
        for u, d in days:
            by_user.setdefault(u, []).append(d)
        for r in rows[:200]:
            prior = [d for d in by_user.get(r.user_id, [])
                     if d < r.purchase_ts.date()]
            want = max(prior) if prior else None
            assert r.feat_day == want, (r.event_id, r.feat_day, want)


class TestTimeRollup:
    def test_grains_are_consistent(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        rows = qa.time_rollup_revenue(spark, sf_dir).collect()
        orders_n = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
        grand = [r for r in rows if r.grain == 3]
        years = [r for r in rows if r.grain == 1]
        detail = [r for r in rows if r.grain == 0]
        assert len(grand) == 1 and grand[0].n_orders == orders_n
        assert sum(r.n_orders for r in years) == orders_n
        assert sum(r.n_orders for r in detail) == orders_n
        for y in years:
            dy = [r for r in detail if r.year == y.year]
            assert y.n_orders == sum(r.n_orders for r in dy)
            assert all(1 <= r.quarter <= 4 for r in dy)


class TestPlanShapes:
    """Pin the physical-plan claims the round-3 docstrings make: shuffle
    counts stay at the designed minimum (a regression here is an
    accidental extra exchange, i.e. a 100 TB cost bug, even when the
    answer stays right)."""

    @staticmethod
    def _exchanges(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        import re

        return len(re.findall(r"Exchange (hash|range)partitioning", plan))

    def test_single_shuffle_queries(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa
        from instacart_medallion_lakehouse_spark import queries_train as qt

        assert self._exchanges(qt.stratified_sample(spark, sf_dir)) == 1
        assert self._exchanges(qt.sequence_packing(spark, sf_dir)) == 1
        assert self._exchanges(qt.grouping_sets_revenue(spark, sf_dir)) == 1
        assert self._exchanges(qa.time_rollup_revenue(spark, sf_dir)) == 1

    def test_funnel_shuffles_event_log_once_per_grain(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        # one user_id exchange for the stacked windows + per-user agg
        # (reused partitioning), plus the singleton final-rollup exchange
        assert self._exchanges(qa.funnel_steps(spark, sf_dir)) <= 2

    def test_pit_join_is_one_user_shuffle(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        # daily-feature aggregate + the union-window partitioning; the
        # as-of itself must not add a third exchange
        assert self._exchanges(
            qa.pit_features_at_purchase(spark, sf_dir)
        ) <= 2

    def test_decile_buckets_broadcast_not_sort(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        df = qa.decile_buckets(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
        # the whole point: no global sort of the fact table
        assert "rangepartitioning" not in plan


class TestGraphAnalytics:
    def test_triangle_count_on_known_graph(self, spark):
        import unittest.mock as mock

        from instacart_medallion_lakehouse_spark import queries_ext as qe

        # K4 on names of equal length within levenshtein 1: use 4
        # customers with names differing in one char -> complete graph
        # K4 has exactly 4 triangles; plus an isolated pair (no triangle)
        df = spark.createDataFrame(
            [
                (1, "name_a"), (2, "name_b"), (3, "name_c"), (4, "name_d"),
                (5, "other_x"), (6, "other_y"),
            ],
            "c_custkey long, c_name string",
        )
        with mock.patch.object(qe, "_t", lambda s, d, n: df):
            out = qe.triangle_count(spark, "ignored").first()
        assert out.n_triangles == 4

    def test_pagerank_sums_to_one_and_ranks_connectivity(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_ext as qe

        rows = qe.pagerank_fuzzy(spark, sf_dir).collect()
        total = sum(r.rank for r in rows)
        # ranks are a probability distribution (up to 8-dp rounding drift)
        assert abs(total - 1.0) < 1e-4 * len(rows)
        assert all(r.rank > 0 for r in rows)


class TestAnalyticsBatch2:
    def test_cohort_retention_matrix_properties(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        rows = qa.cohort_retention(spark, sf_dir).collect()
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_users = ev.select("user_id").distinct().count()
        week0 = [r for r in rows if r.week_offset == 0]
        # every user is active in their own first week
        assert sum(r.n_active for r in week0) == n_users
        assert all(r.n_active <= n_users for r in rows)
        assert all(r.week_offset >= 0 for r in rows)

    def test_unpivot_long_layout(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        rows = {r.metric: r for r in
                qa.unpivot_part_metrics(spark, sf_dir).collect()}
        n_parts = spark.read.parquet(f"{sf_dir}/part.parquet").count()
        assert set(rows) == {"p_size", "p_retailprice"}
        for r in rows.values():
            assert r.n_parts == n_parts
            assert r.min_value <= r.avg_value <= r.max_value

    def test_embedding_norms_on_quantized_lattice(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        rows = qa.embedding_norms(spark, sf_dir).collect()
        n_vecs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        assert sum(r.n_vecs for r in rows) == n_vecs
        for r in rows:
            assert r.n_dims == 64
            assert 0 < r.avg_norm <= r.max_norm
            assert r.max_abs_component >= 0


class TestScd2UserStates:
    def test_intervals_partition_time_and_compress_runs(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_analytics as qa

        rows = qa.scd2_user_states(spark, sf_dir).collect()
        by_user: dict[int, list] = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        ev = spark.read.parquet(f"{sf_dir}/events.parquet")
        n_users = ev.select("user_id").distinct().count()
        assert len(by_user) == n_users
        for user, ivs in by_user.items():
            ivs.sort(key=lambda r: r.valid_from)
            # exactly one open (current) interval per user, at the end
            currents = [r for r in ivs if r.is_current == 1]
            assert len(currents) == 1 and currents[0] is ivs[-1]
            for a, b in zip(ivs, ivs[1:]):
                assert a.valid_to == b.valid_from  # contiguous, no gaps
                assert a.state != b.state  # runs are compressed


class TestTpchRound3B:
    """Semantic guards for the round-3b TPC-H additions (Q8/Q13/Q15/
    Q17/Q22) beyond the cross-engine oracle: invariants the oracle
    cannot see because both engines could share the same mistake."""

    def test_q13_partitions_every_customer(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.queries_ext import (
            q13_customer_distribution,
        )

        dist = q13_customer_distribution(spark, sf_dir).collect()
        n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
        n_ord = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
        assert sum(r["custdist"] for r in dist) == n_cust
        assert sum(r["c_count"] * r["custdist"] for r in dist) == n_ord

    def test_q15_returns_the_true_max(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from instacart_medallion_lakehouse_spark.functions.scalar import dround
        from instacart_medallion_lakehouse_spark.queries_ext import (
            q15_top_supplier,
        )

        rows = q15_top_supplier(spark, sf_dir).collect()
        assert len(rows) >= 1
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        best = (
            li.groupBy("l_suppkey")
            .agg(
                dround(
                    F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                    2,
                ).alias("rev")
            )
            .agg(F.max("rev"))
            .first()[0]
        )
        for r in rows:
            assert r["total_revenue"] == best

    def test_q22_result_customers_are_dormant(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from instacart_medallion_lakehouse_spark.queries_ext import (
            q22_prospect_balances,
        )

        out = q22_prospect_balances(spark, sf_dir)
        # every reported row aggregates only customers with no order on
        # or after 2000-01-01; re-derive the dormant set and cross-check
        # the total headcount
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        recent = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
            .select("o_custkey")
        )
        avg_bal = (
            cust.filter(F.col("c_acctbal") > 0.0)
            .agg(F.avg("c_acctbal"))
            .first()[0]
        )
        dormant = (
            cust.filter(F.col("c_nationkey").isin([0, 3, 7, 11, 14, 19, 23]))
            .filter(F.col("c_acctbal") > round(avg_bal, 4))
            .join(recent, cust["c_custkey"] == recent["o_custkey"], "left_anti")
            .count()
        )
        got = out.agg(F.sum("numcust")).first()[0] or 0
        assert got == dormant

    def test_q8_share_is_a_proportion_per_year(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.queries_ext import (
            q8_market_share,
        )

        rows = q8_market_share(spark, sf_dir).collect()
        assert [r["o_year"] for r in rows] == sorted(
            {r["o_year"] for r in rows}
        )
        for r in rows:
            assert r["o_year"] in (1996, 1997)
            assert 0.0 <= r["mkt_share"] <= 1.0

    def test_q17_threshold_filters_strictly(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.queries_ext import (
            q17_small_quantity_revenue,
        )

        row = q17_small_quantity_revenue(spark, sf_dir).first()
        # the small-quantity subset is a strict subset of the brand's
        # lineitems: revenue/7 must be positive but below the brand total
        from pyspark.sql import functions as F

        part = (
            spark.read.parquet(f"{sf_dir}/part.parquet")
            .filter(F.col("p_brand") == "Brand#13")
            .select("p_partkey")
        )
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        brand_total = (
            li.join(part, li["l_partkey"] == part["p_partkey"])
            .agg(F.sum("l_extendedprice"))
            .first()[0]
        )
        if row["n_items"] > 0:
            assert 0 < row["avg_yearly"] < brand_total
            assert row["n_items"] > 0


class TestRevenueTrend:
    def test_slope_matches_numpy_ols(self, spark, sf_dir):
        """Cross-check the closed-form integer OLS against numpy's
        lstsq on one nation's daily series."""
        import numpy as np

        from instacart_medallion_lakehouse_spark.queries_analytics import (
            revenue_trend_by_nation,
        )

        rows = revenue_trend_by_nation(spark, sf_dir).collect()
        assert len(rows) > 0
        target = rows[0]["nation"]
        from pyspark.sql import functions as F

        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        nat = spark.read.parquet(f"{sf_dir}/nation.parquet").filter(
            F.col("n_name") == target
        )
        o = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            )
            .join(cust, F.col("o_custkey") == F.col("c_custkey"))
            .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
            .select(
                F.datediff(
                    F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
                ).alias("x"),
                F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5)).alias("c"),
            )
            .groupBy("x")
            .agg(F.sum("c").alias("cents"))
            .collect()
        )
        x = np.array([r["x"] for r in o], dtype=float)
        y = np.array([r["cents"] for r in o], dtype=float) / 100.0
        slope = np.polyfit(x, y, 1)[0]
        got = rows[0]["slope_per_day"]
        assert abs(got - slope) < 1e-4


class TestForwardFill:
    def test_gaps_filled_with_latest_prior_value(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.queries_analytics import (
            forward_fill_values,
        )
        from instacart_medallion_lakehouse_spark.io import read_events

        out = forward_fill_values(spark, sf_dir)
        # replay one user's stream in Python
        from pyspark.sql import functions as F

        uid = out.first()["user_id"]
        ev = (
            read_events(spark, sf_dir)
            .filter(F.col("user_id") == uid)
            .orderBy("ts", "event_id")
            .collect()
        )
        got = {
            r["event_id"]: (r["was_gap"], r["filled_value"])
            for r in out.filter(F.col("user_id") == uid).collect()
        }
        last = None
        for r in ev:
            is_gap = r["event_id"] % 4 == 0
            if not is_gap:
                last = round(r["value"], 2)
            want = last  # gap rows carry the previous non-null (or None)
            wg, fv = got[r["event_id"]]
            assert wg == is_gap
            if want is None:
                assert fv is None
            else:
                assert abs(fv - want) < 1e-9


class TestClusterCanonicals:
    def test_one_canonical_per_cluster_and_it_is_the_best(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.queries_train import (
            cluster_canonicals,
        )

        rows = cluster_canonicals(spark, sf_dir).collect()
        by_cluster: dict[int, list] = {}
        for r in rows:
            by_cluster.setdefault(r["cluster"], []).append(r)
        for cluster, members in by_cluster.items():
            canon = [r for r in members if r["is_canonical"]]
            assert len(canon) == 1, cluster
            best = max(
                members, key=lambda r: (r["quality_score"], -r["doc_id"])
            )
            assert canon[0]["doc_id"] == best["doc_id"]


class TestDailyCorr:
    def test_matches_numpy_corrcoef(self, spark, sf_dir):
        import numpy as np
        from pyspark.sql import functions as F

        from instacart_medallion_lakehouse_spark.queries_analytics import (
            daily_count_revenue_corr,
        )

        row = daily_count_revenue_corr(spark, sf_dir).first()
        daily = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .groupBy("o_orderdate")
            .agg(
                F.count("*").alias("x"),
                F.sum(
                    F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
                ).alias("y"),
            )
            .collect()
        )
        x = np.array([r["x"] for r in daily], dtype=float)
        y = np.array([r["y"] for r in daily], dtype=float)
        r = np.corrcoef(x, y)[0, 1]
        assert row["n_days"] == len(daily)
        assert abs(row["pearson_r"] - r) < 1e-5


class TestTransitionMatrix:
    def test_rows_normalize_and_pairs_counted(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from instacart_medallion_lakehouse_spark.io import read_events
        from instacart_medallion_lakehouse_spark.queries_analytics import (
            event_transition_matrix,
        )

        rows = event_transition_matrix(spark, sf_dir).collect()
        by_src: dict[str, float] = {}
        total = 0
        for r in rows:
            by_src[r["src"]] = by_src.get(r["src"], 0.0) + r["p"]
            total += r["n"]
        for src, s in by_src.items():
            assert abs(s - 1.0) < 1e-4, src
        ev = read_events(spark, sf_dir)
        n_events = ev.count()
        n_users = ev.select("user_id").distinct().count()
        assert total == n_events - n_users  # one fewer pair than events/user


class TestRevenueGini:
    def test_matches_numpy_gini(self, spark, sf_dir):
        import numpy as np
        from pyspark.sql import functions as F

        from instacart_medallion_lakehouse_spark.queries_analytics import (
            revenue_gini,
        )

        row = revenue_gini(spark, sf_dir).first()
        cents = np.array(
            [
                r["c"]
                for r in spark.read.parquet(f"{sf_dir}/orders.parquet")
                .groupBy("o_custkey")
                .agg(
                    F.sum(
                        F.floor(F.col("o_totalprice") * 100.0 + F.lit(0.5))
                    ).alias("c")
                )
                .collect()
            ],
            dtype=float,
        )
        y = np.sort(cents)
        i = np.arange(1, len(y) + 1)
        gini = 2.0 * np.sum(i * y) / (len(y) * np.sum(y)) - (len(y) + 1.0) / len(y)
        assert 0.0 <= row["gini"] < 1.0
        assert abs(row["gini"] - gini) < 1e-6
        assert row["n_customers"] == len(y)


class TestUserBurstiness:
    def test_matches_numpy_population_cv(self, spark, sf_dir):
        import numpy as np
        from pyspark.sql import functions as F

        from instacart_medallion_lakehouse_spark.io import read_events
        from instacart_medallion_lakehouse_spark.queries_analytics import (
            user_burstiness,
        )

        rows = {r["user_id"]: r for r in user_burstiness(spark, sf_dir).collect()}
        assert rows
        uid = next(iter(rows))
        ev = (
            read_events(spark, sf_dir)
            .filter(F.col("user_id") == uid)
            .orderBy("ts", "event_id")
            .select(F.unix_timestamp("ts").alias("t"))
            .collect()
        )
        gaps = np.diff(np.array([r["t"] for r in ev], dtype=float))
        cv = gaps.std() / gaps.mean()  # population std
        got = rows[uid]
        assert got["n_gaps"] == len(gaps)
        assert abs(got["mean_gap_s"] - gaps.mean()) < 0.01
        assert abs(got["cv"] - cv) < 1e-3


class TestRound9PlanShapes:
    """Pin the round-9 rewrite plan shapes (VERDICT r8 items #3/#4):
    extra exchanges here are 100 TB cost bugs even when values stay
    right."""

    @staticmethod
    def _plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    @staticmethod
    def _hash_exchanges(plan):
        import re

        return len(
            set(
                re.findall(
                    r"Exchange hashpartitioning[^\n]*?\[plan_id=(\d+)\]",
                    plan,
                )
            )
        )

    def test_dedup_spans_text_three_shuffles_no_smj(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark import queries_text as qx

        plan = self._plan(qx.dedup_spans_text(spark, sf_dir))
        # window on h + two doc repartitionings; the (doc,pos) dedup,
        # the cover join, and the fused aggregate ride those
        assert self._hash_exchanges(plan) <= 3, plan
        assert "SortMergeJoin" not in plan, plan

    def test_lm_perplexity_reads_persisted_token_layer(
        self, spark, sf_dir
    ):
        from instacart_medallion_lakehouse_spark import queries_llm as ql

        plan = self._plan(ql.lm_perplexity(spark, sf_dir))
        # the per-doc token lead() window moved into the token_table
        # build; the query itself must scan the asset, not re-window
        assert "token_bigrams" in plan, plan
        assert "Window" not in plan, plan

    def test_pagerank_one_broadcast_per_iteration(self, spark, sf_dir):
        import re

        from instacart_medallion_lakehouse_spark import queries_ext as qe

        plan = self._plan(qe.pagerank_fuzzy(spark, sf_dir))
        n_bcast = len(
            set(
                re.findall(
                    r"BroadcastExchange[^\n]*?\[plan_id=(\d+)\]", plan
                )
            )
        )
        # 3 rank-vector broadcasts (one per iteration) + the outdegree
        # pre-join + the edge-builder's blocking-join broadcasts; the
        # old dangling-node reintroduction join would add one more per
        # iteration (10 total)
        assert n_bcast <= 7, plan
        # ...and that dropped join was the plan's ONLY outer join
        assert "LeftOuter" not in plan, plan
        try:
            from instacart_medallion_lakehouse_spark import queries as q

            q.release_pins()
        except Exception:
            pass
