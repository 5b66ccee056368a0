"""Query-scoped cache pinning (pins.py): internal ``.cache()`` pins are
registered and released on the next registry invocation, so a
sequential sweep of the registry holds at most ONE query's pins in
executor storage — no harness-side ``clearCache`` mop required.
"""

from __future__ import annotations

from instacart_medallion_lakehouse_spark import pins
from instacart_medallion_lakehouse_spark import queries as q

# registry queries whose plans take out internal cache pins (shingle /
# band / signature tables, symmetric edge lists, token explosions,
# quantized-code tables) — one per pinned-site family
CACHE_HEAVY = [
    "minhash_lsh_dedup",  # queries_text shingle pin
    "cms_heavy_hitters",  # queries_text token-explode pin
    "triangle_count",  # queries_ext edges pin
    "pagerank_fuzzy",  # queries_ext sym/deg/sym_od pins
    "dsir_weights",  # queries_llm tok pin
    "simhash_dedup",  # operators/dedup signature pin
    "ann_ivf_topk",  # operators/vectors raw/prep pins
]


def _cache_empty(spark) -> bool:
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


class TestPinRelease:
    def test_registry_invocation_releases_previous_pins(
        self, spark, sf_dir, monkeypatch
    ):
        # disable the persisted derived-table store: store-backed
        # shingles need no pin (round 10), so force the fallback path
        # this test exists to exercise
        monkeypatch.setenv("SPARK_GRAFT_SHARED_DIR", "")
        reg = q.queries()
        q.release_pins()
        spark.catalog.clearCache()
        reg["minhash_lsh_dedup"](spark, sf_dir).collect()
        # the query's own pins are still alive (its consumer just used
        # them); they are NOT leaked — the next registry call frees them
        assert pins.pinned_count() > 0
        assert not _cache_empty(spark)
        # a pin-free query's invocation releases the predecessor's pins
        reg["top_k"](spark, sf_dir).collect()
        assert pins.pinned_count() == 0
        assert _cache_empty(spark)

    def test_cache_heavy_sweep_leaves_no_residue(self, spark, sf_dir):
        """The 153-query-sweep regression: before pins.py, every one of
        these queries' internal caches stayed pinned for the whole
        session. Now storage never holds more than the current query's
        pins, and an explicit release empties the cache manager."""
        reg = q.queries()
        q.release_pins()
        spark.catalog.clearCache()
        high_water = 0
        for name in CACHE_HEAVY:
            reg[name](spark, sf_dir).collect()
            # only THIS query's pins are registered — predecessors were
            # released on entry
            high_water = max(high_water, pins.pinned_count())
            assert pins.pinned_count() <= 4
        assert high_water > 0  # the sweep actually exercised pinning
        q.release_pins()
        assert _cache_empty(spark)

    def test_direct_module_calls_do_not_release(self, spark, sf_dir):
        """Composition safety: only the REGISTRY face releases. A query
        that internally calls another query's module-level function must
        not have its own pins swept mid-build."""
        from instacart_medallion_lakehouse_spark.operators import dedup

        q.release_pins()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.8)
        n_before = pins.pinned_count()
        assert n_before > 0
        # a direct (unwrapped) module call leaves existing pins alone
        dedup.ngram_jaccard_pairs(docs, threshold=0.8)
        assert pins.pinned_count() >= n_before
        pairs.collect()  # pins still serve the earlier plan
        assert q.release_pins() >= n_before

    def test_unpin_removes_single_entry(self, spark, sf_dir):
        q.release_pins()
        df = pins.pin(spark.read.parquet(f"{sf_dir}/region.parquet"))
        df.count()
        assert pins.pinned_count() == 1
        pins.unpin(df)
        assert pins.pinned_count() == 0
        pins.unpin(df)  # double-unpin is a no-op, not an error
        assert q.release_pins() == 0
