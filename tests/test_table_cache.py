"""S9 cross-query table cache (queries.enable_table_cache).

The reference pins hot Silver tables across its five gold jobs
(03_gold_metrics.py:42-44); our equivalent is an opt-in registry-wide
table cache. Contract: enabling changes no results, pins source tables
in memory for reuse across queries, and disabling drains every entry.
"""

from __future__ import annotations

from instacart_medallion_lakehouse_spark import queries as q


class TestTableCache:
    def test_cache_round_trip_same_results_and_drained(self, spark, sf_dir):
        run = q.queries()["region_performance"]
        baseline = sorted(tuple(r) for r in run(spark, sf_dir).collect())

        q.enable_table_cache(True)
        try:
            cached_rows = sorted(tuple(r) for r in run(spark, sf_dir).collect())
            assert cached_rows == baseline
            assert q._TABLE_CACHE, "cache enabled but no table was pinned"
            assert all(
                df.storageLevel.useMemory for df in q._TABLE_CACHE.values()
            )
            # a second query sharing tables reuses the pinned entries:
            # the shared (sf_dir, table) keys must not be re-created
            before = dict(q._TABLE_CACHE)
            q.queries()["top_k"](spark, sf_dir).collect()
            for key, df in before.items():
                assert q._TABLE_CACHE[key] is df, f"{key} was re-cached"
        finally:
            q.enable_table_cache(False)
        assert not q._TABLE_CACHE
