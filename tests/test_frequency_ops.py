"""Round-4 additions: count-min heavy hitters, Zipf slope, hopping
windows (batch/stream equivalence), grouped top-k with OTHER rollup."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from instacart_medallion_lakehouse_spark import queries_analytics, queries_ext
from instacart_medallion_lakehouse_spark import queries_text as qt


class TestCmsHeavyHitters:
    def test_estimate_never_undercounts(self, spark, sf_dir):
        """CMS is a provable overcount: min-over-rows of buckets that
        absorbed every colliding token's increments."""
        rows = qt.cms_heavy_hitters(spark, sf_dir).collect()
        assert len(rows) == 20
        for r in rows:
            assert r["cms_estimate"] >= r["exact_count"], r

    def test_top20_descending_exact(self, spark, sf_dir):
        counts = [r["exact_count"] for r in qt.cms_heavy_hitters(spark, sf_dir).collect()]
        assert counts == sorted(counts, reverse=True)

    def test_sketch_bucket_range(self, spark):
        """The bucket expression stays inside [0, width) for arbitrary
        tokens, including the empty string."""
        df = spark.createDataFrame(
            [("",), ("a",), ("Zz9!",), ("the",)], "tok string"
        ).select(
            *[qt._cms_bucket(i, F.col("tok")).alias(f"b{i}") for i in range(4)]
        )
        for r in df.collect():
            for i in range(4):
                assert 0 <= r[f"b{i}"] < qt._CMS_WIDTH


class TestZipfSlope:
    def test_slope_negative_and_bounded(self, spark, sf_dir):
        r = qt.zipf_slope(spark, sf_dir).collect()[0]
        # top-200 cap: at tiny SFs the vocabulary itself is smaller
        assert 2 <= r["n_terms"] <= 200
        assert r["top_freq"] >= 1
        # frequency decreases with rank: slope strictly negative; natural
        # or synthetic text stays in a sane band (not -20, not 0)
        assert -5.0 < r["zipf_slope"] < 0.0

    def test_rank_tie_invariance(self, spark):
        """Tokens with equal frequency share a frequency value, so which
        of them takes which rank cannot change the slope: two corpora
        differing only in the ORDER equal-frequency tokens appear must
        produce the identical slope."""
        docs_a = spark.createDataFrame(
            [(1, "aa aa aa bb bb cc"), (2, "dd ee")],
            "doc_id long, text string",
        )
        docs_b = spark.createDataFrame(
            [(1, "aa aa aa bb bb dd"), (2, "cc ee")],
            "doc_id long, text string",
        )
        import os
        import tempfile

        with tempfile.TemporaryDirectory() as d:
            for name, df in (("a", docs_a), ("b", docs_b)):
                df.write.parquet(os.path.join(d, name, "documents.parquet"))
            # bypass the registry loader cache by reading directly
            def slope(sub):
                toks = (
                    spark.read.parquet(os.path.join(d, sub, "documents.parquet"))
                    .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
                )
                counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
                top = counts.orderBy(F.col("c").desc(), "tok").limit(200)
                from pyspark.sql import Window

                ranked = top.withColumn(
                    "r",
                    F.row_number().over(Window.orderBy(F.col("c").desc(), "tok")),
                )
                lr, lc = F.log(F.col("r")), F.log(F.col("c"))
                return ranked.agg(
                    (F.covar_pop(lr, lc) / F.var_pop(lr)).alias("s")
                ).collect()[0]["s"]

            assert slope("a") == pytest.approx(slope("b"), abs=1e-12)


class TestHoppingWindows:
    def test_stream_equals_batch_union_formulation(self, spark, sf_dir):
        """The drained hopping stream must equal the batch UNION-of-two-
        tumbling-bucketings formulation row for row."""
        from instacart_medallion_lakehouse_spark.functions.scalar import dround
        from instacart_medallion_lakehouse_spark.io import read_events

        got = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in queries_ext.stream_hopping_events(spark, sf_dir).collect()
        }
        ev = read_events(spark, sf_dir)
        panes = ev.select(
            F.date_trunc("hour", "ts").alias("window_start"), "event_type", "value"
        ).unionByName(
            ev.select(
                (F.date_trunc("hour", "ts") - F.expr("INTERVAL 1 HOUR")).alias(
                    "window_start"
                ),
                "event_type",
                "value",
            )
        )
        want = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
            for r in panes.groupBy("window_start", "event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                dround(F.sum("value"), 2).alias("total_value"),
            )
            .collect()
        }
        assert got == want

    def test_every_event_in_exactly_two_panes(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.io import read_events

        n_events = read_events(spark, sf_dir).count()
        total = (
            queries_ext.stream_hopping_events(spark, sf_dir)
            .agg(F.sum("n_events"))
            .collect()[0][0]
        )
        assert total == 2 * n_events


class TestTopBrandsPerNation:
    def test_at_most_three_named_plus_other(self, spark, sf_dir):
        rows = queries_analytics.top_brands_per_nation(spark, sf_dir).collect()
        per_nation: dict[str, list] = {}
        for r in rows:
            per_nation.setdefault(r["nation_name"], []).append(r)
        for nation, rs in per_nation.items():
            named = [r for r in rs if r["brand_label"] != "OTHER"]
            other = [r for r in rs if r["brand_label"] == "OTHER"]
            assert len(named) <= 3, nation
            assert len(other) <= 1, nation
            for r in named:
                assert r["n_brands"] == 1

    def test_other_reconciles_brand_count(self, spark, sf_dir):
        """No brand silently dropped: per nation, named rows + the OTHER
        row's n_brands add up to the nation's full distinct brand count."""
        from instacart_medallion_lakehouse_spark.queries import _t

        li = _t(spark, sf_dir, "lineitem")
        orders = _t(spark, sf_dir, "orders")
        cust = _t(spark, sf_dir, "customer")
        nation = _t(spark, sf_dir, "nation")
        part = _t(spark, sf_dir, "part")
        want = {
            r["n_name"]: r["nb"]
            for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .join(nation, cust.c_nationkey == nation.n_nationkey)
            .join(part, li.l_partkey == part.p_partkey)
            .groupBy("n_name")
            .agg(F.countDistinct("p_brand").alias("nb"))
            .collect()
        }
        got: dict[str, int] = {}
        for r in queries_analytics.top_brands_per_nation(spark, sf_dir).collect():
            got[r["nation_name"]] = got.get(r["nation_name"], 0) + r["n_brands"]
        assert got == want
