"""Vector-similarity operator tests: cosine math vs numpy, top-k
ranking on crafted vectors, LSH bucket determinism and recall.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from instacart_medallion_lakehouse_spark.operators import vectors


@pytest.fixture(scope="module")
def emb(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9999, 0.001, 0.0, 0.0]),  # ~identical to 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal to 0
        (3, [-1.0, 0.0, 0.0, 0.0]),  # opposite of 0
        (4, [0.7071, 0.7071, 0.0, 0.0]),  # 45 degrees from 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestCosineMath:
    def test_matches_numpy_on_quantized(self, spark, emb):
        out = vectors.cosine_neardup_pairs(emb, threshold=-2.0).collect()
        got = {(r["id_a"], r["id_b"]): r["cos_sim"] for r in out}
        vecs = {
            r["vec_id"]: np.floor(np.array(r["embedding"], dtype=np.float64) * 1000 + 0.5)
            for r in emb.collect()
        }
        for (a, b), c in got.items():
            va, vb = vecs[a], vecs[b]
            expect = float(va @ vb) / math.sqrt(float(va @ va) * float(vb @ vb))
            assert c == pytest.approx(expect, abs=1e-6)

    def test_neardup_threshold(self, emb):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in vectors.cosine_neardup_pairs(emb, threshold=0.95).collect()
        }
        assert pairs == {(0, 1)}


class TestBruteForceTopk:
    def test_ranking(self, emb):
        out = vectors.brute_force_topk(emb, query_ids_max=1, k=4).collect()
        ranked = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
        # for query 0: nearest is 1 (~1.0), then 4 (0.707), then 2 (0.0), then 3 (-1)
        assert ranked == [1, 4, 2, 3]

    def test_k_limits_output(self, emb):
        out = vectors.brute_force_topk(emb, query_ids_max=2, k=2).collect()
        assert len(out) == 4  # 2 queries x k=2


class TestLsh:
    def test_bucket_deterministic(self, spark, emb):
        q = vectors.quantized(F.col("embedding"))
        b1 = emb.select(vectors.lsh_bucket(q, 4).alias("b")).collect()
        b2 = emb.select(vectors.lsh_bucket(q, 4).alias("b")).collect()
        assert [r["b"] for r in b1] == [r["b"] for r in b2]
        assert all(0 <= r["b"] < 16 for r in b1)

    def test_collinear_vectors_share_bucket(self, spark):
        # exact positive scalar multiples project with the same sign on
        # every hyperplane → identical bucket, guaranteed (cosine≈1 alone
        # is only probabilistic for vectors near a plane)
        rows = [(i, [(j + 1.0) * (1 + i) for j in range(8)]) for i in range(3)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        q = vectors.quantized(F.col("embedding"))
        buckets = {r["b"] for r in df.select(vectors.lsh_bucket(q, 4).alias("b")).collect()}
        assert len(buckets) == 1

    def test_lsh_topk_subset_of_brute_force_scores(self, emb):
        brute = {
            (r["query_id"], r["neighbor_id"]): r["cos_sim"]
            for r in vectors.brute_force_topk(emb, query_ids_max=1, k=4).collect()
        }
        lsh = vectors.lsh_topk(emb, query_ids_max=1, k=4).collect()
        for r in lsh:
            key = (r["query_id"], r["neighbor_id"])
            assert brute[key] == r["cos_sim"]  # same cosine, bucket-restricted set


class TestIvf:
    def test_ivf_scores_consistent_with_brute_force(self, emb):
        brute = {
            (r["query_id"], r["neighbor_id"]): r["cos_sim"]
            for r in vectors.brute_force_topk(emb, query_ids_max=1, k=4).collect()
        }
        ivf = vectors.ivf_topk(
            emb, k_clusters=2, iterations=1, probe=1, query_ids_max=1, k=4
        ).collect()
        assert 0 < len(ivf) <= 4
        for r in ivf:
            key = (r["query_id"], r["neighbor_id"])
            # same pair -> identical exact cosine; IVF only restricts the set
            assert brute[key] == r["cos_sim"]

    def test_ivf_ranks_are_dense_and_ordered(self, emb):
        out = vectors.ivf_topk(
            emb, k_clusters=2, iterations=2, probe=2, query_ids_max=2, k=4
        ).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r)
        for rows in by_q.values():
            rows.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
            cs = [r["cos_sim"] for r in rows]
            assert cs == sorted(cs, reverse=True)


class TestSemanticDedup:
    def test_invariants(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.operators.vectors import (
            semantic_dedup,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        out = semantic_dedup(emb, k_clusters=8, iterations=1, threshold=0.4)
        rows = out.collect()
        # every non-zero vector appears exactly once
        assert len({r.vec_id for r in rows}) == len(rows) == emb.count()
        # the smallest id in each cluster can never be dropped (no
        # smaller-id witness exists)
        by_cluster: dict[int, list] = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r)
        for rs in by_cluster.values():
            head = min(rs, key=lambda r: r.vec_id)
            assert head.is_kept


class TestSq8TopK:
    def test_recall_vs_exact(self, spark, sf_dir):
        """int8 + exact-re-rank must recover (nearly) the exact top-5:
        quantization error on unit vectors is <= 1/254 per component,
        and the 4x over-fetch re-rank absorbs boundary flips. On this
        corpus recall@5 should be essentially perfect; demand >= 0.9
        to leave room for genuine boundary ties."""
        from instacart_medallion_lakehouse_spark.operators import vectors

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in vectors.brute_force_topk(emb, 10, 5).collect()
        }
        sq8 = {
            (r["query_id"], r["neighbor_id"])
            for r in vectors.sq8_topk(emb, 10, 5, refine=4).collect()
        }
        assert len(sq8 & exact) / len(exact) >= 0.9

    def test_codes_are_int8_range(self, spark, sf_dir):
        from pyspark.sql import functions as F

        from instacart_medallion_lakehouse_spark.operators import vectors

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        prep = vectors._prep(emb, "vec_id", "embedding")
        codes = prep.select(
            vectors.sq8_codes(F.col("_q"), F.col("_n2")).alias("c")
        )
        bad = codes.filter(
            F.exists(F.col("c"), lambda x: (x > 127) | (x < -127))
        ).count()
        assert bad == 0


class TestPqTopK:
    def test_recall_vs_exact(self, spark, sf_dir):
        """PQ is the lossiest of the ANN family (codes drop within-cell
        geometry), but the 8x over-fetch + exact re-rank should still
        recover most of the exact top-5 on this corpus. Demand >= 0.5
        recall@5 — the point of the test is 'the candidate generator is
        not broken', the exactness guarantees live in the oracle twin."""
        from instacart_medallion_lakehouse_spark.operators import vectors

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in vectors.brute_force_topk(emb, 10, 5).collect()
        }
        pq = {
            (r["query_id"], r["neighbor_id"])
            for r in vectors.pq_topk(emb, m=4, k_codes=16, iterations=1,
                                     query_ids_max=10, k=5, refine=8).collect()
        }
        assert len(pq & exact) / len(exact) >= 0.5

    def test_output_shape_and_ranks(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.operators import vectors

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        rows = vectors.pq_topk(emb, query_ids_max=5, k=3).collect()
        assert {r["query_id"] for r in rows} <= set(range(5))
        by_q: dict[int, list] = {}
        for r in rows:
            assert r["neighbor_id"] != r["query_id"]
            by_q.setdefault(r["query_id"], []).append(r)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r["rank"])
            assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
            sims = [r["cos_sim"] for r in rs]
            assert sims == sorted(sims, reverse=True)


class TestSemanticContamination:
    def test_counts_match_brute_force_replay(self, spark, sf_dir):
        """Replay contamination with an independent all-pairs cosine
        (exact, quantized) and demand identical counts."""
        from pyspark.sql import functions as F

        from instacart_medallion_lakehouse_spark.operators import vectors
        from instacart_medallion_lakehouse_spark.queries_text import (
            semantic_contamination,
        )

        row = semantic_contamination(spark, sf_dir).first()
        prep = vectors._prep(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            "vec_id",
            "embedding",
        )
        bench = prep.filter("vec_id < 10").select(
            F.col("_q").alias("_bq"), F.col("_n2").alias("_bn2")
        )
        corpus = prep.filter("vec_id >= 10")
        cos = vectors.cosine(
            F.col("_bq"), F.col("_q"), F.col("_bn2"), F.col("_n2")
        )
        contaminated = (
            corpus.crossJoin(bench)
            .filter(cos >= 0.4)
            .select("vec_id")
            .distinct()
            .count()
        )
        assert row["n_contaminated"] == contaminated
        assert row["n_corpus"] == corpus.count()
