"""Known-answer guards for the retrieval / privacy quartet (bm25_topk,
phrase_search, hybrid_rrf_topk, k_anonymity_profile) against pure-Python
references on tiny hand-built corpora — invariants the cross-engine
oracle cannot see because both engines could share the same
misunderstanding of BM25 / RRF / Jaccard.

Each test writes its corpus to a throwaway parquet dir shaped like a
testdata sf dir, so the registered query functions run their REAL plans
(explode -> agg -> broadcast join) end-to-end.
"""

from __future__ import annotations

import math
import re

import pytest

from instacart_medallion_lakehouse_spark.queries_text import (
    bm25_topk,
    hybrid_rrf_topk,
    k_anonymity_profile,
    phrase_search,
)

DOCS = [
    (0, "apple banana cherry apple durian"),
    (1, "banana banana cherry fig grape apple"),
    (2, "cherry fig grape honey iris apple banana"),
    (3, "durian durian durian apple"),
    (4, "fig grape honey iris jack"),
    (5, "apple banana apple banana apple banana"),
    (6, "honey iris jack kiwi lemon durian"),
    (7, "grape honey iris jack kiwi lemon mango"),
    (8, "apple cherry durian fig honey jack lemon"),
    (9, "banana cherry grape iris kiwi mango apple"),
    (10, "kiwi lemon mango apple banana cherry durian"),
    (11, "mango mango kiwi lemon jack iris honey grape fig"),
]


def _toks(text: str) -> list[str]:
    return re.split(r"\s+", text.strip())


def _write_docs(spark, path: str, rows=DOCS) -> None:
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{path}/documents.parquet")


class TestBm25:
    def test_matches_pure_python_reference(self, spark, tmp_path):
        _write_docs(spark, str(tmp_path))
        got = {
            r["doc_id"]: (r["score"], r["rank"])
            for r in bm25_topk(spark, str(tmp_path)).collect()
        }

        toks = {d: _toks(t) for d, t in DOCS}
        dl = {d: len(ts) for d, ts in toks.items()}
        n = len(DOCS)
        avgdl = sum(dl.values()) / n
        df: dict[str, int] = {}
        for ts in toks.values():
            for t in set(ts):
                df[t] = df.get(t, 0) + 1
        qterms = sorted(df, key=lambda t: (df[t], t))[:5]
        micro: dict[int, int] = {}
        for d, ts in toks.items():
            total = 0
            hit = False
            for q in qterms:
                tf = ts.count(q)
                if tf == 0:
                    continue
                hit = True
                idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
                c = idf * (tf * 2.2) / (
                    tf + 1.2 * (0.25 + 0.75 * dl[d] / avgdl)
                )
                total += math.floor(c * 1e6 + 0.5)
            if hit:
                micro[d] = total
        top = sorted(micro.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        want = {
            d: (m / 1e6, i + 1) for i, (d, m) in enumerate(top)
        }
        assert got == want

    def test_rarest_terms_beat_common_terms(self, spark, tmp_path):
        """A document made ONLY of the corpus's rarest term must outrank
        one made only of its most common term (idf separation — the
        point of BM25 over raw tf)."""
        rows = [(i, "common common common") for i in range(8)]
        rows.append((8, "rareword rareword rareword"))
        rows.append((9, "common rareword"))
        _write_docs(spark, str(tmp_path), rows)
        ranked = {
            r["doc_id"]: r["rank"]
            for r in bm25_topk(spark, str(tmp_path)).collect()
        }
        assert ranked[8] == 1


class TestPhraseSearch:
    def test_counts_planted_occurrences(self, spark, tmp_path):
        """Top trigram is the planted phrase; per-doc occurrence counts
        include overlapping repeats, and docs without the phrase are
        absent."""
        rows = [
            (0, "x y z x y z x y z"),  # "x y z" 3 times (positions 0,3,6)
            (1, "a x y z b"),  # once, mid-document
            (2, "x y q z"),  # broken phrase - no hit
            (3, "p q r s t"),  # unrelated
            (4, "x y z"),  # exactly the phrase
        ]
        _write_docs(spark, str(tmp_path), rows)
        out = phrase_search(spark, str(tmp_path)).collect()
        assert all(r["phrase"] == "x y z" for r in out)
        got = {r["doc_id"]: r["n_occ"] for r in out}
        assert got == {0: 3, 1: 1, 4: 1}

    def test_tie_breaks_lexicographically(self, spark, tmp_path):
        """Two trigrams with equal corpus counts: the lexicographically
        smallest wins, so the probe phrase is deterministic."""
        rows = [(0, "b b b"), (1, "a a a")]
        _write_docs(spark, str(tmp_path), rows)
        out = phrase_search(spark, str(tmp_path)).collect()
        assert [r["phrase"] for r in out] == ["a a a"]
        assert out[0]["doc_id"] == 1


class TestHybridRrf:
    def test_matches_pure_python_reference(self, spark, tmp_path):
        """Full pipeline vs a numpy/pure-Python restatement: quantized
        cosine ranking, token-set Jaccard ranking, integer-ppm RRF."""
        import numpy as np

        rng = [
            [round(math.sin(7 * i + 3 * d) / 2 + 0.5, 3) for d in range(8)]
            for i in range(12)
        ]
        _write_docs(spark, str(tmp_path))
        spark.createDataFrame(
            [(i, rng[i], i % 3) for i in range(12)],
            "vec_id long, embedding array<float>, label int",
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/embeddings.parquet"
        )
        got = {
            (r["query_id"], r["neighbor_id"]): (r["rrf_ppm"], r["rank"])
            for r in hybrid_rrf_topk(spark, str(tmp_path)).collect()
        }

        # dense ranks over quantized embeddings (float32 ingest, x1000)
        q = np.floor(
            np.array(rng, dtype=np.float32).astype(np.float64) * 1000 + 0.5
        )
        n2 = (q * q).sum(axis=1)
        dense_r: dict[tuple[int, int], int] = {}
        for a in range(10):
            cos = []
            for b in range(12):
                if b == a or n2[a] == 0 or n2[b] == 0:
                    continue
                cos.append((float(q[a] @ q[b]) / math.sqrt(n2[a] * n2[b]), b))
            order = sorted(cos, key=lambda cb: (-cb[0], cb[1]))[:20]
            for r, (_, b) in enumerate(order, 1):
                dense_r[(a, b)] = r
        # lexical ranks: token-set jaccard
        sets = {d: set(_toks(t)) for d, t in DOCS}
        lex_r: dict[tuple[int, int], int] = {}
        for a in range(10):
            js = []
            for b in sets:
                if b == a:
                    continue
                i = len(sets[a] & sets[b])
                if i == 0:
                    continue
                js.append((i / (len(sets[a]) + len(sets[b]) - i), b))
            order = sorted(js, key=lambda jb: (-jb[0], jb[1]))[:20]
            for r, (_, b) in enumerate(order, 1):
                lex_r[(a, b)] = r
        # fuse
        want: dict[tuple[int, int], tuple[int, int]] = {}
        for a in range(10):
            cands = {
                b for (x, b) in list(dense_r) + list(lex_r) if x == a
            }
            fused = []
            for b in cands:
                ppm = 0
                if (a, b) in dense_r:
                    ppm += 1000000 // (60 + dense_r[(a, b)])
                if (a, b) in lex_r:
                    ppm += 1000000 // (60 + lex_r[(a, b)])
                fused.append((ppm, b))
            top = sorted(fused, key=lambda pb: (-pb[0], pb[1]))[:5]
            for r, (ppm, b) in enumerate(top, 1):
                want[(a, b)] = (ppm, r)
        assert got == want


class TestKAnonymity:
    def test_hand_counted_profile(self, spark, tmp_path):
        """Cell sizes 1, 3 and 7: k=2 flags only the singleton, k=5
        flags the 1- and 3-cells, k=10 flags everything."""
        rows = (
            [(i, 1, "A") for i in range(7)]
            + [(i + 7, 1, "B") for i in range(3)]
            + [(10, 2, "A")]
        )
        spark.createDataFrame(
            rows, "c_custkey long, c_nationkey int, c_mktsegment string"
        ).coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/customer.parquet"
        )
        got = {
            r["k"]: (
                r["n_groups_below"],
                r["rows_at_risk"],
                r["pct_at_risk"],
            )
            for r in k_anonymity_profile(spark, str(tmp_path)).collect()
        }
        assert got == {
            2: (1, 1, round(1 / 11, 6)),
            5: (2, 4, round(4 / 11, 6)),
            10: (3, 11, 1.0),
        }


if __name__ == "__main__":
    raise SystemExit(pytest.main([__file__, "-q"]))
