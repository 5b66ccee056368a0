"""Property-based tests (hypothesis) for the cross-engine determinism
invariants the whole oracle strategy rests on — a test dimension the
reference doesn't have (SURVEY.md §5: no property tests there).
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from instacart_medallion_lakehouse_spark import quality
from instacart_medallion_lakehouse_spark.quality import DataQualityError


def dround_py(x: float, d: int) -> float:
    f = float(10**d)
    return math.floor(x * f + 0.5) / f


class TestDroundCrossEngine:
    """floor(x*10^d + 0.5)/10^d must agree bit-for-bit between Python
    (spec), DuckDB (oracle), and Spark (engine; covered indirectly by
    the 35 hash-matched queries — here we pin Python==DuckDB so the
    formula itself is engine-stable)."""

    @settings(max_examples=200, deadline=None)
    @given(
        st.floats(
            min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
        ),
        st.integers(min_value=0, max_value=6),
    )
    def test_duckdb_matches_python(self, x, d):
        f = float(10**d)
        # bind x as a parameter: a textual float literal parses as
        # DECIMAL, and wide decimal mantissas (> 2^53) convert to double
        # with 1-ulp error — engine columns arrive bit-exact from
        # parquet, which parameter binding models correctly
        got = duckdb.execute(
            f"SELECT floor(? * {f} + 0.5) / {f} AS v", [x]
        ).fetchone()[0]
        assert got == dround_py(x, d)

    @settings(max_examples=100, deadline=None)
    @given(st.integers(min_value=0, max_value=10**15))
    def test_quantized_integer_sums_are_exact(self, n):
        # integer-valued doubles below 2^53 are exact — the invariant
        # that makes dot products order-independent
        assert float(n) == n or n > 2**53


class TestGateProperties:
    @settings(max_examples=100, deadline=None)
    @given(st.integers(min_value=1, max_value=10**9), st.integers(min_value=0, max_value=10**9))
    def test_reconcile_monotone_in_threshold(self, src, tgt):
        drift = abs(tgt - src) / src
        # passes at any threshold >= drift, raises one ulp below
        assert quality.reconcile_row_counts(src, tgt, drift) == pytest.approx(drift)
        if drift > 0:
            with pytest.raises(DataQualityError):
                quality.reconcile_row_counts(
                    src, tgt, math.nextafter(drift, -math.inf)
                )

    @settings(max_examples=50, deadline=None)
    @given(st.integers(min_value=0, max_value=100))
    def test_nonzero_gate(self, n):
        if n == 0:
            with pytest.raises(DataQualityError):
                quality.assert_row_count_nonzero(n)
        else:
            quality.assert_row_count_nonzero(n)


class TestJaccardIdentities:
    @settings(max_examples=100, deadline=None)
    @given(
        st.sets(st.text(alphabet="abcde", min_size=1, max_size=3), min_size=1, max_size=20),
        st.sets(st.text(alphabet="abcde", min_size=1, max_size=3), min_size=1, max_size=20),
    )
    def test_common_count_formula(self, a, b):
        # |A∪B| = |A|+|B|-|A∩B| — the identity the pair verifier uses
        common = len(a & b)
        assert len(a | b) == len(a) + len(b) - common
        j = common / (len(a) + len(b) - common)
        assert 0.0 <= j <= 1.0
        if a == b:
            assert j == 1.0


class TestAsOfJoinProperty:
    @settings(max_examples=20, deadline=None)
    @given(
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 50)),
            min_size=1,
            max_size=15,
        ),
        st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 50)),
            min_size=0,
            max_size=15,
        ),
    )
    def test_matches_python_reference(self, spark, lefts, rights):
        from instacart_medallion_lakehouse_spark.operators.joins import as_of_join

        lrows = [(k, ts, i) for i, (k, ts) in enumerate(lefts)]
        rrows = [(k, ts, float(i), 1000 + i) for i, (k, ts) in enumerate(rights)]
        ldf = spark.createDataFrame(lrows, "k long, ts long, lid long")
        rdf = spark.createDataFrame(rrows, "k long, ts long, v double, rid long")
        got = {
            r["lid"]: r["asof_v"]
            for r in as_of_join(
                ldf, rdf, on=["k"], ts_col="ts", right_cols=["v"],
                tie_col="lid", right_tie_col="rid",
            ).collect()
        }
        for k, ts, lid in lrows:
            cands = [(rts, rid, v) for (rk, rts, v, rid) in rrows if rk == k and rts <= ts]
            want = max(cands, default=None, key=lambda c: (c[0], c[1]))
            assert got[lid] == (want[2] if want else None)


class TestWinnowingModelEquivalence:
    def test_spark_matches_pure_python_model_on_random_docs(self, spark):
        """Third-opinion check: the Spark winnowing pipeline vs an
        independent pure-Python implementation of the algorithm over
        seeded random documents (the DuckDB oracle is the second
        opinion; three implementations agreeing rules out a shared
        formulation bug in the SQL twins)."""
        import hashlib
        import random
        import unittest.mock as mock

        from instacart_medallion_lakehouse_spark import queries_text as qt

        rng = random.Random(42)
        vocab = [f"tok{i}" for i in range(30)]
        docs = []
        for doc_id in range(120):
            n = rng.randint(0, 40)  # includes docs too short for any k-gram
            docs.append((doc_id, " ".join(rng.choice(vocab) for _ in range(n))))
        df = spark.createDataFrame(docs, "doc_id long, text string")

        with mock.patch.object(qt, "_t", lambda s, d, nm: df):
            got = {
                r.doc_id: (r.n_kgrams, r.n_fingerprints, r.min_fp)
                for r in qt.winnowing_fingerprints(spark, "ignored").collect()
            }

        K, W = 4, 4
        want = {}
        for doc_id, text in docs:
            toks = text.split() if text.strip() else []
            kgrams = [
                hashlib.md5(" ".join(toks[i : i + K]).encode()).hexdigest()[:16]
                for i in range(len(toks) - K + 1)
            ]
            if not kgrams:
                continue  # absent from output, like the oracle
            sel = {
                min(kgrams[i : i + W]) for i in range(len(kgrams) - W + 1)
            }
            want[doc_id] = (
                len(kgrams),
                len(sel),
                min(sel) if sel else None,
            )
        assert got == want


class TestGlobalRowNumberProperty:
    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-100, max_value=100),
            min_size=1,
            max_size=60,
        )
    )
    def test_matches_python_sort(self, spark, vals):
        """Random value lists (duplicates likely): the distributed
        two-pass rank must equal the position in a Python stable sort
        keyed (value, unique id) — the same total order."""
        from instacart_medallion_lakehouse_spark.operators.windows import (
            global_row_number,
        )

        rows = [(i, v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(rows, "id long, v long")
        got = {
            r["id"]: r["rnk"]
            for r in global_row_number(df, ["v", "id"], "rnk", 4).collect()
        }
        want = {
            rid: pos + 1
            for pos, (v, rid) in enumerate(sorted((v, i) for i, v in rows))
        }
        assert got == want


class TestMixtureTemperatureProperty:
    @settings(max_examples=15, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=1, max_value=10**6), min_size=1, max_size=6
        )
    )
    def test_weights_are_normalized_and_flattening(self, counts):
        """The quantized-integer partition function must still produce
        a (near-)normalized distribution, and temperature < 1 must
        compress ratios: max(q)/min(q) <= max(p)/min(p)."""
        import math

        ws = [math.floor(((n / sum(counts)) ** 0.3) * 1e6 + 0.5) for n in counts]
        z = sum(ws)
        qs = [w / z for w in ws]
        assert abs(sum(qs) - 1.0) < 1e-9
        ps = [n / sum(counts) for n in counts]
        if min(ps) > 0 and min(qs) > 0:
            assert max(qs) / min(qs) <= max(ps) / min(ps) + 1e-6


class TestBandJoinBinLemma:
    """The correctness core of operators/rangejoin.band_join: with bin
    width >= the band radius, any pair within the band differs by at
    most one bin — so probing bin-1/bin/bin+1 misses nothing. Pure
    integer math, so the property is testable without Spark."""

    @settings(max_examples=500, deadline=None)
    @given(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.integers(min_value=-(2**32), max_value=2**32),
        st.integers(min_value=1, max_value=2**40),
        st.integers(min_value=0, max_value=2**40),
    )
    def test_adjacent_bins_cover_band(self, a, gap, delta, extra):
        width = delta + extra  # the full width >= delta contract
        b = a + max(-delta, min(delta, gap))  # |a-b| <= delta
        assert abs(a - b) <= delta
        # exact integer floor division (Python // is the spec; the
        # operator's (x - pmod(x,w)) div w equals it — see
        # test_rangejoin.test_bin_expression_is_exact_for_huge_longs
        # for the Spark-side pin at > 2^53 magnitudes where
        # floor(double/double) would diverge)
        assert abs(a // width - b // width) <= 1

    @settings(max_examples=200, deadline=None)
    @given(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.integers(min_value=1, max_value=2**40),
        st.integers(min_value=1, max_value=3),
    )
    def test_outside_wide_band_never_matches_residual(self, a, width, k):
        """Rows farther apart than delta may still share adjacent bins —
        the residual predicate, not the binning, is the filter. Sanity:
        a pair more than 2*width apart can never be bin-adjacent, so
        the 3-bin probe also bounds false candidates."""
        b = a + 2 * width + k
        assert abs(a // width - b // width) >= 2


class TestCappedJaccardReference:
    """ngram_jaccard_pairs_capped vs an independent pure-Python replay:
    random tiny corpora, random df cap — the Spark plan (anti-join on
    the pinned hot set + one-pass intersection count) must equal exact
    capped-universe Jaccard computed set-theoretically in Python."""

    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.sampled_from("alpha beta gamma delta eps zeta".split()),
                min_size=3,
                max_size=10,
            ),
            min_size=2,
            max_size=6,
        ),
        st.integers(1, 6),
    )
    def test_matches_python_reference(self, spark, corpora, cap):
        from instacart_medallion_lakehouse_spark.operators.dedup import (
            ngram_jaccard_pairs_capped,
            shingle_table,
        )
        from instacart_medallion_lakehouse_spark.pins import release_pins

        rows = [(i, " ".join(toks)) for i, toks in enumerate(corpora)]
        # python reference: distinct 3-shingles, df cap, exact jaccard
        sh = {
            i: {
                " ".join(toks[j : j + 3])
                for j in range(len(toks) - 2)
            }
            for i, toks in enumerate(corpora)
        }
        from collections import Counter

        df_counts = Counter(s for ss in sh.values() for s in ss)
        capped = {
            i: {s for s in ss if df_counts[s] <= cap}
            for i, ss in sh.items()
        }
        expect = {}
        ids = sorted(sh)
        for ai in range(len(ids)):
            for bi in range(ai + 1, len(ids)):
                a, b = capped[ids[ai]], capped[ids[bi]]
                common = len(a & b)
                union = len(a | b)
                if common and union:
                    j = common / union
                    # mirror dround(j, 6) >= 0.5 (round-half-up at 6dp)
                    import math

                    jr = math.floor(j * 1e6 + 0.5) / 1e6
                    if jr >= 0.5:
                        expect[(ids[ai], ids[bi])] = jr
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        ex = shingle_table(docs, 3, "doc_id")
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in ngram_jaccard_pairs_capped(
                ex, threshold=0.5, max_df=cap
            ).collect()
        }
        release_pins()
        assert got == expect


class TestHammingBandRecall:
    """hamming_band_pairs' pigeonhole guarantee, adversarially checked:
    for random 56-bit signatures, EVERY pair with Hamming <= 3 must be
    found (recall 1), and nothing above the budget may appear —
    compared against a brute-force pure-Python scan."""

    @settings(max_examples=6, deadline=None)
    @given(
        st.lists(
            st.integers(0, (1 << 56) - 1), min_size=2, max_size=14
        ),
        st.integers(0, 3),
    )
    def test_matches_brute_force(self, spark, hashes, max_h):
        from instacart_medallion_lakehouse_spark.operators.dedup import (
            hamming_band_pairs,
        )
        from instacart_medallion_lakehouse_spark.pins import release_pins

        rows = [(i, h) for i, h in enumerate(hashes)]
        expect = {}
        for i in range(len(hashes)):
            for j in range(i + 1, len(hashes)):
                d = bin(hashes[i] ^ hashes[j]).count("1")
                if d <= max_h:
                    expect[(i, j)] = d
        sig = spark.createDataFrame(rows, "doc_id long, h long")
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in hamming_band_pairs(
                sig, "h", n_bands=4, band_bits=14, max_hamming=max_h
            ).collect()
        }
        release_pins()
        assert got == expect
