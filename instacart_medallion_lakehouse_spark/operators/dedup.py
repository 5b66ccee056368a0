"""Document deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard.

The training-data-pipeline extension surface (engine north star; the
reference's only dedup is the row-level PK dedup of SURVEY.md §2.5 W1).
Every operator here is built from Catalyst expressions + at most one
candidate-generation join — no Python UDFs, no driver-side loops.

Scale architecture (the part that matters at 100 TB):
- Signatures (minhash, simhash, fingerprints) are computed as ARRAY
  expressions inside the document scan — zero shuffles, linear work,
  whole-stage codegen. A 100 TB corpus signature pass is
  embarrassingly parallel.
- Candidate generation is an equi-join on hash-derived band/bucket
  keys — the ONLY shuffle, and it moves (key, doc_id, small signature)
  pairs, never document text. This is the canonical MinHash-LSH band
  trick: pair candidates meet in a bucket, everything else never
  meets, so the O(n²) pair space is never materialized.
- Verification (exact Jaccard / Hamming) runs only on candidate pairs.

Determinism: all hashes derive from md5 (identical lowercase hex on
Spark and DuckDB), so signatures, buckets, candidates, and verified
pair sets are engine-independent — the DuckDB oracle reproduces them
exactly (see queries.py for the SQL twins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import dround
from ..functions.text import fingerprint, token_shingles, tokens

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content fingerprint (md5 of normalized text).

    Adds ``fingerprint``, ``canonical_doc_id`` (min id in the group) and
    ``is_duplicate``. One shuffle on the fingerprint (high cardinality →
    no skew). The min-id window is a groupBy-min in disguise; we keep
    the window so callers retain every row (flagging, not dropping —
    dropping is a .filter away).
    """
    w = Window.partitionBy("fingerprint")
    return (
        docs.withColumn("fingerprint", fingerprint(F.col("text")))
        .withColumn("canonical_doc_id", F.min(id_col).over(w))
        .withColumn("is_duplicate", F.col(id_col) != F.col("canonical_doc_id"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact near-dup, inverted-index candidate join)
# ---------------------------------------------------------------------------


def _with_shingles(docs: DataFrame, n: int, id_col: str) -> DataFrame:
    return docs.select(
        F.col(id_col),
        token_shingles(tokens(F.col("text")), n).alias("shingles"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """All pairs with n-token-shingle Jaccard >= threshold.

    Candidate generation is an inverted-index self-join: explode
    shingles, join docs sharing at least one shingle (id_a < id_b),
    de-dup the candidate pair list, then verify Jaccard exactly on the
    (small, distinct) shingle arrays with array_intersect/array_union.

    Scale: the exploded join shuffles (shingle, id) pairs — text never
    moves. A shingle shared by k docs yields k² candidate pairs, so a
    stop-shingle cap would be the next knob at 100 TB (not needed at
    test SF). For lower candidate volume use minhash_lsh_pairs.
    """
    sh = _with_shingles(docs, n, id_col).cache()
    exploded = sh.select(
        F.col(id_col).alias("_id"), F.explode("shingles").alias("_sh")
    )
    cand = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a._sh") == F.col("b._sh")) & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    a = sh.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jacc = inter.cast("double") / union.cast("double")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", dround(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


def minhash_signature(shingles: Column, num_hashes: int = 16) -> list[Column]:
    """k seeded minhashes of a shingle array, zero shuffles.

    Hash family: md5(seed || '_' || shingle), min taken LEXICOGRAPHICALLY
    over the hex strings — uniform over shingles, identical on both
    engines, and needs no hex→int conversion (string min is the min of
    the underlying 128-bit value for fixed-width hex).

    NB: the seed is captured via a closure FACTORY, never a lambda
    default arg — PySpark derives the higher-order-function arity from
    the lambda's parameter count, so ``lambda s, i=i`` would silently
    become the 2-arg (element, index) form and bind i to the array index.
    """

    def hash_with_seed(i: int):
        return lambda s: F.md5(F.concat(F.lit(f"{i}_"), s))

    return [
        F.array_min(F.transform(shingles, hash_with_seed(i))).alias(f"sig_{i}")
        for i in range(num_hashes)
    ]


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    band_rows: int = 2,
    threshold: float = 0.5,
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via MinHash signatures + LSH banding + exact verify.

    Pipeline (shuffle count in brackets):
      1. shingle + k-minhash signature per doc       [0 — scan-local]
      2. band keys: md5(sig_i .. sig_{i+r-1}), b = k/r bands
      3. explode bands, self-join on (band_idx, key) [1 — the LSH trick]
      4. exact Jaccard verify on candidate pairs     [2 — small join]

    With k=16, r=2, b=8: P(candidate | j) = 1-(1-j²)⁸ → 0.9997 at j=0.8,
    0.90 at j=0.5, ~0.003 at j=0.02 — planted near-dups are found with
    near-certainty while the candidate volume stays linear-ish.

    threshold filters the VERIFIED Jaccard, so false-positive candidates
    cost only a verify, never a wrong answer; false negatives are the
    documented LSH recall (tunable via k, r).
    """
    assert num_hashes % band_rows == 0
    n_bands = num_hashes // band_rows
    sh = _with_shingles(docs, n, id_col).filter(F.size("shingles") > 0)
    sig = sh.select(
        F.col(id_col), F.col("shingles"), *minhash_signature(F.col("shingles"), num_hashes)
    ).cache()

    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    "|", *[f"sig_{b * band_rows + r}" for r in range(band_rows)]
                )
            ).alias("key"),
        )
        for b in range(n_bands)
    ]
    bands = sig.select(
        F.col(id_col).alias("_id"), F.explode(F.array(*band_cols)).alias("bk")
    ).select("_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    a = sig.select(F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a"))
    b = sig.select(F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b"))
    jacc = (
        F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
        / F.size(F.array_union("sh_a", "sh_b")).cast("double")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", dround(jacc, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_HIGH_NIBBLE = list("89abcdef")
SIMHASH_BITS = 32


def simhash32(toks: Column) -> Column:
    """32-bit SimHash of a token array, zero shuffles.

    Bit p of the fingerprint is the sign of Σ_tokens (+1 if hex digit
    p+1 of md5(token) has its top bit set, else −1) — the classic
    Charikar construction at 32-bit width (one md5 hex digit per bit
    position; each digit's membership in [8..f] is one pseudo-random
    bit per (token, position)). Duplicate tokens weigh in as often as
    they appear, matching term-frequency weighting. 32 bits keeps the
    random-pair collision rate at Hamming<=3 around 2e-7, so verified
    output is essentially all true near-dups.

    Computed as: per-token ±1 contribution vectors (transform), summed
    element-wise into a 32-long vector (aggregate+zip_with), then packed
    into a long. All array expressions — scan-local at any scale.
    """
    contribs = F.transform(
        toks,
        lambda t: F.transform(
            F.sequence(F.lit(1), F.lit(SIMHASH_BITS)),
            lambda p: F.when(
                F.md5(t).substr(p.cast("int"), F.lit(1)).isin(*_HIGH_NIBBLE), 1
            ).otherwise(-1),
        ),
    )
    sums = F.aggregate(
        contribs,
        F.array_repeat(F.lit(0), SIMHASH_BITS),
        lambda acc, x: F.zip_with(acc, x, lambda a, b: a + b),
    )
    # 2^p via pow (exact in double up to 2^52; shiftleft needs an int
    # literal bit count, so it can't take the lambda-bound position column)
    packed = F.aggregate(
        F.zip_with(
            sums,
            F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1)),
            lambda s, p: F.when(
                s > 0, F.pow(F.lit(2.0), p.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return packed


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance <= max_hamming (< 4).

    Candidate generation uses the pigeonhole band trick: the 32-bit
    fingerprint splits into 4 bytes; <= 3 differing bits can touch at
    most 3 bytes, so every qualifying pair shares at least one intact
    byte → equi-join on (byte_idx, byte_value) finds all of them with
    zero recall loss. Verification is bit_count(xor) on the candidates.
    """
    assert max_hamming <= 3, "4-byte banding guarantees recall only for <= 3"
    sig = docs.select(
        F.col(id_col), simhash32(tokens(F.col("text"))).alias("simhash")
    ).cache()
    bands = sig.select(
        F.col(id_col).alias("_id"),
        F.col("simhash").alias("_sh"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("idx"),
                        F.shiftright("simhash", 8 * i)
                        .bitwiseAND(F.lit(255))
                        .alias("val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("nb"),
    ).select("_id", "_sh", F.col("nb.idx").alias("idx"), F.col("nb.val").alias("val"))

    hamming = F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh")))
    return (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.idx") == F.col("b.idx"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming.cast("int").alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
