"""Distributed Bloom-filter semi-join pruning (runtime-filter DIY).

The scale problem: a selective dimension predicate should cut the fact
shuffle, but when the surviving dim KEY SET is too large to broadcast
raw (100M custkeys ~ 800MB), Spark falls back to shuffling the full
fact. A Bloom filter fixes the size: 2^24 bits = 2 MB summarizes 100M
keys at ~1% false positives, broadcasts anywhere, and every fact row
the filter rejects never enters the shuffle. False positives are
harmless — the real join still runs and removes them — so the result
is bit-identical to the plain join (which is exactly what the oracle
twin checks).

Spark's own runtime bloom filter (`spark.sql.optimizer.runtime.
bloomFilter.enabled`) applies the same idea inside AQE when statistics
justify it; this operator makes the plan explicit and statistics-
independent, with the filter construction itself distributed:

  build:  dim keys -> k bit positions each (xxhash64 seeded per hash)
          -> (word, 1<<bit) pairs -> bit_or per word (ONE map-side-
          combined shuffle of <= num_bits/64 groups) -> dense 1-row
          array<long> bitmap via a range join + sorted collect.
  probe:  broadcast the 1-row bitmap, AND-test the k positions per
          fact row — scan-local, codegen'd, no Python.

Nothing is ever collected to the driver; the bitmap stays a DataFrame
end to end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _position(key_col: str, seed: int, num_bits: int) -> Column:
    """Deterministic bit position #seed for a key: xxhash64(key, seed)
    mod num_bits (pmod keeps it non-negative)."""
    return F.pmod(
        F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(num_bits)
    )




def build_bloom(
    keys: DataFrame, key_col: str, num_bits: int = 1 << 16, num_hashes: int = 3
) -> DataFrame:
    """Aggregate a key DataFrame into a 1-row Bloom bitmap.

    Returns a single-row DataFrame with column ``bf: array<bigint>`` of
    ``num_bits / 64`` words. ``num_bits`` must be a multiple of 64.
    The only shuffle is the per-word bit_or — at most num_bits/64
    groups regardless of key count, with map-side partial aggregation
    doing almost all the OR-ing before the exchange.
    """
    if num_bits % 64 != 0:
        raise ValueError(f"num_bits must be a multiple of 64, got {num_bits}")
    n_words = num_bits // 64
    spark = keys.sparkSession
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    _position(key_col, i, num_bits)
                    for i in range(num_hashes)
                ]
            )
        ).alias("p")
    )
    words = pos.select(
        (F.col("p") / 64).cast("long").alias("w"),
        F.expr("shiftleft(1L, cast(p % 64 AS INT))").alias("m"),
    )
    sparse = words.groupBy("w").agg(F.bit_or("m").alias("bits"))
    dense = (
        spark.range(n_words)
        .join(sparse, F.col("id") == F.col("w"), "left")
        .select("id", F.coalesce(F.col("bits"), F.lit(0)).alias("bits"))
    )
    return dense.agg(
        F.array_sort(F.collect_list(F.struct("id", "bits"))).alias("_s")
    ).select(
        F.transform(F.col("_s"), lambda x: x["bits"]).alias("bf")
    )


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int = 1 << 16,
    num_hashes: int = 3,
) -> DataFrame:
    """Keep only fact rows whose key MIGHT be in the Bloom filter.

    Broadcasts the 1-row bitmap and AND-tests the k bit positions —
    a pure scan-side expression (codegen'd, no Python), so the
    surviving set (true matches + ~fp-rate of the rest) is what enters
    any downstream shuffle. The caller still performs the real join;
    this only shrinks its input, so the composed result is identical
    to the un-pruned plan. ``num_bits``/``num_hashes`` must match the
    build call.
    """
    # the bitmap rides an internal column name so a fact frame that
    # already carries 'bf' (build_bloom's public output name) never
    # collides or gets silently shadowed
    bf = "_bloom_bf"
    if bf in fact.columns:
        raise ValueError(f"bloom_prune: fact already has a '{bf}' column")
    probed = fact.crossJoin(
        F.broadcast(bloom.select(F.col("bf").alias(bf)))
    )
    cond = None
    for i in range(num_hashes):
        pos = _position(key_col, i, num_bits)
        word = F.element_at(F.col(bf), (pos / 64).cast("int") + 1)
        # getbit takes a Column bit position — no SQL-text interpolation
        # of the caller's column name (which broke for names needing
        # quoting) and no literal-only shiftleft restriction
        test = F.getbit(word, pos % 64) == 1
        cond = test if cond is None else (cond & test)
    return probed.filter(cond).drop(bf)
