"""Bucketized band (range) join.

Spark has no native range-join optimization: a raw
``l.ts BETWEEN r.ts - d AND r.ts + d`` condition beside an equi-key
compiles to a join whose residual runs on every key-pair — fine — but
WITHOUT an equi-key it degenerates to BroadcastNestedLoopJoin, and even
with one, a hot key compares all its lefts against all its rights
(O(n_k * m_k) per key). The scalable formulation used everywhere a
band join appears at 100 TB (telemetry correlation, clickstream
attribution, sensor alignment) is time-bucketing:

  1. bin both sides at width >= the band radius
  2. explode ONE side to its bin and the two adjacent bins (3x bounded
     row blowup, before the shuffle — no per-key quadratics)
  3. equi-join on (keys..., bin) — a plain hash shuffle join Catalyst
     and AQE handle like any other — with the exact band predicate as
     the residual

Every qualifying pair lands in exactly one (bin-of-right) bucket, so no
dedup pass is needed. Timestamps compare as exact integer microseconds
(``unix_micros``), so the residual cannot drift cross-engine.

The reference has no range join (its joins are all equi,
notebooks/02_silver_transform.py); this extends the §2.5 join family
the same way as_of_join (joins.py:96) does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def band_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    delta_us: int,
    bin_width_us: int | None = None,
) -> DataFrame:
    """Inner join of rows sharing ``on`` keys with
    ``|left.left_ts - right.right_ts| <= delta_us``.

    Returns left columns + right's non-key columns; callers alias
    colliding names beforehand. ``bin_width_us`` defaults to
    ``max(delta_us, 1)`` (delta_us=0 = exact-microsecond match) and
    must be >= delta_us and > 0 (validated) so that +/-1 bin adjacency
    covers the band.

    Cost shape: one shuffle per side on (keys, bin); the exploded side
    carries exactly 3 rows per input row. Skewed keys still subdivide
    by time bin, so a single hot entity spreads across
    span/bin_width reducers instead of one.
    """
    if delta_us < 0:
        raise ValueError(f"delta_us={delta_us} must be >= 0")
    width = bin_width_us if bin_width_us is not None else max(delta_us, 1)
    if width < delta_us:
        raise ValueError(
            f"bin_width_us={width} < delta_us={delta_us}: adjacent-bin "
            "probing would miss matches spanning more than one bin"
        )
    if width <= 0:
        raise ValueError(f"bin_width_us={width} must be > 0")
    # Both sides may derive from the SAME source DataFrame (self band
    # joins are the common case: events vs events). Spark resolves
    # l[k] == r[k] ambiguously on a self-join lineage, so every column
    # the condition touches on the right side gets a unique name first
    # and the join condition references names, never lineage.
    # Exact integer floor division for the bin id: F.floor(col / width)
    # goes through DOUBLE division, which loses precision above 2^53 —
    # a within-band pair could land 2 bins apart and silently vanish.
    # (a - pmod(a, w)) is exactly divisible by w, so `div` (integer
    # division) yields floor(a / w) for negatives too, all in long
    # arithmetic.
    def _bin_of(colname: str):
        return F.expr(
            f"({colname} - pmod({colname}, {width}L)) div {width}L"
        )

    l = left.withColumn(  # noqa: E741
        "_lus", F.unix_micros(F.col(left_ts))
    ).withColumn(
        "_lbin",
        F.explode(
            F.array(_bin_of("_lus") - 1, _bin_of("_lus"), _bin_of("_lus") + 1)
        ),
    )
    r = right.withColumn("_rus", F.unix_micros(F.col(right_ts))).withColumn(
        "_rbin", _bin_of("_rus")
    )
    r = r.select(
        *[F.col(k).alias(f"_rk_{k}") for k in on],
        *[c for c in r.columns if c not in set(on)],
    )
    cond = (F.col("_lbin") == F.col("_rbin")) & (
        F.abs(F.col("_lus") - F.col("_rus")) <= F.lit(delta_us)
    )
    for k in on:
        cond = cond & (F.col(k) == F.col(f"_rk_{k}"))
    return l.join(r, cond).drop(
        "_lbin", "_rbin", "_lus", "_rus", *[f"_rk_{k}" for k in on]
    )
