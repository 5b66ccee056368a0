"""Skew mitigation: salted joins for pathologically hot keys.

AQE's skew-join splitting (on in session.py) handles most skew at
runtime by splitting oversized sort-merge partitions, but it cannot help
when one key is so hot that a single key's rows exceed an executor
(classic at 100 TB: the null/default key, a bot user, a viral item).
Salting restores parallelism deterministically:

  fact side:  salt = pmod(hash(unique row attrs), S)  — spreads the hot
              key's rows over S sub-keys
  dim side:   replicated S times via explode(sequence(0, S-1))
  join on (key, salt) — each sub-key shuffles independently.

The join RESULT is row-identical to the unsalted join (inner/left on an
FK→PK relationship): every fact row still meets exactly the one dim row
it matched before, just in one of S partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    num_salts: int = 16,
    how: str = "inner",
    salt_on: list[str] | None = None,
) -> DataFrame:
    """Join fact⋈dim on ``key`` with an S-way salt on the fact side.

    ``salt_on``: columns whose hash spreads rows across salts (defaults
    to all fact columns — deterministic, no rand(), so re-runs and
    retried tasks produce identical partitioning; nondeterministic salts
    break task retry idempotence).

    The dim side is replicated ``num_salts``× — keep it to genuinely
    small dims (it usually already broadcasts; salting matters when the
    dim is too big to broadcast AND the fact key is hot, where a
    sort-merge join would hang on one straggler partition).
    """
    # only fact-preserving join types are row-identical under salting:
    # the dim side is replicated num_salts×, so any type that keeps
    # UNMATCHED dim rows (right/full outer, right semi/anti) would emit
    # each unmatched dim row once per salt instead of once. 'cross' is
    # excluded too — the on=[key, _salt] clause would silently turn a
    # requested cross join into an inner join (and an actual cross join
    # has no key to salt)
    allowed = {"inner", "left", "leftouter", "leftsemi", "semi",
               "leftanti", "anti"}
    if how.lower().replace("_", "") not in allowed:
        raise ValueError(
            f"salted_join: how='{how}' is not fact-preserving — the "
            f"replicated dim side would duplicate unmatched dim rows "
            f"{num_salts}x; use one of {sorted(allowed)}"
        )
    cols = salt_on or fact.columns
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(num_salts))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1)))
    )
    return salted_fact.join(salted_dim, on=[key, "_salt"], how=how).drop("_salt")
