"""Query-scoped cache pinning: every internal ``.cache()`` a query takes
out is REGISTERED, so it can be released deterministically instead of
leaking into the session's executor storage.

Several operators pin an intermediate they consume more than once in the
same plan (shingle tables feeding a self-join, LSH band tables, symmetric
edge lists driving an iterative propagation). The pin must outlive the
function — the returned DataFrame is lazy and the consumer's action is
what hits the cache — so the function itself can never unpersist safely.
Before this module each such pin simply lived forever: a 153-query sweep
accumulated every query's band/shingle/edge caches in executor storage
for the whole session, and the bench harness had to mop with
``spark.catalog.clearCache()`` after every query.

The contract here:

- ``pin(df)`` replaces bare ``df.cache()`` at those sites: caches AND
  registers the frame. Call-site semantics are unchanged (still lazy —
  sites that materialize keep their own ``.count()``).
- ``release_pins()`` unpersists everything registered. Library users
  running ad-hoc operators call it once they've consumed their results.
- The query registry (queries._register) wraps every REGISTERED entry so
  invoking one first releases the pins left by previously-run queries —
  a sequential sweep (the driver, the bench, check_oracle) therefore
  holds at most ONE query's pins at a time, with no harness-side mop.
  The wrapper releases on entry, not exit, because the current query's
  pins must survive until its returned DataFrame has been consumed.

At 100 TB this is the difference between executor storage holding one
query's working set and holding the whole suite's: leaked cache blocks
evict each other under memory pressure and every later query pays
recompute-plus-eviction churn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """``df.cache()`` plus registration for deterministic release."""
    df = df.cache()
    _PINNED.append(df)
    return df


def unpin(df: DataFrame) -> None:
    """Release one pinned frame early (e.g. an iteration's superseded
    checkpoint once its successor is materialized)."""
    df.unpersist()
    try:
        _PINNED.remove(df)
    except ValueError:
        pass


def release_pins() -> int:
    """Unpersist every registered pin; returns how many were released."""
    n = len(_PINNED)
    while _PINNED:
        df = _PINNED.pop()
        try:
            df.unpersist()
        except Exception:
            # a stopped SparkSession must not wedge the registry
            pass
    return n


def pinned_count() -> int:
    return len(_PINNED)
