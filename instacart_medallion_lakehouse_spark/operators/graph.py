"""Bounded label propagation: connected components for dedup clusters.

Every dedup operator in this engine emits PAIRS (id_a, id_b). A
curation pipeline then needs CLUSTERS — one surviving representative
per connected component of the pair graph (A~B, B~C must collapse to
one group even when A~C was never scored). This module closes that gap
with min-label propagation in pure DataFrame form:

    label(v) <- min(label(v), min over neighbors' labels), k rounds

After k rounds every vertex holds the smallest vertex id within k hops,
so components with diameter <= k are exactly labeled by their minimum
member — the canonical deterministic representative. k is FIXED (not
run-to-convergence) so the DuckDB oracle can replay the identical
computation as unrolled CTEs; convergence for a given dataset is
asserted separately in tests (one extra round changes nothing).

Scale notes: each round is one join + one aggregate on the edge list —
the textbook BSP step. Rounds shuffle O(|E|); caching each round's
labels keeps lineage flat. Diameters in near-dup graphs are small
(duplicates cluster around a few originals), so k stays single-digit;
for adversarial chains switch to the large-star/small-star contraction
(same join shape, fewer rounds), which this fixed-k form approximates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def label_propagation(
    edges: DataFrame,
    iterations: int = 6,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    cache_every: int = 2,
    edges_unique: bool = False,
) -> DataFrame:
    """(node, component) for every vertex in ``edges`` after
    ``iterations`` rounds of min-label propagation. component = the
    minimum vertex id within ``iterations`` hops (= the component's
    minimum once converged).

    ``cache_every`` controls the materialization cadence: each round
    references the previous labels twice (own-label branch + neighbor
    branch), so an unmaterialized chain recomputes with factor
    2^rounds — but each materialization is a full Spark job whose
    fixed overhead dominates at small graph sizes. Materializing
    every second round bounds recompute at 4x of a trivially small
    plan while halving the job count. ``cache_every=0`` runs every
    round lazily in ONE job — right when ``iterations`` is a small
    bound (the 2^k recompute is 2^k scans of the CACHED edge list,
    cheaper than k/2 extra job launches); keep the cadence for deep
    or unbounded propagation.

    ``edges_unique=True`` declares that the input pairs are already
    duplicate-free with src < dst (every dedup operator here emits
    exactly that), which makes the symmetrized edge list distinct by
    construction — the dedup shuffle is skipped. min() is idempotent,
    so even a wrong claim only costs duplicate join rows, never a
    wrong label."""
    a = F.col(src_col).alias("src")
    b = F.col(dst_col).alias("dst")
    sym = edges.select(a, b).union(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    )
    if not edges_unique:
        sym = sym.distinct()
    sym = sym.cache()
    sym.count()  # pinned: reused every round

    # Round 1 folded into initialization: on identity labels the update
    # min(l0(v), min over N(v) of l0(u)) is just least(v, min(N(v))) —
    # one aggregate over the edge list, no join. (Every node of sym
    # appears as a src because sym is symmetrized.)
    labels = (
        sym.groupBy("src")
        .agg(F.least(F.col("src"), F.min("dst")).alias("label"))
        .select(F.col("src").alias("node"), "label")
    )
    for i in range(1, iterations):
        nbr = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("_nl"))
        )
        labels = (
            labels.join(nbr, labels["node"] == nbr["src"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))
                ).alias("label"),
            )
        )
        if cache_every and (i + 1) % cache_every == 0 and i != iterations - 1:
            labels = labels.cache()
            labels.count()  # flatten lineage, bound the recompute cascade
    # the LAST round is deliberately left lazy: the caller consumes the
    # result exactly once, so forcing a final materialization job would
    # only add fixed overhead (the trailing unmaterialized chain is at
    # most cache_every-1 rounds over cached inputs — bounded recompute)
    return labels.select("node", F.col("label").alias("component"))
