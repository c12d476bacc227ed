"""Iterative graph analytics over edge lists (§7.2-step-9 extension,
sibling of `dedup.connected_components`): PageRank — the centrality
primitive for corpus curation (rank documents by how central they are
in the similarity graph; a high-rank near-duplicate cluster member is
the canonical copy, an isolated low-rank doc is a dedup survivor but
a quality suspect).

Like connected_components, this is an O(iterations)-round loop of
pure DataFrame joins — no GraphX/GraphFrames dependency, no driver
data path. Convergence is not SQL-expressible, so the registry treats
it rows-only; correctness is pinned by unit tests on hand-computed
graphs (star, cycle) and by the rank-mass conservation law.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    n_iter: int = 15,
) -> DataFrame:
    """PageRank over a directed edge list.

    Per round: contribution = rank/out_degree shipped along edges
    (one equi-join on src), summed per dst (one hash aggregate), then
    rank' = (1-d)/N + d·(contrib + dangling_mass/N). Dangling-node
    mass is redistributed uniformly so total rank stays 1.0 — the
    conservation law the tests assert.

    Scale shape: the edge list is the only big frame; each round is
    join(edges, ranks) → groupBy(dst) — both shuffle on vertex ids,
    and Catalyst reuses the same hash partitioning across the join
    and the aggregate. `localCheckpoint` every few rounds cuts the
    growing lineage (same pattern as connected_components). For a
    fixed iteration budget the total cost is n_iter × O(|E|/p)
    per-partition work; vertex state is |V| rows, never collected.

    Returns (vertex, rank) with ranks summing to 1.0.
    """
    # Materialize the edge list ONCE before iterating: `edges` is
    # referenced by every round's join AND by each rank checkpoint's
    # composite plan, so an expensive upstream producer (the kNN
    # graph kernel for pagerank_similarity — ~12 s per evaluation at
    # sf1) would otherwise be re-computed at every eager action; the
    # round-5 sweep measured exactly that (75.9 s for 10 rounds over
    # a 100k-edge graph).
    e = edges.select(
        F.col(src).alias("vertex"), F.col(dst).alias("_dst")
    ).localCheckpoint(eager=True)
    verts = (
        e.select("vertex")
        .union(e.select(F.col("_dst").alias("vertex")))
        .distinct()
    )
    n = verts.count()  # scalar: needed for the teleport constant
    if n == 0:
        # empty graph (e.g. a kNN build that yielded no edges): an
        # empty (vertex, rank) frame, not a ZeroDivisionError below
        return verts.withColumn("rank", F.lit(0.0)).select("vertex", "rank")
    out_deg = e.groupBy("vertex").agg(
        F.count(F.lit(1)).alias("out_deg")
    )
    # rank state: (vertex, rank, out_deg); out_deg NULL = dangling
    ranks = verts.join(out_deg, "vertex", "left").withColumn(
        "rank", F.lit(1.0 / n)
    )
    ranks = ranks.localCheckpoint()
    for i in range(n_iter):
        contrib = (
            e.join(ranks.where(F.col("out_deg").isNotNull()), "vertex")
            .select(
                F.col("_dst").alias("vertex"),
                (F.col("rank") / F.col("out_deg")).alias("_c"),
            )
            .groupBy("vertex")
            # decimal-accumulate: rank vectors are bit-identical
            # under any partitioning (same contract as exact_moments)
            .agg(
                F.sum(F.col("_c").cast("decimal(38,18)"))
                .cast("double")
                .alias("_contrib")
            )
        )
        dangling = (
            ranks.where(F.col("out_deg").isNull())
            .agg(
                F.coalesce(
                    F.sum(F.col("rank").cast("decimal(38,18)")).cast(
                        "double"
                    ),
                    F.lit(0.0),
                ).alias("m")
            )
            .withColumn("_one", F.lit(1))
        )
        ranks = (
            ranks.select("vertex", "out_deg")
            .join(contrib, "vertex", "left")
            .withColumn("_one", F.lit(1))
            .join(F.broadcast(dangling), "_one")
            .select(
                "vertex",
                "out_deg",
                (
                    F.lit((1.0 - damping) / n)
                    + damping
                    * (
                        F.coalesce(F.col("_contrib"), F.lit(0.0))
                        + F.col("m") / n
                    )
                ).alias("rank"),
            )
        )
        if (i + 1) % 4 == 0 or i == n_iter - 1:
            ranks = ranks.localCheckpoint()
    return ranks.select("vertex", "rank")
