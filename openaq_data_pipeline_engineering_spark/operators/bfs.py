"""Bounded-hop BFS seed expansion — iterative-algorithm pattern #4
(with connected components, k-means, and PageRank).

"Everything within k hops of a seed set" is the graph query behind
contamination spread, related-item discovery, and fraud-ring
expansion. Each round is one frontier⋈edges equi-join plus an
anti-join against the visited set — shuffle ∝ frontier size, never the
whole graph; the visited/dist table is materialized per round so no
round replays the chain (same discipline as operators/pagerank.py).

Determinism: a node's distance is the MINIMUM hop count, enforced
structurally (a node enters `dist` in the first round that reaches it
and the anti-join bars re-entry), so the result is independent of join
order, partitioning, and tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bfs_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "src",
    dst: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Hop distance (0..max_hops) from ``seeds`` over a DIRECTED edge
    list; returns (node, dist) for every reached node.

    seeds: DataFrame with a single ``node`` column (deduplicated here).
    """
    if materialize:
        # Pin the edge list ONCE: it is probed every hop, and upstream
        # it is typically a full pair-generation pipeline (self-join +
        # distinct) that would otherwise RE-EXECUTE per hop — AQE never
        # reuses shuffle output across the separate query executions
        # the per-hop checkpoints create. Lazy: hop 1 materializes it.
        edges = edges.localCheckpoint(eager=False)
    dist = seeds.select("node").distinct().withColumn(
        "dist", F.lit(0).cast("int")
    )
    if materialize:
        dist = dist.localCheckpoint(eager=True)
    frontier = dist
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(edges, frontier["node"] == edges[src])
            .select(edges[dst].alias("node"))
            .distinct()
            .join(dist, "node", "left_anti")
            .withColumn("dist", F.lit(hop).cast("int"))
        )
        if materialize:
            nxt = nxt.localCheckpoint(eager=True)
        # The running dist table is a union of already-checkpointed
        # hop frames — re-checkpointing the union each hop would cost
        # one extra job per hop for a frame that is already cheap to
        # reassemble.
        dist = dist.unionByName(nxt)
        frontier = nxt
    return dist
