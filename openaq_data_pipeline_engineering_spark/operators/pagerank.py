"""Bounded-iteration PageRank in exact integer arithmetic.

Third iterative-algorithm pattern in the engine (with connected
components, operators/cluster.py, and spherical k-means,
operators/kmeans.py): Lloyd-style unrolled rounds, each round one
shuffle join + one aggregation, rank table materialized per round so
downstream consumers never replay the chain.

Determinism: ranks are kept as BIGINT micro-units (1.0 == 1_000_000).
The update rule

    next = TELEPORT_NUM + (DAMP_NUM * sum(pr div deg)) div SCALE

uses only integer multiply / sum / floor-div — bit-exact in any engine,
so a DuckDB CTE chain can replay training exactly (same trick as
operators/kmeans.py's on-grid means; floats would drift because
cross-engine sum order differs). Truncation error is < 1 micro-unit
per round — irrelevant for ranking.

Scale shape: edges shuffle once into the adjacency-list layout
(node, degree, neighbor-array chunks — hub rows bounded by
ARRAY_CHUNK); each round joins the |nodes|-sized rank table against
the adjacency table, explodes contributions in-JVM, and groupBy(dst)
sums — the canonical Pregel-style PR round, moving |nodes| rows per
round instead of |edges|. Rank-table size is |nodes|, partitioned,
never collected. On an undirected graph every node has degree ≥ 1, so
no dangling-mass correction is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # micro-units
DAMP_NUM = 850_000  # 0.85 * SCALE
TELEPORT_NUM = 150_000  # 0.15 * SCALE
# Max entries per adjacency-chunk row: bounds hub-node row size (skew)
# without changing any per-edge contribution.
ARRAY_CHUNK = 4096


def undirect(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Both directions of each edge (PR over an undirected graph).

    Emitted as ONE pass with a 2-way explode instead of a self-union
    (r12, guide §1.2 redundant passes): the union's two branches each
    re-execute the upstream edge pipeline (a pair self-join + distinct
    here — exchange reuse does not fire across the differing branch
    projections; stage profile showed the downstream stage reading the
    pair table's bytes twice). Same rows, same multiset."""
    e = edges.select(
        F.explode(
            F.array(
                F.struct(F.col(src).alias("s"), F.col(dst).alias("d")),
                F.struct(F.col(dst).alias("s"), F.col(src).alias("d")),
            )
        ).alias("__e")
    )
    return e.select(F.col("__e.s").alias(src), F.col("__e.d").alias(dst))


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Integer PageRank over a DIRECTED edge list; returns (node, pr).

    Every node must have out-degree ≥ 1 (true for undirected graphs via
    :func:`undirect`). Initial rank = SCALE for every node.
    """
    # Rounds iterate over the ADJACENCY-LIST form, not the flat edge
    # list: one row per node (node, degree, array of out-neighbors).
    # The flat (src, dst, deg) checkpoint measured ~100 B/row of
    # storage and every round re-read |edges| rows; the adjacency
    # checkpoint holds the same information in |nodes| rows (~10x
    # fewer bytes on the co-purchase graph: 220 MB -> ~20 MB at
    # sf0.1), so each round's join probes |nodes| rows and the edge
    # expansion happens in-JVM via explode. Contributions are
    # identical per edge (pr div deg), and the integer groupBy-sum is
    # order-independent, so the rank sequence is bit-equal to the
    # flat-round form (collect_list order does not matter).
    # Skew note (100 TB): a hub node's neighbors land in ONE array
    # row; ARRAY_CHUNK bounds the row (and the explode's task-local
    # expansion) by splitting each adjacency list into <=4096-entry
    # chunk rows — deg stays the global degree, so per-edge
    # contributions are unchanged and chunking is invisible to the
    # result.
    adj = (
        edges.groupBy(src)
        .agg(F.count(F.lit(1)).alias("__deg"), F.collect_list(dst).alias("__adj"))
        .select(
            F.col(src).alias("__node"),
            "__deg",
            F.explode(
                F.expr(
                    "transform(sequence(0, (size(__adj) - 1) div "
                    f"{ARRAY_CHUNK}), i -> slice(__adj, i * {ARRAY_CHUNK}"
                    f" + 1, {ARRAY_CHUNK}))"
                )
            ).alias("__adj"),
        )
    )
    if materialize:
        # The adjacency table is reused every round; pin it once so no
        # round re-plans (or re-shuffles) the upstream edge pipeline.
        adj = adj.localCheckpoint(eager=True)
    pr = (
        adj.select(F.col("__node").alias("node"))
        .distinct()
        .withColumn("pr", F.lit(SCALE).cast("long"))
    )
    for _ in range(iterations):
        contrib = adj.join(pr, F.col("__node") == F.col("node")).select(
            F.explode("__adj").alias("__to"),
            F.expr("pr div __deg").alias("__c"),
        )
        pr = contrib.groupBy("__to").agg(
            (
                F.lit(TELEPORT_NUM)
                + F.expr(f"{DAMP_NUM} * sum(__c) div {SCALE}")
            ).alias("pr")
        ).select(F.col("__to").alias("node"), F.col("pr").cast("long"))
        if materialize:
            pr = pr.localCheckpoint(eager=True)
    return pr


def pagerank_oracle_sql(
    edges_cte: str, iterations: int = 3, top_k: int | None = None
) -> str:
    """DuckDB CTE chain replaying :func:`pagerank` exactly.

    ``edges_cte`` must define a relation ``edges(src, dst)`` (already
    undirected). Output: (node, pr) [ordered top_k if given].
    """
    ctes = [
        edges_cte,
        "deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src)",
        f"p0 AS (SELECT src AS node, CAST({SCALE} AS BIGINT) AS pr FROM deg)",
    ]
    prev = "p0"
    for t in range(1, iterations + 1):
        ctes.append(
            f"p{t} AS (SELECT e.dst AS node, "
            f"CAST({TELEPORT_NUM} + ({DAMP_NUM} * sum(p.pr // d.deg)) "
            f"// {SCALE} AS BIGINT) AS pr "
            f"FROM edges e JOIN {prev} p ON e.src = p.node "
            f"JOIN deg d ON d.src = e.src GROUP BY e.dst)"
        )
        prev = f"p{t}"
    body = ",\n    ".join(ctes)
    tail = (
        f"ORDER BY pr DESC, node LIMIT {top_k}" if top_k else ""
    )
    return f"WITH {body}\n    SELECT node, pr FROM {prev} {tail}"
