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

Scale shape: edges shuffle once on src for degrees; each round is a
shuffle join pr⋈edges on src plus a groupBy(dst) sum — the canonical
distributed PR round. Rank-table size is |nodes|, partitioned, never
collected. On an undirected graph every node has degree ≥ 1, so no
dangling-mass correction is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000  # micro-units
DAMP_NUM = 850_000  # 0.85 * SCALE
TELEPORT_NUM = 150_000  # 0.15 * SCALE


def undirect(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Both directions of each edge (PR over an undirected graph)."""
    return edges.select(src, dst).unionByName(
        edges.select(F.col(dst).alias(src), F.col(src).alias(dst))
    )


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
    deg = edges.groupBy(src).agg(F.count(F.lit(1)).alias("__deg"))
    e_deg = edges.join(deg, src)
    if materialize:
        # The degree-annotated edge list is reused every round; pin the
        # JOINED form once so no round re-plans (or re-shuffles) it.
        e_deg = e_deg.localCheckpoint(eager=True)
    pr = (
        e_deg.select(F.col(src).alias("node"))
        .distinct()
        .withColumn("pr", F.lit(SCALE).cast("long"))
    )
    for _ in range(iterations):
        contrib = e_deg.join(pr, F.col(src) == F.col("node")).select(
            F.col(dst).alias("__to"),
            F.expr(f"pr div __deg").alias("__c"),
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
