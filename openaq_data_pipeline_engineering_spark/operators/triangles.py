"""Degree-ordered triangle counting over an undirected edge list.

Fourth graph pattern in the engine (with PageRank, connected
components, and the LSH candidate join). The naive triangle join —
wedges from every node's full adjacency — blows up as Σ deg², which a
hub node turns quadratic. The standard fix (the "compact-forward" /
degree-ordering algorithm) orients every edge from the endpoint with
the smaller (degree, id) key to the larger, and builds wedges only out
of ORIENTED adjacency: forward-degree is bounded by O(√m) on any
graph, so wedge volume is Σ fwd_deg² ≤ O(m^1.5) regardless of skew —
the shape that survives a hub-heavy 100 TB graph. Each triangle
{a ≺ b ≺ c} is counted exactly once, from its smallest endpoint.

All arithmetic is integer (the order key packs degree and node id into
one BIGINT), so a DuckDB oracle replays the count bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# degree ≺-order key: deg * 2^32 + node (both well under 2^31 here; the
# packed key stays inside BIGINT and orders by (deg, id) lexically).
_KEY_SHIFT = 2**32


def count_triangles(pairs: DataFrame, src: str = "s", dst: str = "t") -> DataFrame:
    """One-row frame (n_edges, n_wedges, n_triangles) for an undirected
    graph given as DISTINCT pairs with ``src < dst`` per row.

    Plan: one degree aggregation, two key joins to annotate endpoints,
    one self-join on the wedge apex (forward adjacency only), one
    semi-join to close wedges. No step materializes unoriented Σ deg²
    wedges.

    The edge list and the oriented edge list are each materialized ONCE
    (``localCheckpoint`` — O(m), the same order as the shuffles this
    plan already pays): without it every downstream reference re-plans
    the caller's ``pairs`` derivation from the base scans — measured 52
    parquet scans for the declared co-order query, since exchange
    reuse does not fire across aliased subtrees on this Spark build.
    The checkpoints are LAZY (``eager=False``): composing or explaining
    this plan costs nothing, and the blocks materialize on the caller's
    first action. Trade-off (shared with every localCheckpoint in the
    repo): the blocks are non-replayable, so losing an executor between
    materialization and the final action fails the job instead of
    recomputing — acceptable for the bounded O(m) relations here; a
    100 TB deployment that needs replayability swaps in a reliable
    ``checkpoint()`` directory.
    The wedge COUNT comes from forward degrees (Σ d·(d−1)/2, one agg
    over the oriented edges — identical to counting the kv-ordered
    apex self-join) so the O(m^1.5) wedge relation is built exactly
    once, for closing only.
    """
    e0 = pairs.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint(eager=False)
    deg = (
        e0.select(F.col("a").alias("node"))
        .unionAll(e0.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
        .select(
            "node",
            (F.col("deg") * F.lit(_KEY_SHIFT) + F.col("node")).alias("key"),
        )
    )
    ka = deg.select(F.col("node").alias("a"), F.col("key").alias("ka"))
    kb = deg.select(F.col("node").alias("b"), F.col("key").alias("kb"))
    keyed = e0.join(ka, "a").join(kb, "b")
    # Orient low-key → high-key endpoint.
    o = keyed.select(
        F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("v"),
        F.greatest("ka", "kb").alias("kv"),
    ).localCheckpoint(eager=False)
    x, y = o.alias("x"), o.alias("y")
    wedges = x.join(
        y,
        (F.col("x.u") == F.col("y.u")) & (F.col("x.kv") < F.col("y.kv")),
    ).select(F.col("x.v").alias("wv"), F.col("y.v").alias("ww"))
    closing = o.select(F.col("u").alias("wv"), F.col("v").alias("ww"))
    tri = wedges.join(closing, ["wv", "ww"], "left_semi")
    # Σ C(fwd_deg, 2): exact wedge count without re-building the wedge
    # relation (d·(d−1) is even, so integer div is exact).
    n_wedges = (
        o.groupBy("u")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(
            F.coalesce(
                F.sum(F.expr("d * (d - 1) div 2")).cast("bigint"),
                F.lit(0).cast("bigint"),
            ).alias("n_wedges")
        )
    )
    return (
        e0.agg(F.count(F.lit(1)).alias("n_edges"))
        .join(n_wedges)
        .join(tri.agg(F.count(F.lit(1)).alias("n_triangles")))
    )


def triangle_oracle_sql(edges_cte: str, src: str = "s", dst: str = "t") -> str:
    """DuckDB mirror: same orientation key, same wedge construction.

    ``edges_cte`` must define a relation ``e0(s, t)`` of distinct
    undirected pairs with s < t (CTE text without WITH).
    """
    return f"""
    WITH {edges_cte},
    nodes AS (
        SELECT node, count(*) * {_KEY_SHIFT} + node AS key FROM (
            SELECT {src} AS node FROM e0
            UNION ALL SELECT {dst} AS node FROM e0
        ) GROUP BY node
    ),
    o AS (
        SELECT CASE WHEN na.key < nb.key THEN e0.{src} ELSE e0.{dst} END AS u,
               CASE WHEN na.key < nb.key THEN e0.{dst} ELSE e0.{src} END AS v,
               greatest(na.key, nb.key) AS kv
        FROM e0
        JOIN nodes na ON na.node = e0.{src}
        JOIN nodes nb ON nb.node = e0.{dst}
    ),
    wedges AS (
        SELECT x.v AS wv, y.v AS ww
        FROM o x JOIN o y ON x.u = y.u AND x.kv < y.kv
    ),
    tri AS (
        SELECT 1 FROM wedges w SEMI JOIN o ON o.u = w.wv AND o.v = w.ww
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM e0) AS n_edges,
           (SELECT CAST(count(*) AS BIGINT) FROM wedges) AS n_wedges,
           (SELECT CAST(count(*) AS BIGINT) FROM tri) AS n_triangles
    """
