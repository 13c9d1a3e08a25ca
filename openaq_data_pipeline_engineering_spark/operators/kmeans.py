"""Spherical k-means (cosine Lloyd iterations) for IVF index training.

The reference has no vector indexing at all; this completes the
similarity-search scale path: ``ivf_ann_topk`` coarse-quantizes into
FIXED cells, and this operator learns the cells from the data — the
standard IVF recipe (train centroids on a sample, assign the corpus,
search only the probe's cell).

Design for determinism AND scale:

- **Deterministic everywhere**: init = the k lowest-id vectors;
  assignment similarity rounded to ``round_decimals`` with centroid-id
  tiebreak; per-dimension means computed as ``round(sum, d)/count``
  (exact division of an on-grid sum). An identical computation is
  SQL-expressible, so training itself is oracle-checkable cross-engine.
- **Bounded iterations**: Lloyd rounds are unrolled — no convergence
  polling. Each round's centroid table (k × dim values, trivially
  small at any corpus size) is materialized so a round executes exactly
  once; the CORPUS side is never materialized. Broadcast of the
  centroid table makes each assignment a map-side pass.
- **Update step is a posexplode + groupBy(cell, pos)**: shuffle volume
  is N·dim value rows per round — linear, uniform keys (dim spreads
  every cell across partitions), no skew amplification.

At 100 TB you would train on a sampled slice (``vectors.sample``)
and only ASSIGN the full corpus; both steps are the same code.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.functions.vectors import (
    cosine_pre,
    norm,
)


def assign_cells(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (ties → min cid).

    Returns (id_col, vec_col, cell). Centroids (cid, cvec) are
    broadcast — the corpus side never shuffles.
    """
    # Loop-invariant norm hoisting (r12, guide §1.2 per-task work): each
    # vector's norm fold ran k times (once per centroid pair) and each
    # centroid's N times; precomputing both sides is bit-identical (the
    # same left-fold, evaluated once) and cuts the dominant pair stage
    # from three interpreted array folds to one.
    vn = vectors.withColumn("_vnorm", norm(vec_col))
    cn = centroids.withColumn("_cnorm", norm("cvec"))
    scored = vn.join(F.broadcast(cn)).withColumn(
        "ccos",
        F.round(cosine_pre(vec_col, "cvec", "_vnorm", "_cnorm"), round_decimals),
    )
    # Argmax as ONE aggregation (partial+final SortAggregate): max of the (ccos, -cid) struct is
    # lexicographically "ccos desc, cid asc" — identical row to the
    # previous row_number window's rank 1. The broadcast join leaves
    # all k scored copies of a vector inside its map partition, so
    # partial aggregation collapses them BEFORE the exchange: the
    # shuffle carries N unsorted rows instead of N·k rows through a
    # window sort (k× fewer bytes, no sort).
    return (
        scored.groupBy(id_col)
        .agg(
            F.any_value(vec_col).alias(vec_col),
            F.max(
                F.struct(F.col("ccos"), (-F.col("cid")).alias("ncid"))
            ).alias("_best"),
        )
        .select(id_col, vec_col, (-F.col("_best.ncid")).alias("cell"))
    )


def kmeans_fit(
    vectors: DataFrame,
    k: int,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
    materialize: bool = True,
) -> DataFrame:
    """Train k spherical-k-means centroids; returns (cid, cvec).

    cid values are the ORIGINAL seed ids only at init; after an update
    round they are the cell labels the seeds induced. Cells that lose
    every member simply drop out (mirrorable in SQL, and harmless for
    IVF: an empty cell indexes nothing).
    """
    seeds = vectors.orderBy(id_col).limit(k)
    centroids = seeds.select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec")
    )
    for _ in range(iterations):
        assigned = assign_cells(
            vectors, centroids, id_col, vec_col, round_decimals
        )
        dims = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col)).alias("pos", "val")
            )
            .groupBy("cell", "pos")
            .agg(
                (
                    F.round(F.sum(F.col("val").cast("double")), round_decimals)
                    / F.count(F.lit(1))
                ).alias("m")
            )
        )
        centroids = (
            dims.groupBy("cell")
            .agg(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s.getField("m"),
                ).alias("cvec")
            )
            .select(F.col("cell").alias("cid"), "cvec")
        )
        if materialize:
            # k × dim values — always driver-safe; without this, every
            # downstream consumer would replay ALL prior Lloyd rounds.
            centroids = centroids.localCheckpoint(eager=True)
    return centroids
