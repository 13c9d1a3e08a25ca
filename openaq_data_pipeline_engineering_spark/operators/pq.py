"""Product quantization (PQ) with asymmetric distance computation (ADC)
— the memory-bound ANN scale path.

Completes the similarity-search ladder (brute-force cosine → LSH
buckets → IVF cells → learned IVF): PQ compresses each vector to M
small codes (here M sub-spaces × K codebook entries), and queries scan
CODES, not vectors — at 100 TB the corpus shrinks from dim×4 bytes to
M bytes per vector, and the per-candidate cost is M table lookups
instead of a dim-length dot product (Jégou et al., "Product
Quantization for Nearest Neighbor Search", TPAMI 2011).

Determinism contract (everything is oracle-checkable integer math):
- Vector components quantize to floor(x·64) BIGINTs (the repo-wide
  int-quantization grid, plans/queries_llm.py quantized_ann_topk).
- The codebook is seeded from the K lowest-id vectors' sub-vectors
  (deterministic; `kmeans_fit` on each sub-space is the drop-in
  refinement at production quality — same shapes, more rounds).
- Encode: argmin integer L2 per (vector, sub-space), code-id tiebreak.
- ADC: per query, a (M × K) integer distance table; approximate
  distance = sum of M lookups; ties break on neighbor id.

Scale shapes: codebook and distance tables are broadcast (M×K rows);
encoding is one join + one map-combined aggregation keyed
(vec_id, sub-space); the ADC scan aggregates M rows per (query,
candidate) — combine with IVF cells to bound the candidate set, or
scan the full code table for exact-PQ ranking as here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

QUANT = 64  # floor(x*64) grid shared with quantized_ann_topk


def flatten_quantized(
    vectors: DataFrame,
    sub_dims: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, m, j, qx): integer-quantized components, split into
    sub-spaces of ``sub_dims`` dimensions."""
    return vectors.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("pos", "val"),
    ).select(
        id_col,
        (F.col("pos") / sub_dims).cast("bigint").alias("m"),
        (F.col("pos") % sub_dims).cast("bigint").alias("j"),
        F.floor(F.col("val").cast("double") * QUANT)
        .cast("bigint")
        .alias("qx"),
    )


def seed_codebook(flat: DataFrame, k: int, id_col: str = "vec_id") -> DataFrame:
    """(m, code, j, cx) from the k lowest-id vectors (code = seed id)."""
    return flat.filter(F.col(id_col) < k).select(
        "m", F.col(id_col).alias("code"), "j", F.col("qx").alias("cx")
    )


def pq_encode(flat: DataFrame, codebook: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """(id, m, code): nearest codebook entry per sub-space (integer L2,
    code-id tiebreak). Codebook is broadcast; the corpus aggregates
    map-side on (id, m, code) then window-collapses per (id, m)."""
    d = (
        flat.join(F.broadcast(codebook), on=["m", "j"])
        .withColumn("dd", (F.col("qx") - F.col("cx")) * (F.col("qx") - F.col("cx")))
        .groupBy(id_col, "m", "code")
        .agg(F.sum("dd").alias("d2"))
    )
    # Argmin as ONE aggregation (partial+final SortAggregate): min of the (d2, code) struct is
    # lexicographically "d2 asc, code asc" — identical row to the
    # previous row_number window's rank 1, but with map-side partial
    # aggregation instead of a second shuffle + sort per (id, m).
    return (
        d.groupBy(id_col, "m")
        .agg(F.min(F.struct("d2", "code")).alias("_best"))
        .select(id_col, "m", F.col("_best.code").alias("code"))
    )


def adc_table(
    probe_flat: DataFrame, codebook: DataFrame, id_col: str = "vec_id"
) -> DataFrame:
    """(query_id, m, code, pd2): per-query integer distance table."""
    return (
        probe_flat.join(F.broadcast(codebook), on=["m", "j"])
        .withColumn("dd", (F.col("qx") - F.col("cx")) * (F.col("qx") - F.col("cx")))
        .groupBy(F.col(id_col).alias("query_id"), "m", "code")
        .agg(F.sum("dd").alias("pd2"))
    )


def pq_adc_topk(
    codes: DataFrame,
    dtable: DataFrame,
    topk: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Rank candidates per query by summed table lookups; keep top-k
    (asc distance, neighbor-id tiebreak). The distance table is
    broadcast; candidates never shuffle before the keyed aggregation."""
    adist = (
        codes.join(F.broadcast(dtable), on=["m", "code"])
        .filter(F.col(id_col) != F.col("query_id"))
        .groupBy("query_id", F.col(id_col).alias("neighbor_id"))
        .agg(F.sum("pd2").cast("bigint").alias("adist"))
    )
    w = Window.partitionBy("query_id").orderBy("adist", "neighbor_id")
    return (
        adist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= topk)
    )
