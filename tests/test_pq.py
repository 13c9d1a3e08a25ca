"""Product-quantization ANN: encode invariants + ADC recall."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.pq import (
    adc_table,
    flatten_quantized,
    pq_adc_topk,
    pq_encode,
    seed_codebook,
)
from openaq_data_pipeline_engineering_spark.sources.star import load_table

SF_DIR = "/root/testdata/sf0.01"
SUB_DIMS, K, PROBES = 16, 8, 5


def _pipeline(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    flat = flatten_quantized(emb, SUB_DIMS)
    cb = seed_codebook(flat, K)
    codes = pq_encode(flat, cb)
    return flat, cb, codes


class TestPQ:
    def test_encode_one_code_per_subspace_in_range(self, spark):
        flat, _, codes = _pipeline(spark)
        n_vec = flat.select("vec_id").distinct().count()
        n_sub = flat.select("m").distinct().count()
        assert codes.count() == n_vec * n_sub
        assert codes.filter(
            (F.col("code") < 0) | (F.col("code") >= K)
        ).count() == 0
        # seeds encode to themselves (their own sub-vector is at d2=0)
        self_codes = codes.filter(
            (F.col("vec_id") < K) & (F.col("code") != F.col("vec_id"))
        ).count()
        assert self_codes == 0

    def test_adc_recall_beats_chance(self, spark):
        flat, cb, codes = _pipeline(spark)
        dtab = adc_table(flat.filter(F.col("vec_id") < PROBES), cb)
        pq = pq_adc_topk(codes, dtab, topk=10)
        q, b = flat.alias("q"), flat.alias("b")
        exact = (
            q.filter(F.col("q.vec_id") < PROBES)
            .join(
                b,
                (F.col("q.m") == F.col("b.m"))
                & (F.col("q.j") == F.col("b.j"))
                & (F.col("q.vec_id") != F.col("b.vec_id")),
            )
            .groupBy(
                F.col("q.vec_id").alias("query_id"),
                F.col("b.vec_id").alias("neighbor_id"),
            )
            .agg(
                F.sum(
                    (F.col("q.qx") - F.col("b.qx"))
                    * (F.col("q.qx") - F.col("b.qx"))
                ).alias("d2")
            )
        )
        w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
        ex10 = exact.withColumn("rn", F.row_number().over(w)).filter(
            "rn <= 10"
        )
        got = {(r.query_id, r.neighbor_id) for r in pq.collect()}
        want = {(r.query_id, r.neighbor_id) for r in ex10.collect()}
        # Random top-10 of 500 vectors would overlap ~0.2/query; the
        # 12-bit PQ measures ~2.8. Assert a comfortable margin.
        assert len(got & want) / PROBES >= 1.0
