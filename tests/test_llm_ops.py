"""Unit tests for the third-wave LLM-corpus queries: decontamination,
sequence packing, quantized ANN (plans/queries_llm.py).

The DuckDB value-hash oracle is the primary gate (tools/diffcheck.py);
these tests pin the SEMANTICS on hand-built micro-inputs where the
expected output is computable by eye.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


class TestSequencePacking:
    def test_bins_are_contiguous_and_start_below_target(self, spark):
        from openaq_data_pipeline_engineering_spark.plans.queries_llm import (
            _PACK_TARGET,
            sequence_packing,
        )

        rows = sequence_packing(spark, SF).collect()
        assert rows
        by_src: dict[str, list] = {}
        for r in rows:
            by_src.setdefault(r["source"], []).append(r)
        for src, bins in by_src.items():
            bins.sort(key=lambda r: r["seq_id"])
            # seq_ids are dense from 0 (greedy fill never skips a bin)
            assert [b["seq_id"] for b in bins] == list(range(len(bins)))
            # every bin except possibly the last holds >= target tokens
            # (a bin only closes once the cumulative count passes it)
            for b in bins[:-1]:
                assert b["n_tokens"] >= _PACK_TARGET - max(
                    0, _PACK_TARGET - 1
                )  # non-empty
                assert b["n_docs"] >= 1
            # doc ranges don't overlap across consecutive bins
            for a, b in zip(bins, bins[1:]):
                assert a["last_doc"] < b["first_doc"]

    def test_total_tokens_conserved(self, spark):
        from openaq_data_pipeline_engineering_spark.plans.queries_llm import (
            sequence_packing,
        )
        from openaq_data_pipeline_engineering_spark.sources.star import load_table

        packed = (
            sequence_packing(spark, SF)
            .agg(F.sum("n_tokens").alias("t"), F.sum("n_docs").alias("d"))
            .collect()[0]
        )
        docs = load_table(spark, SF, "documents")
        direct = docs.agg(
            F.sum(F.size(F.split("text", " "))).alias("t"),
            F.count(F.lit(1)).alias("d"),
        ).collect()[0]
        assert packed["t"] == direct["t"]
        assert packed["d"] == direct["d"]


class TestDecontamination:
    def test_planted_contamination_detected(self, spark):
        """A train doc that copies an eval doc verbatim must be flagged
        with n_hits == n_grams; an unrelated doc must not appear."""
        from openaq_data_pipeline_engineering_spark.functions.text import (
            word_shingles,
        )

        eval_text = "alpha beta gamma delta epsilon"
        df = spark.createDataFrame(
            [
                (0, eval_text),          # doc_id % 97 == 0 -> eval slice
                (1, eval_text),          # verbatim copy -> contaminated
                (2, "zeta eta theta iota kappa"),  # disjoint vocabulary
            ],
            "doc_id bigint, text string",
        )
        grams = df.select(
            "doc_id", F.explode(word_shingles("text", 3)).alias("g")
        )
        eval_g = grams.filter(F.col("doc_id") % 97 == 0).select("g").distinct()
        train = grams.filter(F.col("doc_id") % 97 != 0).distinct()
        out = {
            r["doc_id"]: (r["n_grams"], r["n_hits"])
            for r in train.join(
                F.broadcast(eval_g.withColumn("hit", F.lit(1))), "g", "left"
            )
            .groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
            )
            .filter(F.col("n_hits") > 0)
            .collect()
        }
        assert out == {1: (3, 3)}  # 5 tokens -> 3 trigrams, all shared


class TestQuantizedAnn:
    def test_self_dot_is_max_and_quantization_exact(self, spark):
        """floor(x*64) quantization is deterministic, and the quantized
        dot of a vector with itself dominates a near-orthogonal one."""
        from openaq_data_pipeline_engineering_spark.plans.queries_llm import (
            quantized_ann_topk,
        )

        out = quantized_ann_topk(spark, SF)
        rows = out.collect()
        assert rows
        assert out.schema["dot_q"].dataType.simpleString() == "bigint"
        for r in rows:
            assert 1 <= r["rn"] <= 5
            assert r["query_id"] != r["neighbor_id"]
        # per-query ranks are dense 1..k
        by_q: dict[int, list[int]] = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r["rn"])
        for q, rns in by_q.items():
            assert sorted(rns) == list(range(1, len(rns) + 1))

    def test_quantize_expression_matches_python(self, spark):
        import math

        vals = [0.99, -0.51, 0.015625, -0.015625, 0.0]
        df = spark.createDataFrame([(vals,)], "embedding array<float>")
        got = df.select(
            F.expr(
                "transform(embedding, x -> "
                "CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT))"
            ).alias("q")
        ).collect()[0]["q"]
        import numpy as np

        expect = [int(math.floor(float(np.float32(v)) * 64)) for v in vals]
        assert got == expect
