"""Similarity & dedup walkthrough on the test corpus: LSH-bucketed
embedding near-dups, IVF top-k neighbor search, MinHash-LSH text
candidates, and the deterministic train/val/test split — the
training-data curation loop, end to end on one session.

Run:  python examples/run_similarity.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from openaq_data_pipeline_engineering_spark.engine import get_spark
from openaq_data_pipeline_engineering_spark.plans.registry import get_queries


def main(sf_dir: str) -> None:
    spark = get_spark(app_name="similarity-demo")
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()

    print("-- embedding near-duplicate pairs (cosine >= 0.9, LSH-bucketed) --")
    qs["embedding_neardup_pairs"](spark, sf_dir).show(5, False)

    print("-- IVF ANN: top-10 neighbors of probe vector in its cell --")
    qs["ivf_ann_topk"](spark, sf_dir).show(10, False)

    print("-- MinHash-LSH text near-dup candidates --")
    qs["minhash_lsh_candidates"](spark, sf_dir).show(5, False)

    print("-- curated corpus stats (lang+quality gates, dedup, near-dup) --")
    qs["corpus_curation"](spark, sf_dir).orderBy("source").show(5, False)

    print("-- reciprocal-rank fusion of cosine + dot rankings (top-5/query) --")
    qs["rrf_fusion_topk"](spark, sf_dir).orderBy("query_id", "fused_rank").show(
        10, False
    )

    print("-- ANN method agreement: overlap@5 of PQ/ADC vs exact --")
    qs["ann_methods_agreement"](spark, sf_dir).show(5, False)

    print("-- deterministic train/val/test split by source --")
    qs["train_test_split"](spark, sf_dir).orderBy("source", "split").show(9, False)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001")
