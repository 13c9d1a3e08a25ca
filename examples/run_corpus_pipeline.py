"""End-to-end training-corpus walkthrough: documents in, training
shards out.

The LLM-data counterpart to run_pipeline.py — the full curation chain
a pretraining pipeline runs, as one composition over the engine's
declared operators:

  1. signal pass     lang-ID + quality + PII + token counts (one scan)
  2. gates           language / quality thresholds
  3. exact dedup     md5 hash-agg, min-id survivor
  4. near-dup        MinHash -> LSH bands -> connected components
  5. decontamination trigram overlap vs a held-out eval slice
  6. split + shard   deterministic hash split, md5 shards
  7. snapshot        versioned commit (time travel)

Run:  python examples/run_corpus_pipeline.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import get_spark
from openaq_data_pipeline_engineering_spark.functions.text import (
    lang_predict,
    pii_count,
    quality_score,
    whitespace_token_count,
)
from openaq_data_pipeline_engineering_spark.operators.cluster import dedup_clusters
from openaq_data_pipeline_engineering_spark.operators.dedup import exact_dedup
from openaq_data_pipeline_engineering_spark.operators.sampling import split_column
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)
from openaq_data_pipeline_engineering_spark.plans.queries_text import (
    minhash_lsh_candidates,
)
from openaq_data_pipeline_engineering_spark.sources.star import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="corpus-pipeline", master="local[8]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()

    # 1-2: signals + gates in one scan
    signals = docs.select(
        "doc_id", "source", "text",
        lang_predict("text").alias("lang"),
        quality_score("text").alias("quality"),
        pii_count("text").alias("n_pii"),
        whitespace_token_count("text").alias("n_tok"),
    )
    gated = signals.filter(
        (F.col("lang") == "en") & (F.col("quality") > 0.4)
    )
    n_gated = gated.count()

    # 3: exact dedup survivors
    keepers = exact_dedup(docs, content_col="text", id_col="doc_id")
    gated = gated.join(keepers.select("doc_id"), "doc_id", "left_semi")

    # 4: near-dup clusters -> drop non-survivors
    pairs = minhash_lsh_candidates(spark, sf_dir)
    clusters = dedup_clusters(pairs, src="doc_a", dst="doc_b")
    losers = clusters.filter(~F.col("is_survivor")).select("doc_id")
    curated = gated.join(losers, "doc_id", "left_anti")
    n_curated = curated.count()

    # 5: decontamination vs an eval slice (here: the 20 lowest doc_ids)
    # — drop the eval docs themselves AND any train doc sharing a word
    # trigram with them (broadcast the tiny eval gram set, same shape
    # as plans/queries_llm.decontamination_overlap)
    from openaq_data_pipeline_engineering_spark.functions.text import (
        word_shingles,
    )

    is_eval = F.col("doc_id") < 20
    grams = docs.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("g")
    ).distinct()
    eval_grams = grams.filter(is_eval).select("g").distinct()
    # contamination rule: >= 3 distinct shared trigrams (a single shared
    # collocation is noise; a run of shared grams is leaked eval text)
    contaminated = (
        grams.filter(~is_eval)
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 3)
        .select("doc_id")
    )
    evald = docs.filter(is_eval).select("doc_id")
    curated = curated.join(
        evald.unionByName(contaminated), "doc_id", "left_anti"
    )
    n_decontam = curated.count()

    # 6: deterministic split + shard assignment
    final = curated.withColumn(
        "split", split_column("doc_id", train_frac=0.9, val_frac=0.05)
    ).withColumn(
        "shard",
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7),
               16, 10).cast("bigint") % 8,
    )

    # 7: versioned snapshot commit
    root = os.path.join(tempfile.mkdtemp(prefix="corpus_mart_"), "snap")
    v = write_snapshot(final.drop("text"), root)
    back = read_snapshot(spark, root, version=v)

    print(f"documents:            {n0}")
    print(f"after lang+quality:   {n_gated}")
    print(f"after dedup stages:   {n_curated}")
    print(f"after decontam:       {n_decontam}")
    print(f"committed version:    {v} (history: {snapshot_versions(root)})")
    back.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
    ).orderBy("split").show()
    back.groupBy("shard").count().orderBy("shard").show()
    spark.stop()


if __name__ == "__main__":
    main()
