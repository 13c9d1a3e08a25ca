"""Known-answer pins for the Arrow-native MinHash kernel
(functions/text_arrow.py): the kernel's signatures must be BIT-IDENTICAL
to the SQL-expression pipeline (explode(word_shingles) -> groupBy ->
minhash piece min) that the DuckDB oracles replay — on adversarial
inputs, not just the happy path."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.functions.text import (
    minhash_piece_agg_exprs,
    minhash_piece_cols,
    word_shingles,
)
from openaq_data_pipeline_engineering_spark.functions.text_arrow import (
    minhash_profile_with_shingles,
    minhash_signatures,
    split_profile,
)

# Adversarial corpus: consecutive / leading / trailing spaces (split
# keeps empty tokens), exactly-k and k-1 token docs, empty string,
# NULL, unicode (UTF-8 multibyte md5 input), '#' characters colliding
# with the salt separator, duplicated shingles (min is dup-blind).
DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a b"),  # < k tokens: emits nothing
    (3, "a b c"),  # exactly k tokens: one shingle
    (4, ""),  # split('') = ['']: < k tokens
    (5, None),  # NULL text: explode(NULL) drops the row
    (6, "x  y z  w"),  # consecutive spaces -> empty tokens kept
    (7, " leading and trailing spaces "),
    (8, "héllo wörld ünïcode tokens æøå"),
    (9, "a # b # c # d"),  # '#' tokens vs the '#' salt suffix
    (10, "dup dup dup dup dup dup"),  # one distinct shingle
    (11, "tab\tand\nnewline are single tokens here"),
]


def _jvm_signatures(spark, with_count: bool = False):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    sh = docs.select(
        "doc_id", F.explode(word_shingles("text", k=3)).alias("sh")
    )
    aggs = list(minhash_piece_agg_exprs(8))
    if with_count:
        sh = sh.distinct()
        aggs.append(F.count(F.lit(1)).cast("bigint").alias("n_sh"))
    return (
        sh.select("doc_id", *minhash_piece_cols("sh", 8), "sh")
        .groupBy("doc_id")
        .agg(*aggs)
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_kernel_matches_sql_exprs(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = _rows(minhash_signatures(docs))
    want = _rows(_jvm_signatures(spark))
    assert got == want
    # the <k-token and NULL docs emitted nothing
    emitted = {r[0] for r in got}
    assert emitted == {1, 3, 6, 7, 8, 9, 10, 11}


def test_kernel_with_count_matches_distinct_shingle_counts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = _rows(minhash_signatures(docs, with_count=True))
    want = _rows(_jvm_signatures(spark, with_count=True))
    assert got == want


def test_combined_profile_splits_into_shingles_and_profile(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    combined = minhash_profile_with_shingles(docs)
    sh, prof = split_profile(combined)
    # shingle relation == the JVM distinct-shingle relation
    jvm_sh = (
        docs.select(
            "doc_id", F.explode(word_shingles("text", k=3)).alias("sh")
        )
        .distinct()
    )
    assert _rows(sh) == _rows(jvm_sh)
    # profile relation == signatures + distinct counts
    assert _rows(prof) == _rows(minhash_signatures(docs, with_count=True))


def test_kernel_on_real_corpus(spark, tmp_path):
    """End-to-end over the sf0.001 documents table: every doc's
    signature matches the SQL-expression pipeline bit for bit."""
    from openaq_data_pipeline_engineering_spark.sources.star import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    got = _rows(minhash_signatures(docs, with_count=True))
    sh = docs.select(
        "doc_id", F.explode(word_shingles("text", k=3)).alias("sh")
    ).distinct()
    want = _rows(
        sh.select("doc_id", *minhash_piece_cols("sh", 8))
        .groupBy("doc_id")
        .agg(
            *minhash_piece_agg_exprs(8),
            F.count(F.lit(1)).cast("bigint").alias("n_sh"),
        )
    )
    assert got == want and len(got) > 0
