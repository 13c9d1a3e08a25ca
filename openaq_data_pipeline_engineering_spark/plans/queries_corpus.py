"""Declared queries: corpus preparation — chunking, TF-IDF, inverted
index, stratified sampling, percentile quality pruning, MERGE/SCD2.

Second wave of beyond-reference LLM-training-data operators (first
wave: queries_text.py / queries_similarity.py). Float policy per
plans/registry.py: scores are built from exact integer counts with a
single IEEE multiply/divide chain replicated operand-for-operand in
the oracle — no transcendental functions, no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.chunking import (
    chunk_documents,
    chunk_documents_sql,
)
from openaq_data_pipeline_engineering_spark.operators.merge import (
    merge_upsert,
    scd2_apply,
)
from openaq_data_pipeline_engineering_spark.operators.sampling import (
    hash_unit_sql,
    stratified_sample,
)
from openaq_data_pipeline_engineering_spark.functions.text import (
    punct_ratio,
    quality_score,
    whitespace_token_count,
)
from openaq_data_pipeline_engineering_spark.plans.queries_text import (
    _punct_ratio_sql,
    _wc_sql,
)
from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import fan_out, load_table


# --------------------------------------------------------------------------
# Sliding token-window chunking (sequence+explode+slice, zero shuffle)
# --------------------------------------------------------------------------
@query(
    "doc_chunks",
    "chunking: overlapping 32-token windows, stride 24, narrow no-shuffle plan",
    oracle=chunk_documents_sql("documents", chunk=32, stride=24),
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return chunk_documents(docs, chunk=32, stride=24)


# --------------------------------------------------------------------------
# TF-IDF top terms per document.  idf is the exact rational N/df (no ln:
# Java's Math.log and DuckDB's libm ln are not guaranteed to agree in the
# last ulp, which would poison the value hash; N/df preserves the same
# ranking for single-corpus scoring).
# --------------------------------------------------------------------------
_TOK = "unnest(string_split(lower(text), ' ')) AS t(tok)"


@query(
    "tfidf_top_terms",
    "TF-IDF: per-doc term frequency x reciprocal document frequency, top-3 terms",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, t.tok FROM documents, {_TOK} WHERE t.tok <> ''
    ),
    tf AS (
        SELECT doc_id, tok, count(*) AS tf FROM tok GROUP BY doc_id, tok
    ),
    df AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY tok
    ),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.tok AS term,
               CAST(tf.tf AS BIGINT) AS tf, df.df,
               CAST(tf.tf AS DOUBLE)
                   * (CAST(n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE))
                   AS score
        FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, score FROM (
        SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY score DESC, term) AS rn
        FROM scored)
    WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    # The materialized TF relation (production inverted-index shape):
    # feeds both the DF aggregation and the scored join; re-deriving it
    # re-tokenizes the corpus per use on this Spark build (no exchange
    # reuse across aliased subtrees).
    tf = tok.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    ).localCheckpoint(eager=True)
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * (F.col("n_docs").cast("double") / F.col("df").cast("double")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


# --------------------------------------------------------------------------
# Inverted index: term -> document-frequency + capped sorted posting list
# --------------------------------------------------------------------------
@query(
    "inverted_index",
    "search: inverted index with df and first-20 posting list per frequent term",
    oracle=f"""
    WITH tok AS (
        SELECT DISTINCT doc_id, t.tok
        FROM documents, {_TOK} WHERE t.tok <> ''
    )
    SELECT tok AS term, CAST(count(*) AS BIGINT) AS df,
           array_to_string(
               list_slice(list(doc_id ORDER BY doc_id), 1, 20), ',')
               AS postings
    FROM tok GROUP BY tok HAVING count(*) >= 5
    ORDER BY df DESC, term LIMIT 100
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
        .distinct()
    )
    return (
        tok.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.array_join(
                F.transform(
                    F.slice(F.sort_array(F.collect_list("doc_id")), 1, 20),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .filter(F.col("df") >= 5)
        .orderBy(F.desc("df"), "term")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Equal-count stratified sampling (deterministic hash rank per source)
# --------------------------------------------------------------------------
@query(
    "stratified_sample_docs",
    "sampling: exactly 25 docs per source, deterministic hash-ranked",
    oracle=f"""
    SELECT doc_id, source, lang FROM (
        SELECT doc_id, source, lang, row_number() OVER (
            PARTITION BY source
            ORDER BY {hash_unit_sql('doc_id', 'strat')}, doc_id) AS rn
        FROM documents)
    WHERE rn <= 25
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "source", "lang"
    )
    return stratified_sample(
        docs, key="doc_id", strata_col="source", n_per_stratum=25
    )


# --------------------------------------------------------------------------
# Percentile-based quality pruning: keep each source's top half by the
# composite quality score (corpus curation by relative quality, not a
# global threshold — robust to per-source score drift).
# --------------------------------------------------------------------------
_QUALITY_SQL = (
    f"(CAST({_wc_sql('text')} AS DOUBLE)"
    f" / (CAST({_wc_sql('text')} AS DOUBLE) + 50.0))"
    f" * (1.0 - {_punct_ratio_sql('text')})"
)


@query(
    "quality_percentile_prune",
    "curation: keep top-half quality per source via percent_rank window",
    oracle=f"""
    WITH s AS (
        SELECT doc_id, source, {_QUALITY_SQL} AS quality FROM documents
    )
    SELECT doc_id, source, quality, pr FROM (
        SELECT *, percent_rank() OVER (
            PARTITION BY source ORDER BY quality, doc_id) AS pr
        FROM s)
    WHERE pr >= 0.5
    """,
)
def quality_percentile_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    s = docs.select(
        "doc_id", "source", quality_score("text").alias("quality")
    )
    w = Window.partitionBy("source").orderBy("quality", "doc_id")
    return (
        s.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.5)
        .select("doc_id", "source", "quality", "pr")
    )


# --------------------------------------------------------------------------
# MERGE/upsert + SCD2 history over the customer dimension.  The changes
# slice is derived from the same table (keys 1001-1400, segment moved,
# balance +100) so the oracle can reconstruct it exactly.
# --------------------------------------------------------------------------
_BASE_SQL = (
    "SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS c_acctbal "
    "FROM customer WHERE c_custkey <= 1200"
)
_UPD_SQL = (
    "SELECT c_custkey, 'MOVED' AS c_mktsegment, "
    "CAST(c_acctbal AS DOUBLE) + 100.0 AS c_acctbal "
    "FROM customer WHERE c_custkey > 1000 AND c_custkey <= 1400"
)


def _merge_inputs(spark: SparkSession, sf_dir: str):
    cust = fan_out(load_table(spark, sf_dir, "customer"))
    base = cust.filter(F.col("c_custkey") <= 1200).select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    upd = cust.filter(
        (F.col("c_custkey") > 1000) & (F.col("c_custkey") <= 1400)
    ).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        (F.col("c_acctbal").cast("double") + F.lit(100.0)).alias("c_acctbal"),
    )
    return base, upd


@query(
    "merge_upsert_customers",
    "MERGE: updates replace same-key base rows, unmatched updates insert",
    oracle=f"""
    WITH base AS ({_BASE_SQL}), upd AS ({_UPD_SQL})
    SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal
    FROM base b ANTI JOIN upd u ON b.c_custkey = u.c_custkey
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal FROM upd
    """,
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, upd = _merge_inputs(spark, sf_dir)
    return merge_upsert(base, upd, keys=["c_custkey"])


@query(
    "scd2_customer_history",
    "SCD2: closed-out old versions + current rows with version/is_current",
    oracle=f"""
    WITH base AS ({_BASE_SQL}), upd AS ({_UPD_SQL})
    SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal,
           CAST(1 AS INT) AS version, false AS is_current
    FROM base b SEMI JOIN upd u ON b.c_custkey = u.c_custkey
    UNION ALL
    SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal,
           CAST(1 AS INT) AS version, true AS is_current
    FROM base b ANTI JOIN upd u ON b.c_custkey = u.c_custkey
    UNION ALL
    SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal,
           CAST(CASE WHEN b.c_custkey IS NULL THEN 1 ELSE 2 END AS INT)
               AS version,
           true AS is_current
    FROM upd u LEFT JOIN base b ON u.c_custkey = b.c_custkey
    """,
)
def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    base, upd = _merge_inputs(spark, sf_dir)
    return scd2_apply(base, upd, keys=["c_custkey"])


# --------------------------------------------------------------------------
# Fixed-N per-stratum sample: the deterministic complement to
# stratified_sample_docs (fraction-based). Rank by md5-of-key inside
# each stratum and keep the first N — layout- and cluster-size-
# independent, reproducible, and (unlike LIMIT) total-ordered.
# WindowGroupLimit keeps the rank partial: each map task pre-prunes to
# its local top-N before the shuffle.
# --------------------------------------------------------------------------
@query(
    "fixed_n_sample",
    "sampling: deterministic fixed-N per source (md5 rank, "
    "WindowGroupLimit pre-prune)",
    oracle="""
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT source, doc_id, CAST(rn AS INTEGER) AS rn
    FROM r WHERE rn <= 20
    """,
)
def fixed_n_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select("source", "doc_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 20)
    )


# --------------------------------------------------------------------------
# Quantile normalization (rank -> uniform grid): the feature-transform
# that maps each value to its empirical quantile, emitted as integer
# ppm so the grid is engine-exact. Ties broken by doc_id for a total
# order (rank-based, so the output distribution is uniform by
# construction regardless of the input's shape).
# --------------------------------------------------------------------------
@query(
    "quantile_normalize",
    "feature transform: per-source rank -> uniform ppm grid "
    "(empirical-quantile normalization, integer-exact)",
    oracle="""
    WITH r AS (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars, doc_id) AS rn,
             count(*) OVER (PARTITION BY source) AS n
      FROM documents
    )
    SELECT source, doc_id, n_chars,
           CAST(((rn - 1) * 1000000) // greatest(n - 1, 1) AS BIGINT)
               AS q_ppm
    FROM r WHERE doc_id < 400
    """,
)
def quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    w_rank = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    w_n = Window.partitionBy("source")
    return (
        docs.select(
            "source",
            "doc_id",
            "n_chars",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_n).alias("n"),
        )
        .filter(F.col("doc_id") < 400)
        .select(
            "source",
            "doc_id",
            "n_chars",
            F.expr(
                "((rn - 1) * CAST(1000000 AS BIGINT)) "
                "div greatest(n - 1, CAST(1 AS BIGINT))"
            ).alias("q_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Largest-remainder quota allocation (Hamilton apportionment): split a
# fixed sample budget of 100 docs across sources exactly proportional
# to corpus mass — integer quotas floor'd, the remaining seats go to
# the largest fractional remainders (ties by source name). The exact
# integer method every quota sampler needs (naive rounding over- or
# under-shoots the budget); allocations sum to the budget by
# construction. Remainders are compared as integer cross-products
# (n*budget % total), no floats.
# --------------------------------------------------------------------------
_QUOTA_BUDGET = 100


@query(
    "quota_allocation",
    "sampling: largest-remainder (Hamilton) allocation of a 100-doc "
    "budget across sources — integer-exact, sums to budget",
    oracle=f"""
    WITH m AS (
      SELECT source, count(*) AS n,
             (SELECT count(*) FROM documents) AS total
      FROM documents GROUP BY source
    ),
    q AS (
      SELECT source, n,
             (n * {_QUOTA_BUDGET}) // total AS base,
             (n * {_QUOTA_BUDGET}) % total AS rem,
             total
      FROM m
    ),
    ranked AS (
      SELECT *,
             row_number() OVER (ORDER BY rem DESC, source) AS rr,
             {_QUOTA_BUDGET} - sum(base) OVER () AS leftover
      FROM q
    )
    SELECT source, CAST(n AS BIGINT) AS n_docs,
           CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS quota
    FROM ranked
    """,
)
def quota_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    m = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    total_df = docs.agg(F.count(F.lit(1)).alias("total"))
    q = m.crossJoin(F.broadcast(total_df)).select(
        "source",
        "n",
        F.expr(f"(n * {_QUOTA_BUDGET}) div total").alias("base"),
        ((F.col("n") * _QUOTA_BUDGET) % F.col("total")).alias("rem"),
    )
    w_rank = Window.orderBy(F.desc("rem"), "source")
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    ranked = q.withColumn("rr", F.row_number().over(w_rank)).withColumn(
        "leftover", F.lit(_QUOTA_BUDGET) - F.sum("base").over(w_all)
    )
    return ranked.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        (
            F.col("base")
            + F.when(F.col("rr") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("quota"),
    )
