"""Declared queries: LLM-training-corpus operators, third wave —
test-set decontamination, sequence packing, quantized similarity.

These model the last-mile steps of a pretraining data pipeline that the
earlier waves (queries_text.py, queries_corpus.py, queries_similarity.py)
don't cover:

- decontamination: flag training documents sharing word n-grams with a
  held-out benchmark set (the standard n-gram-overlap decontamination
  check). The eval-side gram set is small by construction -> broadcast;
  the train side shuffles once on doc_id. At 100 TB the eval set stays
  a broadcast (benchmarks are tiny) and the shuffle is ~= one row per
  contaminated doc.
- sequence packing: greedy contiguous fill of documents into
  fixed-token-budget training sequences, computed per source partition
  (cumulative token count over a per-source window), so parallelism is
  ~= number of sources rather than a single total-order window.
- quantized ANN: scalar-quantize embeddings to integers (floor(x*64) —
  multiplying by a power of two is exact in IEEE, so both engines
  quantize identically) and rank neighbors by exact integer dot
  product. This is the int8-style cheap first pass of a two-stage
  rerank; scores are BIGINTs, so the cross-engine hash is bit-exact.

Float policy per plans/registry.py: every output column here is an
integer (BIGINT) or a string — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.functions.text import word_shingles
from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import fan_out, load_table

# Held-out "benchmark" slice: a deterministic 1/97th of documents.
_EVAL_MOD = 97


# --------------------------------------------------------------------------
# Test-set decontamination via word-trigram overlap
# --------------------------------------------------------------------------
@query(
    "decontamination_overlap",
    "decontamination: train docs sharing word trigrams with the eval slice "
    "(broadcast eval gram set, one shuffle on doc_id)",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    grams AS (
      SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
      FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS r(i)
    ),
    eval_g AS (SELECT DISTINCT g FROM grams WHERE doc_id % {_EVAL_MOD} = 0),
    train AS (SELECT DISTINCT doc_id, g FROM grams
              WHERE doc_id % {_EVAL_MOD} <> 0),
    agg AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits
      FROM train t LEFT JOIN eval_g e ON t.g = e.g
      GROUP BY t.doc_id
    )
    SELECT doc_id, n_grams, n_hits FROM agg WHERE n_hits > 0
    """,
)
def decontamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    grams = docs.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("g")
    )
    is_eval = (F.col("doc_id") % _EVAL_MOD) == 0
    eval_g = grams.filter(is_eval).select("g").distinct()
    train = grams.filter(~is_eval).distinct()
    return (
        train.join(
            F.broadcast(eval_g.withColumn("hit", F.lit(1))), "g", "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
    )


# --------------------------------------------------------------------------
# Sequence packing: greedy contiguous fill into fixed token budgets
# --------------------------------------------------------------------------
_PACK_TARGET = 256


@query(
    "sequence_packing",
    "packing: greedy per-source fill of docs into 256-token training "
    "sequences (per-partition cumulative window, no total order)",
    oracle=f"""
    WITH d AS (
      SELECT source, doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ),
    c AS (
      SELECT source, doc_id, n_tok,
             sum(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ) AS cum_before
      FROM d
    ),
    b AS (
      SELECT source, doc_id, n_tok,
             CAST(floor(coalesce(cum_before, 0) / {_PACK_TARGET}) AS BIGINT)
                 AS seq_id
      FROM c
    )
    SELECT source, seq_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM b GROUP BY source, seq_id
    """,
)
def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    d = docs.select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = d.withColumn(
        "seq_id",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / _PACK_TARGET
        ).cast("bigint"),
    )
    return b.groupBy("source", "seq_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def _quantized_dots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(query_id, neighbor_id, embedding, qvec, dot_q): integer-quantized
    dot of every (query < 5, other) pair, carrying both float vectors so
    a rerank stage needs no second pass over the table."""
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    quantize = F.expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 64) AS BIGINT))"
    )
    quant = emb.select("vec_id", "embedding", quantize.alias("q"))
    qset = quant.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qvec"),
        F.col("q").alias("qq"),
    )
    dot_q = F.expr(
        "aggregate(zip_with(q, qq, (a, b) -> a * b), 0L, (acc, x) -> acc + x)"
    )
    return quant.join(
        F.broadcast(qset), F.col("vec_id") != F.col("query_id")
    ).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "embedding",
        "qvec",
        dot_q.alias("dot_q"),
    )



# --------------------------------------------------------------------------
# Quantized (integer) dot-product ANN: cheap first-pass ranking
# --------------------------------------------------------------------------
@query(
    "quantized_ann_topk",
    "similarity: int-quantized (floor(x*64)) dot-product top-5 per query, "
    "broadcast query set, exact integer scores",
    oracle="""
    WITH flat AS (
      SELECT vec_id,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 64) AS BIGINT)
                 AS qx,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    qset AS (SELECT * FROM flat WHERE vec_id < 5),
    dots AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             sum(q.qx * b.qx) AS dot_q
      FROM qset q JOIN flat b ON q.i = b.i AND b.vec_id <> q.vec_id
      GROUP BY q.vec_id, b.vec_id
    )
    SELECT * FROM (
      SELECT query_id, neighbor_id, CAST(dot_q AS BIGINT) AS dot_q,
             row_number() OVER (
               PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id
             ) AS rn
      FROM dots
    ) WHERE rn <= 5
    """,
)
def quantized_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.desc("dot_q"), "neighbor_id"
    )
    return (
        _quantized_dots(spark, sf_dir)
        .select("query_id", "neighbor_id", "dot_q")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
    )


# --------------------------------------------------------------------------
# Two-stage retrieval: quantized prune -> exact cosine rerank
# --------------------------------------------------------------------------
@query(
    "quantized_rerank_topk",
    "similarity: int-quantized top-20 prune, then exact-cosine rerank to "
    "top-5 — the canonical cheap-scan + bounded-rerank ANN shape",
    oracle="""
    WITH flat AS (
      SELECT vec_id,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 64) AS BIGINT)
                 AS qx,
             generate_subscripts(embedding, 1) AS i
      FROM embeddings
    ),
    qset AS (SELECT * FROM flat WHERE vec_id < 5),
    dots AS (
      SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
             sum(q.qx * b.qx) AS dot_q
      FROM qset q JOIN flat b ON q.i = b.i AND b.vec_id <> q.vec_id
      GROUP BY q.vec_id, b.vec_id
    ),
    cand AS (
      SELECT query_id, neighbor_id FROM (
        SELECT query_id, neighbor_id,
               row_number() OVER (
                 PARTITION BY query_id ORDER BY dot_q DESC, neighbor_id
               ) AS c_rn
        FROM dots
      ) WHERE c_rn <= 20
    ),
    exact AS (
      SELECT c.query_id, c.neighbor_id,
             list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
                 AS cos_raw
      FROM cand c
      JOIN embeddings a ON a.vec_id = c.query_id
      JOIN embeddings b ON b.vec_id = c.neighbor_id
    )
    SELECT query_id, neighbor_id, cosine, rn FROM (
      SELECT query_id, neighbor_id, round(cos_raw, 6) AS cosine,
             row_number() OVER (
               PARTITION BY query_id ORDER BY cos_raw DESC, neighbor_id
             ) AS rn
      FROM exact
    ) WHERE rn <= 5
    """,
)
def quantized_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.functions.vectors import cosine

    w1 = Window.partitionBy("query_id").orderBy(F.desc("dot_q"), "neighbor_id")
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_raw"), "neighbor_id")
    return (
        _quantized_dots(spark, sf_dir)
        .withColumn("c_rn", F.row_number().over(w1))
        .filter(F.col("c_rn") <= 20)
        .select(
            "query_id",
            "neighbor_id",
            cosine("embedding", "qvec").alias("cos_raw"),
        )
        .withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cos_raw", 6).alias("cosine"),
            "rn",
        )
    )
