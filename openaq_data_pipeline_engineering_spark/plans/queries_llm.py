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


# --------------------------------------------------------------------------
# Capstone: full pretraining-data funnel with per-stage survivor counts
# --------------------------------------------------------------------------
def _funnel_oracle() -> str:
    from openaq_data_pipeline_engineering_spark.functions.text import (
        minhash_sql_exprs,
    )
    from openaq_data_pipeline_engineering_spark.operators.sampling import (
        split_column_sql,
    )
    from openaq_data_pipeline_engineering_spark.plans.queries_text import (
        _BANDS,
        _NUM_HASHES,
        _quality_sql,
        _wc_sql,
    )

    mins = ",\n               ".join(minhash_sql_exprs("sh", _NUM_HASHES))
    bands = ", ".join(f"md5(h{a} || h{b})" for a, b in _BANDS)
    split = split_column_sql("doc_id")
    return f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ), sh AS (
        SELECT doc_id,
               unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                       for i in range(1, len(t) - 1)]) AS sh
        FROM toks WHERE len(t) >= 3
    ), mh AS (
        SELECT doc_id, {mins}
        FROM sh GROUP BY doc_id
    ), bandtab AS (
        SELECT doc_id, unnest([{bands}]) AS band FROM mh
    ), near_b AS (
        SELECT DISTINCT b.doc_id AS doc_id
        FROM bandtab a JOIN bandtab b ON a.band = b.band AND a.doc_id < b.doc_id
    ), keepers AS (
        SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
    ), eval_g AS (
        SELECT DISTINCT sh AS g FROM sh WHERE doc_id % {_EVAL_MOD} = 0
    ), contam AS (
        SELECT DISTINCT s.doc_id FROM sh s JOIN eval_g e ON s.sh = e.g
        WHERE s.doc_id % {_EVAL_MOD} <> 0
    ), flags AS (
        SELECT d.doc_id, d.source, {_wc_sql('d.text')} AS wc,
               (d.lang = 'en') AS lang_ok,
               ({_quality_sql('d.text')} > 0.4) AS q_ok,
               (k.doc_id IS NOT NULL) AS keep,
               (n.doc_id IS NOT NULL) AS nd,
               (c.doc_id IS NOT NULL OR d.doc_id % {_EVAL_MOD} = 0) AS ct
        FROM documents d
        LEFT JOIN keepers k ON d.doc_id = k.doc_id
        LEFT JOIN near_b n ON d.doc_id = n.doc_id
        LEFT JOIN contam c ON d.doc_id = c.doc_id
    ), surv AS (
        SELECT * FROM flags
        WHERE lang_ok AND q_ok AND keep AND NOT nd AND NOT ct
    ), packed AS (
        SELECT source,
               CAST(floor(coalesce(sum(wc) OVER (
                   PARTITION BY source ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) / {_PACK_TARGET}) AS BIGINT) AS seq_id
        FROM surv
    )
    SELECT CAST(1 AS BIGINT) AS stage, 'raw' AS stage_name,
           CAST(count(*) AS BIGINT) AS n FROM flags
    UNION ALL SELECT 2, 'lang_en',
           CAST(sum(CASE WHEN lang_ok THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL SELECT 3, 'quality',
           CAST(sum(CASE WHEN lang_ok AND q_ok THEN 1 ELSE 0 END) AS BIGINT)
           FROM flags
    UNION ALL SELECT 4, 'exact_dedup',
           CAST(sum(CASE WHEN lang_ok AND q_ok AND keep
                    THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL SELECT 5, 'near_dedup',
           CAST(sum(CASE WHEN lang_ok AND q_ok AND keep AND NOT nd
                    THEN 1 ELSE 0 END) AS BIGINT) FROM flags
    UNION ALL SELECT 6, 'decontaminated',
           CAST(count(*) AS BIGINT) FROM surv
    UNION ALL SELECT 7, 'chunks',
           CAST(coalesce(sum(1 + greatest(wc - 9, 0) // 24), 0) AS BIGINT)
           FROM surv
    UNION ALL SELECT 8, 'packed_sequences',
           CAST(count(DISTINCT (source, seq_id)) AS BIGINT) FROM packed
    UNION ALL SELECT 9, 'train_docs',
           CAST(sum(CASE WHEN ({split}) = 'train' THEN 1 ELSE 0 END)
                AS BIGINT) FROM surv
    """


@query(
    "pretraining_funnel",
    "capstone: per-stage survivor counts through lang -> quality -> exact "
    "dedup -> near-dup -> decontamination -> chunk/pack/split — flags "
    "computed in one scan, conditional sums per stage",
    oracle=_funnel_oracle(),
)
def pretraining_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.functions.text import (
        quality_score,
        whitespace_token_count,
    )
    from openaq_data_pipeline_engineering_spark.functions.text_arrow import (
        minhash_signatures,
    )
    from openaq_data_pipeline_engineering_spark.operators.dedup import exact_dedup
    from openaq_data_pipeline_engineering_spark.operators.sampling import (
        split_column,
    )
    from openaq_data_pipeline_engineering_spark.plans.queries_text import (
        _BANDS,
        _NUM_HASHES,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))

    keepers = exact_dedup(docs, content_col="text", id_col="doc_id").select(
        "doc_id"
    )

    # near-dup signatures from the Arrow kernel (r13, guide §4.2 —
    # bit-identical to the explode → groupBy pipeline,
    # tests/test_text_arrow.py); the decontamination branch below keeps
    # its JVM shingle explode (it needs the shingle RELATION, and its
    # consumers are duplicate-blind distinct/semi joins).
    sh = docs.select("doc_id", F.explode(word_shingles("text", 3)).alias("sh"))
    mh = minhash_signatures(docs, num_hashes=_NUM_HASHES)
    band_exprs = [
        F.md5(F.concat(F.col(f"h{a}"), F.col(f"h{b}"))) for a, b in _BANDS
    ]
    bandtab = mh.select("doc_id", F.explode(F.array(*band_exprs)).alias("band"))
    a, b = bandtab.alias("a"), bandtab.alias("b")
    near_b = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("doc_id"))
        .distinct()
    )

    is_eval = (F.col("doc_id") % _EVAL_MOD) == 0
    eval_g = sh.filter(is_eval).select(F.col("sh").alias("g")).distinct()
    contam = (
        sh.filter(~is_eval)
        .join(F.broadcast(eval_g), F.col("sh") == F.col("g"), "left_semi")
        .select("doc_id")
        .distinct()
    )

    flags = (
        docs.select(
            "doc_id",
            "source",
            whitespace_token_count("text").alias("wc"),
            (F.col("lang") == "en").alias("lang_ok"),
            (quality_score("text") > 0.4).alias("q_ok"),
        )
        .join(keepers.withColumn("__k", F.lit(1)), "doc_id", "left")
        .join(near_b.withColumn("__n", F.lit(1)), "doc_id", "left")
        .join(contam.withColumn("__c", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "wc",
            "lang_ok",
            "q_ok",
            F.col("__k").isNotNull().alias("keep"),
            F.col("__n").isNotNull().alias("nd"),
            (F.col("__c").isNotNull() | is_eval).alias("ct"),
        )
    )
    # The flag table feeds four aggregation branches; pin it once so the
    # LSH/minhash subtree isn't re-executed per branch.
    flags = flags.localCheckpoint(eager=True)
    survcond = (
        F.col("lang_ok")
        & F.col("q_ok")
        & F.col("keep")
        & ~F.col("nd")
        & ~F.col("ct")
    )
    surv = flags.filter(survcond)

    ones = lambda c: F.sum(F.when(c, 1).otherwise(0))  # noqa: E731

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = surv.select(
        "source",
        F.floor(
            F.coalesce(F.sum("wc").over(w), F.lit(0)) / _PACK_TARGET
        ).alias("seq_id"),
    )

    # The nine funnel rows were nine unionByName'd aggregation branches
    # — nine passes over the checkpointed flag table, each with its own
    # partial+final exchange pair. All stage counts except the packed
    # one are conditional sums over the SAME rows (the stage-6..9
    # branches filtered by survcond, which folds into a when()), so one
    # aggregation computes stages 1-7 and 9, a second computes the
    # window-dependent stage 8, and the 1-row results cross-join and
    # explode into the identical 9-row funnel: 2 passes instead of 9.
    flag_aggs = flags.agg(
        F.count(F.lit(1)).alias("s1"),
        ones(F.col("lang_ok")).alias("s2"),
        ones(F.col("lang_ok") & F.col("q_ok")).alias("s3"),
        ones(F.col("lang_ok") & F.col("q_ok") & F.col("keep")).alias("s4"),
        ones(
            F.col("lang_ok") & F.col("q_ok") & F.col("keep") & ~F.col("nd")
        ).alias("s5"),
        ones(survcond).alias("s6"),
        F.sum(
            F.when(
                survcond,
                F.lit(1)
                + F.expr("CAST(greatest(wc - 9, 0) div 24 AS BIGINT)"),
            )
        ).alias("s7"),
        ones(survcond & (split_column("doc_id") == "train")).alias("s9"),
    )
    pack_agg = packed.agg(
        F.count_distinct(F.col("source"), F.col("seq_id")).alias("s8")
    )

    def stage_struct(stage: int, name: str, col: str):
        return F.struct(
            F.lit(stage).cast("bigint").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.coalesce(F.col(col), F.lit(0)).cast("bigint").alias("n"),
        )

    return (
        flag_aggs.crossJoin(pack_agg)
        .select(
            F.explode(
                F.array(
                    stage_struct(1, "raw", "s1"),
                    stage_struct(2, "lang_en", "s2"),
                    stage_struct(3, "quality", "s3"),
                    stage_struct(4, "exact_dedup", "s4"),
                    stage_struct(5, "near_dedup", "s5"),
                    stage_struct(6, "decontaminated", "s6"),
                    stage_struct(7, "chunks", "s7"),
                    stage_struct(8, "packed_sequences", "s8"),
                    stage_struct(9, "train_docs", "s9"),
                )
            ).alias("r")
        )
        .select("r.*")
    )
