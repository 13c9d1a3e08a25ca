"""Declared queries: LLM-training-corpus operators, fourth wave —
n-gram language modeling, tokenizer vocabulary build, boilerplate
stripping, deterministic sharding, CDC tombstones.

The reference pipeline stops at mart SQL (its analytics surface is
Athena over the pivoted mart, reference utils/athena_utils.py:38-65);
these model the corpus-side steps a 100 TB training-data pipeline runs
after curation (queries_text/queries_corpus/queries_llm waves):

- bigram LM counts: the classic count-based language model build.
  Shuffle ∝ distinct bigrams with map-side partial aggregation; the
  conditional probability is integer-scaled (ppm) so the cross-engine
  hash is bit-exact — no float sums anywhere.
- vocabulary coverage: the tokenizer-training view (top-k tokens +
  cumulative corpus coverage). The ranking window is vocab-bounded
  (distinct tokens, not corpus rows), which is what makes it safe at
  100 TB: the heavy corpus collapses to per-token counts first.
- boilerplate chunk stripping: fixed-width non-overlapping token
  chunks; a chunk seen in ≥2 distinct documents is boilerplate
  (headers, license banners, nav bars). One hash aggregation on the
  chunk text + one join back — shuffle ∝ distinct chunks.
- deterministic sharding: layout-independent md5 shard assignment for
  training-data writes — any cluster size produces the same shard
  membership (same property as operators/sampling.split_column), so a
  re-run on 10× executors bit-reproduces the corpus layout.
- CDC apply with tombstones: operators/merge.cdc_apply — latest change
  per key wins, deletes remove keys. Collapse-then-join: the change
  stream never touches base more than once.

Float policy per plans/registry.py: every output column here is an
integer (BIGINT), string, or exact DOUBLE arithmetic on per-row values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.merge import cdc_apply
from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import fan_out, load_table


# --------------------------------------------------------------------------
# Bigram language-model counts: top next-word per word, ppm-scaled
# conditional probability (pure integer arithmetic, bit-exact).
# --------------------------------------------------------------------------
@query(
    "bigram_lm_topnext",
    "LM: bigram counts, per-word top-3 next words with ppm conditional "
    "probability (integer-exact; shuffle ∝ distinct bigrams)",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, greatest(len(t), 1))) AS r(i)
    ),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
            FROM bg GROUP BY 1, 2),
    c1 AS (SELECT w1 AS u1, CAST(sum(c12) AS BIGINT) AS c1
           FROM c12 GROUP BY 1)
    SELECT w1, w2, c12, c1,
           (c12 * 1000000) // c1 AS p_ppm, rn
    FROM (
      SELECT w1, w2, c12,
             row_number() OVER (
               PARTITION BY w1 ORDER BY c12 DESC, w2
             ) AS rn
      FROM c12
    ) JOIN c1 ON w1 = u1
    WHERE rn <= 3
    """,
)
def bigram_lm_topnext(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = F.split("text", " ")
    pairs = (
        docs.select(t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, "
                    "element_at(t, i + 1) AS w2))"
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
    )
    c12 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    c1 = c12.groupBy(F.col("w1").alias("u1")).agg(
        F.sum("c12").alias("c1")
    )
    w = Window.partitionBy("w1").orderBy(F.desc("c12"), "w2")
    return (
        c12.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .join(c1, F.col("w1") == F.col("u1"))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            F.expr("(c12 * CAST(1000000 AS BIGINT)) div c1").alias("p_ppm"),
            "rn",
        )
    )


# --------------------------------------------------------------------------
# Tokenizer vocabulary build: top-k tokens + cumulative corpus coverage
# --------------------------------------------------------------------------
@query(
    "vocab_coverage",
    "tokenizer build: top-30 tokens by count with cumulative ppm corpus "
    "coverage (corpus collapses to vocab-bounded counts before any window)",
    oracle="""
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    w AS (SELECT unnest(t) AS tok FROM toks),
    cnt AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM w GROUP BY tok),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM cnt),
    ranked AS (
      SELECT tok, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, tok) AS BIGINT)
                 AS rank,
             CAST(sum(cnt) OVER (
               ORDER BY cnt DESC, tok
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_cnt
      FROM cnt
    )
    SELECT tok, cnt, rank, cum_cnt,
           (cum_cnt * 1000000) // total AS cov_ppm
    FROM ranked, tot WHERE rank <= 30
    """,
)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    cnt = (
        docs.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # Both windows are over the VOCAB (distinct tokens), not the corpus:
    # the single-partition window is bounded by vocabulary size.
    w = Window.orderBy(F.desc("cnt"), "tok")
    ranked = cnt.select(
        "tok",
        "cnt",
        F.row_number().over(w).cast("bigint").alias("rank"),
        F.sum("cnt")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint")
        .alias("cum_cnt"),
    )
    total = cnt.agg(F.sum("cnt").cast("bigint").alias("total"))
    return (
        ranked.filter(F.col("rank") <= 30)
        .join(F.broadcast(total))
        .select(
            "tok",
            "cnt",
            "rank",
            "cum_cnt",
            F.expr("(cum_cnt * CAST(1000000 AS BIGINT)) div total").alias(
                "cov_ppm"
            ),
        )
    )


# --------------------------------------------------------------------------
# Boilerplate stripping: chunks repeated across documents
# --------------------------------------------------------------------------
_CHUNK_W = 16


@query(
    "boilerplate_chunks",
    "curation: per-doc counts of 16-token chunks repeated in ≥2 docs "
    "(boilerplate); one hash agg on chunk text + one join back",
    oracle=f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
                  FROM documents),
    ch AS (
      SELECT doc_id,
             array_to_string(
               t[1 + {_CHUNK_W} * i : {_CHUNK_W} + {_CHUNK_W} * i], ' '
             ) AS chunk
      FROM toks,
           unnest(range(0, CAST(ceil(len(t) / {_CHUNK_W}.0) AS BIGINT)))
               AS r(i)
    ),
    freq AS (
      SELECT chunk, count(DISTINCT doc_id) AS nd FROM ch GROUP BY chunk
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_boiler
    FROM ch JOIN freq USING (chunk)
    GROUP BY doc_id
    """,
)
def boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    ch = docs.select(
        "doc_id", F.split("text", " ").alias("t")
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(t) / {_CHUNK_W}.0) "
                f"AS INT) - 1), "
                f"i -> array_join(slice(t, i * {_CHUNK_W} + 1, {_CHUNK_W}), "
                f"' '))"
            )
        ).alias("chunk"),
    )
    freq = ch.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    return (
        ch.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("nd") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_boiler"),
        )
    )


# --------------------------------------------------------------------------
# Deterministic sharding for training-data writes
# --------------------------------------------------------------------------
_N_SHARDS = 8


@query(
    "corpus_shards",
    "layout: md5-deterministic shard assignment (8 shards) with per-shard "
    "doc/token totals — bit-reproducible on any cluster size",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 7))
                  AS BIGINT) % {_N_SHARDS} AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(doc_id) AS first_doc, max(doc_id) AS last_doc
    FROM d GROUP BY shard
    """,
)
def corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 7), 16, 10)
        .cast("bigint")
        % _N_SHARDS
    )
    return (
        docs.select(
            shard.alias("shard"),
            "doc_id",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# --------------------------------------------------------------------------
# CDC apply with tombstones (deletes) — latest change per key wins
# --------------------------------------------------------------------------
@query(
    "cdc_merge_tombstones",
    "CDC MERGE with deletes: upsert wave then tombstone wave; latest seq "
    "wins per key, 'D' removes the key (operators/merge.cdc_apply)",
    # The oracle re-derives the expected survivors independently of the
    # collapse mechanics: keys ≤1000 keep base rows; (1000,1400] get the
    # upsert values EXCEPT (1100,1300] which the later tombstone deletes
    # (deletes of keys absent from base are no-ops).
    oracle="""
    SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS c_acctbal
    FROM customer WHERE c_custkey <= 1000
    UNION ALL
    SELECT c_custkey, 'MOVED' AS c_mktsegment,
           CAST(c_acctbal AS DOUBLE) + 100.0 AS c_acctbal
    FROM customer
    WHERE c_custkey > 1000 AND c_custkey <= 1400
      AND NOT (c_custkey > 1100 AND c_custkey <= 1300)
    """,
)
def cdc_merge_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = fan_out(load_table(spark, sf_dir, "customer"))
    base = cust.filter(F.col("c_custkey") <= 1200).select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    upserts = cust.filter(
        (F.col("c_custkey") > 1000) & (F.col("c_custkey") <= 1400)
    ).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        (F.col("c_acctbal").cast("double") + F.lit(100.0)).alias("c_acctbal"),
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    tombstones = cust.filter(
        (F.col("c_custkey") > 1100) & (F.col("c_custkey") <= 1300)
    ).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit("D").alias("op"),
        F.lit(2).alias("seq"),
    )
    return cdc_apply(
        base, upserts.unionByName(tombstones), keys=["c_custkey"]
    )


# --------------------------------------------------------------------------
# OOV-bigram quality screen: fraction of a document's bigrams that
# occur NOWHERE else in the corpus (corpus-wide count == 1). High
# ratios flag machine-generated / garbled text without any float
# model: the score is integer ppm from exact counts. Two shuffles —
# bigram counts (∝ distinct bigrams, map-side combined) and the
# join-back + per-doc rollup (∝ doc bigrams, keyed back to doc_id).
# --------------------------------------------------------------------------
@query(
    "oov_bigram_screen",
    "LM screen: per-doc ratio (ppm) of corpus-unique bigrams — "
    "integer-exact statistical quality gate",
    oracle="""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT doc_id, t[i] AS w1, t[i+1] AS w2
      FROM toks, unnest(range(1, greatest(len(t), 1))) AS r(i)
    ),
    c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c
            FROM bg GROUP BY 1, 2)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bg,
           CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_uniq,
           CAST((sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000)
                // count(*) AS BIGINT) AS uniq_ppm
    FROM bg JOIN c12 USING (w1, w2)
    GROUP BY doc_id
    """,
)
def oov_bigram_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    t = F.split("text", " ")
    bg = (
        docs.select("doc_id", t.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> struct(element_at(t, i) AS w1, "
                    "element_at(t, i + 1) AS w2))"
                )
            ).alias("p"),
        )
        .select("doc_id", "p.w1", "p.w2")
    )
    c12 = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c"))
    n_uniq = F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
    return (
        bg.join(c12, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bg"),
            n_uniq.alias("n_uniq"),
            F.expr(
                "CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) "
                "* CAST(1000000 AS BIGINT) AS BIGINT) "
                "div count(*)"
            ).alias("uniq_ppm"),
        )
    )


# --------------------------------------------------------------------------
# Training-mixture weights: per-source sampling probability that
# rebalances the corpus toward a uniform token budget per source,
# capped at 1.0 (never upsample) — the epoch-mixing computation a
# training-data pipeline runs before writing shards. Pure integer
# arithmetic (token counts, ppm weights); the 1-row corpus total is a
# broadcast, never a driver round-trip.
# --------------------------------------------------------------------------
@query(
    "mixture_weights",
    "mixing: per-source ppm sampling weight toward a uniform token "
    "budget (integer-exact, capped at 1x)",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), tot AS (
      SELECT CAST(sum(n_tokens) AS BIGINT) AS total,
             CAST(count(*) AS BIGINT) AS n_src
      FROM s
    )
    SELECT source, n_docs, n_tokens,
           least(CAST(1000000 AS BIGINT),
                 ((total // n_src) * 1000000) // n_tokens) AS weight_ppm
    FROM s, tot
    """,
)
def mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("n_tokens"),
    )
    tot = s.agg(
        F.sum("n_tokens").alias("total"), F.count(F.lit(1)).alias("n_src")
    )
    return s.join(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.least(
            F.lit(1_000_000).cast("bigint"),
            F.expr("((total div n_src) * CAST(1000000 AS BIGINT)) div n_tokens"),
        ).alias("weight_ppm"),
    )


# --------------------------------------------------------------------------
# Cross-source leakage: the same 8-token PREFIX fingerprint appearing
# under MORE THAN ONE source — the curation check that catches
# mirrored / scraped-twice corpora before mixture weighting
# double-counts them (mirrors share openings even when trailing
# boilerplate differs; full-content md5 finds only byte-exact
# mirrors). Hash-aggregate on the fingerprint (shuffle ∝ distinct
# prefixes), never a text self-join.
# --------------------------------------------------------------------------
@query(
    "cross_source_leakage",
    "curation: 8-token prefix fingerprints appearing in >1 source "
    "(mirror detection)",
    oracle="""
    SELECT md5(array_to_string(string_split(lower(trim(text)), ' ')[1:8],
               ' ')) AS prefix_md5,
           CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(count(*) AS BIGINT) AS n_docs,
           min(doc_id) AS first_doc
    FROM documents
    GROUP BY prefix_md5
    HAVING count(DISTINCT source) > 1
    """,
)
def cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return (
        docs.select(
            F.md5(
                F.array_join(
                    F.slice(F.split(F.lower(F.trim(F.col("text"))), " "), 1, 8),
                    " ",
                )
            ).alias("prefix_md5"),
            "source",
            "doc_id",
        )
        .groupBy("prefix_md5")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_sources") > 1)
    )


# --------------------------------------------------------------------------
# Token-length histogram in log2 bins — the context-length planning
# view (how much of the corpus fits a 2^k-token window). Integer bin
# math; one scan, shuffle ∝ bins.
# --------------------------------------------------------------------------
@query(
    "token_length_histogram",
    "corpus stats: doc counts/token mass per log2 token-length bin",
    oracle="""
    WITH t AS (
      SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    )
    SELECT CAST(floor(log2(greatest(n_tok, 1))) AS BIGINT) AS len_bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(min(n_tok) AS BIGINT) AS min_tok,
           CAST(max(n_tok) AS BIGINT) AS max_tok
    FROM t GROUP BY len_bin
    """,
)
def token_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    n_tok = F.size(F.split("text", " ")).cast("bigint")
    binned = docs.select(
        n_tok.alias("n_tok"),
        F.floor(F.log2(F.greatest(n_tok, F.lit(1)))).cast("bigint").alias(
            "len_bin"
        ),
    )
    return binned.groupBy("len_bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.min("n_tok").alias("min_tok"),
        F.max("n_tok").alias("max_tok"),
    )


# --------------------------------------------------------------------------
# Contrastive training-pair generation (retrieval/embedding training):
# the standard inverse-cloze setup — the two halves of one document
# form the positive pair; negatives are md5-picked other documents
# (deterministic, layout-independent, collision-bumped past self).
# One scan + one broadcast of the corpus size; negatives are CHOSEN by
# hash, not sampled by RNG, so the pair set is bit-reproducible on any
# cluster — the property that makes training-data regeneration safe.
# --------------------------------------------------------------------------
@query(
    "contrastive_pairs",
    "training pairs: split-doc positives + 2 deterministic md5 "
    "negatives per anchor (inverse cloze, reproducible)",
    oracle="""
    WITH n AS (SELECT count(*) AS n_docs FROM documents),
    halves AS (
      SELECT doc_id,
             len(string_split(text, ' ')) AS n_tok,
             len(string_split(text, ' ')) // 2 AS n_first
      FROM documents WHERE doc_id < 100
    ),
    pairs AS (
      SELECT h.doc_id,
             CAST(h.n_first AS BIGINT) AS n_tok_anchor,
             CAST(h.n_tok - h.n_first AS BIGINT) AS n_tok_positive,
             CAST(concat('0x', substr(md5(concat('neg1:',
                  CAST(h.doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
               % n.n_docs AS r1,
             CAST(concat('0x', substr(md5(concat('neg2:',
                  CAST(h.doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
               % n.n_docs AS r2,
             n.n_docs
      FROM halves h CROSS JOIN n
    )
    SELECT doc_id, n_tok_anchor, n_tok_positive,
           CASE WHEN r1 = doc_id THEN (r1 + 1) % n_docs ELSE r1 END
             AS neg1_doc_id,
           CASE WHEN r2 = doc_id THEN (r2 + 1) % n_docs ELSE r2 END
             AS neg2_doc_id
    FROM pairs
    """,
)
def contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    n_docs_df = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    n_tok = F.size(F.split("text", " "))
    halves = docs.filter(F.col("doc_id") < 100).select(
        "doc_id",
        n_tok.alias("n_tok"),
        (n_tok / 2).cast("bigint").alias("n_first"),
    )

    def _rand(salt: str):
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(F.lit(salt), F.col("doc_id").cast("string"))
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint")
            % F.col("n_docs")
        )

    def _bump(r):
        return F.when(
            r == F.col("doc_id"), (r + 1) % F.col("n_docs")
        ).otherwise(r)

    return (
        halves.crossJoin(F.broadcast(n_docs_df))
        .select(
            "doc_id",
            F.col("n_first").alias("n_tok_anchor"),
            (F.col("n_tok") - F.col("n_first")).alias("n_tok_positive"),
            _bump(_rand("neg1:")).alias("neg1_doc_id"),
            _bump(_rand("neg2:")).alias("neg2_doc_id"),
        )
    )


# --------------------------------------------------------------------------
# BPE merge-rule training (operators/bpe.py): the tokenizer-TRAINING
# op — 6 unrolled most-frequent-pair merges over the corpus word-
# frequency table, replayed round-for-round by a generated DuckDB CTE
# chain (the INDEX BUILD is oracle-checked, as with kmeans_ivf_topk).
# --------------------------------------------------------------------------
_BPE_ROUNDS = 6
_BPE_WORDFREQ_SQL = """
    SELECT word AS w, CAST(count(*) AS BIGINT) AS wfreq
    FROM (SELECT unnest(string_split(text, ' ')) AS word
          FROM documents WHERE doc_id < 200)
    WHERE word <> '' GROUP BY 1
"""


@query(
    "bpe_merge_training",
    "tokenizer training: 6 BPE merge rounds (weighted pair counts, "
    "deterministic argmax, boundary-guarded merge) — training itself "
    "is cross-engine replayed",
    oracle=None,  # set below: generated CTE chain
)
def bpe_merge_training(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.bpe import bpe_train

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    word_freqs = (
        docs.filter(F.col("doc_id") < 200)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wfreq"))
    )
    return bpe_train(word_freqs, rounds=_BPE_ROUNDS)


def _install_bpe_oracle() -> None:
    from openaq_data_pipeline_engineering_spark.operators.bpe import (
        bpe_oracle_sql,
    )
    from openaq_data_pipeline_engineering_spark.plans.registry import QUERIES

    QUERIES["bpe_merge_training"].oracle = bpe_oracle_sql(
        _BPE_WORDFREQ_SQL, _BPE_ROUNDS
    )


_install_bpe_oracle()


# --------------------------------------------------------------------------
# BPE ENCODE (inference side of bpe_merge_training): apply the learned
# merges back to the vocabulary and measure the compression they buy —
# corpus symbol count before (characters) vs after the 6 merges,
# weighted by word frequency. The oracle replays training AND
# application in one CTE chain, so the full train->encode loop is
# cross-engine checked.
# --------------------------------------------------------------------------
def _bpe_encode_oracle() -> str:
    from openaq_data_pipeline_engineering_spark.operators.bpe import (
        bpe_oracle_sql,
    )

    train = bpe_oracle_sql(_BPE_WORDFREQ_SQL, _BPE_ROUNDS)
    # bpe_oracle_sql ends with the merge-table SELECT; wrap it so the
    # final state table s{rounds} is what we aggregate instead.
    head = train[: train.rindex("SELECT CAST(1 AS INT)")]
    return f"""{head}
    SELECT CAST(sum(wfreq * (length(w))) AS BIGINT) AS n_chars_weighted,
           CAST(sum(wfreq * len(string_split(trim(state), ' ')))
                AS BIGINT) AS n_syms_weighted,
           CAST(count(*) AS BIGINT) AS n_vocab
    FROM s{_BPE_ROUNDS}
    """


@query(
    "bpe_encode_compression",
    "tokenizer inference: learned merges applied back to the "
    "vocabulary — weighted symbol counts before/after (compression "
    "readout), train+encode both oracle-replayed",
    oracle=None,  # installed below (generated CTE chain)
)
def bpe_encode_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.bpe import (
        bpe_apply,
        bpe_train,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    word_freqs = (
        docs.filter(F.col("doc_id") < 200)
        .select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("wfreq"))
        # One corpus pass shared by the train AND encode sides (the
        # train side would otherwise materialize its own copy and the
        # encode side would re-scan the corpus).
        .localCheckpoint(eager=True)
    )
    merges = bpe_train(word_freqs, rounds=_BPE_ROUNDS, materialize=False)
    encoded = bpe_apply(word_freqs, merges, rounds=_BPE_ROUNDS)
    return encoded.agg(
        F.sum(F.col("wfreq") * F.length("w"))
        .cast("bigint")
        .alias("n_chars_weighted"),
        F.sum(F.col("wfreq") * F.col("n_syms"))
        .cast("bigint")
        .alias("n_syms_weighted"),
        F.count(F.lit(1)).cast("bigint").alias("n_vocab"),
    )


def _install_bpe_encode_oracle() -> None:
    from openaq_data_pipeline_engineering_spark.plans.registry import QUERIES

    QUERIES["bpe_encode_compression"].oracle = _bpe_encode_oracle()


_install_bpe_encode_oracle()


# --------------------------------------------------------------------------
# Deterministic data augmentation: token dropout keyed by
# md5(doc_id, position) — every augmented example is bit-reproducible
# on any cluster (re-generating the corpus yields the identical
# augmentation, the property RNG-based dropout lacks). Pure
# filter-on-hash inside a posexplode/re-agg; 10% drop rate.
# --------------------------------------------------------------------------
@query(
    "token_dropout_augmentation",
    "augmentation: hash-keyed 10% token dropout per doc — "
    "reproducible counts + surviving-token checksum",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(string_split(text, ' ')) AS tok,
             generate_subscripts(string_split(text, ' '), 1) AS pos
      FROM documents WHERE doc_id < 200
    ),
    kept AS (
      SELECT doc_id, tok, pos,
             CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),
                  ':', CAST(pos AS VARCHAR))), 1, 8)) AS BIGINT) % 10 <> 0
               AS keep
      FROM toks WHERE tok <> ''
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN keep THEN length(tok) ELSE 0 END) AS BIGINT)
             AS kept_chars
    FROM kept GROUP BY doc_id
    """,
)
def token_dropout_augmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    toks = (
        docs.filter(F.col("doc_id") < 200)
        .select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "tok")
        )
        .filter(F.col("tok") != "")
        .withColumn("pos", F.col("pos0") + 1)
    )
    keep = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit(":"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 10
        != 0
    )
    return (
        toks.withColumn("keep", keep)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("keep"), F.length("tok")).otherwise(0))
            .cast("bigint")
            .alias("kept_chars"),
        )
    )


# --------------------------------------------------------------------------
# Training-mixture drift monitor: L1 distance (in ppm) between the
# corpus's realized source shares and the uniform target — the alarm a
# data pipeline raises when one source starts dominating ingestion.
# Integer ppm arithmetic end-to-end (KL would need logs; L1 drift is
# the standard integer-safe monitor and bounds total variation).
# --------------------------------------------------------------------------
@query(
    "mixture_drift_l1",
    "monitoring: per-source token-share drift vs uniform target (ppm) "
    "+ total L1 / total-variation distance",
    oracle="""
    WITH m AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS toks
      FROM documents GROUP BY source
    ),
    t AS (
      SELECT source, toks,
             sum(toks) OVER () AS total,
             count(*) OVER () AS n_sources
      FROM m
    )
    SELECT source,
           CAST(1000000 * toks // total AS BIGINT) AS share_ppm,
           CAST(1000000 // n_sources AS BIGINT) AS target_ppm,
           CAST(abs(1000000 * toks // total - 1000000 // n_sources)
                AS BIGINT) AS drift_ppm
    FROM t
    """,
)
def mixture_drift_l1(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    m = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("toks")
    )
    w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    t = m.withColumn("total", F.sum("toks").over(w)).withColumn(
        "n_sources", F.count(F.lit(1)).over(w)
    )
    share = F.expr("(1000000 * toks) div total")
    target = F.expr("1000000 div n_sources")
    return t.select(
        "source",
        share.cast("bigint").alias("share_ppm"),
        target.cast("bigint").alias("target_ppm"),
        F.abs(share - target).cast("bigint").alias("drift_ppm"),
    )
