"""Round-5 declared queries.

Leads with the oracle witness for the LAST pytest-only behavioral
surface (round-4 verdict item 3): the ``applyInPandasWithState``
gap-sessionizer (streaming/stateful.py:69), previously exercised only
by tests/test_streaming_stateful.py.

Registered LAST in registry._load_all so these names sort after the
existing never-driver-sampled backlog in the driver's ~50-query
prefix (the rotation drains oldest-unverified first).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.scratch import fresh_scratch_dir
from openaq_data_pipeline_engineering_spark.sources.star import load_table


# --------------------------------------------------------------------------
# DECLARED witness for the custom-stateful streaming sessionizer
# (applyInPandasWithState, event-time timeouts). Construction makes the
# stream's closed-session output EQUAL the batch gaps-and-islands
# sessionization, so the oracle is exact:
#
# - the events subset is split into 3 files by TIME TERCILE (not by id):
#   each key's events arrive across micro-batches in nondecreasing
#   event-time order, so no batch ever carries data older than the
#   watermark and the in-batch/in-state session walk sees the same
#   sequence the batch window sort does;
# - maxFilesPerTrigger=1 + per-file mtimes force 5 ordered micro-batches
#   (3 slices + 2 sentinel files), so sessions genuinely carry state
#   across batches — a state reset would split every cross-slice session
#   and break the value hash;
# - a far-future '__flush__' sentinel key advances the GLOBAL watermark
#   past every real key's last_event + gap, so the event-time timeouts
#   fire in the final batch and every still-open session is emitted
#   (availableNow alone would end the query with open sessions stuck in
#   state). The sentinel's own session is filtered out.
#
# Scale: state is O(keys-in-watermark); each emitted row is one closed
# session. The memory sink bounds driver memory by the user_id%3 subset.
# --------------------------------------------------------------------------
@query(
    "streaming_sessionization",
    "streaming: applyInPandasWithState 30min-gap sessionizer across 5 "
    "forced micro-batches + watermark-timeout flush == batch "
    "gaps-and-islands sessions",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, ts FROM events WHERE user_id % 3 = 0
    ), flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               CAST(sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, new_s DESC
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
           CAST(epoch_us(max(ts)) AS BIGINT) AS end_us
    FROM sess GROUP BY user_id, session_idx
    """,
)
def streaming_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        scoped_shuffle_partitions,
    )
    from openaq_data_pipeline_engineering_spark.streaming.stateful import (
        sessionizer_stateful,
    )

    apply_runtime_confs(spark)
    gap_s = 1800
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 3 == 0)
        .select(
            F.col("user_id").cast("string").alias("skey"),
            "ts",
            F.unix_micros("ts").alias("us"),
        )
    )
    t1, t2, max_us = ev.agg(
        F.expr("CAST(percentile(us, 1.0/3) AS BIGINT)"),
        F.expr("CAST(percentile(us, 2.0/3) AS BIGINT)"),
        F.max("us"),
    ).first()

    drop = fresh_scratch_dir("sessionize_drop")
    # One scan+write for the 3 tercile slices (was: 3 filtered
    # re-scans), mtime-pinned in slice order so each key's events still
    # arrive across micro-batches in nondecreasing event-time order.
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        slice_mtime,
        write_slice_files,
    )

    write_slice_files(
        ev.withColumn(
            "slice",
            F.when(F.col("us") <= t1, 0)
            .when(F.col("us") <= t2, 1)
            .otherwise(2),
        ).select("skey", "ts", "slice"),
        "slice",
        drop,
        pin_order=True,
    )
    # Two sentinel batches: the first advances the watermark past every
    # real last_event + gap (so timers become eligible); the second
    # gives the engine a batch in which to FIRE them. 1-row files —
    # written driver-side (pyarrow, UTC-instant micros), no Spark jobs.
    import pyarrow as pa
    import pyarrow.parquet as pa_pq

    margin_us = (gap_s + 7200) * 1_000_000
    for j, s_us in enumerate(
        (max_us + margin_us, max_us + margin_us + 600_000_000)
    ):
        sdir = os.path.join(drop, f"sentinel_{j}")
        os.makedirs(sdir, exist_ok=True)
        fp = os.path.join(sdir, "part-00000.parquet")
        pa_pq.write_table(
            pa.table(
                {
                    "skey": pa.array(["__flush__"], pa.string()),
                    "ts": pa.array([int(s_us)], pa.timestamp("us", tz="UTC")),
                }
            ),
            fp,
        )
        t = slice_mtime(3 + j)  # after the 3 tercile slices
        os.utime(fp, (t, t))

    stream = (
        spark.readStream.format("parquet")
        .schema("skey string, ts timestamp")
        .option("recursiveFileLookup", True)
        .option("maxFilesPerTrigger", 1)
        .load(drop)
    )
    sessions = sessionizer_stateful(
        stream, key_col="skey", ts_col="ts", gap_seconds=gap_s,
        watermark="10 minutes",
    )
    checkpoint = fresh_scratch_dir("sessionize_ckpt")
    # Measured EXCEPTION to bounded_state_partitions (r13): this
    # witness replays ~6 forced micro-batches through a pandas-stateful
    # sessionizer; its cost is batch count x per-batch pandas exec, not
    # state-store count, and byte-sized 2 partitions measured 8.2-9.2 s
    # vs 6.4-7.3 s at 8 (A/B both orders) — fewer partitions serialize
    # the per-batch Arrow round trips. Keep 8.
    with scoped_shuffle_partitions(spark, 8):
        q = (
            sessions.writeStream.format("memory")
            .queryName("streaming_sessions_result")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(
        "SELECT CAST(key AS BIGINT) AS user_id, n_events, start_us, end_us "
        "FROM streaming_sessions_result WHERE key <> '__flush__'"
    )


# --------------------------------------------------------------------------
# Spark-native BATCH session windows (F.session_window in groupBy) — the
# built-in the manual gaps-and-islands sessionization family composes by
# hand. Semantics pinned by the oracle AND by
# TestSessionWindowBatch's planted boundary case: sessions MERGE when
# the next event is at-or-before last + gap (an event at EXACTLY
# last + gap joins the session — verified empirically; a naive
# "window end exclusive" reading would split it), and the reported
# window is [min ts, max ts + gap]. So the boundary test is `> gap`,
# matching the lag-based `sessionization` query, and the windows add
# the +gap end.
# Scale: one key+window shuffle; state never materializes pairs.
# --------------------------------------------------------------------------
@query(
    "session_window_batch",
    "built-in F.session_window batch aggregate == gaps-and-islands "
    "(merge at exactly last+gap) with window end = last + gap",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                            > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               CAST(sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, new_s DESC
                   ROWS UNBOUNDED PRECEDING
               ) AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
           CAST(epoch_us(max(ts)) + 1800000000 AS BIGINT) AS end_us
    FROM sess GROUP BY user_id, session_idx
    """,
)
def session_window_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.sources.star import fan_out

    ev = fan_out(load_table(spark, sf_dir, "events"))
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            "n_events",
            F.unix_micros("session_window.start").alias("start_us"),
            F.unix_micros("session_window.end").alias("end_us"),
        )
    )


# --------------------------------------------------------------------------
# DSIR importance weights (Xie et al. 2023, "Data Selection for Language
# Models via Importance Resampling"): hashed-unigram bag-of-words LMs
# for a TARGET distribution (here: source 'src0') and the RAW pool
# (everything else); each raw doc scores sum of per-token
# log p_target(bucket) - log p_raw(bucket). The standard
# pretraining-data selection op when you want raw web data reweighted
# toward a trusted target domain.
# Scale: tokens map to 256 hashed buckets (fixed-size LM state →
# broadcast join); per-doc score is one map-combined sum. Floats are
# log-ratio sums rounded to 6 (registry fold policy).
# --------------------------------------------------------------------------
_DSIR_BUCKET_SPARK = (
    lambda col: F.pmod(
        F.conv(F.substring(F.md5(col), 1, 4), 16, 10).cast("int"), F.lit(256)
    )
)
_DSIR_BUCKET_SQL = "CAST(concat('0x', substr(md5(w), 1, 4)) AS INTEGER) % 256"


@query(
    "dsir_importance_weights",
    "LLM data selection: DSIR hashed-unigram log-importance weights of "
    "raw docs against the src0 target distribution, top-20",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), b AS (
        SELECT doc_id, source, {_DSIR_BUCKET_SQL} AS bkt FROM tok
    ), lm AS (
        SELECT bkt,
               sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS c_t,
               sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END) AS c_r
        FROM b GROUP BY bkt
    ), z AS (
        SELECT sum(c_t) AS z_t, sum(c_r) AS z_r FROM lm
    ), scored AS (
        SELECT b.doc_id,
               CAST(count(*) AS BIGINT) AS n_tok,
               sum(ln((lm.c_t + 1.0) / (z.z_t + 256.0))
                   - ln((lm.c_r + 1.0) / (z.z_r + 256.0))) AS s
        FROM b JOIN lm USING (bkt) CROSS JOIN z
        WHERE b.source <> 'src0'
        GROUP BY b.doc_id
    )
    SELECT doc_id, n_tok, round(s, 6) AS log_weight
    FROM scored ORDER BY round(s, 6) DESC, doc_id LIMIT 20
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.sources.star import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    ).select("doc_id", "source", _DSIR_BUCKET_SPARK(F.col("w")).alias("bkt"))
    lm = tok.groupBy("bkt").agg(
        F.sum(F.when(F.col("source") == "src0", 1).otherwise(0)).alias("c_t"),
        F.sum(F.when(F.col("source") != "src0", 1).otherwise(0)).alias("c_r"),
    ).localCheckpoint(eager=True)  # 256 rows; feeds totals AND rates
    z = lm.agg(
        F.sum("c_t").alias("z_t"), F.sum("c_r").alias("z_r")
    )
    # 256-row LM × 1-row totals: broadcast both; the token stream joins
    # on bkt map-side and collapses per doc with a map-combined sum.
    rate = F.log((F.col("c_t") + 1.0) / (F.col("z_t") + 256.0)) - F.log(
        (F.col("c_r") + 1.0) / (F.col("z_r") + 256.0)
    )
    lm_rates = F.broadcast(lm.crossJoin(F.broadcast(z)).select("bkt", rate.alias("r")))
    scored = (
        tok.filter(F.col("source") != "src0")
        .join(lm_rates, "bkt")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tok"), F.sum("r").alias("s"))
    )
    # LIMIT boundary uses the ROUNDED value (plus doc_id) on both
    # engines: ordering by the raw float sum would make membership at
    # the cut ULP-sensitive to partition fold order (round-5 advice).
    return (
        scored.select(
            "doc_id", "n_tok", F.round("s", 6).alias("log_weight")
        )
        .orderBy(F.desc("log_weight"), "doc_id")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Per-document unigram-LM perplexity scoring — the classic CCNet-style
# quality filter: train unigram counts on the whole corpus, score each
# doc's average negative log-likelihood; atypical (high-perplexity)
# docs surface for pruning. In-corpus words all have c(w) >= 1, so no
# smoothing term: avg_nll = (n·ln T - Σ ln c(w)) / n.
# Scale: the LM is the word-count table (co-partitioned join on w);
# per-doc score is one map-combined sum. Distinct from
# bigram_lm_topnext (next-token ranking), which shares no scoring path.
# --------------------------------------------------------------------------
@query(
    "doc_perplexity_filter",
    "quality filter: per-doc unigram avg negative log-likelihood, "
    "top-15 most atypical docs",
    oracle="""
    WITH tok AS (
        SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
        FROM documents
    ), lm AS (
        SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w
    ), t AS (
        SELECT sum(c) AS total FROM lm
    ), scored AS (
        SELECT tok.doc_id,
               any_value(tok.source) AS source,
               CAST(count(*) AS BIGINT) AS n_tok,
               (count(*) * ln(t.total) - sum(ln(lm.c))) / count(*) AS nll
        FROM tok JOIN lm USING (w) CROSS JOIN t
        GROUP BY tok.doc_id, t.total
    )
    SELECT doc_id, source, n_tok, round(nll, 6) AS avg_nll
    FROM scored ORDER BY round(nll, 6) DESC, doc_id LIMIT 15
    """,
)
def doc_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.sources.star import fan_out

    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", "source", F.explode(F.split("text", " ")).alias("w")
    )
    # Vocab-sized LM table, reused by the totals agg and the scoring
    # join; materialized once (the classic train-then-score two-pass).
    lm = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c")).localCheckpoint(
        eager=True
    )
    total = lm.agg(F.sum("c").alias("total"))
    # The LM is vocab-sized (sublinear in the corpus — Heaps' law), and
    # the checkpointed relation has no size stats, so the planner would
    # default the scoring join to SortMergeJoin and shuffle the ENTIRE
    # token stream by w. Broadcasting the LM (the CCNet design: the
    # unigram model lives in memory on every worker) makes scoring one
    # map-side pass: scan → explode → broadcast hash join → per-doc
    # partial agg; only ≤|docs| partial rows reach the exchange.
    scored = (
        tok.join(F.broadcast(lm), "w")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.any_value("source").alias("source"),
            F.count(F.lit(1)).alias("n_tok"),
            (
                (
                    F.count(F.lit(1)) * F.log(F.any_value("total"))
                    - F.sum(F.log("c"))
                )
                / F.count(F.lit(1))
            ).alias("nll"),
        )
    )
    # Rounded-value ordering at the LIMIT boundary (see
    # dsir_importance_weights).
    return (
        scored.select(
            "doc_id", "source", "n_tok", F.round("nll", 6).alias("avg_nll")
        )
        .orderBy(F.desc("avg_nll"), "doc_id")
        .limit(15)
    )


# --------------------------------------------------------------------------
# SemDeDup-style semantic prune (Abbas et al. 2023): embeddings bucket
# by the deterministic sign-projection LSH, and within each bucket a
# vector is PRUNED when a lower-id vector with cosine >= 0.95 exists
# (greedy canonical-survivor rule — the scalable simplification of
# keep-one-per-cluster). Complements embedding_neardup_pairs (which
# lists pairs): this one materializes the keep/prune decision.
# Scale: pairwise cosine only within LSH buckets, never all-pairs; the
# prune rule is an EXISTS semi-join, so no pair list is retained.
# SIZING RULE (executable since round 6): the projection width comes
# from functions.vectors.auto_bits(count, target_occupancy=32) — the
# all-integer log2(N) rule from the round-5 x32 probe — so expected
# bucket occupancy stays ~constant as the corpus grows instead of the
# within-bucket quadratic blow-up of a fixed width. The oracle derives
# the SAME width from count(*) via auto_bits_sql (exact integer
# comparisons, never float-boundary-divergent).
# --------------------------------------------------------------------------
def _bits16_sql(alias: str) -> str:
    """Widest (16-bit) sign-projection bit string for ``alias``; the
    bucket is its auto_bits-length prefix — identical to lsh_bucket's
    bit order (bit i: v[i] >= v[i+32])."""
    return " || ".join(
        f"CASE WHEN {alias}.embedding[{i + 1}]::DOUBLE >= "
        f"{alias}.embedding[{i + 33}]::DOUBLE THEN '1' ELSE '0' END"
        for i in range(16)
    )


def _auto_bits_sql_embeddings() -> str:
    from openaq_data_pipeline_engineering_spark.functions.vectors import (
        auto_bits_sql,
    )

    return auto_bits_sql("(SELECT count(*) FROM embeddings)")


@query(
    "semdedup_prune",
    "embedding dedup: per-LSH-bucket greedy semantic prune "
    "(cos >= 0.95 to a lower id) — kept/pruned counts per bucket, "
    "auto-sized projection width",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding,
               substr({_bits16_sql('embeddings')},
                      1, {_auto_bits_sql_embeddings()}) AS bucket
        FROM embeddings
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_vectors,
           CAST(sum(CASE WHEN EXISTS (
               SELECT 1 FROM bucketed b
               WHERE b.bucket = a.bucket AND b.vec_id < a.vec_id
                 AND list_dot_product(a.embedding::DOUBLE[],
                                      b.embedding::DOUBLE[]) /
                     (sqrt(list_dot_product(a.embedding::DOUBLE[],
                                            a.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(b.embedding::DOUBLE[],
                                            b.embedding::DOUBLE[])))
                     >= 0.95
           ) THEN 1 ELSE 0 END) AS BIGINT) AS n_pruned
    FROM bucketed a GROUP BY bucket
    """,
)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.functions.vectors import (
        auto_bits,
        cosine,
        lsh_bucket,
    )
    from openaq_data_pipeline_engineering_spark.sources.star import fan_out

    base = load_table(spark, sf_dir, "embeddings")
    # Metadata-cheap count sizes the projection; occupancy stays
    # ~target (32) at any corpus size.
    n_bits = auto_bits(base.count())
    emb = fan_out(base)
    bucketed = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket("embedding", n_bits, 32).alias("bucket"),
        # The bucketed index feeds both self-join sides; materialized
        # once (in production this frame IS the persisted LSH index).
    ).localCheckpoint(eager=True)
    lower = bucketed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("bucket").alias("bucket_b"),
    )
    pruned_ids = (
        bucketed.join(
            lower,
            (F.col("bucket") == F.col("bucket_b"))
            & (F.col("vec_b") < F.col("vec_id")),
        )
        .filter(cosine("embedding", "emb_b") >= 0.95)
        .select("vec_id")
        .distinct()
    )
    flagged = bucketed.join(
        pruned_ids.withColumn("is_pruned", F.lit(1)), "vec_id", "left"
    )
    return flagged.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum(F.coalesce("is_pruned", F.lit(0))).cast("bigint").alias("n_pruned"),
    )


# --------------------------------------------------------------------------
# Population Stability Index between the month's two halves — the
# standard production drift monitor for a continuous feature (here:
# event value, 25-unit bins). Add-1 smoothing on bin counts keeps
# ln() defined on bins observed in only one half. Per-type PSI is a
# sum of log-ratio terms → round(6) (registry fold policy).
# Scale: one map-combined (type, half, bin) count agg; everything
# after is a ~20-row-per-type frame.
# --------------------------------------------------------------------------
@query(
    "psi_value_drift",
    "monitoring: Population Stability Index of the value distribution, "
    "first vs second half of month, per event type",
    oracle="""
    WITH binned AS (
        SELECT event_type,
               CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                    THEN 1 ELSE 2 END AS half,
               CAST(floor(value / 25) AS BIGINT) AS bin
        FROM events
    ), c AS (
        SELECT event_type, bin,
               sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS c2
        FROM binned GROUP BY 1, 2
    ), t AS (
        SELECT event_type, sum(c1) AS t1, sum(c2) AS t2,
               count(*) AS nbins
        FROM c GROUP BY 1
    )
    SELECT c.event_type,
           CAST(min(t.nbins) AS BIGINT) AS n_bins,
           round(sum(
               ((c.c2 + 1.0) / (t.t2 + t.nbins)
                - (c.c1 + 1.0) / (t.t1 + t.nbins))
               * ln(((c.c2 + 1.0) / (t.t2 + t.nbins))
                    / ((c.c1 + 1.0) / (t.t1 + t.nbins)))
           ), 6) AS psi
    FROM c JOIN t USING (event_type)
    GROUP BY c.event_type
    """,
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.sources.star import fan_out

    ev = fan_out(load_table(spark, sf_dir, "events"))
    binned = ev.select(
        "event_type",
        F.when(
            F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), 1
        )
        .otherwise(2)
        .alias("half"),
        F.floor(F.col("value") / 25).cast("bigint").alias("bin"),
    )
    c = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).alias("c2"),
    )
    t = c.groupBy("event_type").agg(
        F.sum("c1").alias("t1"),
        F.sum("c2").alias("t2"),
        F.count(F.lit(1)).alias("nbins"),
    )
    p1 = (F.col("c1") + 1.0) / (F.col("t1") + F.col("nbins"))
    p2 = (F.col("c2") + 1.0) / (F.col("t2") + F.col("nbins"))
    return (
        c.join(F.broadcast(t), "event_type")
        .groupBy("event_type")
        .agg(
            F.min("nbins").cast("bigint").alias("n_bins"),
            F.round(F.sum((p2 - p1) * F.log(p2 / p1)), 6).alias("psi"),
        )
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov–Smirnov statistic over the same split — the
# nonparametric companion to PSI (no binning assumptions beyond the
# shared grid; here the exact distinct-cent value grid). ALL-INTEGER:
# the max |CDF1 - CDF2| is computed as max |cum1*t2 - cum2*t1| and
# reported in parts-per-million by integer division — bit-exact
# cross-engine, no float CDFs. The cross products run in DECIMAL(29,0)
# (inputs cast to DECIMAL(14,0)), matching DuckDB's HUGEINT promotion
# of sum(): exact up to 1e14 rows per half per type, where int64 would
# silently wrap past t1*t2 > 2^63 (~3e9 rows per half).
# Scale: one count agg on (type, cent value) + one window cumsum over
# the per-type distinct-value frame (≪ rows).
# --------------------------------------------------------------------------
@query(
    "ks_value_drift",
    "monitoring: exact-integer two-sample KS statistic (ppm) of the "
    "value distribution, first vs second half of month, per event type",
    oracle="""
    WITH binned AS (
        SELECT event_type,
               CASE WHEN CAST(ts AS DATE) < DATE '2024-01-16'
                    THEN 1 ELSE 2 END AS half,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ), c AS (
        SELECT event_type, cents,
               sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN half = 2 THEN 1 ELSE 0 END) AS c2
        FROM binned GROUP BY 1, 2
    ), w AS (
        SELECT event_type, cents,
               sum(c1) OVER (PARTITION BY event_type ORDER BY cents
                             ROWS UNBOUNDED PRECEDING) AS cum1,
               sum(c2) OVER (PARTITION BY event_type ORDER BY cents
                             ROWS UNBOUNDED PRECEDING) AS cum2,
               sum(c1) OVER (PARTITION BY event_type) AS t1,
               sum(c2) OVER (PARTITION BY event_type) AS t2
        FROM c
    )
    SELECT event_type,
           CAST(min(t1) AS BIGINT) AS n_first,
           CAST(min(t2) AS BIGINT) AS n_second,
           CAST(max(abs(cum1 * t2 - cum2 * t1)) * 1000000
                // (min(t1) * min(t2)) AS BIGINT) AS ks_ppm
    FROM w GROUP BY event_type
    """,
)
def ks_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from openaq_data_pipeline_engineering_spark.sources.star import fan_out

    ev = fan_out(load_table(spark, sf_dir, "events"))
    binned = ev.select(
        "event_type",
        F.when(
            F.col("ts").cast("date") < F.lit("2024-01-16").cast("date"), 1
        )
        .otherwise(2)
        .alias("half"),
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    c = binned.groupBy("event_type", "cents").agg(
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("half") == 2, 1).otherwise(0)).alias("c2"),
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    # DECIMAL(14,0) inputs → DECIMAL(29,0) cross products: exact (no
    # int64 wrap) for up to 1e14 rows per half, like the oracle's
    # HUGEINT-promoted sums.
    dec = "decimal(14,0)"
    w = c.select(
        "event_type",
        F.sum("c1").over(w_cum).cast(dec).alias("cum1"),
        F.sum("c2").over(w_cum).cast(dec).alias("cum2"),
        F.sum("c1").over(w_all).cast(dec).alias("t1"),
        F.sum("c2").over(w_all).cast(dec).alias("t2"),
    )
    agg = w.groupBy("event_type").agg(
        F.min("t1").cast("bigint").alias("n_first"),
        F.min("t2").cast("bigint").alias("n_second"),
        F.max(
            F.abs(F.col("cum1") * F.col("t2") - F.col("cum2") * F.col("t1"))
        ).alias("max_diff"),
    )
    # Integral division (`div`) on decimals: exact — a double
    # round-trip would lose bits once max_diff*1e6 exceeds 2^53.
    # Operand precisions stay under 38: DECIMAL(29,0) * DECIMAL(7,0)
    # → DECIMAL(37,0); the denominator is DECIMAL(29,0).
    return agg.select(
        "event_type",
        "n_first",
        "n_second",
        F.expr(
            "CAST((max_diff * CAST(1000000 AS DECIMAL(7,0))) div "
            "(CAST(n_first AS DECIMAL(14,0)) * "
            "CAST(n_second AS DECIMAL(14,0))) AS BIGINT)"
        ).alias("ks_ppm"),
    )


# --------------------------------------------------------------------------
# ORC sink + source roundtrip — the third columnar format next to
# Parquet (native) and CSV (queries_round4.csv_source_roundtrip):
# write events through Spark's built-in ORC writer (zlib, dictionary
# encoding), read the directory back cold, aggregate; the oracle
# aggregates the original parquet. Timestamps survive natively (ORC
# stores micros); doubles are snapped to the DECIMAL(18,2) grid for
# the hash like every money sum.
# --------------------------------------------------------------------------
@query(
    "orc_source_roundtrip",
    "sink/source: ORC write → cold read-back → per-type aggregate "
    "equals the source-table aggregate",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           min(ts) AS first_ts, max(ts) AS last_ts
    FROM events GROUP BY event_type
    """,
)
def orc_source_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = fresh_scratch_dir("orc_roundtrip")
    (
        ev.select("event_id", "ts", "user_id", "event_type", "value")
        .coalesce(4)
        .write.mode("overwrite")
        .orc(out)
    )
    back = spark.read.orc(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
