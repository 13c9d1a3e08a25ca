"""Declared queries: multimodal plumbing, SimHash, embedding near-dup,
nested-record flattening, and incremental (streaming) ingest.

Completes the LLM-data-pipeline operator checklist: exact dedup +
MinHash-LSH + n-gram Jaccard live in queries_text.py; SimHash and
embedding-cosine near-dup are here.
"""

from __future__ import annotations

from openaq_data_pipeline_engineering_spark.scratch import fresh_scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.functions.vectors import cosine, lsh_bucket
from openaq_data_pipeline_engineering_spark.operators.multimodal import (
    decode_metadata,
    with_binary_payload,
)
from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import fan_out, load_table


# --------------------------------------------------------------------------
# Multimodal: binary payload → mapInPandas metadata decode (stubbed decoder,
# REAL Spark plumbing; deterministic fake → SQL-oracle-checkable)
# --------------------------------------------------------------------------
@query(
    "multimodal_decode_meta",
    "multimodal: binary column → Arrow-batched mapInPandas metadata extraction",
    oracle="""
    SELECT doc_id,
           strlen(text) AS n_bytes,
           CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
           CAST((strlen(text) * 7) % 480 + 1 AS INTEGER) AS height,
           CASE strlen(text) % 3
             WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp'
           END AS format
    FROM documents
    """,
)
def multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return decode_metadata(with_binary_payload(docs, "text"))


# --------------------------------------------------------------------------
# SimHash document fingerprint (16-bit, token-weighted)
# --------------------------------------------------------------------------
_HI_NIBBLES = "('8','9','a','b','c','d','e','f')"


def _simhash_oracle() -> str:
    bits = ",\n               ".join(
        f"sum(CASE WHEN substr(md5(w), {j}, 1) IN {_HI_NIBBLES} "
        f"THEN 1 ELSE -1 END) AS b{j}"
        for j in range(1, 17)
    )
    concat = ", ".join(
        f"CASE WHEN b{j} >= 0 THEN '1' ELSE '0' END" for j in range(1, 17)
    )
    return f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ), bits AS (
        SELECT doc_id,
               {bits}
        FROM tok GROUP BY doc_id
    )
    SELECT doc_id, concat({concat}) AS simhash FROM bits
    """


@query(
    "simhash_fingerprint",
    "near-dup: 16-bit token-weighted SimHash fingerprint (md5 nibble bits)",
    oracle=_simhash_oracle(),
)
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    tok = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w")
    ).select("doc_id", F.md5("w").alias("hw"))
    hi = list("89abcdef")
    bit_aggs = [
        F.sum(
            F.when(F.substring("hw", j, 1).isin(hi), 1).otherwise(-1)
        ).alias(f"b{j}")
        for j in range(1, 17)
    ]
    bits = tok.groupBy("doc_id").agg(*bit_aggs)
    concat = F.concat(
        *[F.when(F.col(f"b{j}") >= 0, "1").otherwise("0") for j in range(1, 17)]
    )
    return bits.select("doc_id", concat.alias("simhash"))


# --------------------------------------------------------------------------
# Embedding-cosine near-duplicate pairs, LSH-bucket prefiltered (scale path)
# --------------------------------------------------------------------------
def _bucket_sql(alias: str) -> str:
    """Auto-width sign-projection bucket for ``alias``: the
    auto_bits-length prefix of the widest (16-bit) bit string, with the
    width derived from count(*) by the same exact-integer rule the
    Spark side uses (functions.vectors.auto_bits) — constant expected
    occupancy at any corpus size."""
    from openaq_data_pipeline_engineering_spark.functions.vectors import (
        auto_bits_sql,
    )

    bits = " || ".join(
        f"CASE WHEN {alias}.embedding[{i + 1}]::DOUBLE >= {alias}.embedding[{i + 33}]::DOUBLE "
        f"THEN '1' ELSE '0' END"
        for i in range(16)
    )
    nb = auto_bits_sql("(SELECT count(*) FROM embeddings)")
    return f"substr({bits}, 1, {nb})"


_COS_SQL = (
    "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
    "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
    "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
)


@query(
    "embedding_neardup_pairs",
    "near-dup: cosine ≥ 0.9 pairs within deterministic LSH buckets",
    oracle=f"""
    WITH bucketed AS (
        SELECT vec_id, embedding, {_bucket_sql('embeddings')} AS bucket
        FROM embeddings
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round({_COS_SQL}, 6) AS cosine
    FROM bucketed a JOIN bucketed b
      ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.9
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.functions.vectors import (
        auto_bits,
    )

    base = load_table(spark, sf_dir, "embeddings")
    n_bits = auto_bits(base.count())  # occupancy-constant projection
    emb = fan_out(base)
    bucketed = emb.select(
        "vec_id",
        "embedding",
        lsh_bucket("embedding", n_bits, 32).alias("bucket"),
    )
    b = bucketed.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("emb_b"),
        F.col("bucket").alias("bucket_b"),
    )
    cos = cosine("embedding", "emb_b")
    return (
        bucketed.join(
            b,
            (F.col("bucket") == F.col("bucket_b")) & (F.col("vec_id") < F.col("vec_b")),
        )
        .filter(cos >= 0.9)
        .select(
            F.col("vec_id").alias("vec_a"),
            "vec_b",
            F.round(cos, 6).alias("cosine"),
        )
    )


# --------------------------------------------------------------------------
# Nested-record flatten (F7 dot-path projection, reference extract_api.py:240-254)
# --------------------------------------------------------------------------
@query(
    "nested_flatten",
    "F7: build nested struct records, flatten via dot-path projection",
    oracle="""
    WITH nested AS (
        SELECT struct_pack(
                   id := c_custkey,
                   name := c_name,
                   geo := struct_pack(nationkey := c_nationkey,
                                      balance := c_acctbal)
               ) AS rec
        FROM customer
    )
    SELECT rec.id AS id, rec.name AS name,
           rec.geo.nationkey AS nationkey, rec.geo.balance AS balance
    FROM nested
    """,
)
def nested_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nested = cust.select(
        F.struct(
            F.col("c_custkey").alias("id"),
            F.col("c_name").alias("name"),
            F.struct(
                F.col("c_nationkey").alias("nationkey"),
                F.col("c_acctbal").alias("balance"),
            ).alias("geo"),
        ).alias("rec")
    )
    return nested.select(
        F.col("rec.id").alias("id"),
        F.col("rec.name").alias("name"),
        F.col("rec.geo.nationkey").alias("nationkey"),
        F.col("rec.geo.balance").alias("balance"),
    )


# --------------------------------------------------------------------------
# Incremental ingest (Structured Streaming, availableNow). The FINAL
# table (post dedup-in-watermark counts, complete mode) IS batch-
# expressible: availableNow drains every file, so the result equals
# dedup-by-(user_id, ts) + count per event_type over the same parquet.
# The oracle replays that with a grouped min(event_type) survivor —
# exact because no (user_id, ts) key carries two event types in this
# data (asserted by tests/test_streaming.py); with ambiguous keys the
# streaming survivor would be arrival-order-dependent and this would
# revert to rows-only.
# --------------------------------------------------------------------------
@query(
    "streaming_incremental_ingest",
    "streaming: file-source readStream + watermarked dedup + availableNow catch-up",
    oracle="""
    WITH dedup AS (
        SELECT user_id, ts, min(event_type) AS event_type
        FROM events GROUP BY user_id, ts
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM dedup GROUP BY event_type
    """,
)
def streaming_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        StreamingQueryStarter,
        bounded_state_partitions,
        events_stream_spec,
        incremental_ingest,
        scoped_shuffle_partitions,
    )

    apply_runtime_confs(spark)
    # Schema mirrors the parquet footer's own ts type (micros timestamp
    # or nanos-as-long); transform normalizes to TimestampType.
    schema, to_event_time = events_stream_spec(spark, sf_dir)

    checkpoint = fresh_scratch_dir("stream_ckpt")
    deduped, starter = incremental_ingest(
        spark,
        source_dir=sf_dir,
        checkpoint_dir=checkpoint,
        schema=schema,
        keys=["user_id", "ts"],
        ts_col="ts",
        transform=to_event_time,
        source_format="parquet",
        watermark="2 hours",
        path_glob="events.parquet",
    )
    # Aggregate IN-STREAM (dedup → stateful agg, two chained stateful
    # operators): the memory sink then holds 5 aggregate rows instead of
    # the full deduped firehose on the driver.
    counts = deduped.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    # State partitioning sized to state volume, not scan parallelism
    # (see scoped_shuffle_partitions).
    with scoped_shuffle_partitions(
        spark, bounded_state_partitions(spark, sf_dir, "events")
    ):
        StreamingQueryStarter(counts, checkpoint).run_available_now_to_memory(
            "stream_ingest_result", output_mode="complete"
        )
    return spark.sql("SELECT event_type, n FROM stream_ingest_result")


# --------------------------------------------------------------------------
# Deterministic train/val/test split + weighted source mixing — the
# reproducibility-critical sampling ops of a training-data pipeline
# (membership is a pure function of the row key: stable across reruns,
# partition layouts, and engines; operators/sampling.py).
# --------------------------------------------------------------------------
@query(
    "train_test_split",
    "sampling: hash-deterministic train/val/test split counts per source",
    oracle=None,  # set below after import to avoid a forward reference
)
def train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.sampling import split_column

    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("split", split_column("doc_id"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "weighted_source_mix",
    "sampling: per-source weighted down-mix, deterministic by doc hash",
    oracle=None,
)
def weighted_source_mix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.sampling import (
        weighted_source_mix,
    )

    docs = load_table(spark, sf_dir, "documents")
    mixed = weighted_source_mix(
        docs, key="doc_id", source_col="source",
        weights={"src0": 1.0, "src1": 0.5, "src2": 0.25},
    )
    return mixed.groupBy("source").agg(F.count(F.lit(1)).alias("n"))


def _install_sampling_oracles() -> None:
    from openaq_data_pipeline_engineering_spark.operators.sampling import (
        hash_unit_sql,
        split_column_sql,
    )
    from openaq_data_pipeline_engineering_spark.plans.registry import QUERIES

    QUERIES["train_test_split"].oracle = f"""
    SELECT source, {split_column_sql('doc_id')} AS split, count(*) AS n
    FROM documents GROUP BY source, 2
    """
    u = hash_unit_sql("doc_id", "mix")
    QUERIES["weighted_source_mix"].oracle = f"""
    SELECT source, count(*) AS n FROM documents
    WHERE {u} < (CASE source WHEN 'src0' THEN 1.0 WHEN 'src1' THEN 0.5
                 WHEN 'src2' THEN 0.25 ELSE 0.0 END)
    GROUP BY source
    """


_install_sampling_oracles()


@query(
    "streaming_windowed_counts",
    "streaming: watermarked tumbling-window rollup over the event stream",
    # Batch-SQL-expressible: with availableNow + a final no-data batch,
    # append mode emits exactly the tumbling windows whose end <= final
    # watermark (max event time - 2h). The oracle replays that semantics
    # over the same parquet.
    oracle="""
    WITH win AS (
        SELECT event_type, date_trunc('hour', ts) AS wstart, count(*) AS n
        FROM events GROUP BY 1, 2
    ), wm AS (
        SELECT max(ts) - INTERVAL 2 HOUR AS watermark FROM events
    )
    SELECT event_type,
           count(*) AS n_windows,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM win, wm
    WHERE wstart + INTERVAL 1 HOUR <= watermark
    GROUP BY event_type
    """,
)
def streaming_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        events_stream_reader,
        bounded_state_partitions,
        events_stream_spec,
        scoped_shuffle_partitions,
        windowed_counts,
    )

    apply_runtime_confs(spark)
    schema, to_event_time = events_stream_spec(spark, sf_dir)
    stream = to_event_time(
        events_stream_reader(spark, schema, sf_dir)
    )
    agg = windowed_counts(stream, "ts", "1 hour", watermark="2 hours",
                          group_cols=["event_type"])
    checkpoint = fresh_scratch_dir("streamwin_ckpt")
    with scoped_shuffle_partitions(
        spark, bounded_state_partitions(spark, sf_dir, "events")
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_windowed_result")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # append mode: only watermark-closed windows are emitted; aggregate
    # to a small summary so the memory table result stays driver-safe
    return spark.sql(
        "SELECT event_type, count(*) AS n_windows, sum(n) AS n_events "
        "FROM stream_windowed_result GROUP BY event_type"
    )


@query(
    "streaming_sliding_counts",
    "streaming: HOPPING-window rollup (1h window / 30min slide) with "
    "watermark — each event lands in window/slide = 2 overlapping windows",
    # Append mode emits each hopping window once its end passes the
    # final watermark (max ts - 2h). DuckDB replays: every event maps
    # to its two covering 30-min-aligned starts (time_bucket's epoch
    # origin matches Spark's window alignment), then the same
    # closed-window screen.
    oracle="""
    WITH starts AS (
        SELECT event_type, ts,
               unnest([time_bucket(INTERVAL '30 minutes', ts),
                       time_bucket(INTERVAL '30 minutes', ts)
                           - INTERVAL 30 MINUTE]) AS wstart
        FROM events
    ), win AS (
        SELECT event_type, wstart, count(*) AS n
        FROM starts GROUP BY 1, 2
    ), wm AS (
        SELECT max(ts) - INTERVAL 2 HOUR AS watermark FROM events
    )
    SELECT event_type,
           count(*) AS n_windows,
           CAST(sum(n) AS BIGINT) AS n_events
    FROM win, wm
    WHERE wstart + INTERVAL 1 HOUR <= watermark
    GROUP BY event_type
    """,
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        events_stream_reader,
        bounded_state_partitions,
        events_stream_spec,
        scoped_shuffle_partitions,
        windowed_counts,
    )

    apply_runtime_confs(spark)
    schema, to_event_time = events_stream_spec(spark, sf_dir)
    stream = to_event_time(
        events_stream_reader(spark, schema, sf_dir)
    )
    agg = windowed_counts(
        stream, "ts", "1 hour", watermark="2 hours",
        group_cols=["event_type"], slide="30 minutes",
    )
    checkpoint = fresh_scratch_dir("streamslide_ckpt")
    with scoped_shuffle_partitions(
        spark, bounded_state_partitions(spark, sf_dir, "events")
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_sliding_result")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(
        "SELECT event_type, count(*) AS n_windows, sum(n) AS n_events "
        "FROM stream_sliding_result GROUP BY event_type"
    )


# --------------------------------------------------------------------------
# Stream-stream interval join: click→purchase attribution within 10 min.
# Both sides are watermarked and the join carries an event-time range
# condition, so state eviction is bounded (clicks held ≤ watermark +
# 10 min) — the production shape for joining two firehoses at 100 TB:
# state ∝ events inside the interval, never the full history.
# --------------------------------------------------------------------------
@query(
    "streaming_join_attribution",
    "streaming: stream-stream inner join (click→purchase ≤10 min, same "
    "user) with watermarks + event-time range condition",
    # Inner interval joins emit exactly the matching pairs; with
    # availableNow over one parquet file the plan runs as a single
    # micro-batch, so no pair is dropped by watermark eviction. The
    # oracle is the equivalent batch range join; delay is exact integer
    # microseconds (no datediff boundary-crossing semantics).
    oracle="""
    SELECT c.event_id AS click_id, p.event_id AS purchase_id,
           c.user_id AS user_id,
           epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    """,
)
def streaming_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        events_stream_reader,
        bounded_state_partitions,
        events_stream_spec,
        scoped_shuffle_partitions,
    )

    apply_runtime_confs(spark)
    schema, to_event_time = events_stream_spec(spark, sf_dir)

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            to_event_time(
                events_stream_reader(spark, schema, sf_dir)
            )
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                # exact integer micros alongside the event-time col
                F.col("ts_us").alias(f"{prefix}_us"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "2 hours")
        )

    clicks = side("click", "click")
    purchases = side("purchase", "purchase")
    joined = clicks.join(
        purchases,
        F.expr(
            "click_user = purchase_user "
            "AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 10 MINUTES"
        ),
    ).select(
        "click_id",
        "purchase_id",
        F.col("click_user").alias("user_id"),
        (F.col("purchase_us") - F.col("click_us")).alias("delay_us"),
    )
    checkpoint = fresh_scratch_dir("streamjoin_ckpt")
    # A stream-stream join maintains 4 state stores PER partition; size
    # partitioning to join-state volume (see scoped_shuffle_partitions:
    # 32 partitions measured ~5× slower than 8 on the same input).
    with scoped_shuffle_partitions(
        spark, bounded_state_partitions(spark, sf_dir, "events")
    ):
        q = (
            joined.writeStream.format("memory")
            .queryName("stream_join_result")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(
        "SELECT click_id, purchase_id, user_id, delay_us "
        "FROM stream_join_result"
    )


@query(
    "streaming_session_windows",
    "streaming: native session_window aggregation (4h gap, watermarked) "
    "— per-user session counts over the event stream",
    # Append mode emits a session once the watermark (max event time -
    # 2h, computed AFTER the user filter) passes the session end (last
    # event + gap). The oracle replays the same semantics batch-side as
    # gaps-and-islands: a new session starts when the inter-event gap is
    # >= 4h (Spark merges sessions that OVERLAP, i.e. next < prev+gap).
    oracle="""
    WITH ev AS (
        SELECT user_id, ts FROM events WHERE user_id < 200
    ), wm AS (
        SELECT max(ts) - INTERVAL 2 HOUR AS watermark FROM ev
    ), flag AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 4 HOUR
                    THEN 1 ELSE 0 END AS new_s
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id
                                ORDER BY ts, new_s DESC
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flag
    ), agg AS (
        SELECT user_id, sid, count(*) AS n,
               max(ts) + INTERVAL 4 HOUR AS s_end
        FROM sess GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(max(n) AS BIGINT) AS max_session_n
    FROM agg, wm
    WHERE s_end <= watermark
    GROUP BY user_id
    """,
)
def streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        events_stream_reader,
        bounded_state_partitions,
        events_stream_spec,
        scoped_shuffle_partitions,
    )

    apply_runtime_confs(spark)
    schema, to_event_time = events_stream_spec(spark, sf_dir)
    stream = to_event_time(
        events_stream_reader(spark, schema, sf_dir)
    )
    sessions = (
        stream.filter(F.col("user_id") < 200)
        .withWatermark("ts", "2 hours")
        .groupBy(F.session_window("ts", "4 hours"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    checkpoint = fresh_scratch_dir("streamsess_ckpt")
    with scoped_shuffle_partitions(
        spark, bounded_state_partitions(spark, sf_dir, "events")
    ):
        q = (
            sessions.writeStream.format("memory")
            .queryName("stream_session_result")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(
        "SELECT user_id, count(*) AS n_sessions, sum(n) AS n_events, "
        "max(n) AS max_session_n "
        "FROM stream_session_result GROUP BY user_id"
    )


@query(
    "streaming_static_enrich",
    "streaming: stream-static broadcast join (event stream x derived "
    "dim), complete-mode rollup",
    # Stream-static joins are stateless: with availableNow every stream
    # row joins the same static snapshot, so the batch replay is the
    # identical join + rollup.
    oracle="""
    WITH dim AS (
        SELECT DISTINCT event_type,
               CAST(length(event_type) AS BIGINT) AS type_len
        FROM events
    )
    SELECT d.type_len,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(e.value * 1000) AS BIGINT)) AS BIGINT)
               AS sum_milli
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY d.type_len
    """,
)
def streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        events_stream_reader,
        bounded_state_partitions,
        events_stream_spec,
        scoped_shuffle_partitions,
    )

    apply_runtime_confs(spark)
    # Static side: small derived dim — broadcast into every micro-batch.
    dim = F.broadcast(
        load_table(spark, sf_dir, "events")
        .select("event_type")
        .distinct()
        .withColumn("type_len", F.length("event_type").cast("bigint"))
    )
    schema, to_event_time = events_stream_spec(spark, sf_dir)
    stream = to_event_time(
        events_stream_reader(spark, schema, sf_dir)
    )
    rollup = (
        stream.join(dim, "event_type")
        .groupBy("type_len")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias(
                "sum_milli"
            ),
        )
    )
    checkpoint = fresh_scratch_dir("streamenrich_ckpt")
    with scoped_shuffle_partitions(
        spark, bounded_state_partitions(spark, sf_dir, "events")
    ):
        q = (
            rollup.writeStream.format("memory")
            .queryName("stream_enrich_result")
            .outputMode("complete")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(
        "SELECT type_len, n, sum_milli FROM stream_enrich_result"
    )


@query(
    "grouped_pandas_stats",
    "applyInPandas: per-group exact rank quantiles (lower-rank median / "
    "quartiles on integer milli-units) — the grouped custom-aggregation "
    "escape hatch, Arrow-batched",
    # Rank statistics are defined POSITIONALLY (0-indexed (n-1)//k over
    # the sorted milli-values), so pandas and the window-based SQL
    # replay agree bit-for-bit — no interpolation, no float folds.
    # Ties: the value at a fixed sorted position is unique for a given
    # multiset regardless of how row_number permutes equal keys.
    oracle="""
    WITH v AS (
      SELECT event_type, CAST(floor(value * 1000) AS BIGINT) AS m
      FROM events
    ), r AS (
      SELECT event_type, m,
             row_number() OVER (PARTITION BY event_type ORDER BY m) - 1 AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(CASE WHEN rn = (n-1)//2 THEN m END) AS BIGINT)
               AS med_milli,
           CAST(max(CASE WHEN rn = (n-1)//4 THEN m END) AS BIGINT)
               AS p25_milli,
           CAST(max(CASE WHEN rn = 3*(n-1)//4 THEN m END) AS BIGINT)
               AS p75_milli
    FROM r GROUP BY event_type
    """,
)
def grouped_pandas_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = fan_out(load_table(spark, sf_dir, "events")).select(
        "event_type",
        F.floor(F.col("value") * 1000).cast("bigint").alias("value_milli"),
    )

    def stats(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        v = np.sort(pdf["value_milli"].to_numpy())
        n = len(v)
        return pd.DataFrame(
            [
                {
                    "event_type": pdf["event_type"].iloc[0],
                    "n": n,
                    "med_milli": int(v[(n - 1) // 2]),
                    "p25_milli": int(v[(n - 1) // 4]),
                    "p75_milli": int(v[3 * (n - 1) // 4]),
                }
            ]
        )

    return ev.groupBy("event_type").applyInPandas(
        stats,
        "event_type string, n bigint, med_milli bigint, "
        "p25_milli bigint, p75_milli bigint",
    )


@query(
    "count_min_estimates",
    "sketch: count-min (d=3, w=64) built as a grouped count matrix, "
    "probed for 5 keys — md5 row hashes make the sketch bit-replayable",
    # Unlike HLL/GK (engine-specific internals, accuracy-tested in
    # pytest only), this sketch is EXACTLY reproducible cross-engine:
    # the d x w counter matrix is an ordinary groupBy over
    # md5-derived cells, and the estimate is min over d counters.
    # Overestimation-only is asserted structurally: est >= true count.
    oracle="""
    WITH cells AS (
      SELECT j,
             CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':',
                  CAST(user_id AS VARCHAR))), 1, 7)) AS BIGINT) % 64 AS cell,
             count(*) AS c
      FROM events, unnest([0, 1, 2]) AS r(j)
      GROUP BY 1, 2
    ), probes AS (
      SELECT DISTINCT user_id FROM events WHERE user_id < 5
    ), probe_cells AS (
      SELECT p.user_id, j,
             CAST(concat('0x', substr(md5(concat(CAST(j AS VARCHAR), ':',
                  CAST(p.user_id AS VARCHAR))), 1, 7)) AS BIGINT) % 64 AS cell
      FROM probes p, unnest([0, 1, 2]) AS r(j)
    ), truth AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS true_n
      FROM events WHERE user_id < 5 GROUP BY user_id
    )
    SELECT t.user_id, t.true_n,
           CAST(min(c.c) AS BIGINT) AS est_n,
           CAST(min(c.c) >= t.true_n AS INTEGER) AS overestimates
    FROM probe_cells pc
    JOIN cells c ON c.j = pc.j AND c.cell = pc.cell
    JOIN truth t ON t.user_id = pc.user_id
    GROUP BY t.user_id, t.true_n
    """,
)
def count_min_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    rows = ["0", "1", "2"]

    def cell(j: str, key):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(j), F.lit(":"), key.cast("string"))),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("bigint")
            % 64
        )

    hashed = ev.select(
        "user_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(j)).alias("j"),
                        cell(j, F.col("user_id")).alias("cell"),
                    )
                    for j in rows
                ]
            )
        ).alias("h"),
    )
    cells = hashed.groupBy("h.j", "h.cell").agg(F.count(F.lit(1)).alias("c"))
    truth = (
        ev.filter(F.col("user_id") < 5)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    probe_cells = truth.select(
        "user_id",
        "true_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(int(j)).alias("j"),
                        cell(j, F.col("user_id")).alias("cell"),
                    )
                    for j in rows
                ]
            )
        ).alias("h"),
    ).select("user_id", "true_n", "h.j", "h.cell")
    return (
        probe_cells.join(F.broadcast(cells), ["j", "cell"])
        .groupBy("user_id", "true_n")
        .agg(F.min("c").alias("est_n"))
        .select(
            "user_id",
            "true_n",
            "est_n",
            (F.col("est_n") >= F.col("true_n")).cast("int").alias(
                "overestimates"
            ),
        )
    )


@query(
    "multimodal_frame_sample",
    "multimodal: binary payload -> every-10th-frame row explosion "
    "(mapInPandas), summarized to per-doc frame counts/bytes",
    # chunk_frames is the deterministic codec stand-in (64-byte frames,
    # stride 10 — operators/multimodal.py:127), so the oracle replays
    # the sampled-frame arithmetic directly from the payload length
    # (ASCII text payloads: strlen == byte length, same contract
    # multimodal_decode_meta relies on).
    oracle="""
    WITH d AS (
      SELECT doc_id, strlen(text) AS L FROM documents WHERE doc_id < 500
    ), f AS (
      SELECT doc_id, j, least(64, L - j * 10 * 64) AS fb
      FROM d, unnest(range(0, CAST((((L + 63) // 64) + 9) // 10 AS BIGINT)))
               AS r(j)
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_sampled,
           CAST(sum(fb) AS BIGINT) AS bytes_sampled,
           CAST(max(j) AS INTEGER) AS max_idx
    FROM f GROUP BY doc_id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.multimodal import (
        sample_frames,
        with_binary_payload,
    )

    docs = fan_out(load_table(spark, sf_dir, "documents")).filter(
        F.col("doc_id") < 500
    )
    frames = sample_frames(with_binary_payload(docs, "text"), every_n=10)
    return frames.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum(F.octet_length("frame_payload")).alias("bytes_sampled"),
        F.max("frame_idx").alias("max_idx"),
    )


# --------------------------------------------------------------------------
# Complete-mode streaming ranking: the third output-mode surface
# (append + update are exercised above). Complete mode re-emits the
# FULL aggregate every trigger — correct only because the aggregate
# state is tiny (|event types| rows); the docstring contract at 100 TB
# is exactly that: complete mode is for small leaderboards, never for
# high-cardinality keys (state = the whole result set).
# --------------------------------------------------------------------------
@query(
    "streaming_topk_complete",
    "streaming: complete-mode leaderboard (per-type totals re-emitted "
    "each trigger), final snapshot == batch top-k",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    ORDER BY n DESC, event_type
    LIMIT 5
    """,
)
def streaming_topk_complete(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        events_stream_reader,
        bounded_state_partitions,
        events_stream_spec,
        scoped_shuffle_partitions,
    )

    apply_runtime_confs(spark)
    schema, to_event_time = events_stream_spec(spark, sf_dir)
    stream = to_event_time(
        events_stream_reader(spark, schema, sf_dir)
    )
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    checkpoint = fresh_scratch_dir("streamtopk_ckpt")
    with scoped_shuffle_partitions(
        spark, bounded_state_partitions(spark, sf_dir, "events")
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_topk_result")
            .outputMode("complete")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(
        "SELECT event_type, n FROM stream_topk_result "
        "ORDER BY n DESC, event_type LIMIT 5"
    )


# --------------------------------------------------------------------------
# HyperLogLog registers AS DATA (mergeable-sketch twin of the Bloom
# index, operators/bloom.py): per-group m=64 max-ρ registers built with
# one max-aggregation, merged across groups with another max (the HLL
# union), and the raw Flajolet estimate αm²/Σ2^(-M_j) compared against
# the exact distinct count in the same result row. Unlike the built-in
# approx_count_distinct (operators/sketch.py), the registers here are
# engine-portable integers — DuckDB rebuilds them bit-for-bit, and the
# estimate arithmetic is exact dyadic-rational double math, so even the
# float column hash-matches.
# Scale: register build shuffles |groups| × 64 rows after map-side
# combine; merge cost is |groups| × 64 regardless of corpus size —
# the property that lets 100 TB partial sketches union on the driver.
# --------------------------------------------------------------------------
_HLL_M = 64  # registers; alpha_64 = 0.709 (Flajolet et al. 2007)


@query(
    "hll_register_sketch",
    "sketch: portable HyperLogLog registers per event type + ALL-merge "
    "(max-union), raw estimate vs exact distinct users in one row",
    oracle=f"""
    WITH h AS (
      SELECT event_type, user_id,
             CAST(concat('0x', substr(md5(concat('h:',
                  CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) AS hv
      FROM events
    ),
    rows_ AS (
      SELECT event_type,
             user_id,
             hv % {_HLL_M} AS idx,
             hv // {_HLL_M} AS w
      FROM h
    ),
    per_type AS (
      SELECT event_type, idx,
             max(CASE WHEN w = 0 THEN 27
                 ELSE 27 - length(bin(w)) END) AS rho
      FROM rows_ GROUP BY 1, 2
    ),
    merged AS (
      SELECT 'ALL' AS grp, idx, max(rho) AS rho FROM per_type GROUP BY 2
      UNION ALL
      SELECT event_type, idx, rho FROM per_type
    ),
    est AS (
      SELECT grp,
             CAST(count(*) AS BIGINT) AS n_registers_set,
             0.709 * {_HLL_M} * {_HLL_M} /
               (sum(power(2.0, -rho)) + ({_HLL_M} - count(*))) AS hll_estimate
      FROM merged GROUP BY 1
    ),
    exact AS (
      SELECT 'ALL' AS grp, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
      FROM rows_
      UNION ALL
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT)
      FROM rows_ GROUP BY 1
    )
    SELECT e.grp, e.n_registers_set, e.hll_estimate, x.exact_distinct
    FROM est e JOIN exact x ON e.grp = x.grp
    """,
)
def hll_register_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("h:"), F.col("user_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    rows = ev.select(
        "event_type",
        "user_id",
        (hv % _HLL_M).alias("idx"),
        (hv / _HLL_M).cast("bigint").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(27)).otherwise(
        F.lit(27) - F.length(F.bin("w"))
    )
    per_type = (
        rows.withColumn("rho", rho)
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("rho"))
        # The register table (types x m, tiny) feeds both the merged
        # union branch and the per-type branch; materialize once.
        .localCheckpoint(eager=True)
    )
    merged = (
        per_type.groupBy("idx")
        .agg(F.max("rho").alias("rho"))
        .select(F.lit("ALL").alias("grp"), "idx", "rho")
        .unionByName(
            per_type.select(
                F.col("event_type").alias("grp"), "idx", "rho"
            )
        )
    )
    est = merged.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_registers_set"),
        (
            F.lit(0.709 * _HLL_M * _HLL_M)
            / (
                F.sum(F.pow(F.lit(2.0), -F.col("rho")))
                + (F.lit(_HLL_M) - F.count(F.lit(1)))
            )
        ).alias("hll_estimate"),
    )
    exact = (
        rows.agg(F.count_distinct("user_id").alias("exact_distinct"))
        .select(F.lit("ALL").alias("grp"), "exact_distinct")
        .unionByName(
            rows.groupBy(F.col("event_type").alias("grp")).agg(
                F.count_distinct("user_id").alias("exact_distinct")
            )
        )
    )
    return est.join(exact, on="grp")


# --------------------------------------------------------------------------
# Stream-stream LEFT OUTER interval join: matches emit immediately;
# an unmatched click emits with NULLs only once the watermark proves
# no future purchase can join it (click_ts + 10min < watermark) —
# bounded state, late-but-complete outer results. With availableNow
# the final no-data batch advances the watermark and evicts; the
# GLOBAL watermark is the MIN across the two input streams' event-time
# maxima minus the delay (Spark advances a multi-input query at the
# pace of its slowest input), so the oracle replays eviction as
# click_ts + 10min < least(max_click_ts, max_purchase_ts) - 2h —
# verified empirically against the emitted set (the max-of-all-events
# form over-emits by exactly the clicks inside the two maxima's gap).
# --------------------------------------------------------------------------
@query(
    "streaming_outer_attribution",
    "streaming: stream-stream LEFT OUTER interval join — matched "
    "pairs + watermark-proven unmatched clicks, per-day rollup",
    oracle="""
    WITH wm AS (
      SELECT least(max(CASE WHEN event_type = 'click' THEN ts END),
                   max(CASE WHEN event_type = 'purchase' THEN ts END))
             - INTERVAL 2 HOUR AS w
      FROM events
    ),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    matched AS (
      SELECT c.event_id, c.ts
      FROM clicks c
      WHERE EXISTS (
        SELECT 1 FROM purchases p
        WHERE p.user_id = c.user_id
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE)
    ),
    unmatched AS (
      SELECT c.event_id, c.ts
      FROM clicks c, wm
      WHERE NOT EXISTS (
        SELECT 1 FROM purchases p
        WHERE p.user_id = c.user_id
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE)
        AND c.ts + INTERVAL 10 MINUTE < wm.w
    )
    SELECT d, CAST(sum(m) AS BIGINT) AS n_matched,
           CAST(sum(u) AS BIGINT) AS n_unmatched
    FROM (
      SELECT CAST(ts AS DATE) AS d, 1 AS m, 0 AS u FROM matched
      UNION ALL
      SELECT CAST(ts AS DATE), 0, 1 FROM unmatched
    ) GROUP BY d
    """,
)
def streaming_outer_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        events_stream_reader,
        bounded_state_partitions,
        events_stream_spec,
        scoped_shuffle_partitions,
    )

    apply_runtime_confs(spark)
    schema, to_event_time = events_stream_spec(spark, sf_dir)

    def side(event_type: str, prefix: str) -> DataFrame:
        return (
            to_event_time(
                events_stream_reader(spark, schema, sf_dir)
            )
            .filter(F.col("event_type") == event_type)
            .select(
                F.col("event_id").alias(f"{prefix}_id"),
                F.col("user_id").alias(f"{prefix}_user"),
                F.col("ts").alias(f"{prefix}_ts"),
            )
            .withWatermark(f"{prefix}_ts", "2 hours")
        )

    clicks = side("click", "click")
    purchases = side("purchase", "purchase")
    joined = clicks.join(
        purchases,
        F.expr(
            "click_user = purchase_user "
            "AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + INTERVAL 10 MINUTES"
        ),
        "left_outer",
    ).select(
        "click_id",
        "click_ts",
        F.col("purchase_id").isNotNull().alias("matched"),
    )
    checkpoint = fresh_scratch_dir("streamouter_ckpt")
    with scoped_shuffle_partitions(
        spark, bounded_state_partitions(spark, sf_dir, "events")
    ):
        q = (
            joined.writeStream.format("memory")
            .queryName("stream_outer_result")
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    # a click matching k purchases appears k times; count it once as
    # matched (mirrors the oracle's EXISTS), unmatched rows are unique
    return spark.sql(
        """
        SELECT CAST(click_ts AS DATE) AS d,
               count(DISTINCT CASE WHEN matched THEN click_id END)
                 AS n_matched,
               count(DISTINCT CASE WHEN NOT matched THEN click_id END)
                 AS n_unmatched
        FROM stream_outer_result
        GROUP BY 1
        """
    )


# --------------------------------------------------------------------------
# UPDATE-mode streaming aggregation — the third output mode as a
# DECLARED query (append: streaming_windowed_counts; complete:
# streaming_topk_complete). Update mode re-emits only keys whose
# aggregate CHANGED in the trigger; with availableNow over one file
# every key emits exactly once, so the memory sink's latest row per
# key IS the final state and equals the batch aggregate. The batch-SQL
# read-back takes max_by(n, n) per key to stay correct even if a
# multi-batch replay emitted a key twice.
# --------------------------------------------------------------------------
@query(
    "streaming_update_counts",
    "streaming: update-mode per-type user-event counts — latest "
    "emission per key equals the batch aggregate",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY event_type
    """,
)
def streaming_update_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs
    from openaq_data_pipeline_engineering_spark.streaming.ingest import (
        events_stream_reader,
        bounded_state_partitions,
        events_stream_spec,
        scoped_shuffle_partitions,
    )

    apply_runtime_confs(spark)
    schema, to_event_time = events_stream_spec(spark, sf_dir)
    stream = to_event_time(
        events_stream_reader(spark, schema, sf_dir)
    )
    agg = stream.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    checkpoint = fresh_scratch_dir("streamupd_ckpt")
    with scoped_shuffle_partitions(
        spark, bounded_state_partitions(spark, sf_dir, "events")
    ):
        q = (
            agg.writeStream.format("memory")
            .queryName("stream_update_result")
            .outputMode("update")
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.sql(
        "SELECT event_type, max_by(n, n) AS n "
        "FROM stream_update_result GROUP BY event_type"
    )
