"""Declared queries: function-surface suites — higher-order array
lambdas, map construction/lookup, and regular expressions.

Extends the scalar/array/datetime suites (plans/queries_advanced.py)
with the three remaining builtin-function families a warehouse user of
the reference would reach for: the reference's Glue job leans on
plain projections (process_openaq_raw.py:116-165) and its Athena
validation uses LIKE-style predicates (utils/athena_utils.py:38-175);
this engine exposes the full Spark lambda/map/regex surface with
DuckDB-replayable semantics.

Cross-engine rules applied here:
- Lambda folds run left-to-right in BOTH engines over the same row, so
  per-row float folds are bit-identical (registry float policy); we
  still round fold outputs to 6 like embedding_norm_stats.
- Map iteration order is made deterministic by sorting entries BEFORE
  map_from_entries; only scalar lookups / sorted-key strings are
  emitted (never a raw map column).
- Regex patterns are restricted to the RE2 ∩ java.util.regex common
  subset (char classes, quantifiers, one capture group — no lookaround,
  no backrefs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import fan_out, load_table


# --------------------------------------------------------------------------
# Higher-order lambdas over the embedding vectors: transform / filter /
# aggregate / exists / forall / zip_with, each reduced to a scalar so
# the value-hash is engine-stable (raw float arrays never leave the row).
# --------------------------------------------------------------------------
@query(
    "higher_order_funcs_suite",
    "lambdas: filter/transform/aggregate/exists/forall/zip_with folds",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           round(list_reduce(
               list_transform(embedding, x -> CAST(x AS DOUBLE) * x),
               (a, x) -> a + x), 6) AS sum_sq,
           round(list_reduce(
               list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
               (a, x) -> a + x), 6) AS l1_norm,
           CAST(len(list_filter(embedding, x -> abs(x) > 2.0)) > 0
                AS INTEGER) AS any_big,
           CAST(len(list_filter(embedding, x -> abs(x) >= 4.0)) = 0
                AS INTEGER) AS all_small
    FROM embeddings
    WHERE vec_id < 500
    """,
)
def higher_order_funcs_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    e = F.col("embedding")
    dbl = lambda x: x.cast("double")  # noqa: E731
    return emb.filter(F.col("vec_id") < 500).select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        # zip_with(e, e, *) == per-element square; the fold over it is
        # the same left-to-right double sum the oracle replays.
        F.round(
            F.aggregate(
                F.zip_with(e, e, lambda x, y: dbl(x) * dbl(y)),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("sum_sq"),
        F.round(
            F.aggregate(
                F.transform(e, lambda x: F.abs(dbl(x))),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
            6,
        ).alias("l1_norm"),
        F.exists(e, lambda x: F.abs(x) > 2.0).cast("int").alias("any_big"),
        F.forall(e, lambda x: F.abs(x) < 4.0).cast("int").alias("all_small"),
    )


# --------------------------------------------------------------------------
# Map functions: build a per-user map event_type -> count (entries
# sorted before map_from_entries so key order is deterministic), then
# read it back via map_keys / element_at / map_filter / map_values.
# The oracle replays the same VALUES without a map type — what is
# checked is the lookup/filter semantics, not DuckDB's map internals.
# --------------------------------------------------------------------------
@query(
    "map_functions_suite",
    "maps: map_from_entries -> keys/element_at/map_filter/values folds",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS keys,
           CAST(count(DISTINCT event_type) AS INTEGER) AS n_keys,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS error_n,
           CAST(count(DISTINCT CASE WHEN cnt > 5 THEN event_type END)
                AS INTEGER) AS n_hot_keys,
           CAST(count(*) AS BIGINT) AS vals_total
    FROM (
        SELECT user_id, event_type,
               count(*) OVER (PARTITION BY user_id, event_type) AS cnt
        FROM events WHERE user_id < 40
    )
    GROUP BY user_id
    """,
)
def map_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    counts = (
        ev.filter(F.col("user_id") < 40)
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    m = F.map_from_entries(
        F.array_sort(F.collect_list(F.struct("event_type", "cnt")))
    )
    return counts.groupBy("user_id").agg(
        F.array_join(F.map_keys(m), ",").alias("keys"),
        F.size(m).alias("n_keys"),
        F.coalesce(F.element_at(m, "error"), F.lit(0).cast("long")).alias(
            "error_n"
        ),
        F.size(F.map_filter(m, lambda k, v: v > 5)).alias("n_hot_keys"),
        F.aggregate(
            F.map_values(m), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("vals_total"),
    )


# --------------------------------------------------------------------------
# Regex suite (RE2 ∩ Java common subset): extract, extract_all, count,
# boolean match, global replace.
# --------------------------------------------------------------------------
@query(
    "regex_functions_suite",
    "regex: extract/extract_all/count/match/replace over customer names",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([0-9]+)', 1) AS first_number,
           coalesce(array_to_string(regexp_extract_all(text, '[A-Z][a-z]+'),
                    ','), '') AS cap_words,
           CAST(len(regexp_extract_all(text, '[0-9]')) AS INTEGER)
               AS n_digits,
           CAST(regexp_matches(text, '[.!?] [A-Z]') AS INTEGER)
               AS multi_sentence,
           regexp_replace(text, '[0-9]', '#', 'g') AS masked
    FROM documents
    WHERE doc_id < 300
    """,
)
def regex_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("doc_id") < 300).select(
        "doc_id",
        F.regexp_extract(F.col("text"), r"([0-9]+)", 1).alias("first_number"),
        F.array_join(
            F.regexp_extract_all(F.col("text"), F.lit(r"[A-Z][a-z]+")), ","
        ).alias("cap_words"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]"))).alias(
            "n_digits"
        ),
        F.col("text").rlike(r"[.!?] [A-Z]").cast("int").alias("multi_sentence"),
        F.regexp_replace(F.col("text"), r"[0-9]", "#").alias("masked"),
    )


# --------------------------------------------------------------------------
# Binary functions: encode -> base64 / hex / byte length, decode
# roundtrip. UTF-8 byte semantics (octet_length, not char length) are
# what a payload-hashing pipeline needs (multimodal binary columns use
# the same machinery).
# --------------------------------------------------------------------------
@query(
    "binary_functions_suite",
    "binary: encode/base64/hex/octet_length + base64 roundtrip equality",
    oracle="""
    SELECT c_custkey,
           base64(encode(c_name)) AS b64,
           hex(encode(c_mktsegment)) AS seg_hex,
           CAST(octet_length(encode(c_name)) AS INTEGER) AS n_bytes,
           CAST(c_name = decode(from_base64(base64(encode(c_name))))
                AS INTEGER) AS roundtrip_ok
    FROM customer WHERE c_custkey < 300
    """,
)
def binary_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    name_bin = F.col("c_name").cast("binary")
    return cust.filter(F.col("c_custkey") < 300).select(
        "c_custkey",
        F.base64(name_bin).alias("b64"),
        F.hex(F.col("c_mktsegment").cast("binary")).alias("seg_hex"),
        F.octet_length("c_name").alias("n_bytes"),
        (
            F.col("c_name")
            == F.unbase64(F.base64(name_bin)).cast("string")
        )
        .cast("int")
        .alias("roundtrip_ok"),
    )


# --------------------------------------------------------------------------
# Schema-drift union: unionByName(allowMissingColumns=True) across two
# extracts with different column sets — the multi-source ingest shape
# where later feeds add columns. Missing columns null-fill; the oracle
# replays with explicit NULL projections (SQL UNION is positional, so
# the name-based alignment is exactly what the API adds).
# --------------------------------------------------------------------------
@query(
    "union_schema_drift",
    "union: unionByName(allowMissingColumns) across drifted extracts",
    oracle="""
    SELECT event_id, event_type, value, NULL AS quality_flag
    FROM events WHERE user_id < 10
    UNION ALL
    SELECT event_id, event_type, CAST(NULL AS DOUBLE) AS value,
           CASE WHEN value >= 50 THEN 'hi' ELSE 'lo' END AS quality_flag
    FROM events WHERE user_id >= 10 AND user_id < 20
    """,
)
def union_schema_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    old_feed = ev.filter(F.col("user_id") < 10).select(
        "event_id", "event_type", "value"
    )
    new_feed = (
        ev.filter((F.col("user_id") >= 10) & (F.col("user_id") < 20))
        .select(
            "event_id",
            "event_type",
            F.when(F.col("value") >= 50, "hi").otherwise("lo").alias(
                "quality_flag"
            ),
        )
    )
    return old_feed.unionByName(new_feed, allowMissingColumns=True)


# --------------------------------------------------------------------------
# Pivot with MULTIPLE aggregates (A1 extended): explicit pivot values
# (no distinct pre-scan) x two aliased measures -> {value}_{alias}
# columns. Integer milli-sums keep the wide matrix engine-exact.
# --------------------------------------------------------------------------
@query(
    "pivot_multi_agg",
    "pivot: explicit values x two aliased measures (count + milli sum)",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
               AS click_n,
           CAST(sum(CASE WHEN event_type = 'click'
                    THEN CAST(floor(value * 1000) AS BIGINT) END) AS BIGINT)
               AS click_milli,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
               AS error_n,
           CAST(sum(CASE WHEN event_type = 'error'
                    THEN CAST(floor(value * 1000) AS BIGINT) END) AS BIGINT)
               AS error_milli,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
               AS view_n,
           CAST(sum(CASE WHEN event_type = 'view'
                    THEN CAST(floor(value * 1000) AS BIGINT) END) AS BIGINT)
               AS view_milli
    FROM events WHERE user_id < 30
    GROUP BY user_id
    """,
)
def pivot_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    wide = (
        ev.filter(F.col("user_id") < 30)
        .groupBy("user_id")
        .pivot("event_type", ["click", "error", "view"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias(
                "milli"
            ),
        )
    )
    # count over an empty pivot cell yields 0; the oracle's conditional
    # sum yields NULL — normalize to the SQL convention
    return wide.select(
        "user_id",
        *[
            (
                F.when(F.col(f"{t}_n") > 0, F.col(f"{t}_{m}")).alias(
                    f"{t}_{m}"
                )
            )
            for t in ("click", "error", "view")
            for m in ("n", "milli")
        ],
    )


# --------------------------------------------------------------------------
# Row-level semi-structured parsers: from_xml (Spark 4), from_csv,
# str_to_map — the "stringly-typed column" rescue kit for feeds that
# embed structured fragments in varchar fields. Inputs are constructed
# from real columns so the parse is exercised per row; the oracle
# replays the EXTRACTED values directly (what's checked is parser
# semantics, not a DuckDB XML engine — it has none).
# --------------------------------------------------------------------------
@query(
    "row_parsers_suite",
    "parsers: from_xml/from_csv/str_to_map over constructed per-row "
    "fragments (typed extraction + defaults)",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey % 100 AS INTEGER) AS xml_code,
           o_orderstatus AS csv_status,
           CAST(floor(o_totalprice) AS BIGINT) AS csv_cents,
           2 AS n_map_keys,
           CAST(o_orderkey % 10 AS BIGINT) AS map_a
    FROM orders WHERE o_orderkey < 500
    """,
)
def row_parsers_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    xml_str = F.concat(
        F.lit("<r><code>"),
        (F.col("o_orderkey") % 100).cast("string"),
        F.lit("</code></r>"),
    )
    csv_str = F.concat(
        F.col("o_orderstatus"),
        F.lit(","),
        F.floor(F.col("o_totalprice")).cast("string"),
    )
    map_str = F.concat(
        F.lit("a:"),
        (F.col("o_orderkey") % 10).cast("string"),
        F.lit(",b:0"),
    )
    parsed = o.select(
        "o_orderkey",
        F.from_xml(xml_str, "code INT").alias("x"),
        F.from_csv(csv_str, "status STRING, cents BIGINT").alias("c"),
        F.str_to_map(map_str, F.lit(","), F.lit(":")).alias("m"),
    )
    return parsed.select(
        "o_orderkey",
        F.col("x.code").alias("xml_code"),
        F.col("c.status").alias("csv_status"),
        F.col("c.cents").alias("csv_cents"),
        F.size("m").alias("n_map_keys"),
        F.element_at(F.col("m"), "a").cast("bigint").alias("map_a"),
    )


# --------------------------------------------------------------------------
# Bitwise functions: scalar ops (& | ^ << >>) and the bit-aggregate
# family (bit_and/bit_or/bit_xor) — flag-mask rollups. All integer,
# hence engine-exact by construction.
# --------------------------------------------------------------------------
@query(
    "bit_functions_suite",
    "bits: scalar &/|/^/shifts + bit_and/bit_or/bit_xor aggregates "
    "over per-user flag masks",
    oracle="""
    WITH f AS (
      SELECT user_id,
             CAST(event_id & 255 AS BIGINT) AS mask,
             CAST((event_id & 12) | 3 AS BIGINT) AS scalar_mix,
             CAST(xor(event_id & 255, 129) AS BIGINT) AS flipped,
             CAST((event_id & 15) << 2 AS BIGINT) AS shifted_l,
             CAST((event_id & 255) >> 3 AS BIGINT) AS shifted_r
      FROM events WHERE user_id < 20
    )
    SELECT user_id,
           CAST(bit_and(mask) AS BIGINT) AS all_bits,
           CAST(bit_or(mask) AS BIGINT) AS any_bits,
           CAST(bit_xor(mask) AS BIGINT) AS parity_bits,
           CAST(sum(scalar_mix) AS BIGINT) AS sum_mix,
           CAST(sum(flipped) AS BIGINT) AS sum_flipped,
           CAST(sum(shifted_l + shifted_r) AS BIGINT) AS sum_shifted
    FROM f GROUP BY user_id
    """,
)
def bit_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    eid = F.col("event_id")
    f = ev.select(
        "user_id",
        eid.bitwiseAND(255).alias("mask"),
        (eid.bitwiseAND(12).bitwiseOR(3)).alias("scalar_mix"),
        eid.bitwiseAND(255).bitwiseXOR(129).alias("flipped"),
        F.shiftleft(eid.bitwiseAND(15), 2).cast("bigint").alias("shifted_l"),
        F.shiftright(eid.bitwiseAND(255), 3).cast("bigint").alias("shifted_r"),
    )
    return f.groupBy("user_id").agg(
        F.bit_and("mask").alias("all_bits"),
        F.bit_or("mask").alias("any_bits"),
        F.bit_xor("mask").alias("parity_bits"),
        F.sum("scalar_mix").alias("sum_mix"),
        F.sum("flipped").alias("sum_flipped"),
        F.sum(F.col("shifted_l") + F.col("shifted_r")).alias("sum_shifted"),
    )


# --------------------------------------------------------------------------
# Array set operations: union / intersect / except / overlap between
# each user's first-half and second-half event-type sets. Set results
# are order-normalized (array_sort) before stringifying so the hash is
# engine-stable.
# --------------------------------------------------------------------------
@query(
    "array_setops_suite",
    "arrays: union/intersect/except/overlaps between per-user early "
    "and late type sets (sort-normalized)",
    oracle="""
    WITH halves AS (
      SELECT user_id,
             list_sort(list(DISTINCT event_type)
                 FILTER (WHERE event_id % 2 = 0)) AS early,
             list_sort(list(DISTINCT event_type)
                 FILTER (WHERE event_id % 2 = 1)) AS late
      FROM events WHERE user_id < 25 GROUP BY user_id
    )
    SELECT user_id,
           array_to_string(list_sort(list_distinct(
               coalesce(early, []) || coalesce(late, []))), ',') AS u,
           coalesce(array_to_string(list_sort(list_intersect(
               coalesce(early, []), coalesce(late, []))), ','), '') AS i,
           coalesce(array_to_string(list_sort(list_filter(
               coalesce(early, []),
               x -> NOT list_contains(coalesce(late, []), x))), ','), '')
               AS d,
           CAST(len(list_intersect(coalesce(early, []),
               coalesce(late, []))) > 0 AS INTEGER) AS overlaps
    FROM halves
    """,
)
def array_setops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    early = F.array_sort(
        F.collect_set(F.when(F.col("event_id") % 2 == 0, F.col("event_type")))
    )
    late = F.array_sort(
        F.collect_set(F.when(F.col("event_id") % 2 == 1, F.col("event_type")))
    )
    halves = ev.groupBy("user_id").agg(
        early.alias("early"), late.alias("late")
    )
    e, l = F.col("early"), F.col("late")
    return halves.select(
        "user_id",
        F.array_join(F.array_sort(F.array_union(e, l)), ",").alias("u"),
        F.array_join(F.array_sort(F.array_intersect(e, l)), ",").alias("i"),
        F.array_join(F.array_sort(F.array_except(e, l)), ",").alias("d"),
        F.arrays_overlap(e, l).cast("int").alias("overlaps"),
    )


# --------------------------------------------------------------------------
# Python UDTF as a DECLARED query (§2.10 surface): the engine's
# sanctioned one-row-in/N-rows-out extension point, exercised
# end-to-end against a SQL oracle instead of only in pytest. Arrow-
# optimized (useArrow) so the exec node is ArrowEvalPythonUDTF — the
# plan-audit gate still bans row-pickled BatchEvalPython. Bounded to a
# 50-doc slice: UDTF rows cross the JVM/Python boundary, so the
# declared contract is "small expansion sets"; bulk expansion belongs
# to mapInPandas (multimodal.sample_frames).
# --------------------------------------------------------------------------
@query(
    "udtf_token_stats",
    "UDF surface: Arrow Python UDTF emitting each doc's top-3 tokens "
    "(count desc, token asc) — lateral-join expansion, SQL-oracled",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents WHERE doc_id < 50
    ),
    counts AS (
      SELECT doc_id, token, CAST(count(*) AS BIGINT) AS n
      FROM toks WHERE token <> '' GROUP BY 1, 2
    )
    SELECT doc_id, token, n FROM (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY n DESC, token) AS rn
      FROM counts
    ) WHERE rn <= 3
    """,
)
def udtf_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="token string, n bigint", useArrow=True)
    class TopTokens:
        def eval(self, text: str):
            if not text:
                return
            counts: dict[str, int] = {}
            for t in text.split(" "):
                if t:
                    counts[t] = counts.get(t, 0) + 1
            ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            for token, n in ranked[:3]:
                yield token, n

    spark.udtf.register("top_tokens", TopTokens)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    docs.select("doc_id", "text").createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, t.token, t.n "
        "FROM udtf_docs d, LATERAL top_tokens(d.text) t"
    )


# --------------------------------------------------------------------------
# Calendar-edge arithmetic: the month-boundary semantics that corrupt
# billing pipelines when engines disagree — month addition CLAMPS to
# the target month's last day (Jan 31 + 1 month = Feb 29 in 2024, in
# both Spark's add_months and DuckDB's INTERVAL addition; verified),
# last_day, quarter truncation, day-of-year. Distinct event dates in,
# one row per date.
# --------------------------------------------------------------------------
@query(
    "calendar_edge_suite",
    "datetime: month-boundary clamping (add_months), last_day, "
    "quarter truncation, day-of-year over event dates",
    oracle="""
    SELECT DISTINCT CAST(ts AS DATE) AS d,
           CAST(CAST(ts AS DATE) + INTERVAL 1 MONTH AS DATE)
             AS plus_month,
           last_day(CAST(ts AS DATE)) AS month_end,
           CAST(date_trunc('quarter', CAST(ts AS DATE)) AS DATE)
             AS quarter_start,
           CAST(dayofyear(CAST(ts AS DATE)) AS BIGINT) AS doy
    FROM events
    """,
)
def calendar_edge_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")
    return ev.select(
        d.alias("d"),
        F.add_months(d, 1).alias("plus_month"),
        F.last_day(d).alias("month_end"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
        F.dayofyear(d).cast("bigint").alias("doy"),
    ).distinct()


# --------------------------------------------------------------------------
# Local-timezone reporting view (+07:00): the reference's domain is
# Vietnam air quality — its raw timestamps carry +07:00 offsets and
# its marts report in local time (reference
# glue_jobs/process_openaq_raw.py datetime parse + partition columns).
# Fixed-offset conversion is interval arithmetic (engine-exact, unlike
# named-zone DST rules); local day rollup shifts events near midnight
# UTC into the neighboring local day.
# --------------------------------------------------------------------------
@query(
    "local_tz_daily_rollup",
    "datetime: +07:00 local-time daily rollup — fixed-offset interval "
    "arithmetic, UTC day vs local day drift counted",
    oracle="""
    SELECT CAST(ts + INTERVAL 7 HOUR AS DATE) AS local_day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN CAST(ts + INTERVAL 7 HOUR AS DATE)
                          <> CAST(ts AS DATE) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shifted_from_utc_day
    FROM events GROUP BY 1
    """,
)
def local_tz_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    local = (F.col("ts") + F.expr("INTERVAL 7 HOURS")).cast("date")
    return (
        ev.groupBy(local.alias("local_day"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(local != F.col("ts").cast("date"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_shifted_from_utc_day"),
        )
    )
