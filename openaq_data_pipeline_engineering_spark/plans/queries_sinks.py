"""Declared-query witnesses for the SINK operators (reference S6-S10,
S1/S2) — write→read-back roundtrips whose final aggregate is oracle-
checkable against the ORIGINAL source tables.

Sinks produce no result set, so their correctness witness is the
roundtrip: write the engine's output to a scratch directory with the
production sink code path, read it back cold (explicit schema, vanilla
reader), and aggregate. The DuckDB oracle computes the same aggregate
directly from the source table — any row lost/duplicated/mangled by the
sink or the read-back breaks the value hash.

Coverage map:
- sink_roundtrip_mart     S6 partitioned-parquet sink + S8 Hive layout
                          (plans/mart.write_mart; reference
                          process_openaq_raw.py:249-256)
- sink_roundtrip_ndjson   S7 NDJSON sink + S1/S2 recursive NDJSON scan
                          (sources/json_source.write_ndjson/read_ndjson;
                          reference s3_uploader.py:57-150)
- sink_roundtrip_archive  S9 wrapped-JSON archive sink
                          (json_source.write_wrapped_archive; reference
                          pipelines/openaq_pipeline.py:148-165)
- sink_catalog_roundtrip  S10 catalog registration + partition recovery
                          + partition-pruned SQL over the registered
                          table (sources/catalog.register_partitioned_
                          table; reference utils/glue_utils.py:24-55)
- observe_stage_metrics   A3 single-pass pipeline metrics via observe
                          (operators/validate.observe_counts; reference
                          process_openaq_raw.py:101,137,161,200 eager
                          count() stages) — the Observation values ARE
                          the result set, so the metrics themselves are
                          value-hash-checked

Scratch dirs come from ``scratch.fresh_scratch_dir`` — deterministic
per-process paths wiped on every invocation, so repeated runs overwrite
in place instead of accumulating temp copies; data volumes are one
mart / one dimension slice, so the write cost is bounded at any SF the
harness runs.

Float policy per plans/registry.py: aggregates are BIGINT counts/sums,
DECIMAL-grid money sums, or dates — nothing hash-fragile.
"""

from __future__ import annotations

from openaq_data_pipeline_engineering_spark.localrel import local_rows

import os

from openaq_data_pipeline_engineering_spark.scratch import fresh_scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openaq_data_pipeline_engineering_spark.plans.mart import MartConfig, build_mart, write_mart
from openaq_data_pipeline_engineering_spark.plans.queries_mart import EVENT_TYPES
from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.catalog import (
    register_partitioned_table,
)
from openaq_data_pipeline_engineering_spark.sources.json_source import (
    read_ndjson,
    write_ndjson,
    write_wrapped_archive,
)
from openaq_data_pipeline_engineering_spark.sources.star import load_table


def _wide_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship long→wide mart (same config as mart_wide_pipeline)."""
    ev = load_table(spark, sf_dir, "events")
    cfg = MartConfig(
        key="user_id",
        ts="ts",
        parameter="event_type",
        value="value",
        parameters=list(EVENT_TYPES),
        metadata={},
        fills={},
        tiebreaker=["value", "event_id"],
        ts_is_string=False,
        value_decimals=2,
    )
    return build_mart(ev, cfg).select(
        "user_id", "ts", "year", "month", "day", *EVENT_TYPES
    )


# The mart aggregate below is dedup/pivot-value-invariant by design
# (counts of groups and presence flags), so the oracle states the same
# truth directly over `events`: one mart row per distinct (user_id, ts);
# a pivot cell is non-null iff the (user_id, ts) group saw that type.
# Value-level pivot parity is already proven by mart_wide_pipeline.
_MART_AGG_ORACLE = """
    WITH mart AS (
        SELECT user_id, ts,
               CAST(year(ts) AS VARCHAR) AS year,
               lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS month,
               lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS day,
               max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
               max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
        FROM events
        GROUP BY user_id, ts, year, month, day
    )
    SELECT year, month, day,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(has_click) AS BIGINT) AS n_click,
           CAST(sum(has_purchase) AS BIGINT) AS n_purchase,
           CAST(sum(user_id) AS BIGINT) AS sum_uid
    FROM mart
    GROUP BY year, month, day
"""


@query(
    "sink_roundtrip_mart",
    "S6/S8 witness: write the wide mart via write_mart (repartition by "
    "Hive partition cols, partitionBy year/month/day, sorted row "
    "groups), read the directory back cold with a pinned schema, "
    "aggregate per partition — oracle computes the same truth from the "
    "source events table",
    oracle=_MART_AGG_ORACLE,
)
def sink_roundtrip_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = _wide_mart(spark, sf_dir)
    out = os.path.join(fresh_scratch_dir("sink_mart"), "mart")
    write_mart(wide, out)
    # Cold read-back: pinned schema keeps the Hive partition values as
    # the writer's zero-padded strings (inference would coerce '01'→1).
    back = spark.read.schema(wide.schema).parquet(out)
    return back.groupBy("year", "month", "day").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("click").alias("n_click"),
        F.count("purchase").alias("n_purchase"),
        F.sum("user_id").cast("bigint").alias("sum_uid"),
    )


@query(
    "sink_roundtrip_ndjson",
    "S7+S1/S2 witness: two order slices written as NDJSON into sibling "
    "subdirectories, read back through the recursive raw-zone scan with "
    "the explicit schema, re-aggregated — oracle aggregates the source "
    "orders table directly",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS total_price,
           min(o_orderdate) AS first_date,
           max(o_orderdate) AS last_date
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def sink_roundtrip_ndjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    root = fresh_scratch_dir("sink_ndjson")
    # two drops in nested dirs — the aq_raw/YYYY/MM/DD layout shape
    write_ndjson(o.filter(F.col("o_orderkey") % 2 == 0), f"{root}/d1/h1")
    write_ndjson(o.filter(F.col("o_orderkey") % 2 == 1), f"{root}/d2/h2")
    back = read_ndjson(spark, root, schema=o.schema, recursive=True)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("total_price"),
        F.min("o_orderdate").alias("first_date"),
        F.max("o_orderdate").alias("last_date"),
    )


@query(
    "sink_roundtrip_archive",
    "S9 witness: purchase events written as the wrapped-JSON archive "
    "(meta struct + one-record results array per line), read back with "
    "an explicit nested schema, exploded and re-aggregated — oracle "
    "aggregates the source events slice",
    oracle="""
    SELECT 'archive-v1' AS source,
           CAST(count(*) AS BIGINT) AS n_records,
           CAST(sum(user_id) AS BIGINT) AS sum_uid,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
               AS milli_value
    FROM events
    WHERE event_type = 'purchase'
    """,
)
def sink_roundtrip_archive(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    sel = ev.select("event_id", "user_id", "value")
    root = fresh_scratch_dir("sink_archive")
    write_wrapped_archive(sel, root, meta={"source": "archive-v1"})
    schema = T.StructType(
        [
            T.StructField(
                "meta",
                T.StructType([T.StructField("source", T.StringType())]),
            ),
            T.StructField("results", T.ArrayType(sel.schema)),
        ]
    )
    rec = (
        spark.read.schema(schema)
        .json(root)
        .select(
            F.col("meta.source").alias("source"),
            F.explode("results").alias("r"),
        )
    )
    return rec.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum("r.user_id").cast("bigint").alias("sum_uid"),
        F.sum(F.floor(F.col("r.value") * 1000).cast("bigint"))
        .cast("bigint")
        .alias("milli_value"),
    )


@query(
    "sink_catalog_roundtrip",
    "S10 witness: write the partitioned mart, register it as an "
    "external catalog table (declared schema + RECOVER PARTITIONS), "
    "then answer a partition-pruned SQL aggregate through the catalog "
    "name — oracle computes the same truth from the source events",
    oracle="""
    WITH mart AS (
        SELECT DISTINCT user_id, ts,
               lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS month
        FROM events
    )
    SELECT month,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(user_id) AS BIGINT) AS sum_uid
    FROM mart
    WHERE month = '01'
    GROUP BY month
    """,
)
def sink_catalog_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = _wide_mart(spark, sf_dir)
    out = os.path.join(fresh_scratch_dir("sink_cat"), "mart")
    write_mart(wide, out)
    register_partitioned_table(
        spark,
        "openaq_sink_mart_cat",
        out,
        partition_cols=["year", "month", "day"],
        sample=wide,
    )
    return spark.sql(
        """
        SELECT month,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(user_id) AS BIGINT) AS sum_uid
        FROM `openaq_sink_mart_cat`
        WHERE month = '01'
        GROUP BY month
        """
    )


@query(
    "observe_stage_metrics",
    "A3 witness: two pipeline stages instrumented with observe (row "
    "count + derived-null count at ingest, row count after the value "
    "gate), ONE noop action drives the whole chain, and the Observation "
    "payloads themselves form the result row — zero extra scans, the "
    "engine's replacement for the reference's four eager count() jobs",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS ingested,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                AS BIGINT) AS click_nulls,
           CAST(sum(CASE WHEN value >= 0.5 THEN 1 ELSE 0 END)
                AS BIGINT) AS gated
    FROM events
    """,
)
def observe_stage_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.validate import (
        observe_counts,
    )

    ev = load_table(spark, sf_dir, "events").withColumn(
        "maybe_click", F.expr("nullif(event_type, 'click')")
    )
    ingested, obs_ingest = observe_counts(
        ev, "ingest", null_check_cols=["maybe_click"]
    )
    gated, obs_gate = observe_counts(
        ingested.filter(F.col("value") >= 0.5), "gate"
    )
    # One action drives both observations (metrics ride the same job).
    gated.write.format("noop").mode("overwrite").save()
    m_in, m_gate = obs_ingest.get, obs_gate.get
    return local_rows(spark, 
        [
            (
                int(m_in["row_count"]),
                int(m_in["maybe_click_nulls"]),
                int(m_gate["row_count"]),
            )
        ],
        "ingested bigint, click_nulls bigint, gated bigint",
    )
