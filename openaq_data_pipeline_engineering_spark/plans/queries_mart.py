"""The full mart pipeline (reference Glue job, SURVEY §3.2) as a declared
query: parse → partition cols → deterministic window-dedup → pivot(mean)
→ wide mart, run on `events` standing in for the long measurements fact
(FIXTURES.md §4 mapping: user_id≅location_id, ts≅datetime,
event_type≅parameter).

The oracle replicates the exact chain in ANSI SQL (row_number dedup +
conditional-avg pivot), proving end-to-end parity of the engine's flagship
pipeline, not just of individual operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.dedup import dedup_first
from openaq_data_pipeline_engineering_spark.plans.mart import MartConfig, build_mart
from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import load_table

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_MART_ORACLE = """
    WITH ranked AS (
        SELECT user_id, ts, event_type, value,
               CAST(year(ts) AS VARCHAR) AS year,
               lpad(CAST(month(ts) AS VARCHAR), 2, '0') AS month,
               lpad(CAST(day(ts) AS VARCHAR), 2, '0') AS day,
               row_number() OVER (
                   PARTITION BY user_id, ts, event_type
                   ORDER BY value, event_id
               ) AS rn
        FROM events
    ), dedup AS (
        SELECT * FROM ranked WHERE rn = 1
    )
    SELECT user_id, ts, year, month, day,
""" + ",\n".join(
    f"           CASE WHEN count(CASE WHEN event_type = '{t}' THEN 1 END) > 0 THEN"
    f" round(sum(CASE WHEN event_type = '{t}' THEN value END), 2)"
    f" / count(CASE WHEN event_type = '{t}' THEN 1 END) END AS {t}"
    for t in EVENT_TYPES
) + """
    FROM dedup
    GROUP BY user_id, ts, year, month, day
"""


@query(
    "mart_wide_pipeline",
    "S1→P1→P2→W1→A1 composed: the reference Glue job's full long→wide mart chain",
    oracle=_MART_ORACLE,
)
def mart_wide_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cfg = MartConfig(
        key="user_id",
        ts="ts",
        parameter="event_type",
        value="value",
        parameters=list(EVENT_TYPES),
        metadata={},       # events carries no location metadata; enrichment
        fills={},          # parity is proven by enrich_broadcast_join + tests
        tiebreaker=["value", "event_id"],
        ts_is_string=False,
        value_decimals=2,
    )
    wide = build_mart(ev, cfg)
    return wide.select("user_id", "ts", "year", "month", "day", *EVENT_TYPES)


@query(
    "dim_extract_dedup",
    "J3/A2: dimension extraction with deterministic survivor (first order per customer)",
    oracle="""
    SELECT o_custkey, o_orderkey AS first_orderkey, o_orderdate AS first_orderdate,
           o_totalprice AS first_totalprice
    FROM (
        SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
               row_number() OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ) AS rn
        FROM orders
    ) WHERE rn = 1
    """,
)
def dim_extract_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # o_orderkey is unique (orders PK) -> the tiebreak is total; the
    # struct-min path replaces the window's reduce-side sort (r13).
    first = dedup_first(
        o,
        keys=["o_custkey"],
        tiebreaker=["o_orderdate", "o_orderkey"],
        total_tiebreaker=True,
    )
    return first.select(
        "o_custkey",
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_orderdate").alias("first_orderdate"),
        F.col("o_totalprice").alias("first_totalprice"),
    )
