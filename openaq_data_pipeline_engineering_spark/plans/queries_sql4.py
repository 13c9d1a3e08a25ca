"""Declared queries: modern Spark SQL surface — recursive CTEs, pipe
syntax, and the VARIANT semi-structured type.

The reference executes its SQL through Athena (utils/athena_utils.py:
38-175); this engine's equivalent surface is `spark.sql`, and these
queries pin the Spark-4 extensions of that surface the reference's
users would gain by switching: WITH RECURSIVE (hierarchical rollups
Athena expresses with bounded self-join chains), the |> pipe operator
chain, and VARIANT (`parse_json`/`variant_get`) for schema-on-read
JSON columns.

All three run through the same SQL executor path as S11
(engine.Engine.sql); views are registered from the star loader so
scans keep pruned schemas and pushed filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import load_table


def _view(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# --------------------------------------------------------------------------
# Recursive CTE: hierarchical rollup over the implicit decimal-digit
# tree on part keys (parent(k) = k div 10 — every parent key exists
# because keys are contiguous). The BFS carries (root, depth) down the
# tree; the rollup is the depth histogram. Recursion depth is
# log10(|part|) ~ 4..7, far inside cteRecursionLevelLimit (100).
#
# Scale shape: each recursion level is one equi-join of the frontier
# against the part table on the parent key — the same bounded
# self-join chain a non-recursive engine would write by hand, but
# driven by the engine until the frontier empties.
# --------------------------------------------------------------------------
@query(
    "sql_recursive_hierarchy",
    "SQL surface: WITH RECURSIVE tree walk (root/depth) + depth rollup",
    oracle="""
    WITH RECURSIVE h(partkey, root, depth) AS (
        SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 10
        UNION ALL
        SELECT p.p_partkey, h.root, h.depth + 1
        FROM part p JOIN h ON p.p_partkey // 10 = h.partkey
        WHERE p.p_partkey >= 10
    )
    SELECT depth,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT root) AS BIGINT) AS n_roots
    FROM h GROUP BY depth
    """,
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "part")
    return spark.sql(
        """
        WITH RECURSIVE h(partkey, root, depth) AS (
            SELECT p_partkey, p_partkey, 0 FROM part WHERE p_partkey < 10
            UNION ALL
            SELECT p.p_partkey, h.root, h.depth + 1
            FROM part p JOIN h ON p.p_partkey div 10 = h.partkey
            WHERE p.p_partkey >= 10
        )
        SELECT depth,
               count(*) AS n,
               count(DISTINCT root) AS n_roots
        FROM h GROUP BY depth
        """
    )


# --------------------------------------------------------------------------
# SQL pipe syntax: the linear |> form of a filter -> aggregate ->
# order chain. Catalyst compiles it to the identical plan as the
# nested form — the oracle IS that nested form.
# --------------------------------------------------------------------------
@query(
    "sql_pipe_surface",
    "SQL surface: |> pipe-operator chain (WHERE |> AGGREGATE |> ORDER BY)",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
)
def sql_pipe_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
        FROM orders
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n,
                     CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                         AS total
           GROUP BY o_orderpriority
        """
    )


# --------------------------------------------------------------------------
# VARIANT: schema-on-read over the JSON props column — parse once,
# extract typed paths with variant_get (no user-supplied struct schema,
# unlike from_json in json_props_extract). Missing paths yield NULL,
# not an error, which is the schema-drift behavior a 100 TB ingest
# needs.
# --------------------------------------------------------------------------
@query(
    "variant_extract",
    "VARIANT type: parse_json(props) -> variant_get typed paths + drift nulls",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER))
                AS BIGINT) AS sum_k,
           CAST(sum(CASE WHEN json_extract_string(props, '$.absent') IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_drift
    FROM events
    GROUP BY event_type
    """,
)
def variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_type",
            F.try_variant_get(v, "$.k", "int").alias("k"),
            F.try_variant_get(v, "$.absent", "string").alias("absent"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.sum(F.when(F.col("absent").isNull(), 1).otherwise(0)).alias(
                "n_drift"
            ),
        )
    )


# --------------------------------------------------------------------------
# LATERAL correlated subquery: greatest-n-per-group in its SQL form.
# Catalyst rewrites the correlated LIMIT subquery into the same
# rank-window plan the DataFrame API writes by hand (dedup_window /
# knn_join_top3) — this pins the SQL spelling of that pattern.
# --------------------------------------------------------------------------
@query(
    "sql_lateral_topk",
    "SQL surface: LATERAL (ORDER BY ... LIMIT 2) top-2 customers per nation",
    oracle="""
    SELECT n.n_nationkey, n.n_name, top.c_custkey, top.c_acctbal
    FROM nation n,
    LATERAL (SELECT c_custkey, c_acctbal FROM customer c
             WHERE c.c_nationkey = n.n_nationkey
             ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
    """,
)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "nation", "customer")
    return spark.sql(
        """
        SELECT n.n_nationkey, n.n_name, top.c_custkey, top.c_acctbal
        FROM nation n,
        LATERAL (SELECT c_custkey, c_acctbal FROM customer c
                 WHERE c.c_nationkey = n.n_nationkey
                 ORDER BY c_acctbal DESC, c_custkey LIMIT 2) top
        """
    )


# --------------------------------------------------------------------------
# Parameterized SQL (named markers, injection-safe): the S11 executor
# surface a multi-tenant pipeline should use instead of string
# interpolation. Values bind as literals AFTER parsing, so the plan is
# identical to the inlined form — which is exactly what the oracle
# states.
# --------------------------------------------------------------------------
@query(
    "sql_parameterized",
    "SQL surface: named-parameter markers (:min_bal, :nations) bound "
    "injection-safe",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n,
           min(c_custkey) AS first_key
    FROM customer
    WHERE c_acctbal > 1000.0 AND c_nationkey IN (3, 7)
    GROUP BY c_mktsegment
    """,
)
def sql_parameterized(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_mktsegment,
               count(*) AS n,
               min(c_custkey) AS first_key
        FROM customer
        WHERE c_acctbal > :min_bal AND c_nationkey IN (:n1, :n2)
        GROUP BY c_mktsegment
        """,
        args={"min_bal": 1000.0, "n1": 3, "n2": 7},
    )


# --------------------------------------------------------------------------
# ANSI-safe arithmetic: the engine runs with ANSI mode ON (Spark 4
# default — overflow/bad-cast/div-by-zero THROW), so coercing paths
# must opt in explicitly via try_* — which is the shape this query
# pins: div-by-zero -> NULL, malformed parse -> NULL, and counts of
# rescued rows.
# --------------------------------------------------------------------------
@query(
    "ansi_safe_arithmetic",
    "ANSI surface: try_divide/try_cast rescue nulls instead of throwing "
    "(div-by-zero + malformed parse counts)",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE CAST(floor(o_totalprice * 100
                         / (o_orderkey % 7)) AS BIGINT) END)
                AS BIGINT) AS safe_ratio_cents,
           CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_div_zero,
           CAST(sum(CASE WHEN try_cast(o_orderpriority AS INTEGER) IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_unparseable
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def ansi_safe_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    denom = F.col("o_orderkey") % 7
    safe = F.floor(
        F.try_divide(F.col("o_totalprice") * 100, denom)
    ).cast("bigint")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(safe).alias("safe_ratio_cents"),
        F.sum((denom == 0).cast("bigint")).alias("n_div_zero"),
        F.sum(
            F.try_to_number(F.col("o_orderpriority"), F.lit("99"))
            .isNull()
            .cast("bigint")
        ).alias("n_unparseable"),
    )


# --------------------------------------------------------------------------
# Collations (Spark 4): case-insensitive comparison as a COLUMN
# property (COLLATE UTF8_LCASE) instead of lower() call sites. The
# oracle replays with explicit lower() — which is exactly the
# equivalence the collation encapsulates.
# --------------------------------------------------------------------------
@query(
    "collation_compare",
    "SQL surface: UTF8_LCASE collation equality/grouping vs explicit "
    "lower() semantics",
    oracle="""
    SELECT lower(p_brand) AS brand_ci,
           count(*) AS n,
           CAST(count(DISTINCT p_type) AS BIGINT) AS n_types
    FROM part
    GROUP BY brand_ci
    """,
)
def collation_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "part")
    return spark.sql(
        """
        SELECT lower(brand_ci) AS brand_ci, n, n_types FROM (
          SELECT p_brand COLLATE UTF8_LCASE AS brand_ci,
                 count(*) AS n,
                 count(DISTINCT p_type) AS n_types
          FROM part
          GROUP BY p_brand COLLATE UTF8_LCASE
        )
        """
    )


# --------------------------------------------------------------------------
# SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN):
# the declarative UDF path — the body is a SQL expression, so Catalyst
# INLINES it into the plan (full codegen, pushdown through it), unlike
# Python UDFs which are execution barriers. This is the engine's
# recommended extension point for row-level logic that SQL can express
# (the AQI bucketing of operators/aqi.py is the same philosophy in
# DataFrame form). The oracle inlines the identical CASE by hand.
# --------------------------------------------------------------------------
@query(
    "sql_scalar_function",
    "SQL surface: CREATE FUNCTION (SQL-bodied scalar UDF, inlined by "
    "Catalyst) bucketing event values; per-bucket rollup",
    oracle="""
    SELECT CASE WHEN value < 10 THEN 'low'
                WHEN value < 100 THEN 'mid'
                ELSE 'high' END AS bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM events GROUP BY 1
    """,
)
def sql_scalar_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "events")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION value_bucket(v DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN v < 10 THEN 'low'
                    WHEN v < 100 THEN 'mid'
                    ELSE 'high' END
        """
    )
    return spark.sql(
        """
        SELECT value_bucket(value) AS bucket,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events GROUP BY 1
        """
    )


# --------------------------------------------------------------------------
# SQL scripting (Spark 4 compound statements): DECLARE/SET variables +
# control flow executed server-side — the procedural surface Athena
# users emulate with client-side Python between queries (reference
# utils/athena_utils.py polls + parametrizes from Python). The mean
# threshold is computed DECIMAL-exact so the oracle's inline form
# hash-matches.
# --------------------------------------------------------------------------
@query(
    "sql_scripting_surface",
    "SQL surface: scripting block (DECLARE/SET + dependent statement) "
    "— above-mean event counts per type",
    oracle="""
    WITH thr AS (
      SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*)
        AS t
      FROM events
    )
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_above
    FROM events, thr WHERE value > thr.t
    GROUP BY event_type
    """,
)
def sql_scripting_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "events")
    spark.conf.set("spark.sql.scripting.enabled", "true")
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE;
          SET thr = (
            SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*)
            FROM events);
          SELECT event_type, count(*) AS n_above
          FROM events WHERE value > thr
          GROUP BY event_type;
        END
        """
    )


# --------------------------------------------------------------------------
# IDENTIFIER() clause + EXECUTE IMMEDIATE (Spark 4): injection-safe
# DYNAMIC SQL — table/column names bound through IDENTIFIER() and
# statements composed at runtime with parameter markers, the two
# facilities that replace string-concatenated SQL (the reference
# formats Athena query strings by hand: utils/athena_utils.py).
# --------------------------------------------------------------------------
@query(
    "sql_dynamic_identifier",
    "SQL surface: IDENTIFIER() dynamic table/column binding + EXECUTE "
    "IMMEDIATE with a parameter marker — injection-safe dynamic SQL",
    oracle="""
    SELECT o_orderpriority AS grp, CAST(count(*) AS BIGINT) AS n
    FROM orders WHERE o_totalprice > 100000
    GROUP BY 1
    """,
)
def sql_dynamic_identifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders")
    # dynamic identifiers bound as VALUES, not spliced into the string
    stmt = (
        "SELECT IDENTIFIER(:gcol) AS grp, count(*) AS n "
        "FROM IDENTIFIER(:tbl) WHERE o_totalprice > :thr "
        "GROUP BY 1"
    )
    return spark.sql(
        "EXECUTE IMMEDIATE :stmt USING :gcol AS gcol, :tbl AS tbl, "
        ":thr AS thr",
        args={
            "stmt": stmt,
            "gcol": "o_orderpriority",
            "tbl": "orders",
            "thr": 100000,
        },
    )


# --------------------------------------------------------------------------
# EWMA smoothing via WITH RECURSIVE: the inherently SEQUENTIAL
# time-series transform (each value depends on the previous smoothed
# value) expressed as a recursive CTE over the weekly rollup — depth =
# #periods, per-step work = |event types| rows. Integer milli-units
# with truncating division keep every step engine-exact (alpha = 1/8:
# s_t = (7*s_{t-1} + 1000*x_t) div 8). At 100 TB the recursion runs on
# the rollup table (tiny); only the first rollup touches raw data.
# Each recursion level is one Spark job, so period count is the
# latency knob (weekly here: 5 levels; the daily variant measured
# ~20 s at 30 levels from per-iteration overhead alone).
# --------------------------------------------------------------------------
@query(
    "ewma_recursive_smoothing",
    "time series: EWMA (alpha=1/8) of weekly counts via recursive CTE "
    "— integer milli-units, sequential dependency expressed in SQL",
    oracle="""
    WITH RECURSIVE wk AS (
      SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS d,
             count(*) AS n
      FROM events GROUP BY 1, 2
    ),
    weekly AS (
      SELECT event_type, d, n,
             row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
      FROM wk
    ),
    ew(event_type, i, d, n, s_milli) AS (
      SELECT event_type, i, d, n, n * 1000
      FROM weekly WHERE i = 1
      UNION ALL
      SELECT x.event_type, x.i, x.d, x.n,
             (7 * e.s_milli + 1000 * x.n) // 8
      FROM weekly x JOIN ew e
        ON x.event_type = e.event_type AND x.i = e.i + 1
    )
    SELECT event_type, d, CAST(n AS BIGINT) AS n,
           CAST(s_milli AS BIGINT) AS ewma_milli
    FROM ew
    """,
)
def ewma_recursive_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "events")
    # Materialize the weekly rollup ONCE before the recursion: a CTE
    # referenced inside the recursive step is re-executed at EVERY
    # level (the 5-level run planned 54 jobs — each level re-ran the
    # events scan + aggregate + window). Checkpointing the tiny
    # (|types| × |weeks|) rollup behind a temp view makes each level
    # one join against a local relation; the WITH RECURSIVE surface
    # and every output value are unchanged.
    spark.sql(
        """
        SELECT event_type, d, n,
               row_number() OVER (PARTITION BY event_type ORDER BY d) AS i
        FROM (
          SELECT event_type, CAST(date_trunc('week', ts) AS DATE) AS d,
                 count(*) AS n
          FROM events GROUP BY 1, 2
        )
        """
    ).localCheckpoint(eager=True).createOrReplaceTempView("ewma_weekly")
    return spark.sql(
        """
        WITH RECURSIVE ew(event_type, i, d, n, s_milli) AS (
          SELECT event_type, i, d, n, n * 1000L
          FROM ewma_weekly WHERE i = 1
          UNION ALL
          SELECT x.event_type, x.i, x.d, x.n,
                 (7 * e.s_milli + 1000 * x.n) div 8
          FROM ewma_weekly x JOIN ew e
            ON x.event_type = e.event_type AND x.i = e.i + 1
        )
        SELECT event_type, d, n, s_milli AS ewma_milli
        FROM ew
        """
    )


# --------------------------------------------------------------------------
# SQL PIVOT / UNPIVOT clauses (Spark 4 native syntax): the declarative
# wide<->long reshapes as SQL clauses rather than stack()/pivot() API
# calls (events_unpivot covers the function form). Pivot on the fixed
# event-type list (explicit IN list — no distinct-scan pre-job), then
# UNPIVOT back; the roundtrip must reproduce the per-(user, type)
# counts, which is what the oracle states directly.
# --------------------------------------------------------------------------
@query(
    "sql_pivot_unpivot_roundtrip",
    "SQL surface: native PIVOT (explicit IN list) then UNPIVOT clause "
    "roundtrip — per-user per-type counts survive the reshape",
    oracle="""
    SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
    """,
)
def sql_pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH wide AS (
          SELECT * FROM (SELECT user_id, event_type FROM events)
          PIVOT (count(*) FOR event_type IN
                 ('click', 'error', 'purchase', 'signup', 'view'))
        )
        SELECT user_id, event_type, n FROM wide
        UNPIVOT (n FOR event_type IN
                 (click, error, purchase, signup, view))
        """
    )


# --------------------------------------------------------------------------
# GROUP BY ALL / ORDER BY ALL (Spark 4, DuckDB-originated syntax):
# every non-aggregate select item groups implicitly — the
# typo-proof form of multi-column rollups.
# --------------------------------------------------------------------------
@query(
    "sql_group_by_all",
    "SQL surface: GROUP BY ALL + ORDER BY ALL shorthand — per-type "
    "daily rollup without repeated column lists",
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS d,
           CAST(count(*) AS BIGINT) AS n
    FROM events GROUP BY ALL ORDER BY ALL
    """,
)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "events")
    return spark.sql(
        "SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS n "
        "FROM events GROUP BY ALL ORDER BY ALL"
    )
