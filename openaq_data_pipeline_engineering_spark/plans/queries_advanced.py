"""Advanced analytics queries beyond the reference's surface: as-of
join, sessionization, rollup/cube reports, AQI statistics (the
reference's planned A12), IVF-style ANN, and Pandas-UDF feature
extraction — each with a DuckDB oracle mirror.

These are the engine-capability extensions SURVEY §7.1 declares for the
100 TB training-pipeline north star; the reference itself has none of
them (its only join is a small-dim equi-join, SURVEY §2.3; its only
window is row_number, §2.5).
"""

from __future__ import annotations

from openaq_data_pipeline_engineering_spark.localrel import local_rows

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.functions.vectors import cosine
from openaq_data_pipeline_engineering_spark.operators.asof import asof_join
from openaq_data_pipeline_engineering_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    with_binary_payload,
)
from openaq_data_pipeline_engineering_spark.operators.sessionize import session_stats
from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import fan_out, load_table


# --------------------------------------------------------------------------
# As-of (point-in-time) join: for each 'error' event, the user's most
# recent prior-or-simultaneous 'click' value. Union + carry-forward
# window — one shuffle, no pair explosion (operators/asof.py).
# --------------------------------------------------------------------------
@query(
    "asof_join_lastclick",
    "as-of join: latest click value at-or-before each error event, per user",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'click'
    ), e AS (
        SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'error'
    )
    SELECT e.user_id, e.ts, e.event_id, e.value,
           (SELECT c.value FROM c
            WHERE c.user_id = e.user_id AND c.ts <= e.ts
            ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS value_asof
    FROM e
    """,
)
def asof_join_lastclick(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(
        probes=errors,
        quotes=clicks,
        on=["user_id"],
        ts_col="ts",
        value_cols=["value"],
        tiebreaker="event_id",
    )


# --------------------------------------------------------------------------
# Gap-based sessionization (30-minute inactivity gap)
# --------------------------------------------------------------------------
@query(
    "sessionization",
    "gap-based sessions: per-user 30min-gap session index + per-session stats",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts,
               CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                         OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
        SELECT user_id, ts,
               CAST(sum(new_s) OVER (
                   PARTITION BY user_id ORDER BY ts, new_s DESC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_idx
        FROM flagged
    )
    SELECT user_id, session_idx,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           (epoch_us(max(ts)) - epoch_us(min(ts))) / 1000000.0 AS duration_s
    FROM sess GROUP BY user_id, session_idx
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return session_stats(
        ev, key="user_id", ts_col="ts", gap_seconds=1800, order_tiebreaker="event_id"
    )


# --------------------------------------------------------------------------
# ROLLUP report (hierarchical totals) — grouping-set aggregation the
# reference lacks; Spark executes as a single Expand + hash agg.
# --------------------------------------------------------------------------
@query(
    "rollup_report",
    "GROUP BY ROLLUP(event_type, user bucket): subtotals + grand total, grouping id",
    oracle="""
    SELECT event_type,
           user_id % 10 AS user_bucket,
           CAST(grouping(event_type, user_id % 10) AS BIGINT) AS gid,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY ROLLUP(event_type, user_id % 10)
    """,
)
def rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.pmod("user_id", F.lit(10))
    )
    return ev.rollup("event_type", "user_bucket").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "cube_report",
    "GROUP BY CUBE(event_type, lang-of-user bucket): all grouping-set combos",
    oracle="""
    SELECT event_type,
           user_id % 5 AS user_bucket,
           CAST(grouping(event_type, user_id % 5) AS BIGINT) AS gid,
           count(*) AS n,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY CUBE(event_type, user_id % 5)
    """,
)
def cube_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.pmod("user_id", F.lit(5))
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# AQI stats (reference A12, AQI plan:132-137): per-level count/min/max.
# avg deliberately omitted: cross-row float accumulation order differs
# between engines (registry float policy); min/max/count are exact.
# --------------------------------------------------------------------------
def _aqi_stats_oracle() -> str:
    from openaq_data_pipeline_engineering_spark.plans.queries_core import _AQI_ORACLE

    return f"""
    WITH aqi AS ({_AQI_ORACLE})
    SELECT aqi_level, count(*) AS n, count(aqi) AS n_aqi,
           min(aqi) AS min_aqi, max(aqi) AS max_aqi
    FROM aqi GROUP BY aqi_level
    """


@query(
    "aqi_stats",
    "A12: AQI distribution stats per level (count / non-null count / min / max)",
    oracle=_aqi_stats_oracle(),
)
def aqi_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.plans.queries_core import aqi_piecewise

    aqi = aqi_piecewise(spark, sf_dir)
    return aqi.groupBy("aqi_level").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("aqi").alias("n_aqi"),
        F.min("aqi").alias("min_aqi"),
        F.max("aqi").alias("max_aqi"),
    )


# --------------------------------------------------------------------------
# IVF-style ANN: coarse-quantize vectors to fixed centroid cells, then
# search only the probe's cell. The scale path for similarity search —
# per-cell candidate sets replace the O(N²) brute-force scan; centroids
# are broadcast (tiny dim), cell assignment is one map-side pass.
# --------------------------------------------------------------------------
_N_CENT = 8
_PROBE_ID = 8


def _cos_sql(a_vec: str, b_vec: str) -> str:
    return (
        f"list_dot_product({a_vec}::DOUBLE[], {b_vec}::DOUBLE[]) / "
        f"(sqrt(list_dot_product({a_vec}::DOUBLE[], {a_vec}::DOUBLE[])) * "
        f"sqrt(list_dot_product({b_vec}::DOUBLE[], {b_vec}::DOUBLE[])))"
    )


@query(
    "ivf_ann_topk",
    "ANN scale path: IVF coarse quantization (8 fixed centroids) + in-cell top-10",
    oracle=f"""
    WITH cent AS (
        SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < {_N_CENT}
    ), vecs AS (
        SELECT vec_id, embedding FROM embeddings WHERE vec_id >= {_N_CENT}
    ), scored AS (
        SELECT v.vec_id, v.embedding, c.cid,
               round({_cos_sql('v.embedding', 'c.cvec')}, 6) AS ccos
        FROM vecs v CROSS JOIN cent c
    ), assigned AS (
        SELECT vec_id, embedding, cid AS cell FROM (
            SELECT *, row_number() OVER (
                PARTITION BY vec_id ORDER BY ccos DESC, cid
            ) AS rn FROM scored
        ) WHERE rn = 1
    ), q AS (
        SELECT cell AS qcell, embedding AS qvec FROM assigned WHERE vec_id = {_PROBE_ID}
    )
    SELECT a.vec_id, round({_cos_sql('a.embedding', 'q.qvec')}, 6) AS cosine
    FROM assigned a, q
    WHERE a.cell = q.qcell AND a.vec_id <> {_PROBE_ID}
    ORDER BY cosine DESC, a.vec_id LIMIT 10
    """,
)
def ivf_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = fan_out(load_table(spark, sf_dir, "embeddings"))
    cent = emb.filter(F.col("vec_id") < _N_CENT).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    vecs = emb.filter(F.col("vec_id") >= _N_CENT).select("vec_id", "embedding")
    # Loop-invariant norm hoisting (r12, guide §1.2): bit-identical to
    # cosine() — each norm is the same left-fold, computed once per row
    # instead of once per (vector, centroid) pair.
    from openaq_data_pipeline_engineering_spark.functions.vectors import (
        cosine_pre,
        norm,
    )

    scored = (
        vecs.withColumn("_vn", norm("embedding"))
        .join(F.broadcast(cent.withColumn("_cn", norm("cvec"))))
        .withColumn(
            "ccos", F.round(cosine_pre("embedding", "cvec", "_vn", "_cn"), 6)
        )
    )
    # Argmax as one aggregation (partial+final SortAggregate): max of (ccos, -cid) is
    # lexicographically "ccos desc, cid asc" — identical row to the
    # previous row_number window's rank 1, but the broadcast join keeps
    # all centroid copies of a vector map-local, so partial aggregation
    # collapses them before the exchange (k× fewer shuffled rows, no
    # sort).
    assigned = (
        scored.groupBy("vec_id")
        .agg(
            F.any_value("embedding").alias("embedding"),
            F.max(
                F.struct(F.col("ccos"), (-F.col("cid")).alias("ncid"))
            ).alias("_best"),
        )
        .select("vec_id", "embedding", (-F.col("_best.ncid")).alias("cell"))
        # The built IVF index, materialized once (it feeds the probe
        # lookup AND the in-cell scan; re-deriving it re-scans the
        # corpus — exchange reuse does not fire across aliased
        # subtrees on this Spark build). In production this frame IS
        # the persisted index.
        .localCheckpoint(eager=True)
    )
    q = assigned.filter(F.col("vec_id") == _PROBE_ID).select(
        F.col("cell").alias("qcell"), F.col("embedding").alias("qvec")
    )
    return (
        assigned.filter(F.col("vec_id") != _PROBE_ID)
        .join(F.broadcast(q), F.col("cell") == F.col("qcell"))
        .select("vec_id", F.round(cosine("embedding", "qvec"), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# IVF with LEARNED centroids: spherical k-means training (bounded Lloyd
# rounds, operators/kmeans.py) unrolled into one declarative plan, then
# in-cell probe search. The oracle replays the identical deterministic
# training as a generated CTE chain — the INDEX BUILD itself is
# correctness-checked cross-engine, not just the final search.
# --------------------------------------------------------------------------
_KM_K = 8
_KM_ITERS = 2
_KM_DIM = 64  # embeddings.embedding width (TESTDATA.md)
_KM_PROBE = 0


def _kmeans_oracle(k: int, iters: int, dim: int, probe: int) -> str:
    ctes = [
        f"c0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec "
        f"FROM embeddings ORDER BY vec_id LIMIT {k})"
    ]
    prev = "c0"
    for t in range(1, iters + 1):
        ctes.append(
            f"s{t} AS (SELECT v.vec_id, v.embedding, c.cid, "
            f"round({_cos_sql('v.embedding', 'c.cvec')}, 6) AS ccos "
            f"FROM embeddings v CROSS JOIN {prev} c)"
        )
        ctes.append(
            f"a{t} AS (SELECT vec_id, embedding, cid AS cell FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY vec_id "
            f"ORDER BY ccos DESC, cid) AS rn FROM s{t}) WHERE rn = 1)"
        )
        ctes.append(
            f"d{t} AS (SELECT cell, r.i AS pos, "
            f"round(sum(embedding[r.i + 1]::DOUBLE), 6) / count(*) AS m "
            f"FROM a{t}, range({dim}) AS r(i) GROUP BY cell, r.i)"
        )
        ctes.append(
            f"c{t} AS (SELECT cell AS cid, list(m ORDER BY pos) AS cvec "
            f"FROM d{t} GROUP BY cell)"
        )
        prev = f"c{t}"
    cte_block = ",\n         ".join(ctes)
    return f"""
    WITH {cte_block},
    fs AS (SELECT v.vec_id, v.embedding, c.cid,
                  round({_cos_sql('v.embedding', 'c.cvec')}, 6) AS ccos
           FROM embeddings v CROSS JOIN {prev} c),
    fa AS (SELECT vec_id, embedding, cid AS cell FROM (
               SELECT *, row_number() OVER (PARTITION BY vec_id
                   ORDER BY ccos DESC, cid) AS rn FROM fs) WHERE rn = 1),
    q AS (SELECT cell AS qcell, embedding AS qvec FROM fa
          WHERE vec_id = {probe})
    SELECT a.vec_id, round({_cos_sql('a.embedding', 'q.qvec')}, 6) AS cosine
    FROM fa a, q
    WHERE a.cell = q.qcell AND a.vec_id <> {probe}
    ORDER BY cosine DESC, a.vec_id LIMIT 10
    """


@query(
    "kmeans_ivf_topk",
    "ANN: spherical k-means trains 8 IVF centroids (2 Lloyd rounds), in-cell top-10",
    oracle=_kmeans_oracle(_KM_K, _KM_ITERS, _KM_DIM, _KM_PROBE),
)
def kmeans_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.kmeans import (
        assign_cells,
        kmeans_fit,
    )

    emb = fan_out(load_table(spark, sf_dir, "embeddings")).select(
        "vec_id", "embedding"
    )
    cent = kmeans_fit(emb, k=_KM_K, iterations=_KM_ITERS)
    assigned = assign_cells(emb, cent)
    q = assigned.filter(F.col("vec_id") == _KM_PROBE).select(
        F.col("cell").alias("qcell"), F.col("embedding").alias("qvec")
    )
    return (
        assigned.filter(F.col("vec_id") != _KM_PROBE)
        .join(F.broadcast(q), F.col("cell") == F.col("qcell"))
        .select("vec_id", F.round(cosine("embedding", "qvec"), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), "vec_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Multimodal feature extraction through the Arrow/Pandas-UDF path, with
# an exact oracle (md5-derived pseudo-features, operators/multimodal.py)
# --------------------------------------------------------------------------
@query(
    "multimodal_features",
    "mapInPandas feature extraction: md5-derived 8-dim features per payload",
    oracle="""
    SELECT doc_id, """
    + ", ".join(
        f"CAST(concat('0x', substr(md5(text), {4 * i + 1}, 4)) AS INTEGER)"
        f" / 65535.0 AS f{i}"
        for i in range(FEATURE_DIM)
    )
    + """
    FROM documents
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = fan_out(load_table(spark, sf_dir, "documents"))
    return extract_features(with_binary_payload(docs, "text"))


# --------------------------------------------------------------------------
# Skew-mitigation: salted two-phase aggregation. The oracle is the PLAIN
# aggregate — proving the salted plan computes identical results.
# --------------------------------------------------------------------------
@query(
    "salted_skew_agg",
    "skew: salted two-phase aggregation over a 5-value hot key == naive groupBy",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
           min(value) AS min_value, max(value) AS max_value
    FROM events GROUP BY event_type
    """,
)
def salted_skew_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.skew import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        keys=["event_type"],
        aggs={
            "n": ("value", "count"),
            "sum_value": ("value", "sum"),
            "min_value": ("value", "min"),
            "max_value": ("value", "max"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type", "n", F.round("sum_value", 2).alias("sum_value"),
        "min_value", "max_value",
    )


# --------------------------------------------------------------------------
# Range join: events classified into value bands. Small band table ->
# broadcast; the binned variant is the large-x-large scale path
# (operators/rangejoin.py), proven equal by test.
# --------------------------------------------------------------------------
_BANDS_ROWS = [(0.0, 10.0, "low"), (10.0, 25.0, "mid"), (25.0, 50.0, "high"),
               (50.0, 1e9, "extreme")]


@query(
    "range_join_bands",
    "range join: per-band event counts via broadcast interval join [lo, hi)",
    oracle="""
    WITH bands(lo, hi, band) AS (
        VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'),
               (25.0, 50.0, 'high'), (50.0, 1000000000.0, 'extreme')
    )
    SELECT b.band, count(*) AS n, round(sum(e.value), 2) AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def range_join_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.rangejoin import (
        broadcast_range_join,
    )

    ev = load_table(spark, sf_dir, "events")
    bands = local_rows(spark, _BANDS_ROWS, "lo double, hi double, band string")
    joined = broadcast_range_join(ev, bands, value_col="value")
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )


# --------------------------------------------------------------------------
# Multi-way join benchmarks (TPC-H Q3/Q5 shapes): exercise Catalyst join
# ordering + broadcast selection across 3- and 6-table joins. Money sums
# use the decimal-exact pattern (sum in DECIMAL, cast to DOUBLE) so the
# result is accumulation-order-independent and engine-identical.
# --------------------------------------------------------------------------
_REV = (
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)"
)


def _revenue_col() -> F.Column:
    return F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("double")


@query(
    "shipping_priority_q3",
    "TPC-H Q3 shape: customer⋈orders⋈lineitem, revenue top-10 per order",
    oracle=f"""
    SELECT l_orderkey, {_REV} AS revenue, o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10
    """,
)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(_revenue_col().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "local_supplier_volume_q5",
    "TPC-H Q5 shape: 6-table join, revenue by nation within region+year",
    oracle=f"""
    SELECT n_name, {_REV} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        # supplier scales with SF -> no broadcast hint; AQE picks the
        # strategy at runtime (nation/region are fixed-size: hint away)
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(_revenue_col().alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


# --------------------------------------------------------------------------
# Semi-structured JSON column handling (F8-adjacent): typed extraction
# from a JSON string column, then relational ops over the extracted
# value. At scale prefer from_json with an explicit schema once at the
# ingest edge (single parse), which this compiles to.
# --------------------------------------------------------------------------
@query(
    "json_props_extract",
    "JSON column: typed path extraction + aggregation over extracted values",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
               AS sum_k,
           min(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS min_k,
           max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    k = F.from_json("props", T.StructType([T.StructField("k", T.IntegerType())]))["k"]
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q18 shape: group-HAVING over a join, then top-k — the "large
# order" pattern (join + agg + having + ordered limit in one plan).
# --------------------------------------------------------------------------
@query(
    "large_orders_q18",
    "TPC-H Q18 shape: orders whose total lineitem quantity exceeds a threshold",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    GROUP BY o_orderkey, o_orderdate, o_totalprice
    HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 120
    ORDER BY total_qty DESC, o_orderkey LIMIT 20
    """,
)
def large_orders_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    total = F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(total.cast("double").alias("total_qty"))
        .filter(F.col("total_qty") > 120)
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar subquery (per-part average),
# decorrelated Spark-side into an aggregate + equi-join — the rewrite
# Catalyst itself applies to correlated scalar subqueries.
# --------------------------------------------------------------------------
@query(
    "small_quantity_revenue_q17",
    "TPC-H Q17 shape: revenue of lineitems below 50% of their part's avg quantity",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey AS pk,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS avg_qty
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
               AS avg_yearly,
           count(*) AS n
    FROM lineitem JOIN part_avg ON l_partkey = pk
    WHERE l_quantity < 0.5 * avg_qty
    """,
)
def small_quantity_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        li.join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# Set operations beyond union: INTERSECT / EXCEPT between entity slices
# (QA shape: users seen in errors but never in purchases, and both).
# --------------------------------------------------------------------------
@query(
    "intersect_except_users",
    "set ops: users with errors INTERSECT/EXCEPT users with purchases",
    oracle="""
    WITH err AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'error'),
         buy AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
    SELECT 'both' AS cohort, user_id FROM (SELECT user_id FROM err INTERSECT SELECT user_id FROM buy)
    UNION ALL
    SELECT 'error_only' AS cohort, user_id FROM (SELECT user_id FROM err EXCEPT SELECT user_id FROM buy)
    """,
)
def intersect_except_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # Each distinct user set feeds both set operations; materialize
    # once per side so the witness is 2 pruned scans, not 4.
    err = (
        ev.filter(F.col("event_type") == "error")
        .select("user_id").distinct().localCheckpoint(eager=True)
    )
    buy = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id").distinct().localCheckpoint(eager=True)
    )
    both = err.intersect(buy).select(F.lit("both").alias("cohort"), "user_id")
    only = err.exceptAll(buy).select(F.lit("error_only").alias("cohort"), "user_id")
    return both.unionByName(only)


# --------------------------------------------------------------------------
# Exact percentiles (sort-based): verified bit-identical to DuckDB's
# quantile_cont (same linear interpolation over the same doubles).
# --------------------------------------------------------------------------
@query(
    "value_percentiles",
    "exact percentile_cont (p50/p90/p99) per event type",
    oracle="""
    SELECT event_type,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.99) AS p99
    FROM events GROUP BY event_type
    """,
)
def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.9).alias("p90"),
        F.percentile("value", 0.99).alias("p99"),
    )


# --------------------------------------------------------------------------
# Calendar bucketing: date_trunc month rollup (different op from the
# y/m/d partition-column derivation — this is time-dimension analytics).
# --------------------------------------------------------------------------
@query(
    "monthly_activity",
    "date_trunc month rollup: events + distinct users per calendar month",
    oracle="""
    SELECT date_trunc('month', ts) AS month_start,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(sum(value), 2) AS sum_value
    FROM events GROUP BY date_trunc('month', ts)
    """,
)
def monthly_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(F.date_trunc("month", "ts").alias("month_start")).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# TPC-H Q14 shape (promo revenue share): conditional aggregate over a
# fact⋈dim join — covers the `part` dimension. Numerator and denominator
# emitted separately (their ratio divides two cross-engine-identical
# decimal-exact sums; emitting the division is equally safe but keeping
# both aids debugging).
# --------------------------------------------------------------------------
@query(
    "promo_revenue_q14",
    "TPC-H Q14 shape: promo-part revenue share within a shipdate month",
    oracle=f"""
    SELECT
        CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS promo_revenue,
        {_REV} AS total_revenue,
        count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def promo_revenue_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return li.join(part, F.col("l_partkey") == F.col("p_partkey")).agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        _revenue_col().alias("total_revenue"),
        F.count(F.lit(1)).alias("n"),
    )


# --------------------------------------------------------------------------
# Window-function breadth: ranking family beyond row_number/rank
# (ntile, percent_rank, cume_dist, dense_rank) in one windowed pass.
# --------------------------------------------------------------------------
@query(
    "window_rank_suite",
    "window ranking family: dense_rank / ntile / percent_rank / cume_dist",
    oracle="""
    SELECT event_id, user_id,
           dense_rank() OVER w AS drank,
           ntile(4) OVER w AS quartile,
           percent_rank() OVER w AS prank,
           cume_dist() OVER w AS cdist
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
    """,
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("value", "event_id")
    return ev.select(
        "event_id", "user_id",
        F.dense_rank().over(w).alias("drank"),
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query(
    "window_nav_suite",
    "window navigation family: lag / lead / first_value / nth_value "
    "over a total per-user event order",
    oracle="""
    SELECT event_id, user_id,
           lag(value) OVER w AS prev_val,
           lead(value) OVER w AS next_val,
           first_value(value) OVER w AS first_val,
           nth_value(value, 3) OVER w AS third_val
    FROM events
    WHERE user_id < 20
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def window_nav_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        F.lag("value").over(wo).alias("prev_val"),
        F.lead("value").over(wo).alias("next_val"),
        F.first("value").over(w).alias("first_val"),
        F.nth_value("value", 3).over(w).alias("third_val"),
    )


@query(
    "fuzzy_name_pairs",
    "fuzzy matching: blocked Levenshtein pairs over the DISTINCT part-name "
    "domain (block on the noun; edit distance <= 4)",
    # Fuzzy matching runs on the distinct value domain, never the row
    # count: a 100 TB fact collapses to its name vocabulary before any
    # pairwise work, and blocking (shared noun) bounds each bucket.
    # Levenshtein is the standard DP distance in both engines.
    oracle="""
    WITH d AS (SELECT DISTINCT p_name FROM part)
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM d a JOIN d b
      ON split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
     AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) <= 4
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "part").select("p_name").distinct()
    a = d.select(F.col("p_name").alias("name_a"))
    b = d.select(F.col("p_name").alias("name_b"))
    return (
        a.join(
            b,
            (
                F.split_part(F.col("name_a"), F.lit(" "), F.lit(2))
                == F.split_part(F.col("name_b"), F.lit(" "), F.lit(2))
            )
            & (F.col("name_a") < F.col("name_b")),
        )
        # Thresholded levenshtein (banded O(n·k), -1 past the bound —
        # exact for kept pairs; see operators/linkage.py).
        .withColumn(
            "dist", F.levenshtein("name_a", "name_b", 4).cast("bigint")
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= 4))
        .select("name_a", "name_b", "dist")
    )


@query(
    "math_functions_suite",
    "scalar numeric functions over the engine-exact subset: abs / floor "
    "/ ceil / sign / pmod / sqrt / greatest / least (no transcendentals)",
    # sqrt is correctly rounded in IEEE-754, so it is bit-identical
    # across engines; exp/log/pow are NOT (libm last-ULP drift) and are
    # deliberately absent — the same policy as functions/text.py.
    oracle="""
    SELECT event_id,
           abs(value - 50.0) AS centered,
           CAST(floor(value) AS BIGINT) AS flr,
           CAST(ceil(value) AS BIGINT) AS cl,
           CAST(sign(value - 50.0) AS BIGINT) AS sgn,
           CAST(user_id % 7 AS BIGINT) AS bucket,
           sqrt(value) AS rt,
           greatest(value, 25.0) AS hi,
           least(value, 75.0) AS lo
    FROM events WHERE user_id < 20
    """,
)
def math_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    return ev.select(
        "event_id",
        F.abs(F.col("value") - 50.0).alias("centered"),
        F.floor("value").alias("flr"),
        F.ceil("value").alias("cl"),
        F.signum(F.col("value") - 50.0).cast("bigint").alias("sgn"),
        (F.col("user_id") % 7).cast("bigint").alias("bucket"),
        F.sqrt("value").alias("rt"),
        F.greatest(F.col("value"), F.lit(25.0)).alias("hi"),
        F.least(F.col("value"), F.lit(75.0)).alias("lo"),
    )


# --------------------------------------------------------------------------
# Scalar string-function suite over the engine-identical subset
# (lpad/substr/replace/upper/trim/concat_ws/length/reverse).
# --------------------------------------------------------------------------
@query(
    "string_functions_suite",
    "scalar string functions: pad/slice/replace/case/trim/concat/reverse",
    oracle="""
    SELECT c_custkey,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           upper(substr(c_name, 1, 8)) AS prefix_u,
           replace(c_name, '#', '-') AS dehashed,
           trim('  ' || c_name || ' ') AS trimmed,
           concat_ws('|', c_mktsegment, CAST(c_nationkey AS VARCHAR)) AS tagged,
           reverse(c_name) AS rev,
           length(c_name) AS name_len
    FROM customer
    """,
)
def string_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.upper(F.substring("c_name", 1, 8)).alias("prefix_u"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("dehashed"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.concat_ws(
            "|", F.col("c_mktsegment"), F.col("c_nationkey").cast("string")
        ).alias("tagged"),
        F.reverse(F.col("c_name")).alias("rev"),
        F.length("c_name").alias("name_len"),
    )


# --------------------------------------------------------------------------
# Null-handling semantics: coalesce / nullif / null-safe equality
# --------------------------------------------------------------------------
@query(
    "null_semantics",
    "null handling: coalesce chains, nullif, null-safe equality counts",
    oracle="""
    SELECT o_orderstatus,
           count(*) AS n,
           count(nullif(o_orderpriority, '1-URGENT')) AS non_urgent,
           CAST(sum(CASE WHEN o_totalprice IS NOT DISTINCT FROM NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS null_price,
           min(coalesce(NULLIF(o_orderpriority, '1-URGENT'), 'URGENT!'))
               AS min_prio
    FROM orders GROUP BY o_orderstatus
    """,
)
def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    non_urgent = F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT"))
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.count(non_urgent).alias("non_urgent"),
        F.sum(
            F.when(F.col("o_totalprice").eqNullSafe(F.lit(None).cast("double")), 1)
            .otherwise(0)
        ).alias("null_price"),
        F.min(F.coalesce(non_urgent, F.lit("URGENT!"))).alias("min_prio"),
    )


# --------------------------------------------------------------------------
# Pagination: total-order LIMIT/OFFSET (deterministic only over a total
# order — registry rule) — the API-pagination query shape.
# --------------------------------------------------------------------------
@query(
    "pagination_page3",
    "pagination: ORDER BY total order LIMIT 20 OFFSET 40 (page 3)",
    oracle="""
    SELECT o_orderkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate, o_orderkey
    LIMIT 20 OFFSET 40
    """,
)
def pagination_page3(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_orderdate", "o_orderkey")
        .offset(40)
        .limit(20)
    )


# --------------------------------------------------------------------------
# Array functions: build → sort → dedup → slice → join, emitted as a
# string (cross-engine hash-stable) — collect_set order is made
# deterministic by array_sort before any use.
# --------------------------------------------------------------------------
@query(
    "array_functions_suite",
    "arrays: collect_set -> sort -> slice -> contains -> stringified",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
           len(list_sort(list(DISTINCT event_type))) AS n_types,
           list_sort(list(DISTINCT event_type))[1] AS first_type,
           CAST(list_contains(list(DISTINCT event_type), 'error') AS INTEGER)
               AS has_error
    FROM events
    WHERE user_id < 25
    GROUP BY user_id
    """,
)
def array_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 25)
    types = F.array_sort(F.collect_set("event_type"))
    return ev.groupBy("user_id").agg(
        F.array_join(types, ",").alias("types"),
        F.size(types).alias("n_types"),
        F.element_at(types, 1).alias("first_type"),
        F.array_contains(F.collect_set("event_type"), "error")
        .cast("int")
        .alias("has_error"),
    )


# --------------------------------------------------------------------------
# Datetime arithmetic suite: component extraction, day difference from a
# fixed epoch, interval shift — restricted to constructs with identical
# semantics in both engines (no dayofweek: numbering conventions differ).
# --------------------------------------------------------------------------
@query(
    "datetime_functions_suite",
    "datetime: extract components, datediff vs fixed date, interval shift",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
           hour(o_orderdate) AS h,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since,
           o_orderdate + INTERVAL 90 DAY AS due_date
    FROM orders WHERE o_orderkey < 200
    """,
)
def datetime_functions_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 200)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.hour("o_orderdate").alias("h"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01 00:00:00").cast("timestamp")
        ).alias("days_since"),
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
    )


# --------------------------------------------------------------------------
# SQL-string surface through the oracle gate: the engine's spark.sql
# path (Athena equivalence, S11) with correlated EXISTS / IN / scalar
# subqueries — Catalyst decorrelates these into the joins the
# DataFrame forms above write by hand.
# --------------------------------------------------------------------------
def _register_views(spark: SparkSession, sf_dir: str, tables: list[str]) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


@query(
    "sql_exists_subquery",
    "SQL surface: correlated EXISTS + NOT EXISTS over customer/orders",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 400000)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_orderstatus = 'F')
    """,
)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, ["customer", "orders"])
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                      AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderstatus = 'F')
        """
    )


@query(
    "sql_scalar_subquery",
    "SQL surface: scalar subquery in projection + IN-list predicate",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                                  AS DOUBLE) / count(*) FROM orders) AS delta_vs_avg
    FROM orders
    WHERE o_orderstatus IN ('F', 'P')
      AND o_orderkey < 500
    """,
)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register_views(spark, sf_dir, ["orders"])
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                                      AS DOUBLE) / count(*) FROM orders) AS delta_vs_avg
        FROM orders
        WHERE o_orderstatus IN ('F', 'P')
          AND o_orderkey < 500
        """
    )


# --------------------------------------------------------------------------
# Z-order clustering codes: Morton interleave of two key dimensions —
# the multi-column data-layout technique (functions/zorder.py); emitted
# as a query so the bit-exact code path is oracle-gated.
# --------------------------------------------------------------------------
@query(
    "zorder_codes",
    "Z-order: Morton interleave of (user bucket, value bucket) per event",
    oracle=None,  # installed below (generated from the same generator)
)
def zorder_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.functions.zorder import morton_code

    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    xb = F.pmod("user_id", F.lit(256))
    yb = F.pmod(F.floor("value").cast("bigint"), F.lit(256))
    return ev.select(
        "event_id",
        xb.alias("xb"),
        yb.alias("yb"),
        morton_code(xb, yb, bits=8).alias("zcode"),
    )


def _install_zorder_oracle() -> None:
    from openaq_data_pipeline_engineering_spark.functions.zorder import morton_code_sql
    from openaq_data_pipeline_engineering_spark.plans.registry import QUERIES

    QUERIES["zorder_codes"].oracle = f"""
    SELECT event_id,
           user_id % 256 AS xb,
           CAST(floor(value) AS BIGINT) % 256 AS yb,
           {morton_code_sql('(user_id % 256)', '(CAST(floor(value) AS BIGINT) % 256)', 8)} AS zcode
    FROM events WHERE event_id < 2000
    """


_install_zorder_oracle()


# --------------------------------------------------------------------------
# TPC-H Q6 shape: pure filter + single decimal-exact aggregate — the
# predicate-pushdown showcase (every filter reaches the parquet scan).
# --------------------------------------------------------------------------
@query(
    "forecast_revenue_q6",
    "TPC-H Q6 shape: revenue delta from discounted lineitems in a year band",
    oracle="""
    SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * F.col("l_discount").cast("decimal(18,2)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q10 shape: returned-item reporting — 4-table join, customer
# revenue ranking, top 20.
# --------------------------------------------------------------------------
@query(
    "returned_items_q10",
    "TPC-H Q10 shape: top-20 customers by revenue on returned lineitems",
    oracle=f"""
    SELECT c_custkey, c_name, {_REV} AS revenue, n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def returned_items_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_revenue_col().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# TPC-H Q4 shape: EXISTS decorrelated to a left-semi join + priority agg.
# (Synthetic lineitem lacks commit/receipt dates; the EXISTS predicate
# is returnflag='R', preserving the correlated-EXISTS plan shape.)
# --------------------------------------------------------------------------
@query(
    "priority_exists_q4",
    "TPC-H Q4 shape: EXISTS subquery -> semi join, order-priority counts",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def priority_exists_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned,
            F.col("o_orderkey") == F.col("l_orderkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# --------------------------------------------------------------------------
# TPC-H Q12 shape: fact⋈fact join + dual conditional counts per status.
# --------------------------------------------------------------------------
@query(
    "linestatus_priority_q12",
    "TPC-H Q12 shape: orders x lineitem, urgent/non-urgent counts per status",
    oracle="""
    SELECT l_linestatus,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def linestatus_priority_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("bigint").alias("high_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).cast("bigint").alias("low_count"),
        )
    )


# --------------------------------------------------------------------------
# TPC-H Q13 shape: customer order-count distribution (left join keeps
# zero-order customers; count(col) skips the nulls they produce).
# --------------------------------------------------------------------------
@query(
    "custdist_q13",
    "TPC-H Q13 shape: per-customer order counts incl. zeros -> distribution",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def custdist_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# --------------------------------------------------------------------------
# TPC-H Q19 shape: disjunction of conjunctive band predicates across the
# join — Catalyst extracts the common join key and pushes the
# brand/size side down to the part scan.
# --------------------------------------------------------------------------
@query(
    "disjunctive_bands_q19",
    "TPC-H Q19 shape: OR-of-ANDs predicate spanning lineitem x part",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_lines,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def disjunctive_bands_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    band = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & F.col("l_quantity").between(qlo, qhi)
    )
    rev = F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("double")
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .filter(
            band("Brand#12", 5, 1, 11)
            | band("Brand#23", 10, 10, 20)
            | band("Brand#34", 15, 20, 30)
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            rev.alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Nearest-direction as-of join (operators/asof.py direction='nearest'):
# both carried columns come from ONE window shuffle; the choice is a
# pure per-row delta comparison. Tie rules: equal deltas prefer
# backward; equal-ts backward quotes take the max tiebreaker, forward
# quotes the min.
# --------------------------------------------------------------------------
@query(
    "asof_join_nearest",
    "as-of join (nearest): closest click in time to each error event, "
    "backward-preferring on delta ties",
    oracle="""
    WITH c AS (
        SELECT user_id, ts, value, event_id FROM events
        WHERE event_type = 'click'
    ), e AS (
        SELECT user_id, ts, value, event_id FROM events
        WHERE event_type = 'error'
    )
    SELECT e.user_id, e.ts, e.event_id, e.value,
           (SELECT c.value FROM c
            WHERE c.user_id = e.user_id
            ORDER BY abs(epoch_us(c.ts) - epoch_us(e.ts)),
                     CASE WHEN c.ts <= e.ts THEN 0 ELSE 1 END,
                     CASE WHEN c.ts <= e.ts THEN -c.event_id
                          ELSE c.event_id END
            LIMIT 1) AS value_asof
    FROM e
    """,
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value", "event_id"
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "ts", "event_id", "value"
    )
    return asof_join(
        probes=errors,
        quotes=clicks,
        on=["user_id"],
        ts_col="ts",
        value_cols=["value"],
        tiebreaker="event_id",
        direction="nearest",
    )


# --------------------------------------------------------------------------
# The LARGE x LARGE range-join path (operators/rangejoin.binned_range_join):
# same interval semantics as range_join_bands but through bin-bucketed
# HASH joins — the plan that survives when the interval side is too big
# to broadcast. The top band is capped at the domain bound (values are
# bounded metrics) rather than a 1e9 sentinel: binning explodes each
# interval to the bins it OVERLAPS, so an effectively-unbounded band
# would mint bins it can never match — cap the band, or for true
# open-ended bands route them through the broadcast form. Strategy
# equality is also pinned by TestRangeJoin::test_binned_equals_broadcast.
# --------------------------------------------------------------------------
@query(
    "range_join_binned",
    "range join (large x large path): bin-bucketed hash join, same "
    "[lo, hi) semantics as the broadcast form",
    oracle="""
    WITH bands(lo, hi, band) AS (
        VALUES (0.0, 10.0, 'low'), (10.0, 25.0, 'mid'),
               (25.0, 50.0, 'high'), (50.0, 1000.0, 'extreme')
    )
    SELECT b.band, count(*) AS n, round(sum(e.value), 2) AS sum_value
    FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.band
    """,
)
def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.rangejoin import (
        binned_range_join,
    )

    ev = load_table(spark, sf_dir, "events")
    bands = local_rows(spark, 
        [(0.0, 10.0, "low"), (10.0, 25.0, "mid"),
         (25.0, 50.0, "high"), (50.0, 1000.0, "extreme")],
        "lo double, hi double, band string",
    )
    joined = binned_range_join(ev, bands, value_col="value", bin_width=25.0)
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value")
    )
