"""Declared queries: warehouse surface extensions — unpivot (wide→long),
time-range rolling windows, one-pass data-quality expectations,
explicit GROUPING SETS.

Completes operator families the reference only exercises in one
direction: the Glue job pivots long→wide (process_openaq_raw.py:151-165)
but never inverts it; Athena validation runs COUNT(*)-style checks
(utils/athena_utils.py:38-175, tests/test_phase5_manual_trigger.py)
but one at a time, not as a single-pass expectation report.

Float policy (plans/registry.py): window/grouped sums go through
DECIMAL inside the aggregate (order-independent), then cast to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.plans.queries_core import EVENT_TYPES
from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import fan_out, load_table


# --------------------------------------------------------------------------
# Unpivot / melt: the inverse of A1's pivot.  pivot(explicit values) then
# unpivot(drop nulls) must equal the plain two-key GROUP BY — which is
# exactly what the oracle computes, so the roundtrip itself is what's
# being verified.
# --------------------------------------------------------------------------
@query(
    "events_unpivot",
    "unpivot: pivot(user x event_type mean) melted back to long = 2-key GROUP BY",
    oracle="""
    SELECT user_id, event_type,
           round(sum(value), 2) / count(value) AS mean_value
    FROM events
    GROUP BY user_id, event_type
    HAVING count(value) > 0
    """,
)
def events_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    cnt = F.count("value")
    stable_mean = F.when(cnt > 0, F.round(F.sum("value"), 2) / cnt)
    wide = ev.groupBy("user_id").pivot("event_type", EVENT_TYPES).agg(stable_mean)
    return wide.unpivot(
        ["user_id"], EVENT_TYPES, "event_type", "mean_value"
    ).dropna(subset=["mean_value"])


# --------------------------------------------------------------------------
# Time-RANGE rolling window (not ROWS): per-user trailing-1h activity.
# Frame bounds are integer microseconds on both engines (ts carries
# sub-second precision — see sources/star.py nanos handling).
# --------------------------------------------------------------------------
@query(
    "rolling_time_window",
    "window: per-user trailing-1h RANGE frame (sum via DECIMAL, count)",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h,
           CAST(count(*) OVER w AS BIGINT) AS n_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def rolling_time_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n_1h"),
    )


# --------------------------------------------------------------------------
# One-pass data-quality expectation report (deequ-style, engine-native):
# each table contributes ONE aggregate pass (stack() fans the metrics
# out to rows); referential integrity is an anti-join count.
# --------------------------------------------------------------------------
@query(
    "dq_expectations",
    "data quality: uniqueness/completeness/range/referential checks as one report",
    oracle="""
    SELECT 'orders_orderkey_unique' AS expectation,
           CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
    FROM orders
    UNION ALL
    SELECT 'orders_custkey_complete',
           CAST(count(CASE WHEN o_custkey IS NULL THEN 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_totalprice_positive',
           CAST(count(CASE WHEN o_totalprice <= 0 THEN 1 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'lineitem_quantity_range',
           CAST(count(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 END)
                AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_no_orphans', CAST(count(*) AS BIGINT)
    FROM lineitem l ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = fan_out(load_table(spark, sf_dir, "orders"))
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    o_metrics = orders.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("m1"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("m2"),
        F.count(F.when(F.col("o_totalprice") <= 0, 1)).alias("m3"),
    ).select(
        F.expr(
            "stack(3, 'orders_orderkey_unique', m1,"
            " 'orders_custkey_complete', m2,"
            " 'orders_totalprice_positive', m3)"
        ).alias("expectation", "violations")
    )
    l_range = li.agg(
        F.count(
            F.when((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50), 1)
        ).alias("violations")
    ).select(F.lit("lineitem_quantity_range").alias("expectation"), "violations")
    orphans = (
        li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("violations"))
        .select(F.lit("lineitem_no_orphans").alias("expectation"), "violations")
    )
    return o_metrics.unionByName(l_range).unionByName(orphans)


# --------------------------------------------------------------------------
# Explicit GROUPING SETS (beyond the rollup/cube shorthands), via the
# SQL executor surface (S11) like the subquery pair.
# --------------------------------------------------------------------------
_GSETS_SQL = """
SELECT event_type,
       CAST(user_id % 7 AS BIGINT) AS user_bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(grouping(event_type) AS BIGINT) AS g_type
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id % 7), ())
"""


# --------------------------------------------------------------------------
# Integer PageRank over the part co-purchase graph (parts sharing an
# order). Iterative-algorithm pattern #3 (operators/pagerank.py) with a
# bit-exact CTE-chain oracle — the ITERATION is verified cross-engine,
# like kmeans_ivf_topk.
# --------------------------------------------------------------------------
_PR_EDGES_CTE = """e0 AS (
        SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ),
    edges AS (SELECT s AS src, t AS dst FROM e0
              UNION ALL SELECT t AS src, s AS dst FROM e0)"""


from openaq_data_pipeline_engineering_spark.operators.pagerank import (
    pagerank,
    pagerank_oracle_sql,
    undirect,
)


@query(
    "pagerank_parts",
    "graph: 3-round integer PageRank on parts co-ordered together, top-100",
    oracle=pagerank_oracle_sql(_PR_EDGES_CTE, iterations=3, top_k=100),
)
def pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = fan_out(load_table(spark, sf_dir, "lineitem")).select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    pr = pagerank(undirect(pairs), iterations=3)
    return pr.orderBy(F.desc("pr"), "node").limit(100)


_TRI_EDGES_CTE = """e0 AS (
        SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE year(a.l_shipdate) = 1996 AND year(b.l_shipdate) = 1996
    )"""


@query(
    "triangle_count",
    "graph: degree-ordered triangle count on 1996 co-ordered parts "
    "(forward wedges bounded by O(m^1.5) regardless of hub skew)",
    oracle=None,  # installed below (needs the operator's oracle builder)
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.triangles import (
        count_triangles,
    )

    li = fan_out(load_table(spark, sf_dir, "lineitem")).filter(
        F.year("l_shipdate") == 1996
    ).select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(F.col("a.l_partkey").alias("s"), F.col("b.l_partkey").alias("t"))
        .distinct()
    )
    return count_triangles(pairs)


def _install_triangle_oracle() -> None:
    from openaq_data_pipeline_engineering_spark.operators.triangles import (
        triangle_oracle_sql,
    )
    from openaq_data_pipeline_engineering_spark.plans.registry import QUERIES

    QUERIES["triangle_count"].oracle = triangle_oracle_sql(_TRI_EDGES_CTE)


_install_triangle_oracle()


_MINSUP = 3


@query(
    "basket_rules",
    "mining: market-basket association rules over co-ordered parts — "
    "support / confidence / lift in exact integer ppm, top-30",
    oracle=f"""
    WITH baskets AS (
        SELECT DISTINCT l_orderkey AS bid, l_partkey AS item FROM lineitem
    ),
    n AS (SELECT CAST(count(DISTINCT bid) AS BIGINT) AS n_baskets
          FROM baskets),
    sup AS (SELECT item, CAST(count(*) AS BIGINT) AS s
            FROM baskets GROUP BY item),
    pairs AS (
        SELECT a.item AS part_a, b.item AS part_b,
               CAST(count(*) AS BIGINT) AS sup_ab
        FROM baskets a JOIN baskets b
          ON a.bid = b.bid AND a.item < b.item
        GROUP BY 1, 2
        HAVING count(*) >= {_MINSUP}
    )
    SELECT part_a, part_b, sup_ab,
           sa.s AS sup_a, sb.s AS sup_b,
           (sup_ab * 1000000) // sa.s AS conf_ab_ppm,
           (sup_ab * n_baskets * 1000000) // (sa.s * sb.s) AS lift_ppm
    FROM pairs
    JOIN sup sa ON sa.item = part_a
    JOIN sup sb ON sb.item = part_b
    CROSS JOIN n
    ORDER BY sup_ab DESC, part_a, part_b
    LIMIT 30
    """,
)
def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining (the A-Priori pair pass) on order
    baskets. One distinct projection, one self-join on basket id for
    pair supports (map-side combined), one small join against item
    supports, a 1-row basket-count broadcast; confidence and lift are
    integer ppm, so the cross-engine hash is bit-exact. The min-support
    HAVING prunes the pair table before any downstream join — at
    100 TB the pair table is the only large intermediate and it shrinks
    with support, exactly the A-Priori property."""
    baskets = (
        fan_out(load_table(spark, sf_dir, "lineitem"))
        .select(F.col("l_orderkey").alias("bid"), F.col("l_partkey").alias("item"))
        .distinct()
        # The collapsed basket relation feeds 4 consumers (count, item
        # supports, both pair-join sides); materialize once or each
        # re-plans the scan+distinct (no exchange reuse across aliased
        # subtrees on this Spark build).
        .localCheckpoint(eager=True)
    )
    n = baskets.agg(
        F.countDistinct("bid").cast("bigint").alias("n_baskets")
    )
    sup = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("s"))
    a, b = baskets.alias("a"), baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.bid") == F.col("b.bid"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("part_a"), F.col("b.item").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("sup_ab"))
        .filter(F.col("sup_ab") >= _MINSUP)
    )
    sa = sup.select(F.col("item").alias("part_a"), F.col("s").alias("sup_a"))
    sb = sup.select(F.col("item").alias("part_b"), F.col("s").alias("sup_b"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .join(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "sup_ab",
            "sup_a",
            "sup_b",
            F.expr("(sup_ab * CAST(1000000 AS BIGINT)) div sup_a").alias(
                "conf_ab_ppm"
            ),
            F.expr(
                "(sup_ab * n_baskets * CAST(1000000 AS BIGINT))"
                " div (sup_a * sup_b)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("sup_ab"), "part_a", "part_b")
        .limit(30)
    )


@query(
    "event_funnel",
    "analytics: ordered view→click→purchase funnel — per-user first-touch "
    "chain (each stage's min ts after the previous stage), stage counts",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS vt FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS ct
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts >= v.vt
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS pt
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= c.ct
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
           (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
           (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_view_click_purchase
    """,
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel. Each stage is one aggregation keyed on
    user_id plus one join back to the (pruned) event scan — all three
    stages co-partition on user_id, so at 100 TB this is a chain of
    co-located hash joins with no wide intermediate (never a per-user
    event-list materialization)."""
    ev = fan_out(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", "ts"
    )
    # Each stage frame is a small per-user aggregate consumed twice
    # (next stage + its own count); materialized once so the funnel is
    # 3 pruned scans, not a 6-scan re-derivation cascade.
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
        .localCheckpoint(eager=True)
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
        .localCheckpoint(eager=True)
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .join(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .join(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@query(
    "retention_cohorts",
    "analytics: weekly signup cohorts × activity-week offsets — the "
    "classic retention triangle, integer counts",
    oracle="""
    WITH cohort AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cw FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
    )
    SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
           CAST((epoch(aw) - epoch(cw)) / 604800 AS BIGINT) AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM cohort JOIN activity USING (user_id)
    WHERE aw >= cw
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention triangle: one aggregation for cohort week, one
    distinct for (user, activity week) — both keyed on user_id, one
    co-partitioned join. The week offset is exact integer epoch
    arithmetic (both engines truncate weeks to Monday 00:00), so the
    oracle hash matches bit-for-bit."""
    ev = fan_out(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", "ts"
    )
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("aw")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .filter(F.col("aw") >= F.col("cw"))
        .groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            ((F.unix_timestamp("aw") - F.unix_timestamp("cw")) / 604800)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@query(
    "outlier_mad",
    "robust stats: median-absolute-deviation outlier counts per event "
    "type (two-pass exact medians, co-partitioned join back)",
    # |x - med| and the 3*MAD screen are per-row IEEE arithmetic over
    # engine-identical exact percentiles (quantile_cont parity is
    # already proven by value_percentiles) — bit-exact across engines.
    oracle="""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type AS mt, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           any_value(d.med) AS med,
           any_value(m.mad) AS mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN d.adev > 3 * m.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.mt
    GROUP BY d.event_type
    """,
)
def outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen: median and MAD are exact percentiles
    computed in two grouped passes; both joins key on event_type, so
    the fact table shuffles once and the tiny per-group stats broadcast
    back. Never sorts the full table globally."""
    ev = fan_out(load_table(spark, sf_dir, "events")).select(
        "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med",
        F.abs(F.col("value") - F.col("med")).alias("adev"),
        # Materialized once: dev feeds the MAD pass AND the final
        # screen; re-deriving it re-scans the fact per consumer.
    ).localCheckpoint(eager=True)
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", 0.5).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("adev") > 3 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@query(
    "grouping_sets_report",
    "GROUP BY GROUPING SETS: by-type, by-user-bucket, and grand-total slices",
    oracle=_GSETS_SQL,
)
def grouping_sets_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_GSETS_SQL)


# --------------------------------------------------------------------------
# Partial-aggregate rollup merge: daily partials -> monthly, the
# pre-aggregation pattern that turns a 100 TB re-scan into a merge of
# tiny partial tables. Values are summed in exact integer milli-units
# (floor(value*1000): the multiply is correctly rounded IEEE in both
# engines, floor is exact) so the merge is bit-exact cross-engine.
# --------------------------------------------------------------------------
_ROLLUP_SQL = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS BIGINT)
               AS sum_milli
    FROM events GROUP BY event_type, CAST(ts AS DATE)
)
SELECT event_type,
       CAST(date_trunc('month', day) AS DATE) AS month,
       CAST(sum(n) AS BIGINT) AS n,
       CAST(sum(sum_milli) AS BIGINT) AS sum_milli,
       CAST(sum(sum_milli) AS DOUBLE) / sum(n) AS avg_milli
FROM daily GROUP BY event_type, date_trunc('month', day)
"""


@query(
    "rollup_merge",
    "rollup: daily partial aggregates merged to monthly (algebraic "
    "sum/count re-aggregation — the pre-aggregation scale pattern)",
    oracle=_ROLLUP_SQL,
)
def rollup_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias(
            "sum_milli"
        ),
    )
    return daily.groupBy(
        "event_type",
        F.date_trunc("month", "day").cast("date").alias("month"),
    ).agg(
        F.sum("n").alias("n"),
        F.sum("sum_milli").alias("sum_milli"),
        (
            F.sum("sum_milli").cast("double") / F.sum("n")
        ).alias("avg_milli"),
    )


# --------------------------------------------------------------------------
# Salted skew join: hot event_type keys spread across 8 sub-keys; the
# aggregated result is salt-invariant, so the oracle is the PLAIN join.
# --------------------------------------------------------------------------
_SALTED_JOIN_SQL = """
WITH dim AS (
    SELECT DISTINCT event_type,
           CAST(length(event_type) AS BIGINT) AS type_len
    FROM events
)
SELECT e.event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(floor(e.value * 1000) AS BIGINT)) AS BIGINT)
           AS sum_milli,
       max(d.type_len) AS type_len
FROM events e JOIN dim d ON e.event_type = d.event_type
GROUP BY e.event_type
"""


@query(
    "salted_skew_join",
    "skew: fact-side salted join against a salt-replicated dim "
    "(row-set identical to the plain join; oracle is the plain join)",
    oracle=_SALTED_JOIN_SQL,
)
def salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.skew import salted_join

    ev = fan_out(load_table(spark, sf_dir, "events"))
    dim = ev.select("event_type").distinct().withColumn(
        "type_len", F.length("event_type").cast("bigint")
    )
    joined = salted_join(ev, dim, key="event_type", n_salts=8)
    return joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.floor(F.col("value") * 1000).cast("bigint")).alias(
            "sum_milli"
        ),
        F.max("type_len").alias("type_len"),
    )


# --------------------------------------------------------------------------
# Time-series gap filling: per-user calendar spine (sequence + explode)
# left-joined to the observed daily sums, missing days forward-filled
# with last(ignorenulls). The first spine day per user is always
# observed (spine starts at min(day)), so the fill never reads off the
# front of the frame.
#
# Scale shape: the spine is |users| x |date-range| rows built from a
# per-user 2-row aggregate (no driver loop, no cross join); the join
# keys on (user_id, day) so spine and dailies co-partition; the
# forward-fill window runs inside each user's partition. At 100 TB the
# spine is tiny relative to the fact table because it is bounded by
# keys x days, not by events.
# --------------------------------------------------------------------------
@query(
    "gap_fill_forward",
    "time series: calendar-spine gap fill + forward-fill (last ignorenulls)",
    oracle="""
    WITH daily AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS day_sum
      FROM events WHERE user_id < 15 GROUP BY user_id, day
    ), spans AS (
      SELECT user_id, min(day) AS d0, max(day) AS d1
      FROM daily GROUP BY user_id
    ), spine AS (
      SELECT user_id,
             CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
                 AS day
      FROM spans
    )
    SELECT s.user_id, s.day,
           CAST(d.day_sum IS NOT NULL AS INTEGER) AS observed,
           last_value(d.day_sum IGNORE NULLS)
             OVER (PARTITION BY s.user_id ORDER BY s.day) AS filled_sum
    FROM spine s
    LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
    """,
)
def gap_fill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    daily = (
        ev.filter(F.col("user_id") < 15)
        .groupBy(
            "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("day_sum")
        )
    )
    spine = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "day",
        F.col("day_sum").isNotNull().cast("int").alias("observed"),
        F.last("day_sum", ignorenulls=True).over(w).alias("filled_sum"),
    )


# --------------------------------------------------------------------------
# Table content checksums (anti-entropy validation): one row per table
# with row count + an ORDER-INDEPENDENT content fingerprint — the sum
# of a 28-bit integer derived from each row's md5 over a canonical
# '|'-joined key string. Two clusters (or a cluster and its DR copy)
# compare these three numbers instead of shipping rows; a single
# changed/missing/duplicated row moves the sum.
#
# Canonical strings use only integer/string columns (float formatting
# is engine-specific); md5 and the hex-prefix parse are identical in
# Spark (conv) and DuckDB (0x-cast) — same bridge as corpus_shards.
#
# Scale shape: one pruned scan per table, map-side partial sum, 1-row
# output each; the union is of three 1-row aggregates.
# --------------------------------------------------------------------------
_CHECKSUM_KEYS = {
    "customer": ("c_custkey", "c_mktsegment", "c_nationkey"),
    "orders": ("o_orderkey", "o_orderstatus", "o_orderpriority"),
    "lineitem": ("l_orderkey", "l_linenumber", "l_returnflag"),
}


def _checksum_oracle() -> str:
    parts = []
    for t, cols in _CHECKSUM_KEYS.items():
        canon = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols)
        parts.append(
            f"SELECT '{t}' AS table_name,\n"
            f"       CAST(count(*) AS BIGINT) AS n_rows,\n"
            f"       CAST(sum(CAST(concat('0x', substr(md5({canon}), 1, 7))\n"
            f"                AS BIGINT)) AS BIGINT) AS content_sum\n"
            f"FROM {t}"
        )
    return "\nUNION ALL\n".join(parts)


@query(
    "table_checksums",
    "validation: per-table row count + order-independent md5 content sum",
    oracle=_checksum_oracle(),
)
def table_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for t, cols in _CHECKSUM_KEYS.items():
        df = load_table(spark, sf_dir, t)
        canon = F.concat_ws("|", *[F.col(c).cast("string") for c in cols])
        row_int = F.conv(F.substring(F.md5(canon), 1, 7), 16, 10).cast("bigint")
        agg = df.agg(
            F.lit(t).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(row_int).alias("content_sum"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out


# --------------------------------------------------------------------------
# Algebraic statistics from EXACT integer sums: builtin corr()/var_samp()
# accumulate float partials whose combine order varies with
# partitioning — not reproducible cross-engine or cross-cluster-size.
# This computes the five raw moments (n, Sx, Sy, Sxx, Sxy, Syy) as
# BIGINT sums (order-independent, map-side combinable), widens to
# DECIMAL(38)/HUGEINT for the products, and derives corr/variance with
# ONE double division+sqrt per group — bit-identical on any engine and
# any partition count. The decomposition is exactly what makes the
# statistic safe to compute distributed at 100 TB.
# --------------------------------------------------------------------------
@query(
    "algebraic_corr_stats",
    "stats: per-type corr/var from exact integer moments (partition-"
    "count-independent, unlike float-partial corr())",
    oracle="""
    WITH m AS (
      SELECT event_type,
             CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) AS HUGEINT) AS sx,
             CAST(sum(user_id) AS HUGEINT) AS sy,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)
                      * CAST(floor(value * 1000) AS BIGINT)) AS HUGEINT)
                 AS sxx,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT) * user_id)
                  AS HUGEINT) AS sxy,
             CAST(sum(user_id * user_id) AS HUGEINT) AS syy
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n,
           CAST(n * sxx - sx * sx AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
               AS var_x_milli2,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    * CAST(n * syy - sy * sy AS DOUBLE)) AS corr_xy
    FROM m
    """,
)
def algebraic_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    x = F.floor(F.col("value") * 1000).cast("bigint")
    y = F.col("user_id")
    m = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(x).alias("sx0"),
        F.sum(y).alias("sy0"),
        F.sum(x * x).alias("sxx0"),
        F.sum(x * y).alias("sxy0"),
        F.sum(y * y).alias("syy0"),
    )
    # widen to DECIMAL(38,0) before the cross products (n*Sxx etc. can
    # exceed BIGINT at real scale), then ONE double op per output
    d = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    n, sx, sy, sxx, sxy, syy = (
        d("n0"), d("sx0"), d("sy0"), d("sxx0"), d("sxy0"), d("syy0")
    )
    var_num = (n * sxx - sx * sx).cast("double")
    cov_num = (n * sxy - sx * sy).cast("double")
    vy_num = (n * syy - sy * sy).cast("double")
    return m.select(
        "event_type",
        F.col("n0").alias("n"),
        (var_num / (n * (n - F.lit(1))).cast("double")).alias("var_x_milli2"),
        (cov_num / F.sqrt(var_num * vy_num)).alias("corr_xy"),
    )


# --------------------------------------------------------------------------
# Synthetic-source smoke: spark.range as a FILE-LESS distributed source
# (the backfill / load-test / CI-fixture generator pattern). Columns
# are pure functions of the row id (md5 bucket, modular value), so any
# cluster size generates the bit-identical table — and DuckDB replays
# it from generate_series. range() parallelizes by slicing the id
# space across tasks: no input files, no driver materialization.
# --------------------------------------------------------------------------
@query(
    "synthetic_range_source",
    "source: spark.range generator (id-deterministic columns) + rollup",
    oracle="""
    WITH g AS (
      SELECT i AS id,
             CAST(concat('0x', substr(md5(CAST(i AS VARCHAR)), 1, 7))
                  AS BIGINT) % 10 AS bucket,
             (i * 37) % 1000 AS val
      FROM generate_series(0, 99999) AS t(i)
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(val) AS BIGINT) AS sum_val,
           min(id) AS first_id
    FROM g GROUP BY bucket
    """,
)
def synthetic_range_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = spark.range(0, 100_000, numPartitions=8).select(
        F.col("id"),
        (
            F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 7), 16, 10)
            .cast("bigint")
            % 10
        ).alias("bucket"),
        ((F.col("id") * 37) % 1000).alias("val"),
    )
    return g.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("val").alias("sum_val"),
        F.min("id").alias("first_id"),
    )


# --------------------------------------------------------------------------
# Pareto frontier (2-D skyline): order dates not dominated by any later
# date with an equal-or-higher best price. The naive form is a
# quadratic NOT EXISTS self-join; this collapses to one row per date
# first (shuffle ∝ distinct dates) and then needs only a single
# cumulative max over the date axis — O(n log n), no self-join at all.
# The window is global but over |distinct dates| rows, not the fact
# table.
# --------------------------------------------------------------------------
@query(
    "pareto_frontier",
    "skyline: (date, best price) frontier via collapse + suffix-max "
    "window (no quadratic self-join)",
    oracle="""
    WITH d AS (
      SELECT o_orderdate AS day, max(o_totalprice) AS best_price
      FROM orders GROUP BY 1
    ), f AS (
      SELECT day, best_price,
             max(best_price) OVER (
               ORDER BY epoch_us(day)
               RANGE BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING
             ) AS later_best
      FROM d
    )
    SELECT day, best_price FROM f
    WHERE later_best IS NULL OR best_price > later_best
    """,
)
def pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(F.col("o_orderdate").alias("day")).agg(
        F.max("o_totalprice").alias("best_price")
    )
    w = (
        Window.orderBy(F.unix_micros(F.col("day")))
        .rangeBetween(1, Window.unboundedFollowing)
    )
    return (
        d.withColumn("later_best", F.max("best_price").over(w))
        .filter(
            F.col("later_best").isNull()
            | (F.col("best_price") > F.col("later_best"))
        )
        .select("day", "best_price")
    )


# --------------------------------------------------------------------------
# Version reconciliation via FULL OUTER join: classify every key of
# two table versions as added / removed / changed / unchanged and
# report per-class counts + key extents. The "what changed between
# yesterday's and today's snapshot" audit. Version B is derived from A
# by a deterministic synthetic drift (drop <=100, shift balances in
# (100,130], add 1e6-offset copies of <=50) so the oracle can state
# the expected classes in closed form.
#
# Scale shape: one full-outer hash join keyed on the primary key —
# co-partitioned, shuffle ∝ rows, no driver materialization; the
# classify step is a pure projection and the rollup is 4 groups.
# --------------------------------------------------------------------------
@query(
    "table_diff",
    "audit: FULL OUTER version diff -> added/removed/changed/unchanged "
    "counts + key extents",
    oracle="""
    SELECT * FROM (
      SELECT 'removed' AS status, CAST(count(*) AS BIGINT) AS n,
             min(c_custkey) AS min_key, max(c_custkey) AS max_key
      FROM customer WHERE c_custkey <= 100
      UNION ALL
      SELECT 'added', CAST(count(*) AS BIGINT),
             min(c_custkey + 1000000), max(c_custkey + 1000000)
      FROM customer WHERE c_custkey <= 50
      UNION ALL
      SELECT 'changed', CAST(count(*) AS BIGINT), min(c_custkey), max(c_custkey)
      FROM customer WHERE c_custkey > 100 AND c_custkey <= 130
      UNION ALL
      SELECT 'unchanged', CAST(count(*) AS BIGINT), min(c_custkey), max(c_custkey)
      FROM customer WHERE c_custkey > 130
    ) WHERE n > 0
    """,
)
def table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    a = cust.select("c_custkey", "c_acctbal")
    # synthetic version B: deterministic drift off version A. The two
    # branches (keys > 100 kept, keys <= 50 shifted) are DISJOINT key
    # ranges, so B is a single conditional projection + filter — ONE
    # customer scan instead of the union's two (r13, guide §1.2; at
    # scale the diff reads each version once, which is the operator's
    # whole point).
    k = F.col("c_custkey")
    b = cust.select(
        F.when(k > 100, k)
        .when(k <= 50, k + 1_000_000)
        .alias("c_custkey"),
        F.when((k > 100) & (k <= 130), F.col("c_acctbal") + 50.0)
        .otherwise(F.col("c_acctbal"))
        .alias("c_acctbal"),
    ).filter(F.col("c_custkey").isNotNull())
    joined = a.alias("a").join(
        b.alias("b"), F.col("a.c_custkey") == F.col("b.c_custkey"), "full_outer"
    )
    status = (
        F.when(F.col("b.c_custkey").isNull(), "removed")
        .when(F.col("a.c_custkey").isNull(), "added")
        .when(F.col("a.c_acctbal") != F.col("b.c_acctbal"), "changed")
        .otherwise("unchanged")
    )
    key = F.coalesce(F.col("a.c_custkey"), F.col("b.c_custkey"))
    return (
        joined.select(status.alias("status"), key.alias("key"))
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
        )
    )


# --------------------------------------------------------------------------
# Rolling z-score anomaly screen: each event scored against its own
# trailing 10-event window (per user, excluding itself). The window
# moments are BIGINT milli-sums (exact in any evaluation order /
# sliding-frame algorithm); the z-comparison is rearranged to avoid
# division so the flag is pure integer arithmetic:
#     |n*x - S1| > k * sqrt(n*(n*S2 - S1^2))   (k = 2)
# squared on both sides -> BIGINT-only comparison, engine-exact.
# --------------------------------------------------------------------------
@query(
    "rolling_zscore_outliers",
    "time series: trailing-window z>2 anomaly counts from exact integer "
    "moments (division-free flag)",
    oracle="""
    WITH m AS (
      SELECT user_id, event_id,
             CAST(floor(value * 1000) AS BIGINT) AS x,
             CAST(count(*) OVER w AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)) OVER w
                  AS BIGINT) AS s1,
             CAST(sum(CAST(floor(value * 1000) AS BIGINT)
                      * CAST(floor(value * 1000) AS BIGINT)) OVER w
                  AS BIGINT) AS s2
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_scored,
           CAST(sum(CASE WHEN n >= 5
                    AND (n*x - s1)*(n*x - s1) > 4 * n * (n*s2 - s1*s1)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM m GROUP BY user_id
    """,
)
def rolling_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    x = F.floor(F.col("value") * 1000).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    m = ev.select(
        "user_id",
        x.alias("x"),
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(x).over(w).alias("s1"),
        F.sum(x * x).over(w).alias("s2"),
    )
    nx_s1 = m["n"] * m["x"] - m["s1"]
    flag = (
        (m["n"] >= 5)
        & (nx_s1 * nx_s1 > 4 * m["n"] * (m["n"] * m["s2"] - m["s1"] * m["s1"]))
    )
    return m.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(flag.cast("bigint")).alias("n_outliers"),
    )


# --------------------------------------------------------------------------
# Cumulative sum WITH RESET (running balance): per-user milli-value
# running total that restarts at every 'signup' event — the segmented
# cumsum pattern (inventory resets, meter rollovers, balance
# snapshots). Segment ids come from a cumulative count of reset
# markers; both windows share one (user, ts) sort.
# --------------------------------------------------------------------------
@query(
    "cumsum_with_reset",
    "window: per-user running milli-total restarting at signup events "
    "(segmented cumulative sum, shared sort)",
    oracle="""
    WITH seg AS (
      SELECT user_id, ts, event_id,
             CAST(floor(value * 1000) AS BIGINT) AS m,
             CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS seg_id
      FROM events WHERE user_id < 25
    )
    SELECT user_id, event_id, seg_id,
           CAST(sum(m) OVER (PARTITION BY user_id, seg_id
                             ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS running_milli
    FROM seg
    """,
)
def cumsum_with_reset(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    w_all = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seg = ev.filter(F.col("user_id") < 25).select(
        "user_id",
        "ts",
        "event_id",
        F.floor(F.col("value") * 1000).cast("bigint").alias("m"),
        F.sum((F.col("event_type") == "signup").cast("bigint"))
        .over(w_all)
        .alias("seg_id"),
    )
    w_seg = (
        Window.partitionBy("user_id", "seg_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return seg.select(
        "user_id",
        "event_id",
        "seg_id",
        F.sum("m").over(w_seg).alias("running_milli"),
    )


# --------------------------------------------------------------------------
# Contribution ranking (percent-of-group): each user's ppm share of
# their event type's total activity, top-3 contributors per type.
# Window total + rank over the AGGREGATED table (|users x types|),
# never over raw events.
# --------------------------------------------------------------------------
@query(
    "contribution_topk",
    "window: top-3 users per event type by ppm share of the type total",
    oracle="""
    WITH u AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), s AS (
      SELECT event_type, user_id, n,
             CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS total,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY n DESC, user_id) AS rn
      FROM u
    )
    SELECT event_type, user_id, n,
           (n * 1000000) // total AS share_ppm, CAST(rn AS INTEGER) AS rn
    FROM s WHERE rn <= 3
    """,
)
def contribution_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    u = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    w_tot = Window.partitionBy("event_type")
    w_rank = Window.partitionBy("event_type").orderBy(
        F.desc("n"), "user_id"
    )
    return (
        u.select(
            "event_type",
            "user_id",
            "n",
            F.sum("n").over(w_tot).alias("total"),
            F.row_number().over(w_rank).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
        .select(
            "event_type",
            "user_id",
            "n",
            F.expr("(n * CAST(1000000 AS BIGINT)) div total").alias(
                "share_ppm"
            ),
            "rn",
        )
    )


# --------------------------------------------------------------------------
# Join-cardinality audit: BEFORE joining two tables, verify the
# relationship shape — max fan-out per key on each side and whether
# the key is unique. A 1:N join assumed to be 1:1 is the classic
# silent row-explosion bug; this report is the guard a pipeline runs
# ahead of a new join. One aggregation per side over the key only
# (column-pruned scans), combined into a 2-row report.
# --------------------------------------------------------------------------
@query(
    "join_cardinality_audit",
    "audit: per-side key fan-out + uniqueness ahead of an orders x "
    "lineitem join",
    oracle="""
    SELECT 'orders' AS side,
           CAST(sum(cnt) AS BIGINT) AS n_rows,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(max(cnt) AS BIGINT) AS max_fanout,
           CAST(max(cnt) = 1 AS INTEGER) AS key_unique
    FROM (SELECT o_orderkey, count(*) AS cnt FROM orders GROUP BY 1)
    CROSS JOIN (SELECT 1)
    UNION ALL
    SELECT 'lineitem',
           CAST(sum(cnt) AS BIGINT),
           CAST(count(*) AS BIGINT),
           CAST(max(cnt) AS BIGINT),
           CAST(max(cnt) = 1 AS INTEGER)
    FROM (SELECT l_orderkey, count(*) AS cnt FROM lineitem GROUP BY 1)
    CROSS JOIN (SELECT 1)
    """,
)
def join_cardinality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    def side(table: str, key: str, label: str) -> DataFrame:
        per_key = (
            load_table(spark, sf_dir, table)
            .groupBy(key)
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        return per_key.agg(
            F.lit(label).alias("side"),
            F.sum("cnt").alias("n_rows"),
            F.count(F.lit(1)).alias("n_keys"),
            F.max("cnt").alias("max_fanout"),
            (F.max("cnt") == 1).cast("int").alias("key_unique"),
        )

    return side("orders", "o_orderkey", "orders").unionByName(
        side("lineitem", "l_orderkey", "lineitem")
    )


# --------------------------------------------------------------------------
# Financial reconciliation: recompute each order's total from its line
# items (extended * (1-disc) * (1+tax), floored to cents per row) and
# compare against the order header — the classic cross-table
# consistency audit. Per-row double products are bit-identical across
# engines; all cross-row math is integer cents. One co-partitioned
# join on the order key; 1-row report.
# --------------------------------------------------------------------------
@query(
    "order_total_reconciliation",
    "audit: header total vs recomputed lineitem total (integer cents), "
    "mismatch counts + worst absolute drift",
    oracle="""
    WITH recomputed AS (
      SELECT l_orderkey,
             CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                 * (1 + l_tax) * 100) AS BIGINT))
                  AS BIGINT) AS line_cents
      FROM lineitem GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN abs(CAST(floor(o_totalprice * 100) AS BIGINT)
                                  - line_cents) > 100
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_drifted,
           CAST(max(abs(CAST(floor(o_totalprice * 100) AS BIGINT)
                        - line_cents)) AS BIGINT) AS max_drift_cents
    FROM orders JOIN recomputed ON o_orderkey = l_orderkey
    """,
)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = fan_out(load_table(spark, sf_dir, "lineitem"))
    o = load_table(spark, sf_dir, "orders")
    line_cents = F.floor(
        F.col("l_extendedprice")
        * (1 - F.col("l_discount"))
        * (1 + F.col("l_tax"))
        * 100
    ).cast("bigint")
    recomputed = li.groupBy("l_orderkey").agg(
        F.sum(line_cents).alias("line_cents")
    )
    joined = o.join(recomputed, o.o_orderkey == recomputed.l_orderkey)
    drift = F.abs(
        F.floor(F.col("o_totalprice") * 100).cast("bigint")
        - F.col("line_cents")
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((drift > 100).cast("bigint")).alias("n_drifted"),
        F.max(drift).alias("max_drift_cents"),
    )


# --------------------------------------------------------------------------
# Rolling 7-day active users (WAU per day): sliding-window DISTINCT
# cannot be window-framed (distinct doesn't decompose), so each
# (user, active-day) pair is exploded to the <=7 report days it
# contributes to — a bounded factor-7 explosion over the DEDUPED
# per-day actives (not raw events), then an exact countDistinct per
# report day. Report days are clipped to the observed range so every
# window is fully covered.
# --------------------------------------------------------------------------
@query(
    "rolling_wau",
    "time series: exact 7-day rolling distinct users per day "
    "(bounded day-explosion over deduped actives)",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), bounds AS (
      SELECT min(day) AS d0, max(day) AS d1 FROM active
    ), contrib AS (
      SELECT a.user_id,
             CAST(unnest(generate_series(a.day, least(a.day + INTERVAL 6 DAY,
                  b.d1::TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS report_day
      FROM active a, bounds b
    )
    SELECT c.report_day,
           CAST(count(DISTINCT c.user_id) AS BIGINT) AS wau
    FROM contrib c, bounds b
    WHERE c.report_day >= b.d0 + INTERVAL 6 DAY
    GROUP BY c.report_day
    """,
)
def rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = fan_out(load_table(spark, sf_dir, "events"))
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    ).distinct()
    bounds = active.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    contrib = active.join(F.broadcast(bounds)).select(
        "user_id",
        "d0",
        F.explode(
            F.sequence(
                F.col("day"),
                F.least(F.date_add(F.col("day"), 6), F.col("d1")),
                F.expr("INTERVAL 1 DAY"),
            )
        ).alias("report_day"),
    )
    return (
        contrib.filter(F.col("report_day") >= F.date_add(F.col("d0"), 6))
        .groupBy("report_day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )


# --------------------------------------------------------------------------
# Bounded BFS seed expansion over the 1996 co-order graph
# (operators/bfs.py): hop-distance histogram from seed parts. The
# DuckDB oracle replays it as a recursive CTE with UNION-dedup +
# min(dist) — same min-distance semantics the anti-join enforces
# structurally on the Spark side.
# --------------------------------------------------------------------------
@query(
    "bfs_part_distance",
    "graph: 3-hop BFS from seed parts over 1996 co-orders -> distance "
    "histogram (frontier joins, visited anti-join)",
    oracle="""
    WITH RECURSIVE e0 AS (
        SELECT DISTINCT a.l_partkey AS s, b.l_partkey AS t
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        WHERE year(a.l_shipdate) = 1996 AND year(b.l_shipdate) = 1996
    ), edges AS (SELECT s AS src, t AS dst FROM e0
                 UNION ALL SELECT t, s FROM e0),
    walk(node, dist) AS (
        SELECT DISTINCT src, 0 FROM edges WHERE src < 50
        UNION
        SELECT e.dst, w.dist + 1 FROM edges e JOIN walk w ON e.src = w.node
        WHERE w.dist < 3
    ), d AS (SELECT node, min(dist) AS dist FROM walk GROUP BY node)
    SELECT CAST(dist AS INTEGER) AS dist,
           CAST(count(*) AS BIGINT) AS n_nodes
    FROM d GROUP BY dist
    """,
)
def bfs_part_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.bfs import bfs_distances
    from openaq_data_pipeline_engineering_spark.operators.pagerank import undirect

    li = fan_out(load_table(spark, sf_dir, "lineitem")).filter(
        F.year("l_shipdate") == 1996
    ).select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
        )
        .distinct()
    )
    edges = undirect(pairs)
    seeds = edges.filter(F.col("src") < 50).select(F.col("src").alias("node"))
    dist = bfs_distances(edges, seeds, max_hops=3)
    return dist.groupBy("dist").agg(F.count(F.lit(1)).alias("n_nodes"))


# --------------------------------------------------------------------------
# Hierarchical ratio-to-parent: nation revenue as ppm of its region,
# region as ppm of global — the two-level treemap/drill-down rollup.
# One aggregation at the leaf level; parent totals come from window
# sums over the AGGREGATED rows (|nations| rows, not the fact table),
# so the fact table is scanned exactly once. Integer cents end-to-end.
# --------------------------------------------------------------------------
@query(
    "hierarchical_shares",
    "rollup: nation-in-region and region-in-global revenue shares "
    "(ppm, one fact scan + window sums over aggregates)",
    oracle="""
    WITH leaf AS (
      SELECT r.r_name AS region, n.n_name AS nation,
             CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY region, nation
    )
    SELECT region, nation, cents,
           CAST((cents * 1000000)
             // sum(cents) OVER (PARTITION BY region) AS BIGINT) AS nation_ppm,
           CAST((sum(cents) OVER (PARTITION BY region) * 1000000)
             // sum(cents) OVER () AS BIGINT) AS region_ppm
    FROM leaf
    """,
)
def hierarchical_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = fan_out(load_table(spark, sf_dir, "orders"))
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    leaf = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.floor(F.col("o_totalprice") * 100).cast("bigint")).alias(
                "cents"
            )
        )
    )
    return leaf.select(
        "region",
        "nation",
        "cents",
        F.expr(
            "(cents * CAST(1000000 AS BIGINT)) "
            "div sum(cents) OVER (PARTITION BY region)"
        ).alias("nation_ppm"),
        F.expr(
            "(sum(cents) OVER (PARTITION BY region) * CAST(1000000 AS BIGINT))"
            " div sum(cents) OVER ()"
        ).alias("region_ppm"),
    )


# --------------------------------------------------------------------------
# A/B experiment readout: deterministic hash assignment + per-arm
# conversion metrics. Assignment is md5(user_id) parity — the standard
# layout-independent bucketing (same user lands in the same arm on any
# cluster, any partitioning, any day). One scan, one agg; conversion is
# integer ppm, revenue is DECIMAL-exact then DOUBLE.
# --------------------------------------------------------------------------
@query(
    "ab_experiment_report",
    "experimentation: md5-parity arm assignment + per-arm users, "
    "converters, conversion ppm, DECIMAL-exact revenue",
    oracle="""
    WITH assigned AS (
      SELECT *,
             CASE WHEN CAST(concat('0x', substr(md5(concat('exp1:',
                    CAST(user_id AS VARCHAR))), 1, 8)) AS BIGINT) % 2 = 0
                  THEN 'control' ELSE 'treatment' END AS arm
      FROM events
    )
    SELECT arm,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(count(DISTINCT CASE WHEN event_type = 'purchase'
                THEN user_id END) AS BIGINT) AS n_converters,
           CAST(1000000 * count(DISTINCT CASE WHEN event_type = 'purchase'
                THEN user_id END) // count(DISTINCT user_id) AS BIGINT)
             AS conversion_ppm,
           CAST(sum(CASE WHEN event_type = 'purchase'
                THEN CAST(value AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE)
             AS revenue
    FROM assigned GROUP BY arm
    """,
)
def ab_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    arm = F.when(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
        == 0,
        "control",
    ).otherwise("treatment")
    converters = F.count_distinct(
        F.when(F.col("event_type") == "purchase", F.col("user_id"))
    )
    return (
        ev.withColumn("arm", arm)
        .groupBy("arm")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            converters.alias("n_converters"),
            (F.lit(1_000_000) * converters / F.count_distinct("user_id"))
            .cast("bigint")
            .alias("conversion_ppm"),
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.col("value").cast("decimal(18,2)"),
                ).otherwise(F.lit(0).cast("decimal(18,2)"))
            )
            .cast("double")
            .alias("revenue"),
        )
    )


# --------------------------------------------------------------------------
# Day-of-week seasonal anomaly screen: per (event_type, ISO dow)
# baseline from the full history, then days whose count exceeds 1.1x the
# dow mean. The comparison is an integer cross-multiplication
# (10 * n * n_days > 11 * total) — no division, no floats, no ties lost.
# Scale: daily-count table is |types| x |days| after one map-combined
# agg; the baseline join keys on (event_type, dow) — co-partitioned.
# --------------------------------------------------------------------------
@query(
    "dow_anomaly_days",
    "monitoring: day-of-week seasonal baseline + integer 1.1x-mean "
    "anomaly screen per event type",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, isodow(ts) AS dow,
             count(*) AS n
      FROM events GROUP BY 1, 2, 3
    ),
    base AS (
      SELECT event_type, dow, sum(n) AS total, count(*) AS n_days
      FROM daily GROUP BY 1, 2
    )
    SELECT d.event_type, d.d, CAST(d.n AS BIGINT) AS n,
           CAST(b.total AS BIGINT) AS dow_total,
           CAST(b.n_days AS BIGINT) AS dow_days
    FROM daily d JOIN base b
      ON d.event_type = b.event_type AND d.dow = b.dow
    WHERE 10 * d.n * b.n_days > 11 * b.total
    ORDER BY d.event_type, d.d
    """,
)
def dow_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type",
            F.col("ts").cast("date").alias("d"),
            (F.weekday("ts") + 1).alias("dow"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = daily.groupBy("event_type", "dow").agg(
        F.sum("n").alias("dow_total"), F.count(F.lit(1)).alias("dow_days")
    )
    return (
        daily.join(base, on=["event_type", "dow"])
        .filter(10 * F.col("n") * F.col("dow_days") > 11 * F.col("dow_total"))
        .select(
            "event_type",
            "d",
            F.col("n").cast("bigint").alias("n"),
            F.col("dow_total").cast("bigint").alias("dow_total"),
            F.col("dow_days").cast("bigint").alias("dow_days"),
        )
        .orderBy("event_type", "d")
    )


# --------------------------------------------------------------------------
# Physical join-strategy control surface: the SAME logical join
# evaluated under the three join-strategy hints Spark exposes
# (broadcast / merge / shuffle_hash). The declared result proves
# result-set invariance across physical strategies; the companion
# pytest (tests/test_join_strategies.py) asserts each hint actually
# selects its operator (BroadcastHashJoin / SortMergeJoin /
# ShuffledHashJoin). At 100 TB this is the knob set an operator uses
# when AQE's choice is wrong: broadcast for under-threshold dims,
# shuffle_hash to skip the sort when one side is modest, merge for
# two huge sorted sides.
# --------------------------------------------------------------------------
@query(
    "join_strategy_control",
    "engine control: identical aggregate under broadcast / merge / "
    "shuffle_hash join hints — physical strategy changes, result not",
    oracle="""
    WITH agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS revenue
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_mktsegment = 'BUILDING'
    )
    SELECT s.strategy, a.n_rows, a.revenue
    FROM (VALUES ('broadcast'), ('merge'), ('shuffle_hash')) s(strategy)
    CROSS JOIN agg a
    """,
)
def join_strategy_control(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )

    def one(strategy: str, dim: DataFrame) -> DataFrame:
        return (
            orders.join(dim, orders["o_custkey"] == dim["c_custkey"])
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
            )
            .select(F.lit(strategy).alias("strategy"), "n_rows", "revenue")
        )

    return (
        one("broadcast", F.broadcast(cust))
        .unionByName(one("merge", cust.hint("merge")))
        .unionByName(one("shuffle_hash", cust.hint("shuffle_hash")))
    )


# --------------------------------------------------------------------------
# SCD2 point-in-time join: events resolve the dimension VERSION that
# was effective at each event's timestamp — the temporal-correctness
# join every slowly-changing warehouse needs (joining "current"
# attributes silently rewrites history). The effective-dated history
# is derived deterministically here (era 1 for every customer at
# 2024-01-01, era 2 for custkey % 3 == 0 at 2024-01-15).
# Implementation is the as-of operator (operators/asof.py): history
# rows and events union into ONE keyed window with a struct-atomic
# carry-forward — 1 shuffle, no range/theta join, linear at any scale.
# DuckDB's native ASOF JOIN is the oracle.
# --------------------------------------------------------------------------
_SCD2_HIST_SQL = """
    SELECT c_custkey, concat('OLD:', c_mktsegment) AS seg,
           TIMESTAMP '2024-01-01 00:00:00' AS valid_from
    FROM customer
    UNION ALL
    SELECT c_custkey, concat('NEW:', c_mktsegment) AS seg,
           TIMESTAMP '2024-01-15 00:00:00' AS valid_from
    FROM customer WHERE c_custkey % 3 = 0
"""


@query(
    "scd2_point_in_time_join",
    "warehouse: events joined to the SCD2 dimension version effective "
    "at event time (as-of union+window, no range join); per-era rollup",
    oracle=f"""
    WITH hist AS ({_SCD2_HIST_SQL})
    SELECT seg,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM (
      SELECT e.user_id, h.seg
      FROM events e
      ASOF JOIN hist h
        ON e.user_id = h.c_custkey AND e.ts >= h.valid_from
    ) GROUP BY seg
    """,
)
def scd2_point_in_time_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.asof import asof_join

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    era1 = cust.select(
        F.col("c_custkey").alias("user_id"),
        F.concat(F.lit("OLD:"), "c_mktsegment").alias("seg"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts"),
    )
    era2 = (
        cust.filter(F.col("c_custkey") % 3 == 0)
        .select(
            F.col("c_custkey").alias("user_id"),
            F.concat(F.lit("NEW:"), "c_mktsegment").alias("seg"),
            F.lit("2024-01-15 00:00:00").cast("timestamp").alias("ts"),
        )
    )
    hist = era1.unionByName(era2)
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    joined = asof_join(
        ev,
        hist,
        on=["user_id"],
        ts_col="ts",
        value_cols=["seg"],
        tiebreaker="seg",
    )
    return (
        joined.filter(F.col("seg_asof").isNotNull())
        .groupBy(F.col("seg_asof").alias("seg"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
        )
    )


# --------------------------------------------------------------------------
# Winsorized statistics: the robust-mean companion to outlier_mad —
# exact p5/p95 percentiles per group (two-pass: percentile agg, then a
# co-partitioned join back onto the rows), values clipped into the
# band before the mean. Float policy: clipped values are identical
# doubles in both engines (clip of identical inputs against identical
# interpolated bounds) but do NOT sit on a decimal grid, so the sum is
# taken in DECIMAL(18,6) (order-independent, double->decimal conversion
# is deterministic on both sides) and divided as DOUBLE.
# --------------------------------------------------------------------------
@query(
    "winsorized_stats",
    "robust stats: per-type p5/p95 winsorized mean vs raw mean "
    "(exact percentiles, two-pass clip)",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             percentile_cont(0.05) WITHIN GROUP (ORDER BY value) AS lo,
             percentile_cont(0.95) WITHIN GROUP (ORDER BY value) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(e.value), 2) / count(*) AS raw_mean,
           CAST(sum(CAST(least(greatest(e.value, b.lo), b.hi)
                          AS DECIMAL(18,6))) AS DOUBLE) / count(*)
             AS winsor_mean,
           b.lo, b.hi
    FROM events e JOIN bounds b ON e.event_type = b.event_type
    GROUP BY e.event_type, b.lo, b.hi
    """,
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.05)).alias("lo"),
        F.percentile("value", F.lit(0.95)).alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(bounds, on="event_type")
        .groupBy("event_type", "lo", "hi")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.sum("value"), 2) / F.count(F.lit(1))).alias(
                "raw_mean"
            ),
            (
                F.sum(clipped.cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("winsor_mean"),
        )
        .select("event_type", "n", "raw_mean", "winsor_mean", "lo", "hi")
    )


# --------------------------------------------------------------------------
# Linear multi-touch attribution with EXACT penny allocation: each
# purchase's value (in integer cents) splits equally across the user's
# clicks in the preceding 7 days; the integer remainder goes to the
# EARLIEST click (event_id tiebreak), so attributed cents sum exactly
# to purchase cents — conservation is provable, no float drift.
# Scale: the purchase⋈click join is EQUI on user_id with a time-band
# post-filter — output bounded by per-user activity within the window
# (pre-bucketing by (user, week) co-locates it at 100 TB); allocation
# is a per-purchase window rank, attributed rollup is map-combined.
# --------------------------------------------------------------------------
@query(
    "multitouch_attribution",
    "marketing: linear multi-touch attribution, 7-day lookback, exact "
    "integer penny allocation (remainder to earliest click)",
    oracle="""
    WITH purchases AS (
      SELECT event_id AS pid, user_id, ts,
             CAST(round(value * 100) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    ),
    clicks AS (
      SELECT event_id AS cid, user_id, ts AS cts
      FROM events WHERE event_type = 'click'
    ),
    pairs AS (
      SELECT p.pid, p.cents, c.cid, c.cts,
             count(*) OVER (PARTITION BY p.pid) AS n,
             row_number() OVER (
               PARTITION BY p.pid ORDER BY c.cts, c.cid) AS rn
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id
       AND c.cts <= p.ts AND c.cts > p.ts - INTERVAL 7 DAY
    ),
    alloc AS (
      SELECT CAST(cts AS DATE) AS click_date,
             cents // n + CASE WHEN rn = 1 THEN cents % n ELSE 0 END
               AS acents
      FROM pairs
    )
    SELECT click_date,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(acents) AS BIGINT) AS attributed_cents
    FROM alloc GROUP BY click_date
    """,
)
def multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        "ts",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("cts"),
    )
    pairs = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("cts") <= F.col("ts"))
        & (F.col("cts") > F.col("ts") - F.expr("INTERVAL 7 DAY")),
    )
    wn = Window.partitionBy("pid")
    wr = Window.partitionBy("pid").orderBy("cts", "cid")
    alloc = (
        pairs.withColumn("n", F.count(F.lit(1)).over(wn))
        .withColumn("rn", F.row_number().over(wr))
        .select(
            F.col("cts").cast("date").alias("click_date"),
            (
                F.expr("cents div n")
                + F.when(F.col("rn") == 1, F.col("cents") % F.col("n"))
                .otherwise(F.lit(0))
            ).alias("acents"),
        )
    )
    return alloc.groupBy("click_date").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.sum("acents").cast("bigint").alias("attributed_cents"),
    )


# --------------------------------------------------------------------------
# Event-transition matrix (first-order Markov): per-user event streams
# ordered by time, consecutive (from -> to) transitions counted and
# normalized to ppm per source state. One window (lag over user/ts —
# shares the sessionization sort) + one map-combined aggregation;
# transition space is |types|² regardless of corpus size.
# --------------------------------------------------------------------------
@query(
    "event_transition_matrix",
    "behavior: first-order Markov transition counts + ppm row "
    "normalization over per-user ordered event streams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS to_state, ts, event_id,
             lag(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS from_state
      FROM events
    ),
    trans AS (
      SELECT from_state, to_state, count(*) AS n
      FROM seq WHERE from_state IS NOT NULL GROUP BY 1, 2
    )
    SELECT from_state, to_state, CAST(n AS BIGINT) AS n,
           CAST(1000000 * n // sum(n) OVER (PARTITION BY from_state)
                AS BIGINT) AS p_ppm
    FROM trans
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("from_state", F.lag("event_type").over(w))
    trans = (
        seq.filter(F.col("from_state").isNotNull())
        .groupBy("from_state", F.col("event_type").alias("to_state"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wrow = Window.partitionBy("from_state")
    return trans.select(
        "from_state",
        "to_state",
        F.col("n").cast("bigint").alias("n"),
        F.expr("1000000 * n div sum(n) over (partition by from_state)")
        .cast("bigint")
        .alias("p_ppm"),
    )


# --------------------------------------------------------------------------
# Referential-integrity audit: orphan counts across the star schema's
# FK edges in one report — the cross-TABLE data-quality complement to
# dq_expectations (cross-COLUMN). Each edge is a left-anti join on the
# key (co-partitioned shuffle, map-combined count); at 100 TB each
# check is one pass over the child table with the parent's keys as the
# build side.
# --------------------------------------------------------------------------
@query(
    "referential_integrity_audit",
    "data quality: FK orphan counts (lineitem->orders, orders->customer, "
    "customer->nation) in one report",
    oracle="""
    SELECT 'lineitem.l_orderkey->orders' AS fk_edge,
           CAST((SELECT count(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT) AS n_orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey))
                AS BIGINT)
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           CAST((SELECT count(*) FROM customer c
                 WHERE NOT EXISTS (SELECT 1 FROM nation n
                                   WHERE n.n_nationkey = c.c_nationkey))
                AS BIGINT)
    """,
)
def referential_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey")

    def orphans(child, key, parent, pkey, label):
        n = (
            child.join(parent, child[key] == parent[pkey], "left_anti")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_orphans"))
        )
        return n.select(F.lit(label).alias("fk_edge"), "n_orphans")

    return (
        orphans(li, "l_orderkey", orders, "o_orderkey",
                "lineitem.l_orderkey->orders")
        .unionByName(orphans(orders, "o_custkey", cust, "c_custkey",
                             "orders.o_custkey->customer"))
        .unionByName(orphans(cust, "c_nationkey", nation, "n_nationkey",
                             "customer.c_nationkey->nation"))
    )


# --------------------------------------------------------------------------
# Month-over-month growth (integer ppm): lag window over the monthly
# rollup — the growth-rate analytic every reporting layer needs, kept
# division-safe (ppm cross-multiplication, NULL first month).
# --------------------------------------------------------------------------
@query(
    "mom_growth",
    "reporting: month-over-month event-count growth in ppm "
    "(lag window over monthly rollup, integer-exact)",
    oracle="""
    WITH monthly AS (
      SELECT event_type, date_trunc('month', ts) AS m, count(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, m, CAST(n AS BIGINT) AS n,
           CAST(1000000 * (n - lag(n) OVER w) // lag(n) OVER w AS BIGINT)
             AS growth_ppm
    FROM monthly
    WINDOW w AS (PARTITION BY event_type ORDER BY m)
    """,
)
def mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    monthly = ev.groupBy(
        "event_type", F.date_trunc("month", "ts").alias("m")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("event_type").orderBy("m")
    prev = F.lag("n").over(w)
    return monthly.select(
        "event_type",
        "m",
        F.col("n").cast("bigint").alias("n"),
        # DuckDB // and Spark div both truncate toward zero, so the
        # integer growth rate matches even when the diff is negative
        F.when(
            prev.isNotNull(),
            F.expr("(1000000 * (n - lag(n) over "
                   "(partition by event_type order by m))) div "
                   "lag(n) over (partition by event_type order by m)"),
        )
        .cast("bigint")
        .alias("growth_ppm"),
    )


def gap_islands(ids: DataFrame, id_col: str, bucket_size: int) -> DataFrame:
    """Contiguous-run islands of a unique integer id column, without a
    global row sort: per-bucket windows (parallel), then a merge pass
    over the island table (tiny) chaining runs across bucket edges."""
    bucket = F.expr(f"{id_col} div {bucket_size}")
    wb = Window.partitionBy("bucket").orderBy(id_col)
    local = (
        ids.withColumn("bucket", bucket)
        .withColumn("grp", F.col(id_col) - F.row_number().over(wb))
        .groupBy("bucket", "grp")
        .agg(
            F.min(id_col).alias("island_start"),
            F.max(id_col).alias("island_end"),
            F.count(F.lit(1)).cast("bigint").alias("island_len"),
        )
        .drop("bucket", "grp")
    )
    # Merge pass: islands touching end-to-start share a constant
    # (island_start - cumulative covered length) grouping key.
    wg = Window.orderBy("island_start")
    return (
        local.withColumn(
            "mgrp",
            F.col("island_start")
            - F.coalesce(
                F.sum("island_len").over(
                    wg.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ).cast("bigint"),
        )
        .groupBy("mgrp")
        .agg(
            F.min("island_start").alias("island_start"),
            F.max("island_end").alias("island_end"),
            F.sum("island_len").cast("bigint").alias("island_len"),
        )
        .drop("mgrp")
    )



# --------------------------------------------------------------------------
# Gaps and islands, scale-safe two-level form. The textbook
# id - row_number() trick needs ONE global sort — an unpartitioned
# window (single reducer) at scale. Instead: detect islands WITHIN
# fixed id-range buckets (window partitioned by bucket — parallel),
# then merge islands that touch across bucket boundaries with a second
# pass over the ISLAND table, which is orders of magnitude smaller
# than the data (its global window is driver-cheap by construction).
# The oracle uses the simple global form — results are identical.
# --------------------------------------------------------------------------
@query(
    "id_gap_islands",
    "data quality: contiguous event_id islands, bucketed two-level "
    "detection (no global row sort); top-10 largest islands",
    oracle="""
    WITH marked AS (
      SELECT event_id,
             event_id - row_number() OVER (ORDER BY event_id) AS grp
      FROM events
    ),
    islands AS (
      SELECT min(event_id) AS island_start, max(event_id) AS island_end,
             count(*) AS island_len
      FROM marked GROUP BY grp
    )
    SELECT island_start, island_end, CAST(island_len AS BIGINT) AS island_len
    FROM islands
    ORDER BY island_len DESC, island_start
    LIMIT 10
    """,
)
def id_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id")
    return (
        gap_islands(ev, "event_id", bucket_size=100_000)
        .orderBy(F.desc("island_len"), "island_start")
        .limit(10)
    )


# --------------------------------------------------------------------------
# Equi-width histogram: integer bin = value div width — one
# map-combined aggregation, bins ∝ value range. The classic
# distribution profile (token_length_histogram is the log2 variant).
# --------------------------------------------------------------------------
@query(
    "histogram_equi_width",
    "profiling: equi-width value histogram per event type "
    "(width 25, integer bins, map-combined)",
    oracle="""
    SELECT event_type,
           CAST(floor(value / 25) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / 25).cast("bigint").alias("bin"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --------------------------------------------------------------------------
# Window-free per-group argmax: max_by with a composite (value, id)
# tiebreaker — a plain AGGREGATE, so it map-side combines and never
# materializes per-group sorted runs; at scale this beats the
# row_number()=1 window for top-1 (the window needs a full per-key
# sort; the agg keeps one candidate per partition). The oracle proves
# equivalence against the window form.
# --------------------------------------------------------------------------
@query(
    "argmax_no_window",
    "engine pattern: top-1 per group as a map-combined max_by "
    "aggregate (no window sort), deterministic composite tiebreak",
    oracle="""
    SELECT event_type, event_id AS top_event_id,
           value AS top_value
    FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value DESC, event_id DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def argmax_no_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    best = F.max(F.struct("value", "event_id")).alias("b")
    return (
        ev.groupBy("event_type")
        .agg(best)
        .select(
            "event_type",
            F.col("b.event_id").alias("top_event_id"),
            F.col("b.value").alias("top_value"),
        )
    )


# --------------------------------------------------------------------------
# OLS daily trend (closed form, integer-exact): slope of daily counts
# per event type from the exact moment sums (n, Σx, Σy, Σxy, Σx²) with
# x = days since epoch — emitted as an exact integer rational
# (numerator/denominator) plus a ppm-scaled slope, so no float enters
# the computation. The moments are one map-combined aggregation; this
# is the trend-detection analytic behind capacity forecasts.
#   slope = (n·Σxy − Σx·Σy) / (n·Σx² − Σx²)
# --------------------------------------------------------------------------
@query(
    "trend_ols_daily",
    "analytics: per-type OLS slope of daily event counts — exact "
    "integer moment sums, rational + ppm-scaled outputs",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT event_type, n,
           CAST(n * sxy - sx * sy AS BIGINT) AS slope_num,
           CAST(n * sxx - sx * sx AS BIGINT) AS slope_den,
           CAST((1000000 * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
                AS BIGINT) AS slope_ppm
    FROM m
    """,
)
def trend_ols_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("x"),
    ).agg(F.count(F.lit(1)).alias("y"))
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    m2 = m.select(
        "event_type",
        "n",
        num.cast("bigint").alias("slope_num"),
        den.cast("bigint").alias("slope_den"),
    )
    # INTEGER division: DuckDB's // and Spark's `div` BOTH truncate
    # toward zero (verified: -7 // 2 = -3 in DuckDB), so plain div
    # matches on negative slopes too; `/` would go through double and
    # lose precision past 2^53.
    return m2.withColumn(
        "slope_ppm",
        F.expr("(slope_num * 1000000) div slope_den").cast("bigint"),
    )


# --------------------------------------------------------------------------
# Max concurrent users (sweep line): each user's daily active interval
# becomes a +1/-1 boundary pair; a running sum ordered by time inside
# each day gives the concurrency curve, whose max is the answer. The
# window partitions by DAY — parallel across days, linear per day; no
# interval self-join (the naive overlap join is quadratic per day).
# Ends sort before starts at the same instant via the delta ordering
# (an interval touching another's endpoint does not overlap it).
# --------------------------------------------------------------------------
@query(
    "max_concurrent_users",
    "intervals: peak concurrent users per day (sweep-line +1/-1 "
    "running sum, no interval self-join)",
    oracle="""
    WITH intervals AS (
      SELECT user_id, CAST(ts AS DATE) AS d, min(ts) AS s, max(ts) AS e
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT d, s AS t, 1 AS delta FROM intervals
      UNION ALL
      SELECT d, e, -1 FROM intervals
    ),
    curve AS (
      SELECT d,
             sum(delta) OVER (
               PARTITION BY d ORDER BY t, delta
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS conc
      FROM bounds
    )
    SELECT d, CAST(max(conc) AS BIGINT) AS peak_concurrent
    FROM curve GROUP BY d
    """,
)
def max_concurrent_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    intervals = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("d")
    ).agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    bounds = intervals.select(
        "d", F.col("s").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        intervals.select("d", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    w = (
        Window.partitionBy("d")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    curve = bounds.withColumn("conc", F.sum("delta").over(w))
    return curve.groupBy("d").agg(
        F.max("conc").cast("bigint").alias("peak_concurrent")
    )


# --------------------------------------------------------------------------
# Conversion-delay quantiles: exact p50/p90 of click->purchase delay
# (same interval pairs as the attribution joins, integer microseconds
# so the percentile interpolation is over exact values).
# --------------------------------------------------------------------------
@query(
    "conversion_delay_quantiles",
    "funnel latency: exact p50/p90 click->purchase delay (integer "
    "microseconds, 10-minute attribution window)",
    oracle="""
    WITH pairs AS (
      SELECT epoch_us(p.ts) - epoch_us(c.ts) AS delay_us
      FROM events c JOIN events p
        ON c.user_id = p.user_id
       AND c.event_type = 'click' AND p.event_type = 'purchase'
       AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 10 MINUTE
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY delay_us) AS p50_us,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY delay_us) AS p90_us
    FROM pairs
    """,
)
def conversion_delay_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts")
    )
    pairs = c.join(
        p,
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 10 MINUTES")),
    ).select(
        (F.unix_micros("pts") - F.unix_micros("cts")).alias("delay_us")
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.percentile("delay_us", F.lit(0.5)).alias("p50_us"),
        F.percentile("delay_us", F.lit(0.9)).alias("p90_us"),
    )


# --------------------------------------------------------------------------
# OHLC resampling: open/high/low/close per (event_type, 4-hour bar) —
# the time-series downsampling shape. Open/close are window rank-1
# picks with (ts, event_id) total order (WindowGroupLimit keeps them
# partial before the exchange); high/low are plain map-combined
# min/max on the same grouping. One shuffle on the bar key.
# --------------------------------------------------------------------------
@query(
    "ohlc_bars",
    "time series: 4-hour OHLC bars per event type (rank-1 open/close, "
    "exact doubles, map-combined high/low)",
    oracle="""
    WITH binned AS (
      SELECT event_type, event_id, value, ts,
             time_bucket(INTERVAL 4 HOUR, ts) AS bar
      FROM events
    ),
    oc AS (
      SELECT event_type, bar, value, ts, event_id,
             row_number() OVER (PARTITION BY event_type, bar
                                ORDER BY ts, event_id) AS rn_open,
             row_number() OVER (PARTITION BY event_type, bar
                                ORDER BY ts DESC, event_id DESC) AS rn_close
      FROM binned
    )
    SELECT b.event_type, b.bar,
           CAST(count(*) AS BIGINT) AS n,
           min(b.value) AS low, max(b.value) AS high,
           max(CASE WHEN o.rn_open = 1 THEN o.value END) AS open,
           max(CASE WHEN o.rn_close = 1 THEN o.value END) AS close
    FROM binned b
    JOIN oc o ON o.event_type = b.event_type AND o.bar = b.bar
             AND o.event_id = b.event_id
    GROUP BY 1, 2
    """,
)
def ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        "event_id",
        "value",
        "ts",
        F.window("ts", "4 hours").getField("start").alias("bar"),
    )
    wo = Window.partitionBy("event_type", "bar").orderBy("ts", "event_id")
    wc = Window.partitionBy("event_type", "bar").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    marked = binned.withColumn(
        "rn_open", F.row_number().over(wo)
    ).withColumn("rn_close", F.row_number().over(wc))
    return marked.groupBy("event_type", "bar").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("low"),
        F.max("value").alias("high"),
        F.max(F.when(F.col("rn_open") == 1, F.col("value"))).alias("open"),
        F.max(F.when(F.col("rn_close") == 1, F.col("value"))).alias("close"),
    )


# --------------------------------------------------------------------------
# Debounce / telemetry dedup: collapse repeats of the same
# (user, event_type) arriving within 5 minutes of the PREVIOUS KEPT
# event — the sequential rule (not bucket-floor dedup, which splits at
# bucket edges). Chain: lag-gap marks a new burst when the gap from
# the previous event exceeds the threshold; the first event of each
# burst is kept. Windows partition by the entity key — co-partitioned
# with the sessionization family, linear per key at any scale.
# NOTE this equals "first of each burst" where bursts chain on
# inter-event gaps; an event 4 min after a kept one but 6 min after
# the burst head still collapses (chained debounce, the common
# telemetry semantic).
# --------------------------------------------------------------------------
@query(
    "debounce_dedup",
    "telemetry: chained 5-minute debounce per (user, type) — burst "
    "heads kept, repeats collapsed; per-type kept/dropped counts",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_type, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w > INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS is_head
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY ts, event_id)
    )
    SELECT event_type,
           CAST(sum(is_head) AS BIGINT) AS n_kept,
           CAST(sum(1 - is_head) AS BIGINT) AS n_collapsed
    FROM marked GROUP BY event_type
    """,
)
def debounce_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    prev = F.lag("ts").over(w)
    is_head = F.when(
        prev.isNull()
        | (F.col("ts") > prev + F.expr("INTERVAL 5 MINUTES")),
        1,
    ).otherwise(0)
    return (
        ev.withColumn("is_head", is_head)
        .groupBy("event_type")
        .agg(
            F.sum("is_head").cast("bigint").alias("n_kept"),
            F.sum(1 - F.col("is_head")).cast("bigint").alias("n_collapsed"),
        )
    )


# --------------------------------------------------------------------------
# Longest activity streak per user: consecutive-day runs via the
# per-key day-minus-dense-rank grouping (windows PARTITIONED by user —
# parallel across keys, unlike the global-sequence variant which needs
# the bucketed two-level treatment, id_gap_islands). Top-10 streaks
# with full total order.
# --------------------------------------------------------------------------
@query(
    "longest_user_streaks",
    "engagement: longest consecutive-day streak per user (per-key "
    "islands grouping), top-10",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    grp AS (
      SELECT user_id, d,
             d - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY d) AS INT) AS g
      FROM days
    ),
    streaks AS (
      SELECT user_id, min(d) AS streak_start, count(*) AS len
      FROM grp GROUP BY user_id, g
    )
    SELECT user_id, streak_start, CAST(len AS BIGINT) AS streak_days
    FROM streaks
    ORDER BY len DESC, user_id, streak_start
    LIMIT 10
    """,
)
def longest_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    grp = days.withColumn(
        "g", F.expr("date_sub(d, row_number() over "
                    "(partition by user_id order by d))")
    )
    streaks = grp.groupBy("user_id", "g").agg(
        F.min("d").alias("streak_start"),
        F.count(F.lit(1)).cast("bigint").alias("streak_days"),
    )
    return (
        streaks.drop("g")
        .orderBy(F.desc("streak_days"), "user_id", "streak_start")
        .limit(10)
    )
