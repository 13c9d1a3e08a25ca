"""Remaining TPC-H query shapes (Q2/Q7/Q8/Q9/Q11/Q15/Q16/Q20/Q21/Q22)
adapted to this star schema.

The driver's tables have no ``partsupp`` relation and no
commit/receipt dates, so each shape keeps the REFERENCE QUERY'S PLAN
STRUCTURE (the part Catalyst must get right at 100 TB — correlated
subquery decorrelation, scalar-subquery HAVING, NOT-IN anti joins,
double-EXISTS self joins) while substituting the nearest available
relation: ``lineitem`` is the part↔supplier bridge where ``partsupp``
would be, and ``l_shipdate`` orders events where receipt/commit dates
would.

Money arithmetic follows the registry float policy: sum in
DECIMAL(18,2) (order-independent, engine-exact), cast the result to
DOUBLE. Ratios divide two such exact doubles — bit-identical across
engines. Scalar subqueries (Q11 threshold, Q15 max, Q22 average)
become 1-row aggregates broadcast-joined against the main plan, the
same rewrite Catalyst applies to uncorrelated scalar subqueries —
no driver round-trip, no collect().

Scale notes (100 TB): every per-group "max / second-max / count"
correlated predicate is decorrelated into hash aggregations on the
correlation key, so the heavy relation is shuffled at most twice on
an evenly distributed key (orderkey / partkey / suppkey); nation and
region joins are broadcast; nothing materializes an unbounded pair
set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import load_table

_REV = (
    "CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))"
    " * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)"
)


def _revenue_col() -> F.Column:
    return F.sum(
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("double")


# --------------------------------------------------------------------------
# Q2 shape: correlated MAX subquery per part — "for each qualifying
# part, the best supplier that ships it" (acctbal stands in for the
# missing ps_supplycost; lineitem is the part↔supplier bridge).
# Decorrelated into groupBy(part).max + equi-join, exactly what
# Catalyst does with the correlated form. Ties on the max keep all
# rows, as in TPC-H Q2.
# --------------------------------------------------------------------------
@query(
    "best_supplier_q2",
    "TPC-H Q2 shape: per-part best supplier via correlated max, region-scoped",
    oracle="""
    WITH bridge AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), cand AS (
        SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
        FROM part
        JOIN bridge ON p_partkey = l_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE p_size = 15 AND p_type = 'SMALL' AND r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name
    FROM cand c
    WHERE s_acctbal = (SELECT max(s_acctbal) FROM cand m
                       WHERE m.p_partkey = c.p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 20
    """,
)
def best_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    bridge = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    cand = (
        bridge.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    best = cand.groupBy(F.col("p_partkey").alias("bk")).agg(
        F.max("s_acctbal").alias("best_bal")
    )
    return (
        cand.join(
            best,
            (F.col("p_partkey") == F.col("bk"))
            & (F.col("s_acctbal") == F.col("best_bal")),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q7 shape: volume shipping between two nations, both directions, by
# ship year. 6-table join; the two nation joins are broadcast and the
# pair filter collapses to a tiny IN before the fact shuffle.
# --------------------------------------------------------------------------
@query(
    "volume_shipping_q7",
    "TPC-H Q7 shape: bilateral supplier→customer nation revenue by ship year",
    oracle=f"""
    SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year, {_REV} AS revenue
    FROM lineitem
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ns ON s_nationkey = ns.n_nationkey
    JOIN nation nc ON c_nationkey = nc.n_nationkey
    WHERE ((ns.n_name = 'NATION_1' AND nc.n_name = 'NATION_2')
        OR (ns.n_name = 'NATION_2' AND nc.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    ns = nat.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nat.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(_revenue_col().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


# --------------------------------------------------------------------------
# Q8 shape: market share — the target nation's fraction of regional
# revenue per order year. Conditional numerator over a 7-table join;
# the share divides two DECIMAL-exact doubles (bit-identical across
# engines, no rounding needed).
# --------------------------------------------------------------------------
@query(
    "market_share_q8",
    "TPC-H Q8 shape: NATION_3's share of ASIA ECONOMY-part revenue per year",
    oracle="""
    WITH flat AS (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l_discount AS DECIMAL(18,2)) AS vol,
               ns.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation nc ON c_nationkey = nc.n_nationkey
        JOIN region   ON nc.n_regionkey = r_regionkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation ns ON s_nationkey = ns.n_nationkey
        WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN vol
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(sum(vol) AS DOUBLE) AS mkt_share
    FROM flat GROUP BY o_year ORDER BY o_year
    """,
)
def market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nc = nat.select("n_nationkey", "n_regionkey")
    ns = nat.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)")
    flat = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("vol"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,2)")
    return (
        flat.groupBy("o_year")
        .agg(
            (
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", F.col("vol")).otherwise(
                        zero
                    )
                ).cast("double")
                / F.sum("vol").cast("double")
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# --------------------------------------------------------------------------
# Q9 shape: product-type profit by supplier nation and year. Profit =
# revenue − retail cost of goods (p_retailprice × quantity stands in
# for the missing ps_supplycost). Exact DECIMAL accumulation.
# --------------------------------------------------------------------------
@query(
    "product_profit_q9",
    "TPC-H Q9 shape: widget-part profit by supplier nation and ship year",
    oracle="""
    SELECT n_name AS nation, CAST(year(l_shipdate) AS INTEGER) AS o_year,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))
                    - CAST(p_retailprice AS DECIMAL(18,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY 1, 2 DESC
    """,
)
def product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(18,2)") - F.col("p_retailprice").cast("decimal(18,2)") * F.col(
        "l_quantity"
    ).cast("decimal(18,2)")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


# --------------------------------------------------------------------------
# Q11 shape: scalar subquery in HAVING — suppliers whose shipped value
# inside one region exceeds a fraction of the region total. The global
# total is a 1-row aggregate broadcast against the per-supplier rollup
# (Catalyst's own rewrite for uncorrelated scalar subqueries).
# --------------------------------------------------------------------------
@query(
    "important_suppliers_q11",
    "TPC-H Q11 shape: ASIA suppliers holding >1.5% of regional shipped value",
    oracle=f"""
    WITH scoped AS (
        SELECT l_suppkey, l_extendedprice, l_discount
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
    ), per_supp AS (
        SELECT l_suppkey AS s_key, {_REV} AS value
        FROM scoped GROUP BY 1
    ), total AS (
        SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                        * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
                   AS grand
        FROM scoped
    )
    SELECT s_key AS l_suppkey, value
    FROM per_supp, total
    WHERE value > grand * 0.015
    ORDER BY value DESC, l_suppkey
    """,
)
def important_suppliers_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    scoped = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("l_suppkey", "l_extendedprice", "l_discount")
    )
    per_supp = scoped.groupBy(F.col("l_suppkey").alias("s_key")).agg(
        _revenue_col().alias("value")
    )
    total = scoped.agg(_revenue_col().alias("grand"))
    return (
        per_supp.join(F.broadcast(total))
        .filter(F.col("value") > F.col("grand") * 0.015)
        .select(F.col("s_key").alias("l_suppkey"), "value")
        .orderBy(F.desc("value"), "l_suppkey")
    )


# --------------------------------------------------------------------------
# Q15 shape: top supplier — revenue per supplier over a quarter, keep
# the supplier(s) achieving the maximum (scalar-subquery max, kept as
# a tie-preserving equality as in the spec's view form).
# --------------------------------------------------------------------------
@query(
    "top_supplier_q15",
    "TPC-H Q15 shape: supplier(s) with maximum revenue in 1996Q1",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no, {_REV} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    ORDER BY s_suppkey
    """,
)
def top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _revenue_col().alias("total_revenue")
    )
    top = rev.agg(F.max("total_revenue").alias("best"))
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("best"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 shape: supplier diversity per part group with a NOT-IN exclusion
# list (suppliers in deficit stand in for the complaints filter).
# NOT IN over a non-null key → left_anti join, the plan Catalyst
# produces for the subquery form.
# --------------------------------------------------------------------------
@query(
    "supplier_diversity_q16",
    "TPC-H Q16 shape: distinct non-excluded suppliers per brand/type/size",
    oracle="""
    WITH excluded AS (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
    ), bridge AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
        WHERE l_suppkey NOT IN (SELECT s_suppkey FROM excluded)
    )
    SELECT p_brand, p_type, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt
    FROM part JOIN bridge ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    LIMIT 30
    """,
)
def supplier_diversity_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49)
    )
    excluded = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    bridge = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
        .join(
            F.broadcast(excluded),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        bridge.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(30)
    )


# --------------------------------------------------------------------------
# Q20 shape: nested-IN promotion screen — suppliers who shipped more
# than a threshold quantity of the promoted ('red …') parts in 1996,
# scoped to one region. Both IN-subqueries decorrelate to semi joins;
# the quantity screen is a hash aggregate on (supp, part).
# --------------------------------------------------------------------------
@query(
    "promotion_suppliers_q20",
    "TPC-H Q20 shape: EUROPE suppliers shipping >60 units of red parts in 1996",
    oracle="""
    WITH red_parts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
    ), shipped AS (
        SELECT l_suppkey, l_partkey,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty
        FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM red_parts)
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    )
    SELECT DISTINCT s_suppkey, s_name, n_name
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
      AND s_suppkey IN (SELECT l_suppkey FROM shipped WHERE qty > 60)
    ORDER BY s_suppkey
    """,
)
def promotion_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    shipped = (
        li.join(F.broadcast(red), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("qty"))
        .filter(F.col("qty") > 60)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        supp.join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(shipped, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q21 shape: double EXISTS / NOT-EXISTS self join — per supplier, the
# lineitems of multi-supplier 'F' orders where no OTHER supplier
# shipped later. Decorrelated Spark-side into two order-level hash
# aggregates (per-(order,supp) max, then order max / runner-up /
# supplier count) instead of two correlated probes of lineitem —
# the fact table shuffles twice on evenly-keyed orderkey, never
# self-joins row-to-row.
# --------------------------------------------------------------------------
@query(
    "waiting_suppliers_q21",
    "TPC-H Q21 shape: suppliers who shipped last in multi-supplier F-orders",
    oracle="""
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > l1.l_shipdate)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def waiting_suppliers_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load_table(spark, sf_dir, "supplier")
    # Per-(order, supplier) latest shipment.
    per_supp = li.groupBy(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    ).agg(F.max("l_shipdate").alias("smax"))
    # Order level over a single window partitioning: #suppliers, latest
    # shipment, how many suppliers hit it, and the runner-up — enough to
    # evaluate "max over the OTHER suppliers" for any supplier without a
    # self-join. Both window passes share the partitioning, so this is
    # ONE exchange on ok (vs three aggregate+join branches).
    w = Window.partitionBy("ok")
    s1 = per_supp.select(
        "ok",
        "sk",
        "smax",
        F.count(F.lit(1)).over(w).alias("nsupp"),
        F.max("smax").over(w).alias("m1"),
    )
    s2 = s1.select(
        "ok",
        "sk",
        "smax",
        "nsupp",
        "m1",
        F.max(F.when(F.col("smax") < F.col("m1"), F.col("smax")))
        .over(w)
        .alias("m2"),
        F.sum(F.when(F.col("smax") == F.col("m1"), 1).otherwise(0))
        .over(w)
        .alias("cnt1"),
    )
    # others_max for supplier s: m1 unless s alone achieves it (then m2).
    qualifying = (
        s2.filter(F.col("nsupp") > 1)
        .withColumn(
            "others_max",
            F.when(
                (F.col("smax") == F.col("m1")) & (F.col("cnt1") == 1), F.col("m2")
            ).otherwise(F.col("m1")),
        )
        .select("ok", "sk", "others_max")
    )
    # Back to lineitem grain: l1 qualifies iff no other supplier shipped
    # strictly later, i.e. l1.shipdate >= others_max.
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            qualifying,
            (F.col("l_orderkey") == F.col("ok")) & (F.col("l_suppkey") == F.col("sk")),
        )
        .filter(F.col("l_shipdate") >= F.col("others_max"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q22 shape: anti join + uncorrelated scalar average — well-funded
# customers (above the positive-balance average) with no RECENT order
# (every synthetic customer has some order, so the spec's "never
# ordered" is vacuous here; "none since 2000" keeps the NOT-EXISTS →
# left_anti plan non-trivial), rolled up by market segment (standing
# in for the phone country code). The average is a 1-row broadcast;
# the NOT EXISTS is a left_anti join on custkey.
# --------------------------------------------------------------------------
@query(
    "idle_customers_q22",
    "TPC-H Q22 shape: above-average-balance customers idle since 2000, by segment",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / count(*) AS a
        FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment, count(*) AS numcust,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def idle_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp")
        )
        .select("o_custkey")
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("a")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )
