"""Declared queries: geospatial primitives over the station network.

The reference's domain objects are georeferenced stations (reference
etls/openaq_etl.py locations payload: latitude/longitude per location)
though its pipeline never computes on geometry. These queries add the
spatial layer a station-network engine needs — grid density, radius
screens, nearest-station assignment — with the grid-bucketed join
shape that survives 100 TB (see operators/geo.py docstring).

Supplier rows play stations, customer rows play query points;
coordinates derive deterministically from keys (md5 micro-degrees) so
DuckDB oracles hash-match bit-for-bit. All distance math is integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.geo import (
    dist_sq,
    nearest_in_neighborhood,
    oracle_point_sql,
    with_point_and_cell,
)
from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.sources.star import (
    fan_out,
    load_table,
)

_ST_POINT = oracle_point_sql("s_suppkey", "s")
_PR_POINT = oracle_point_sql("c_custkey", "p")


def _stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = fan_out(load_table(spark, sf_dir, "supplier"))
    return with_point_and_cell(sup.select("s_suppkey"), "s_suppkey", "s")


def _probes(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = fan_out(load_table(spark, sf_dir, "customer"))
    return with_point_and_cell(cust.select("c_custkey"), "c_custkey", "p")


# --------------------------------------------------------------------------
# Grid-cell density: one hash agg per point set, union of partials.
# Scale: shuffle ∝ occupied cells (bounded by the fixed grid), not rows.
# --------------------------------------------------------------------------
@query(
    "geo_grid_density",
    "geo: station + query-point density per 10-degree grid cell, top-20 "
    "cells (integer micro-degree grid, operators/geo.py)",
    oracle=f"""
    WITH st AS (SELECT {_ST_POINT} FROM supplier),
         pr AS (SELECT {_PR_POINT} FROM customer),
         cells AS (
           SELECT s_cell_lat AS cell_lat, s_cell_lon AS cell_lon,
                  1 AS is_station, 0 AS is_probe FROM st
           UNION ALL
           SELECT p_cell_lat, p_cell_lon, 0, 1 FROM pr
         )
    SELECT cell_lat, cell_lon,
           CAST(sum(is_station) AS BIGINT) AS n_stations,
           CAST(sum(is_probe) AS BIGINT) AS n_probes
    FROM cells GROUP BY cell_lat, cell_lon
    ORDER BY n_stations + n_probes DESC, cell_lat, cell_lon
    LIMIT 20
    """,
)
def geo_grid_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _stations(spark, sf_dir).select(
        F.col("s_cell_lat").alias("cell_lat"),
        F.col("s_cell_lon").alias("cell_lon"),
        F.lit(1).alias("is_station"),
        F.lit(0).alias("is_probe"),
    )
    pr = _probes(spark, sf_dir).select(
        F.col("p_cell_lat").alias("cell_lat"),
        F.col("p_cell_lon").alias("cell_lon"),
        F.lit(0).alias("is_station"),
        F.lit(1).alias("is_probe"),
    )
    return (
        st.unionByName(pr)
        .groupBy("cell_lat", "cell_lon")
        .agg(
            F.sum("is_station").cast("bigint").alias("n_stations"),
            F.sum("is_probe").cast("bigint").alias("n_probes"),
        )
        .orderBy(
            (F.col("n_stations") + F.col("n_probes")).desc(),
            "cell_lat",
            "cell_lon",
        )
        .limit(20)
    )


# --------------------------------------------------------------------------
# Nearest station per probe within the 3x3 cell neighborhood.
# Scale: equi-join on cell ids; candidates bounded by station density.
# --------------------------------------------------------------------------
@query(
    "geo_nearest_station",
    "geo: grid-bucketed nearest-station join (3x3 neighbor-cell "
    "candidates, integer argmin; no all-pairs, no theta join)",
    oracle=f"""
    WITH st AS (SELECT s_suppkey, {_ST_POINT} FROM supplier),
         pr AS (SELECT c_custkey, {_PR_POINT} FROM customer),
         cand AS (
           SELECT pr.c_custkey, st.s_suppkey AS station_id,
                  CAST((pr.p_lat - st.s_lat) * (pr.p_lat - st.s_lat)
                     + (pr.p_lon - st.s_lon) * (pr.p_lon - st.s_lon)
                     AS BIGINT) AS dist_sq
           FROM pr JOIN st
             ON st.s_cell_lat BETWEEN pr.p_cell_lat - 1 AND pr.p_cell_lat + 1
            AND st.s_cell_lon BETWEEN pr.p_cell_lon - 1 AND pr.p_cell_lon + 1
         )
    SELECT c_custkey, station_id, dist_sq
    FROM cand
    QUALIFY row_number() OVER (
        PARTITION BY c_custkey ORDER BY dist_sq, station_id) = 1
    """,
)
def geo_nearest_station(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _stations(spark, sf_dir)
    pr = _probes(spark, sf_dir)
    near = nearest_in_neighborhood(pr, st, "c_custkey", "s_suppkey")
    return near.select(
        "c_custkey", F.col("s_suppkey").alias("station_id"), "dist_sq"
    )


# --------------------------------------------------------------------------
# Radius screen around a fixed point: bounding-box prefilter (sargable
# range predicates — on a stored-coordinate table these push to the
# scan / prune files on min-max stats) then the exact integer radius.
# --------------------------------------------------------------------------
_CENTER_LAT = 0
_CENTER_LON = 0
_RADIUS_MICRO = 30_000_000  # 30 degrees


@query(
    "geo_radius_screen",
    "geo: stations inside an integer radius of a center point — bbox "
    "range prefilter then exact squared-distance screen",
    oracle=f"""
    WITH st AS (SELECT s_suppkey, {_ST_POINT} FROM supplier)
    SELECT s_suppkey, s_lat, s_lon,
           CAST((s_lat - {_CENTER_LAT}) * (s_lat - {_CENTER_LAT})
              + (s_lon - {_CENTER_LON}) * (s_lon - {_CENTER_LON})
              AS BIGINT) AS dist_sq
    FROM st
    WHERE s_lat BETWEEN {_CENTER_LAT - _RADIUS_MICRO}
                    AND {_CENTER_LAT + _RADIUS_MICRO}
      AND s_lon BETWEEN {_CENTER_LON - _RADIUS_MICRO}
                    AND {_CENTER_LON + _RADIUS_MICRO}
      AND (s_lat - {_CENTER_LAT}) * (s_lat - {_CENTER_LAT})
        + (s_lon - {_CENTER_LON}) * (s_lon - {_CENTER_LON})
        <= {_RADIUS_MICRO}::BIGINT * {_RADIUS_MICRO}
    ORDER BY dist_sq, s_suppkey
    """,
)
def geo_radius_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _stations(spark, sf_dir)
    d2 = dist_sq(
        F.col("s_lat"),
        F.col("s_lon"),
        F.lit(_CENTER_LAT),
        F.lit(_CENTER_LON),
    )
    return (
        st.filter(
            F.col("s_lat").between(
                _CENTER_LAT - _RADIUS_MICRO, _CENTER_LAT + _RADIUS_MICRO
            )
            & F.col("s_lon").between(
                _CENTER_LON - _RADIUS_MICRO, _CENTER_LON + _RADIUS_MICRO
            )
            & (d2 <= F.lit(_RADIUS_MICRO).cast("bigint") * _RADIUS_MICRO)
        )
        .select("s_suppkey", "s_lat", "s_lon", d2.alias("dist_sq"))
        .orderBy("dist_sq", "s_suppkey")
    )


# --------------------------------------------------------------------------
# Grid-density clustering (the scalable DBSCAN shape): core cells =
# grid cells holding >= MIN_PTS points; clusters = connected components
# over ADJACENT core cells (operators/cluster.py large-star/small-star
# CC — the same bounded-iteration machinery as near-dup clustering).
# At 100 TB the point->cell aggregation is one map-combined shuffle
# (∝ occupied cells, not points), adjacency is a 9-offset explode of
# the CELL table (tiny) joined equi on cell id, and CC runs on the
# core-cell graph — never on raw points. The DuckDB oracle replays the
# closure with a recursive CTE.
# --------------------------------------------------------------------------
_DBSCAN_CELL = 5_000_000  # 5-degree cells
_DBSCAN_MIN_PTS = 3
# pack (cell_lat, cell_lon) into one BIGINT node id: lat cells 0..36,
# lon cells 0..72 at 5 degrees -> lat * 1000 + lon is collision-free.
_PACK = 1000


@query(
    "geo_density_clusters",
    "geo: DBSCAN-shaped clustering — core 5-degree cells (>=3 points) "
    "merged via connected components over cell adjacency",
    oracle=f"""
    WITH RECURSIVE pts AS (
      SELECT {oracle_point_sql("c_custkey", "p", _DBSCAN_CELL)}
      FROM customer
    ),
    core AS (
      SELECT p_cell_lat AS cl, p_cell_lon AS cn,
             p_cell_lat * {_PACK} + p_cell_lon AS node,
             CAST(count(*) AS BIGINT) AS n_points
      FROM pts GROUP BY 1, 2, 3
      HAVING count(*) >= {_DBSCAN_MIN_PTS}
    ),
    edges AS (
      SELECT a.node AS s, b.node AS d
      FROM core a JOIN core b
        ON b.cl BETWEEN a.cl - 1 AND a.cl + 1
       AND b.cn BETWEEN a.cn - 1 AND a.cn + 1
      UNION ALL
      SELECT node, node FROM core
    ),
    reach(node, r) AS (
      SELECT node, node FROM core
      UNION
      SELECT e.d, r.r FROM reach r JOIN edges e ON e.s = r.node
    ),
    labels AS (
      SELECT node, min(r) AS cluster_id FROM reach GROUP BY node
    )
    SELECT l.cluster_id,
           CAST(count(*) AS BIGINT) AS n_cells,
           CAST(sum(c.n_points) AS BIGINT) AS n_points
    FROM labels l JOIN core c ON l.node = c.node
    GROUP BY l.cluster_id
    """,
)
def geo_density_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.cluster import (
        connected_components,
    )

    cust = fan_out(load_table(spark, sf_dir, "customer")).select("c_custkey")
    pts = with_point_and_cell(cust, "c_custkey", "p", _DBSCAN_CELL)
    core = (
        pts.groupBy(
            F.col("p_cell_lat").alias("cl"), F.col("p_cell_lon").alias("cn")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_points"))
        .filter(F.col("n_points") >= _DBSCAN_MIN_PTS)
        .withColumn("node", F.col("cl") * _PACK + F.col("cn"))
        # The core-cell table (|cells| rows, bounded by the grid — 2.4k
        # at sf0.1) feeds THREE consumers: both sides of the adjacency
        # join and the final label join. Materialize once or each
        # consumer re-plans the full customer scan + cell aggregation
        # (exchange reuse does not fire across aliased subtrees): 3
        # corpus scans → 1.
        .localCheckpoint(eager=True)
    )
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    nbr = (
        core.select("cl", "cn", "node")
        .withColumn("dl", F.explode(offsets))
        .withColumn("dn", F.explode(offsets))
        .select(
            (F.col("cl") + F.col("dl")).alias("jcl"),
            (F.col("cn") + F.col("dn")).alias("jcn"),
            F.col("node").alias("d"),
        )
    )
    edges = (
        core.select("cl", "cn", F.col("node").alias("s"))
        .join(nbr, on=(F.col("cl") == F.col("jcl")) & (F.col("cn") == F.col("jcn")))
        .select("s", "d")
        .unionByName(
            core.select(F.col("node").alias("s"), F.col("node").alias("d"))
        )
    )
    labels = connected_components(edges, src="s", dst="d")
    return (
        labels.join(core, on="node")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n_points").cast("bigint").alias("n_points"),
        )
    )
