"""Geospatial operators: deterministic point derivation, integer grid
cells, and a grid-bucketed nearest-neighbor spatial join.

The reference's domain is a station network (locations carry
latitude/longitude; see reference etls/openaq_etl.py locations payload
and doc/archive/plan.md sensor metadata) but its pipeline never joins
on geometry. A Spark-native engine for that domain needs the spatial
primitives a station network implies: density per grid cell, radius
screens around a point, and nearest-station assignment. All arithmetic
here is INTEGER micro-degrees so results are bit-identical across
engines (no trig, no floating-point geodesics):

- Coordinates live as micro-degree BIGINTs (1e-6 deg resolution, the
  precision OpenAQ publishes).
- Distances are squared planar micro-degree distances. At city scale
  the planar approximation's ranking error is far below sensor-siting
  noise; a production geodesic variant would swap in haversine at the
  one expression marked below without changing the join shape.
- The test tables carry no lat/lon, so points are DERIVED
  deterministically from entity keys via md5 (same expression in the
  DuckDB oracles) — the derivation stands in for a stored column and
  keeps every query value-hash reproducible.

Scale shape (the part that matters at 100 TB): nearest-neighbor runs as
an EQUI-join on grid cells after replicating each station to its 3x3
neighbor cells — candidates per probe are bounded by station density
per cell, never all-pairs. Both sides hash-partition on (cell_lat,
cell_lon); no theta join, no cartesian, no broadcast of the big side.
Cell size is the one tuning knob: pick it so the expected 3x3
neighborhood holds O(1..100) stations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Micro-degrees per grid cell (10 degrees). See module docstring.
CELL_MICRO = 10_000_000

# Derivation moduli: lat in [-90e6, +90e6], lon in [-180e6, +180e6].
_LAT_MOD = 180_000_001
_LON_MOD = 360_000_001


def _hex8(col: Column) -> Column:
    """First 8 md5 hex chars as a BIGINT (deterministic, engine-portable:
    DuckDB spells it CAST(concat('0x', substr(md5(x),1,8)) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def derived_point(key: Column) -> tuple[Column, Column]:
    """(lat_micro, lon_micro) BIGINT columns derived from a key column.

    Stands in for stored coordinates on the synthetic tables; pure
    codegen'd expressions, no shuffle.
    """
    lat = _hex8(F.concat(F.lit("lat:"), key.cast("string"))) % _LAT_MOD - (
        _LAT_MOD // 2
    )
    lon = _hex8(F.concat(F.lit("lon:"), key.cast("string"))) % _LON_MOD - (
        _LON_MOD // 2
    )
    return lat, lon


def cell_of(
    lat_micro: Column, lon_micro: Column, cell_micro: int = CELL_MICRO
) -> tuple[Column, Column]:
    """Integer grid cell ids. Coordinates are shifted non-negative before
    the integer division so truncation == floor in every engine.

    ``cell_micro`` is the density knob: candidate pairs per probe grow
    with stations-per-cell x 9, so as station density rises the cell
    edge must SHRINK to keep the 3x3 neighborhood at O(1..100)
    stations. Measured at 32x density (32k stations / 4.8M probes,
    local[32]): the fixed 10-degree grid generates ~2.1e9 candidate
    rows (40 s); re-sized to 2.5 degrees the same data generates
    13.2M candidates and the run is scan-dominated (~10 s, most of it
    the 4.8M-probe derivation+window). See PLANS.md geo section."""
    clat = ((lat_micro + F.lit(_LAT_MOD // 2)) / F.lit(cell_micro)).cast(
        "bigint"
    )
    clon = ((lon_micro + F.lit(_LON_MOD // 2)) / F.lit(cell_micro)).cast(
        "bigint"
    )
    return clat, clon


def with_point_and_cell(
    df: DataFrame, key_col: str, prefix: str, cell_micro: int = CELL_MICRO
) -> DataFrame:
    """Attach {prefix}_lat/{prefix}_lon (micro-degrees) and
    {prefix}_cell_lat/{prefix}_cell_lon derived from ``key_col``."""
    lat, lon = derived_point(F.col(key_col))
    out = df.withColumn(f"{prefix}_lat", lat).withColumn(f"{prefix}_lon", lon)
    clat, clon = cell_of(
        F.col(f"{prefix}_lat"), F.col(f"{prefix}_lon"), cell_micro
    )
    return out.withColumn(f"{prefix}_cell_lat", clat).withColumn(
        f"{prefix}_cell_lon", clon
    )


def dist_sq(
    lat_a: Column,
    lon_a: Column,
    lat_b: Column,
    lon_b: Column,
    wrap_lon: bool = False,
) -> Column:
    """Squared planar distance in micro-degrees, exact BIGINT.

    ``wrap_lon=True`` measures the longitude delta the short way around
    the antimeridian (min(|dlon|, 360e6 - |dlon|)) so a pair straddling
    lon ±180 gets its true separation; ``haversine_m`` needs no such
    flag (sin(dlon/2) is periodic). Swap point for a haversine
    expression to go geodesic — the join shape (grid-bucketed
    candidates) is unchanged.
    """
    dlat = lat_a - lat_b
    dlon = F.abs(lon_a - lon_b)
    if wrap_lon:
        dlon = F.least(dlon, F.lit(2 * (_LON_MOD // 2)) - dlon)
    return (dlat * dlat + dlon * dlon).cast("bigint")


def nearest_in_neighborhood(
    probes: DataFrame,
    stations: DataFrame,
    probe_key: str,
    station_key: str,
    cell_micro: int = CELL_MICRO,
    wrap_lon: bool = False,
) -> DataFrame:
    """Nearest station per probe within the probe's 3x3 grid-cell
    neighborhood (probes with no station that close are dropped).

    probes/stations must carry p_/s_-prefixed point+cell columns from
    ``with_point_and_cell``. Implementation: replicate each station to
    its 9 neighbor cells (explode of a constant 3x3 offset array — a
    fixed x9 map-side blowup of the SMALL side), equi-join on the cell
    id, then per-probe argmin via a rank-1 window (compiles to
    WindowGroupLimit: per-partition candidates collapse before the
    final exchange). Ties break on station key for determinism.

    ``wrap_lon``: by default the grid does NOT wrap at the
    antimeridian — a probe near lon +180 will not see a station just
    across the seam (fine for the synthetic derived points, whose
    oracle replays the same no-wrap grid). Pass ``wrap_lon=True`` for
    real coordinates: the replicated neighbor-cell lon id wraps modulo
    the lon cell count and the candidate distance uses the wrapped
    longitude delta. Polar caveat (both modes): latitude rows neither
    wrap nor widen, so very-high-latitude neighborhoods where one lon
    cell spans a sliver of physical distance under-reach; shrink
    ``cell_micro`` or pre-rotate coordinates for polar workloads.
    """
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    join_lon = F.col("s_cell_lon") + F.col("_dlon")
    probe_lon = F.col("p_cell_lon")
    if wrap_lon:
        # True lon cell count: ceil(360e6 / cell_micro). Both join sides
        # wrap modulo it, which also folds the degenerate lon=+180
        # sliver cell onto cell 0 (same meridian). When cell_micro does
        # not divide 360e6 the seam cell is narrower than the rest —
        # the 3x3 neighborhood still covers it, just asymmetrically.
        span = 2 * (_LON_MOD // 2)
        n_lon_cells = (span + cell_micro - 1) // cell_micro
        join_lon = F.pmod(join_lon, F.lit(n_lon_cells))
        probe_lon = F.pmod(probe_lon, F.lit(n_lon_cells))
    st9 = (
        stations.withColumn("_dlat", F.explode(offsets))
        .withColumn("_dlon", F.explode(offsets))
        .withColumn("join_cell_lat", F.col("s_cell_lat") + F.col("_dlat"))
        .withColumn("join_cell_lon", join_lon)
        .drop("_dlat", "_dlon")
    )
    cand = probes.join(
        st9,
        on=(
            (F.col("p_cell_lat") == F.col("join_cell_lat"))
            & (probe_lon == F.col("join_cell_lon"))
        ),
    ).withColumn(
        "dist_sq",
        dist_sq(
            F.col("p_lat"),
            F.col("p_lon"),
            F.col("s_lat"),
            F.col("s_lon"),
            wrap_lon=wrap_lon,
        ),
    )
    # Argmin as ONE aggregation (partial+final SortAggregate): min of the (dist_sq, station_key,
    # <row>) struct is lexicographically "dist_sq asc, station_key asc"
    # — the identical row to the previous row_number window's rank 1 —
    # and the 3×3-cell equi-join keeps each probe's ≤9-cell candidate
    # set co-located, so map-side partial aggregation collapses it
    # before the exchange instead of shuffling and sorting every
    # candidate pair.
    keep = [
        c for c in cand.columns if c not in ("join_cell_lat", "join_cell_lon")
    ]
    row = F.struct(*[F.col(c) for c in keep]).alias("_row")
    return (
        cand.groupBy(probe_key)
        .agg(
            F.min(
                F.struct(F.col("dist_sq"), F.col(station_key), row)
            ).alias("_best")
        )
        .select("_best._row.*")
    )


def oracle_point_sql(
    key_expr: str, prefix: str, cell_micro: int = CELL_MICRO
) -> str:
    """DuckDB SQL fragment computing the same derived point + cell
    columns (SELECT-list fragment, comma-joined)."""
    half_lat, half_lon = _LAT_MOD // 2, _LON_MOD // 2
    lat = (
        f"CAST(concat('0x', substr(md5(concat('lat:', CAST({key_expr} AS "
        f"VARCHAR))), 1, 8)) AS BIGINT) % {_LAT_MOD} - {half_lat}"
    )
    lon = (
        f"CAST(concat('0x', substr(md5(concat('lon:', CAST({key_expr} AS "
        f"VARCHAR))), 1, 8)) AS BIGINT) % {_LON_MOD} - {half_lon}"
    )
    return (
        f"{lat} AS {prefix}_lat, {lon} AS {prefix}_lon, "
        f"CAST((({lat}) + {half_lat}) // {cell_micro} AS BIGINT) AS "
        f"{prefix}_cell_lat, "
        f"CAST((({lon}) + {half_lon}) // {cell_micro} AS BIGINT) AS "
        f"{prefix}_cell_lon"
    )


def haversine_m(
    lat_a: Column, lon_a: Column, lat_b: Column, lon_b: Column
) -> Column:
    """Great-circle distance in meters from micro-degree coordinates —
    the geodesic drop-in for ``dist_sq`` (same grid-bucketed join
    shape; swap the distance expression only). Pure JVM trig
    expressions, double precision; NOT oracle-paired (cross-engine
    libm parity is not guaranteed at the last ulp), so geodesic
    queries verify by pytest ranking-agreement instead
    (tests/test_geo.py)."""
    to_rad = 3.141592653589793 / (180.0 * 1_000_000)
    la, lb = lat_a * to_rad, lat_b * to_rad
    dlat = (lat_b - lat_a) * to_rad
    dlon = (lon_b - lon_a) * to_rad
    h = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(la) * F.cos(lb) * F.pow(F.sin(dlon / 2), 2)
    )
    return 2.0 * 6_371_000.0 * F.asin(F.sqrt(h))
