"""Loaders for the driver-provided star-schema parquet tables.

These are plain Parquet scans (reference S3 operator,
tests/test_glue_transformation.py:151) with two engine-level fixups:

1. ``events.ts`` is stored as Parquet ``TIMESTAMP(NANOS)`` which Spark's
   vectorized reader rejects.  We read it via
   ``spark.sql.legacy.parquet.nanosAsLong`` and convert with *integer*
   nanos→micros division (a double division would lose precision above
   2^53 ns ≈ 1970+104 days).
2. Session timezone is pinned UTC before any read so timestamp-derived
   columns are deterministic across environments.

At 100 TB these remain straight columnar scans: predicate pushdown and
column pruning reach the Parquet reader (verify via
``df.explain()`` → PushedFilters / ReadSchema), and nothing here forces a
driver-side collect.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from openaq_data_pipeline_engineering_spark.engine import apply_runtime_confs

STAR_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Columns that must be TimestampType after load (parquet may carry NTZ or
# nanos depending on writer).
_TS_COLUMNS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


# Analyzed-DataFrame cache: repeated load_table calls (every declared
# query loads its tables) otherwise re-list files and re-analyze the
# read per call. Keyed by session id so a new session never sees stale
# frames; holds logical plans only (no data pinned).
_LOAD_CACHE: dict[tuple[int, str, str], DataFrame] = {}
# fan_out memo: inputFiles() walks the file index once per frame.
# Values pin (input, output) so the id() key can never be reused by a
# garbage-collected frame.
_FANOUT_CACHE: dict[tuple[int, int], tuple[DataFrame, DataFrame]] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table with normalized timestamp types."""
    key = (id(spark), sf_dir, name)
    cached = _LOAD_CACHE.get(key)
    if cached is not None:
        return cached
    apply_runtime_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for c in _TS_COLUMNS.get(name, []):
        dtype = dict(df.dtypes).get(c)
        if dtype == "bigint":
            # nanosAsLong path: integer nanos → micros (floor division keeps
            # exactly DuckDB's ns→us truncation semantics).
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} DIV 1000)"))
        elif dtype and dtype.startswith("timestamp"):
            # Collapse TIMESTAMP_NTZ / TIMESTAMP to session-UTC TimestampType.
            df = df.withColumn(c, F.col(c).cast(T.TimestampType()))
    _LOAD_CACHE[key] = df
    return df


def _parse_bytes(v: str) -> int:
    """Parse a Spark byte-size conf value ("134217728", "128m", "1g")."""
    s = str(v).strip().lower()
    mult = 1
    for suffix, m in (
        ("tb", 1024**4), ("gb", 1024**3), ("mb", 1024**2), ("kb", 1024),
        ("t", 1024**4), ("g", 1024**3), ("m", 1024**2), ("k", 1024),
        ("b", 1),
    ):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    return int(float(s) * mult)


def _est_scan_splits(df: DataFrame, files: list[str]) -> int:
    """Estimate how many scan splits Spark will create for ``df``'s
    file set, replaying FilePartition's sizing formula:

        maxSplit = min(maxPartitionBytes, max(openCostInBytes,
                                              totalBytes / minPartitionNum))

    Local-filesystem sizes only (the sandbox target); any non-file URI
    returns 0 ("unknown — assume under-split").

    PRUNED-SCAN CAVEAT (ADVICE r12 #3): ``df.inputFiles()`` lists the
    UNPRUNED relation's file set, so for a partition-/filter-pruned
    scan this OVER-estimates the splits the scan will actually run —
    and ``fan_out`` may then skip the repartition on a scan far
    narrower than estimated. Accepted on purpose: every ``fan_out``
    call site reads an unpartitioned single-file driver table (no
    partition pruning exists in this layout, and row-group filter
    pruning doesn't change the split count), and the failure mode is
    the pre-r12 behaviour (an extra repartition would have been a
    no-op win anyway). A partitioned-source caller should pass an
    explicit ``partitions=`` or repartition itself."""
    import urllib.parse

    conf = df.sparkSession.conf
    sizes = []
    for f in files:
        p = urllib.parse.urlparse(f)
        if p.scheme not in ("file", ""):
            return 0
        try:
            sizes.append(os.path.getsize(urllib.parse.unquote(p.path)))
        except OSError:
            return 0
    open_cost = _parse_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    max_pb = _parse_bytes(conf.get("spark.sql.files.maxPartitionBytes", "134217728"))
    # No default arg: Spark 4 type-validates even the DEFAULT for typed
    # confs, so an unset optional conf must be probed bare.
    try:
        min_pn = int(conf.get("spark.sql.files.minPartitionNum") or 0)
    except Exception:
        min_pn = 0
    if min_pn <= 0:
        min_pn = df.sparkSession.sparkContext.defaultParallelism
    total = sum(sizes) + open_cost * len(sizes)
    max_split = min(max_pb, max(open_cost, total // max(min_pn, 1) + 1))
    return max(1, -(-total // max_split))


def fan_out(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Spread a small-file scan across the cluster before CPU-heavy
    per-row work (explode/hash/vector math).

    A tiny parquet file arrives as ONE input split, so everything up to
    the first shuffle runs on one core; this repartition recreates scan
    parallelism for a few ms of shuffle on small data. Guarded: when the
    scan itself already yields enough splits (>= 2/3 of the target —
    the engine's openCostInBytes sizing makes bytesPerCore govern, so
    any multi-MB input splits near the core count, and at 100 TB it's
    thousands of splits), this is the identity and NO shuffle is added
    to the plan. The round-robin repartition is a last resort for
    sub-MB inputs feeding CPU-heavy work: it pays a local sort + full
    shuffle (SPARK-23207), measured 3x a bare scan+agg even at sf0.1.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    key = (id(df), n)
    cached = _FANOUT_CACHE.get(key)
    if cached is not None:
        return cached[1]
    # Planning-free parallelism estimate from the file set (no RDD
    # materialization, no physical plan). Non-file sources report no
    # files → treated as needing fan-out.
    try:
        files = df.inputFiles()
    except Exception:
        files = []
    n_splits = len(files) and _est_scan_splits(df, files)
    # 2/3 tolerance: 22 scan tasks on 32 cores beats paying a sort +
    # shuffle to reach exactly 32.
    out = df if n_splits * 3 >= n * 2 else df.repartition(n)
    _FANOUT_CACHE[key] = (df, out)
    return out


def load_star(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> dict[str, DataFrame]:
    """Load all (or selected) star tables and register them as temp views."""
    out: dict[str, DataFrame] = {}
    for t in tables or STAR_TABLES:
        df = load_table(spark, sf_dir, t)
        df.createOrReplaceTempView(t)
        out[t] = df
    return out
