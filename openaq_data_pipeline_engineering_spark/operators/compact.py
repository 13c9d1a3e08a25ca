"""Small-file compaction for partitioned Parquet tables.

Streaming/incremental writers accumulate many small files per Hive
partition (the reference's own docs flag 50-200 KB files vs a 128-256 MB
target, doc/GLUE_JOBS_GUIDE.md:309-311,399-407). Compaction rewrites
each partition's files into ~target-sized ones — the OPTIMIZE of table
formats, done directly on the directory layout.

Scale notes: work is proportional to the partitions selected, not the
table; each partition is rewritten independently via dynamic partition
overwrite, so concurrent readers never see a partial partition (parquet
commit is per-directory atomic-rename).
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession


def read_preserving_partitions(
    spark: SparkSession, path: str, partition_cols: list[str]
) -> DataFrame:
    """Read a Hive-partitioned table so a rewrite lands in the SAME
    partition directories it came from.

    A plain ``spark.read.parquet`` type-INFERS partition values from the
    directory names, so a zero-padded string partition (``month=01`` —
    the mart's own layout) reads back as int 1; rewriting it then
    creates ``month=1`` NEXT TO the live ``month=01``, whose old files
    survive — every row silently duplicated (the hazard
    plans/incremental.py already guards with an explicit schema).
    Pinning the partition columns to STRING reads the raw directory
    value verbatim, and ``partitionBy`` writes it back verbatim, so the
    read→rewrite round trip is layout-preserving for every value
    spelling (``m=1`` stays ``m=1``, ``m=01`` stays ``m=01``). Data
    columns keep their footer types unchanged."""
    from pyspark.sql.types import StringType, StructField, StructType

    inferred = spark.read.parquet(path).schema
    pinned = StructType(
        [
            StructField(f.name, StringType(), True)
            if f.name in partition_cols
            else f
            for f in inferred
        ]
    )
    return spark.read.schema(pinned).parquet(path)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_cols: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    partition_filter: str | None = None,
) -> None:
    """Rewrite (optionally filtered) partitions into ~target-sized files.

    File count per partition = ceil(partition_bytes / target); data is
    read with the table's schema and written back with dynamic overwrite
    so untouched partitions are left alone.

    ``partition_filter`` SELECTS PARTITIONS, never rows: the predicate
    is evaluated only to find the distinct partition tuples it touches,
    and every selected partition is rewritten WHOLE (a compaction must
    be row-preserving — filtering rows under dynamic overwrite would
    silently delete the non-matching rows of each touched partition).
    A predicate on non-partition columns is therefore safe too: it
    widens to the partitions containing any matching row. Requires a
    partitioned table.

    PARTITION-COLUMN COMPARISON SEMANTICS: partition columns are read
    as STRING holding the raw directory spelling (see
    :func:`read_preserving_partitions` — inference would re-spell
    zero-padded values and duplicate the table on rewrite), so a
    QUOTED filter literal must match that raw spelling exactly:
    ``month = '1'`` does NOT select directory ``month=01``. UNQUOTED
    numeric literals still work for any spelling (``month = 1``
    implicit-casts the string side to int), and quoted literals work
    when spelled verbatim (``month = '01'``). Filters on data columns
    keep their footer types and are unaffected.
    """
    from pyspark.sql import functions as F

    # Partition columns pinned to string so the dynamic overwrite
    # replaces the SAME directories it read (see
    # read_preserving_partitions — inference would re-spell zero-padded
    # values and duplicate the table).
    df = (
        read_preserving_partitions(spark, path, partition_cols)
        if partition_cols
        else spark.read.parquet(path)
    )
    if partition_filter:
        if not partition_cols:
            raise ValueError(
                "partition_filter requires a partitioned table: on an "
                "unpartitioned table the dynamic-overwrite write would "
                "replace the WHOLE table with only the matching rows"
            )
        parts = (
            df.filter(partition_filter).select(*partition_cols).distinct()
        )
        df = df.join(F.broadcast(parts), partition_cols, "left_semi")

    # size estimate per partition from the file system (cheap listing)
    sizes: dict[tuple, int] = {}
    for root, _dirs, files in os.walk(path):
        pvals = _partition_values(root, path, partition_cols)
        if pvals is None:
            continue
        nbytes = sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet")
        )
        if nbytes:
            sizes[pvals] = sizes.get(pvals, 0) + nbytes

    total = sum(sizes.values()) or 1
    n_files = max(1, math.ceil(total / target_file_bytes))
    (
        df.repartition(n_files, *partition_cols)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*partition_cols)
        .parquet(path)
    )


def _partition_values(
    dirpath: str, base: str, partition_cols: list[str]
) -> tuple | None:
    rel = os.path.relpath(dirpath, base)
    parts = [p for p in rel.split(os.sep) if "=" in p]
    vals = dict(p.split("=", 1) for p in parts)
    if set(partition_cols) <= set(vals):
        return tuple(vals[c] for c in partition_cols)
    return None


def iter_data_parquet_files(path: str):
    """Yield the parquet DATA file paths under ``path`` — skipping
    underscore/dot-prefixed directories and files (``_changes`` CDF
    sidecars, ``_SUCCESS`` markers, hidden temp files), exactly the
    paths a Spark read of the directory ignores. Every footer-level
    statistic must iterate through this, or a CDF-enabled version
    directory double-counts its change rows into the data metrics."""
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
        for f in files:
            if f.endswith(".parquet") and not f.startswith(("_", ".")):
                yield os.path.join(root, f)


def file_stats(path: str) -> dict:
    """(n_files, total_bytes, avg_bytes) for the table's parquet files."""
    n, total = 0, 0
    for p in iter_data_parquet_files(path):
        n += 1
        total += os.path.getsize(p)
    return {"n_files": n, "total_bytes": total, "avg_bytes": total // max(n, 1)}
