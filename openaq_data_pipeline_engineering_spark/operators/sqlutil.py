"""OPTIMIZE / VACUUM — the utility-statement forms of the engine's
storage maintenance operators.

Completes the declarative DML/DDL family next to MERGE INTO
(operators/sqlmerge.py) and UPDATE/DELETE (operators/sqldml.py): the
reference has no storage maintenance at all (its small-file problem is
documented but manual, doc/GLUE_JOBS_GUIDE.md:309-311,399-407); table
formats spell these `OPTIMIZE [ZORDER BY]` and `VACUUM`. Here they
lower onto the engine's existing primitives:

    OPTIMIZE '<table dir>' [WHERE <partition predicate>]
        [ZORDER BY (col1[, col2])]
    VACUUM '<versioned root>' RETAIN <n> VERSIONS

- ``OPTIMIZE`` without ZORDER = small-file compaction
  (operators/compact.compact_partitions — partition columns
  auto-detected from the Hive directory layout; work ∝ selected
  partitions via dynamic overwrite).
- ``OPTIMIZE ... ZORDER BY (a, b)`` rewrites an UNPARTITIONED table
  range-clustered by the Morton interleave of the two columns
  (functions/zorder.morton_code; one column = plain range clustering) —
  pair with operators/skipstats for box-pruned reads. Columns must be
  non-negative integers (the Morton domain); >2 columns is rejected.
- ``VACUUM ... RETAIN n VERSIONS`` = operators/versioned.
  vacuum_snapshots(keep_last=n). Retention is VERSION-count-based (the
  versioned layer's native unit) rather than Delta's hours; txn dedupe
  entries survive vacuum per that module's contract.

Targets are quoted PATHS, not catalog names: the engine's tables are
directories (parquet dirs / versioned roots), and the statement form
exists so orchestration can be pure SQL strings. Each statement
returns a small metrics DataFrame (what changed), like Delta's
command output.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class UtilStatementError(ValueError):
    """Malformed OPTIMIZE/VACUUM statement."""


_OPTIMIZE_RE = re.compile(
    r"^\s*OPTIMIZE\s+'(?P<path>[^']+)'"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+ZORDER\s+BY\s*\((?P<cols>[^)]+)\))?"
    r"\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_VACUUM_RE = re.compile(
    r"^\s*VACUUM\s+'(?P<path>[^']+)'"
    r"\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS\s*;?\s*$",
    re.IGNORECASE,
)


def _detect_partition_cols(path: str) -> list[str]:
    """Partition columns from the Hive directory layout (ordered by
    directory depth), [] for an unpartitioned table."""
    import os

    for root, dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            rel = os.path.relpath(root, path)
            if rel == ".":
                return []
            return [
                seg.split("=", 1)[0]
                for seg in rel.split(os.sep)
                if "=" in seg
            ]
    return []


def execute_optimize(spark: SparkSession, sql: str) -> DataFrame:
    """Lower an OPTIMIZE statement; returns one metrics row
    (n_files_before, n_files_after, n_rows)."""
    from openaq_data_pipeline_engineering_spark.operators.compact import (
        compact_partitions,
        file_stats,
    )

    m = _OPTIMIZE_RE.match(sql)
    if not m:
        raise UtilStatementError(
            "unparseable OPTIMIZE; expected OPTIMIZE '<path>' "
            "[WHERE <pred>] [ZORDER BY (cols)]"
        )
    path = m.group("path")
    _recover_interrupted_rewrite(path)  # heal a crashed prior rewrite
    before = file_stats(path)["n_files"]
    if m.group("cols"):
        cols = [c.strip() for c in m.group("cols").split(",")]
        if not 1 <= len(cols) <= 2:
            raise UtilStatementError(
                "ZORDER BY takes one or two columns (Morton interleave "
                "is pairwise); got " + repr(cols)
            )
        if m.group("where"):
            raise UtilStatementError(
                "ZORDER BY rewrites the whole table; WHERE applies to "
                "compaction only"
            )
        if _detect_partition_cols(path):
            raise UtilStatementError(
                "ZORDER BY supports unpartitioned tables (z-cluster "
                "WITHIN partitions by compacting per-partition instead)"
            )
        _zorder_rewrite(spark, path, cols)
    else:
        compact_partitions(
            spark,
            path,
            _detect_partition_cols(path),
            partition_filter=m.group("where"),
        )
    after = file_stats(path)
    return spark.createDataFrame(
        [(int(before), int(after["n_files"]), _footer_row_count(path))],
        "n_files_before int, n_files_after int, n_rows bigint",
    )


def _footer_row_count(path: str) -> int:
    """Table row count from parquet FOOTER metadata only — no data
    pages are read, so the metrics row costs O(files), not a rescan of
    the table the rewrite just wrote."""
    import os

    import pyarrow.parquet as pq

    n = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += pq.ParquetFile(
                    os.path.join(root, f)
                ).metadata.num_rows
    return n


def _zorder_rewrite(
    spark: SparkSession, path: str, cols: list[str], n_files: int = 16
) -> None:
    """Rewrite ``path`` range-clustered by the (Morton-interleaved)
    cluster key.

    Staging-dir + two renames: the table is never a partial MIX of old
    and new files, but plain directories cannot be swapped atomically
    (no RENAME_EXCHANGE on a portable path), so a crash between the
    two renames leaves the data intact at ``<path>.__optimize_old__``
    with nothing at ``path``. :func:`_recover_interrupted_rewrite` runs
    first and heals exactly that state by renaming the old directory
    back, so the NEXT OPTIMIZE (or any caller invoking the recovery)
    restores the table; readers during the window fail loudly rather
    than seeing partial data. Tables needing a zero-window swap should
    live under operators/versioned.py, whose manifest commit IS atomic.
    """
    import os
    import shutil

    from openaq_data_pipeline_engineering_spark.functions.zorder import (
        morton_code,
    )

    _recover_interrupted_rewrite(path)
    df = spark.read.parquet(path)
    key = (
        F.col(cols[0]).cast("bigint")
        if len(cols) == 1
        else morton_code(
            F.col(cols[0]).cast("bigint"),
            F.col(cols[1]).cast("bigint"),
            bits=16,
        )
    )
    staging = path.rstrip("/") + ".__optimize_tmp__"
    shutil.rmtree(staging, ignore_errors=True)
    df.repartitionByRange(n_files, key).write.mode("overwrite").parquet(
        staging
    )
    old = path.rstrip("/") + ".__optimize_old__"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(path, old)
    os.rename(staging, path)
    shutil.rmtree(old, ignore_errors=True)


def _recover_interrupted_rewrite(path: str) -> None:
    """Heal a rewrite that died between its two renames: data intact at
    ``<path>.__optimize_old__``, nothing at ``path`` — rename it back.
    A no-op in every other state (in particular it never touches the
    old dir while ``path`` exists)."""
    import os

    old = path.rstrip("/") + ".__optimize_old__"
    if not os.path.exists(path) and os.path.isdir(old):
        os.rename(old, path)


def execute_vacuum(spark: SparkSession, sql: str) -> DataFrame:
    """Lower a VACUUM statement; returns one row per dropped version
    (empty frame when nothing was eligible)."""
    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        vacuum_snapshots,
    )

    m = _VACUUM_RE.match(sql)
    if not m:
        raise UtilStatementError(
            "unparseable VACUUM; expected VACUUM '<root>' RETAIN "
            "<n> VERSIONS"
        )
    dropped = vacuum_snapshots(m.group("path"), keep_last=int(m.group("n")))
    return spark.createDataFrame(
        [(int(v),) for v in dropped], "dropped_version int"
    )
