"""File-level min/max statistics manifest — Delta-style data skipping
built from the `_metadata` hidden column.

At 100 TB a query with a selective key predicate should not open every
file: engines keep a manifest of per-file [min, max] ranges and prune
files whose range cannot contain the predicate value (Delta/Iceberg
data skipping; Parquet row-group stats do the same one level down).
This operator materializes that manifest as a DataFrame so it can be
persisted next to the data and consulted before planning a scan.

Spark-first shape: the stats pass is one aggregation keyed by
`_metadata.file_name` — shuffle bounded by |files|, map-side combined.
Pruning is a filter on the (tiny) manifest plus a file-list-constrained
re-read; no driver-side file walking.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def file_stats(
    df: DataFrame, key_cols: list[str], use_path: bool = False
) -> DataFrame:
    """Per-file manifest: file_name, n_rows, {col}_min / {col}_max.

    ``df`` must be a file-source DataFrame (parquet/orc/json scan) so
    the `_metadata` struct is available. ``use_path=True`` keys the
    manifest on the FULL file path instead of the base name — required
    for Hive-PARTITIONED tables, where one write job's range task can
    emit identically-named part files into two partition directories
    (same task number + job UUID); name-keyed stats would union their
    bounds and under-prune. The manifest column is still called
    ``file_name`` so the pruning helpers compose unchanged — pass the
    same ``use_path`` to them.
    """
    src = "_metadata.file_path" if use_path else "_metadata.file_name"
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in key_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    return (
        df.select(F.col(src).alias("file_name"), *key_cols)
        .groupBy("file_name")
        .agg(*aggs)
    )


def candidate_files(
    stats: DataFrame, key_col: str, value
) -> DataFrame:
    """Files whose [min, max] range may contain ``value`` (single-column
    point predicate). Everything else is provably skippable."""
    return stats.filter(
        (F.col(f"{key_col}_min") <= F.lit(value))
        & (F.col(f"{key_col}_max") >= F.lit(value))
    ).select("file_name")


def pruned_read(
    df: DataFrame, stats: DataFrame, key_col: str, value
) -> DataFrame:
    """Equality read through the manifest: constrain the scan to
    candidate files, then apply the exact predicate.

    The file-list constraint is a join on `_metadata.file_name` against
    the (broadcast) candidate set — at scale the candidate list is
    passed to the reader as a path list; the semantics here are
    identical and stay fully declarative.
    """
    cands = candidate_files(stats, key_col, value)
    return (
        df.withColumn("__file", F.col("_metadata.file_name"))
        .join(
            F.broadcast(cands.withColumnRenamed("file_name", "__file")),
            on="__file",
            how="inner",
        )
        .filter(F.col(key_col) == F.lit(value))
        .drop("__file")
    )


def candidate_files_box(
    stats: DataFrame, preds: dict[str, tuple]
) -> DataFrame:
    """Files whose per-column [min, max] ranges may intersect the box
    ``{col: (lo, hi)}`` — the multi-column range form of
    :func:`candidate_files`. A file survives only if EVERY predicate
    column's range overlaps its bounds, so selectivity multiplies
    across dimensions — the property a Z-ORDER clustered layout
    (functions/zorder.morton_code) exists to exploit: interleaved-bit
    clustering gives every file a tight bounding box in ALL clustered
    dimensions, where single-key clustering bounds only the sort key.
    """
    if not preds:
        raise ValueError("candidate_files_box needs at least one predicate")
    cond = None
    for c, (lo, hi) in preds.items():
        this = (F.col(f"{c}_min") <= F.lit(hi)) & (
            F.col(f"{c}_max") >= F.lit(lo)
        )
        cond = this if cond is None else cond & this
    return stats.filter(cond).select("file_name")


# ---------------------------------------------------------------------------
# PERSISTED manifest (VERDICT r10 #4): the DataFrame manifest above,
# materialized as a `_skipstats/` parquet sidecar INSIDE a versioned
# table's immutable version directory, keyed by the data file's path
# RELATIVE to its OWNING directory (stable under BOTH carry models —
# a fileset-referenced file keeps its rel-within-owner, a hardlinked
# file its rel path — so COW commits carry stats rows forward
# verbatim). DML touched-file discovery consults it before the footer
# scan: at ~2,000+ files per version the discovery job stops opening
# every footer and reads one tiny manifest instead.
# ---------------------------------------------------------------------------

SKIPSTATS_DIR = "_skipstats"


def write_manifest(
    spark, vdir: str, key_cols: list[str]
) -> int:
    """Materialize the per-file min/max manifest for every data file of
    ``vdir`` into ``<vdir>/_skipstats/`` (underscore-prefixed:
    invisible to every data read). Returns the number of files
    described. One aggregation keyed by ``_metadata.file_path``
    (shuffle ∝ |files|, map-side combined); the path is relativized
    DISTRIBUTEDLY (no driver-side file loop).

    PARTITION columns are included automatically (VERDICT r11 #6):
    they surface as ordinary columns of the directory read, so their
    per-file min/max (min == max — one value per file, from its
    ``key=value/`` path) record for free, and a DML predicate on a
    partition column then prunes from the SAME single manifest read as
    a data-column predicate instead of falling through to the footer
    scan.

    FILESET versions (the r12 COW carry, operators/filesets.py) are
    supported: stats compute per owner group and relativize to each
    OWNER's directory, so the manifest's ``rel_path`` values equal the
    sidecar's entry rels — exactly what the discovery routes'
    completeness check compares against."""
    import os

    from openaq_data_pipeline_engineering_spark.operators.filesets import (
        fileset_schema,
        group_files_by_base,
        read_fileset,
        version_data_files,
    )

    fs = read_fileset(vdir)
    if fs is None:
        df = spark.read.parquet(vdir)
        part_cols = [
            c
            for c in _dir_partition_cols(vdir)
            if c in df.columns and c not in key_cols
        ]
        cols = list(key_cols) + part_cols
        # Spark renders local file paths as "file:<abs>"; strip the
        # vdir prefix to the rel path (file: / file:// both guarded).
        out = relativize_stats(file_stats(df, cols, use_path=True), vdir)
    else:
        schema = fileset_schema(spark, fs)
        names = {f.name for f in schema.fields}
        part_cols = [
            c for c in fs["layout"] if c in names and c not in key_cols
        ]
        cols = list(key_cols) + part_cols
        parts = []
        for d, files in group_files_by_base(
            vdir, version_data_files(vdir)
        ):
            g = spark.read.schema(schema).option("basePath", d).parquet(
                *files
            )
            parts.append(
                relativize_stats(file_stats(g, cols, use_path=True), d)
            )
        if not parts:
            return 0
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
    out.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(vdir, SKIPSTATS_DIR)
    )
    return int(
        spark.read.parquet(os.path.join(vdir, SKIPSTATS_DIR)).count()
    )


def _dir_partition_cols(vdir: str) -> list[str]:
    """Hive partition-column sequence of ``vdir`` from one data file's
    relative path ([] for flat/empty) — one walk step, driver-side."""
    import os

    for dirpath, _dn, files in os.walk(vdir):
        rel = os.path.relpath(dirpath, vdir)
        if rel != "." and rel.split(os.sep)[0].startswith(("_", ".")):
            continue
        for f in files:
            if f.startswith(("_", ".")) or not f.endswith(".parquet"):
                continue
            segs = [] if rel == "." else rel.split(os.sep)
            return [s.split("=", 1)[0] for s in segs if "=" in s]
    return []


def manifest_key_cols(mdf: DataFrame) -> list[str]:
    """The key columns a persisted manifest describes (every ``*_min``
    column name, order preserved)."""
    return [c[: -len("_min")] for c in mdf.columns if c.endswith("_min")]


def relativize_stats(stats: DataFrame, vdir: str) -> DataFrame:
    """``file_stats(..., use_path=True)`` output -> persisted-manifest
    row shape: the absolute ``file_name`` URI becomes ``rel_path``
    relative to ``vdir`` (distributed regexp, no driver loop)."""
    import os

    abs_dir = os.path.abspath(vdir)
    rel = F.regexp_replace(
        F.regexp_replace("file_name", "^file:(//)?", ""),
        "^" + re.escape(abs_dir) + "/",
        "",
    )
    return stats.withColumn("rel_path", rel).drop("file_name")


def pruned_read_box(
    df: DataFrame,
    stats: DataFrame,
    preds: dict[str, tuple],
    use_path: bool = False,
) -> DataFrame:
    """Box-predicate read through the manifest: constrain the scan to
    files whose bounding boxes intersect the query box, then apply the
    exact per-column range predicates. Same declarative shape as
    :func:`pruned_read` (broadcast file-list semi-constraint; at scale
    the candidate list feeds the reader as a path list). Pass the
    ``use_path`` the manifest was built with (partitioned tables)."""
    src = "_metadata.file_path" if use_path else "_metadata.file_name"
    cands = candidate_files_box(stats, preds)
    out = df.withColumn("__file", F.col(src)).join(
        F.broadcast(cands.withColumnRenamed("file_name", "__file")),
        on="__file",
        how="inner",
    )
    for c, (lo, hi) in preds.items():
        out = out.filter((F.col(c) >= F.lit(lo)) & (F.col(c) <= F.lit(hi)))
    return out.drop("__file")
