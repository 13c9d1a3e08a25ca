"""Structured Streaming SOURCE over a versioned table — tail the
commit log the way Delta's streaming source tails its transaction log.

A downstream consumer (feature builder, index refresher, replication)
wants each APPEND exactly once, not a re-read of the table. The
versioned layer (operators/versioned.py) already gives every commit an
immutable directory and a totally-ordered manifest, which is precisely
a streaming offset log:

- offset = ``{"version": N}``: committed versions <= N are consumed;
- a micro-batch reads the version directories in ``(start, end]``;
- directories are immutable, so ``(start, end]`` replays EXACTLY on
  recovery — the determinism contract Structured Streaming needs.

Offset soundness under concurrent writers: version-number order equals
commit order for every commit the stream can emit — the commit
protocol REJECTS a delta committing below an already-committed higher
version (operators/versioned._commit_version's out-of-order guard; the
writer auto-retries at a fresh number), so a delta can never land
inside an already-closed ``(start, end]`` range and be silently
skipped. The one commit that may still land below ``latestOffset`` is
a FULL snapshot racing above-numbered fulls; it is history-only (no
latest/as-of reader ever resolves it, and it bases no chain), so
skipping it is correct in both strict and ``ignoreChanges`` modes.

Append-only semantics, Delta parity: a ``delta`` commit streams its
rows; a FULL commit (INSERT OVERWRITE / OPTIMIZE / checkpoint) or a
RESTORE rewrites or rewinds content, which an append-tail cannot
represent — the stream FAILS loudly unless ``ignoreChanges=true``
(then non-delta commits are skipped, exactly Delta's escape hatch).

Scale design: this is the PARTITIONED ``DataSourceStreamReader`` (not
the driver-side Simple variant) — the driver only lists the manifest
and file names per micro-batch (O(#files of new commits)); each data
file becomes one ``InputPartition`` read with pyarrow ON EXECUTORS, so
a wide append fans out across the cluster like any parquet scan.

Usage::

    register_versioned_feed(spark)
    stream = (spark.readStream.format("versioned_feed")
              .option("root", root)
              .option("startingVersion", "0")   # exclusive
              .load())

Reference contrast: the reference pipeline re-lists whole S3 prefixes
per run (reference etls/openaq_etl.py incremental extract); here
incrementality is a property of the commit protocol itself.
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)


class NonAppendCommitError(Exception):
    """The stream hit a FULL or RESTORE commit it cannot represent as
    an append; pass ignoreChanges=true to skip such commits."""


def _arrow_to_ddl(schema) -> str:
    """pyarrow schema -> Spark DDL string for the common scalar types
    the versioned tables use. Loud on anything exotic — a silent wrong
    mapping would corrupt every downstream row."""
    import pyarrow as pa

    def one(t) -> str:
        if pa.types.is_int64(t):
            return "bigint"
        if pa.types.is_int32(t):
            return "int"
        if pa.types.is_float64(t):
            return "double"
        if pa.types.is_float32(t):
            return "float"
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "string"
        if pa.types.is_boolean(t):
            return "boolean"
        if pa.types.is_timestamp(t):
            return "timestamp"
        if pa.types.is_date(t):
            return "date"
        if isinstance(t, pa.Decimal128Type):
            return f"decimal({t.precision},{t.scale})"
        raise NonAppendCommitError(
            f"versioned_feed cannot map arrow type {t} to Spark DDL; "
            "pass an explicit .schema(...)"
        )

    return ", ".join(f"`{f.name}` {one(f.type)}" for f in schema)


class _FilePartition(InputPartition):
    def __init__(self, path: str, columns: list[str]):
        self.path = path
        self.columns = columns


class VersionedFeedStreamReader(DataSourceStreamReader):
    def __init__(self, schema, options: dict):
        self.root = options.get("root", "")
        if not self.root:
            raise ValueError("versioned_feed requires .option('root', path)")
        self.starting = int(options.get("startingversion", "0"))
        self.ignore_changes = (
            options.get("ignorechanges", "false").lower() == "true"
        )
        self.columns = [f.name for f in schema.fields]

    # -- offset log ------------------------------------------------------
    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            snapshot_versions,
        )

        versions = snapshot_versions(self.root)
        return {"version": versions[-1] if versions else self.starting}

    # -- planning (driver): manifest + file listing only ------------------
    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            _read_manifest_doc,
            _version_dir,
        )

        lo, hi = int(start["version"]), int(end["version"])
        doc = _read_manifest_doc(self.root)
        parts: list[InputPartition] = []
        for v in doc["versions"]:
            if not lo < v <= hi:
                continue
            mode = doc["modes"].get(v, "full")
            if mode != "delta":
                if self.ignore_changes:
                    continue  # Delta's ignoreChanges: skip rewrites
                raise NonAppendCommitError(
                    f"version {v} of {self.root!r} is a {mode!r} commit — "
                    "an append tail cannot represent a rewrite/rewind; "
                    "restart from a fresh startingVersion or set "
                    ".option('ignoreChanges', 'true') to skip it"
                )
            d = _version_dir(self.root, v)
            for name in sorted(os.listdir(d)):
                if name.endswith(".parquet"):
                    parts.append(
                        _FilePartition(os.path.join(d, name), self.columns)
                    )
        return parts

    # -- execution (executors): one immutable file per partition ----------
    def read(self, partition: _FilePartition) -> Iterator[tuple]:
        import pyarrow.parquet as pq

        table = pq.read_table(partition.path, columns=partition.columns)
        cols = [table.column(c).to_pylist() for c in partition.columns]
        return iter(zip(*cols)) if cols else iter([])

    def commit(self, end: dict) -> None:
        pass  # version directories are immutable; nothing to release


class VersionedFeedDataSource(DataSource):
    """``spark.readStream.format("versioned_feed")`` — see module doc."""

    @classmethod
    def name(cls) -> str:
        return "versioned_feed"

    def schema(self) -> str:
        # Infer from the LATEST snapshot's parquet footers (driver-side,
        # no data pages); an explicit .schema(...) overrides.
        import pyarrow.parquet as pq

        from openaq_data_pipeline_engineering_spark.operators.versioned import (
            resolve_version_paths,
        )

        root = self.options.get("root", "")
        if not root:
            raise ValueError("versioned_feed requires .option('root', path)")
        for d in reversed(resolve_version_paths(root)):
            for name in sorted(os.listdir(d)):
                if name.endswith(".parquet"):
                    return _arrow_to_ddl(
                        pq.ParquetFile(
                            os.path.join(d, name)
                        ).schema_arrow
                    )
        raise FileNotFoundError(f"no parquet data under {root!r}")

    def streamReader(self, schema) -> VersionedFeedStreamReader:
        return VersionedFeedStreamReader(schema, dict(self.options))


def register_versioned_feed(spark) -> None:
    """Register the ``versioned_feed`` streaming format on this
    session."""
    spark.dataSource.register(VersionedFeedDataSource)
