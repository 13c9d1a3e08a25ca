"""Versioned table snapshots with time travel — a minimal lakehouse
commit protocol on plain parquet.

The reference overwrites its mart in place (reference
etls/openaq_transform_etl.py writes a fixed S3 prefix; a failed job can
leave a half-written table). This operator gives the batch mart the
same guarantees the streaming upsert sink already has (streaming/
upsert.py versioned snapshot): every write is a NEW immutable version
directory, readers pin a version, and "latest" advances atomically via
a tiny manifest rewrite — so a crashed writer can never corrupt what
readers see, and yesterday's pipeline output stays queryable (time
travel) for reproducible re-runs.

Layout:
    <root>/v=<N>/part-*.parquet     immutable snapshot data
    <root>/_VERSIONS.json           manifest: committed versions (the
                                    write is data-first, manifest-last:
                                    an uncommitted v-dir is invisible)

Scale notes: the manifest lists versions only (O(#snapshots), not
O(#files)); data files are listed by Spark's parquet reader per pinned
version directory, so reads stay partition-parallel. Version pruning =
directory pruning. This intentionally models the *commit protocol*
layer of Delta/Iceberg, not their file-level transaction log.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(root: str) -> str:
    return os.path.join(root, "_VERSIONS.json")


def _read_manifest(root: str) -> list[int]:
    try:
        with open(_manifest_path(root)) as f:
            return sorted(json.load(f)["versions"])
    except (OSError, ValueError, KeyError):
        return []


def _existing_version_dirs(root: str) -> list[int]:
    """Version numbers of every ``v=<N>`` directory on disk, committed
    or not. Uncommitted dirs are invisible to readers but must still be
    skipped by the writer: a job that crashed after creating ``v=N``
    but before the manifest commit would otherwise collide every
    subsequent ``write_snapshot`` at the same N forever."""
    out: list[int] = []
    try:
        entries = os.listdir(root)
    except OSError:
        return out
    for name in entries:
        if name.startswith("v=") and name[2:].isdigit():
            out.append(int(name[2:]))
    return sorted(out)


def write_snapshot(df: DataFrame, root: str) -> int:
    """Commit ``df`` as the next version; returns the version number.

    Data is written fully before the manifest references it (rename of
    a same-directory temp file — atomic on POSIX; on object stores the
    equivalent is a conditional PUT of the manifest key).

    The next version is ``max(manifest versions, on-disk v=* dirs)+1``:
    an orphaned uncommitted directory left by a crashed writer is
    skipped, not reused, so the write path can never wedge on it (the
    orphan stays invisible — it is never added to the manifest — and is
    reclaimed by :func:`vacuum_snapshots`).
    """
    os.makedirs(root, exist_ok=True)
    versions = _read_manifest(root)
    on_disk = _existing_version_dirs(root)
    version = max(versions + on_disk, default=0) + 1
    df.write.mode("errorifexists").parquet(
        os.path.join(root, f"v={version}")
    )
    fd, tmp = tempfile.mkstemp(dir=root, prefix="_VERSIONS.", suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump({"versions": versions + [version]}, f)
    os.replace(tmp, _manifest_path(root))
    return version


def read_snapshot(
    spark: SparkSession, root: str, version: int | None = None
) -> DataFrame:
    """Read a pinned version (time travel) or the latest committed one."""
    versions = _read_manifest(root)
    if not versions:
        raise FileNotFoundError(f"no committed versions under {root}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not committed: {versions}")
    return spark.read.parquet(os.path.join(root, f"v={version}"))


def snapshot_versions(root: str) -> list[int]:
    """Committed versions, oldest first."""
    return _read_manifest(root)


def vacuum_snapshots(
    root: str, keep_last: int = 2, min_age_seconds: float = 0.0
) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` committed
    versions, plus any orphaned uncommitted ``v=*`` dirs older than the
    grace period. Returns the committed versions removed.

    Manifest-first (the inverse of the write path): the manifest stops
    referencing old versions BEFORE their data directories are removed,
    so a NEW reader resolves either the old manifest (directories still
    present at resolve time) or the new one (never sees the dropped
    versions). A reader already mid-scan on a dropped version — or
    holding a DataFrame pinned over it — is NOT protected once its
    data dir is deleted; like Delta's VACUUM this assumes no reader
    outlives the retention window. Pass ``min_age_seconds`` (grace
    period, à la Delta's retention check) so versions written within
    the window survive even when they exceed ``keep_last``.
    """
    import shutil
    import time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = _read_manifest(root)
    now = time.time()

    def _old_enough(v: int) -> bool:
        if min_age_seconds <= 0:
            return True
        try:
            age = now - os.path.getmtime(os.path.join(root, f"v={v}"))
        except OSError:
            return True
        return age >= min_age_seconds

    drop = [v for v in versions[:-keep_last] if _old_enough(v)]
    keep = [v for v in versions if v not in drop]
    orphans = [
        v
        for v in _existing_version_dirs(root)
        if v not in versions and _old_enough(v)
    ]
    if not drop and not orphans:
        return []
    if drop:
        fd, tmp = tempfile.mkstemp(
            dir=root, prefix="_VERSIONS.", suffix=".tmp"
        )
        with os.fdopen(fd, "w") as f:
            json.dump({"versions": keep}, f)
        os.replace(tmp, _manifest_path(root))
    for v in drop + orphans:
        shutil.rmtree(os.path.join(root, f"v={v}"), ignore_errors=True)
    return drop
