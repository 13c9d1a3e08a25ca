"""COW touched-file discovery at realistic file counts (VERDICT r10 #4).

The round-10 A/B used a 32-file table; footer-stat discovery cost grows
with file count (every file's parquet footer is opened even when
row-group stats then skip its pages). This probe builds a versioned
table with ~N_FILES part files, then times a one-key UPDATE's discovery
three ways:

  A. footer-scan discovery (no manifest)            — the fallback path
  B. manifest-backed discovery (skipstats sidecar)  — the preferred path
  C. the full UPDATE statement end-to-end with the manifest present

and verifies both discovery routes return the SAME touched set. Run:

    python tools/discovery_probe.py [n_files] [rows_per_file]

Alternating A/B within one process; absolute times are host-dependent,
the RATIO is the result.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from openaq_data_pipeline_engineering_spark.engine import Engine, get_spark
from openaq_data_pipeline_engineering_spark.operators.cow import (
    last_cow_stats,
    touched_files_by_predicate,
)
from openaq_data_pipeline_engineering_spark.operators.skipstats import (
    SKIPSTATS_DIR,
    write_manifest,
)
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    write_snapshot,
)


def main() -> int:
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rows_per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    base = tempfile.mkdtemp(prefix="discovery_probe_")
    root = os.path.join(base, "t")
    n = n_files * rows_per_file
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    # range-partitioned by k so file min/max ranges are TIGHT — the
    # realistic layout for manifest pruning (an OPTIMIZE ZORDER or a
    # sorted ingest produces exactly this)
    write_snapshot(df.repartitionByRange(n_files, "k"), root)
    vdir = os.path.join(root, "v=1")
    got_files = sum(1 for _ in __import__(
        "openaq_data_pipeline_engineering_spark.operators.compact",
        fromlist=["iter_data_parquet_files"],
    ).iter_data_parquet_files(vdir))
    pred = f"k = {n // 2}"

    def timed(fn, reps=3):
        best = float("inf")
        out = None
        for _ in range(reps):
            t0 = time.time()
            out = fn()
            best = min(best, time.time() - t0)
        return best, out

    # A: footer-scan (no manifest yet)
    t_scan, touched_scan = timed(
        lambda: touched_files_by_predicate(spark, vdir, pred)
    )
    # build the manifest (one-time maintenance cost, also timed)
    t0 = time.time()
    n_manifest = write_manifest(spark, vdir, ["k"])
    t_build = time.time() - t0
    # B: manifest-backed
    t_manifest, touched_manifest = timed(
        lambda: touched_files_by_predicate(spark, vdir, pred)
    )
    assert touched_scan == touched_manifest, "routes disagree!"
    # C: full UPDATE end-to-end with the manifest present
    t0 = time.time()
    Engine(spark).sql(
        f"UPDATE '{root}' SET v = 0.0 WHERE k = {n // 2}"
    ).first()
    t_update = time.time() - t0
    stats = last_cow_stats(root) or {}
    # the COW commit carried the manifest forward
    carried_manifest = os.path.isdir(
        os.path.join(root, f"v={stats.get('version')}", SKIPSTATS_DIR)
    )
    print(
        {
            "n_files": got_files,
            "n_rows": n,
            "manifest_rows": n_manifest,
            "touched": len(touched_scan),
            "discovery_footer_scan_s": round(t_scan, 3),
            "discovery_manifest_s": round(t_manifest, 3),
            "speedup": round(t_scan / max(t_manifest, 1e-9), 2),
            "manifest_build_s": round(t_build, 3),
            "update_e2e_s": round(t_update, 3),
            "files_rewritten": stats.get("files_rewritten"),
            "files_carried": stats.get("files_carried"),
            "manifest_carried_to_new_version": carried_manifest,
        }
    )
    shutil.rmtree(base, ignore_errors=True)
    partitioned_probe(spark)
    fileset_probe(spark)
    return 0


def partitioned_probe(spark, n_groups: int = 8, rows: int = 4000) -> None:
    """Round-12 additions, pinned A/B-style:

    1. PARTITION-VALUE manifest pruning (VERDICT r11 #6): on a
       Hive-partitioned table with a skipstats manifest, a predicate
       on the PARTITION column must resolve its candidate set to
       exactly ONE partition's files from the manifest alone.
    2. NO-WALK eligibility (VERDICT r11 #2): cow_eligible_base on a
       version whose layout is RECORDED in the commit manifest must
       not walk a single data file (counted by wrapping the walker).
    """
    from openaq_data_pipeline_engineering_spark.operators import compact, cow
    from openaq_data_pipeline_engineering_spark.operators.cow import (
        _manifest_candidates,
        cow_eligible_base,
    )

    base = tempfile.mkdtemp(prefix="discovery_probe_part_")
    root = os.path.join(base, "t")
    df = spark.range(0, rows).select(
        F.col("id").alias("k"),
        (F.col("id") % n_groups).cast("int").alias("g"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    write_snapshot(
        df.repartition(4, "k"), root, partition_by=["g"]
    )
    vdir = os.path.join(root, "v=1")
    write_manifest(spark, vdir, ["k"])  # g auto-included (partition col)
    cands = _manifest_candidates(spark, vdir, "g = 3")
    one_partition = sorted(
        p
        for p in compact.iter_data_parquet_files(vdir)
        if f"{os.sep}g=3{os.sep}" in p
    )
    assert cands == one_partition, (
        f"partition-key pruning mismatch: {len(cands or [])} candidates "
        f"vs {len(one_partition)} files in g=3"
    )

    real_walk = cow.iter_data_parquet_files
    walk_calls = {"n": 0}

    def counting_walk(d):
        walk_calls["n"] += 1
        return real_walk(d)

    cow.iter_data_parquet_files = counting_walk
    try:
        eligible = cow_eligible_base(root, 1)
    finally:
        cow.iter_data_parquet_files = real_walk
    assert eligible, "partitioned base must be COW-eligible"
    print(
        {
            "partition_probe": {
                "n_partitions": n_groups,
                "candidates_for_g3": len(cands),
                "files_in_g3": len(one_partition),
                "pruned_to_one_partition": cands == one_partition,
                "eligibility_file_walks": walk_calls["n"],
            }
        }
    )
    assert walk_calls["n"] == 0, (
        "recorded-layout eligibility must not walk data files, "
        f"walked {walk_calls['n']}x"
    )
    shutil.rmtree(base, ignore_errors=True)


def fileset_probe(
    spark, n_files: int = 200, rows_per_file: int = 100, depth: int = 10
) -> None:
    """Round-12 carry-model A/B (VERDICT r11 #1): ``depth`` sequential
    one-key UPDATEs on an ``n_files`` table. Under the fileset carry,
    each commit PHYSICALLY writes only its rewritten file(s) plus one
    small sidecar — zero link/copy syscalls for the other n_files-1 —
    so cumulative on-disk data bytes grow ∝ touched files, not
    ∝ depth × table size (the hardlink carry matched that locally but
    copied the whole table per statement on an object store). The
    deepest version must still read in one grouped scan."""
    from openaq_data_pipeline_engineering_spark.operators import compact
    from openaq_data_pipeline_engineering_spark.operators.filesets import (
        FILESET_SIDECAR,
        read_fileset,
    )

    base = tempfile.mkdtemp(prefix="fileset_probe_")
    root = os.path.join(base, "t")
    n = n_files * rows_per_file
    df = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    write_snapshot(df.repartitionByRange(n_files, "k"), root)
    base_bytes = sum(
        os.path.getsize(p)
        for p in compact.iter_data_parquet_files(os.path.join(root, "v=1"))
    )
    eng = Engine(spark)
    total_rewritten = 0
    total_copies = 0
    t0 = time.time()
    for i in range(depth):
        eng.sql(
            f"UPDATE '{root}' SET v = {float(i)} "
            f"WHERE k = {(i + 1) * (n // (depth + 1))}"
        ).first()
        s = last_cow_stats(root)
        total_rewritten += s["files_rewritten"]
        total_copies += s["copy_syscalls"]
    t_dml = time.time() - t0
    # physical bytes across ALL version dirs (each file counted once —
    # fileset carries add no names, so a plain walk is exact)
    phys = 0
    sidecar_bytes = 0
    for d in os.listdir(root):
        if not d.startswith("v="):
            continue
        vdir = os.path.join(root, d)
        phys += sum(
            os.path.getsize(p)
            for p in compact.iter_data_parquet_files(vdir)
        )
        sc = os.path.join(vdir, FILESET_SIDECAR)
        if os.path.isfile(sc):
            sidecar_bytes += os.path.getsize(sc)
    deepest = os.path.join(root, f"v={depth + 1}")
    from openaq_data_pipeline_engineering_spark.operators.filesets import (
        read_version_dir,
    )

    t0 = time.time()
    n_read = read_version_dir(spark, deepest).count()
    t_read = time.time() - t0
    fs = read_fileset(deepest)
    print(
        {
            "fileset_probe": {
                "n_files": n_files,
                "dml_depth": depth,
                "files_rewritten_total": total_rewritten,
                "copy_syscalls_total": total_copies,
                "physical_growth_x": round(phys / base_bytes, 3),
                "sidecar_bytes_total": sidecar_bytes,
                "deepest_entries": len(fs["entries"]),
                "deepest_read_rows": n_read,
                "deepest_read_s": round(t_read, 3),
                "dml_total_s": round(t_dml, 3),
            }
        }
    )
    assert total_copies == 0, "carry must be reference-only"
    assert n_read == n
    # hardlink carry grew names ∝ depth×files; the object-store
    # equivalent grew BYTES the same way — fileset growth is bounded
    # by rewritten files + sidecars
    assert phys < base_bytes * 2, f"physical grew {phys / base_bytes:.2f}x"
    shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
