"""Lakehouse walkthrough: versioned snapshots, MERGE INTO, time
travel, and the change data feed — the engine's late-data correction
story.

The reference pipeline is append-only (a failed or corrected day means
manually rewriting an S3 prefix); here the same mart becomes a
versioned table where corrections are declarative MERGE statements and
every prior state stays queryable.

Flow:

1. commit v1: the first half-month of events, aggregated per (day,
   event_type),
2. late + corrected data arrives: a MERGE INTO with UPDATE / INSERT /
   DELETE clauses (the parquet-native lowering — one join, no table
   format dependency) produces the corrected state, committed as v2,
3. time travel: v1 is still readable, pinned by version,
4. change data feed: snapshot_changes(v1, v2) emits the
   insert/delete/update_pre/update_post audit rows downstream
   consumers replay instead of re-reading the table,
5. lifecycle statements: RESTORE (metadata-only rollback), SHALLOW
   CLONE + INSERT (zero-copy fork, CoW divergence), ADD CONSTRAINT
   (storage-boundary invariants), PURGE (GDPR history rewrite),
   DESCRIBE DETAIL,
6. vacuum shows retention policy.

Run:  python examples/run_lakehouse.py [sf_dir] [workdir]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import Engine, get_spark
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    read_snapshot,
    snapshot_changes,
    snapshot_versions,
    vacuum_snapshots,
    write_snapshot,
)
from openaq_data_pipeline_engineering_spark.sources.star import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    root = (
        sys.argv[2]
        if len(sys.argv) > 2
        else tempfile.mkdtemp(prefix="lakehouse_demo_")
    )
    root = os.path.join(root, "daily_mart")
    spark = get_spark(app_name="lakehouse-demo", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    eng = Engine(spark)

    ev = load_table(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"),
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    daily = ev.groupBy("day", "event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents")
    )

    # -- 1. v1: the first half-month ------------------------------------
    v1_state = daily.filter(F.col("day") < F.lit("2024-01-16").cast("date"))
    v1 = write_snapshot(v1_state, root)
    print(f"committed v{v1}: {read_snapshot(spark, root).count()} rows")

    # -- 2. late data + corrections as one MERGE ------------------------
    # Second half-month arrives (inserts); 'click' rows from the first
    # half get re-counted (updates); 'error' rows are retracted
    # entirely (deletes).
    late = daily.filter(F.col("day") >= F.lit("2024-01-16").cast("date"))
    corrections = (
        v1_state.filter(F.col("event_type").isin("click", "error"))
        .withColumn("n", F.col("n") + 1)
        .withColumn("cents", F.col("cents") + 100)
        .unionByName(late)
    )
    eng.register("mart", read_snapshot(spark, root, version=v1))
    eng.register("fix", corrections)
    merged = eng.sql(
        "MERGE INTO mart t USING fix s "
        "ON t.day = s.day AND t.event_type = s.event_type "
        "WHEN MATCHED AND s.event_type = 'error' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET n = s.n, cents = s.cents "
        "WHEN NOT MATCHED THEN INSERT (day, event_type, n, cents) "
        "VALUES (s.day, s.event_type, s.n, s.cents)"
    )
    v2 = write_snapshot(merged, root)
    print(
        f"merged late+corrected data -> v{v2}: "
        f"{read_snapshot(spark, root).count()} rows"
    )

    # -- 3. time travel -------------------------------------------------
    n_v1 = read_snapshot(spark, root, version=v1).count()
    print(f"time travel: v{v1} still readable with {n_v1} rows")

    # -- 4. change data feed --------------------------------------------
    feed = snapshot_changes(
        spark, root, keys=["day", "event_type"], v_from=v1, v_to=v2
    )
    summary = {
        r["_change_type"]: r["cnt"]
        for r in feed.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    print(
        "change data feed v1->v2: "
        + ", ".join(f"{k}={summary[k]}" for k in sorted(summary))
    )

    # -- 5. lifecycle statements (round-8 surface) ------------------------
    # Rollback: the v2 correction turns out wrong — RESTORE is a
    # metadata-only commit (zero bytes moved), history preserved.
    row = eng.sql(f"RESTORE TABLE '{root}' TO VERSION AS OF {v1}").first()
    print(
        f"restored to v{row['restored_to_version']} as "
        f"v{row['new_version']} (metadata-only, {row['n_rows']} rows)"
    )
    # Fork: experiment against production data without copying it.
    clone = root + "_experiment"
    crow = eng.sql(f"CREATE TABLE '{clone}' SHALLOW CLONE '{root}'").first()
    eng.sql(f"INSERT INTO '{clone}' VALUES (DATE'2024-02-01', 'synthetic', 1, 100)")
    print(
        f"shallow clone: {crow['n_local_data_files']} files copied; "
        f"clone={read_snapshot(spark, clone).count()} rows, "
        f"source={read_snapshot(spark, root).count()} rows (untouched)"
    )
    # Invariant: the storage boundary rejects bad rows from here on.
    eng.sql(f"ALTER TABLE '{root}' ADD CONSTRAINT n_pos CHECK (n > 0)")
    # Erasure: remove an event type from ALL retained versions (the
    # history rewrite a GDPR request needs; DELETE can't reach history).
    purged = eng.sql(f"PURGE FROM '{root}' WHERE event_type = 'purchase'")
    print(
        "purged 'purchase' from every version: "
        + ", ".join(
            f"v{r['version']}:{r['n_purged']}" for r in purged.collect()
        )
    )
    detail = eng.sql(f"DESCRIBE DETAIL '{root}'").first()
    print(
        f"detail: latest=v{detail['latest_version']} "
        f"({detail['n_versions']} versions, {detail['n_rows']} rows, "
        f"constraints={detail['constraints']})"
    )

    # -- 6. retention (clone-aware) ---------------------------------------
    # The clone above still reads versions through this root: vacuum
    # REFUSES to reclaim anything a live clone needs (round 9) — the
    # accidental clone-break is no longer possible; an explicit
    # force_break_clones=True restores the old loud-break behavior.
    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        VacuumBlockedByCloneError,
    )

    try:
        dropped = vacuum_snapshots(root, keep_last=1)
        print(
            f"vacuum(keep_last=1): dropped {dropped or 'nothing'} "
            "(clone-needed versions were auto-protected)"
        )
    except VacuumBlockedByCloneError as e:
        print(f"vacuum refused (clone protection): {str(e)[:84]}...")
    dropped = vacuum_snapshots(root, keep_last=2)
    print(
        f"vacuum(keep_last=2): dropped {dropped or 'nothing'}; "
        f"versions on disk: {snapshot_versions(root)}"
    )
    workdir = os.path.dirname(root)

    # -- 7. round-9 surface: named time travel + admission-capped feed ---
    # Time travel over a registered NAME (not a quoted path literal).
    eng.register_versioned("mart_events", root)
    n_v1 = eng.sql(
        f"SELECT COUNT(*) AS n FROM mart_events VERSION AS OF {v1}"
    ).first()["n"]
    print(f"named time travel: mart_events VERSION AS OF {v1} -> {n_v1} rows")

    # Tail the clone's commit log as a stream, admission-capped: a
    # backlog drains in bounded micro-batches (maxVersionsPerBatch),
    # and the executor exchange is Arrow RecordBatches, not rows.
    from openaq_data_pipeline_engineering_spark.sources.versioned_stream import (
        register_versioned_feed,
    )

    register_versioned_feed(spark)
    feed_out = os.path.join(workdir, "feed_out")
    q = (
        spark.readStream.format("versioned_feed")
        .option("root", clone)
        .option("startingVersion", str(crow["cloned_version"]))
        .option("maxVersionsPerBatch", "1")
        .load()
        .writeStream.format("parquet")
        .option("path", feed_out)
        .option("checkpointLocation", os.path.join(workdir, "feed_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_streamed = spark.read.parquet(feed_out).count()
    print(
        f"versioned feed (capped, Arrow exchange): streamed "
        f"{n_streamed} appended row(s) from the clone's commit log"
    )

    # -- 8. statement-surface completions: CONVERT, path-MERGE, TVF ----
    # Adopt an EXISTING plain parquet table as a versioned root without
    # copying data (atomic per-entry renames into v=1).
    plain = os.path.join(workdir, "plain_table")
    spark.createDataFrame(
        [(1, "pm25"), (2, "pm10"), (3, "o3")], "k int, parameter string"
    ).write.parquet(plain)
    conv = eng.sql(f"CONVERT '{plain}' TO VERSIONED").first()
    print(
        f"CONVERT TO VERSIONED: adopted {conv['n_rows']} rows as "
        f"v{conv['version']} (zero bytes copied)"
    )

    # Enable a change feed on the adopted table, then mutate it with a
    # PATH-TARGET MERGE: the statement reads the latest snapshot and
    # publishes atomically under the optimistic guard.
    eng.sql(f"ALTER TABLE '{plain}' ENABLE CHANGE FEED (k)")
    spark.createDataFrame(
        [(2, "pm10-corrected"), (4, "no2")], "k int, parameter string"
    ).createOrReplaceTempView("param_fixes")
    m = eng.sql(
        f"MERGE INTO '{plain}' AS t USING param_fixes AS s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET parameter = s.parameter "
        "WHEN NOT MATCHED THEN INSERT *"
    ).first()
    print(
        f"path-target MERGE: v{m['base_version']} -> v{m['version']}, "
        f"{m['n_rows']} rows"
    )

    # Query the commit's row-level changes with the table_changes()
    # TVF (Delta range contract: both bounds inclusive, so start at
    # the merge's own version — the adopted v1 predates the change
    # feed and has no change files) — the same splice composes inside
    # MERGE sources, so CDC replication is one statement.
    for r in eng.sql(
        f"SELECT _change_type, k, parameter "
        f"FROM table_changes('{plain}', {m['version']}) "
        "ORDER BY _change_type, k"
    ).collect():
        print(f"  change: {r['_change_type']:17s} k={r['k']} "
              f"parameter={r['parameter']}")

    # -- 9. round-10 surfaces: the save facade + file-granular DML ----
    # DataFrameWriter-parity facade: no operator imports needed.
    from openaq_data_pipeline_engineering_spark import load_versioned, save_versioned

    facade = os.path.join(workdir, "facade_table")
    save_versioned(
        spark.range(0, 1000).selectExpr(
            "id AS k", "cast(id % 9 as double) AS score"
        ).repartition(8, "k"),
        facade,
    )
    save_versioned(
        spark.createDataFrame([(5000, 1.0)], "k long, score double"),
        facade,
        mode="append",
    )
    print(f"facade: latest holds {load_versioned(spark, facade).count()} rows")

    # A one-key UPDATE rewrites only the file containing the key; the
    # other files carry into the new version as fileset sidecar
    # references to their owner version (r12: zero copy syscalls,
    # object-store-safe — operators/filesets.py).
    from openaq_data_pipeline_engineering_spark.operators.cow import last_cow_stats
    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        checkpoint_appends,
    )

    checkpoint_appends(spark, facade)  # zero-copy chain rebase first
    eng.sql(f"UPDATE '{facade}' SET score = score + 100.0 WHERE k = 7")
    s = last_cow_stats(facade)
    print(
        "file-granular UPDATE: rewrote "
        f"{s['files_rewritten']} file(s) ({s['bytes_rewritten']} B), "
        f"reference-carried {s['files_carried']} "
        f"({s['bytes_carried']} B untouched, "
        f"{s['copy_syscalls']} copy syscalls)"
    )
    spark.stop()


if __name__ == "__main__":
    main()
