"""Round-6 declared queries: oracle witnesses for the storage-layer
surfaces that were previously pytest-only (round-5 verdict items 2 & 4).

- ``sql_merge_into``: the MERGE INTO statement form
  (operators/sqlmerge.py) executed through Engine.sql over versioned
  snapshots — post-merge v2 table must hash-match a DuckDB-computed
  merge with DELETE + UPDATE + INSERT clauses.
- ``versioned_time_travel``: write v1 (half-month) and v2 (full month)
  snapshots, read BOTH back via pinned-version time travel
  (operators/versioned.py), aggregate each.
- ``skipstats_pruned_read``: file-level min/max manifest pruning
  (operators/skipstats.py) over a range-partitioned write; the pruned
  equality read must equal a plain filter.
- ``compaction_roundtrip``: small-file compaction
  (operators/compact.py) rewrite → cold read-back equals the source
  aggregate.

All four follow the sink-witness pattern (write to scratch → cold
read-back → aggregate; the oracle recomputes from the source table),
so the driver's value hash covers the WRITE path too.

Registered LAST in registry._load_all so these names sort after the
existing never-driver-sampled backlog in the driver's ~50-query prefix.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.plans.registry import query
from openaq_data_pipeline_engineering_spark.scratch import fresh_scratch_dir
from openaq_data_pipeline_engineering_spark.sources.star import load_table

# Shared event-aggregate shape for the storage witnesses: exact-integer
# cents (floor(value*100)) per the registry float policy.
_EV_AGG_SQL = (
    "CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents"
)


def _ev_agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
    )


# --------------------------------------------------------------------------
# MERGE INTO over versioned snapshots: base state committed as v1, the
# statement's DELETE/UPDATE/INSERT applied through Engine.sql's
# parquet-native lowering (one full-outer join + CASE projection —
# operators/sqlmerge.py), result committed as v2 and read back COLD.
# The reference's append-only pipeline has no row-level correction
# path (SURVEY §2.9 maps late data to "Delta MERGE"); this is that
# statement form, minus any table-format dependency.
# Scale: the join broadcasts the delta side under AQE; snapshot commit
# is O(one manifest rewrite).
# --------------------------------------------------------------------------
@query(
    "sql_merge_into",
    "MERGE INTO statement (DELETE + UPDATE + INSERT clauses) lowered to "
    "one join, committed as snapshot v2, cold read-back",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer WHERE c_custkey <= 1200
    ), upd AS (
        SELECT c_custkey, 'MOVED' AS c_mktsegment,
               CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer WHERE c_custkey > 1000 AND c_custkey <= 1400
    )
    SELECT b.c_custkey, b.c_mktsegment, b.c_acctbal
    FROM base b ANTI JOIN upd u ON b.c_custkey = u.c_custkey
    UNION ALL
    SELECT b.c_custkey, u.c_mktsegment, b.c_acctbal + u.c_acctbal
    FROM base b JOIN upd u ON b.c_custkey = u.c_custkey
    WHERE u.c_acctbal >= 0
    UNION ALL
    SELECT u.c_custkey, u.c_mktsegment, u.c_acctbal
    FROM upd u ANTI JOIN base b ON u.c_custkey = b.c_custkey
    """,
)
def sql_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import Engine
    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        read_snapshot,
        write_snapshot,
    )

    # No fan_out: this frame's destiny is write_snapshot — the
    # round-robin repartition only split the versioned base into 32
    # near-empty files, and every later statement's discovery scan,
    # rewrite job, carry and footer pass is O(files) (r13 A/B: a
    # statement on a 32-file base 1.04 s vs 0.57 s on a 1-file base).
    # At scale the scan's own splits carry the projection + write.
    cust = load_table(spark, sf_dir, "customer")
    base = cust.filter(F.col("c_custkey") <= 1200).select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    upd = cust.filter(
        (F.col("c_custkey") > 1000) & (F.col("c_custkey") <= 1400)
    ).select(
        "c_custkey",
        F.lit("MOVED").alias("c_mktsegment"),
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    root = fresh_scratch_dir("sql_merge_root")
    write_snapshot(base, root)  # v1: pre-merge state, stays queryable
    eng = Engine(spark)
    eng.register("sql_merge_tgt", read_snapshot(spark, root, version=1))
    eng.register("sql_merge_upd", upd)
    merged = eng.sql(
        "MERGE INTO sql_merge_tgt t USING sql_merge_upd u "
        "ON t.c_custkey = u.c_custkey "
        "WHEN MATCHED AND u.c_acctbal < 0 THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET c_mktsegment = u.c_mktsegment, "
        "c_acctbal = t.c_acctbal + u.c_acctbal "
        "WHEN NOT MATCHED THEN INSERT (c_custkey, c_mktsegment, c_acctbal) "
        "VALUES (u.c_custkey, u.c_mktsegment, u.c_acctbal)"
    )
    v2 = write_snapshot(merged, root)  # atomic publish of the merge
    return read_snapshot(spark, root, version=v2)


# --------------------------------------------------------------------------
# Time travel: v1 = first half of the month, v2 = the full month;
# read BOTH pinned versions back and aggregate each. A state reset,
# manifest corruption, or v2-write clobbering v1's directory would
# break the version-1 half against the oracle's filtered recompute.
# --------------------------------------------------------------------------
@query(
    "versioned_time_travel",
    "versioned snapshots: pinned-version reads of v1 (half month) and "
    "v2 (full month) each match a recompute from source",
    oracle=f"""
    SELECT CAST(1 AS INT) AS version, event_type, {_EV_AGG_SQL}
    FROM events WHERE CAST(ts AS DATE) < DATE '2024-01-16'
    GROUP BY event_type
    UNION ALL
    SELECT CAST(2 AS INT) AS version, event_type, {_EV_AGG_SQL}
    FROM events GROUP BY event_type
    """,
)
def versioned_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        read_snapshot,
        write_snapshot,
    )

    # no fan_out: destiny is write_snapshot (see sql_merge_into)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    half = ev.filter(
        F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")
    )
    root = fresh_scratch_dir("time_travel_root")
    write_snapshot(half, root)  # v1
    write_snapshot(ev, root)  # v2 (full state, not an append delta)
    v1 = _ev_agg(read_snapshot(spark, root, version=1)).select(
        F.lit(1).alias("version"), "event_type", "n_events", "cents"
    )
    v2 = _ev_agg(read_snapshot(spark, root)).select(  # latest == v2
        F.lit(2).alias("version"), "event_type", "n_events", "cents"
    )
    return v1.unionByName(v2)


# --------------------------------------------------------------------------
# Data skipping: range-partitioned write gives files disjoint user_id
# ranges; the min/max manifest (one agg keyed by _metadata.file_name)
# then prunes the equality read to the candidate files. Values must
# equal a plain filter — and tests/test_index_ops.py asserts the scan
# actually reads fewer files. The min(user_id) probe key exists at
# every SF by construction.
# --------------------------------------------------------------------------
@query(
    "skipstats_pruned_read",
    "file-skipping: min/max manifest-pruned equality read over a "
    "range-partitioned write equals a plain filter",
    oracle=f"""
    SELECT event_type, {_EV_AGG_SQL}
    FROM events WHERE user_id = (SELECT min(user_id) FROM events)
    GROUP BY event_type
    """,
)
def skipstats_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.skipstats import (
        file_stats,
        pruned_read,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out = fresh_scratch_dir("skipstats_table")
    ev.repartitionByRange(8, "user_id").write.mode("overwrite").parquet(out)
    table = spark.read.parquet(out)
    stats = file_stats(table, ["user_id"])
    probe = ev.agg(F.min("user_id")).first()[0]
    return _ev_agg(pruned_read(table, stats, "user_id", probe))


# --------------------------------------------------------------------------
# Compaction: a deliberately fragmented partitioned write (16 files per
# event_type partition) rewritten to ~target-size files by
# compact_partitions, then read back COLD — the aggregate must equal
# the source. tests/test_scale_ops.py asserts the file-count drop;
# this witness pins that the rewrite loses/duplicates nothing.
# --------------------------------------------------------------------------
@query(
    "compaction_roundtrip",
    "small-file compaction: fragmented partitioned write -> "
    "compact_partitions -> cold read-back equals source aggregate",
    oracle=f"""
    SELECT event_type, {_EV_AGG_SQL},
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def compaction_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.compact import (
        compact_partitions,
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    out = fresh_scratch_dir("compaction_table")
    (
        ev.repartition(16)  # fragment: 16 small files per partition
        .write.mode("overwrite")
        .partitionBy("event_type")
        .parquet(out)
    )
    compact_partitions(spark, out, ["event_type"])
    back = spark.read.parquet(out)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("cents"),
        F.count_distinct("user_id").alias("n_users"),
    )


# --------------------------------------------------------------------------
# MERGE full-sync shape (WHEN NOT MATCHED BY SOURCE): the source is the
# complete desired state for its key range — matched rows take the
# source version, new keys insert, and target rows the source no longer
# contains are deleted (negative balance) or flagged STALE. This is the
# Delta/SQL:2003 BY SOURCE clause family over the same parquet-native
# lowering (still ONE full-outer join + CASE projection — the clause
# family only adds WHEN branches, never another join or shuffle).
# --------------------------------------------------------------------------
@query(
    "sql_merge_full_sync",
    "MERGE with WHEN NOT MATCHED BY SOURCE (update/insert/delete-or-"
    "flag absent targets) — the full-sync statement shape",
    oracle="""
    WITH base AS (
        SELECT c_custkey, c_mktsegment, CAST(c_acctbal AS DOUBLE) AS c_acctbal
        FROM customer WHERE c_custkey <= 1200
    ), src AS (
        SELECT c_custkey, 'SYNC' AS c_mktsegment,
               CAST(c_acctbal AS DOUBLE) + 1.0 AS c_acctbal
        FROM customer WHERE c_custkey > 1000 AND c_custkey <= 1400
    )
    SELECT s.c_custkey, s.c_mktsegment, s.c_acctbal
    FROM src s JOIN base b ON b.c_custkey = s.c_custkey
    UNION ALL
    SELECT s.c_custkey, s.c_mktsegment, s.c_acctbal
    FROM src s ANTI JOIN base b ON b.c_custkey = s.c_custkey
    UNION ALL
    SELECT b.c_custkey, 'STALE' AS c_mktsegment, b.c_acctbal
    FROM base b ANTI JOIN src s ON s.c_custkey = b.c_custkey
    WHERE b.c_acctbal >= 0
    """,
)
def sql_merge_full_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import Engine

    # No fan_out: this frame's destiny is write_snapshot — the
    # round-robin repartition only split the versioned base into 32
    # near-empty files, and every later statement's discovery scan,
    # rewrite job, carry and footer pass is O(files) (r13 A/B: a
    # statement on a 32-file base 1.04 s vs 0.57 s on a 1-file base).
    # At scale the scan's own splits carry the projection + write.
    cust = load_table(spark, sf_dir, "customer")
    base = cust.filter(F.col("c_custkey") <= 1200).select(
        "c_custkey",
        "c_mktsegment",
        F.col("c_acctbal").cast("double").alias("c_acctbal"),
    )
    src = cust.filter(
        (F.col("c_custkey") > 1000) & (F.col("c_custkey") <= 1400)
    ).select(
        "c_custkey",
        F.lit("SYNC").alias("c_mktsegment"),
        (F.col("c_acctbal").cast("double") + F.lit(1.0)).alias("c_acctbal"),
    )
    eng = Engine(spark)
    eng.register("full_sync_tgt", base)
    eng.register("full_sync_src", src)
    return eng.sql(
        "MERGE INTO full_sync_tgt t USING full_sync_src s "
        "ON t.c_custkey = s.c_custkey "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED BY TARGET THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE AND t.c_acctbal < 0 THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c_mktsegment = 'STALE'"
    )


# --------------------------------------------------------------------------
# Change data feed between committed versions (Delta CDF shape):
# v1 = first half of the month; v2 = the next day's desired state
# (purchases retracted, clicks repriced +1 cent, second half arrives).
# snapshot_changes diffs the two pinned versions with ONE full-outer
# join + explode (pre/post images in the same pass); the witness
# aggregates the feed by change type. The oracle recomputes the same
# diff from the source table — an insert/delete/update row set that a
# manifest bug, version clobber, or mis-classified change would break.
# --------------------------------------------------------------------------
@query(
    "snapshot_change_feed",
    "versioned CDF: insert/delete/update_pre/update_post feed between "
    "two snapshot versions, aggregated by change type",
    oracle="""
    WITH base AS (
        SELECT event_id, event_type,
               CAST(floor(value * 100) AS BIGINT) AS cents
        FROM events
    ), firsthalf AS (
        SELECT b.* FROM base b
        JOIN events e USING (event_id)
        WHERE CAST(e.ts AS DATE) < DATE '2024-01-16'
    ), v1 AS (
        SELECT * FROM firsthalf
    ), v2 AS (
        SELECT event_id, event_type,
               cents + CASE WHEN event_type = 'click' THEN 1 ELSE 0 END
                 AS cents
        FROM firsthalf WHERE event_type <> 'purchase'
        UNION ALL
        SELECT b.* FROM base b
        JOIN events e USING (event_id)
        WHERE CAST(e.ts AS DATE) >= DATE '2024-01-16'
    ), feed AS (
        SELECT v2.event_id, v2.event_type, v2.cents,
               'insert' AS change_type
        FROM v2 ANTI JOIN v1 USING (event_id)
        UNION ALL
        SELECT v1.event_id, v1.event_type, v1.cents, 'delete'
        FROM v1 ANTI JOIN v2 USING (event_id)
        UNION ALL
        SELECT v1.event_id, v1.event_type, v1.cents, 'update_preimage'
        FROM v1 JOIN v2 USING (event_id)
        WHERE v1.cents <> v2.cents OR v1.event_type <> v2.event_type
        UNION ALL
        SELECT v2.event_id, v2.event_type, v2.cents, 'update_postimage'
        FROM v1 JOIN v2 USING (event_id)
        WHERE v1.cents <> v2.cents OR v1.event_type <> v2.event_type
    )
    SELECT change_type, event_type,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(sum(cents) AS BIGINT) AS cents
    FROM feed GROUP BY change_type, event_type
    """,
)
def snapshot_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        snapshot_changes,
        write_snapshot,
    )

    # no fan_out: destiny is write_snapshot (see sql_merge_into)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    first = ev.filter(
        F.col("ts").cast("date") < F.lit("2024-01-16").cast("date")
    ).drop("ts")
    v2_state = first.filter(F.col("event_type") != "purchase").withColumn(
        "cents",
        F.col("cents")
        + F.when(F.col("event_type") == "click", F.lit(1)).otherwise(
            F.lit(0)
        ),
    ).unionByName(
        ev.filter(
            F.col("ts").cast("date") >= F.lit("2024-01-16").cast("date")
        ).drop("ts")
    )
    root = fresh_scratch_dir("cdf_root")
    write_snapshot(first, root)  # v1
    write_snapshot(v2_state, root)  # v2
    feed = snapshot_changes(
        spark, root, keys=["event_id"], v_from=1, v_to=2
    )
    return feed.groupBy(
        F.col("_change_type").alias("change_type"), "event_type"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("cents"),
    )


# --------------------------------------------------------------------------
# UPDATE + DELETE statement forms (operators/sqldml.py) over a
# versioned snapshot: the single-table DML companions to MERGE. v1
# commits the base state, Engine.sql applies an UPDATE (clicks
# repriced) then a DELETE (errors retracted) — each a join-free
# single-pass lowering — and the composed result commits as v2, read
# back COLD. The oracle recomputes both mutations from the source.
# --------------------------------------------------------------------------
@query(
    "sql_update_delete_roundtrip",
    "UPDATE + DELETE statements lowered join-free, composed, committed "
    "as snapshot v2, cold read-back",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)
                    + CASE WHEN event_type = 'click' THEN 7 ELSE 0 END)
                AS BIGINT) AS cents
    FROM events
    WHERE event_type <> 'error'
    GROUP BY event_type
    """,
)
def sql_update_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from openaq_data_pipeline_engineering_spark.engine import Engine
    from openaq_data_pipeline_engineering_spark.operators.versioned import (
        read_snapshot,
        write_snapshot,
    )

    # no fan_out: destiny is write_snapshot (see sql_merge_into)
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    root = fresh_scratch_dir("sql_dml_root")
    write_snapshot(ev, root)  # v1
    eng = Engine(spark)
    eng.register("dml_events", read_snapshot(spark, root, version=1))
    updated = eng.sql(
        "UPDATE dml_events SET cents = cents + 7 WHERE event_type = 'click'"
    )
    eng.register("dml_events_updated", updated)
    final = eng.sql(
        "DELETE FROM dml_events_updated WHERE event_type = 'error'"
    )
    v2 = write_snapshot(final, root)
    back = read_snapshot(spark, root, version=v2)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("cents").cast("bigint").alias("cents"),
    )
