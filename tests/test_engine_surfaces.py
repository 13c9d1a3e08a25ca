"""Engine-level surfaces: SQL cache management, AQE skew-join
mitigation, and the pandas-on-Spark API layer."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.sources.star import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_sql_cache_table_lifecycle(spark):
    """CACHE TABLE pins a temp view in memory (InMemoryRelation in the
    plan); UNCACHE removes it."""
    load_table(spark, SF_DIR, "nation").createOrReplaceTempView("cache_nation")
    try:
        spark.sql("CACHE TABLE cache_nation")
        assert spark.catalog.isCached("cache_nation")
        plan = (
            spark.table("cache_nation")
            ._jdf.queryExecution()
            .optimizedPlan()
            .toString()
        )
        assert "InMemoryRelation" in plan
        spark.sql("UNCACHE TABLE cache_nation")
        assert not spark.catalog.isCached("cache_nation")
    finally:
        spark.catalog.dropTempView("cache_nation")


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join mitigation: with thresholds forced low, a join
    against a heavily skewed key set is re-planned with skew handling
    (isSkew markers / skew=true in the final plan)."""
    skewed = spark.range(0, 200_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id"))
        .alias("k"),
        F.md5(F.col("id").cast("string")).alias("pad"),
    )
    dim = spark.range(0, 5000).select(F.col("id").alias("k"))
    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.2",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        # inspect the SAME QueryExecution the action ran (a separate
        # .count() call compiles its own plan — see observability.py)
        agg = skewed.join(dim.hint("merge"), "k").groupBy().count()
        [row] = agg.collect()
        # 99% of rows land on hot key 7 (< 5000, joins); the rest join
        # iff their id is < 5000
        expect = 200_000 - skewed.filter(F.col("k") >= 5000).count()
        assert row["count"] == expect
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_pandas_on_spark_api(spark):
    """pyspark.pandas: the pandas-API layer compiles to the same engine
    (group counts match the SQL path)."""
    import warnings

    import pyspark.pandas as ps

    with warnings.catch_warnings():
        # pyspark.pandas internals, not ours: np.character deprecation
        # (typehints.py) and the default-index advice for read_parquet.
        warnings.filterwarnings(
            "ignore", message=".*np\\.character.*", category=DeprecationWarning
        )
        warnings.filterwarnings(
            "ignore", message=".*index_col.*", module=r"pyspark\.pandas.*"
        )
        psdf = ps.read_parquet(f"{SF_DIR}/events.parquet")
        got = psdf.groupby("event_type").size().sort_index().to_dict()
    want = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want
