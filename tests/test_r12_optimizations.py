"""Round-12 optimization internals: pins for the behavior-preserving
rewrites (scan-split-aware fan_out, one-pass undirect, hoisted-norm
cosine). Each test asserts VALUE equality with the shape the rewrite
replaced — the optimizations must be invisible to results."""

from __future__ import annotations


from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.sources.star import (
    _est_scan_splits,
    _parse_bytes,
    fan_out,
)


def test_parse_bytes_suffixes():
    assert _parse_bytes("134217728") == 134217728
    assert _parse_bytes("128m") == 128 * 1024**2
    assert _parse_bytes("128MB") == 128 * 1024**2
    assert _parse_bytes("1g") == 1024**3
    assert _parse_bytes("4194304b") == 4194304


def test_fan_out_identity_when_scan_splits_suffice(spark, tmp_path):
    """A multi-MB single file splits to >= 2/3 of the target under the
    engine's openCostInBytes sizing, so fan_out adds NO shuffle."""
    p = str(tmp_path / "big")
    spark.range(0, 2_000_000).select(
        F.col("id"), (F.col("id") % 97).alias("k"), F.rand(7).alias("x")
    ).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    n = spark.sparkContext.defaultParallelism
    est = _est_scan_splits(df, df.inputFiles())
    assert est * 3 >= n * 2, f"estimate {est} too low for {n} cores"
    out = fan_out(df)
    assert "RoundRobinPartitioning" not in out._jdf.queryExecution().toString()


def test_fan_out_still_spreads_tiny_inputs(spark, tmp_path):
    """A sub-MB file stays under the split threshold -> fan_out keeps
    the explicit repartition for CPU-heavy per-row work."""
    p = str(tmp_path / "tiny")
    spark.range(0, 100).coalesce(1).write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    out = fan_out(df)
    assert "RoundRobinPartitioning" in out._jdf.queryExecution().toString()
    assert out.count() == 100


def test_undirect_one_pass_equals_union_form(spark):
    from openaq_data_pipeline_engineering_spark.operators.pagerank import (
        undirect,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 2), (5, 4)], "src bigint, dst bigint"
    )
    got = sorted(map(tuple, undirect(edges).collect()))
    want = sorted(
        [(1, 2), (2, 1), (2, 3), (3, 2), (1, 2), (2, 1), (5, 4), (4, 5)]
    )
    assert got == want  # same MULTISET (duplicates preserved)
    assert undirect(edges).columns == ["src", "dst"]
    # plan carries a single scan of the input, not a union of two
    plan = undirect(edges)._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan


def test_cosine_pre_bit_equal_to_cosine(spark):
    from openaq_data_pipeline_engineering_spark.functions.vectors import (
        cosine,
        cosine_pre,
        norm,
    )

    df = spark.createDataFrame(
        [
            (1, [0.1, 0.2, 0.7, -0.3], [0.5, -0.1, 0.2, 0.9]),
            (2, [1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]),
            (3, [0.3333333, 0.666666, 0.1, 0.25], [0.125, 0.375, 0.625, 0.875]),
        ],
        "id bigint, a array<double>, b array<double>",
    )
    rows = df.select(
        cosine("a", "b").alias("direct"),
        cosine_pre("a", "b", norm("a"), norm("b")).alias("hoisted"),
    ).collect()
    for r in rows:
        # bit-identical, not approx: the hoist must not change rounding
        assert r["direct"] == r["hoisted"]


def test_expectation_report_single_branch(spark):
    from openaq_data_pipeline_engineering_spark.operators.expectations import (
        expectation_report,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, 200.0), (3, None)], "id bigint, v double"
    )
    rep = expectation_report(df, {"v_small": "v <= 100", "id_pos": "id > 0"})
    got = {r["rule"]: (r["n_fail"], r["n_rows"]) for r in rep.collect()}
    assert got == {
        "v_small": (2, 3),  # 200 fails, NULL fails (coalesce false)
        "id_pos": (0, 3),
        "__any_failed__": (2, 3),
        "__all_valid__": (1, 3),
    }
    # one scan: the __all_valid__ row no longer re-runs the aggregate
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert "Union" not in plan


def test_mart_merge_duplicate_key_across_partitions(spark, tmp_path):
    """A key with rows in TWO partitions must keep BOTH under the
    partition-scoped identity (the operator only reads touched
    partitions, so cross-partition dedup was never enforceable) — and
    the surviving set must not depend on layout. Pins the r12 sf0.1
    regression: partition-less keys made the window tiebreak non-total
    for such a pair."""
    from openaq_data_pipeline_engineering_spark.plans.incremental import (
        merge_into_mart,
    )

    mart = str(tmp_path / "mart")
    schema = "k bigint, qty double, src_pri int, year string, month string, day string"
    batch_a = spark.createDataFrame(
        [
            (1, 10.0, 1, "1995", "03", "01"),
            (1, 20.0, 1, "1995", "03", "02"),  # same key, other partition
            (2, 30.0, 1, "1995", "03", "02"),
        ],
        schema,
    )
    keys = ["k", "year", "month", "day"]
    merge_into_mart(spark, mart, batch_a, keys, tiebreaker=["src_pri"])
    batch_b = spark.createDataFrame(
        [(2, 99.0, 0, "1995", "03", "02")], schema
    )
    merge_into_mart(spark, mart, batch_b, keys, tiebreaker=["src_pri"])
    back = spark.read.schema(batch_a.schema).parquet(mart)
    got = sorted((r["k"], r["day"], r["qty"]) for r in back.collect())
    assert got == [(1, "01", 10.0), (1, "02", 20.0), (2, "02", 99.0)]
