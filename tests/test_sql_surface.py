"""The Athena-equivalent SQL surface (reference S11/A4-A12): the same
query templates the reference runs through Athena, executed as SQL
strings over registered views via Engine.sql — synchronous, typed."""

from __future__ import annotations

import pytest

from openaq_data_pipeline_engineering_spark.engine import Engine

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["events", "orders", "lineitem", "customer"]


@pytest.fixture(scope="module")
def eng(spark):
    e = Engine(spark)
    e.register_parquet_dir(SF_DIR, TABLES)
    return e


def test_count_star(eng):
    # reference utils/athena_utils.py:192 COUNT(*) validation
    n = eng.sql("SELECT COUNT(*) AS n FROM events").first()["n"]
    assert n == eng.table("events").count() > 0


def test_group_count_ranking_sql(eng):
    # reference README.md:393-396 shape
    rows = eng.sql(
        """
        SELECT user_id, COUNT(*) AS cnt FROM events
        GROUP BY user_id ORDER BY cnt DESC, user_id LIMIT 5
        """
    ).collect()
    assert len(rows) == 5
    assert all(a["cnt"] >= b["cnt"] for a, b in zip(rows, rows[1:]))


def test_typed_results_not_strings(eng):
    # Athena returns every value as VarCharValue strings; the engine
    # contract is typed columns (SURVEY §3.3).
    df = eng.sql("SELECT MAX(ts) AS mx, AVG(value) AS av FROM events")
    dtypes = dict(df.dtypes)
    assert dtypes["mx"].startswith("timestamp")
    assert dtypes["av"] == "double"


def test_show_and_describe_surface(eng):
    # the reference's manual validation set: SHOW TABLES / DESCRIBE
    tables = {r["tableName"] for r in eng.sql("SHOW TABLES").collect()}
    assert set(TABLES) <= tables
    cols = {r["col_name"] for r in eng.sql("DESCRIBE events").collect()}
    assert {"event_id", "ts", "user_id"} <= cols


def test_conditional_aggregates_sql(eng):
    # doc/archive/plan.md:520-528 shape
    row = eng.sql(
        """
        SELECT COUNT(*) AS total,
               COUNT(DISTINCT user_id) AS users,
               SUM(CASE WHEN value IS NOT NULL THEN 1 ELSE 0 END) AS non_null
        FROM events
        """
    ).first()
    assert row["total"] >= row["users"] > 0
    assert row["non_null"] <= row["total"]


def test_concurrent_queries_one_session(spark):
    """FAIR-scheduler style robustness: independent queries submitted
    from multiple threads on one SparkSession all complete correctly
    (the shared-session usage pattern of a query service)."""
    from concurrent.futures import ThreadPoolExecutor

    from openaq_data_pipeline_engineering_spark.plans.registry import get_queries

    qs = get_queries()
    names = [
        "flagship_daily_topk", "group_count_ranking", "topk_order_limit",
        "pivot_mean", "temporal_extent", "null_profile",
        "distinct_scan", "pricing_summary",
    ]
    expected = {n: qs[n](spark, SF_DIR).count() for n in names}

    def run(n):
        return n, qs[n](spark, SF_DIR).count()

    with ThreadPoolExecutor(max_workers=8) as pool:
        got = dict(pool.map(run, names))
    assert got == expected
