"""SQL DDL surface: CTAS, INSERT INTO, and view lifecycle through the
engine's spark.sql executor (the S11 Athena-replacement surface also
covers writes, not just SELECT)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.sources.star import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def nation_view(spark):
    load_table(spark, SF_DIR, "nation").createOrReplaceTempView("ddl_nation")
    yield "ddl_nation"
    spark.catalog.dropTempView("ddl_nation")


def test_ctas_insert_and_drop(spark, nation_view):
    spark.sql("DROP TABLE IF EXISTS ddl_nations_eu")
    spark.sql(
        "CREATE TABLE ddl_nations_eu USING parquet AS "
        f"SELECT n_nationkey, n_name FROM {nation_view} WHERE n_regionkey = 3"
    )
    before = spark.table("ddl_nations_eu").count()
    assert before > 0
    spark.sql(
        "INSERT INTO ddl_nations_eu "
        f"SELECT n_nationkey, n_name FROM {nation_view} WHERE n_regionkey = 1"
    )
    after = spark.table("ddl_nations_eu").count()
    expected_insert = (
        load_table(spark, SF_DIR, "nation")
        .filter(F.col("n_regionkey") == 1)
        .count()
    )
    assert after == before + expected_insert
    # INSERT OVERWRITE replaces contents
    spark.sql(
        "INSERT OVERWRITE ddl_nations_eu "
        f"SELECT n_nationkey, n_name FROM {nation_view} WHERE n_regionkey = 3"
    )
    assert spark.table("ddl_nations_eu").count() == before
    spark.sql("DROP TABLE ddl_nations_eu")
    assert "ddl_nations_eu" not in [
        t.name for t in spark.catalog.listTables()
    ]
