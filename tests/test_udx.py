"""UDTF + grouped-agg pandas UDAF surface."""

from __future__ import annotations



from openaq_data_pipeline_engineering_spark.functions.udx import (
    sentence_splitter_udtf,
    weighted_mean_udaf,
)


def test_udtf_lateral_split(spark):
    spark.udtf.register("split_sentences", sentence_splitter_udtf())
    df = spark.createDataFrame(
        [(1, "Hello there. Second one. "), (2, ""), (3, None)],
        "doc_id int, text string",
    )
    df.createOrReplaceTempView("docs_udtf")
    rows = spark.sql(
        """
        SELECT d.doc_id, s.idx, s.sentence
        FROM docs_udtf d, LATERAL split_sentences(d.text) s
        ORDER BY d.doc_id, s.idx
        """
    ).collect()
    assert [(r["doc_id"], r["idx"], r["sentence"]) for r in rows] == [
        (1, 0, "Hello there"),
        (1, 1, "Second one"),
    ]


def test_grouped_agg_weighted_mean(spark):
    weighted_mean = weighted_mean_udaf()
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 5.0, 2.0), ("b", None, 9.0)],
        "k string, v double, w double",
    )
    got = {
        r["k"]: r["wm"]
        for r in df.groupBy("k").agg(weighted_mean("v", "w").alias("wm")).collect()
    }
    assert got["a"] == (1.0 * 1.0 + 3.0 * 3.0) / 4.0  # 2.5
    assert got["b"] == 5.0  # null pair dropped

    # zero total weight -> NaN, surfaced as SQL null through Arrow
    z = spark.createDataFrame([("c", 1.0, 0.0)], "k string, v double, w double")
    r = z.groupBy("k").agg(weighted_mean("v", "w").alias("wm")).first()
    assert r["wm"] is None
