"""Smaller engine surfaces: applyInArrow grouped map, parquet
compression codecs, JSON bad-record quarantine."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.sources.star import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_apply_in_arrow_grouped_map(spark):
    """Spark 4 applyInArrow: the Arrow-native grouped-map path (no
    pandas conversion) — per-group record batches in, batches out."""
    import pyarrow as pa

    ev = load_table(spark, SF_DIR, "events").select("event_type", "value")

    def spread(rows: pa.Table) -> pa.Table:
        vmin = pa.compute.min(rows["value"]).as_py()
        vmax = pa.compute.max(rows["value"]).as_py()
        et = rows["event_type"][0].as_py()
        return pa.Table.from_pydict(
            {"event_type": [et], "spread": [float(vmax - vmin)]}
        )

    got = {
        r["event_type"]: r["spread"]
        for r in ev.groupBy("event_type")
        .applyInArrow(spread, "event_type string, spread double")
        .collect()
    }
    want = {
        r["event_type"]: float(r["mx"] - r["mn"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    assert got == want and len(got) == 5


def test_parquet_zstd_codec_roundtrip(spark, tmp_path):
    """zstd-at-rest (the 100 TB archival codec) writes and reads back
    identically; codec visible in the file names."""
    nation = load_table(spark, SF_DIR, "nation")
    d = str(tmp_path / "zstd")
    nation.write.option("compression", "zstd").parquet(d)
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert files and all(".zstd." in f for f in files)
    back = spark.read.parquet(d)
    assert back.exceptAll(nation).count() == 0
    assert back.count() == nation.count()


def test_json_bad_record_quarantine(spark, tmp_path):
    """PERMISSIVE JSON read quarantines malformed rows into
    _corrupt_record instead of failing the scan (ingest-edge policy;
    the CSV twin is TestCsvSource)."""
    p = str(tmp_path / "in.json")
    with open(p, "w") as f:
        f.write('{"k": 1, "v": "a"}\n')
        f.write("{broken\n")
        f.write('{"k": 2, "v": "b"}\n')
    df = (
        spark.read.schema("k BIGINT, v STRING, _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(p)
    ).cache()
    try:
        good = df.filter(F.col("_corrupt_record").isNull())
        bad = df.filter(F.col("_corrupt_record").isNotNull())
        assert good.count() == 2 and bad.count() == 1
        assert bad.first()["_corrupt_record"].startswith("{broken")
    finally:
        df.unpersist()


def test_gap_islands_merges_across_buckets(spark):
    """Bucketed islands must equal the naive global computation,
    including runs that straddle bucket boundaries."""
    from openaq_data_pipeline_engineering_spark.plans.queries_warehouse import (
        gap_islands,
    )

    ids = sorted(set(list(range(0, 150)) + list(range(200, 251))
                     + list(range(995, 1006))))  # 995..1005 straddles 1000
    df = spark.createDataFrame([(i,) for i in ids], "event_id bigint")
    got = {
        (r.island_start, r.island_end, r.island_len)
        for r in gap_islands(df, "event_id", bucket_size=1000).collect()
    }
    # naive expectation
    expect = set()
    run = [ids[0]]
    for a, b in zip(ids, ids[1:]):
        if b == a + 1:
            run.append(b)
        else:
            expect.add((run[0], run[-1], len(run)))
            run = [b]
    expect.add((run[0], run[-1], len(run)))
    assert got == expect
    assert (995, 1005, 11) in got  # straddles the bucket edge, merged


def test_schema_diff_classifies_changes(spark):
    from pyspark.sql import functions as F

    from openaq_data_pipeline_engineering_spark.operators.schema_diff import (
        is_compatible,
        schema_diff,
    )

    old = spark.createDataFrame([(1, "a", 2.0)], "id bigint, name string, v double")
    new_ok = old.withColumn("extra", F.lit(1))
    assert is_compatible(old, new_ok)
    changes = schema_diff(old, new_ok)
    assert [(c.column, c.change, c.breaking) for c in changes] == [
        ("extra", "added", False)
    ]

    new_bad = old.drop("name").withColumn("v", F.col("v").cast("float"))
    diffs = {c.column: c for c in schema_diff(old, new_bad)}
    assert diffs["name"].change == "removed" and diffs["name"].breaking
    assert diffs["v"].change == "type_changed" and diffs["v"].breaking
    assert not is_compatible(old, new_bad)


def test_binaryfile_and_wholetext_sources(spark, tmp_path):
    """binaryFile + wholetext sources: the real multimodal/document
    ingest edges — one row per FILE with content bytes / full text
    (the synthetic documents table stands in for these downstream)."""
    import os

    d = str(tmp_path / "blobs")
    os.makedirs(d)
    payloads = {"a.bin": b"\x89PNG-fake-a", "b.bin": b"\x89PNG-fake-b"}
    for name, blob in payloads.items():
        with open(os.path.join(d, name), "wb") as f:
            f.write(blob)
    bdf = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(d)
        .select("path", "length", "content")
    )
    rows = {os.path.basename(r["path"]): r for r in bdf.collect()}
    assert set(rows) == set(payloads)
    for name, blob in payloads.items():
        assert bytes(rows[name]["content"]) == blob
        assert rows[name]["length"] == len(blob)

    t = str(tmp_path / "texts")
    os.makedirs(t)
    with open(os.path.join(t, "doc.txt"), "w") as f:
        f.write("line one\nline two\n")
    wdf = spark.read.text(t, wholetext=True)
    assert wdf.count() == 1
    assert wdf.first()["value"] == "line one\nline two\n"
