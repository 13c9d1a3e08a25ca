"""Multimodal plumbing tests: real mapInPandas machinery, stubbed decode."""

from __future__ import annotations

import pytest

from openaq_data_pipeline_engineering_spark.operators.multimodal import (
    decode_metadata,
    fake_decode,
    chunk_frames,
    sample_frames,
    with_binary_payload,
)


def test_decode_metadata_schema_and_values(spark):
    df = spark.createDataFrame([(1, "abcd"), (2, "x" * 641)], ["doc_id", "text"])
    out = decode_metadata(with_binary_payload(df))
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_bytes == 4
    assert rows[1].width == 5          # 4 % 640 + 1
    assert rows[2].width == 2          # 641 % 640 + 1
    assert rows[1].format == fake_decode(b"abcd")["format"]
    assert dict(out.dtypes)["n_bytes"] == "bigint"


def test_decode_custom_fn(spark):
    df = spark.createDataFrame([(1, "hello")], ["doc_id", "text"])

    def decoder(payload: bytes) -> dict:
        return {"n_bytes": len(payload), "width": 111, "height": 222, "format": "fake"}

    row = decode_metadata(with_binary_payload(df), decode_fn=decoder).first()
    assert (row.width, row.height, row.format) == (111, 222, "fake")


def test_sample_frames_explodes_and_samples(spark):
    # 300-byte payload -> 5 64-byte frames (last partial) -> every 2nd -> 3
    df = spark.createDataFrame([(1, "a" * 300), (2, "b" * 10)], ["doc_id", "text"])
    out = sample_frames(with_binary_payload(df), every_n=2).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 3
    assert [r["frame_idx"] for r in sorted(by_doc[1], key=lambda r: r["frame_idx"])] == [0, 1, 2]
    assert bytes(by_doc[1][0]["frame_payload"]) == b"a" * 64
    assert len(by_doc[2]) == 1  # short payload: one frame survives
    assert bytes(by_doc[2][0]["frame_payload"]) == b"b" * 10
    # matches the local reference splitter
    assert chunk_frames(b"a" * 300, 2) == [b"a" * 64] * 2 + [b"a" * 44]


def test_resize_is_explicit_stub(spark):
    from openaq_data_pipeline_engineering_spark.operators.multimodal import resize_stub

    df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
    with pytest.raises(NotImplementedError):
        resize_stub(df, 64, 64)
