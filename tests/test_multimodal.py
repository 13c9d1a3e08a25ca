"""Multimodal plumbing tests: real mapInPandas machinery, stubbed decode."""

from __future__ import annotations

import pytest

from openaq_data_pipeline_engineering_spark.operators.multimodal import (
    decode_metadata,
    fake_decode,
    frame_sample_stub,
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


def test_frame_sample_is_explicit_stub(spark):
    df = spark.createDataFrame([(1, "x")], ["doc_id", "text"])
    with pytest.raises(NotImplementedError):
        frame_sample_stub(df)
