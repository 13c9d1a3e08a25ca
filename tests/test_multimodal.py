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


def _gradient_png(w: int, h: int, channels: int = 3) -> bytes:
    from openaq_data_pipeline_engineering_spark.functions.png import encode_png

    px = bytearray()
    for y in range(h):
        for x in range(w):
            for c in range(channels):
                px.append((x * 7 + y * 13 + c * 29) % 256)
    return encode_png(bytes(px), w, h, channels)


class TestPngCodec:
    def test_encode_decode_roundtrip(self):
        from openaq_data_pipeline_engineering_spark.functions.png import (
            decode_png,
            encode_png,
        )

        for ch in (1, 3, 4):
            raw = bytes((i * 31) % 256 for i in range(6 * 4 * ch))
            data = encode_png(raw, 6, 4, ch)
            w, h, c, back = decode_png(data)
            assert (w, h, c) == (6, 4, ch)
            assert back == raw

    def test_decode_handles_all_scanline_filters(self):
        """Hand-build an IDAT using filters 1-4 and check the unfilter
        reverses each (the envelope a real-world encoder emits)."""
        import struct
        import zlib

        from openaq_data_pipeline_engineering_spark.functions.png import (
            _chunk,
            _SIGNATURE,
            decode_png,
        )

        w, h, ch = 4, 5, 3
        raw = bytes((i * 17 + 3) % 256 for i in range(w * h * ch))
        stride = w * ch

        def filt(ftype, line, prev):
            out = bytearray([ftype])
            for i in range(stride):
                a = line[i - ch] if i >= ch else 0
                b = prev[i] if prev else 0
                c = prev[i - ch] if (prev and i >= ch) else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out.append((line[i] - pred) & 0xFF)
            return bytes(out)

        body = bytearray()
        prev = None
        for y in range(h):
            line = raw[y * stride : (y + 1) * stride]
            body += filt(y % 5, line, prev)
            prev = line
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        data = (
            _SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(body)))
            + _chunk(b"IEND", b"")
        )
        got = decode_png(data)
        assert got == (w, h, ch, raw)

    def test_unsupported_payload_raises(self):
        from openaq_data_pipeline_engineering_spark.functions.png import (
            UnsupportedImage,
            decode_png,
        )

        with pytest.raises(UnsupportedImage):
            decode_png(b"not a png at all")

    def test_resize_nearest_semantics(self):
        from openaq_data_pipeline_engineering_spark.functions.png import (
            decode_png,
            resize_png,
        )

        # 2x2 RGB quadrant image upsampled 2x: each pixel becomes 2x2
        q = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
        raw = bytes(v for px in q for v in px)
        from openaq_data_pipeline_engineering_spark.functions.png import encode_png

        small = encode_png(raw, 2, 2, 3)
        big = resize_png(small, 4, 4)
        w, h, c, px = decode_png(big)
        assert (w, h, c) == (4, 4, 3)

        def pixel(x, y):
            o = (y * 4 + x) * 3
            return tuple(px[o : o + 3])

        assert pixel(0, 0) == pixel(1, 1) == (255, 0, 0)
        assert pixel(3, 0) == pixel(2, 1) == (0, 255, 0)
        assert pixel(0, 3) == (0, 0, 255)
        assert pixel(3, 3) == (255, 255, 0)


class TestResizeImages:
    def test_resize_images_real_codec(self, spark):
        """The de-stubbed resize: PNG in, resized PNG out, per-item
        error channel for non-images — all through mapInPandas."""
        from openaq_data_pipeline_engineering_spark.functions.png import decode_png
        from openaq_data_pipeline_engineering_spark.operators.multimodal import (
            resize_images,
        )

        rows = [
            (1, _gradient_png(16, 12)),
            (2, _gradient_png(5, 9, channels=1)),
            (3, b"definitely not an image"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r.doc_id: r for r in resize_images(df, 8, 8).collect()}
        assert len(out) == 3
        for doc in (1, 2):
            r = out[doc]
            assert r.error is None
            w, h, c, px = decode_png(bytes(r.payload))
            assert (w, h) == (8, 8)
            assert len(px) == 8 * 8 * c
        assert out[3].payload is None
        assert "PNG" in out[3].error

    def test_resize_matches_local_kernel(self, spark):
        """Distributed result == the same kernel applied locally
        (mapInPandas adds no transformation of its own)."""
        from openaq_data_pipeline_engineering_spark.functions.png import resize_png
        from openaq_data_pipeline_engineering_spark.operators.multimodal import (
            resize_images,
        )

        payload = _gradient_png(10, 7)
        df = spark.createDataFrame([(1, payload)], "doc_id long, payload binary")
        got = resize_images(df, 4, 3).first()
        assert bytes(got.payload) == resize_png(payload, 4, 3)
