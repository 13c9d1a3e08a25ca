"""Multimodal column plumbing (BASELINE.json north_star extension).

Images/audio/video ride as opaque ``binary`` columns with typed metadata
alongside. The Spark-side machinery here is REAL and tested — schema,
Arrow batch shape, ``mapInPandas`` signature, partition behavior.
``resize_images`` is a REAL image op end-to-end (pure-Python PNG codec
in functions/png.py, stdlib zlib — no external media library needed);
``decode_metadata``/``extract_features`` default to deterministic
arithmetic fakes so their declared queries stay oracle-checkable, with
the real decoder injectable via ``decode_fn``/``feature_fn``.

Scale notes: mapInPandas streams Arrow batches (no per-row Python
overhead); binary payloads never hit the driver; metadata-only queries
prune the binary column at the Parquet scan (column pruning), so "list
all 640px images" never reads the bytes.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, width int, height int, format string"
)


def fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for an image decoder.

    Derives pseudo-metadata from the byte length only — stable across
    runs/engines, so the declared query can be SQL-oracle-checked. A real
    deployment swaps this for PIL/ffmpeg and keeps every other line.
    """
    n = len(payload)
    return {
        "n_bytes": n,
        "width": n % 640 + 1,
        "height": (n * 7) % 480 + 1,
        "format": ["png", "jpeg", "webp"][n % 3],
    }


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat a text column as an opaque binary payload (test stand-in for
    real media bytes)."""
    return df.withColumn("payload", F.col(text_col).cast("binary"))


def decode_metadata(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    decode_fn: Callable[[bytes], dict] = fake_decode,
) -> DataFrame:
    """Extract per-item metadata from binary payloads via mapInPandas.

    Arrow-batched: ``decode_fn`` runs once per payload inside a pandas
    batch loop, never row-at-a-time through Py4J.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_fn(p) for p in pdf[payload_col]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": [m["n_bytes"] for m in metas],
                    "width": [m["width"] for m in metas],
                    "height": [m["height"] for m in metas],
                    "format": [m["format"] for m in metas],
                }
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(_decode, DECODE_META_SCHEMA)


FEATURE_DIM = 8
FEATURES_SCHEMA = "doc_id bigint, " + ", ".join(
    f"f{i} double" for i in range(FEATURE_DIM)
)


def md5_features(payload: bytes) -> list[float]:
    """Deterministic stand-in for a learned feature extractor.

    Feature i = the i-th 16-bit slice of md5(payload), scaled to [0, 1].
    Stable across runs and engines (DuckDB mirrors it with
    ``CAST('0x'||substr(md5(text),4i+1,4) AS INT)/65535.0``), so the
    Pandas-UDF extraction path itself is oracle-checkable. A real
    deployment swaps in a vision/audio model over the same plumbing.
    """
    import hashlib

    h = hashlib.md5(payload).hexdigest()
    return [int(h[4 * i : 4 * i + 4], 16) / 65535.0 for i in range(FEATURE_DIM)]


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    feature_fn: Callable[[bytes], list[float]] = md5_features,
) -> DataFrame:
    """Per-item feature extraction from binary payloads via mapInPandas.

    Emits a flat (doc_id, f0..f7) frame — flat doubles join/aggregate
    cheaply downstream and avoid array-of-float comparison pitfalls.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [feature_fn(p) for p in pdf[payload_col]]
            out = pd.DataFrame(
                {"doc_id": pdf[id_col].astype("int64")}
                | {f"f{i}": [f[i] for f in feats] for i in range(FEATURE_DIM)}
            )
            yield out

    return df.select(id_col, payload_col).mapInPandas(_extract, FEATURES_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_payload binary"


def chunk_frames(payload: bytes, every_n: int, frame_bytes: int = 64) -> list[bytes]:
    """Deterministic stand-in for a video frame extractor: treats the
    payload as fixed-size frames and keeps every ``every_n``-th one. A
    real deployment swaps in ffmpeg keyframe extraction; the Spark-side
    shape (one input row → many frame rows, Arrow-batched) is identical.
    """
    frames = [
        payload[i : i + frame_bytes] for i in range(0, len(payload), frame_bytes)
    ]
    return frames[::every_n]


def sample_frames(
    df: DataFrame,
    every_n: int = 10,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_fn: Callable[[bytes, int], list[bytes]] = chunk_frames,
) -> DataFrame:
    """Explode binary payloads into sampled frame rows via mapInPandas.

    Row-explosion inside the Arrow batch loop: output batches are built
    per input batch, so a 4 GB video never materializes all its frames
    in one Python list-of-rows — only the sampled subset per batch.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            payloads: list[bytes] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for j, fr in enumerate(frame_fn(payload, every_n)):
                    ids.append(int(doc_id))
                    idxs.append(j)
                    payloads.append(fr)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_payload": payloads}
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, FRAMES_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, payload binary, error string"
)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize PNG payloads to ``width x height`` via mapInPandas.

    Real decode: functions/png.py — a pure-Python (stdlib zlib) PNG
    codec + nearest-neighbor resample, so this container needs no
    external media library. Support envelope: 8-bit gray/RGB/RGBA
    baseline PNG; an unsupported payload yields a NULL ``payload`` and
    the reason in ``error`` (per-item, never failing the batch — at
    100 TB one corrupt file must not kill the job; filter
    ``error IS NULL`` downstream, count the rest for the DLQ).
    ``resize_fn`` swaps in another codec (e.g. PIL) over identical
    plumbing.
    """
    if resize_fn is None:
        from openaq_data_pipeline_engineering_spark.functions.png import resize_png

        resize_fn = resize_png

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            payloads: list[bytes | None] = []
            errors: list[str | None] = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(int(doc_id))
                try:
                    payloads.append(resize_fn(bytes(payload), width, height))
                    errors.append(None)
                except ValueError as exc:  # UnsupportedImage et al.
                    payloads.append(None)
                    errors.append(str(exc))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "width": width,
                    "height": height,
                    "payload": payloads,
                    "error": errors,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_resize, RESIZE_SCHEMA)
