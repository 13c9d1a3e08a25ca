"""Smoke tests for the user-facing example scripts (examples/).

Each runs as a SUBPROCESS — exactly the way a user invokes it, own
SparkSession and all — against the smallest testdata, asserting exit 0
and the output markers that prove the pipeline reached its last stage.
Round-3 ADVICE caught doc/code drift in an example precisely because
nothing executed them; this pins that they stay runnable.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"


def _run(script: str, *args: str) -> str:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), *args],
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        f"{script} exited {proc.returncode}\n"
        f"stdout:\n{proc.stdout[-3000:]}\nstderr:\n{proc.stderr[-3000:]}"
    )
    return proc.stdout


def test_run_pipeline_smoke(tmp_path):
    out = _run("run_pipeline.py", str(tmp_path / "work"))
    assert "raw rows: 6" in out
    # dedup collapsed the duplicated loc1 reading; merge applied the
    # correction without duplicating rows
    assert "mart rows:" in out and "after merge:" in out
    assert "top locations by avg pm25" in out


def test_run_corpus_pipeline_smoke():
    out = _run("run_corpus_pipeline.py", SF_DIR)
    assert "documents:" in out
    assert "committed version:    1" in out
    # the split summary table rendered (last stage reached)
    assert "n_docs" in out and "shard" in out


def test_run_similarity_smoke():
    out = _run("run_similarity.py", SF_DIR)
    for marker in (
        "embedding near-duplicate pairs",
        "IVF ANN",
        "MinHash-LSH",
        "reciprocal-rank fusion",
        "train/val/test split",
    ):
        assert marker in out, marker


def test_run_streaming_smoke(tmp_path):
    out = _run("run_streaming.py", str(tmp_path / "work"))
    assert "ingested 7 raw rows -> 6 after in-stream dedup" in out
    assert "closed sessions" in out
    assert "upserted per-user latest state" in out


def test_run_lakehouse_smoke(tmp_path):
    out = _run("run_lakehouse.py", SF_DIR, str(tmp_path / "work"))
    assert "committed v1:" in out
    assert "merged late+corrected data -> v2:" in out
    assert "time travel: v1 still readable" in out
    # all four CDF change types present in the feed summary
    for marker in ("delete=", "insert=", "update_postimage=", "update_preimage="):
        assert marker in out, marker
    # lifecycle statements: rollback, zero-copy fork, erasure, detail
    assert "restored to v1 as v3 (metadata-only" in out
    assert "shallow clone: 0 files copied" in out
    assert "purged 'purchase' from every version" in out
    assert "constraints=['n_pos']" in out
    # aggressive retention drops only v2: v3 (restore) reads through
    # v1 (chain-aware) and the clone's needs are auto-protected
    assert "vacuum(keep_last=1): dropped [2]" in out
    assert "versions on disk: [1, 3]" in out
    # round-9 surface: named time travel + admission-capped Arrow feed
    assert "named time travel: mart_events VERSION AS OF 1" in out
    assert "streamed 1 appended row(s)" in out


def test_run_quality_smoke(tmp_path):
    out = _run("run_quality.py", SF_DIR, str(tmp_path / "work"))
    assert "report:" in out and "quarantine by mode:" in out
    assert "streamed: valid table" in out
    assert "quality pipeline complete" in out
