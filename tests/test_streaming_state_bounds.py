"""Bounded-state assertions for the heaviest streaming witnesses
(VERDICT r7 #8), pinned on the committed x32 probe artifact
(PLANS_METRICS.json ``streaming_x32``, tools/streaming_scale_probe.py).

State growth under 32x input is the memory story at 100 TB: a witness
whose state grows with INPUT VOLUME beyond its watermark window would
OOM a cluster no matter how it is sharded. Three distinct bounds:

- sessionization: state ∝ ACTIVE KEYS (users). The replica multiplies
  per-key density, not key count, so peak state must stay flat.
- quality_split: state-FREE (foreachBatch projection/filter) — no
  stateful operator at any scale.
- outer_attribution (stream-stream join): state ∝ rows INSIDE the
  watermark window — grows with in-window volume (linear), bounded by
  the window, never super-linear.
"""

from __future__ import annotations

import json
import os

import pytest

ART = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                   "PLANS_METRICS.json")


@pytest.fixture(scope="module")
def x32():
    with open(ART) as f:
        doc = json.load(f)
    sec = doc.get("streaming_x32")
    assert sec, "run tools/streaming_scale_probe.py to record the probes"
    return sec


def _peak(entry):
    return max(
        (v["max_state_rows"] for v in entry["state_operators"].values()),
        default=0,
    )


def test_probe_inputs_actually_scaled(x32):
    for name in (
        "streaming_sessionization",
        "streaming_quality_split",
        "streaming_outer_attribution",
    ):
        e = x32[name]
        assert e["x1"]["input_rows"] > 0
        ratio = e["x32"]["input_rows"] / e["x1"]["input_rows"]
        assert 30 <= ratio <= 34  # the replica really is ~32x


def test_sessionization_state_is_key_bounded(x32):
    e = x32["streaming_sessionization"]
    p1, p32 = _peak(e["x1"]), _peak(e["x32"])
    assert p1 > 0
    # keys (users) unchanged under replication -> state stays flat
    # (2x headroom for batch-boundary jitter)
    assert p32 <= 2 * p1


def test_quality_split_is_state_free(x32):
    e = x32["streaming_quality_split"]
    assert e["x1"]["state_operators"] == {}
    assert e["x32"]["state_operators"] == {}


def test_outer_attribution_state_linear_in_window_volume(x32):
    e = x32["streaming_outer_attribution"]
    p1, p32 = _peak(e["x1"]), _peak(e["x32"])
    in1, in32 = e["x1"]["input_rows"], e["x32"]["input_rows"]
    assert p1 > 0 and in1 > 0
    # join state buffers in-watermark rows: grows WITH volume but
    # never super-linearly (<= 1.5x the input ratio), and never beyond
    # the input itself
    assert p32 / p1 <= 1.5 * (in32 / in1)
    assert p32 <= in32
