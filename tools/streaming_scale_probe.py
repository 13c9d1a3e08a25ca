"""x32 scale probe for the heaviest streaming witnesses (VERDICT r7
#8): run each witness at x1 and on the 32x-replicated fact tables with
a StreamingQueryListener attached, and record micro-batch count, input
rows, wall time, and every stateful operator's peak state rows /
store memory into PLANS_METRICS.json under ``streaming_x32``.

What bounded state means per witness (asserted by
tests/test_streaming_state_bounds.py on the recorded artifact):

- ``streaming_sessionization`` (applyInPandasWithState): state rows ∝
  ACTIVE KEYS inside the watermark, not input volume. The replica
  shifts event ids but NOT user ids, so x32 multiplies per-key density
  and the state-row peak must stay ~flat.
- ``streaming_quality_split`` (foreachBatch split): state-FREE by
  construction — the expectations split adds no stateful operator at
  any scale; the only growth is per-batch input.
- ``streaming_outer_attribution`` (stream-stream outer join): state ∝
  rows buffered INSIDE the watermark window — x32 input grows join
  state proportionally (bounded by the window, key-sharded on a
  cluster), never super-linearly.

Usage: python tools/streaming_scale_probe.py [query ...]
       (defaults to the three heaviest; reuses scale_probe's replica)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from openaq_data_pipeline_engineering_spark.engine import get_spark  # noqa: E402
from openaq_data_pipeline_engineering_spark.plans.registry import get_queries  # noqa: E402
from tools.scale_probe import DST, SRC, build_replica  # noqa: E402
from tools.shuffle_report import (  # noqa: E402
    _ProgressCollector,
    _summarize_streaming,
)

DEFAULT = (
    "streaming_sessionization",
    "streaming_quality_split",
    "streaming_outer_attribution",
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PLANS_METRICS.json",
)


def probe(spark, name, fn, sf_dir) -> dict:
    collector = _ProgressCollector()
    spark.streams.addListener(collector)
    try:
        t0 = time.time()
        n = fn(spark, sf_dir).count()
        wall = time.time() - t0
        row = _summarize_streaming(collector.drain(), n)
        row["wall_sec"] = round(wall, 2)
        return row
    finally:
        spark.streams.removeListener(collector)


def main() -> None:
    names = sys.argv[1:] or list(DEFAULT)
    spark = get_spark(
        app_name="streaming-scale-probe",
        master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)
    qs = get_queries()
    section: dict[str, dict] = {}
    for name in names:
        entry: dict[str, dict] = {}
        for sf, tag in [(SRC, "x1"), (DST, "x32")]:
            entry[tag] = probe(spark, name, qs[name], sf)
            so = entry[tag]["state_operators"]
            peak = max(
                (v["max_state_rows"] for v in so.values()), default=0
            )
            print(
                f"{name} {tag}: {entry[tag]['input_rows']:,} input rows, "
                f"{entry[tag]['micro_batches']} batches, "
                f"peak state {peak:,} rows, "
                f"{entry[tag]['wall_sec']}s",
                flush=True,
            )
        section[name] = entry
    try:
        with open(OUT) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        doc = {}
    doc.setdefault("streaming_x32", {})
    doc["streaming_x32"].update(section)
    doc["streaming_x32"]["_sf_dirs"] = {"x1": SRC, "x32": DST}
    with open(OUT, "w") as f:
        json.dump(doc, f, indent=1, sort_keys=True)
    print(f"-> {OUT} streaming_x32 section updated")
    spark.stop()


if __name__ == "__main__":
    main()
