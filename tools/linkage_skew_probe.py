"""Fuzzy-linkage skew A/B probe (VERDICT r7 #1 'done' evidence).

Round 7 measured the fixed-prefix pathology: exact-replica x32
replication copies every customer NAME verbatim, so each width-16
block holds 32x identical names and `fuzzy_linkage_blocked` ran 166.7x
(true-match mass ~32^2). This probe runs the SAME corpus through both
strategies and records candidate-pair mass + wall:

- fixed: prefix_block(16) (the round-7 declared query's key),
- auto:  skew_safe_fuzzy_join (auto_block_width base + enforced cap,
  hot blocks widened to 17; on_overflow='keep' because identical
  replicated names CANNOT be split by any prefix — the loud error is
  the production default and fires here by design, also recorded).

Usage: python tools/linkage_skew_probe.py  [x1_dir] [x32_dir]
Prints one JSON line per (scale, strategy) with pair mass and wall.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from openaq_data_pipeline_engineering_spark.engine import get_spark  # noqa: E402
from openaq_data_pipeline_engineering_spark.operators.linkage import (  # noqa: E402
    BlockOverflowError,
    auto_block_width,
    blocked_fuzzy_join,
    prefix_block,
    skew_safe_fuzzy_join,
)
from tools.scale_probe import DST, SRC, build_replica  # noqa: E402


def sides(spark, sf_dir):
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    dirty = cust.select(
        F.col("c_custkey").alias("d_id"),
        F.expr("substring(c_name, 1, length(c_name) - 1)").alias("d_name"),
    )
    clean = cust.select("c_custkey", "c_name")
    return dirty, clean, cust.count()


def run(spark, sf_dir, tag):
    dirty, clean, n = sides(spark, sf_dir)
    out = []

    t0 = time.time()
    fixed = blocked_fuzzy_join(
        dirty, clean, "d_name", "c_name", prefix_block(16), max_distance=1
    )
    n_fixed = fixed.count()
    out.append(
        {"scale": tag, "strategy": "fixed16", "pairs": n_fixed,
         "wall_sec": round(time.time() - t0, 2)}
    )

    base = 9 + auto_block_width(n, target_block_rows=64)
    t0 = time.time()
    try:
        auto = skew_safe_fuzzy_join(
            dirty, clean, "d_name", "c_name",
            base_chars=base, widened_chars=17, target_block_rows=64,
        )
        n_auto = auto.count()
        overflow = False
    except BlockOverflowError:
        overflow = True  # identical-name mass: the loud contract fired
        auto = skew_safe_fuzzy_join(
            dirty, clean, "d_name", "c_name",
            base_chars=base, widened_chars=17, target_block_rows=64,
            on_overflow="keep",
        )
        n_auto = auto.count()
    out.append(
        {"scale": tag, "strategy": "auto_block", "pairs": n_auto,
         "wall_sec": round(time.time() - t0, 2),
         "overflow_error_fired": overflow}
    )
    for row in out:
        print(json.dumps(row), flush=True)
    return out


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else SRC
    dst = sys.argv[2] if len(sys.argv) > 2 else DST
    spark = get_spark(
        app_name="linkage-skew-probe", master="local[32]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)
    r1 = run(spark, src, "x1")
    r32 = run(spark, dst, "x32")
    for strat in ("fixed16", "auto_block"):
        a = next(r for r in r1 if r["strategy"] == strat)
        b = next(r for r in r32 if r["strategy"] == strat)
        ratio = b["wall_sec"] / max(a["wall_sec"], 1e-9)
        print(
            f"# {strat}: x1={a['wall_sec']}s x32={b['wall_sec']}s "
            f"ratio={ratio:.1f} pairs {a['pairs']:,} -> {b['pairs']:,}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
