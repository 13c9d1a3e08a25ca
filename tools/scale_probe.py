"""32x scale probe: replicate the fact tables with shifted keys and
time declared queries at x1 vs x32 (the methodology behind the
scaling tables in PLANS.md).

Replication multiplies per-key density rather than key cardinality
for keys it does not shift, so super-linear ratios can be replication
artifacts (documented per-case in PLANS.md: minhash pair explosion,
multitouch per-user density); the probe's value is catching operators
that degrade super-linearly WITHOUT such an explanation.

Usage: python tools/scale_probe.py <query> [query ...]
       (expects the replica dir to exist; builds it on first run)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from openaq_data_pipeline_engineering_spark.engine import get_spark  # noqa: E402
from openaq_data_pipeline_engineering_spark.plans.registry import get_queries  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.environ.get("SPARK_GRAFT_X32_DIR", "/tmp/x32")
FACTOR = 32
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
# key column + id stride per replicated table (stride >> max key).
# orders+lineitem share the orderkey stride so the o_orderkey ==
# l_orderkey join stays consistent across replicas (each replica is a
# self-contained order set; o_custkey/l_partkey are NOT shifted, so
# per-customer/per-part density multiplies — documented per-case).
REPLICATE = {
    "supplier": ("s_suppkey", 10_000),
    "customer": ("c_custkey", 10_000_000),
    "documents": ("doc_id", 10_000_000),
    "embeddings": ("vec_id", 10_000_000),
    "events": ("event_id", 100_000_000),
    "orders": ("o_orderkey", 100_000_000),
    "lineitem": ("l_orderkey", 100_000_000),
}


def build_replica(spark) -> None:
    if os.path.isdir(DST):
        return
    os.makedirs(DST)
    for t in TABLES:
        src_file = f"{SRC}/{t}.parquet"
        if t in REPLICATE:
            key, stride = REPLICATE[t]
            df = spark.read.parquet(src_file)
            out = None
            for i in range(FACTOR):
                part = df.withColumn(
                    key,
                    (F.col(key) + F.lit(i * stride)).cast(
                        df.schema[key].dataType
                    ),
                )
                out = part if out is None else out.unionByName(part)
            out.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        elif os.path.isdir(src_file):
            # Spark-written parquet is a directory per table
            shutil.copytree(src_file, f"{DST}/{t}.parquet")
        else:
            shutil.copyfile(src_file, f"{DST}/{t}.parquet")


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print(__doc__)
        return
    spark = get_spark(
        app_name="scale-probe", master="local[32]", shuffle_partitions=32
    )
    spark.sparkContext.setLogLevel("ERROR")
    build_replica(spark)
    qs = get_queries()
    for name in names:
        row = {"query": name}
        for sf, tag in [(SRC, "x1"), (DST, "x32")]:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                qs[name](spark, sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            row[tag] = best
        ratio = row["x32"] / row["x1"] if row["x1"] else float("inf")
        print(
            f"{name}: x1={row['x1']:.2f}s x32={row['x32']:.2f}s "
            f"ratio={ratio:.1f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
