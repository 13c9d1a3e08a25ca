"""End-to-end engine walkthrough: the reference's whole DAG, in-process.

Reference flow (SURVEY §3.1): Lambda extract → S3 NDJSON raw zone →
Glue job (parse/dedup/pivot/enrich) → partitioned marts → crawler →
Athena validation. Here the same flow is function composition on one
SparkSession, plus the incremental merge the reference lacks.

Run:  python examples/run_pipeline.py [workdir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import Engine
from openaq_data_pipeline_engineering_spark.plans.incremental import merge_into_mart
from openaq_data_pipeline_engineering_spark.plans.mart import MartConfig, build_mart, write_mart
from openaq_data_pipeline_engineering_spark.sources.catalog import register_partitioned_table
from openaq_data_pipeline_engineering_spark.sources.json_source import read_ndjson

MEASUREMENTS = [
    # (location_id, iso datetime +07:00, parameter, value, city, country, lat, lon)
    ("loc1", "2026-01-05T10:00:00+07:00", "pm25", 35.2, "Hanoi", "VN", 21.03, 105.85),
    ("loc1", "2026-01-05T10:00:00+07:00", "pm25", 35.2, "Hanoi", "VN", 21.03, 105.85),
    ("loc1", "2026-01-05T10:00:00+07:00", "pm10", 61.0, "Hanoi", "VN", 21.03, 105.85),
    ("loc1", "2026-01-05T11:00:00+07:00", "pm25", 41.8, "Hanoi", "VN", 21.03, 105.85),
    ("loc2", "2026-01-05T10:00:00+07:00", "pm25", 12.4, None, None, None, None),
    ("loc2", "2026-01-06T10:00:00+07:00", "o3", 80.1, None, None, None, None),
]
COLS = ["location_id", "datetime", "parameter", "value",
        "city", "country", "latitude", "longitude"]


def main(workdir: str) -> None:
    raw_dir = os.path.join(workdir, "raw")
    mart_dir = os.path.join(workdir, "mart")
    os.makedirs(raw_dir, exist_ok=True)

    # --- 1. raw zone: NDJSON drop (reference S7 writes, S1 reads)
    with open(os.path.join(raw_dir, "drop1.json"), "w") as f:
        for row in MEASUREMENTS:
            f.write(json.dumps(dict(zip(COLS, row))) + "\n")

    eng = Engine()
    spark = eng.spark
    raw = read_ndjson(spark, raw_dir)
    print(f"raw rows: {raw.count()}")

    # --- 2. the Glue-job chain: parse → dedup → pivot → enrich (§3.2)
    cfg = MartConfig(tiebreaker=["value"])
    mart = build_mart(raw, cfg)
    print(f"mart rows: {mart.count()} (dup collapsed, wide schema)")

    # --- 3. partitioned write + catalog registration (S6 + S10)
    write_mart(mart, mart_dir)
    register_partitioned_table(spark, "aq_mart", mart_dir,
                               ["year", "month", "day"], sample=mart)

    # --- 4. the Athena-equivalent SQL surface (S11, A5/A6 shapes)
    print("-- top locations by avg pm25 --")
    eng.sql(
        """
        SELECT location_id, round(avg(pm25), 2) AS avg_pm25, count(*) AS n
        FROM aq_mart WHERE pm25 IS NOT NULL
        GROUP BY location_id ORDER BY avg_pm25 DESC LIMIT 10
        """
    ).show()

    # --- 5. incremental merge: overlapping re-delivery + a correction
    redelivery = build_mart(
        spark.createDataFrame(
            [
                ("loc1", "2026-01-05T11:00:00+07:00", "pm25", 42.0,
                 "Hanoi", "VN", 21.03, 105.85),  # corrected reading
                ("loc2", "2026-01-07T09:00:00+07:00", "pm25", 9.9,
                 None, None, None, None),        # new day
            ],
            COLS,
        ),
        cfg,
    ).withColumn("batch_ts", F.lit("2026-01-08T00:00:00"))
    # rows already on disk have no batch_ts (reads as NULL); desc ordering
    # puts the re-delivered batch first, so corrections win
    merge_into_mart(
        spark,
        mart_dir,
        redelivery,
        keys=["location_id", "datetime"],
        tiebreaker=[F.desc("batch_ts")],
    )
    after = spark.read.parquet(mart_dir)
    print(f"after merge: {after.count()} rows (no duplicates, correction applied)")
    after.filter("location_id = 'loc1'").orderBy("datetime").show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="aq_demo_"))
