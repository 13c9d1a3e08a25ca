from __future__ import annotations

import pytest

# Must run at import time — BEFORE any SparkSession starts — so the
# PYTHONPATH export reaches the JVM environment and, through it, the
# Python worker processes (transformWithStateInPandas imports
# google.protobuf inside workers). No-op where protobuf is installed.
from openaq_data_pipeline_engineering_spark.streaming.pbvendor import ensure_protobuf

ensure_protobuf()

from openaq_data_pipeline_engineering_spark.engine import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
