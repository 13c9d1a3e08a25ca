"""Engine conf-application semantics.

`apply_runtime_confs` runs on every `load_table` against WHOEVER owns the
session — including an external cluster session. It must never override an
explicit shuffle-partition choice (a 32-task cap on a 1000-executor
cluster would serialize every exchange); it only right-sizes the untouched
Spark default, and only in local mode.
"""

from __future__ import annotations

from openaq_data_pipeline_engineering_spark.engine import (
    _LOCAL_SHUFFLE_PARTITIONS,
    _SHUFFLE_PARTITIONS_DEFAULT,
    apply_runtime_confs,
)

_KEY = "spark.sql.shuffle.partitions"


def test_explicit_shuffle_partitions_survive(spark):
    original = spark.conf.get(_KEY)
    try:
        spark.conf.set(_KEY, "48")
        apply_runtime_confs(spark)
        assert spark.conf.get(_KEY) == "48"
    finally:
        spark.conf.set(_KEY, original)


def test_default_shuffle_partitions_resized_in_local_mode(spark):
    assert spark.conf.get("spark.master", "").startswith("local")
    original = spark.conf.get(_KEY)
    try:
        spark.conf.set(_KEY, _SHUFFLE_PARTITIONS_DEFAULT)
        apply_runtime_confs(spark)
        assert spark.conf.get(_KEY) == _LOCAL_SHUFFLE_PARTITIONS
    finally:
        spark.conf.set(_KEY, original)


def test_runtime_confs_do_not_pin_shuffle_partitions():
    from openaq_data_pipeline_engineering_spark.engine import _RUNTIME_CONFS

    assert _KEY not in _RUNTIME_CONFS
