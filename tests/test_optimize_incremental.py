"""OPTIMIZE INCREMENTAL — Delta-shape bin-packing compaction as a
fileset commit (operators/sqlutil._optimize_incremental, r12).

Only files smaller than the target rewrite (packed toward target-sized
outputs); already-large files carry by fileset reference, so the
statement's write amplification is ∝ small-file bytes. The bare
OPTIMIZE stays the materializing full rewrite (the reference-chain
break VACUUM reclamation needs).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.engine import Engine
from openaq_data_pipeline_engineering_spark.operators.cow import (
    last_cow_stats,
)
from openaq_data_pipeline_engineering_spark.operators.filesets import (
    is_fileset_dir,
    version_files_with_rels,
)
from openaq_data_pipeline_engineering_spark.operators.sqlutil import (
    UtilStatementError,
)
from openaq_data_pipeline_engineering_spark.operators.versioned import (
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)


def _seed_mixed(spark, tmp_path, name="t"):
    """Partitioned table with FAT files in g=0 (incompressible md5
    padding) and small files everywhere else."""
    root = str(tmp_path / name)
    df = spark.range(0, 25).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("int").alias("g"),
        F.when(
            F.col("id") % 5 == 0,
            F.concat_ws(
                "",
                *[
                    F.md5(F.concat(F.col("id").cast("string"), F.lit(i)))
                    for i in range(100)
                ],
            ),
        )
        .otherwise(F.lit("s"))
        .alias("pad"),
    )
    write_snapshot(df.repartition(2, "k"), root, partition_by=["g"])
    return root


class TestOptimizeIncremental:
    def test_packs_small_files_and_carries_large_by_reference(
        self, spark, tmp_path
    ):
        root = _seed_mixed(spark, tmp_path)
        pairs = version_files_with_rels(os.path.join(root, "v=1"))
        sizes = {p: os.path.getsize(p) for p, _r in pairs}
        big = [p for p, s in sizes.items() if s >= 4000]
        small = [p for p, s in sizes.items() if s < 4000]
        assert big and len(small) >= 4, sorted(sizes.values())
        before_sum = read_snapshot(spark, root).agg(F.sum("k")).first()[0]
        row = Engine(spark).sql(
            f"OPTIMIZE '{root}' INCREMENTAL TARGET 4000 BYTES"
        ).first()
        assert row["n_files_after"] < row["n_files_before"]
        stats = last_cow_stats(root)
        assert stats["carry_mode"] == "fileset"
        assert stats["copy_syscalls"] == 0
        assert stats["files_carried"] == len(big)
        v2 = os.path.join(root, "v=2")
        assert is_fileset_dir(v2)
        out = read_snapshot(spark, root)
        assert out.count() == 25
        assert out.agg(F.sum("k")).first()[0] == before_sum
        # partition values intact through the pack
        assert out.filter("g = 2").count() == 5

    def test_noop_when_nothing_to_pack(self, spark, tmp_path):
        root = _seed_mixed(spark, tmp_path)
        row = Engine(spark).sql(
            f"OPTIMIZE '{root}' INCREMENTAL TARGET 10 BYTES"
        ).first()
        assert row["n_files_before"] == row["n_files_after"]
        assert snapshot_versions(root) == [1]  # no version churn

    def test_repeated_incremental_converges(self, spark, tmp_path):
        root = _seed_mixed(spark, tmp_path)
        eng = Engine(spark)
        eng.sql(f"OPTIMIZE '{root}' INCREMENTAL TARGET 4000 BYTES")
        v_after_first = snapshot_versions(root)[-1]
        # packed outputs may still sit under target; converges within
        # a couple of rounds and then stops committing
        for _ in range(3):
            eng.sql(f"OPTIMIZE '{root}' INCREMENTAL TARGET 4000 BYTES")
        final = snapshot_versions(root)[-1]
        again = eng.sql(
            f"OPTIMIZE '{root}' INCREMENTAL TARGET 4000 BYTES"
        ).first()
        assert snapshot_versions(root)[-1] == final  # converged
        assert again["n_rows"] == 25
        assert v_after_first >= 2
        assert read_snapshot(spark, root).count() == 25

    def test_rejects_plain_table_and_zorder_combo(self, spark, tmp_path):
        root = _seed_mixed(spark, tmp_path)
        with pytest.raises(UtilStatementError, match="INCREMENTAL"):
            Engine(spark).sql(
                f"OPTIMIZE '{root}' INCREMENTAL ZORDER BY (k)"
            )
        plain = str(tmp_path / "plain")
        spark.range(10).write.parquet(plain)
        with pytest.raises(UtilStatementError, match="versioned root"):
            Engine(spark).sql(f"OPTIMIZE '{plain}' INCREMENTAL")
