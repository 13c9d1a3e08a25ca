"""Executable fuzzy-linkage blocking rule (round-7 verdict item 1).

The round-7 x32 probe showed a FIXED blocking prefix is quadratic in
block occupancy under skew (166.7× wall at exact-replica x32);
auto_block_width makes the documented "widen the prefix" rule code —
the linkage twin of auto_bits — and skew_safe_fuzzy_join ENFORCES a
per-block row cap: measured hot blocks re-block on a widened prefix,
residual identical-key mass fails loudly instead of silently
exploding. These tests pin:

1. the all-integer sizing invariant (occupancy target honored, clamps),
2. exact agreement between the Python rule and its DuckDB twin,
3. the enforcement: hot blocks widen (bounded candidate mass), cold
   blocks keep the narrow key (no lost recall), residual overflow
   raises BlockOverflowError unless explicitly kept.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.linkage import (
    BlockOverflowError,
    auto_block_width,
    auto_block_width_sql,
    best_match,
    skew_safe_fuzzy_join,
)


class TestAutoBlockWidthRule:
    def test_occupancy_target_honored(self):
        """Unclamped: smallest w with n <= target * branching^w, so the
        expected occupancy n / branching^w sits in (target/10, target]
        for branching=10."""
        for n in (600, 1000, 4096, 50_000, 123_457, 10**7):
            w = auto_block_width(n, target_block_rows=64)
            assert n <= 64 * 10**w
            if w > 1:  # not at the min clamp
                assert n > 64 * 10 ** (w - 1)

    def test_clamps_and_edges(self):
        assert auto_block_width(0) == 1
        assert auto_block_width(1) == 1
        assert auto_block_width(64 * 10) == 1  # exactly fills min width
        assert auto_block_width(64 * 10 + 1) == 2
        assert auto_block_width(10**40) == 32  # max clamp
        assert auto_block_width(10**6, branching=26) == 3  # 64*26^3 > 1e6
        with pytest.raises(ValueError):
            auto_block_width(100, target_block_rows=0)
        with pytest.raises(ValueError):
            auto_block_width(100, branching=1)

    def test_sql_twin_matches_python_everywhere(self):
        counts = [1, 2, 639, 640, 641, 6400, 6401, 64 * 10**5]
        counts += [64 * 10**w for w in range(1, 10)]
        counts += [64 * 10**w + 1 for w in range(1, 10)]
        con = duckdb.connect()
        for n in counts:
            got = con.execute(
                f"SELECT {auto_block_width_sql(str(n))}"
            ).fetchone()[0]
            assert got == auto_block_width(n), n
        # non-default branching falls back to float power (documented)
        got = con.execute(
            f"SELECT {auto_block_width_sql('1000000', branching=26)}"
        ).fetchone()[0]
        assert got == auto_block_width(10**6, branching=26)


def _sides(spark, rows):
    df = spark.createDataFrame(rows, "id int, name string")
    left = df.select(F.col("id").alias("d_id"), F.col("name").alias("d_name"))
    right = df.select(
        F.col("id").alias("c_id"), F.col("name").alias("c_name")
    )
    return left, right


class TestSkewSafeFuzzyJoin:
    def _skewed(self, spark):
        # 200 hot rows sharing a 4-char prefix (AAAA0000..AAAA0199) +
        # 10 cold rows with distinct prefixes.
        rows = [(i, f"AAAA{i:04d}") for i in range(200)]
        rows += [(1000 + i, f"B{i}xx{i}") for i in range(10)]
        return _sides(spark, rows)

    def test_hot_block_widens_cold_blocks_stay(self, spark):
        left, right = self._skewed(spark)
        pairs = skew_safe_fuzzy_join(
            left, right, "d_name", "c_name",
            base_chars=4, widened_chars=7, target_block_rows=64,
            max_distance=0,
        )
        # exact self-pairs all survive: widening never splits a true
        # pair that agrees on the widened prefix
        got = {(r["d_id"], r["c_id"]) for r in pairs.collect()}
        assert got == {(i, i) for i in range(200)} | {
            (1000 + i, 1000 + i) for i in range(10)
        }

    def test_candidate_mass_is_cap_bounded(self, spark):
        # The unguarded 4-char join would compare 200*200 = 40,000 hot
        # pairs; the widened key (7 chars = one varying digit left)
        # bounds every block to <= 10 rows -> <= 100 pairs per block.
        left, right = self._skewed(spark)
        pairs = skew_safe_fuzzy_join(
            left, right, "d_name", "c_name",
            base_chars=4, widened_chars=7, target_block_rows=64,
            max_distance=99,  # keep every in-block pair: counts mass
        )
        n = pairs.count()
        # 20 widened hot blocks of 10 (100 pairs each) + 10 cold 1-row
        # blocks (1 pair each)
        assert n == 20 * 100 + 10

    def test_residual_overflow_raises_loudly(self, spark):
        rows = [(i, "SAMENAME") for i in range(100)]
        left, right = _sides(spark, rows)
        with pytest.raises(BlockOverflowError) as ei:
            skew_safe_fuzzy_join(
                left, right, "d_name", "c_name",
                base_chars=4, widened_chars=8, target_block_rows=64,
            )
        assert "SAMENAME" in str(ei.value)

    def test_residual_overflow_keep_processes_anyway(self, spark):
        rows = [(i, "SAMENAME") for i in range(70)]
        left, right = _sides(spark, rows)
        pairs = skew_safe_fuzzy_join(
            left, right, "d_name", "c_name",
            base_chars=4, widened_chars=8, target_block_rows=64,
            max_distance=0, on_overflow="keep",
        )
        assert pairs.count() == 70 * 70  # identical names: all-pairs

    def test_rejects_bad_params(self, spark):
        left, right = self._skewed(spark)
        with pytest.raises(ValueError):
            skew_safe_fuzzy_join(
                left, right, "d_name", "c_name",
                base_chars=8, widened_chars=8,
            )
        with pytest.raises(ValueError):
            skew_safe_fuzzy_join(
                left, right, "d_name", "c_name",
                base_chars=4, widened_chars=8, on_overflow="explode",
            )

    def test_matches_unguarded_join_when_no_skew(self, spark):
        # Below the cap nothing widens: result equals the plain
        # blocked join on the same base key.
        from openaq_data_pipeline_engineering_spark.operators.linkage import (
            blocked_fuzzy_join,
            prefix_block,
        )

        rows = [(i, f"XY{i:02d}tail") for i in range(40)]
        left, right = _sides(spark, rows)
        guarded = skew_safe_fuzzy_join(
            left, right, "d_name", "c_name",
            base_chars=4, widened_chars=6, target_block_rows=64,
            max_distance=2,
        )
        plain = blocked_fuzzy_join(
            left, right, "d_name", "c_name", prefix_block(4), max_distance=2
        )
        key = lambda r: (r["d_id"], r["c_id"], r["edit_distance"])
        assert {key(r) for r in guarded.collect()} == {
            key(r) for r in plain.collect()
        }

    def test_best_match_composes(self, spark):
        left, right = self._skewed(spark)
        pairs = skew_safe_fuzzy_join(
            left, right, "d_name", "c_name",
            base_chars=4, widened_chars=7, target_block_rows=64,
            max_distance=1,
        )
        best = best_match(pairs, "d_id", tiebreak="c_id")
        assert best.count() == 210  # one row per left record
