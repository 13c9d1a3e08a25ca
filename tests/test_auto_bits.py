"""Executable LSH bucket-sizing rule (round-5 verdict item 3).

The round-5 x32 probe showed a FIXED projection width is
quadratic-in-occupancy as the corpus grows; auto_bits makes the
documented `n_bits ∝ log2(N)` rule code. These tests pin:

1. the all-integer sizing invariant (occupancy target honored, clamps),
2. bit-exact agreement between the Python rule and its DuckDB twin
   (auto_bits_sql) across boundary counts,
3. on real embeddings: expected bucket occupancy stays ~constant
   between sf0.01 and a 32×-replicated corpus under auto-sizing,
   while a fixed 8-bit projection's occupancy grows the full 32×.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.functions.vectors import (
    auto_bits,
    auto_bits_sql,
    lsh_bucket,
)
from openaq_data_pipeline_engineering_spark.sources.star import load_table

SF_DIR = "/root/testdata/sf0.01"


class TestAutoBitsRule:
    def test_occupancy_target_honored(self):
        """Unclamped: smallest b with n <= target * 2^b, so the
        expected occupancy n / 2^b sits in (target/2, target]."""
        for n in (600, 1000, 4096, 50_000, 123_457, 2**20):
            b = auto_bits(n, target_occupancy=32)
            assert n <= 32 * (1 << b)
            if b > 4:  # not at the min clamp
                assert n > 32 * (1 << (b - 1))
                occ = n / (1 << b)
                assert 16 < occ <= 32

    def test_clamps_and_edges(self):
        assert auto_bits(0) == 4
        assert auto_bits(1) == 4
        assert auto_bits(32 * 16) == 4  # exactly fills min_bits buckets
        assert auto_bits(32 * 16 + 1) == 5
        assert auto_bits(10**12) == 16  # max clamp
        assert auto_bits(10**12, max_bits=40) == 35  # 32*2^35 >= 1e12
        with pytest.raises(ValueError):
            auto_bits(100, target_occupancy=0)

    def test_sql_twin_matches_python_everywhere(self):
        """The oracle derives the width from count(*) with exact
        integer comparisons — must equal auto_bits for every count,
        including the power-of-two boundaries where a float log2
        could disagree by one ULP."""
        counts = [1, 2, 511, 512, 513, 1000, 2000, 16_384, 16_385]
        counts += [32 * (1 << b) for b in range(4, 17)]
        counts += [32 * (1 << b) + 1 for b in range(4, 17)]
        con = duckdb.connect()
        for n in counts:
            sql = auto_bits_sql(str(n))
            got = con.sql(f"SELECT {sql}").fetchone()[0]
            assert got == auto_bits(n), f"count={n}"

    def test_occupancy_constant_under_32x_growth(self, spark):
        """The round-5 probe, with the fix applied: replicate the
        embeddings corpus 32× (fresh vec_ids) and re-bucket with
        auto-sizing. Mean realized occupancy must stay within 2× of
        the base corpus's, where the fixed 8-bit projection grows the
        full 32× (quadratic within-bucket candidate work)."""
        base = load_table(spark, SF_DIR, "embeddings")
        n1 = base.count()
        rep = spark.range(32).crossJoin(base).select(
            (F.col("vec_id") + F.col("id") * 1_000_000).alias("vec_id"),
            "embedding",
        )
        n32 = rep.count()
        assert n32 == 32 * n1

        def mean_occ(df, n_bits: int) -> float:
            counts = (
                df.groupBy(lsh_bucket("embedding", n_bits, 32).alias("b"))
                .count()
                .agg(F.avg("count"))
                .first()[0]
            )
            return float(counts)

        occ1 = mean_occ(base, auto_bits(n1))
        occ32 = mean_occ(rep, auto_bits(n32))
        occ32_fixed = mean_occ(rep, 8)
        occ1_fixed = mean_occ(base, 8)
        # auto-sizing: ~constant occupancy (exact replication keeps
        # copies in one bucket, so some growth survives; bounded, not
        # the 32× of a fixed width)
        assert occ32 <= 2.0 * occ1, (occ1, occ32)
        # fixed width: occupancy tracks corpus size (the probe artifact)
        assert occ32_fixed / occ1_fixed > 16.0, (occ1_fixed, occ32_fixed)
