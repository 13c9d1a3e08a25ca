"""Partition-level Bloom-filter index: build via bit-aggregates, probe
via broadcast join.

The 100 TB pattern this models: per-partition (here per-source) Bloom
filters stored as a tiny side table let a reader skip partitions that
cannot contain a key — the same idea as Parquet bloom filters and
Spark's runtime `might_contain` join pruning
(`spark.sql.optimizer.runtime.bloomFilter.enabled`), but materialized
as data so it survives across jobs and engines.

Everything is integer bit arithmetic (md5-derived positions, BIGINT
words) so a DuckDB oracle reproduces the filter bit-for-bit:

- m = 1024 bits per group, stored as 32 words x 32 bits each
  (32-bit payloads in BIGINT words — no sign-bit traps in either
  engine's `<<`).
- k = 2 positions per key: hex8(md5('b1:'||key)) % m and the 'b2:'
  twin. False-positive rate at n keys: (1 - e^(-kn/m))^k.

Build cost at scale: one hash aggregation keyed (group, word_idx) —
after map-side combine the shuffle carries at most |groups| x 32 rows
regardless of input size. Probe cost: the index is |groups| x 32 rows
— broadcast; probing any key set is a map-side join, no shuffle of the
probe side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M_BITS = 1024
WORD_BITS = 32
N_WORDS = M_BITS // WORD_BITS
_SALTS = ("b1:", "b2:")


def _position(key: Column, salt: str) -> Column:
    """Bit position in [0, M_BITS) for one hash function (engine-portable
    md5-hex arithmetic, mirrored in oracle_position_sql)."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8),
        16,
        10,
    ).cast("bigint")
    return h % M_BITS


def key_positions(key: Column) -> Column:
    """Array of the k bit positions for a key."""
    return F.array(*[_position(key, s) for s in _SALTS])


def bloom_build(df: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, word_idx, word) Bloom words for the keys of each group.

    One explode (x k) + one bit_or aggregation; shuffle bounded by
    |groups| x N_WORDS after partial aggregation.
    """
    pos = df.select(
        F.col(group_col).alias("group"),
        F.explode(key_positions(F.col(key_col))).alias("pos"),
    )
    return (
        pos.select(
            "group",
            (F.col("pos") / WORD_BITS).cast("bigint").alias("word_idx"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))"
            ).alias("bit"),
        )
        .groupBy("group", "word_idx")
        .agg(F.bit_or("bit").alias("word"))
    )


def bloom_probe(
    bloom: DataFrame, probes: DataFrame, probe_key: str
) -> DataFrame:
    """Probe every (group, probe key) pair against the index.

    Returns (group, <probe_key>, hit) where hit=true iff ALL k bits are
    set. The index side is broadcast (|groups| x 32 rows); the LEFT
    join keeps probes whose word row is absent (bit never set -> miss).
    """
    groups = bloom.select("group").distinct()
    pairs = probes.crossJoin(F.broadcast(groups)).select(
        "group",
        F.col(probe_key),
        F.posexplode(key_positions(F.col(probe_key))).alias("hash_i", "pos"),
    )
    checked = (
        pairs.withColumn(
            "word_idx", (F.col("pos") / WORD_BITS).cast("bigint")
        )
        .withColumn(
            "bit",
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {WORD_BITS} AS INT))"
            ),
        )
        .join(F.broadcast(bloom), on=["group", "word_idx"], how="left")
        .withColumn(
            "set",
            F.coalesce(
                F.col("word").bitwiseAND(F.col("bit")) != 0, F.lit(False)
            ),
        )
    )
    return checked.groupBy("group", probe_key).agg(
        (
            F.sum(F.when(F.col("set"), 1).otherwise(0)) == len(_SALTS)
        ).alias("hit")
    )


def oracle_position_sql(key_expr: str, salt: str) -> str:
    """DuckDB expression for one bit position (mirrors _position)."""
    return (
        f"CAST(concat('0x', substr(md5(concat('{salt}', "
        f"CAST({key_expr} AS VARCHAR))), 1, 8)) AS BIGINT) % {M_BITS}"
    )
