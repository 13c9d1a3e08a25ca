"""Skew mitigation: salted two-phase aggregation.

A groupBy on a low-cardinality or power-law key sends entire hot keys
to single reducers. Salting splits each key into ``n_salts`` synthetic
sub-keys for a partial aggregate, then combines partials in a second
(tiny) aggregation. Results are identical to the naive groupBy for any
algebraic aggregate (sum/count/min/max).

AQE's skew-join splitting handles *join* skew at runtime; aggregation
skew still benefits from explicit salting when a key dominates —
spark's partial hash agg already combines map-side, so salting matters
when the *reduce* side per-key state is the bottleneck (e.g. exact
distinct counts per hot key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
    salt_source: Column | None = None,
) -> DataFrame:
    """Two-phase aggregate: ``aggs`` maps output column -> (src_col, fn)
    with fn in {sum, count, min, max}.

    ``salt_source`` must be a deterministic expression (default: a hash
    of all non-key columns is NOT deterministic across row order — so
    the default salts by ``spark_partition_id()``, which preserves
    algebraic-aggregate results regardless of how rows are split).
    """
    combine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for out, (_, fn) in aggs.items():
        if fn not in combine:
            raise ValueError(f"{out}: non-algebraic aggregate {fn!r} cannot be salted")

    salt = (
        salt_source if salt_source is not None else F.spark_partition_id()
    ) % F.lit(n_salts)
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(*keys, "__salt")
        .agg(
            *[
                getattr(F, fn)(src).alias(f"__p_{out}")
                for out, (src, fn) in aggs.items()
            ]
        )
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, combine[fn])(f"__p_{out}").alias(out)
            for out, (src, fn) in aggs.items()
        ]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skew-safe equi-join: replicate the small side across ``n_salts``
    sub-keys and salt the fact side, so one hot join key spreads over
    ``n_salts`` reducers instead of one.

    The salt on the fact side may be ANY per-row value in [0, n_salts)
    (it only routes rows); the dim side carries every salt, so the
    joined row-set is identical to the unsalted join. Use when a
    broadcast is too large and AQE's runtime skew splitting is
    unavailable or insufficient.
    """
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    # shuffle_hash hint: a dim small enough to broadcast wouldn't need
    # salting at all — keep the plan an actual distributed join so the
    # technique the operator demonstrates is the technique in the plan.
    return salted_fact.join(
        salted_dim.hint("shuffle_hash"), [key, "__salt"]
    ).drop("__salt")
