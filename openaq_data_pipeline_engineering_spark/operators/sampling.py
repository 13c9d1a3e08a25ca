"""Deterministic sampling / splitting for training-data pipelines.

``df.sample()`` is seed-dependent but partition-layout-sensitive — the
same seed yields different rows after a repartition, which poisons
reproducibility across cluster sizes. These operators derive the
sampling decision from a HASH OF THE ROW KEY instead: membership is a
pure function of the data, reproducible on any layout, any engine (the
md5 hash is oracle-mirrorable), and stable across reruns — the property
a training corpus needs so that train/eval never contaminate each other
when the pipeline is re-run on more machines.

Hash uniformity: the first 7 md5 hex chars (28 bits) scaled to [0, 1).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_DENOM = float(16**7)  # 28-bit hex prefix


def hash_unit(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform [0,1) value from a row key (+salt)."""
    k = F.col(key) if isinstance(key, str) else key
    h = F.md5(F.concat(k.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 7), 16, 10).cast("double") / F.lit(_DENOM)


def split_column(
    key: Column | str,
    train_frac: float = 0.9,
    val_frac: float = 0.05,
    salt: str = "split",
) -> Column:
    """'train' / 'val' / 'test' assignment, disjoint and exhaustive."""
    u = hash_unit(key, salt)
    return (
        F.when(u < train_frac, "train")
        .when(u < train_frac + val_frac, "val")
        .otherwise("test")
    )


def deterministic_sample(
    df: DataFrame, key: str, fraction: float, salt: str = "sample"
) -> DataFrame:
    """Keep ~fraction of rows, chosen by key hash — layout-independent."""
    return df.filter(hash_unit(key, salt) < F.lit(fraction))


def weighted_source_mix(
    df: DataFrame,
    key: str,
    source_col: str,
    weights: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Down-sample each source to its weight (1.0 = keep all) — the
    corpus-mixing step of a training-data pipeline. Unknown sources are
    dropped (weight 0)."""
    w = F.lit(0.0)
    for s, frac in weights.items():
        w = F.when(F.col(source_col) == s, F.lit(float(frac))).otherwise(w)
    return df.filter(hash_unit(key, salt) < w)


# --- SQL mirrors (same constants) ------------------------------------------
def hash_unit_sql(key_expr: str, salt: str = "") -> str:
    return (
        f"CAST(concat('0x', substr(md5(CAST({key_expr} AS VARCHAR) || '{salt}'),"
        f" 1, 7)) AS BIGINT) / {_DENOM}"
    )


def split_column_sql(
    key_expr: str, train_frac: float = 0.9, val_frac: float = 0.05,
    salt: str = "split",
) -> str:
    u = hash_unit_sql(key_expr, salt)
    return (
        f"CASE WHEN {u} < {train_frac} THEN 'train' "
        f"WHEN {u} < {train_frac + val_frac} THEN 'val' "
        f"ELSE 'test' END"
    )


def stratified_sample(
    df: DataFrame,
    key: str,
    strata_col: str,
    n_per_stratum: int,
    salt: str = "strat",
) -> DataFrame:
    """Exactly min(n, |stratum|) rows per stratum, chosen by key hash.

    Equal-count stratified sampling (vs :func:`weighted_source_mix`'s
    rate-based thinning): rank rows inside each stratum by the
    deterministic hash (key tiebreak) and keep the first n. One window
    shuffle on the strata column; layout-independent like all sampling
    here. Skewed strata don't skew the OUTPUT (each emits exactly n),
    and the window shuffle can be salted upstream if a single stratum
    dominates the input.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_unit(key, salt), F.col(key)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_stratum)
        .drop("__rn")
    )
