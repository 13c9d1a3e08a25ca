"""Dimension extraction and broadcast enrichment.

Reference semantics:
- J3/A2: the location dimension is derived from the *same* raw frame via
  project + dropDuplicates (process_openaq_raw.py:179-185) — survivor
  nondeterministic; we use a deterministic min-by-tiebreaker window.
- J1: pivoted fact ⟕ dim on the key (process_openaq_raw.py:188-192).
- P6/F6: null-fill defaults city→"Unknown", country→default, lat/lon→0.0
  (process_openaq_raw.py:195-198) and the coalesce-chain city fallback
  (extract_api.py:390,416-418).

Scale: the dim is tiny relative to the fact (locations ≪ measurements) —
explicit ``F.broadcast`` makes the join a BroadcastHashJoin with NO
shuffle of the 100 TB fact side, instead of trusting the
autoBroadcastJoinThreshold estimate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.dedup import dedup_first

DEFAULT_FILLS = {
    "city_name": "Unknown",
    "country_code": "VN",
    "latitude": 0.0,
    "longitude": 0.0,
}


def extract_location_dim(
    df: DataFrame,
    key: str,
    attrs: dict[str, str],
    tiebreaker: list[str],
) -> DataFrame:
    """Project ``key`` + renamed ``attrs`` and keep one row per key.

    ``attrs`` maps source column -> dim column name (the reference's
    select/cast/alias block, process_openaq_raw.py:179-185). Deterministic
    survivor via ``dedup_first`` instead of ``dropDuplicates``.
    """
    proj = [F.col(key)] + [F.col(src).alias(dst) for src, dst in attrs.items()]
    proj += [F.col(c) for c in tiebreaker if c != key and c not in attrs]
    deduped = dedup_first(df.select(*proj), keys=[key], tiebreaker=tiebreaker)
    return deduped.select(key, *attrs.values())


def enrich_metadata(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fills: dict | None = None,
) -> DataFrame:
    """Left broadcast-join the dim onto the fact, then apply fill defaults."""
    out = fact.join(F.broadcast(dim), on=key, how="left")
    fills = DEFAULT_FILLS if fills is None else fills
    applicable = {c: v for c, v in fills.items() if c in out.columns}
    return out.fillna(applicable) if applicable else out
