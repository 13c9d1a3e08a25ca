"""UPDATE / DELETE statement lowering — the single-table DML
companions to MERGE INTO (operators/sqlmerge.py).

Spark's parser accepts both statements but plain-parquet / temp-view
tables lack row-level-operation support (``UnsupportedOperationException``
without Delta/Iceberg); the reference's Athena surface
(utils/athena_utils.py) has no DML at all. ``Engine.sql`` routes the
statements here and returns the POST-STATEMENT DataFrame — the caller
publishes it (operators/versioned.write_snapshot) exactly like a MERGE
result, keeping every mutation an immutable new version.

Grammar:

    UPDATE <table> [[AS] alias] SET col = expr, ... [WHERE <cond>]
    DELETE FROM <table> [[AS] alias] [WHERE <cond>]

Lowering is join-free and single-pass: UPDATE is one projection with a
CASE per assigned column (WHERE rows get the new expression, others
pass through); DELETE is one ``filter(NOT cond)``. Both preserve
column order and types; at any scale the cost is the one scan that any
row mutation needs.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.sqlmerge import (
    MergeError,
    _mask_literals,
    _split_top,
    _unqualify,
)

_UPDATE_RE = re.compile(
    r"^\s*UPDATE\s+(?P<table>[\w.]+)"
    r"(?:\s+(?:AS\s+)?(?P<alias>(?!SET\b)\w+))?"
    r"\s+SET\s+(?P<sets>.+?)"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)

_DELETE_RE = re.compile(
    r"^\s*DELETE\s+FROM\s+(?P<table>[\w.]+)"
    r"(?:\s+(?:AS\s+)?(?P<alias>(?!WHERE\b)\w+))?"
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*;?\s*$",
    re.IGNORECASE | re.DOTALL,
)


def execute_update(
    spark: SparkSession, sql: str, target_df: DataFrame | None = None
) -> DataFrame:
    """Plan an UPDATE statement; returns the post-update DataFrame."""
    # Regexes run on the literal-masked text (keywords inside string
    # literals must not split the statement); group spans slice the
    # original. Dotted table names alias to their last segment so
    # generated column refs stay 2-part.
    masked = _mask_literals(sql)
    m = _UPDATE_RE.match(masked)
    if not m:
        raise MergeError(
            "unparseable UPDATE; expected UPDATE <t> SET c = expr, ... "
            "[WHERE cond]"
        )
    alias = m.group("alias") or m.group("table").split(".")[-1]
    df = (
        spark.table(m.group("table")) if target_df is None else target_df
    ).alias(alias)
    assignments: dict[str, str] = {}
    sets = sql[m.start("sets"):m.end("sets")]
    for part in _split_top(sets):
        if "=" not in part:
            raise MergeError(f"bad assignment: {part!r}")
        lhs, rhs = part.split("=", 1)
        assignments[_unqualify(lhs, (alias,))] = rhs.strip()
    canon = {c.lower(): c for c in df.columns}
    unknown = [c for c in assignments if c.lower() not in canon]
    if unknown:
        raise MergeError(f"UPDATE SET references unknown columns: {unknown}")
    assignments = {canon[c.lower()]: v for c, v in assignments.items()}
    where = (
        sql[m.start("where"):m.end("where")] if m.group("where") else None
    )
    cond = F.expr(where) if where else F.lit(True)
    return df.select(
        *[
            (
                F.when(cond, F.expr(assignments[c]))
                .otherwise(F.col(f"{alias}.{c}"))
                .alias(c)
                if c in assignments
                else F.col(f"{alias}.{c}").alias(c)
            )
            for c in df.columns
        ]
    )


def execute_delete(
    spark: SparkSession, sql: str, target_df: DataFrame | None = None
) -> DataFrame:
    """Plan a DELETE statement; returns the post-delete DataFrame."""
    masked = _mask_literals(sql)
    m = _DELETE_RE.match(masked)
    if not m:
        raise MergeError(
            "unparseable DELETE; expected DELETE FROM <t> [WHERE cond]"
        )
    alias = m.group("alias") or m.group("table").split(".")[-1]
    df = (
        spark.table(m.group("table")) if target_df is None else target_df
    ).alias(alias)
    if m.group("where") is None:
        return df.filter(F.lit(False))  # DELETE all rows
    # NULL-condition rows are NOT deleted (SQL semantics: DELETE keeps
    # rows where the predicate is not TRUE).
    cond = F.expr(sql[m.start("where"):m.end("where")])
    return df.filter(~F.coalesce(cond, F.lit(False)))
