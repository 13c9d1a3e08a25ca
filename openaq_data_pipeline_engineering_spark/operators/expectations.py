"""Declarative data-quality expectations: validate, quarantine, report.

The reference validates its mart imperatively — a null-profile
projection and range predicates asserted in tests
(process_openaq_raw.py:228-231, tests/test_glue_transformation.py:
198-253, both cited in SURVEY §2.2 P9/P10). This operator makes that
surface DECLARATIVE, the Delta-Live-Tables "expectations" shape: a
pipeline states named boolean rules once and gets, from the same rule
set,

- :func:`split_expectations` — (valid rows, quarantined rows), where
  each quarantined row carries the array of rule names it failed
  (never silently dropped — the reference's QA can only fail a test
  run, not route bad rows);
- :func:`expectation_report` — per-rule violation counts in ONE
  aggregation pass over the data.

(The declared ``dq_expectations`` query — plans/queries_warehouse.py —
is the complementary TABLE-level report: uniqueness / completeness /
referential integrity across tables. This module is the ROW-level
side: which rows fail which rules, and where they go.)

Execution is Spark-first and scale-shaped:

- every rule is a Column expression evaluated JVM-side inside
  whole-stage codegen (no Python in the row path);
- the report is a single map-combined aggregate (one conditional SUM
  per rule plus COUNT(*)), then a driver-side constant unpivot of the
  one result row — one scan regardless of rule count, no shuffle
  beyond the final single-row combine;
- the split is a narrow projection + filter — no shuffle at all, so
  quarantining at 100 TB costs exactly the scan it was already paying.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FAILED = "failed_rules"


def _rule_cols(rules: dict[str, Column | str]) -> dict[str, Column]:
    if not rules:
        raise ValueError("expectations need at least one rule")
    out: dict[str, Column] = {}
    for name, expr in rules.items():
        out[name] = F.expr(expr) if isinstance(expr, str) else expr
    return out


def split_expectations(
    df: DataFrame, rules: dict[str, Column | str]
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): rows passing EVERY rule vs the rest.

    A rule evaluating to NULL (e.g. a comparison against a NULL value)
    counts as a FAILURE — the SQL three-valued trap where
    ``NULL <= 45`` is neither true nor false would otherwise let null
    rows through every rule. The quarantine frame carries
    ``failed_rules array<string>`` naming each violated rule, so a
    downstream triage can group by failure mode.
    """
    cols = _rule_cols(rules)
    passed = {n: F.coalesce(c, F.lit(False)) for n, c in cols.items()}
    failed = F.array_compact(
        F.array(
            *[
                F.when(~passed[n], F.lit(n))
                for n in rules  # statement order, deterministic
            ]
        )
    )
    tagged = df.withColumn(_FAILED, failed)
    valid = tagged.filter(F.size(_FAILED) == 0).drop(_FAILED)
    quarantine = tagged.filter(F.size(_FAILED) > 0)
    return valid, quarantine


def expectation_report(
    df: DataFrame, rules: dict[str, Column | str]
) -> DataFrame:
    """Per-rule violation counts in one aggregation pass.

    Returns ``(rule string, n_fail bigint, n_rows bigint)`` with one
    row per rule plus two summary rows: ``__any_failed__`` (rows
    violating at least one rule — the quarantine size) and
    ``__all_valid__`` (rows passing every rule). NULL rule results
    count as failures, matching :func:`split_expectations`, so the two
    APIs are always consistent: n_fail('__any_failed__') ==
    quarantine.count() by construction, which the declared witness
    pins cross-engine.

    One scan, map-combined: the conditional sums partial-aggregate on
    every input partition and a single row crosses the wire.
    """
    cols = _rule_cols(rules)
    fail = {
        n: ~F.coalesce(c, F.lit(False)) for n, c in cols.items()
    }
    any_fail = None
    for n in rules:
        any_fail = fail[n] if any_fail is None else (any_fail | fail[n])
    # SUM over an EMPTY input is NULL — coalesce to 0 so the empty-df
    # report keeps the n_fail('__any_failed__') == quarantine.count()
    # invariant (both 0) instead of going NULL.
    aggs = [
        F.coalesce(F.sum(F.when(fail[n], 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias(f"f_{i}")
        for i, n in enumerate(rules)
    ]
    aggs.append(
        F.coalesce(F.sum(F.when(any_fail, 1).otherwise(0)), F.lit(0))
        .cast("bigint")
        .alias("f_any")
    )
    aggs.append(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    one = df.agg(*aggs)
    # Constant unpivot of the single result row: stack() is evaluated
    # on one row, so rule count never affects the scan. Rule names are
    # quoted into the expression — escape embedded quotes so a name
    # like "o'clock" can't break (or inject into) the projection;
    # split_expectations uses F.lit and needs no escaping, keeping the
    # two APIs consistent for any name.
    def q(n: str) -> str:
        return "'" + n.replace("\\", "\\\\").replace("'", "\\'") + "'"

    # __all_valid__ rides the SAME stack as the rule rows (r12, guide
    # §1.2 redundant passes): the previous separate-select + union made
    # the un-materialized single-row aggregate a child of BOTH branches,
    # re-executing the full table scan twice. n_rows - f_any is bigint
    # arithmetic on bigints — same value the dedicated branch computed.
    pairs = ", ".join(
        [f"{q(n)}, f_{i}" for i, n in enumerate(rules)]
        + ["'__any_failed__', f_any", "'__all_valid__', n_rows - f_any"]
    )
    n = len(rules) + 2
    return one.selectExpr(
        f"stack({n}, {pairs}) AS (rule, n_fail)", "n_rows"
    )
