"""Property test: _change_rows vs a pure-Python diff model, with
random schema evolution (columns only in old, only in new, or both)."""
from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from openaq_data_pipeline_engineering_spark.operators.versioned import (
    _change_rows,
)

# rows: key -> (a, b) with a in old-only col? Model: old has cols k, a, c(old-only); new has k, a, d(new-only)
_VAL = st.one_of(st.none(), st.integers(0, 3))
_TBL = st.dictionaries(st.integers(0, 6), st.tuples(_VAL, _VAL), max_size=5)


@given(old_rows=_TBL, new_rows=_TBL, evolve=st.booleans())
@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_change_rows_matches_model(spark, old_rows, new_rows, evolve):
    # old schema: k, a, c ; new schema: k, a (+ d if evolve, dropping c)
    old = spark.createDataFrame(
        [(k, a, c) for k, (a, c) in sorted(old_rows.items())],
        "k int, a int, c int",
    )
    if evolve:
        new = spark.createDataFrame(
            [(k, a, d) for k, (a, d) in sorted(new_rows.items())],
            "k int, a int, d int",
        )
    else:
        new = spark.createDataFrame(
            [(k, a, c) for k, (a, c) in sorted(new_rows.items())],
            "k int, a int, c int",
        )
    out = _change_rows(old, new, ["k"])
    got = {}
    for r in out.collect():
        got.setdefault(r["k"], set()).add(r["_change_type"])
    # model over the aligned union schema
    expected = {}
    for k in set(old_rows) | set(new_rows):
        if k in old_rows and k not in new_rows:
            expected[k] = {"delete"}
        elif k not in old_rows and k in new_rows:
            expected[k] = {"insert"}
        else:
            a_o, c_o = old_rows[k]
            a_n, x_n = new_rows[k]
            if evolve:
                # aligned: old d = NULL, new c = NULL
                same = (a_o == a_n) and (c_o is None) and (x_n is None)
            else:
                same = (a_o, c_o) == (a_n, x_n)
            if not same:
                expected[k] = {"update_preimage", "update_postimage"}
    assert got == expected, (old_rows, new_rows, evolve)
