"""Driver-evidence rotation: stalest greens first (VERDICT r7 #2)."""

from __future__ import annotations

from openaq_data_pipeline_engineering_spark.plans import registry


def test_greens_ordered_by_evidence_age():
    prior = registry._latest_correctness()
    names = registry._ordered_names()

    def green_round(n):
        row = prior.get(n)
        if row and row.get("hash_match") is True:
            return row.get("_round", 0)
        return None

    rounds = [green_round(n) for n in names]
    # fresh (never-green) names lead ...
    k = 0
    while k < len(rounds) and rounds[k] is None:
        k += 1
    tail = rounds[k:]
    # ... and the green tail is non-decreasing in evidence round
    assert all(r is not None for r in tail)
    assert tail == sorted(tail)


def test_every_declared_query_still_registered():
    names = registry._ordered_names()
    assert len(names) == len(set(names)) == len(registry.QUERIES)
