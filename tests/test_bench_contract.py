"""bench.py driver contract: the final stdout JSON line must survive
the round driver's 2,000-char stdout-tail capture (it records only the
tail, and an overflowing line is silently never parsed — observed in
rounds 1-3). No Spark needed: this pins the summary-line builder.
"""

from __future__ import annotations

import json

import bench
from openaq_data_pipeline_engineering_spark.plans.registry import (
    get_oracles,
    get_queries,
)


def _fake_timings(names) -> dict[str, float]:
    # Worst-case widths: 4-digit seconds with 3 decimals for every query.
    return {n: 9999.999 for n in names}


class TestSummaryLine:
    def test_full_declared_suite_fits_tail_capture(self):
        """The REAL declared query names (the widest input the builder
        will ever see) produce a line under the driver's capture cap."""
        names = sorted(get_queries())
        assert len(names) >= 259  # the suite only grows
        line = bench.build_summary_line(
            _fake_timings(names), total=99999.999, runs=2, cpus=32, sf="0.1"
        )
        assert len(line) <= 1900
        parsed = json.loads(line)
        assert parsed["metric"] == "declared_query_suite_wall_clock"
        assert parsed["n_queries"] == len(names)
        # Aggregates survive even when per-query entries are dropped.
        for key in ("value", "median_sec", "p95_sec", "detail"):
            assert key in parsed

    def test_headline_entries_carried_when_room(self):
        names = sorted(get_queries())
        line = bench.build_summary_line(
            _fake_timings(names), total=1.0, runs=2, cpus=32, sf="0.1"
        )
        parsed = json.loads(line)
        # With realistic name lengths all HEADLINE entries should fit.
        assert set(parsed["queries"]) == {
            h for h in bench.HEADLINE if h in names
        }

    def test_pathological_names_still_emit_parseable_line(self):
        """1,000 synthetic 60-char names: the builder drops per-query
        entries rather than overflowing, and still asserts the floor."""
        names = [f"q_{'x' * 58}_{i:04d}" for i in range(1000)]
        line = bench.build_summary_line(
            _fake_timings(names), total=5.0, runs=2, cpus=32, sf="0.1"
        )
        assert len(line) <= 1900
        assert json.loads(line)["n_queries"] == 1000

    def test_headline_names_are_declared(self):
        """A renamed/retired query must be pulled from HEADLINE too,
        or the parsed artifact silently loses its profile row."""
        names = set(get_queries())
        missing = [h for h in bench.HEADLINE if h not in names]
        assert not missing, f"HEADLINE references unknown queries: {missing}"

    def test_every_query_has_oracle_or_rowsonly_marker(self):
        """queries() and oracle_sql() stay aligned (driver gate shape)."""
        assert set(get_oracles()) <= set(get_queries())


class TestProvenanceStamp:
    def test_summary_line_carries_loadavg_and_context(self):
        names = sorted(get_queries())
        line = bench.build_summary_line(
            _fake_timings(names), total=1.0, runs=2, cpus=32, sf="0.1",
            provenance={"loadavg": [1.0, 2.0, 3.0], "context": "solo"},
        )
        parsed = json.loads(line)
        assert parsed["loadavg"] == [1.0, 2.0, 3.0]
        assert parsed["context"] == "solo"
        assert parsed["detail"] == "BENCH_DETAIL.json"

    def test_driver_context_writes_separate_detail_file(self, monkeypatch):
        # The round driver sets no context env -> 'driver' -> the detail
        # map goes to BENCH_DETAIL_DRIVER.json, never overwriting the
        # committed quiet-run BENCH_DETAIL.json (VERDICT r7 #7).
        monkeypatch.delenv("SPARK_GRAFT_BENCH_CONTEXT", raising=False)
        prov = bench.run_provenance()
        assert prov["context"] == "driver"
        assert bench.detail_file_name(prov["context"]) == (
            "BENCH_DETAIL_DRIVER.json"
        )
        monkeypatch.setenv("SPARK_GRAFT_BENCH_CONTEXT", "solo")
        prov = bench.run_provenance()
        assert prov["context"] == "solo"
        assert bench.detail_file_name("solo") == "BENCH_DETAIL.json"
        assert len(prov["loadavg"]) == 3
