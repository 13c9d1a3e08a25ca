"""Unit tests: as-of join, sessionization, rollup, feature extraction."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.asof import asof_join
from openaq_data_pipeline_engineering_spark.operators.multimodal import (
    extract_features,
    md5_features,
    resize_images,
    with_binary_payload,
)
from openaq_data_pipeline_engineering_spark.operators.sessionize import (
    session_stats,
    sessionize,
)


def _ts(h, m=0, s=0):
    return dt.datetime(2026, 1, 1, h, m, s)


class TestAsofJoin:
    def _frames(self, spark):
        quotes = spark.createDataFrame(
            [
                (1, _ts(9), 100.0, 1),
                (1, _ts(11), 110.0, 2),
                (1, _ts(11), 111.0, 3),  # same-ts tie: max tiebreaker wins
                (2, _ts(10), 200.0, 4),
            ],
            "user_id int, ts timestamp, value double, event_id int",
        )
        probes = spark.createDataFrame(
            [
                (1, _ts(10), 90, 0.5),   # between quotes -> 100.0
                (1, _ts(11), 91, 0.6),   # exactly at quote ts -> 111.0 (<=, max id)
                (1, _ts(8), 92, 0.7),    # before any quote -> null
                (2, _ts(12), 93, 0.8),   # other key -> 200.0
                (3, _ts(12), 94, 0.9),   # key with no quotes -> null
            ],
            "user_id int, ts timestamp, event_id int, value double",
        )
        return probes, quotes

    def test_semantics(self, spark):
        probes, quotes = self._frames(spark)
        out = asof_join(
            probes, quotes, on=["user_id"], ts_col="ts",
            value_cols=["value"], tiebreaker="event_id",
        )
        got = {r["event_id"]: r["value_asof"] for r in out.collect()}
        assert got == {90: 100.0, 91: 111.0, 92: None, 93: 200.0, 94: None}

    def test_probe_columns_preserved(self, spark):
        probes, quotes = self._frames(spark)
        out = asof_join(
            probes, quotes, on=["user_id"], ts_col="ts",
            value_cols=["value"], tiebreaker="event_id",
        )
        assert set(out.columns) == {"user_id", "ts", "event_id", "value", "value_asof"}
        assert out.count() == probes.count()
        # probe's own 'value' column survives untouched
        vals = {r["event_id"]: r["value"] for r in out.collect()}
        assert vals[90] == 0.5


class TestSessionize:
    def _events(self, spark):
        return spark.createDataFrame(
            [
                (1, _ts(9, 0), 1),
                (1, _ts(9, 10), 2),    # 10 min gap: same session
                (1, _ts(10, 0), 3),    # 50 min gap: new session
                (1, _ts(10, 20), 4),
                (2, _ts(9, 0), 5),     # separate key
            ],
            "user_id int, ts timestamp, event_id int",
        )

    def test_session_index(self, spark):
        out = sessionize(
            self._events(spark), "user_id", "ts",
            gap_seconds=1800, order_tiebreaker="event_id",
        )
        got = {r["event_id"]: r["session_idx"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}

    def test_session_stats(self, spark):
        out = session_stats(
            self._events(spark), "user_id", "ts",
            gap_seconds=1800, order_tiebreaker="event_id",
        )
        rows = {(r["user_id"], r["session_idx"]): r for r in out.collect()}
        assert rows[(1, 1)]["n_events"] == 2
        assert rows[(1, 1)]["duration_s"] == 600.0
        assert rows[(1, 2)]["n_events"] == 2
        assert rows[(2, 1)]["n_events"] == 1
        assert rows[(2, 1)]["duration_s"] == 0.0

    def test_exact_gap_boundary_same_session(self, spark):
        # gap == gap_seconds is NOT a new session (strict >)
        ev = spark.createDataFrame(
            [(1, _ts(9, 0), 1), (1, _ts(9, 30), 2)],
            "user_id int, ts timestamp, event_id int",
        )
        out = sessionize(ev, "user_id", "ts", gap_seconds=1800,
                         order_tiebreaker="event_id")
        assert {r["session_idx"] for r in out.collect()} == {1}


class TestFeatureExtraction:
    def test_md5_features_deterministic_and_bounded(self):
        f = md5_features(b"hello world")
        assert f == md5_features(b"hello world")
        assert len(f) == 8
        assert all(0.0 <= x <= 1.0 for x in f)

    def test_extract_features_matches_local(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha"), (2, "beta")], "doc_id long, text string"
        )
        out = extract_features(with_binary_payload(df, "text")).collect()
        by_id = {r["doc_id"]: r for r in out}
        expect = md5_features(b"alpha")
        got = [by_id[1][f"f{i}"] for i in range(8)]
        assert got == expect

    def test_resize_flags_undecodable_payload(self, spark):
        df = spark.createDataFrame([(1, b"x")], "doc_id long, payload binary")
        row = resize_images(df, 64, 64).first()
        assert row.payload is None and row.error is not None


class TestRollupPlan:
    def test_rollup_single_shuffle(self, spark):
        # ROLLUP must compile to one Expand + hash agg, not N queries.
        df = spark.createDataFrame(
            [("a", 1, 1.0), ("b", 2, 2.0)], "k string, b int, v double"
        )
        plan = (
            df.rollup("k", "b")
            .agg(F.sum("v"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Expand" in plan
        assert plan.count("Exchange") <= 2


class TestAsofJoinMultiValue:
    def test_multiple_value_cols_and_suffix(self, spark):
        import datetime as dt

        quotes = spark.createDataFrame(
            [(1, dt.datetime(2026, 1, 1, 9), 100.0, 55.0, 1),
             (1, dt.datetime(2026, 1, 1, 11), 110.0, 66.0, 2)],
            "user_id int, ts timestamp, bid double, ask double, event_id int",
        )
        probes = spark.createDataFrame(
            [(1, dt.datetime(2026, 1, 1, 10), 7)],
            "user_id int, ts timestamp, event_id int",
        )
        out = asof_join(
            probes, quotes, on=["user_id"], ts_col="ts",
            value_cols=["bid", "ask"], tiebreaker="event_id", suffix="_q",
        ).first()
        assert out["bid_q"] == 100.0 and out["ask_q"] == 55.0
        assert set(out.asDict()) == {"user_id", "ts", "event_id", "bid_q", "ask_q"}

    def test_null_fields_in_latest_quote_stay_atomic(self, spark):
        """The carried quote is one ROW: a NULL field in the latest quote
        must come through as NULL, not backfilled from an older quote."""
        import datetime as dt

        quotes = spark.createDataFrame(
            [(1, dt.datetime(2026, 1, 1, 9), 100.0, 55.0, 1),
             (1, dt.datetime(2026, 1, 1, 10), 110.0, None, 2)],
            "user_id int, ts timestamp, bid double, ask double, event_id int",
        )
        probes = spark.createDataFrame(
            [(1, dt.datetime(2026, 1, 1, 11), 7)],
            "user_id int, ts timestamp, event_id int",
        )
        out = asof_join(
            probes, quotes, on=["user_id"], ts_col="ts",
            value_cols=["bid", "ask"], tiebreaker="event_id",
        ).first()
        assert out["bid_asof"] == 110.0
        assert out["ask_asof"] is None  # NOT 55.0 from the older quote


class TestEventFunnelOrdering:
    """The funnel requires stage ORDER: a click before the first view
    must not count, and a purchase before the first qualifying click
    must not count. Runs the declared query over a synthetic events
    table to pin the ordering semantics the oracle also encodes."""

    def _run(self, spark, tmp_path, rows):
        import pyarrow as pa
        import pyarrow.parquet as pq

        base = 1_700_000_000_000_000
        table = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [base + h * 3_600_000_000 for _, h, _ in rows],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
                "event_type": pa.array([t for _, _, t in rows], pa.string()),
                "value": pa.array([1.0] * len(rows), pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        import os

        d = str(tmp_path / "fev")
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, os.path.join(d, "events.parquet"))
        from openaq_data_pipeline_engineering_spark.plans.queries_warehouse import (
            event_funnel,
        )

        return event_funnel(spark, d).first()

    def test_out_of_order_stages_do_not_count(self, spark, tmp_path):
        rows = [
            # user 1: click(h1) BEFORE view(h2) -> click doesn't qualify
            (1, 1, "click"), (1, 2, "view"),
            # user 2: purchase(h1) before view(h2)->click(h3): no purchase
            (2, 1, "purchase"), (2, 2, "view"), (2, 3, "click"),
            # user 3: full ordered chain
            (3, 1, "view"), (3, 2, "click"), (3, 3, "purchase"),
        ]
        out = self._run(spark, tmp_path, rows)
        assert out["n_view"] == 3
        assert out["n_view_click"] == 2   # users 2 and 3
        assert out["n_view_click_purchase"] == 1  # user 3 only

    def test_same_timestamp_counts_as_after(self, spark, tmp_path):
        rows = [(1, 5, "view"), (1, 5, "click"), (1, 5, "purchase")]
        out = self._run(spark, tmp_path, rows)
        assert out["n_view"] == 1
        assert out["n_view_click"] == 1
        assert out["n_view_click_purchase"] == 1


class TestGapFillForward:
    """Calendar-spine gap fill: a missing middle day appears in the
    spine with observed=0 and carries the previous day's sum forward."""

    def test_gap_days_filled_forward(self, spark, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        day_us = 86_400_000_000
        base = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC
        # user 1: values on Jan 1 and Jan 4; Jan 2-3 are gaps.
        rows = [(1, 0, 10.0), (1, 3 * day_us, 5.0)]
        table = pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array(
                    [base + off for _, off, _ in rows], pa.timestamp("us")
                ),
                "user_id": pa.array([u for u, _, _ in rows], pa.int64()),
                "event_type": pa.array(["view"] * len(rows), pa.string()),
                "value": pa.array([v for _, _, v in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows), pa.string()),
            }
        )
        d = str(tmp_path / "gapev")
        os.makedirs(d, exist_ok=True)
        pq.write_table(table, os.path.join(d, "events.parquet"))
        from openaq_data_pipeline_engineering_spark.plans.queries_warehouse import (
            gap_fill_forward,
        )

        out = sorted(
            gap_fill_forward(spark, d).collect(), key=lambda r: str(r["day"])
        )
        assert [str(r["day"]) for r in out] == [
            "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
        ]
        assert [r["observed"] for r in out] == [1, 0, 0, 1]
        assert [r["filled_sum"] for r in out] == [10.0, 10.0, 10.0, 5.0]


class TestAsofDirections:
    """forward picks the earliest STRICTLY-later quote (equal-ts quotes
    belong to backward under the shared sort); nearest prefers the
    smaller time delta, backward on ties."""

    def _frames(self, spark):
        quotes = spark.createDataFrame(
            [
                (1, _ts(9), 100.0, 1),
                (1, _ts(11), 110.0, 2),
                (1, _ts(11), 111.0, 3),
                (2, _ts(10), 200.0, 4),
            ],
            "user_id int, ts timestamp, value double, event_id int",
        )
        probes = spark.createDataFrame(
            [
                (1, _ts(10), 90, 0.5),   # 9h behind=1h, 11h ahead=1h
                (1, _ts(11), 91, 0.6),   # equal ts
                (1, _ts(8), 92, 0.7),    # before any quote
                (1, _ts(12), 93, 0.8),   # after all quotes
                (2, _ts(12), 94, 0.9),
            ],
            "user_id int, ts timestamp, event_id int, value double",
        )
        return probes, quotes

    def _got(self, spark, direction):
        probes, quotes = self._frames(spark)
        out = asof_join(
            probes, quotes, on=["user_id"], ts_col="ts",
            value_cols=["value"], tiebreaker="event_id",
            direction=direction,
        )
        return {r["event_id"]: r["value_asof"] for r in out.collect()}

    def test_forward(self, spark):
        # equal-ts quotes are NOT forward matches; min tiebreaker wins
        assert self._got(spark, "forward") == {
            90: 110.0,  # earliest ts>10h is 11h; min event_id -> 110.0
            91: None,   # nothing strictly after 11h
            92: 100.0,
            93: None,
            94: None,
        }

    def test_nearest(self, spark):
        assert self._got(spark, "nearest") == {
            90: 100.0,  # 1h back vs 1h forward: tie -> backward
            91: 111.0,  # delta 0 backward
            92: 100.0,  # only forward exists
            93: 111.0,  # only backward exists
            94: 200.0,
        }

    def test_bad_direction_raises(self, spark):
        probes, quotes = self._frames(spark)
        import pytest as _pytest

        with _pytest.raises(ValueError):
            asof_join(
                probes, quotes, on=["user_id"], ts_col="ts",
                value_cols=["value"], tiebreaker="event_id",
                direction="sideways",
            )
