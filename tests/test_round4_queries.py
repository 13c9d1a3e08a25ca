"""Semantic property tests for the round-4 declared queries
(plans/queries_round4.py) — planted signals and layout independence,
complementing the DuckDB differential check (which proves cross-engine
value equality but not that the statistic detects what it claims to).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.plans.registry import QUERIES, _load_all

SF_DIR = "/root/testdata/sf0.001"

_load_all()


class TestCusum:
    def _planted(self, spark, low_first: bool):
        # Two shapes: low→high (deviations start NEGATIVE — running min
        # moves below 0) and high→low (deviations start POSITIVE — the
        # running min of s_t never goes below 0, so only the
        # least(0, min) clamp reproduces max(0, S+dev) on early days).
        rows = []
        eid = 0
        for day in range(60):
            if low_first:
                n = 10 if day < 30 else 50
            else:
                n = 50 if day < 30 else 10
            for _ in range(n):
                rows.append((eid, f"2024-01-{1:02d}", day, "probe"))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, base string, day int, event_type string"
        ).select(
            "event_id",
            "event_type",
            F.expr("timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,day)").alias(
                "ts"
            ),
            F.lit(1.0).alias("value"),
            F.lit(0).cast("long").alias("user_id"),
            F.lit("{}").alias("props"),
        )
        daily = df.groupBy(
            "event_type", F.col("ts").cast("date").alias("d")
        ).agg(F.count(F.lit(1)).alias("n"))
        stats = daily.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n_days"), F.sum("n").alias("total")
        )
        w = (
            Window.partitionBy("event_type")
            .orderBy("d")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        walk = daily.join(stats, on="event_type").withColumn(
            "s_t",
            F.sum(F.col("n") * F.col("n_days") - F.col("total")).over(w),
        )
        zero_clamped_min = F.least(F.lit(0), F.min("s_t").over(w))
        return walk.withColumn("drawup", F.col("s_t") - zero_clamped_min)

    def test_detects_planted_level_shift(self, spark):
        # 30 days at 10 events/day, then 30 at 50/day: the CUSUM drawup
        # must peak at the last day (monotone rise after the shift).
        walk = self._planted(spark, low_first=True)
        top = walk.orderBy(F.desc("drawup"), "d").first()
        last_day = walk.agg(F.max("d")).first()[0]
        assert top["d"] == last_day and top["drawup"] > 0

    def test_clamped_recurrence_equivalence_both_shapes(self, spark):
        # C_t - min(0, min C_k) == the sequential max(0, S+dev) walk, on
        # BOTH planted shapes — the high→low shape (positive first
        # deviations) fails without the virtual-0 in the running min.
        for low_first in (True, False):
            pdf = (
                self._planted(spark, low_first=low_first)
                .orderBy("d")
                .toPandas()
            )
            clamped = 0
            for _, r in pdf.iterrows():
                dev = r["n"] * r["n_days"] - r["total"]
                clamped = max(0, clamped + dev)
                assert clamped == r["drawup"], f"{low_first} {r['d']}"


class TestPrioritySample:
    def test_layout_independent(self, spark):
        q = QUERIES["priority_sample_topk"].fn
        base = {tuple(r) for r in q(spark, SF_DIR).collect()}
        # Same query over a repartitioned copy must select the same set
        # (the md5 keys depend only on values, never on layout).
        from openaq_data_pipeline_engineering_spark.sources.star import load_table

        o = load_table(spark, SF_DIR, "orders").repartition(13)
        u = (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            + 1
        )
        w = F.floor(F.col("o_totalprice") * 100).cast("bigint")
        again = {
            tuple(r)
            for r in (
                o.select(
                    "o_orderkey",
                    w.alias("weight_cents"),
                    (w.cast("double") / u).alias("priority"),
                )
                .orderBy(F.desc("priority"), "o_orderkey")
                .limit(20)
                .collect()
            )
        }
        assert base == again

    def test_weights_bias_selection(self, spark):
        # With equal uniforms, higher weight => higher priority: the
        # max-weight row of any hash-tie-free sample must outrank a
        # zero-ish weight row. Sanity: every selected weight > 0.
        rows = QUERIES["priority_sample_topk"].fn(spark, SF_DIR).collect()
        assert len(rows) == 20
        assert all(r["weight_cents"] > 0 for r in rows)
        assert all(r["priority"] > 0 for r in rows)


class TestGiniDiversity:
    def test_extremes(self, spark):
        docs = spark.createDataFrame(
            [
                (1, "a a a a a a a a", "en", "s", 15),
                (2, "a b c d e f g h", "en", "s", 15),
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        )
        tok = docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("w")
        )
        c = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("cnt"))
        out = {
            r["doc_id"]: r
            for r in c.groupBy("doc_id")
            .agg(
                F.sum("cnt").alias("n_tokens"),
                F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"),
            )
            .select(
                "doc_id",
                F.expr(
                    "CAST(1000000 - (1000000 * sum_sq) "
                    "div (n_tokens * n_tokens) AS BIGINT)"
                ).alias("gini_ppm"),
            )
            .collect()
        }
        assert out[1]["gini_ppm"] == 0  # all-identical tokens
        assert out[2]["gini_ppm"] == 875_000  # 1 - 8/64


class TestRrfFusion:
    def test_rank_consistency(self, spark):
        rows = QUERIES["rrf_fusion_topk"].fn(spark, SF_DIR).collect()
        by_q: dict = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, lst in by_q.items():
            lst.sort(key=lambda r: r["fused_rank"])
            assert [r["fused_rank"] for r in lst] == list(
                range(1, len(lst) + 1)
            )
            # fused order is by rrf_ppb desc (ties by neighbor)
            ppbs = [r["rrf_ppb"] for r in lst]
            assert ppbs == sorted(ppbs, reverse=True)
            # score formula holds row-by-row
            for r in lst:
                assert (
                    r["rrf_ppb"]
                    == 10**9 // (60 + r["r_cos"]) + 10**9 // (60 + r["r_dot"])
                )


class TestShardBalance:
    def test_buckets_cover_and_sum(self, spark):
        rows = QUERIES["shard_balance_report"].fn(spark, SF_DIR).collect()
        assert {r["bucket"] for r in rows} <= set(range(32))
        total = sum(r["n_rows"] for r in rows)
        from openaq_data_pipeline_engineering_spark.sources.star import load_table

        assert total == load_table(spark, SF_DIR, "lineitem").count()
        # ppm shares sum to ~1e6 (floor rounding loses < 32 ppm)
        ppm = sum(r["share_ppm"] for r in rows)
        assert 1_000_000 - 32 <= ppm <= 1_000_000


class TestAudienceOverlap:
    def test_symmetric_bounds(self, spark):
        rows = QUERIES["audience_overlap_matrix"].fn(spark, SF_DIR).collect()
        for r in rows:
            assert r["type_a"] < r["type_b"]
            assert 0 < r["inter_size"] <= r["union_size"]


class TestGroupwiseOls:
    def test_slope_matches_fraction(self, spark):
        for r in QUERIES["groupwise_ols_slopes"].fn(spark, SF_DIR).collect():
            assert r["slope_den"] > 0
            assert r["slope"] == r["slope_num"] / r["slope_den"]


class TestNucleusCutoff:
    def test_cutoff_bounds(self, spark):
        for r in QUERIES["nucleus_vocab_cutoff"].fn(spark, SF_DIR).collect():
            assert 1 <= r["nucleus_size"] <= r["n_next"]
            assert r["total"] >= 50


class TestMinhashEstimate:
    def test_estimate_tracks_exact(self, spark):
        rows = QUERIES["minhash_estimate_error"].fn(spark, SF_DIR).collect()
        assert rows, "sf0.001 corpus has planted near-dups"
        for r in rows:
            assert 0 <= r["n_agree"] <= 8
            assert 0 <= r["inter_size"] <= r["union_size"]
        # Aggregate sanity: mean estimated Jaccard within 0.35 of mean
        # exact Jaccard over the candidate set (8 hashes is coarse; the
        # bound just catches sign/indexing bugs, not sketch variance).
        est = sum(r["n_agree"] / 8 for r in rows) / len(rows)
        exact = sum(r["inter_size"] / r["union_size"] for r in rows) / len(rows)
        assert abs(est - exact) < 0.35


class TestSessionWindowBatch:
    def test_exact_gap_boundary_merges(self, spark):
        # Planted boundary semantics for the round-5 oracle: an event
        # at EXACTLY last + gap MERGES into the session (so the
        # gaps-and-islands boundary is `> gap`, not `>= gap`); one
        # microsecond past the gap splits. The reported window end is
        # last event + gap.
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("2024-01-01 00:00:00",),
             ("2024-01-01 00:30:00",),          # exactly 1800s later
             ("2024-01-01 01:00:00.000001",)],  # 1800s + 1us after
            "ts string",
        ).select(F.lit(7).alias("uid"), F.col("ts").cast("timestamp").alias("ts"))
        sessions = (
            df.groupBy("uid", F.session_window("ts", "30 minutes"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("session_window.start")
            .collect()
        )
        assert [r["n"] for r in sessions] == [2, 1]
        first = sessions[0]["session_window"]
        assert str(first.end) == "2024-01-01 01:00:00"  # last + gap
