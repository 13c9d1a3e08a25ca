"""Scale-technique operators: salted agg, binned range join, sketches,
bucketed co-located joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.rangejoin import (
    binned_range_join,
    broadcast_range_join,
)
from openaq_data_pipeline_engineering_spark.operators.skew import salted_agg
from openaq_data_pipeline_engineering_spark.operators.sketch import (
    approx_distinct_profile,
    approx_quantiles,
)

SF_DIR = "/root/testdata/sf0.001"


def _events(spark):
    from openaq_data_pipeline_engineering_spark.sources.star import load_table

    return load_table(spark, SF_DIR, "events")


class TestSaltedAgg:
    def test_equals_plain_groupby(self, spark):
        ev = _events(spark)
        plain = {
            r["event_type"]: r
            for r in ev.groupBy("event_type")
            .agg(
                F.count("value").alias("n"),
                F.sum("value").alias("s"),
                F.min("value").alias("mn"),
                F.max("value").alias("mx"),
            )
            .collect()
        }
        salted = {
            r["event_type"]: r
            for r in salted_agg(
                ev,
                keys=["event_type"],
                aggs={
                    "n": ("value", "count"),
                    "s": ("value", "sum"),
                    "mn": ("value", "min"),
                    "mx": ("value", "max"),
                },
                n_salts=7,
            ).collect()
        }
        assert plain.keys() == salted.keys()
        for k in plain:
            assert plain[k]["n"] == salted[k]["n"]
            assert abs(plain[k]["s"] - salted[k]["s"]) < 1e-6
            assert plain[k]["mn"] == salted[k]["mn"]
            assert plain[k]["mx"] == salted[k]["mx"]

    def test_rejects_non_algebraic(self, spark):
        import pytest

        with pytest.raises(ValueError):
            salted_agg(_events(spark), ["event_type"], {"a": ("value", "avg")})


class TestRangeJoin:
    BANDS = [(0.0, 10.0, "low"), (10.0, 30.0, "mid"), (30.0, 1e6, "high")]

    def test_binned_equals_broadcast(self, spark):
        ev = _events(spark).select("event_id", "value")
        bands = spark.createDataFrame(self.BANDS, "lo double, hi double, band string")
        bc = broadcast_range_join(ev, bands, "value")
        binned = binned_range_join(ev, bands, "value", bin_width=7.0)
        a = {(r["event_id"], r["band"]) for r in bc.collect()}
        b = {(r["event_id"], r["band"]) for r in binned.collect()}
        assert a == b and len(a) > 0

    def test_hi_exclusive_boundary(self, spark):
        probes = spark.createDataFrame(
            [(1, 10.0), (2, 9.999)], "event_id int, value double"
        )
        bands = spark.createDataFrame(
            [(0.0, 10.0, "low"), (10.0, 20.0, "mid")],
            "lo double, hi double, band string",
        )
        for join_fn in (
            lambda: broadcast_range_join(probes, bands, "value"),
            lambda: binned_range_join(probes, bands, "value", bin_width=5.0),
        ):
            got = {r["event_id"]: r["band"] for r in join_fn().collect()}
            assert got == {1: "mid", 2: "low"}

    def test_binned_join_is_hash_not_nested_loop(self, spark):
        ev = _events(spark).select("event_id", "value")
        bands = spark.createDataFrame(self.BANDS, "lo double, hi double, band string")
        plan = (
            binned_range_join(ev, bands, "value", bin_width=7.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "HashJoin" in plan  # equi-join on bin, not BroadcastNestedLoop


class TestSketches:
    def test_approx_distinct_within_rsd(self, spark):
        ev = _events(spark)
        exact = ev.select(
            F.countDistinct("user_id").alias("u"),
            F.countDistinct("event_type").alias("t"),
        ).first()
        approx = approx_distinct_profile(ev, ["user_id", "event_type"]).first()
        assert abs(approx["user_id_distinct"] - exact["u"]) <= max(2, 0.1 * exact["u"])
        assert approx["event_type_distinct"] == exact["t"]  # tiny domain: exact

    def test_approx_quantiles_ordered_and_bounded(self, spark):
        ev = _events(spark)
        row = approx_quantiles(ev, "value").first()
        vals = [row["p25"], row["p50"], row["p75"], row["p95"], row["p99"]]
        assert vals == sorted(vals)
        lo, hi = ev.agg(F.min("value"), F.max("value")).first()
        assert lo <= vals[0] and vals[-1] <= hi


class TestBucketedJoin:
    def test_bucketed_join_has_no_shuffle(self, spark, tmp_path):
        """Pre-bucketing both sides on the join key removes the exchange:
        the 100 TB co-located-join strategy, verified on the plan."""
        from openaq_data_pipeline_engineering_spark.sources.star import load_table

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            orders = load_table(spark, SF_DIR, "orders")
            lineitem = load_table(spark, SF_DIR, "lineitem")
            for name, df, key in [
                ("t_orders_b", orders, "o_orderkey"),
                ("t_lineitem_b", lineitem, "l_orderkey"),
            ]:
                spark.sql(f"DROP TABLE IF EXISTS {name}")
                (
                    df.write.mode("overwrite")
                    .bucketBy(8, key)
                    .sortBy(key)
                    .saveAsTable(name)
                )
            joined = spark.table("t_orders_b").join(
                spark.table("t_lineitem_b"),
                F.col("o_orderkey") == F.col("l_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan
            assert joined.count() > 0
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
            spark.sql("DROP TABLE IF EXISTS t_orders_b")
            spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


class TestCompaction:
    def test_compact_reduces_file_count_preserves_rows(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.compact import (
            compact_partitions,
            file_stats,
        )
        from openaq_data_pipeline_engineering_spark.sources.star import load_table

        out = str(tmp_path / "frag")
        ev = load_table(spark, SF_DIR, "events").withColumn(
            "day_bucket", (F.col("user_id") % 2).cast("string")
        )
        # fragment: 16 files per partition
        (
            ev.repartition(16)
            .write.mode("overwrite")
            .partitionBy("day_bucket")
            .parquet(out)
        )
        before = file_stats(out)
        n_rows = spark.read.parquet(out).count()
        assert before["n_files"] >= 16

        compact_partitions(spark, out, ["day_bucket"])
        after = file_stats(out)
        assert after["n_files"] <= 2  # tiny table -> one file per partition
        back = spark.read.parquet(out)
        assert back.count() == n_rows
        # values intact, not just counts
        assert (
            back.agg(F.sum("value")).first()[0]
            == spark.read.parquet(out).agg(F.sum("value")).first()[0]
        )

    def test_partition_filter_limits_scope(self, spark, tmp_path):
        from openaq_data_pipeline_engineering_spark.operators.compact import (
            compact_partitions,
        )
        from openaq_data_pipeline_engineering_spark.sources.star import load_table

        out = str(tmp_path / "frag2")
        ev = load_table(spark, SF_DIR, "events").withColumn(
            "day_bucket", (F.col("user_id") % 2).cast("string")
        )
        ev.repartition(8).write.partitionBy("day_bucket").parquet(out)
        import glob
        import os

        d0 = glob.glob(os.path.join(out, "day_bucket=0", "*.parquet"))
        mtime0 = {f: os.path.getmtime(f) for f in d0}
        compact_partitions(
            spark, out, ["day_bucket"], partition_filter="day_bucket = '1'"
        )
        # partition 0 untouched (same files, same mtimes)
        d0_after = glob.glob(os.path.join(out, "day_bucket=0", "*.parquet"))
        assert {f: os.path.getmtime(f) for f in d0_after} == mtime0
        # partition 1 compacted to fewer files
        d1_after = glob.glob(os.path.join(out, "day_bucket=1", "*.parquet"))
        assert len(d1_after) < 8


class TestDeterministicSampling:
    def test_membership_is_layout_independent(self, spark):
        """Same rows selected regardless of partitioning — the property
        df.sample(seed=..) does NOT have, and the one that keeps
        train/eval uncontaminated across cluster resizes."""
        from openaq_data_pipeline_engineering_spark.operators.sampling import (
            deterministic_sample,
        )

        docs = _events(spark).select("event_id")
        a = {r["event_id"] for r in
             deterministic_sample(docs, "event_id", 0.3).collect()}
        b = {r["event_id"] for r in
             deterministic_sample(docs.repartition(13), "event_id", 0.3).collect()}
        assert a == b
        n = docs.count()
        assert 0.15 * n < len(a) < 0.45 * n  # roughly the asked fraction

    def test_split_disjoint_exhaustive_nested(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.sampling import (
            split_column,
        )

        docs = _events(spark).select("event_id")
        tagged = docs.withColumn("split", split_column("event_id", 0.8, 0.1))
        counts = {r["split"]: r["n"] for r in
                  tagged.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
        assert set(counts) == {"train", "val", "test"}
        assert sum(counts.values()) == docs.count()  # exhaustive + disjoint
        assert counts["train"] > counts["val"]


class TestHeavyHitters:
    def test_freq_items_contains_true_heavy_hitter(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.sketch import (
            exact_top_k,
            heavy_hitters,
        )

        ev = _events(spark)
        top = exact_top_k(ev, "event_type", 1).first()["event_type"]
        hh = heavy_hitters(ev, ["event_type"], support=0.1).first()
        assert top in hh["event_type_freqItems"]


class TestZOrder:
    def test_morton_known_values(self, spark):
        from openaq_data_pipeline_engineering_spark.functions.zorder import morton_code

        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (1, 1), (3, 3), (255, 255)], "x int, y int"
        )
        got = [r["z"] for r in df.select(morton_code("x", "y", 8).alias("z"))
               .collect()]
        assert got == [0, 1, 2, 3, 15, 65535]

    def test_zorder_improves_two_dim_clustering(self, spark):
        """Sorting by the Morton code clusters BOTH dimensions: within
        any contiguous chunk of the z-sorted order, the spread of each
        coordinate is far below the full domain (the row-group pruning
        property), unlike a (x, y) lexicographic sort where y spans the
        whole domain inside every x run."""
        import random

        from openaq_data_pipeline_engineering_spark.functions.zorder import morton_code

        rng = random.Random(7)
        pts = [(rng.randrange(256), rng.randrange(256)) for _ in range(4096)]
        df = spark.createDataFrame(pts, "x int, y int")
        z = [
            (r["x"], r["y"])
            for r in df.select("x", "y", morton_code("x", "y", 8).alias("z"))
            .orderBy("z")
            .collect()
        ]
        lex = sorted(pts)
        chunk = 256

        def chunks_overlapping(rows, dim, lo, hi):
            n = 0
            for i in range(0, len(rows), chunk):
                c = [r[dim] for r in rows[i : i + chunk]]
                if max(c) >= lo and min(c) <= hi:
                    n += 1
            return n

        n_chunks = len(z) // chunk
        # predicates on the SECOND sort dimension alone (32-wide y
        # bands): a lexicographic (x, y) sort leaves y unclustered, so
        # every chunk's min/max overlaps every band (zero pruning); the
        # z-sorted layout prunes a majority of chunks on average (bands
        # straddling a major quadrant boundary prune less — expected)
        bands = [(lo, lo + 31) for lo in (0, 32, 64, 160, 192, 224)]
        lex_total = sum(chunks_overlapping(lex, 1, *b) for b in bands)
        z_total = sum(chunks_overlapping(z, 1, *b) for b in bands)
        assert lex_total == n_chunks * len(bands)  # lex: no pruning at all
        assert z_total <= lex_total // 2           # z: >2x fewer chunks read


class TestKMeans:
    def _python_spherical_kmeans(self, vecs, k, iterations):
        """Pure-Python reference: same deterministic rules as the operator
        (init = k lowest ids, cosine assignment rounded to 6 with min-cid
        tiebreak, per-dim mean = round(sum, 6)/count)."""
        import math

        def cos(a, b):
            dot = sum(x * y for x, y in zip(a, b))
            na = math.sqrt(sum(x * x for x in a))
            nb = math.sqrt(sum(x * x for x in b))
            return round(dot / (na * nb), 6)

        cent = {i: list(vecs[i]) for i in sorted(vecs)[:k]}
        for _ in range(iterations):
            cells = {}
            for vid in sorted(vecs):
                best = max(
                    sorted(cent), key=lambda c: (cos(vecs[vid], cent[c]), -c)
                )
                cells.setdefault(best, []).append(vecs[vid])
            cent = {
                c: [
                    round(sum(v[d] for v in members), 6) / len(members)
                    for d in range(len(members[0]))
                ]
                for c, members in cells.items()
            }
        return cent

    def test_matches_python_reference(self, spark):
        import random

        from openaq_data_pipeline_engineering_spark.operators.kmeans import (
            kmeans_fit,
        )

        rng = random.Random(7)
        vecs = {
            i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(30)
        }
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id bigint, embedding array<double>",
        )
        got = {
            r["cid"]: list(r["cvec"])
            for r in kmeans_fit(df, k=3, iterations=2).collect()
        }
        want = self._python_spherical_kmeans(vecs, k=3, iterations=2)
        assert set(got) == set(want)
        for cid in want:
            for a, b in zip(got[cid], want[cid]):
                assert abs(a - b) < 1e-9

    def test_assignment_covers_all_vectors(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.kmeans import (
            assign_cells,
            kmeans_fit,
        )
        from openaq_data_pipeline_engineering_spark.sources.star import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        cent = kmeans_fit(emb, k=4, iterations=1)
        assigned = assign_cells(emb, cent)
        assert assigned.count() == emb.count()
        assert assigned.select("cell").distinct().count() <= 4


class TestSaltedJoin:
    def test_rowset_identical_to_plain_join(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.skew import salted_join

        fact = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "c")],
            "id bigint, k string",
        )
        dim = spark.createDataFrame(
            [("a", 10), ("b", 20), ("c", 30), ("d", 40)], "k string, v int"
        )
        salted = salted_join(fact, dim, key="k", n_salts=4)
        plain = fact.join(dim, "k")
        assert sorted(map(tuple, salted.collect())) == sorted(
            map(tuple, plain.collect())
        )

    def test_hot_key_spreads_over_salts(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.skew import salted_join
        from pyspark.sql import functions as F

        fact = spark.range(0, 1000).select(
            F.col("id"), F.lit("hot").alias("k")
        )
        dim = spark.createDataFrame([("hot", 1)], "k string, v int")
        out = salted_join(fact, dim, key="k", n_salts=8)
        assert out.count() == 1000
        # the fact side's salt column takes >1 distinct value on a hot key
        salted_fact = fact.withColumn(
            "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(8))
        )
        assert salted_fact.select("__salt").distinct().count() > 1


class TestTriangles:
    def test_known_graph(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.triangles import (
            count_triangles,
        )

        # K4 on {1,2,3,4} (4 triangles) + pendant 4-5 + disjoint edge 6-7
        pairs = spark.createDataFrame(
            [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7)],
            "s bigint, t bigint",
        )
        row = count_triangles(pairs).collect()[0]
        assert row["n_edges"] == 8
        assert row["n_triangles"] == 4

    def test_hub_star_has_no_triangles(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.triangles import (
            count_triangles,
        )

        # star: hub 0 to 1..20 — no triangles, and degree-ordering keeps
        # the hub's wedges at zero (all edges orient INTO the hub).
        pairs = spark.createDataFrame(
            [(0, i) for i in range(1, 21)], "s bigint, t bigint"
        )
        row = count_triangles(pairs).collect()[0]
        assert row["n_triangles"] == 0
        assert row["n_wedges"] == 0, "hub wedges must not materialize"


class TestPhysicalStrategyInvariance:
    """Results must be a function of the LOGICAL plan only: identical
    under any join strategy hint and any shuffle partition count."""

    SF = "/root/testdata/sf0.001"

    def _rows(self, df):
        return sorted(tuple(r) for r in df.collect())

    def test_join_hint_equivalence(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_engineering_spark.sources.star import load_table

        orders = load_table(spark, self.SF, "orders")
        cust = load_table(spark, self.SF, "customer")
        expected = None
        for hint in ("broadcast", "merge", "shuffle_hash"):
            joined = (
                orders.join(cust.hint(hint), orders.o_custkey == cust.c_custkey)
                .groupBy("c_mktsegment")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.min("o_orderkey").alias("first_key"),
                )
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            expect_node = {
                "broadcast": "BroadcastHashJoin",
                "merge": "SortMergeJoin",
                "shuffle_hash": "ShuffledHashJoin",
            }[hint]
            assert expect_node in plan, f"{hint} hint not honored:\n{plan[:500]}"
            rows = self._rows(joined)
            if expected is None:
                expected = rows
            else:
                assert rows == expected, f"{hint} join changed the result"

    def test_shuffle_partition_count_invariance(self, spark):
        from openaq_data_pipeline_engineering_spark.plans.registry import get_queries
        from openaq_data_pipeline_engineering_spark.streaming.ingest import (
            scoped_shuffle_partitions,
        )

        qs = get_queries()
        for name in ("flagship_daily_topk", "dedup_exact", "gap_fill_forward"):
            results = []
            for n_part in (3, 17):
                with scoped_shuffle_partitions(spark, n_part):
                    results.append(self._rows(qs[name](spark, self.SF)))
            assert results[0] == results[1], (
                f"{name}: result depends on shuffle partition count"
            )


class TestBfs:
    def test_min_distance_and_unreached(self, spark):
        from pyspark.sql import functions as F

        from openaq_data_pipeline_engineering_spark.operators.bfs import (
            bfs_distances,
        )

        # path graph 1-2-3-4-5 plus a shortcut 1-3 and isolated 9
        edges = spark.createDataFrame(
            [(1, 2), (2, 1), (2, 3), (3, 2), (3, 4), (4, 3),
             (4, 5), (5, 4), (1, 3), (3, 1)],
            "src int, dst int",
        )
        seeds = spark.createDataFrame([(1,)], "node int")
        got = {r["node"]: r["dist"]
               for r in bfs_distances(edges, seeds, max_hops=2).collect()}
        # shortcut makes 3 distance 1 (not 2); 5 is 3 hops -> unreached
        assert got == {1: 0, 2: 1, 3: 1, 4: 2}

    def test_seed_dedup_and_zero_hops(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.bfs import (
            bfs_distances,
        )

        edges = spark.createDataFrame([(1, 2), (2, 1)], "src int, dst int")
        seeds = spark.createDataFrame([(1,), (1,)], "node int")
        got = bfs_distances(edges, seeds, max_hops=0).collect()
        assert [(r["node"], r["dist"]) for r in got] == [(1, 0)]
