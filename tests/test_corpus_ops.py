"""Unit tests for corpus-prep operators: chunking, stratified
sampling, merge/upsert, SCD2 (plans/queries_corpus.py companions)."""

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.chunking import chunk_documents
from openaq_data_pipeline_engineering_spark.operators.merge import (
    cdc_apply,
    merge_upsert,
    scd2_apply,
)
from openaq_data_pipeline_engineering_spark.operators.sampling import (
    stratified_sample,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


class TestChunking:
    def test_short_doc_single_chunk(self, spark):
        df = _docs(spark, [(1, "a b c")])
        out = chunk_documents(df, chunk=4, stride=3).collect()
        assert len(out) == 1
        assert out[0]["chunk_text"] == "a b c"
        assert out[0]["chunk_tokens"] == 3

    def test_overlap_and_coverage(self, spark):
        # 10 tokens, chunk=4, stride=3 -> ceil(6/3)+1 = 3 chunks, full cover
        toks = [f"t{i}" for i in range(10)]
        df = _docs(spark, [(1, " ".join(toks))])
        out = sorted(
            chunk_documents(df, chunk=4, stride=3).collect(),
            key=lambda r: r["chunk_id"],
        )
        assert [r["chunk_text"].split(" ") for r in out] == [
            toks[0:4], toks[3:7], toks[6:10]
        ]
        assert [r["chunk_tokens"] for r in out] == [4, 4, 4]

    def test_exact_multiple_no_phantom_chunk(self, spark):
        # 7 tokens, chunk=4, stride=3 -> starts 0,3 exactly cover
        df = _docs(spark, [(1, " ".join(f"t{i}" for i in range(7)))])
        assert chunk_documents(df, chunk=4, stride=3).count() == 2

    def test_empty_doc_survives(self, spark):
        out = chunk_documents(_docs(spark, [(1, "")]), chunk=4, stride=3)
        assert out.count() == 1


class TestStratifiedSample:
    def test_exact_count_per_stratum_and_determinism(self, spark):
        rows = [(i, "s%d" % (i % 3)) for i in range(90)]
        df = spark.createDataFrame(rows, "id bigint, src string")
        a = stratified_sample(df, "id", "src", 5)
        counts = {
            r["src"]: r["n"]
            for r in a.groupBy("src").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {"s0": 5, "s1": 5, "s2": 5}
        b = stratified_sample(df.repartition(7), "id", "src", 5)
        assert sorted(r["id"] for r in a.collect()) == sorted(
            r["id"] for r in b.collect()
        )

    def test_small_stratum_keeps_all(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, "b")], "id bigint, src string"
        )
        out = stratified_sample(df, "id", "src", 10)
        assert out.count() == 3


class TestMerge:
    def _tables(self, spark):
        base = spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "z")], "k bigint, v string"
        )
        upd = spark.createDataFrame(
            [(2, "Y2"), (4, "W")], "k bigint, v string"
        )
        return base, upd

    def test_upsert_replaces_and_inserts(self, spark):
        base, upd = self._tables(spark)
        got = {
            r["k"]: r["v"] for r in merge_upsert(base, upd, ["k"]).collect()
        }
        assert got == {1: "x", 2: "Y2", 3: "z", 4: "W"}

    def test_scd2_versions(self, spark):
        base, upd = self._tables(spark)
        rows = {
            (r["k"], r["version"], r["is_current"]): r["v"]
            for r in scd2_apply(base, upd, ["k"]).collect()
        }
        assert rows == {
            (2, 1, False): "y",    # closed-out old version
            (1, 1, True): "x",     # untouched
            (3, 1, True): "z",
            (2, 2, True): "Y2",    # updated -> v2 current
            (4, 1, True): "W",     # insert -> v1 current
        }

    def test_scd2_current_view_equals_upsert(self, spark):
        base, upd = self._tables(spark)
        cur = (
            scd2_apply(base, upd, ["k"])
            .filter("is_current")
            .select("k", "v")
        )
        ups = merge_upsert(base, upd, ["k"])
        assert sorted(map(tuple, cur.collect())) == sorted(
            map(tuple, ups.collect())
        )

    def test_cdc_apply_latest_wins_with_tombstones(self, spark):
        base, _ = self._tables(spark)
        changes = spark.createDataFrame(
            [
                # k=2: update then later delete -> gone
                (2, "Y2", "U", 1),
                (2, None, "D", 2),
                # k=3: delete then later re-insert -> new value wins
                (3, None, "D", 1),
                (3, "Z2", "U", 2),
                # k=4: insert of a new key
                (4, "W", "U", 1),
                # k=5: delete of an absent key -> no-op
                (5, None, "D", 1),
            ],
            "k bigint, v string, op string, seq int",
        )
        got = {
            r["k"]: r["v"]
            for r in cdc_apply(base, changes, ["k"]).collect()
        }
        assert got == {1: "x", 3: "Z2", 4: "W"}

    def test_cdc_apply_delete_outranks_upsert_at_equal_seq(self, spark):
        base, _ = self._tables(spark)
        changes = spark.createDataFrame(
            [(1, "X2", "U", 7), (1, None, "D", 7)],
            "k bigint, v string, op string, seq int",
        )
        got = {
            r["k"]: r["v"]
            for r in cdc_apply(base, changes, ["k"]).collect()
        }
        assert got == {2: "y", 3: "z"}


class TestPageRank:
    def test_matches_python_reference(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.pagerank import (
            DAMP_NUM, SCALE, TELEPORT_NUM, pagerank, undirect,
        )

        # triangle + pendant: 1-2, 2-3, 1-3, 3-4
        pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
        edges = undirect(
            spark.createDataFrame(pairs, "src bigint, dst bigint")
        )
        got = {
            r["node"]: r["pr"] for r in pagerank(edges, iterations=3).collect()
        }

        adj, deg = {}, {}
        for s, t in pairs:
            adj.setdefault(s, []).append(t)
            adj.setdefault(t, []).append(s)
        deg = {n: len(ns) for n, ns in adj.items()}
        pr = {n: SCALE for n in adj}
        for _ in range(3):
            nxt = {}
            for n, ns in adj.items():
                s = sum(pr[m] // deg[m] for m in ns)
                nxt[n] = TELEPORT_NUM + (DAMP_NUM * s) // SCALE
            pr = nxt
        assert got == pr
        # pendant node (deg 1) must rank below the triangle hub (node 3)
        assert got[4] < got[3]
