"""Text-extension tests: near-dup detection actually detects planted
near-duplicates (the declared queries prove engine parity; these prove
the algorithms do their job)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.functions.text import (
    bpe_token_estimate,
    lang_predict,
    quality_score,
    whitespace_token_count,
    word_shingles,
    minhash_agg_exprs,
)


BASE = (
    "the quick brown fox jumps over the lazy dog and runs far into the woods "
    "while the hunter watches from the hill near the old river bend at dawn"
)


def docs_fixture(spark):
    rows = [
        (1, BASE),
        (2, BASE.replace("dawn", "dusk")),      # near-dup of 1
        (3, "completely different text about spark query engines and shuffles joining aggregating columns"),
        (4, BASE),                              # exact dup of 1
        (5, "el la los un una palabras el la espanol texto el la aqui"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_token_counts(spark):
    df = docs_fixture(spark).select(
        "doc_id",
        whitespace_token_count("text").alias("wc"),
        bpe_token_estimate("text").alias("bpe"),
    )
    row = {r.doc_id: r for r in df.collect()}
    assert row[1].wc == len(BASE.split())
    assert row[1].bpe == -(-len(BASE) // 4)


def test_quality_score_monotone_in_length(spark):
    df = docs_fixture(spark).select("doc_id", quality_score("text").alias("q"))
    q = {r.doc_id: r.q for r in df.collect()}
    assert q[1] > q[5]  # longer doc scores higher
    assert 0 <= q[5] < 1


def test_lang_predict_markers(spark):
    df = docs_fixture(spark).select("doc_id", lang_predict("text").alias("lang"))
    got = {r.doc_id: r.lang for r in df.collect()}
    assert got[1] == "en"
    assert got[5] == "es"


def test_word_shingles_short_doc_guard(spark):
    df = spark.createDataFrame([(1, "one two"), (2, "one two three four")], ["id", "t"])
    out = {r.id: r.sh for r in df.select("id", word_shingles("t", 3).alias("sh")).collect()}
    assert out[1] == []  # < k tokens → empty, not a descending-sequence bug
    assert out[2] == ["one two three", "two three four"]


def test_minhash_lsh_finds_planted_near_dups(spark):
    docs = docs_fixture(spark)
    sh = docs.select("doc_id", F.explode(word_shingles("text", 3)).alias("sh"))
    mh = sh.groupBy("doc_id").agg(*minhash_agg_exprs("sh", 8))
    bands = mh.select(
        "doc_id",
        F.explode(
            F.array(
                F.md5(F.concat("h0", "h1")),
                F.md5(F.concat("h2", "h3")),
                F.md5(F.concat("h4", "h5")),
                F.md5(F.concat("h6", "h7")),
            )
        ).alias("band"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = {
        (r.doc_a, r.doc_b)
        for r in a.join(
            b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id"))
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .collect()
    }
    assert (1, 4) in pairs            # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup shares most shingles
    assert all(3 not in p for p in pairs)      # unrelated doc never pairs
    assert all(5 not in p for p in pairs)


def test_rolling_hash_order_sensitive(spark):
    from openaq_data_pipeline_engineering_spark.functions.text import rolling_hash

    df = spark.createDataFrame(
        [(1, "the quick fox"), (2, "fox quick the"), (3, "the quick fox")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["h"] for r in
           df.select("doc_id", rolling_hash("text").alias("h")).collect()}
    assert got[1] == got[3]          # identical text -> identical hash
    assert got[1] != got[2]          # transposed words -> different hash


def test_regex_token_count_symbols(spark):
    from openaq_data_pipeline_engineering_spark.functions.text import regex_token_count

    df = spark.createDataFrame([(1, "Hello, world! x2"), (2, "")],
                               "doc_id int, text string")
    got = {r["doc_id"]: r["n"] for r in
           df.select("doc_id", regex_token_count("text").alias("n")).collect()}
    assert got[1] == 5  # Hello , world ! x2
    assert got[2] == 0


def test_pii_scrub(spark):
    from openaq_data_pipeline_engineering_spark.functions.text import (
        pii_count,
        scrub_pii,
    )

    df = spark.createDataFrame(
        [(1, "mail me at jo.doe+x@test.org or call 555-123-4567 ok"),
         (2, "nothing here")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", pii_count("text").alias("n"), scrub_pii("text").alias("s")
    ).collect()}
    assert out[1]["n"] == 2
    assert "<EMAIL>" in out[1]["s"] and "<PHONE>" in out[1]["s"]
    assert "test.org" not in out[1]["s"] and "555" not in out[1]["s"]
    assert out[2]["n"] == 0 and out[2]["s"] == "nothing here"


def test_repetition_ratio(spark):
    from openaq_data_pipeline_engineering_spark.functions.text import repetition_ratio

    df = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words here differ"), (3, "")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["r"] for r in
           df.select("doc_id", repetition_ratio("text").alias("r")).collect()}
    assert got[1] == 1.0
    assert got[2] == 0.25
    assert got[3] == 0.0


def test_stopword_ratio(spark):
    from openaq_data_pipeline_engineering_spark.functions.text import stopword_ratio

    df = spark.createDataFrame(
        [(1, "x the y and z of w"), (2, "foo bar baz"), (3, "")],
        "doc_id int, text string",
    )
    got = {r["doc_id"]: r["s"] for r in
           df.select("doc_id", stopword_ratio("text").alias("s")).collect()}
    assert got[1] == 3 / 7
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_minhash_jaccard_estimate_extremes(spark):
    """MinHash signature agreement estimates Jaccard: identical docs
    agree on every component; disjoint-vocabulary docs on none."""
    from pyspark.sql import functions as F

    from openaq_data_pipeline_engineering_spark.functions.text import (
        minhash_agg_exprs,
        word_shingles,
    )

    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "one two three four five six seven eight"
    df = spark.createDataFrame(
        [(1, a), (2, a), (3, b)], "doc_id int, text string"
    )
    sh = df.select("doc_id", F.explode(word_shingles("text", 3)).alias("sh"))
    mh = {r["doc_id"]: [r[f"h{i}"] for i in range(8)]
          for r in sh.groupBy("doc_id").agg(*minhash_agg_exprs("sh", 8)).collect()}

    agree = lambda x, y: sum(1 for i in range(8) if mh[x][i] == mh[y][i]) / 8  # noqa: E731
    assert agree(1, 2) == 1.0   # identical docs: estimate J = 1
    assert agree(1, 3) == 0.0   # disjoint shingle sets: estimate J = 0


class TestConnectedComponents:
    def test_chain_and_separate_components(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.cluster import (
            connected_components,
        )

        # chain 1-2-3-4 (diameter 3, needs multiple rounds) + pair 10-11
        edges = spark.createDataFrame(
            [(2, 1), (2, 3), (3, 4), (11, 10)], "src bigint, dst bigint"
        )
        got = {
            r["node"]: r["cluster_id"]
            for r in connected_components(edges).collect()
        }
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_dedup_clusters_survivor_election(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.cluster import (
            dedup_clusters,
        )

        edges = spark.createDataFrame(
            [(7, 5), (5, 9), (20, 30)], "doc_a bigint, doc_b bigint"
        )
        rows = {
            r["doc_id"]: (r["cluster_id"], r["is_survivor"])
            for r in dedup_clusters(edges, src="doc_a", dst="doc_b").collect()
        }
        assert rows == {
            5: (5, True), 7: (5, False), 9: (5, False),
            20: (20, True), 30: (20, False),
        }

    def test_empty_edges(self, spark):
        from openaq_data_pipeline_engineering_spark.operators.cluster import (
            connected_components,
        )

        edges = spark.createDataFrame([], "src bigint, dst bigint")
        assert connected_components(edges).count() == 0


def test_minhash_piece_split_equals_one_call_form(spark):
    """The split form (project minhash_piece_cols, aggregate
    minhash_piece_agg_exprs) must produce bit-identical signatures to
    the reference one-call minhash_agg_exprs — the optimization only
    moves the md5/substring evaluation into a codegen'd Project below
    the SortAggregate (see functions/text.py)."""
    from openaq_data_pipeline_engineering_spark.functions.text import (
        minhash_piece_agg_exprs,
        minhash_piece_cols,
    )

    docs = docs_fixture(spark)
    sh = docs.select("doc_id", F.explode(word_shingles("text", 3)).alias("sh"))
    ref = {
        r["doc_id"]: tuple(r[f"h{i}"] for i in range(8))
        for r in sh.groupBy("doc_id").agg(*minhash_agg_exprs("sh", 8)).collect()
    }
    split = {
        r["doc_id"]: tuple(r[f"h{i}"] for i in range(8))
        for r in sh.select("doc_id", *minhash_piece_cols("sh", 8))
        .groupBy("doc_id")
        .agg(*minhash_piece_agg_exprs(8))
        .collect()
    }
    assert split == ref and len(ref) > 0
