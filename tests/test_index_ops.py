"""Secondary-index operators: Bloom partition index + file-skipping
manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.operators.bloom import (
    N_WORDS,
    bloom_build,
    bloom_probe,
)
from openaq_data_pipeline_engineering_spark.operators.skipstats import (
    candidate_files,
    file_stats,
    pruned_read,
)
from openaq_data_pipeline_engineering_spark.sources.star import load_table

SF_DIR = "/root/testdata/sf0.001"


class TestBloomIndex:
    def test_no_false_negatives_and_bounded_words(self, spark):
        docs = load_table(spark, SF_DIR, "documents").select(
            "source", "doc_id"
        )
        bloom = bloom_build(docs, "source", "doc_id")
        assert bloom.filter(F.col("word_idx") >= N_WORDS).count() == 0
        # Probe every true member: a Bloom filter must never miss.
        members = docs.limit(50).select("doc_id")
        hits = bloom_probe(bloom, members, "doc_id")
        true_pairs = docs.withColumnRenamed("source", "group").join(
            members, "doc_id"
        )
        missed = (
            true_pairs.join(hits, ["group", "doc_id"])
            .filter(~F.col("hit"))
            .count()
        )
        assert missed == 0


class TestFileSkipping:
    def test_manifest_prunes_and_preserves_results(self, spark, tmp_path):
        ev = load_table(spark, SF_DIR, "events").select(
            "event_id", "user_id", "event_type"
        )
        path = str(tmp_path / "ev")
        # Partitioned write -> multiple files with disjoint-ish user ranges
        ev.withColumn("bucket", F.pmod("user_id", F.lit(4))).repartition(
            4, "bucket"
        ).write.mode("overwrite").parquet(path)
        scan = spark.read.parquet(path)
        stats = file_stats(scan, ["event_id"])
        n_files = stats.count()
        assert n_files >= 2
        probe = ev.select(F.min("event_id")).first()[0]
        cands = candidate_files(stats, "event_id", probe).count()
        # min/max skipping must keep at least one file and the pruned
        # read must return exactly the rows the full filter returns.
        assert 1 <= cands <= n_files
        expect = scan.filter(F.col("event_id") == probe).count()
        got = pruned_read(scan, stats, "event_id", probe).count()
        assert got == expect > 0


class TestZOrderSkipping:
    def test_zorder_layout_improves_file_pruning(self, spark, tmp_path):
        """Z-order + min/max manifest integration: laying files out by
        Morton code clusters BOTH dimensions, so a 2-D box query prunes
        more files than a hash-scattered layout with identical data."""
        from openaq_data_pipeline_engineering_spark.functions.zorder import (
            morton_code,
        )

        ev = (
            load_table(spark, "/root/testdata/sf0.01", "events")
            .select(
                "event_id",
                F.col("user_id").cast("bigint").alias("x"),
                F.col("value").cast("bigint").alias("y"),
            )
            .filter(F.col("y") >= 0)
        )
        n_files = 8
        zpath, hpath = str(tmp_path / "z"), str(tmp_path / "h")
        ev.withColumn("z", morton_code("x", "y", bits=10)).repartitionByRange(
            n_files, "z"
        ).drop("z").write.parquet(zpath)
        ev.repartition(n_files, "event_id").write.parquet(hpath)

        def candidates(path: str) -> int:
            stats = file_stats(spark.read.parquet(path), ["x", "y"])
            # 2-D box: user 10..20, value 50..80
            return stats.filter(
                (F.col("x_min") <= 20)
                & (F.col("x_max") >= 10)
                & (F.col("y_min") <= 80)
                & (F.col("y_max") >= 50)
            ).count()

        z_cand, h_cand = candidates(zpath), candidates(hpath)
        # hash layout scatters every range across every file
        assert h_cand == n_files
        assert z_cand < h_cand
