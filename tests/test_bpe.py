"""BPE merge training: known-answer merges on a hand-built frequency
table."""

from __future__ import annotations

from openaq_data_pipeline_engineering_spark.operators.bpe import bpe_train


def test_known_merge_sequence(spark):
    # 'aaab' x10, 'ab' x5:
    #   r1: (a,a)=20 beats (a,b)=15   -> 'aaab' becomes ' aa a b '
    #   r2: (a,b)=15 beats (aa,a)=10  -> ' aa ab ' / ' ab '
    #   r3: (aa,ab)=10
    wf = spark.createDataFrame(
        [("aaab", 10), ("ab", 5)], "w string, wfreq bigint"
    )
    got = [
        (r["round"], r["s1"], r["s2"], r["n"])
        for r in bpe_train(wf, rounds=3).orderBy("round").collect()
    ]
    assert got == [(1, "a", "a", 20), (2, "a", "b", 15), (3, "aa", "ab", 10)]
