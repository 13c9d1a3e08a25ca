"""BPE merge-rule training — bounded unrolled rounds, cross-engine
replayable (the tokenizer-TRAINING op; vocab_coverage and the token
counters in functions/text.py are the inference-side counterparts).

Byte-pair encoding (Sennrich et al. 2016): start from characters,
repeatedly merge the most frequent adjacent symbol pair. Each round
here is fully declarative:

1. pair counts — explode each word's adjacent symbol pairs, weight by
   word frequency, hash-aggregate (shuffle ∝ distinct pairs, which is
   bounded by vocab², itself tiny next to corpus size);
2. argmax pair — count desc, then (s1, s2) lexicographic so ties are
   deterministic;
3. merge — the symbol state is a space-separated string padded with
   spaces, so the merge is `replace(state, ' s1 s2 ', ' s1s2 ')`:
   left-to-right non-overlapping in both Spark and DuckDB (verified:
   ' a a a a ' -> ' aa a a ' in both). Note the boundary-consuming
   variant: an odd run of the same symbol merges floor(n/2) pairs
   starting left — identical in both engines, slightly different from
   tokenizers that rescan; determinism is the contract here.

The winning pair is joined back as a BROADCAST 1-row table — no
driver collect; the per-round `localCheckpoint` bounds lineage exactly
as in operators/kmeans.py (state is |vocab| rows — always tiny
relative to the corpus the words came from).

At 100 TB: the word-frequency table (step 0) is the only corpus-sized
aggregation; every round after that runs on the distinct-word
vocabulary, which is why real BPE trainers run on frequency tables,
not raw text — this operator has the same cost shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def char_state(word_col: str) -> F.Column:
    """Initial BPE state: ' c1 c2 ... cN ' (space-separated chars,
    space-padded so every pair match is boundary-guarded)."""
    return F.concat(
        F.lit(" "), F.regexp_replace(F.col(word_col), "(.)", "$1 ")
    )


def _pair_counts(states: DataFrame) -> DataFrame:
    pairs = states.select(
        "wfreq",
        F.explode(
            F.expr(
                "zip_with(slice(syms, 1, size(syms) - 1), "
                "slice(syms, 2, size(syms) - 1), "
                "(a, b) -> named_struct('s1', a, 's2', b))"
            )
        ).alias("p"),
    ).select("wfreq", F.col("p.s1").alias("s1"), F.col("p.s2").alias("s2"))
    return pairs.groupBy("s1", "s2").agg(
        F.sum("wfreq").cast("bigint").alias("n")
    )


def bpe_train(
    word_freqs: DataFrame, rounds: int, materialize: bool = True
) -> DataFrame:
    """Learn ``rounds`` merge rules from a (w, wfreq) frequency table.

    Returns (round, s1, s2, n): the merged pair and its weighted count
    per round, in training order.
    """
    states = word_freqs.select(
        "w", "wfreq", char_state("w").alias("state")
    )
    merges: DataFrame | None = None
    for r in range(1, rounds + 1):
        with_syms = states.withColumn(
            "syms", F.split(F.trim(F.col("state")), " ")
        )
        best = (
            _pair_counts(with_syms)
            .orderBy(F.desc("n"), "s1", "s2")
            .limit(1)
        )
        row = best.select(
            F.lit(r).cast("int").alias("round"), "s1", "s2", "n"
        )
        merges = row if merges is None else merges.unionByName(row)
        states = (
            states.crossJoin(F.broadcast(best))
            .withColumn(
                "state",
                F.expr(
                    "replace(state, concat(' ', s1, ' ', s2, ' '), "
                    "concat(' ', s1, s2, ' '))"
                ),
            )
            .select("w", "wfreq", "state")
        )
        if materialize:
            # |vocab| rows — always driver-safe; bounds lineage so round
            # k+1 does not replay rounds 1..k (same rationale as
            # kmeans_fit's per-Lloyd-round checkpoint).
            states = states.localCheckpoint(eager=True)
    assert merges is not None
    return merges


def bpe_oracle_sql(word_freq_sql: str, rounds: int) -> str:
    """DuckDB CTE chain replaying the identical training rounds."""
    parts = [
        f"WITH w AS ({word_freq_sql}),",
        "s0 AS (SELECT w, wfreq,"
        " ' ' || regexp_replace(w, '(.)', '\\1 ', 'g') AS state FROM w)",
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f""",
p{r} AS (
  SELECT s1, s2, CAST(sum(wfreq) AS BIGINT) AS n
  FROM (
    SELECT wfreq, u.p[1] AS s1, u.p[2] AS s2
    FROM (SELECT wfreq, string_split(trim(state), ' ') AS syms
          FROM {prev}) t,
         unnest(list_zip(syms[1:len(syms) - 1], syms[2:])) AS u(p)
  ) GROUP BY 1, 2
),
b{r} AS (SELECT s1, s2, n FROM p{r} ORDER BY n DESC, s1, s2 LIMIT 1),
s{r} AS (
  SELECT w, wfreq,
         replace(state, ' ' || b.s1 || ' ' || b.s2 || ' ',
                 ' ' || b.s1 || b.s2 || ' ') AS state
  FROM {prev}, b{r} b
)"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({r} AS INT) AS round, s1, s2, n FROM b{r}"
        for r in range(1, rounds + 1)
    )
    return "\n".join(parts) + "\n" + selects


def bpe_apply(
    word_freqs: DataFrame, merges: DataFrame, rounds: int
) -> DataFrame:
    """Apply learned merge rules (in training order) to the vocabulary:
    returns (w, wfreq, n_syms) — symbols per word AFTER the merges.

    Each rule is a broadcast 1-row join + the same boundary-guarded
    string replace as training; no collect, no Python. ``rounds`` must
    equal the merge count (rules are joined by their round number so
    application order matches training order).
    """
    states = word_freqs.select("w", "wfreq", char_state("w").alias("state"))
    for r in range(1, rounds + 1):
        rule = merges.filter(F.col("round") == r).select("s1", "s2")
        states = (
            states.crossJoin(F.broadcast(rule))
            .withColumn(
                "state",
                F.expr(
                    "replace(state, concat(' ', s1, ' ', s2, ' '), "
                    "concat(' ', s1, s2, ' '))"
                ),
            )
            .select("w", "wfreq", "state")
        )
    return states.select(
        "w",
        "wfreq",
        F.size(F.split(F.trim(F.col("state")), " ")).cast("bigint").alias(
            "n_syms"
        ),
    )
