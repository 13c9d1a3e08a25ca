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

Orchestration shape (optimization round 12): the per-round argmax is a
ONE-ROW bounded driver action (`limit(1).collect()` — the same class
as the connected-components convergence probe), and the winning pair
is substituted back as string LITERALS in the merge expression. The
previous shape broadcast the 1-row argmax as a join relation and
eagerly `localCheckpoint`ed the state table every round; that cost
3-4 Spark jobs per round (broadcast build + checkpoint materialize)
purely in orchestration. With literal substitution the state table is
a lazy chain of `replace` projections over the ONE materialized
word-frequency table, so each round costs exactly one job (the argmax
aggregation) and nothing else. Identical merge sequence, bit-equal
output.

At 100 TB: the word-frequency table (step 0) is the only corpus-sized
aggregation — it is materialized once (localCheckpoint) and every
round after that runs on the distinct-word vocabulary, which is why
real BPE trainers run on frequency tables, not raw text — this
operator has the same cost shape. The per-round driver transfer is
one (s1, s2, n) row, strictly less than the prior broadcast of the
same row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openaq_data_pipeline_engineering_spark.localrel import local_rows


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


def _apply_rule(states: DataFrame, s1: str, s2: str) -> DataFrame:
    """One literal merge applied to the state column (no join)."""
    return states.withColumn(
        "state",
        F.call_function(
            "replace",
            F.col("state"),
            F.lit(f" {s1} {s2} "),
            F.lit(f" {s1}{s2} "),
        ),
    )


MERGES_SCHEMA = "round int, s1 string, s2 string, n bigint"


def bpe_train_rules(
    word_freqs: DataFrame, rounds: int, materialize: bool = True
) -> list[tuple[int, str, str, int]]:
    """Learn ``rounds`` merge rules; returns [(round, s1, s2, n), ...].

    The per-round argmax is a 1-row bounded action; the state table
    stays a lazy literal-replace chain over the materialized frequency
    table (see module docstring). If some round has no adjacent pair
    left (degenerate vocab), training stops early — matching the prior
    broadcast implementation, where an empty argmax emptied the state
    table and every later round produced no rule row.
    """
    wf = word_freqs
    if materialize:
        # The only corpus-derived input; one job, |vocab| rows.
        wf = wf.localCheckpoint(eager=True)
    states = wf.select("w", "wfreq", char_state("w").alias("state"))
    rules: list[tuple[int, str, str, int]] = []
    for r in range(1, rounds + 1):
        with_syms = states.withColumn(
            "syms", F.split(F.trim(F.col("state")), " ")
        )
        best = (
            _pair_counts(with_syms)
            .orderBy(F.desc("n"), "s1", "s2")
            .limit(1)
            .collect()
        )
        if not best:
            break
        s1, s2, n = best[0]["s1"], best[0]["s2"], int(best[0]["n"])
        rules.append((r, s1, s2, n))
        states = _apply_rule(states, s1, s2)
    return rules


def bpe_train(
    word_freqs: DataFrame, rounds: int, materialize: bool = True
) -> DataFrame:
    """Learn ``rounds`` merge rules from a (w, wfreq) frequency table.

    Returns (round, s1, s2, n): the merged pair and its weighted count
    per round, in training order.
    """
    rules = bpe_train_rules(word_freqs, rounds, materialize=materialize)
    return local_rows(word_freqs.sparkSession, rules, MERGES_SCHEMA)


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

    The rule table is bounded by ``rounds`` rows, so it is collected
    once and applied as a chain of literal boundary-guarded string
    replaces in a single projection — no per-rule joins, no Python.
    Application order matches training order (sorted by round).
    """
    rules = sorted(
        (
            (int(row["round"]), row["s1"], row["s2"])
            for row in merges.select("round", "s1", "s2").collect()
        )
    )
    if len(rules) > max(rounds, 0):
        raise ValueError(
            f"merge table has {len(rules)} rules but rounds={rounds}"
        )
    states = word_freqs.select("w", "wfreq", char_state("w").alias("state"))
    for _r, s1, s2 in rules:
        states = _apply_rule(states, s1, s2)
    return states.select(
        "w",
        "wfreq",
        F.size(F.split(F.trim(F.col("state")), " ")).cast("bigint").alias(
            "n_syms"
        ),
    )
