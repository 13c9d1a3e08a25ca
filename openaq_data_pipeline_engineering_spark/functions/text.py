"""Text-analysis column expressions for the LLM-data-pipeline extensions.

Design constraint: every expression here is *oracle-mirrorable* — built
only from IEEE-exact arithmetic (+,-,*,/), replace/length string ops, and
md5 — primitives whose results are bit-identical between Spark (JVM) and
DuckDB (C++). No transcendentals (exp/log/pow) whose last-ULP behavior
differs between libm implementations, no engine-specific hash functions
(Spark's murmur3 `hash()` ≠ DuckDB's hash()).

All are pure Column expressions → whole-stage codegen, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def occurrence_count(text: Column | str, needle: str) -> Column:
    """# of occurrences of ``needle`` via the replace-length trick.

    ``(len(s) - len(replace(s, needle, ''))) / len(needle)`` — exact
    integer arithmetic, identical in any SQL engine.
    """
    t = _col(text)
    return (
        (F.length(t) - F.length(F.replace(t, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("bigint")


def whitespace_token_count(text: Column | str) -> Column:
    """Approximate word count = single-space count + 1 (0 for empty)."""
    t = _col(text)
    return F.when(F.length(t) == 0, F.lit(0).cast("bigint")).otherwise(
        occurrence_count(t, " ") + F.lit(1)
    )


def bpe_token_estimate(text: Column | str, chars_per_token: float = 4.0) -> Column:
    """ceil(chars / 4): the standard BPE-ish token-count estimate."""
    return F.ceil(F.length(_col(text)) / F.lit(chars_per_token)).cast("bigint")


def punct_ratio(text: Column | str, puncts: str = ".,!?;:") -> Column:
    """Fraction of characters that are punctuation (rational arithmetic)."""
    t = _col(text)
    total = None
    for ch in puncts:
        c = occurrence_count(t, ch)
        total = c if total is None else total + c
    return F.when(F.length(t) == 0, F.lit(0.0)).otherwise(
        total.cast("double") / F.length(t).cast("double")
    )


def quality_score(text: Column | str) -> Column:
    """Length/punctuation quality heuristic in [0, 1).

    ``(w / (w + 50)) * (1 - punct_ratio)`` — longer docs score higher,
    punctuation-noise docs score lower. Rational arithmetic only.
    """
    w = whitespace_token_count(text).cast("double")
    return (w / (w + F.lit(50.0))) * (F.lit(1.0) - punct_ratio(text))


# Language-ID marker words: language -> space-delimited stopword markers.
LANG_MARKERS: dict[str, list[str]] = {
    "en": [" the ", " and ", " of "],
    "es": [" el ", " la ", " los "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " la ", " et "],
}
LANG_ORDER = ["en", "es", "de", "fr"]


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Per-language marker-occurrence scores (n-gram stopword heuristic)."""
    t = _col(text)
    out: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        s = None
        for m in markers:
            c = occurrence_count(t, m)
            s = c if s is None else s + c
        out[lang] = s
    return out


def lang_predict_from(scores: dict[str, Column]) -> Column:
    """Argmax language over precomputed score columns (same CASE chain
    as :func:`lang_predict`).

    NOTE (r13): projecting scores does NOT pin one evaluation under a
    FILTER — Catalyst's predicate pushdown re-inlines the aliases into
    the Filter (r12's committed after-plan refuted the contrary claim),
    and Filter predicates get no subexpression elimination. When a
    prediction-equality test sits in a filter, rewrite it algebraically
    instead: ``predicted == LANG_ORDER[0]`` is exactly the chain's
    first arm, ``scores[first] >= greatest(*rest)``, which evaluates
    each score once wherever the predicate lands (see
    corpus_curation)."""
    chain = None
    for i, lang in enumerate(LANG_ORDER):
        conds = [
            scores[lang] >= scores[other] for other in LANG_ORDER[i + 1 :]
        ]
        cond = F.lit(True)
        for c in conds:
            cond = cond & c
        chain = F.when(cond, lang) if chain is None else chain.when(cond, lang)
    return F.coalesce(chain, F.lit(LANG_ORDER[-1]))


def lang_predict(text: Column | str) -> Column:
    """Argmax language with deterministic tie-break (LANG_ORDER priority)."""
    return lang_predict_from(lang_scores(text))


def normalized_fingerprint(text: Column | str) -> Column:
    """md5 of lowercase text with non-alphanumerics collapsed — the
    document fingerprint for exact near-normalization dedup."""
    t = _col(text)
    norm = F.regexp_replace(F.lower(t), r"[^a-z0-9 ]", "")
    norm = F.regexp_replace(norm, r" +", " ")
    return F.md5(norm)


def word_shingles(text: Column | str, k: int = 3) -> Column:
    """Array of word k-grams (shingles) from whitespace tokens.

    Guarded so docs with < k tokens yield an empty array (Spark's
    ``sequence(1, 0)`` would otherwise produce a DESCENDING sequence).
    """
    t = _col(text)
    toks = F.split(t, " ")
    n = F.size(toks)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    parts = lambda i: [F.element_at(toks, i + j) for j in range(k)]  # noqa: E731
    return F.transform(idx, lambda i: F.concat_ws(" ", *parts(i)))


def minhash_agg_exprs(shingle_col: str, num_hashes: int = 8) -> list[Column]:
    """MinHash aggregate expressions over an exploded shingle column.

    Hash family: the 32 hex chars of md5 are split into 8-char (32-bit)
    pieces, each piece an independent uniform hash; salting with '#k'
    yields further families. One md5 evaluation serves 4 hash functions —
    4× cheaper than md5-per-function, which dominates the map side of
    this operator. String-min over fixed-width lowercase hex == numeric
    min, and md5 is IDENTICAL in Spark and DuckDB (their native hash()
    functions are not).

    Deliberately agg-over-explode and NOT a per-row
    ``array_min(transform(...))`` fold: (a) the groupBy's exchange is
    ReusedExchange'd across both sides of the LSH band self-join, so
    the signature is computed once per query; (b) 8 chained array-HOF
    expressions in one projection overflow whole-stage codegen into
    interpreted evaluation — measured 3.5× slower end-to-end at sf0.1
    despite saving the (partial-agg-shrunk) shuffle.

    PERFORMANCE: prefer the split form — project
    :func:`minhash_piece_cols` first, then aggregate
    :func:`minhash_piece_agg_exprs`. min(string) forces a
    SortAggregate, whose input expressions are evaluated per row
    WITHOUT whole-stage codegen and WITHOUT common-subexpression
    elimination: this one-call form pays 8 interpreted md5+substring
    evaluations per shingle (~20 CPU-s over a 270k-shingle corpus at
    sf0.1). The split form moves them into a codegen'd Project where
    CSE collapses the md5s to one per salt (measured 2.5× end-to-end
    on the signature pass; values bit-identical). This form is kept
    for the known-answer tests and as the oracle-mirroring reference.
    """
    out: list[Column] = []
    for i in range(num_hashes):
        salt, piece = divmod(i, 4)
        h = (
            F.md5(F.col(shingle_col))
            if salt == 0
            else F.md5(F.concat(F.col(shingle_col), F.lit("#" * salt)))
        )
        out.append(F.min(F.substring(h, 1 + 8 * piece, 8)).alias(f"h{i}"))
    return out


def minhash_piece_cols(
    shingle_col: str, num_hashes: int = 8
) -> list[Column]:
    """Per-row MinHash piece projections ``_mh_p{i}`` (8-hex-char
    substrings of the salted md5s — the exact input of piece ``i``'s
    min in :func:`minhash_agg_exprs`).

    Projected BEFORE the aggregation so the md5s run inside a
    codegen'd Project where common-subexpression elimination computes
    each salt's md5 once per row; the SortAggregate that min(string)
    forces then only sees plain column refs. Identical values to the
    one-call form by construction (same expressions, moved one
    operator down).
    """
    out: list[Column] = []
    for i in range(num_hashes):
        salt, piece = divmod(i, 4)
        h = (
            F.md5(F.col(shingle_col))
            if salt == 0
            else F.md5(F.concat(F.col(shingle_col), F.lit("#" * salt)))
        )
        out.append(F.substring(h, 1 + 8 * piece, 8).alias(f"_mh_p{i}"))
    return out


def minhash_piece_agg_exprs(num_hashes: int = 8) -> list[Column]:
    """Aggregate half of the split MinHash form: min over the
    :func:`minhash_piece_cols` projections, aliased ``h{i}`` exactly
    like :func:`minhash_agg_exprs`."""
    return [
        F.min(F.col(f"_mh_p{i}")).alias(f"h{i}") for i in range(num_hashes)
    ]


def minhash_sql_exprs(shingle_expr: str, num_hashes: int = 8) -> list[str]:
    """DuckDB mirror of :func:`minhash_agg_exprs` (same piece layout)."""
    out = []
    for i in range(num_hashes):
        salt, piece = divmod(i, 4)
        h = (
            f"md5({shingle_expr})"
            if salt == 0
            else f"md5({shingle_expr} || '{'#' * salt}')"
        )
        out.append(f"min(substr({h}, {1 + 8 * piece}, 8)) AS h{i}")
    return out


# BPE-ish tokenizer: word runs OR single non-word-non-space chars — the
# shape of byte-pair pretokenization. Pattern restricted to a class with
# identical semantics in Java regex (Spark) and DuckDB's RE2.
BPE_TOKEN_PATTERN = "[A-Za-z0-9]+|[^A-Za-z0-9 ]"

_ROLL_MOD = 2_147_483_647  # 2^31-1: h*31+v stays < 2^36, no ANSI overflow


def regex_token_count(text: Column | str) -> Column:
    """# of BPE-ish pretokens (regex word-or-symbol runs)."""
    return F.size(
        F.regexp_extract_all(_col(text), F.lit(BPE_TOKEN_PATTERN), F.lit(0))
    ).cast("bigint")


def rolling_hash(text: Column | str) -> Column:
    """Order-sensitive polynomial rolling hash over whitespace tokens:
    ``h = (h*31 + md5_28bit(tok)) mod (2^31-1)``, seed 0.

    Unlike the order-insensitive md5-of-normalized-text fingerprint,
    transposed words change this hash. Pure fold — mirrored in DuckDB as
    ``list_reduce(list_prepend(0, hashes), ...)``.
    """
    toks = F.split(_col(text), " ")
    hashes = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 7), 16, 10).cast("bigint"),
    )
    return F.aggregate(
        hashes,
        F.lit(0).cast("bigint"),
        lambda h, v: F.pmod(h * F.lit(31) + v, F.lit(_ROLL_MOD)),
    )


def rolling_hash_sql(texpr: str) -> str:
    """DuckDB mirror of :func:`rolling_hash` (same fold, same constants)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({texpr}, ' '), "
        f"t -> CAST(concat('0x', substr(md5(t), 1, 7)) AS BIGINT))), "
        f"(h, v) -> (h * 31 + v) % {_ROLL_MOD})"
    )


# PII patterns restricted to explicit character classes so Java regex
# (Spark) and RE2 (DuckDB) agree byte-for-byte.
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_PATTERN = "[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}"


def scrub_pii(text: Column | str) -> Column:
    """Redact email addresses and phone numbers (training-data cleaning)."""
    t = _col(text)
    t = F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>")
    return F.regexp_replace(t, PHONE_PATTERN, "<PHONE>")


def pii_count(text: Column | str) -> Column:
    """# of PII matches found (emails + phones)."""
    t = _col(text)
    return (
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_PATTERN), F.lit(0)))
        + F.size(F.regexp_extract_all(t, F.lit(PHONE_PATTERN), F.lit(0)))
    ).cast("bigint")


def repetition_ratio(text: Column | str) -> Column:
    """max token frequency / token count — the repeated-content quality
    signal (a doc that is one token over and over scores 1.0).

    Expressed per-row over the token array (no explode/shuffle): builds
    a token→count map via aggregate, then takes the max count. Stays a
    Column expression — at 100 TB this is map-side only.
    """
    toks = F.split(_col(text), " ")
    n = F.size(toks)
    counts = F.aggregate(
        toks,
        F.create_map().cast("map<string,int>"),
        lambda acc, t: F.map_concat(
            F.map_filter(acc, lambda k, v: k != t),
            F.create_map(t, F.coalesce(F.element_at(acc, t), F.lit(0)) + F.lit(1)),
        ),
    )
    mx = F.array_max(F.map_values(counts))
    # guard on text length: split("") yields [""] (size 1), not []
    return F.when(F.length(_col(text)) == 0, F.lit(0.0)).otherwise(
        mx.cast("double") / n.cast("double")
    )


# Common-English stopwords used for the stopword-density quality signal
# (space-delimited matching, same engine-identical occurrence trick).
STOPWORDS = [" the ", " and ", " of ", " to ", " in ", " a ", " is "]


def stopword_ratio(text: Column | str) -> Column:
    """stopword occurrences / word count — natural-language documents
    score well above keyword-stuffed or non-linguistic content."""
    t = _col(text)
    total = None
    for w in STOPWORDS:
        c = occurrence_count(t, w)
        total = c if total is None else total + c
    wc = whitespace_token_count(t)
    return F.when(wc == 0, F.lit(0.0)).otherwise(
        total.cast("double") / wc.cast("double")
    )
