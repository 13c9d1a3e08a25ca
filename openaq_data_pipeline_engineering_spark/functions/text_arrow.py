"""Arrow-native MinHash signature kernel (guide §4.2: do the heavy
lifting in native code inside the Python boundary).

The declared MinHash family (minhash_lsh_candidates, neardup_clusters,
corpus_curation, containment_pairs, minhash_estimate_error,
minhash_incremental_candidates, pretraining_funnel) pins its signatures
to salted-md5 8-hex pieces (functions/text.minhash_agg_exprs — the
DuckDB-mirrorable definition, which the oracles replay verbatim). The
JVM evaluation of that definition costs, per query: one explode of
every word 3-gram (~3x the corpus bytes), a full exchange of the
exploded relation into a groupBy(doc_id), and a SortAggregate whose
min(string) inputs are the 2-per-shingle md5s — measured as the suite's
dominant remaining CPU after the round-12 CSE projection split
(VERDICT r12: ~22 s of the 8-core suite across the family;
minhash_lsh_candidates' 4.32x core-scaling ratio = pure CPU).

This module computes the IDENTICAL signature values in ONE mapInArrow
pass: per document, shingle locally, hash with C ``hashlib.md5``, track
the 8 piece minima — no explode, no exchange, no sort aggregate. The
output is one row per document, so the downstream LSH band build sees
|docs| rows instead of |shingles| rows.

Bit-equality contract (pinned by tests/test_text_arrow.py against the
SQL-expression form on adversarial inputs):

- tokens: Python ``text.split(' ')`` == Spark ``split(text, ' ')``
  (Java ``Pattern.split`` with limit -1) for the single-space pattern —
  both keep leading/trailing/consecutive-space empty tokens and both
  yield ``['']`` for the empty string;
- shingles: ``' '.join(tokens[i:i+k])`` == ``concat_ws(' ', ...)`` over
  ``element_at`` — plain concatenation, no separator elision (no
  NULL tokens exist: split never returns NULL elements);
- hashes: ``hashlib.md5(sh.encode('utf-8')).hexdigest()`` == Spark
  ``md5(sh)`` == DuckDB ``md5(sh)`` (lowercase hex over UTF-8 bytes);
  salt ``i//4`` appends ``'#' * salt`` exactly like
  ``concat(sh, lit('#'*salt))``;
- piece ``i``: ``hexdigest[8*(i%4) : 8*(i%4)+8]`` ==
  ``substring(md5, 1 + 8*piece, 8)``;
- min: Python ``<`` on ASCII hex == UTF8String binary ordering ==
  ``min(string)``; min over DISTINCT shingles == min over raw shingles
  (min is duplicate-blind);
- a document with < k tokens emits NOTHING (``explode`` of the empty
  shingle array drops the row).

Plan shape: the kernel appears as a single ``MapInArrow``/
``ArrowEvalPython``-class node fed by a column-pruned scan (only
``id_col`` and ``text_col`` are selected before the kernel, guide §4.1
column-crossing rule). ``BatchEvalPython`` (row-pickled Python) never
appears — the plan-audit gate pins that.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType


def _piece_minima(
    text: str, k: int, num_hashes: int
) -> tuple[list[str], int] | None:
    """(per-piece minima over the doc's DISTINCT shingles, distinct
    shingle count), or None for a doc with < k tokens or NULL text
    (``split(NULL)`` is NULL and ``explode(NULL)`` drops the row —
    same emission). Pure Python + C hashlib — no Spark types."""
    if text is None:
        return None
    toks = text.split(" ")
    n = len(toks)
    if n < k:
        return None
    # first-seen order (dict.fromkeys) so output is deterministic
    # regardless of the per-process str-hash salt; the minima are
    # order-independent anyway, but shingle EMISSION order (the
    # combined variant) must not vary run to run.
    shingles = dict.fromkeys(
        " ".join(toks[i : i + k]) for i in range(n - k + 1)
    )
    n_salts = (num_hashes + 3) // 4
    mins: list[str | None] = [None] * num_hashes
    md5 = hashlib.md5
    for sh in shingles:
        b = sh.encode("utf-8")
        for salt in range(n_salts):
            hexd = md5(b + b"#" * salt).hexdigest()
            base = 4 * salt
            for piece in range(min(4, num_hashes - base)):
                i = base + piece
                p = hexd[8 * piece : 8 * piece + 8]
                m = mins[i]
                if m is None or p < m:
                    mins[i] = p
    return mins, len(shingles)  # type: ignore[return-value]


def _sig_schema(
    df: DataFrame, id_col: str, num_hashes: int, with_count: bool
) -> StructType:
    id_field = df.schema[id_col]
    fields = [StructField(id_field.name, id_field.dataType)]
    fields += [
        StructField(f"h{i}", StringType()) for i in range(num_hashes)
    ]
    if with_count:
        fields.append(StructField("n_sh", LongType()))
    return StructType(fields)


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    k: int = 3,
    with_count: bool = False,
) -> DataFrame:
    """One row per document with >= k tokens: ``(id, h0..h{n-1}``
    [, ``n_sh``]) — bit-identical to the
    ``explode(word_shingles) -> groupBy(id).agg(minhash_agg_exprs)``
    pipeline (module docstring), computed map-side with zero shuffles.
    ``n_sh`` (optional) is the DISTINCT shingle count — the containment
    family's set-size denominator."""
    import pyarrow as pa

    schema = _sig_schema(df, id_col, num_hashes, with_count)

    def kernel(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            keep_idx: list[int] = []
            cols: list[list[str]] = [[] for _ in range(num_hashes)]
            counts: list[int] = []
            for row, text in enumerate(texts):
                prof = _piece_minima(text, k, num_hashes)
                if prof is None:
                    continue
                mins, n_sh = prof
                keep_idx.append(row)
                for i in range(num_hashes):
                    cols[i].append(mins[i])
                counts.append(n_sh)
            if not keep_idx:
                continue
            arrays = [ids.take(pa.array(keep_idx, type=pa.int32()))]
            arrays += [
                pa.array(c, type=pa.string()) for c in cols
            ]
            if with_count:
                arrays.append(pa.array(counts, type=pa.int64()))
            yield pa.RecordBatch.from_arrays(
                arrays, names=[f.name for f in schema.fields]
            )

    return df.select(id_col, text_col).mapInArrow(kernel, schema)


def minhash_profile_with_shingles(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    k: int = 3,
    shingle_col: str = "sh",
) -> DataFrame:
    """Combined kernel for the containment family, which needs BOTH the
    per-doc signature profile AND the distinct-shingle relation for the
    exact intersection join: one scan, one Python pass, zero shuffles.

    Output schema ``(id, sh, h0..h{n-1}, n_sh)`` interleaves two row
    kinds per document (>= k tokens):

    - |distinct shingles| SHINGLE rows: ``sh`` set, ``h*``/``n_sh``
      NULL;
    - exactly one PROFILE row: ``sh`` NULL, ``h*`` the piece minima,
      ``n_sh`` the distinct count.

    Callers localCheckpoint the combined frame once and split it with
    ``filter(sh IS NULL)`` / ``filter(sh IS NOT NULL)`` — the same
    multi-use-frame idiom the family already used, minus the
    explode + DISTINCT exchange + signature SortAggregate it replaces.
    """
    import pyarrow as pa

    id_field = df.schema[id_col]
    schema = StructType(
        [
            StructField(id_field.name, id_field.dataType),
            StructField(shingle_col, StringType()),
        ]
        + [StructField(f"h{i}", StringType()) for i in range(num_hashes)]
        + [StructField("n_sh", LongType())]
    )
    names = [f.name for f in schema.fields]

    def kernel(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
        md5 = hashlib.md5
        n_salts = (num_hashes + 3) // 4
        for batch in batches:
            ids = batch.column(0)
            texts = batch.column(1).to_pylist()
            idx: list[int] = []
            sh_col: list[str | None] = []
            hcols: list[list[str | None]] = [[] for _ in range(num_hashes)]
            nsh_col: list[int | None] = []
            for row, text in enumerate(texts):
                if text is None:
                    continue
                toks = text.split(" ")
                n = len(toks)
                if n < k:
                    continue
                shingles = dict.fromkeys(
                    " ".join(toks[i : i + k]) for i in range(n - k + 1)
                )
                mins: list[str | None] = [None] * num_hashes
                for sh in shingles:
                    b = sh.encode("utf-8")
                    for salt in range(n_salts):
                        hexd = md5(b + b"#" * salt).hexdigest()
                        base = 4 * salt
                        for piece in range(min(4, num_hashes - base)):
                            i = base + piece
                            p = hexd[8 * piece : 8 * piece + 8]
                            m = mins[i]
                            if m is None or p < m:
                                mins[i] = p
                    idx.append(row)
                    sh_col.append(sh)
                    for i in range(num_hashes):
                        hcols[i].append(None)
                    nsh_col.append(None)
                # profile row
                idx.append(row)
                sh_col.append(None)
                for i in range(num_hashes):
                    hcols[i].append(mins[i])
                nsh_col.append(len(shingles))
            if not idx:
                continue
            arrays = [ids.take(pa.array(idx, type=pa.int32()))]
            arrays.append(pa.array(sh_col, type=pa.string()))
            arrays += [pa.array(c, type=pa.string()) for c in hcols]
            arrays.append(pa.array(nsh_col, type=pa.int64()))
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return df.select(id_col, text_col).mapInArrow(kernel, schema)


def split_profile(
    combined: DataFrame, shingle_col: str = "sh", num_hashes: int = 8
) -> tuple[DataFrame, DataFrame]:
    """(shingle relation, profile relation) views over a (checkpointed)
    :func:`minhash_profile_with_shingles` frame."""
    id_col = combined.columns[0]
    sh = combined.filter(
        combined[shingle_col].isNotNull()
    ).select(id_col, shingle_col)
    prof = combined.filter(combined[shingle_col].isNull()).select(
        id_col, *[f"h{i}" for i in range(num_hashes)], "n_sh"
    )
    return sh, prof
