"""Document chunking: sliding token windows for training-data prep.

A training pipeline feeds models fixed-size contexts, so corpora are
split into overlapping token-window chunks (context windows with a
stride). The reference has no equivalent (its records are sensor
measurements — see etls/glue_etl.py's row-shaped transforms); this is
one of the beyond-reference LLM-pipeline operators.

Spark-first design: tokenization is ``split`` (codegen'd), window
starts come from ``sequence`` + ``explode`` (a generator, no UDF), and
each chunk is ``slice`` + ``array_join`` — the whole plan is a single
narrow projection per document, no shuffle at all. Chunk count per doc
is pure integer math, so a DuckDB oracle can replay it exactly:

    n_chunks = 1                          if n_tokens <= chunk
             = (n_tokens - chunk + stride - 1) div stride + 1   else

The last window may be shorter than ``chunk`` (it is NOT padded);
every token belongs to at least one chunk and consecutive chunks
overlap by ``chunk - stride`` tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Explode documents into (id, chunk_id, chunk_text, chunk_tokens).

    ``chunk`` = window size in whitespace tokens, ``stride`` = step
    between window starts (stride < chunk ⇒ overlap). Empty documents
    yield one empty chunk, so no document silently disappears.
    """
    if not 0 < stride <= chunk:
        raise ValueError("require 0 < stride <= chunk")
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # integer ceil-div: (n - chunk + stride - 1) div stride, then +1
    n_chunks = F.when(n <= chunk, F.lit(1)).otherwise(
        F.floor((n - chunk + (stride - 1)) / F.lit(stride)) + 1
    )
    start = F.col("chunk_id").cast("int") * stride + 1
    return (
        docs.select(
            id_col,
            toks.alias("__toks"),
            F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
                "chunk_id"
            ),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("__toks"), start, chunk), " "
            ).alias("chunk_text"),
            F.size(F.slice(F.col("__toks"), start, chunk))
            .cast("long")
            .alias("chunk_tokens"),
        )
    )


def chunk_documents_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk: int = 32,
    stride: int = 24,
) -> str:
    """DuckDB mirror of :func:`chunk_documents` (same integer math).

    DuckDB's list_slice is 1-based with an INCLUSIVE stop index, so the
    stop is ``least(start + chunk - 1, n)``.
    """
    toks = f"string_split({text_col}, ' ')"
    n = f"len({toks})"
    n_chunks = (
        f"CASE WHEN {n} <= {chunk} THEN 1 "
        f"ELSE ({n} - {chunk} + {stride - 1}) // {stride} + 1 END"
    )
    return f"""
    WITH d AS (
        SELECT {id_col}, {toks} AS toks, {n_chunks} AS n_chunks
        FROM {table}
    ),
    e AS (
        SELECT {id_col}, toks,
               unnest(range(n_chunks))::BIGINT AS chunk_id
        FROM d
    )
    SELECT {id_col}, chunk_id,
           array_to_string(
               list_slice(toks, chunk_id * {stride} + 1,
                          least(chunk_id * {stride} + {chunk}, len(toks))),
               ' ') AS chunk_text,
           CAST(greatest(least(chunk_id * {stride} + {chunk}, len(toks))
                - chunk_id * {stride}, 0) AS BIGINT) AS chunk_tokens
    FROM e
    """
