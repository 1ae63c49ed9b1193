"""Document chunking for training-sequence preparation: slide a
fixed-width window with a stride over each document and emit one row
per chunk — the step that turns a curated corpus into model-ready
sequences (after dedup/quality filtering, before packing
(operators/packing.py)).

Pure codegen: ``sequence`` + ``explode`` + ``Column.substr`` — the
explode factor is ``ceil(len/stride)`` per document, bounded by
document length, so output volume is a constant multiple of input
volume (no shuffle at all; the plan is scan → generate → project and
parallelism is inherited from the input partitioning).

Windows are CHARACTER-based (``substr`` semantics are identical
char-based in Spark and DuckDB, and md5 then hashes the UTF-8 bytes
of the same substring, so chunk fingerprints hash-match cross-engine).
Token-based chunking composes with operators/text.py's token counts by
chunking the token array instead; the character form is the oracle
surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    documents: DataFrame,
    chunk_size: int = 512,
    stride: int = 384,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, chunk_idx, chunk_start, chunk_len, chunk_md5).

    Chunk k covers characters [k*stride, k*stride + chunk_size); the
    window slides while its start is inside the document, so the final
    chunk may be shorter than ``chunk_size`` (standard sliding-window
    contract — with stride < size, every character lands in at least
    one chunk and boundary regions in two).  Empty documents yield no
    chunks.  ``chunk_md5`` carries the chunk fingerprint so downstream
    chunk-level dedup (operators/dedup.py) joins on it directly
    without materializing chunk text.
    """
    if chunk_size <= 0 or stride <= 0:
        raise ValueError(
            f"chunk_size and stride must be positive, got "
            f"{chunk_size}, {stride}"
        )
    length = F.length(F.col(text_col))
    last_idx = F.floor((length - F.lit(1)) / F.lit(stride)).cast("int")
    chunk = F.col(text_col).substr(
        F.col("chunk_start") + F.lit(1), F.lit(chunk_size)
    )
    return (
        documents.filter(length > 0)
        .select(
            F.col(id_col),
            F.explode(F.sequence(F.lit(0), last_idx)).alias("chunk_idx"),
            F.col(text_col),
        )
        .withColumn("chunk_start", F.col("chunk_idx") * stride)
        .select(
            id_col,
            "chunk_idx",
            "chunk_start",
            F.length(chunk).alias("chunk_len"),
            F.md5(chunk.cast("binary")).alias("chunk_md5"),
        )
    )


def chunking_oracle_sql(
    chunk_size: int = 512,
    stride: int = 384,
    table: str = "documents",
) -> str:
    """DuckDB rendering of the same window arithmetic — kept adjacent
    to the Spark expression so the two evolve together."""
    return f"""
SELECT d.doc_id,
       g.i AS chunk_idx,
       g.i * {stride} AS chunk_start,
       length(substr(d.text, g.i * {stride} + 1, {chunk_size}))
           AS chunk_len,
       md5(substr(d.text, g.i * {stride} + 1, {chunk_size}))
           AS chunk_md5
FROM {table} d CROSS JOIN LATERAL (
    SELECT unnest(range(
        0,
        CAST(floor((length(d.text) - 1.0) / {stride}) AS BIGINT) + 1
    )) AS i
) g
WHERE length(d.text) > 0
"""


__all__ = ["chunk_documents", "chunking_oracle_sql"]
