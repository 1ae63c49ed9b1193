"""Content-defined chunking (CDC) + chunk-level duplicate evidence —
the storage-dedup primitive (Muthitacharoen et al., SOSP 2001 "A
Low-Bandwidth Network File System": Rabin-fingerprint boundaries)
applied to corpus curation: split every document at positions where a
rolling window hash ≡ 0 (mod divisor), so chunk boundaries move WITH
the content — an insertion or deletion reshapes only the chunk it
touches, unlike fixed-width windows (substrdup.py) whose every
downstream window shifts. Shared chunk hashes across documents are
then copied-span evidence robust to offset drift.

Boundary rule: position ``i`` (1-based, i ≥ w) is a cut iff
``portable_hash32(substring(text, i−w+1, w), 'cdc:') % divisor == 0``
— i.e. the decision depends ONLY on the w-char window ending at i,
never on earlier cuts, which is what makes the whole computation a
per-row array expression (no sequential scan, no UDF): build the
boundary list with transform+filter, slice chunks with one more
transform, explode. Documents shorter than ``w`` form a single chunk.

Deliberate simplifications vs production CDC, documented:
- no min/max chunk-size clamps — those make cut eligibility depend on
  the previous cut (a sequential fold); the unclamped gear-style rule
  keeps boundaries content-local and the plan declarative. Expected
  chunk length is ``divisor`` chars; the tails are geometric.
- the window hash is the repo's portable md5-derived 32-bit hash (one
  md5 per position, O(w) each) rather than an O(1)-per-position gear
  rolling hash — the cross-engine-reproducible choice. At 100 TB the
  scan cost is w× the text bytes, still embarrassingly parallel
  per-row expression work inside codegen; a gear-table ``mapInPandas``
  drop-in is the optimization if that constant ever dominates.

100 TB posture: chunking is projection-only per-row work (zero
shuffle); the shared-chunk report shuffles once on ``chunk_hash`` —
map-side partial aggregation collapses per-partition repeats first,
and the output is bounded by the distinct-shared-chunk count, never
corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import portable_hash32


def _boundaries(t: Column, w: int, divisor: int) -> Column:
    """Sorted cut positions (1-based, inclusive end of each window)
    of ``t``; empty for texts shorter than ``w`` (guarded — see
    editsim's sequence(1,0) lesson)."""
    pos = F.filter(
        F.transform(
            F.sequence(F.lit(w), F.length(t)),
            lambda i: F.when(
                portable_hash32(F.substring(t, i - (w - 1), w), "cdc:")
                % divisor
                == 0,
                i,
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return F.when(F.length(t) >= w, pos).otherwise(
        F.array().cast("array<int>")
    )


def cdc_chunks(
    docs: DataFrame,
    window: int = 8,
    divisor: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, chunk_idx, chunk_hash, chunk_len): every document
    split at content-defined boundaries; chunk_hash = md5 of the chunk
    text. NULL/empty texts produce no rows. Ordered by
    (doc_id, chunk_idx)."""
    if window < 1 or divisor < 1:
        raise ValueError(f"need window ≥ 1 and divisor ≥ 1, got {window}, {divisor}")
    t = F.col("_t")
    bounds = F.concat(
        F.array(F.lit(0)),
        F.filter(
            _boundaries(t, window, divisor), lambda b: b < F.length(t)
        ),
        F.array(F.length(t)),
    )
    chunk = lambda lo, hi: F.substring(t, lo + 1, hi - lo)  # noqa: E731
    base = docs.filter(
        F.col(text_col).isNotNull() & (F.length(text_col) > 0)
    ).select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
    exploded = base.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size(bounds) - 1),
                lambda j: F.struct(
                    F.md5(chunk(bounds[j - 1], bounds[j])).alias("h"),
                    (bounds[j] - bounds[j - 1]).alias("n"),
                ),
            )
        ).alias("chunk_idx", "c"),
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.col("c.h").alias("chunk_hash"),
        F.col("c.n").cast("long").alias("chunk_len"),
    ).orderBy("doc_id", "chunk_idx")


def cdc_shared_chunks(
    docs: DataFrame,
    window: int = 8,
    divisor: int = 32,
    min_len: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (chunk_hash, chunk_len, n_docs, n_occ, first_doc): chunks of
    at least ``min_len`` chars appearing in ≥ 2 DISTINCT documents —
    the copied-span dedup evidence (first_doc = smallest containing
    doc_id, the keep-first representative). Ordered by chunk_hash."""
    ch = cdc_chunks(
        docs, window=window, divisor=divisor,
        text_col=text_col, id_col=id_col,
    )
    return (
        ch.filter(F.col("chunk_len") >= min_len)
        .groupBy("chunk_hash", "chunk_len")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
        .orderBy("chunk_hash")
    )


def _h32_sql(expr: str, seed: str) -> str:
    return f"CAST(('0x' || substr(md5('{seed}' || {expr}), 1, 8)) AS BIGINT)"


def _chunks_cte(window: int, divisor: int, table: str, text_expr: str) -> str:
    """Shared CTE chain producing (doc_id, chunk_idx, chunk_hash,
    chunk_len) — DuckDB rendering of ``cdc_chunks``. DuckDB lists are
    1-indexed; ``range(a, b)`` is end-exclusive."""
    win_sub = f"substring(txt, CAST(i - {window - 1} AS INTEGER), {window})"
    return f"""
base AS (
  SELECT doc_id, {text_expr} AS txt FROM {table}
  WHERE {text_expr} IS NOT NULL AND length({text_expr}) > 0
),
bnd AS (
  SELECT doc_id, txt,
         list_concat(
           list_concat([0], CASE WHEN length(txt) >= {window}
             THEN list_filter(
               list_transform(
                 range({window}, length(txt) + 1),
                 i -> CASE WHEN {_h32_sql(win_sub, 'cdc:')} % {divisor} = 0
                           AND i < length(txt)
                      THEN CAST(i AS BIGINT) END),
               x -> x IS NOT NULL)
             ELSE [] END),
           [CAST(length(txt) AS BIGINT)]) AS bounds
  FROM base
),
packed AS (
  SELECT doc_id,
         unnest(list_transform(range(2, len(bounds) + 1),
           j -> struct_pack(
                  idx := CAST(j - 2 AS INTEGER),
                  h := md5(substring(txt,
                           CAST(bounds[j - 1] + 1 AS INTEGER),
                           CAST(bounds[j] - bounds[j - 1] AS INTEGER))),
                  n := bounds[j] - bounds[j - 1]))) AS c
  FROM bnd
),
chunks AS (
  SELECT doc_id, c.idx AS chunk_idx, c.h AS chunk_hash, c.n AS chunk_len
  FROM packed
)"""


def cdc_chunks_oracle_sql(
    window: int = 8,
    divisor: int = 32,
    table: str = "documents",
    text_expr: str = "text",
) -> str:
    return f"""
WITH {_chunks_cte(window, divisor, table, text_expr)}
SELECT doc_id, chunk_idx, chunk_hash, CAST(chunk_len AS BIGINT) AS chunk_len
FROM chunks ORDER BY doc_id, chunk_idx
"""


def cdc_shared_chunks_oracle_sql(
    window: int = 8,
    divisor: int = 32,
    min_len: int = 16,
    table: str = "documents",
    text_expr: str = "text",
) -> str:
    return f"""
WITH {_chunks_cte(window, divisor, table, text_expr)}
SELECT chunk_hash, CAST(chunk_len AS BIGINT) AS chunk_len,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_occ,
       MIN(doc_id) AS first_doc
FROM chunks
WHERE chunk_len >= {min_len}
GROUP BY chunk_hash, chunk_len
HAVING COUNT(DISTINCT doc_id) >= 2
ORDER BY chunk_hash
"""


__all__ = [
    "cdc_chunks",
    "cdc_shared_chunks",
    "cdc_chunks_oracle_sql",
    "cdc_shared_chunks_oracle_sql",
]
