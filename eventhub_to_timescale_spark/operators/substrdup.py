"""Cross-document EXACT substring duplication — the substring-level
dedup modality (Lee et al., "Deduplicating Training Data Makes
Language Models Better"): find fixed-length character windows that
recur across documents (boilerplate banners, license headers, template
fragments) that document-level near-dup (MinHash/SimHash, whole-doc
Jaccard) structurally cannot see, because the hosts of a shared
200-char banner can be otherwise unrelated documents.

The full Lee et al. construction is a corpus-scale suffix array; the
Spark-native formulation is strided window fingerprinting:

1. per document, slice char windows ``[i, i+window)`` at stride ``s``
   (``Column.substr`` with column arguments — one codegen'd
   ``transform`` over a ``sequence``, no UDF);
2. explode and hash-group the window text: one shuffle whose key is
   the window itself; partial aggregation collapses each partition's
   repeats before the exchange;
3. keep windows seen in ≥ ``min_docs`` DISTINCT documents.

Stride trades recall for volume the usual way: a shared run of length
L ≥ window + stride − 1 is guaranteed to contribute at least one
IDENTICALLY-ALIGNED window pair when documents share the run at
offsets congruent mod stride; production corpora run stride ≈
window/4 and a second exact-extension pass over flagged documents.
At 100 TB the explode emits ~len/stride rows per document — linear,
scan-shaped, and the groupBy output is bounded by the number of
DISTINCT repeated windows, which boilerplate keeps tiny relative to
the corpus.

Shuffle-volume note (r8): the groupBy key is ``xxhash64(window)``
(8 bytes, JVM-native), not the raw window text — the exchange ships
one 8-byte key per occurrence instead of ``window`` chars (~6× less
at window=48); one representative text per group rides the map-side
partial-aggregation buffer via ``first(w)``, so it is paid once per
(group, partition), not once per occurrence. A 64-bit hash collision
merging two distinct windows needs ~2³² distinct windows in flight
(birthday bound); at that scale the flagged set is re-verified by the
span pass joining back through the same hash anyway.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _strided_offsets(t: Column, window: int, stride: int) -> Column:
    """1-based char offsets of every strided window of ``t``."""
    return F.sequence(
        F.lit(1), F.length(t) - F.lit(window - 1), F.lit(stride)
    )


def repeated_windows(
    docs: DataFrame,
    window: int = 48,
    stride: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (window_text, n_docs, n_occurrences): strided char windows
    appearing in at least ``min_docs`` distinct documents.
    ``n_occurrences`` counts every strided occurrence (a window
    repeated within one document counts each time)."""
    if window <= 0 or stride <= 0:
        raise ValueError(
            f"window and stride must be positive, got {window}/{stride}"
        )
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    t = F.col(text_col)
    windows = F.transform(
        _strided_offsets(t, window, stride),
        lambda i: t.substr(i, F.lit(window)),
    )
    return (
        docs.filter(t.isNotNull() & (F.length(t) >= window))
        .select(F.col(id_col).alias("_d"), F.explode(windows).alias("w"))
        # 8-byte shuffle key; one representative text per group rides
        # the partial-agg buffer (module docstring, shuffle-volume note)
        .groupBy(F.xxhash64("w").alias("_wh"))
        .agg(
            F.first("w").alias("window_text"),
            F.countDistinct("_d").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select("window_text", "n_docs", "n_occurrences")
    )


def repeated_window_spans(
    docs: DataFrame,
    window: int = 48,
    stride: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, char_start, char_end, n_windows): the REMOVABLE
    spans — per document, the coalesced union of every strided window
    whose text recurs in ≥ ``min_docs`` distinct documents. This is
    the operator the Lee et al. substring-dedup pipeline actually
    consumes: cut ``[char_start, char_end)`` (0-based, half-open) out
    of each document and the cross-document boilerplate is gone.

    Plan: (1) one strided-window explode keyed by ``xxhash64`` carrying
    the char offset; (2) the flagged-hash set (same aggregate as
    ``repeated_windows``, minus the text column — pure 8-byte rows);
    (3) an equi-join of occurrences against flagged hashes (the flagged
    set is the DISTINCT boilerplate vocabulary — tiny vs the corpus, so
    AQE broadcasts it in practice); (4) per-doc interval coalescing of
    the hit windows (gaps-and-islands via
    ``intervals.coalesce_intervals`` — one shuffle on doc_id).
    Overlapping/touching hits merge, so ``n_windows`` counts the
    flagged windows folded into each span."""
    if window <= 0 or stride <= 0:
        raise ValueError(
            f"window and stride must be positive, got {window}/{stride}"
        )
    if min_docs < 1:
        raise ValueError(f"min_docs must be >= 1, got {min_docs}")
    from eventhub_to_timescale_spark.operators.intervals import (
        coalesce_intervals,
    )

    t = F.col(text_col)
    # hash BEFORE the explode (inside the transform) so the exploded
    # rows carry (doc, pos, 8-byte hash) — the document text itself is
    # never replicated per occurrence
    occ = (
        docs.filter(t.isNotNull() & (F.length(t) >= window))
        .select(
            F.col(id_col).alias("_d"),
            F.explode(
                F.transform(
                    _strided_offsets(t, window, stride),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.xxhash64(t.substr(i, F.lit(window))).alias("_wh"),
                    ),
                )
            ).alias("o"),
        )
        .select("_d", F.col("o.pos").alias("pos"), F.col("o._wh").alias("_wh"))
    )
    flagged = (
        occ.groupBy("_wh")
        .agg(F.countDistinct("_d").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("_wh")
    )
    hits = occ.join(flagged, "_wh").select(
        F.col("_d").alias("measurement_subject"),
        (F.col("pos") - 1).cast("long").alias("start"),
        (F.col("pos") - 1 + window).cast("long").alias("end"),
    )
    return (
        coalesce_intervals(hits)
        .select(
            F.col("measurement_subject").alias("doc_id"),
            F.col("start").alias("char_start"),
            F.col("end").alias("char_end"),
            F.col("n_intervals").alias("n_windows"),
        )
        .orderBy("doc_id", "char_start")
    )


def remove_repeated_spans(
    docs: DataFrame,
    window: int = 48,
    stride: int = 16,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    order: bool = True,
) -> DataFrame:
    """→ (doc_id, clean_text, removed_chars): every document with its
    flagged cross-document boilerplate spans CUT OUT — the terminal
    step of the Lee et al. substring-dedup pipeline
    (``repeated_window_spans`` produces the spans; this applies them).
    Documents with no flagged spans pass through verbatim with
    ``removed_chars = 0``.

    Plan: spans collapse to one sorted array per doc (they are already
    disjoint — the span pass coalesced them), LEFT-join back to the
    corpus (the span side is the boilerplate-bearing subset — small,
    AQE broadcasts it), and one codegen'd ``aggregate`` fold slices
    the kept segments. The corpus is scanned once and never shuffled;
    only span rows move."""
    from pyspark.sql import Column

    spans = repeated_window_spans(
        docs, window, stride, min_docs, text_col, id_col
    )
    per_doc = spans.groupBy(F.col("doc_id").alias("_sd")).agg(
        F.sort_array(
            F.collect_list(F.struct("char_start", "char_end"))
        ).alias("_spans"),
        F.sum(F.col("char_end") - F.col("char_start")).alias("_cut"),
    )
    t = F.col(text_col)

    def fold(acc: Column, s: Column) -> Column:
        return F.struct(
            s["char_end"].alias("pos"),
            F.concat(
                acc["acc"],
                t.substr(
                    (acc["pos"] + 1).cast("int"),
                    (s["char_start"] - acc["pos"]).cast("int"),
                ),
            ).alias("acc"),
        )

    clean = F.aggregate(
        F.col("_spans"),
        F.struct(
            F.lit(0).cast("long").alias("pos"), F.lit("").alias("acc")
        ),
        fold,
        lambda acc: F.concat(
            acc["acc"],
            t.substr(
                (acc["pos"] + 1).cast("int"),
                (F.length(t) - acc["pos"]).cast("int"),
            ),
        ),
    )
    out = docs.join(
        per_doc, docs[id_col] == per_doc["_sd"], "left"
    ).select(
        F.col(id_col).alias("doc_id"),
        F.when(F.col("_spans").isNotNull(), clean)
        .otherwise(t)
        .alias("clean_text"),
        F.coalesce(F.col("_cut"), F.lit(0)).cast("long").alias(
            "removed_chars"
        ),
    )
    # ``order=False`` for pipeline composition (r16): the presentation
    # sort range-Exchanges the full cleaned text and AQE collapses the
    # tiny bench-scale shuffle to ONE partition — the span-surgery fold
    # and every later pipeline stage then ran single-threaded off a
    # 1-partition boundary leaf.  Standalone/oracled callers keep the
    # sorted contract (default).
    return out.orderBy("doc_id") if order else out


def repeated_windows_oracle_sql(
    window: int = 48,
    stride: int = 16,
    min_docs: int = 2,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``repeated_windows``."""
    return f"""
WITH w AS (
  SELECT {id_expr} AS d,
         substring({text_expr}, CAST(i AS INTEGER), {window}) AS w
  FROM {table},
       UNNEST(generate_series(1, length({text_expr}) - {window - 1},
                              {stride})) AS t(i)
  WHERE {text_expr} IS NOT NULL AND length({text_expr}) >= {window}
)
SELECT w AS window_text,
       COUNT(DISTINCT d) AS n_docs,
       COUNT(*) AS n_occurrences
FROM w
GROUP BY 1
HAVING COUNT(DISTINCT d) >= {min_docs}
"""


def repeated_window_spans_oracle_sql(
    window: int = 48,
    stride: int = 16,
    min_docs: int = 2,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``repeated_window_spans``: same strided
    windows (grouped by TEXT — the oracle is the collision-free
    definition the hashed Spark plan must reproduce), joined back to
    occurrences, merged with the same gaps-and-islands construction as
    ``intervals.coalesce_oracle_sql``."""
    from eventhub_to_timescale_spark.operators.intervals import (
        coalesce_oracle_sql,
    )

    iv_cte = f"""
  WITH occ AS (
    SELECT {id_expr} AS d, CAST(i AS BIGINT) AS pos,
           substring({text_expr}, CAST(i AS INTEGER), {window}) AS w
    FROM {table},
         UNNEST(generate_series(1, length({text_expr}) - {window - 1},
                                {stride})) AS t(i)
    WHERE {text_expr} IS NOT NULL AND length({text_expr}) >= {window}
  ), rep AS (
    SELECT w FROM occ GROUP BY w HAVING COUNT(DISTINCT d) >= {min_docs}
  )
  SELECT occ.d AS measurement_subject,
         occ.pos - 1 AS start,
         occ.pos - 1 + {window} AS "end"
  FROM occ JOIN rep USING (w)
"""
    inner = coalesce_oracle_sql(iv_cte)
    return f"""
SELECT measurement_subject AS doc_id,
       start AS char_start,
       "end" AS char_end,
       n_intervals AS n_windows
FROM ({inner})
ORDER BY doc_id, char_start
"""


def remove_repeated_spans_oracle_sql(
    window: int = 48,
    stride: int = 16,
    min_docs: int = 2,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``remove_repeated_spans``: the kept text is
    the ordered concatenation of the complement segments (LAG over the
    sorted spans + a per-doc tail segment)."""
    spans = repeated_window_spans_oracle_sql(
        window, stride, min_docs, text_expr, id_expr, table
    )
    return f"""
WITH s AS ({spans}),
seg AS (
  SELECT doc_id,
         COALESCE(LAG(char_end) OVER (PARTITION BY doc_id
                                      ORDER BY char_start), 0) AS a,
         char_start AS b
  FROM s
  UNION ALL
  SELECT doc_id, MAX(char_end) AS a, NULL AS b FROM s GROUP BY doc_id
),
cut AS (
  SELECT seg.doc_id,
         string_agg(substring(d.{text_expr}, CAST(seg.a + 1 AS INTEGER),
                    CAST(COALESCE(seg.b, length(d.{text_expr})) - seg.a
                         AS INTEGER)),
                    '' ORDER BY seg.a) AS clean_text
  FROM seg JOIN {table} d ON d.{id_expr} = seg.doc_id
  GROUP BY seg.doc_id
),
cutlen AS (
  SELECT doc_id, CAST(SUM(char_end - char_start) AS BIGINT) AS removed
  FROM s GROUP BY doc_id
)
SELECT d.{id_expr} AS doc_id,
       COALESCE(cut.clean_text, d.{text_expr}) AS clean_text,
       COALESCE(cutlen.removed, 0) AS removed_chars
FROM {table} d
LEFT JOIN cut ON cut.doc_id = d.{id_expr}
LEFT JOIN cutlen ON cutlen.doc_id = d.{id_expr}
ORDER BY doc_id
"""


__all__ = [
    "repeated_windows",
    "repeated_windows_oracle_sql",
    "repeated_window_spans",
    "repeated_window_spans_oracle_sql",
    "remove_repeated_spans",
    "remove_repeated_spans_oracle_sql",
]
