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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
        F.sequence(
            F.lit(1), F.length(t) - F.lit(window - 1), F.lit(stride)
        ),
        lambda i: t.substr(i, F.lit(window)),
    )
    return (
        docs.filter(t.isNotNull() & (F.length(t) >= window))
        .select(F.col(id_col).alias("_d"), F.explode(windows).alias("w"))
        .groupBy("w")
        .agg(
            F.countDistinct("_d").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(F.col("w").alias("window_text"), "n_docs", "n_occurrences")
    )


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


__all__ = ["repeated_windows", "repeated_windows_oracle_sql"]
