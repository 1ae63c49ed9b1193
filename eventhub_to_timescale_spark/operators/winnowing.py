"""Winnowing fingerprints — robust LOCAL document fingerprinting
(Schleimer, Wilkerson, Aiken 2003, "Winnowing: Local Algorithms for
Document Fingerprinting", the MOSS algorithm) and the near-duplicate
pair generator built on it.

Complements the repo's other dedup families: MinHash estimates GLOBAL
set-Jaccard, SimHash hashes a global term vector, the substring
operators find long verbatim repeats — winnowing instead selects, for
every ``w``-window of consecutive token-``k``-gram hashes, the MINIMUM
hash, guaranteeing that any shared substring of at least ``w + k − 1``
tokens contributes at least one IDENTICAL selected fingerprint to both
documents.  That makes it the candidate generator of choice for
partial-overlap detection (quotation, boilerplate, plagiarism-style
reuse) where global-similarity hashes dilute below threshold.

No analog in the reference repo — this is a training-data-pipeline
extension alongside dedup.py's families.

Determinism / oracle parity: the k-gram hash is the repo's md5-derived
``portable_hash32`` (functions/scalars.py:119), window selection is
``min`` over a value set both engines compute identically, and the
per-document fingerprint set is ``array_distinct`` of the selected
values — positions are deliberately dropped, so the rightmost-vs-
leftmost tie rule of the original algorithm (which exists to minimise
fingerprint DENSITY, not to change the selected value set) cannot
matter: ties select the same value.

100 TB posture:
- fingerprint extraction is projection-only array expressions over one
  corpus scan (``transform``/``slice``/``array_min`` — whole-stage
  codegen, no UDF, no shuffle);
- the pair stage is a banded EQUI-JOIN on the fingerprint value —
  never all-pairs; hot fingerprints (ubiquitous boilerplate k-grams)
  are pruned by document frequency (``max_df``) BEFORE the self-join,
  the standard winnowing-index mitigation, which bounds any single
  join key's fan-out to ``max_df²`` pairs;
- per-pair shared-count aggregation is map-side combinable on the
  (doc_a, doc_b) key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import portable_hash32

_TOKEN_RE = r"[a-z]+|[0-9]+"
_SEED = "winnow"


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """→ (doc_id, fp): the distinct winnowed fingerprints of each
    document — for every window of ``w`` consecutive token-``k``-gram
    hashes, the window minimum; documents with fewer than ``w``
    k-grams (but at least one) contribute the single minimum of all
    their k-gram hashes; documents with fewer than ``k`` tokens have
    no fingerprints and are absent from the output.
    """
    if k < 1 or w < 1:
        raise ValueError(f"k and w must be positive, got k={k} w={w}")
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0
    )
    base = (
        docs.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc_id"), toks.alias("_toks"))
        .filter(F.size(F.col("_toks")) >= k)
    )
    kgrams = F.transform(
        F.sequence(F.lit(1), F.size(F.col("_toks")) - (k - 1)),
        lambda j: F.array_join(F.slice(F.col("_toks"), j, k), " "),
    )
    hashed = base.select(
        "doc_id",
        F.transform(kgrams, lambda g: portable_hash32(g, _SEED)).alias(
            "_hv"
        ),
    )
    hv = F.col("_hv")
    wins = F.when(
        F.size(hv) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(hv) - (w - 1)),
            lambda i: F.array_min(F.slice(hv, i, w)),
        ),
    ).otherwise(F.array(F.array_min(hv)))
    return hashed.select(
        "doc_id", F.explode(F.array_distinct(wins)).alias("fp")
    )


def winnow_pairs(
    docs: DataFrame,
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_fps: bool = True,
) -> DataFrame:
    """→ (doc_a, doc_b, shared): candidate reuse pairs — documents
    sharing at least ``min_shared`` winnowed fingerprints, with
    fingerprints appearing in more than ``max_df`` documents pruned
    before the self-join (ubiquitous boilerplate k-grams are
    non-discriminative and would otherwise fan the equi-join out
    quadratically).  ``shared`` counts the surviving common
    fingerprints; ordered (doc_a, doc_b), doc_a < doc_b.

    ``persist_fps`` (default on, same caller-releases contract as
    minhash_lsh_pairs' ``persist_banded``) caches the fingerprint
    index: it feeds the df-count AND both self-join sides, so without
    the cache the md5 k-gram extraction re-scans the corpus 4×
    (measured in the plan).  The index is window-selected-hash-sized
    (≈ 2/(w+1) of the k-gram count), far smaller than the corpus text.
    """
    # count-only df prune FIRST (no collect_list: a ubiquitous
    # fingerprint must never accumulate per-group list state), then
    # self-equi-join the pruned index — every join key fans out to at
    # most max_df² pairs.
    fps = winnow_fingerprints(docs, k, w, text_col, id_col)
    if persist_fps:
        fps = fps.persist()
    rare = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp")
    )
    pruned = fps.join(rare, "fp")
    if persist_fps:
        # pruned is BOTH sides of the self-join: without the cache the
        # df-prune join (and the rare aggregate above it) re-runs once
        # per side per action.  Strictly smaller than fps — same
        # caller-releases contract.
        pruned = pruned.persist()
    a = pruned.select(
        F.col("fp"), F.col("doc_id").alias("doc_a")
    )
    b = pruned.select(
        F.col("fp"), F.col("doc_id").alias("doc_b")
    )
    return (
        a.join(b, "fp")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= min_shared)
        .orderBy("doc_a", "doc_b")
    )


def _fp_cte(
    k: int, w: int, text_expr: str, id_expr: str, table: str
) -> str:
    """DuckDB CTE text producing the same (doc_id, fp) rows."""
    return f"""
  WITH toks AS (
    SELECT {id_expr} AS doc_id,
           regexp_extract_all(lower({text_expr}), '{_TOKEN_RE}', 0) AS ts
    FROM {table} WHERE {text_expr} IS NOT NULL
  ), hs AS (
    SELECT doc_id,
           list_transform(
             list_transform(range(1, len(ts) - {k - 1} + 1),
               j -> array_to_string(list_slice(ts, j, j + {k - 1}), ' ')),
             g -> CAST(('0x' || substr(md5('{_SEED}' || g), 1, 8)) AS BIGINT)
           ) AS hv
    FROM toks WHERE len(ts) >= {k}
  ), wins AS (
    SELECT doc_id,
           CASE WHEN len(hv) >= {w}
                THEN list_transform(range(1, len(hv) - {w - 1} + 1),
                       i -> list_min(list_slice(hv, i, i + {w - 1})))
                ELSE [list_min(hv)] END AS mins
    FROM hs
  )
  SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM wins
"""


def winnow_fingerprints_oracle_sql(
    k: int = 5,
    w: int = 4,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``winnow_fingerprints`` — same tokenizer,
    same md5-derived k-gram hash, same window-min selection, same
    distinct-per-document fingerprint set."""
    return f"""
WITH fps AS ({_fp_cte(k, w, text_expr, id_expr, table)})
SELECT doc_id, fp FROM fps ORDER BY doc_id, fp
"""


def winnow_pairs_oracle_sql(
    k: int = 5,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 64,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``winnow_pairs`` — same fingerprints, same
    max_df prune, same ordered-pair shared count."""
    return f"""
WITH fps AS ({_fp_cte(k, w, text_expr, id_expr, table)}),
rare AS (
  SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {max_df}
),
pruned AS (
  SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS shared
FROM pruned a JOIN pruned b
  ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
ORDER BY doc_a, doc_b
"""


__all__ = [
    "winnow_fingerprints",
    "winnow_pairs",
    "winnow_fingerprints_oracle_sql",
    "winnow_pairs_oracle_sql",
]
