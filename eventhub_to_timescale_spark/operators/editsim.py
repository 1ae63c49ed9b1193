"""Edit-distance similarity join: near-identical document pairs under
a Levenshtein threshold, found by character q-gram blocking + exact
verification — the entity-resolution / fuzzy-matching primitive
(Gravano et al. 2001 "Approximate String Joins in a Database (Almost)
for Free" — the q-gram count filter; the verify step is exact
Levenshtein, which Spark and DuckDB both implement with the standard
Wagner–Fischer semantics, so the distance is integer-identical
cross-engine).

Relation to the other dedup families: MinHash/winnowing measure
SET/LOCAL token overlap and are robust to reordering; the edit
distance is the CHARACTER-level metric that catches small in-place
mutations (typos, version bumps, injected tokens) and is the standard
join predicate in record linkage.

Completeness bound (q-gram lemma): two strings within edit distance
``d`` share at least ``max(len_a, len_b) − q + 1 − q·d`` q-grams —
positive whenever the strings are longer than ``q·(d+1) − 1`` chars,
so for documents at least that long, blocking on "shares ≥ 1 distinct
q-gram" loses nothing, and the ``min_shared`` knob only trades recall
below the lemma's guarantee (kept at 1 by default).
``max_df`` prunes q-grams present in more than that many documents
before the self-join — ubiquitous q-grams are non-discriminative and
would fan the equi-join out quadratically; documents connected ONLY
through pruned q-grams are missed, the standard blocking trade
documented here and tested against brute force.

100 TB posture: candidates come from a banded equi-join on the q-gram
(never all-pairs; per-key fan-out ≤ max_df²); the expensive exact
Levenshtein runs ONLY on candidate pairs, JVM-side
(``F.levenshtein``); the q-gram index persists under the
caller-releases contract (it feeds the df-count and both join sides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def qgram_set(text, q: int):
    """Distinct character q-grams of ``lower(text)`` as an array
    column expression.  Texts shorter than ``q`` yield an EMPTY array:
    without the guard, ``sequence(1, 0)`` steps DOWN to ``[1, 0]``
    (Spark's default step is −1 when start > stop), emitting a
    spurious truncated q-gram that DuckDB's empty ``range(1, 1)``
    never produces — a cross-engine parity break on short docs."""
    t = F.lower(text)
    return F.when(
        F.length(t) >= q,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(t) - (q - 1)),
                lambda i: F.substring(t, i, q),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


def edit_distance_pairs(
    docs: DataFrame,
    max_distance: int = 3,
    q: int = 4,
    min_shared: int = 1,
    max_df: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist_index: bool = True,
    stage: bool = True,
) -> DataFrame:
    """→ (doc_a, doc_b, distance): document pairs whose texts are
    within ``max_distance`` Levenshtein edits, doc_a < doc_b, ordered.
    Candidates must share ≥ ``min_shared`` distinct q-grams (each
    appearing in ≤ ``max_df`` documents); see the module docstring
    for the completeness bound and the blocking trade.

    ``stage=True`` (r16 optimization, guide §2.4/§5 — the minhash/KMV
    staged-frame pattern): eagerly ``localCheckpoint`` the text frame
    and the df-pruned q-gram index.  Before, the committed r15 profile
    showed the corpus subtree referenced ~6× in one action — the
    parquet scan + round-robin exchange re-ran for both verify sides,
    and the ``rare`` df-aggregate was computed once per self-join side
    (persist caches data but leaves the full logical tree under every
    consumer).  Staged, the corpus is read ONCE (at the text boundary)
    and the gram index + df-prune run ONCE; both self-join sides and
    both verify sides read checkpoint leaves.  At deployment scale the
    boundaries are the stored blocking-index tables of a record-linkage
    pipeline.  ``stage=False`` keeps the fully-lazy recomputable form
    (oracle comparison / fault-tolerant clusters)."""
    if max_distance < 0 or q < 1:
        raise ValueError(
            f"need max_distance ≥ 0 and q ≥ 1, got {max_distance}, {q}"
        )
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    )
    if stage:
        # ONE corpus scan: the gram index and both verify sides all
        # read this leaf (mechanism session-selectable —
        # operators/boundary.py)
        from eventhub_to_timescale_spark.operators.boundary import (
            stage_boundary,
        )

        base = stage_boundary(base)
    grams = base.select(
        "_id", F.explode(qgram_set(F.col("_txt"), q)).alias("g")
    )
    if persist_index:
        grams = grams.persist()
    rare = (
        grams.groupBy("g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("g")
    )
    pruned = grams.join(rare, "g")
    if stage:
        # one gram-explode + df-prune pass; the self-join reads leaves
        pruned = stage_boundary(pruned)
        if persist_index:
            # the gram cache is fully consumed by the eager checkpoint
            # above — release it here instead of leaving it to the
            # caller (nothing downstream re-reads it)
            grams.unpersist()
    a = pruned.select("g", F.col("_id").alias("doc_a"))
    b = pruned.select("g", F.col("_id").alias("doc_b"))
    cand = (
        a.join(b, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("_shared"))
        .filter(F.col("_shared") >= min_shared)
    )
    ta = base.select(
        F.col("_id").alias("doc_a"), F.col("_txt").alias("_ta")
    )
    tb = base.select(
        F.col("_id").alias("doc_b"), F.col("_txt").alias("_tb")
    )
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        # cheap exact pre-filter: |len_a − len_b| ≤ d bounds the
        # distance from below, skipping the O(n·d) verify for rows
        # that cannot qualify
        .filter(
            F.abs(F.length(F.lower("_ta")) - F.length(F.lower("_tb")))
            <= max_distance
        )
        .withColumn(
            "distance", F.levenshtein(F.lower("_ta"), F.lower("_tb"))
        )
        .filter(F.col("distance") <= max_distance)
        .select("doc_a", "doc_b", "distance")
        .orderBy("doc_a", "doc_b")
    )


def edit_distance_pairs_oracle_sql(
    max_distance: int = 3,
    q: int = 4,
    min_shared: int = 1,
    max_df: int = 64,
    text_expr: str = "text",
    id_expr: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``edit_distance_pairs`` — same q-gram set,
    same df prune and shared-count blocking, same exact Levenshtein
    verify."""
    return f"""
WITH base AS (
  SELECT {id_expr} AS id, lower({text_expr}) AS txt
  FROM {table} WHERE {text_expr} IS NOT NULL
),
grams AS (
  SELECT id, unnest(list_distinct(list_transform(
             range(1, GREATEST(length(txt) - {q - 1}, 0) + 1),
             i -> substring(txt, CAST(i AS INTEGER), {q})))) AS g
  FROM base
),
rare AS (
  SELECT g FROM grams GROUP BY g HAVING COUNT(*) <= {max_df}
),
pruned AS (
  SELECT gr.id, gr.g FROM grams gr JOIN rare USING (g)
),
cand AS (
  SELECT a.id AS doc_a, b.id AS doc_b
  FROM pruned a JOIN pruned b ON a.g = b.g AND a.id < b.id
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_shared}
)
SELECT c.doc_a, c.doc_b,
       CAST(levenshtein(ta.txt, tb.txt) AS INTEGER) AS distance
FROM cand c
JOIN base ta ON ta.id = c.doc_a
JOIN base tb ON tb.id = c.doc_b
WHERE abs(length(ta.txt) - length(tb.txt)) <= {max_distance}
  AND levenshtein(ta.txt, tb.txt) <= {max_distance}
ORDER BY doc_a, doc_b
"""


__all__ = ["edit_distance_pairs", "edit_distance_pairs_oracle_sql", "qgram_set"]
