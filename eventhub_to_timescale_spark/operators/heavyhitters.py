"""Exact φ-heavy hitters over document tokens via the two-phase
candidate-then-verify plan (the distributed formulation of the
Misra–Gries / frequent-items problem, cf. Cormode & Hadjieleftheriou
2008 "Finding frequent items in data streams": any item with global
frequency > N/(k+1) must exceed the LOCAL threshold N_p/(k+1) in at
least one partition p — weighted pigeonhole — so per-partition
frequent items are a complete candidate set and one exact recount of
that tiny set removes the false positives).

Unlike a sketch, the answer is EXACT (the same rows DuckDB's plain
GROUP BY/HAVING produces) while doing strictly less work than a
global term count at scale:

100 TB posture:
- phase 1 groups on (partition_id, term) — every group lives in one
  input partition, so the partial aggregation completes map-side and
  the shuffle carries per-partition vocabularies, not occurrences;
  the candidate filter then keeps ≤ k+1 items per partition
  (Σ c_p(t) = N_p bounds how many terms can exceed N_p/(k+1));
- phase 2 re-scans the corpus once with a BROADCAST semi-join on the
  ≤ (k+1)·P candidate set and counts exactly — the only global
  aggregation ever performed is over candidate rows.
- output is partitioning-INDEPENDENT despite phase 1 reading
  spark_partition_id(): candidates vary with the partitioning, but
  the exact phase-2 recount + global threshold make false positives
  vanish and the pigeonhole guarantees no false negatives.

No reference analog (extension family beside operators/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.text import _TOKEN_RE


def frequent_terms(
    docs: DataFrame,
    k: int = 200,
    text_col: str = "text",
    stage_phase1: bool = True,
) -> DataFrame:
    """→ (term, freq): every token whose corpus occurrence count
    strictly exceeds N/(k+1) (N = total token occurrences) — the
    exact φ=1/(k+1) heavy-hitter set, most frequent first (ties by
    term ASC).  At most k terms can qualify, by definition of the
    threshold.

    ``stage_phase1`` (r15): the phase-1 per-partition vocabulary —
    the Misra–Gries summary state a production job would store — is
    materialized once as an eager ``localCheckpoint`` leaf; the
    candidate filter, the partition totals AND the global N all
    derive from it, so each action re-scans the corpus exactly once
    (phase 2).  Without it the plan re-ran the corpus explode four
    times (phase-2 side, per-partition counts, the partition-total
    re-aggregation of the same subplan, and a separate global COUNT —
    ReuseExchange can't share them across differing prunings).  Pass
    ``False`` to keep the whole chain lazy/recomputable."""
    if k < 1:
        raise ValueError(f"k must be positive, got {k}")
    toks = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(_TOKEN_RE), 0
    )
    occ = docs.select(F.explode(toks).alias("term"))
    # phase 1: per-partition exact counts → local pigeonhole filter
    per_part = (
        occ.select(F.spark_partition_id().alias("_pid"), "term")
        .groupBy("_pid", "term")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    if stage_phase1:
        # mechanism session-selectable (operators/boundary.py)
        from eventhub_to_timescale_spark.operators.boundary import (
            stage_boundary,
        )

        per_part = stage_boundary(per_part)
    part_totals = per_part.groupBy("_pid").agg(
        F.sum("_c").alias("_np")
    )
    candidates = (
        per_part.join(part_totals, "_pid")
        .filter(F.col("_c") * (k + 1) > F.col("_np"))
        .select("term")
        .distinct()
    )
    # phase 2: exact recount of the bounded candidate set.  N is the
    # sum of the phase-1 partial counts — identical to COUNT(*) over
    # occ (every occurrence is counted in exactly one (_pid, term)
    # group) without a third corpus scan; coalesce covers the
    # empty-corpus frame (SUM→NULL where COUNT was 0 — the result is
    # empty either way, but keep the comparison well-typed)
    totals = per_part.agg(
        F.coalesce(F.sum("_c"), F.lit(0).cast("bigint")).alias("_n")
    )
    return (
        occ.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(totals))
        .filter(F.col("freq") * (k + 1) > F.col("_n"))
        .select("term", "freq")
        .orderBy(F.col("freq").desc(), "term")
    )


def frequent_terms_oracle_sql(
    k: int = 200, text_expr: str = "text", table: str = "documents"
) -> str:
    """DuckDB rendering of ``frequent_terms`` — the plain exact GROUP
    BY/HAVING the two-phase plan is guaranteed to equal."""
    return f"""
WITH occ AS (
  SELECT unnest(regexp_extract_all(lower({text_expr}), '{_TOKEN_RE}', 0))
             AS term
  FROM {table}
), n AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS total FROM occ
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
FROM occ CROSS JOIN n
GROUP BY term, n.total
HAVING COUNT(*) * {k + 1} > n.total
ORDER BY freq DESC, term
"""


__all__ = ["frequent_terms", "frequent_terms_oracle_sql"]
