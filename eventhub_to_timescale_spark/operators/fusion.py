"""Reciprocal Rank Fusion — hybrid retrieval's standard rank merge
(Cormack, Clarke & Büttcher, SIGIR 2009: "Reciprocal rank fusion
outperforms Condorcet and individual rank learning methods").

A curation pipeline pulls topic slices with BOTH a lexical ranker
(BM25, operators/text.py) and a dense ranker (embedding cosine,
operators/similarity.py); RRF merges the two ranked lists without
score calibration — each list contributes 1/(k + rank), so a document
near the top of ANY list surfaces, and k (default 60, the paper's
value) damps the head's dominance.

Cross-engine exactness: the contribution is the INTEGER division
10⁹ div (k + rank) — no float ever accumulates, so the fused order is
total ((rrf_nanos DESC, doc_id)) and bit-identical in DuckDB.

100 TB posture: inputs are already top-k frames (tiny); the fusion
is a unionByName + one map-side-combinable groupBy over ≤ Σkᵢ rows +
a TakeOrderedAndProject — nothing corpus-scale touches this
operator.  At deployment scale the per-ranker top-k's do the heavy
lifting (BM25's broadcast-stats scan, the ANN bucket probes); fusion
cost is negligible by construction.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rrf_fuse"]

_SCALE = 1_000_000_000  # nano-units: 10^9 div (k + rank) stays exact


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    top_n: int = 20,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists → (doc_id, rrf_nanos, n_lists, best_rank),
    rrf_nanos = Σ over lists of 10⁹ div (k + rank), ordered
    (rrf_nanos DESC, doc_id), LIMIT ``top_n``.

    Each input frame needs ``id_col`` and a 1-based ``rank_col``
    (rank 1 = best).  ``n_lists`` = how many lists the document
    appeared in; ``best_rank`` = its best single-list rank — the two
    standard fusion diagnostics."""
    if not rankings:
        raise ValueError("need at least one ranking frame")
    if k < 1 or top_n < 1:
        raise ValueError(f"need k ≥ 1 and top_n ≥ 1, got {k}, {top_n}")
    parts = [
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(rank_col).cast("long").alias("_r"),
        )
        for df in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), parts)
    return (
        u.groupBy("doc_id")
        .agg(
            F.sum(F.expr(f"{_SCALE} DIV ({k} + _r)"))
            .cast("long")
            .alias("rrf_nanos"),
            F.count(F.lit(1)).alias("n_lists"),
            F.min("_r").alias("best_rank"),
        )
        .orderBy(F.desc("rrf_nanos"), "doc_id")
        .limit(top_n)
    )


def rrf_fuse_oracle_sql(
    ranking_sqls: list[str],
    k: int = 60,
    top_n: int = 20,
) -> str:
    """DuckDB rendering: each ``ranking_sqls`` entry must yield
    (doc_id, rank); same integer contributions, same total order."""
    unioned = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, rank FROM ({sql})" for sql in ranking_sqls
    )
    return f"""
WITH unioned AS (
  {unioned}
)
SELECT doc_id,
       CAST(SUM({_SCALE} // ({k} + rank)) AS BIGINT) AS rrf_nanos,
       CAST(COUNT(*) AS BIGINT) AS n_lists,
       CAST(MIN(rank) AS BIGINT) AS best_rank
FROM unioned
GROUP BY doc_id
ORDER BY rrf_nanos DESC, doc_id
LIMIT {top_n}
"""
