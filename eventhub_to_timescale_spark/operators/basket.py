"""Session-level co-occurrence mining (market-basket PMI).

Which event types co-occur in the same session more often than chance?
The classic association measure over sessionized activity: treat each
(user, session) as a basket of distinct event types and score every
type pair by pointwise mutual information

    pmi(a, b) = log( (n_ab * n_sessions) / (n_a * n_b) )

with support counts attached so downstream thresholds can prune rare
pairs.  This is the co-occurrence complement of the sequential
analytics (events_journey_trigrams orders steps; PMI ignores order).

Exactness: every count is an exact int64; the PMI double is one
log of a ratio of exact integers, computed with the same expression
shape in any engine — bit-identical, no float accumulation.

Scale posture (100 TB): sessionize is one lag window per user
(user-parallel); baskets are a distinct on (user, session, type) —
map-side combinable; the pair join fans each basket out to its
distinct-type pairs only (bounded by |event_types| per basket, NOT
basket length, because baskets hold distinct types).  Totals join is
a broadcast of one row per type plus one scalar.  No collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["basket_pmi", "basket_pmi_oracle_sql"]


def basket_pmi(
    events: DataFrame,
    gap_seconds: int = 1800,
    min_support: int = 2,
    persist_baskets: bool = True,
) -> DataFrame:
    """→ (type_a, type_b, n_ab, n_a, n_b, n_sessions, pmi) for every
    unordered type pair co-occurring in ≥ ``min_support`` sessions.

    ``persist_baskets`` (default on) caches the distinct basket frame
    — it feeds FOUR consumers (both sides of the pair join, the
    per-type totals, the session count), and without the boundary
    Catalyst re-runs the sessionization window per consumer: four
    full passes over raw events at 100 TB.  The cached frame is
    (user, session, type) — distinct-bounded, far smaller than the
    event log.  Same pattern as dedup.py's persist_banded."""
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    # Same session-assignment window as operators/sessions.py
    # sessionize(), inlined so membership comes out of ONE window pass
    # (sessionize aggregates sessions away; joining events back would
    # cost a second shuffle).
    from pyspark.sql import Window

    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    gap = F.unix_timestamp(F.col("ts")) - F.unix_timestamp(
        F.lag("ts").over(w)
    )
    is_new = F.when(
        gap.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    baskets = (
        events.select("user_id", "ts", "event_id", "event_type")
        .withColumn("session_idx", F.sum(is_new).over(running))
        .select("user_id", "session_idx", "event_type")
        .distinct()
    )
    if persist_baskets:
        baskets = baskets.persist()
    n_sessions = baskets.select("user_id", "session_idx").distinct().agg(
        F.count(F.lit(1)).alias("n_sessions")
    )
    if persist_baskets:
        # one row — but the lazy form re-runs the session distinct
        # (a full exchange over the basket frame) on every action
        n_sessions = n_sessions.persist()
    type_n = baskets.groupBy(F.col("event_type").alias("t")).agg(
        F.count(F.lit(1)).alias("n_t")
    )
    if persist_baskets:
        # type_n re-enters the result TWICE (as n_a and as n_b); the
        # lazy form re-aggregates the basket frame once per side per
        # action. |event_types| rows — same caller-releases contract.
        type_n = type_n.persist()
    a = baskets.select(
        "user_id", "session_idx", F.col("event_type").alias("type_a")
    )
    b = baskets.select(
        "user_id", "session_idx", F.col("event_type").alias("type_b")
    )
    pair_n = (
        a.join(b, ["user_id", "session_idx"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_support)
    )
    na = type_n.select(
        F.col("t").alias("type_a"), F.col("n_t").alias("n_a")
    )
    nb = type_n.select(
        F.col("t").alias("type_b"), F.col("n_t").alias("n_b")
    )
    return (
        pair_n.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            "n_a",
            "n_b",
            "n_sessions",
            F.round(
                F.log(
                    (F.col("n_ab") * F.col("n_sessions")).cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy("type_a", "type_b")
    )


def basket_pmi_oracle_sql(
    gap_seconds: int = 1800,
    min_support: int = 2,
    table: str = "events",
) -> str:
    """DuckDB rendering — same session assignment (truncated whole-
    second gaps, gap == threshold continues, (ts, event_id) order),
    same exact counts, same single-log arithmetic shape."""
    return f"""
WITH seq AS (
  SELECT user_id, event_type,
         CASE WHEN floor(epoch(ts))
                   - LAG(floor(epoch(ts))) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                   > {gap_seconds}
              OR LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new,
         ts, event_id
  FROM {table}
),
assigned AS (
  SELECT user_id, event_type,
         SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM seq
),
baskets AS (
  SELECT DISTINCT user_id, session_idx, event_type FROM assigned
),
ns AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions
  FROM (SELECT DISTINCT user_id, session_idx FROM baskets)
),
type_n AS (
  SELECT event_type AS t, CAST(COUNT(*) AS BIGINT) AS n_t
  FROM baskets GROUP BY event_type
),
pair_n AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM baskets a
  JOIN baskets b
    ON a.user_id = b.user_id AND a.session_idx = b.session_idx
   AND a.event_type < b.event_type
  GROUP BY 1, 2
  HAVING COUNT(*) >= {min_support}
)
SELECT p.type_a, p.type_b, p.n_ab, na.n_t AS n_a, nb.n_t AS n_b,
       ns.n_sessions,
       ROUND(ln(CAST(p.n_ab * ns.n_sessions AS DOUBLE)
                / CAST(na.n_t * nb.n_t AS DOUBLE)), 6) AS pmi
FROM pair_n p
JOIN type_n na ON na.t = p.type_a
JOIN type_n nb ON nb.t = p.type_b
CROSS JOIN ns
ORDER BY type_a, type_b
"""
