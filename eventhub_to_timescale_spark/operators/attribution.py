"""Conversion attribution over sessionized event streams.

Which touchpoint gets credit for a conversion?  The two classical
single-touch models over gap-sessionized activity:

* **first-touch** — the event type that OPENED the session containing
  the conversion;
* **last-touch** — the event type immediately PRECEDING the first
  conversion event of the session ('(direct)' when the conversion
  itself opened the session).

Only each session's FIRST conversion converts (a session is one
attribution unit); sessions without a conversion contribute nothing.
Deterministic by construction: positions come from a dense
ROW_NUMBER over the total (ts, event_id) order, so "first" and
"immediately preceding" are unique rows, not tie-broken floats.

Scale posture (100 TB): ONE shuffle — the session-assignment window,
the position window, and the per-session conditional aggregate all
share the user_id partitioning (the extra windows add zero
exchanges); the model-level count runs on the per-session frame
(bounded by session count) and the output is |models| x |types|
rows.  No collect, no join-back to raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["conversion_attribution", "attribution_oracle_sql"]


def conversion_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    gap_seconds: int = 1800,
) -> DataFrame:
    """→ (model, touch_type, conversions) for model in
    {'first_touch', 'last_touch'}, ordered."""
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    order = [F.col("ts"), F.col("event_id")]
    w = Window.partitionBy("user_id").orderBy(*order)
    gap = F.unix_timestamp(F.col("ts")) - F.unix_timestamp(
        F.lag("ts").over(w)
    )
    is_new = F.when(
        gap.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    assigned = events.select(
        "user_id", "ts", "event_id", "event_type"
    ).withColumn("session_idx", F.sum(is_new).over(running))
    ws = Window.partitionBy("user_id", "session_idx").orderBy(*order)
    pos = assigned.select(
        "user_id",
        "session_idx",
        "event_type",
        F.row_number().over(ws).alias("rn"),
    )
    wconv = Window.partitionBy("user_id", "session_idx")
    tagged = pos.withColumn(
        "conv_rn",
        F.min(
            F.when(F.col("event_type") == conversion_type, F.col("rn"))
        ).over(wconv),
    )
    sessions = (
        tagged.filter(F.col("conv_rn").isNotNull())
        .groupBy("user_id", "session_idx")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias(
                "first_touch"
            ),
            F.max(
                F.when(
                    F.col("rn") == F.col("conv_rn") - 1,
                    F.col("event_type"),
                )
            ).alias("_prev"),
        )
        .select(
            "first_touch",
            F.coalesce("_prev", F.lit("(direct)")).alias("last_touch"),
        )
    )
    first = sessions.groupBy(
        F.lit("first_touch").alias("model"),
        F.col("first_touch").alias("touch_type"),
    ).agg(F.count(F.lit(1)).alias("conversions"))
    last = sessions.groupBy(
        F.lit("last_touch").alias("model"),
        F.col("last_touch").alias("touch_type"),
    ).agg(F.count(F.lit(1)).alias("conversions"))
    return first.unionByName(last).orderBy("model", "touch_type")


def attribution_oracle_sql(
    conversion_type: str = "purchase",
    gap_seconds: int = 1800,
    table: str = "events",
) -> str:
    """DuckDB rendering — same session assignment, same dense
    positions, same first/previous-row selection."""
    return f"""
WITH seq AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN floor(epoch(ts))
                   - LAG(floor(epoch(ts))) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                   > {gap_seconds}
              OR LAG(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM {table}
),
assigned AS (
  SELECT user_id, ts, event_id, event_type,
         SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM seq
),
pos AS (
  SELECT user_id, session_idx, event_type,
         ROW_NUMBER() OVER (
           PARTITION BY user_id, session_idx
           ORDER BY ts, event_id) AS rn
  FROM assigned
),
tagged AS (
  SELECT *,
         MIN(CASE WHEN event_type = '{conversion_type}' THEN rn END)
           OVER (PARTITION BY user_id, session_idx) AS conv_rn
  FROM pos
),
sessions AS (
  SELECT user_id, session_idx,
         MAX(CASE WHEN rn = 1 THEN event_type END) AS first_touch,
         COALESCE(
           MAX(CASE WHEN rn = conv_rn - 1 THEN event_type END),
           '(direct)') AS last_touch
  FROM tagged
  WHERE conv_rn IS NOT NULL
  GROUP BY 1, 2
)
SELECT model, touch_type, CAST(COUNT(*) AS BIGINT) AS conversions
FROM (
  SELECT 'first_touch' AS model, first_touch AS touch_type
  FROM sessions
  UNION ALL
  SELECT 'last_touch' AS model, last_touch AS touch_type
  FROM sessions
)
GROUP BY 1, 2
ORDER BY model, touch_type
"""
