"""Interval coalescing (gaps-and-islands union) — the set-algebra
complement of the range join: merge each subject's overlapping or
touching half-open intervals ``[start, end)`` into maximal islands.

TimescaleDB users run this shape for alarm blackout windows, SLA
maintenance unions, and liveness islands (``heartbeat_agg``'s
``live_ranges()``); a training pipeline runs it to merge span
annotations. The reference's own state-interval query (Q9,
db/get_intervals.sql semantics) produces the *partition* of time per
subject; this operator produces the *union* of arbitrary possibly-
overlapping intervals.

Plan shape (the classic two-window gaps-and-islands, all codegen'd):

1. per subject, order intervals by (start, end);
2. an interval starts a new island iff its start exceeds the running
   maximum of every earlier end (``max(end) OVER (... ROWS UNBOUNDED
   PRECEDING AND 1 PRECEDING)``) — the running max, NOT ``lag(end)``,
   because an early long interval can swallow many later short ones;
3. island id = running sum of the new-island flags;
4. one groupBy (subject, island) → (min start, max end, count).

100 TB posture: both windows and the final aggregate share ONE
partitioning on ``measurement_subject`` — a single shuffle; the
aggregate is map-side combinable. Hot-subject skew has Q8/Q9's shape
and would take the same time-chunk salting rewrite with per-chunk
boundary repair (a chunk's only cross-boundary state is its running
max end — one row per chunk).

Touching intervals merge: ``[1,2) ∪ [2,3) = [1,3)`` — half-open union
semantics, consistent with rangejoin.py where touching intervals do
NOT overlap (union and overlap legitimately differ on the boundary).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def coalesce_intervals(intervals: DataFrame) -> DataFrame:
    """(measurement_subject, start, end) → maximal merged islands
    ``(measurement_subject, start, end, n_intervals)``.

    Degenerate intervals (start >= end) are dropped up front, matching
    rangejoin.py's half-open convention."""
    w_order = Window.partitionBy("measurement_subject").orderBy(
        "start", "end"
    )
    running_max_end = F.max("end").over(
        w_order.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = F.when(
        running_max_end.isNull() | (F.col("start") > running_max_end),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        intervals.filter(F.col("start") < F.col("end"))
        .withColumn("_new", new_island)
        .withColumn(
            "_island",
            F.sum("_new").over(
                w_order.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("measurement_subject", "_island")
        .agg(
            F.min("start").alias("start"),
            F.max("end").alias("end"),
            F.count(F.lit(1)).alias("n_intervals"),
        )
        .drop("_island")
    )


def live_intervals(
    conditions: DataFrame,
    of: str = "value",
    tolerance_seconds: int = 3600,
) -> DataFrame:
    """Liveness islands — Toolkit ``heartbeat_agg → live_ranges()``:
    every measurement proves the subject alive for
    ``tolerance_seconds``, so the islands are the coalesced union of
    the per-beat ``[t, t + tol)`` intervals.

    → (measurement_subject, start, end, n_intervals) at full
    microsecond precision (``end = beat + tol`` via interval
    arithmetic — no second-truncation; ``toolkit.heartbeat_uptime``
    is the second-truncated SCALAR counterpart of this island view,
    so their totals agree to within one second per island).
    """
    if tolerance_seconds <= 0:
        raise ValueError(
            f"tolerance_seconds must be positive, got {tolerance_seconds}"
        )
    beats = conditions.filter(
        (F.col("measurement_of") == of)
        & F.col("measurement_number").isNotNull()
    ).select(
        "measurement_subject",
        F.col("timestamp").alias("start"),
        (
            F.col("timestamp")
            + F.expr(f"INTERVAL {int(tolerance_seconds)} SECOND")
        ).alias("end"),
    )
    return coalesce_intervals(beats)


def coalesce_oracle_sql(
    intervals_cte: str, merge_touching: bool = True
) -> str:
    """DuckDB rendering of ``coalesce_intervals`` over a CTE named
    ``iv(measurement_subject, start, "end")``."""
    cmp = ">" if merge_touching else ">="
    return f"""
WITH iv AS ({intervals_cte}),
flagged AS (
  SELECT measurement_subject, start, "end",
         CASE WHEN start {cmp} MAX("end") OVER (
                PARTITION BY measurement_subject ORDER BY start, "end"
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              OR MAX("end") OVER (
                PARTITION BY measurement_subject ORDER BY start, "end"
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
         THEN 1 ELSE 0 END AS new_island
  FROM iv
  WHERE start < "end"
),
islands AS (
  SELECT *,
         SUM(new_island) OVER (
             PARTITION BY measurement_subject ORDER BY start, "end"
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
)
SELECT measurement_subject, MIN(start) AS start, MAX("end") AS "end",
       COUNT(*) AS n_intervals
FROM islands
GROUP BY measurement_subject, island
"""


__all__ = ["coalesce_intervals", "live_intervals", "coalesce_oracle_sql"]
