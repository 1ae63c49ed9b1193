"""Gap-based sessionization of an event stream — the standard
"30 minutes of silence ends the session" analytics operator, the
complement of Q9's value-change state intervals
(operators/timeseries.py:272: islands by VALUE change; here islands by
TIME gap).

Plan shape: one window (lag + running sum) partitioned by the session
subject, then one map-side-combinable (subject, session) aggregate —
the same single-shuffle profile as Q8/Q9, so the same time-chunk
salting rewrite (timeseries.py:323) applies verbatim if one subject
dominates the stream.  Every output column is an integer or timestamp,
so the DuckDB oracle comparison is exact (no float rounding at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    subject_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """→ (subject, session_idx, session_start, session_end, n_events,
    duration_s).

    A new session starts at the first event of a subject and at every
    event whose gap from the previous event EXCEEDS ``gap_seconds``
    (a gap of exactly ``gap_seconds`` continues the session —
    boundary pinned by test and mirrored in the oracle).
    ``session_idx`` numbers a subject's sessions from 1 in time order;
    ties on the timestamp are broken by ``id_col`` so numbering is
    deterministic under duplicate timestamps.
    """
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be positive, got {gap_seconds}")
    order = [F.col(ts_col), F.col(id_col)]
    w = Window.partitionBy(subject_col).orderBy(*order)
    gap = F.unix_timestamp(F.col(ts_col)) - F.unix_timestamp(
        F.lag(ts_col).over(w)
    )
    is_new = F.when(
        gap.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(subject_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        events.select(subject_col, ts_col, id_col)
        .withColumn("session_idx", F.sum(is_new).over(running))
        .groupBy(subject_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .withColumn(
            "duration_s",
            F.unix_timestamp("session_end")
            - F.unix_timestamp("session_start"),
        )
    )


def sessionize_native(
    events: DataFrame,
    subject_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """The same sessionization via Spark's built-in
    ``session_window`` — the operator Structured Streaming uses for
    stateful session aggregation, usable identically in batch.

    → (subject, session_start, session_end_event, n_events) where
    ``session_end_event`` is the LAST EVENT time (the raw
    ``session_window.end`` is last event + gap; subtracting the gap
    makes the output comparable with ``sessionize``).

    Boundary contract MATCHES ``sessionize``: ``session_window``
    merges sessions whose windows overlap OR TOUCH (verified
    empirically — an event at exactly last_event + gap joins the
    session), i.e. a new session starts only when the gap strictly
    exceeds ``gap_seconds``.  The one divergence is precision:
    ``session_window`` compares exact microseconds while
    ``sessionize`` truncates to whole seconds, so sub-second data can
    split differently at knife-edge gaps.  On integer-second data
    ``sessionize(events, g)`` ≡ ``sessionize_native(events, g)`` —
    pinned by tests/test_sessions_lm.py.

    Scale: ``session_window`` is one hash aggregate with partial
    merge of [start, end) spans — no lag window, no running sum; in
    streaming it is the state-store-backed path
    (streaming/pipeline.py uses the same construct with a watermark).
    """
    sw = F.session_window(F.col(ts_col), f"{gap_seconds} seconds")
    return (
        events.groupBy(F.col(subject_col), sw.alias("sw"))
        .agg(F.count("*").alias("n_events"))
        .select(
            subject_col,
            F.col("sw.start").alias("session_start"),
            (
                F.col("sw.end")
                - F.expr(f"INTERVAL {gap_seconds} SECONDS")
            ).alias("session_end_event"),
            "n_events",
        )
    )


def sessionize_oracle_sql(
    gap_seconds: int = 1800,
    table: str = "events",
    subject_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB rendering of the same gap rule — kept adjacent to the
    Spark expression so the two evolve together."""
    return f"""
WITH flagged AS (
  SELECT {subject_col}, {ts_col}, {id_col},
         -- floor(epoch()) mirrors Spark's unix_timestamp second
         -- truncation so sub-second timestamps can't flip the gap test
         CASE WHEN floor(epoch({ts_col})) - floor(epoch(lag({ts_col}) OVER (
                  PARTITION BY {subject_col}
                  ORDER BY {ts_col}, {id_col}))) > {gap_seconds}
              OR lag({ts_col}) OVER (
                  PARTITION BY {subject_col}
                  ORDER BY {ts_col}, {id_col}) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM {table}
), numbered AS (
  SELECT {subject_col}, {ts_col},
         SUM(is_new) OVER (PARTITION BY {subject_col}
                           ORDER BY {ts_col}, {id_col}
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT {subject_col}, CAST(session_idx AS BIGINT) AS session_idx,
       MIN({ts_col}) AS session_start,
       MAX({ts_col}) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(floor(epoch(MAX({ts_col}))) - floor(epoch(MIN({ts_col})))
            AS BIGINT) AS duration_s
FROM numbered GROUP BY 1, 2
"""


def sessionize_native_oracle_sql(
    gap_seconds: int = 1800,
    table: str = "events",
    subject_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> str:
    """DuckDB rendering of ``sessionize_native``'s contract: new
    session iff the gap STRICTLY exceeds ``gap_seconds`` (windows
    that merely touch merge — verified against session_window).

    Spark's ``session_window`` merges at exact MICROSECOND precision
    (internal long micros), so the oracle compares ``epoch_us`` BIGINT
    differences — ``epoch()`` doubles would wobble ~2e-7 s at 2024
    epochs and could flip a knife-edge gap."""
    return f"""
WITH flagged AS (
  SELECT {subject_col}, {ts_col}, {id_col},
         CASE WHEN epoch_us({ts_col}) - epoch_us(lag({ts_col}) OVER (
                  PARTITION BY {subject_col}
                  ORDER BY {ts_col}, {id_col}))
                  > {gap_seconds} * 1000000
              OR lag({ts_col}) OVER (
                  PARTITION BY {subject_col}
                  ORDER BY {ts_col}, {id_col}) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM {table}
), numbered AS (
  SELECT {subject_col}, {ts_col},
         SUM(is_new) OVER (PARTITION BY {subject_col}
                           ORDER BY {ts_col}, {id_col}
                           ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
)
SELECT {subject_col},
       MIN({ts_col}) AS session_start,
       MAX({ts_col}) AS session_end_event,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM numbered GROUP BY {subject_col}, session_idx
"""


__all__ = [
    "sessionize",
    "sessionize_native",
    "sessionize_oracle_sql",
    "sessionize_native_oracle_sql",
]
