"""OLAP cube aggregation over the event stream.

The reference's dashboards ask the same aggregate at several
granularities (per subject, per day, per subject-and-day, grand
total — db/get_aggregated_data_by_day.sql answers one of these per
call).  A CUBE computes all 2^k groupings in ONE pass over the data:
Spark plans it with a single Expand node (each input row fans out to
one row per grouping set, each with its own partial aggregate), so
raw data is scanned once and every aggregate is map-side-combined —
strictly cheaper at 100 TB than unioning per-granularity queries,
which would scan k times.

Totals stay exact int64 cents; the ALL sentinel (rather than NULL +
grouping_id) keys rollup rows, because GROUPING_ID bit order is an
engine-specific detail while COALESCE on non-null base columns is
portable arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cube_counts", "cube_oracle_sql"]


def cube_counts(events: DataFrame) -> DataFrame:
    """→ (event_type, day, n, sum_cents) for every grouping of the
    CUBE (event_type, day): detail cells, per-type totals, per-day
    totals, and the grand total, with 'ALL' marking the rolled-up
    dimension(s).  One scan, one Expand, one shuffle."""
    # ts IS NOT NULL (r11 advice): a NULL ts would yield day=NULL in
    # the BASE frame, which COALESCE then renders 'ALL' — colliding
    # with the genuine rollup rows and making the ORDER BY tie
    # engine-nondeterministic.
    base = events.filter(
        F.col("value").isNotNull()
        & F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
    ).select(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v_cents"),
    )
    return (
        base.cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v_cents").alias("sum_cents"),
        )
        .select(
            F.coalesce("event_type", F.lit("ALL")).alias("event_type"),
            F.coalesce("day", F.lit("ALL")).alias("day"),
            "n",
            "sum_cents",
        )
        .orderBy("event_type", "day")
    )


def cube_oracle_sql(table: str = "events") -> str:
    """DuckDB rendering — the same CUBE, the same ALL sentinels, the
    same integer cents (SUM CAST AS BIGINT per the type-strict oracle
    contract)."""
    return f"""
WITH base AS (
  SELECT event_type,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents
  FROM {table}
  WHERE value IS NOT NULL AND event_type IS NOT NULL AND ts IS NOT NULL
)
SELECT COALESCE(event_type, 'ALL') AS event_type,
       COALESCE(day, 'ALL') AS day,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v_cents) AS BIGINT) AS sum_cents
FROM base
GROUP BY CUBE (event_type, day)
ORDER BY event_type, day
"""
