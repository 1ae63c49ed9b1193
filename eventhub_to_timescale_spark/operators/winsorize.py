"""Winsorized (clipped) robust statistics per group.

Training-data pipelines clip reward/metric columns at tail quantiles
before aggregation so a handful of corrupt readings can't drag a mean
(the reference's sensor streams have exactly this failure mode: a
glow/emon meter glitch emits one absurd kWh spike).  This operator
winsorizes ``value`` at the [q_lo, q_hi] ORDER STATISTICS per
event_type and reports the clipped aggregate.

Order statistics, not interpolated percentiles, on purpose: the k-th
smallest value (k = ceil(q*n)) is an actual data point, computed with
pure integer arithmetic on value-cents — so Spark and any oracle
engine agree bit-for-bit, where interpolated quantiles differ in
last-ulp float details across engines.

Scale posture (100 TB): pass 1 ranks values inside a per-type window —
parallel across types, a straggler if one type dominates (swap in the
mergeable GK sketch from operators/sketches.py for the bounds at that
point; the clip/aggregate pass is unchanged).  Pass 2 is a broadcast
join of one bounds row per type followed by a map-side-combinable
aggregate — no second sort, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["winsorized_stats", "winsorize_oracle_sql"]


def winsorized_stats(
    events: DataFrame,
    q_lo: float = 0.05,
    q_hi: float = 0.95,
    *,
    value_col: str = "value",
    group_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """→ (event_type, n, lo_cents, hi_cents, n_clipped_lo,
    n_clipped_hi, wmean) per group, where lo/hi are the ceil(q*n)-th
    order statistics of value-cents, n_clipped_* count rows replaced
    by a bound, and wmean is the winsorized mean in original units
    (exact int64 cents sum / n / 100, rounded to 6 dp)."""
    if not 0.0 < q_lo < q_hi < 1.0:
        raise ValueError(f"need 0 < q_lo < q_hi < 1, got {q_lo}, {q_hi}")
    base = events.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col).alias("event_type"),
        F.floor(F.col(value_col) * 100 + F.lit(0.5))
        .cast("long")
        .alias("v_cents"),
        F.col(id_col).alias("_id"),
    )
    w = Window.partitionBy("event_type").orderBy("v_cents", "_id")
    wn = Window.partitionBy("event_type")
    ranked = base.select(
        "event_type",
        "v_cents",
        F.row_number().over(w).alias("rank"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    bounds = (
        ranked.filter(
            (F.col("rank") == F.ceil(F.lit(q_lo) * F.col("n")))
            | (F.col("rank") == F.ceil(F.lit(q_hi) * F.col("n")))
        )
        .groupBy("event_type")
        .agg(
            F.min("v_cents").alias("lo_cents"),
            F.max("v_cents").alias("hi_cents"),
        )
    )
    clamped = base.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "lo_cents",
        "hi_cents",
        F.greatest(
            F.col("lo_cents"), F.least(F.col("hi_cents"), F.col("v_cents"))
        ).alias("w_cents"),
        (F.col("v_cents") < F.col("lo_cents")).cast("long").alias("_lo"),
        (F.col("v_cents") > F.col("hi_cents")).cast("long").alias("_hi"),
    )
    agg = clamped.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.first("lo_cents").alias("lo_cents"),
        F.first("hi_cents").alias("hi_cents"),
        F.sum("_lo").alias("n_clipped_lo"),
        F.sum("_hi").alias("n_clipped_hi"),
        F.sum("w_cents").alias("sum_cents"),
    )
    wmean = agg["sum_cents"].cast("double") / agg["n"] / F.lit(100.0)
    return agg.select(
        "event_type",
        "n",
        "lo_cents",
        "hi_cents",
        "n_clipped_lo",
        "n_clipped_hi",
        F.round(wmean, 6).alias("wmean"),
    ).orderBy("event_type")


def winsorize_oracle_sql(
    q_lo: float = 0.05, q_hi: float = 0.95, table: str = "events"
) -> str:
    """DuckDB rendering — same integer cents, same ceil(q*n) order
    statistics, same clamp, same s/n/100 arithmetic shape."""
    return f"""
WITH base AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents,
         event_id
  FROM {table} WHERE value IS NOT NULL
),
ranked AS (
  SELECT event_type, v_cents,
         ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY v_cents, event_id) AS rank,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM base
),
bounds AS (
  SELECT event_type,
         MIN(v_cents) AS lo_cents,
         MAX(v_cents) AS hi_cents
  FROM ranked
  WHERE rank = CAST(ceil({q_lo} * n) AS BIGINT)
     OR rank = CAST(ceil({q_hi} * n) AS BIGINT)
  GROUP BY event_type
),
clamped AS (
  SELECT b.event_type, o.lo_cents, o.hi_cents,
         greatest(o.lo_cents, least(o.hi_cents, b.v_cents)) AS w_cents,
         CASE WHEN b.v_cents < o.lo_cents THEN 1 ELSE 0 END AS is_lo,
         CASE WHEN b.v_cents > o.hi_cents THEN 1 ELSE 0 END AS is_hi
  FROM base b JOIN bounds o USING (event_type)
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(lo_cents) AS lo_cents,
       MIN(hi_cents) AS hi_cents,
       CAST(SUM(is_lo) AS BIGINT) AS n_clipped_lo,
       CAST(SUM(is_hi) AS BIGINT) AS n_clipped_hi,
       ROUND(CAST(SUM(w_cents) AS DOUBLE) / COUNT(*) / 100.0, 6) AS wmean
FROM clamped
GROUP BY event_type
ORDER BY event_type
"""
