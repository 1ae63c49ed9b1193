"""Windowed trending top-k: per time bucket, the k most frequent
event types — the "what's hot per hour" dashboard query (extension
beyond the reference's per-subject aggregates, db/*.sql; framed as
such).

100 TB posture: the ONLY pass over raw events is a map-side-combinable
(bucket, type) count — one shuffle whose key space is |buckets| ×
|types|, thousands of rows at any corpus size.  The rank window then
runs on that aggregated frame, never on raw events, and is written as
rank-filter so WindowGroupLimit prunes to k rows per bucket on the map
side of the tiny second exchange.  Ties break by event_type ascending,
making the top-k total — both engines pick identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from eventhub_to_timescale_spark.functions.scalars import epoch_bucket


def trending_topk(
    events: DataFrame,
    bucket_seconds: int = 21600,
    k: int = 3,
) -> DataFrame:
    """→ (bucket_time, event_type, n_events, rk), rk = 1..k per
    bucket by descending count, ties by event_type."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    counts = events.groupBy(
        epoch_bucket(F.col("ts"), bucket_seconds).alias("bucket_time"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy("bucket_time").orderBy(
        F.desc("n_events"), F.asc("event_type")
    )
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .orderBy("bucket_time", "rk")
    )


def trending_topk_oracle_sql(
    bucket_seconds: int = 21600, k: int = 3
) -> str:
    """DuckDB rendering of ``trending_topk``."""
    return f"""
WITH counts AS (
  SELECT make_timestamp(CAST(floor(epoch(ts) / {bucket_seconds})
                             * {bucket_seconds} AS BIGINT) * 1000000)
           AS bucket_time,
         event_type, COUNT(*) AS n_events
  FROM events
  GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (
           PARTITION BY bucket_time
           ORDER BY n_events DESC, event_type) AS rk
  FROM counts
)
SELECT bucket_time, event_type, n_events, rk
FROM ranked WHERE rk <= {k}
ORDER BY bucket_time, rk
"""


__all__ = ["trending_topk", "trending_topk_oracle_sql"]
