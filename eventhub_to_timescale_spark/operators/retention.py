"""Cohort retention over the raw event stream — the canonical
product-analytics rollup every events table eventually answers:
"of the users whose FIRST activity fell in cohort bucket C, how many
were active again k buckets later?"

Extension beyond the reference's own query surface (its Grafana
functions are per-subject time series; SURVEY.md §2.6), framed as
such — but it runs on the same events/conditions data and is the
next query a deployment of this engine asks.

Plan shape (no self-join — the textbook formulation joins the events
table to a per-user-min subquery, shuffling the fact table twice):

1. distinct (user, bucket) activity grid — one shuffle, map-side
   combinable (the fact volume collapses to |users|×|active buckets|
   immediately);
2. cohort bucket = ``min(bucket) OVER (PARTITION BY user)`` — a
   window over the SAME user-keyed partitioning; with
   ``spark.sql.execution.removeRedundantSorts`` and exchange reuse
   this adds zero extra Exchanges on the user axis beyond a hash
   repartition of the (already tiny) grid;
3. k = bucket-difference from cohort; groupBy (cohort, k) counts
   DISTINCT users — exact because a (user, bucket) pair appears once
   in the grid, so ``count(*)`` ≡ ``count(distinct user)`` and the
   aggregate stays map-side combinable (no distinct-agg expansion).

100 TB posture: the only pass over the raw facts is step 1's partial
aggregate; everything after runs on the user-bucket grid (bounded by
users × lifetime buckets, orders of magnitude smaller). Hot-user skew
is irrelevant — the grid has one row per (user, bucket) regardless of
how many raw events a user generated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """→ (cohort, k, n_users): users whose first-ever activity bucket
    is ``cohort`` and who were active in bucket ``cohort + k``
    (``k = 0`` row is the cohort size itself).  Buckets are
    origin-aligned epoch floors rendered as timestamps."""
    if bucket_seconds <= 0:
        raise ValueError(
            f"bucket_seconds must be positive, got {bucket_seconds}"
        )
    b = F.floor(
        F.unix_micros(F.col(ts_col)) / F.lit(bucket_seconds * 1_000_000)
    ).cast("long")
    grid = (
        events.filter(F.col(ts_col).isNotNull())
        .select(F.col(user_col).alias("u"), b.alias("b"))
        .distinct()
    )
    w = Window.partitionBy("u")
    return (
        grid.withColumn("cohort_b", F.min("b").over(w))
        .groupBy(
            F.timestamp_seconds(
                F.col("cohort_b") * bucket_seconds
            ).alias("cohort"),
            (F.col("b") - F.col("cohort_b")).cast("long").alias("k"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def cohort_retention_oracle_sql(
    user_expr: str = "user_id",
    ts_expr: str = "ts",
    bucket_seconds: int = 86400,
    table: str = "events",
) -> str:
    """DuckDB rendering of ``cohort_retention``."""
    return f"""
WITH grid AS (
  SELECT DISTINCT {user_expr} AS u,
         CAST(floor(epoch({ts_expr}) / {bucket_seconds}) AS BIGINT) AS b
  FROM {table}
  WHERE {ts_expr} IS NOT NULL
), cohorts AS (
  SELECT u, b, MIN(b) OVER (PARTITION BY u) AS cohort_b FROM grid
)
SELECT make_timestamp(cohort_b * {bucket_seconds} * 1000000) AS cohort,
       b - cohort_b AS k,
       COUNT(*) AS n_users
FROM cohorts
GROUP BY 1, 2
"""


__all__ = ["cohort_retention", "cohort_retention_oracle_sql"]
