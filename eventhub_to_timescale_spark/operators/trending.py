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


def journey_ngrams(
    events: DataFrame,
    n: int = 3,
    k: int = 20,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Behavioral sequence mining → (path, n_users, n_occurrences):
    the ``k`` most common length-``n`` event-type paths (consecutive
    per-user journeys, e.g. ``view>view>click``), ranked by distinct
    travellers then raw occurrences, ties to the lexicographic path.

    The product-analytics question behind funnels: which ORDERED
    paths actually happen (vs the funnel you hypothesized)?  n-grams
    over per-user event sequences are the standard mining primitive.

    Plan (one user-partitioned window + one agg + top-k):
    1. ``lead(type, i) OVER (PARTITION BY user ORDER BY ts, id)`` for
       i < n builds each row's forward path — one shuffle on user_id,
       the same partitioning every sessionize/funnel op reuses;
    2. complete paths groupBy-count with map-side combine; distinct
       travellers come from a (path, user) pre-aggregate, NOT
       countDistinct over raw rows;
    3. deterministic top-k via (n_users DESC, n_occurrences DESC,
       path ASC) — a total order, executed as TakeOrderedAndProject.

    100 TB posture: hot users are bounded by per-user event counts
    (the Q8-style time-chunk salting applies if one user dominates);
    the aggregate keyspace is |event_types|^n — tiny for real
    vocabularies; nothing collects to the driver.
    """
    if n < 2:
        raise ValueError(f"n must be >= 2, got {n}")
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(user_col).orderBy(
        F.col(ts_col), F.col(id_col)
    )
    steps = [F.col(type_col)] + [
        F.lead(type_col, i).over(w) for i in range(1, n)
    ]
    # the base row's own type participates too: with a NULL
    # event_type Spark's concat_ws would silently skip the NULL
    # (shortened path 'a>b') while a SQL || propagates NULL — rows
    # with ANY null step are excluded identically in both engines
    complete = None
    for s in steps:
        c = s.isNotNull()
        complete = c if complete is None else (complete & c)
    paths = (
        events.select(
            F.col(user_col).alias("_u"),
            F.concat_ws(">", *steps).alias("path"),
            complete.alias("_ok"),
        )
        .filter(F.col("_ok"))
    )
    per_user = paths.groupBy("path", "_u").agg(
        F.count("*").alias("_c")
    )
    return (
        per_user.groupBy("path")
        .agg(
            F.count("*").alias("n_users"),
            F.sum("_c").alias("n_occurrences"),
        )
        .orderBy(
            F.col("n_users").desc(),
            F.col("n_occurrences").desc(),
            F.col("path").asc(),
        )
        .limit(k)
    )


def journey_ngrams_oracle_sql(
    n: int = 3, k: int = 20, table: str = "events"
) -> str:
    """DuckDB rendering of ``journey_ngrams`` — identical window
    order, pre-aggregate and total-order top-k."""
    leads = ["event_type"] + [
        f"lead(event_type, {i}) OVER w" for i in range(1, n)
    ]
    path = " || '>' || ".join(leads)
    notnull = " AND ".join(
        ["event_type IS NOT NULL"]
        + [
            f"lead(event_type, {i}) OVER w IS NOT NULL"
            for i in range(1, n)
        ]
    )
    return f"""
WITH p AS (
  SELECT user_id AS u, {path} AS path,
         {notnull} AS ok
  FROM {table}
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), pu AS (
  SELECT path, u, count(*) AS c FROM p WHERE ok GROUP BY path, u
)
SELECT path, count(*) AS n_users, CAST(sum(c) AS BIGINT) AS n_occurrences
FROM pu GROUP BY path
ORDER BY n_users DESC, n_occurrences DESC, path ASC
LIMIT {k}
"""
