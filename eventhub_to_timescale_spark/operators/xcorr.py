"""Lag-k activity cross-correlation between event-type pairs.

"Does type A's activity lead type B's by one bucket?" — the classic
co-movement question over sensor/event streams (the TimescaleDB
toolkit the reference leans on ships `corr()` for the lag-0 case;
`stats_agg` 2D accumulates the same five sums this module keeps).

Semantics: bucket each type's EVENT COUNT into fixed windows on a
dense grid spanning [min_bucket, max_bucket] (missing buckets count
0 — a silent gap is real inactivity, not missing data), then for each
ordered pair (a < b) and each lag in [-max_lag, +max_lag], Pearson
correlation between x = count_a(t) and y = count_b(t + lag) over the
grid positions where both are defined (n = n_buckets - |lag|).

Everything up to the final division is EXACT int64 arithmetic
(counts, their products, the five sums), so the correlation doubles
are a pure function of the data — engine-independent bit-for-bit:

    r = (n·Σxy − Σx·Σy) / sqrt((n·Σx² − (Σx)²) · (n·Σy² − (Σy)²))

Overflow headroom: a bucket count c ≤ 2^20 (a million events per type
per bucket) gives c² ≤ 2^40; 2^22 buckets still keep Σx² < 2^62.

Scale posture (100 TB): raw events are touched ONCE by a map-side-
combinable (type, bucket) count; the dense grid is a broadcast
`sequence` spanning two scalar aggregates; the lag self-join runs on
the aggregated frame (|types| × |buckets| rows — millions at most,
never event-scale) keyed on exact bucket ids.  No windows over raw
data, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["activity_xcorr", "xcorr_oracle_sql"]


def activity_xcorr(
    events: DataFrame,
    bucket_seconds: int = 21600,
    max_lag: int = 2,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    persist_counts: bool = True,
) -> DataFrame:
    """→ (type_a, type_b, lag, n, r) for every unordered type pair
    (type_a < type_b) and lag in [-max_lag, max_lag]; r is NULL when
    either side is constant over the overlap (zero variance)."""
    if bucket_seconds <= 0 or max_lag < 0:
        raise ValueError(
            f"need bucket_seconds > 0 and max_lag >= 0, got "
            f"{bucket_seconds}, {max_lag}"
        )
    counts = (
        events.filter(F.col(type_col).isNotNull())
        .select(
            F.col(type_col).alias("etype"),
            # FLOOR division, explicitly, on both engines (r11 advice):
            # cast-after-divide truncates toward zero, which would put
            # pre-1970 (negative-epoch) timestamps in the NEXT bucket
            # instead of the previous one. floor() is the conventional
            # time-bucket alignment and is pinned cross-engine by
            # tests/test_xcorr.py::
            # test_negative_epoch_buckets_floor_and_match_oracle.
            F.floor(F.unix_timestamp(ts_col) / F.lit(bucket_seconds))
            .cast("long")
            .alias("b"),
        )
        .groupBy("etype", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    if persist_counts:
        # counts feeds THREE consumers (span, the type list, the
        # dense grid join); the boundary keeps the raw-event scan to
        # exactly one. Cached frame is |types| x |buckets| rows.
        counts = counts.persist()
    # NOTE: `dense` below is also persisted under this flag — it is
    # BOTH sides of the lag self-join, so the lazy form evaluates the
    # grid-join subplan twice per action (measured: 14 jobs/action at
    # sf0.1, guide §2.4 duplicated-subtree). Cached frame is the same
    # |types| x |buckets| rows as counts.
    span = counts.agg(
        F.min("b").alias("blo"), F.max("b").alias("bhi")
    )
    grid = (
        span.select(
            F.explode(F.sequence("blo", "bhi")).alias("b")
        )
        .crossJoin(
            F.broadcast(counts.select("etype").distinct())
        )
    )
    dense = grid.join(counts, ["etype", "b"], "left").select(
        "etype", "b", F.coalesce("c", F.lit(0)).alias("c")
    )
    if persist_counts:
        dense = dense.persist()
    lags = F.explode(
        F.sequence(F.lit(-max_lag), F.lit(max_lag))
    ).alias("lag")
    a = dense.select(
        F.col("etype").alias("type_a"),
        F.col("b").alias("ba"),
        F.col("c").alias("x"),
    ).select("*", lags)
    bside = dense.select(
        F.col("etype").alias("type_b"),
        F.col("b").alias("bb"),
        F.col("c").alias("y"),
    )
    joined = a.join(
        bside,
        on=[
            F.col("type_a") < F.col("type_b"),
            F.col("bb") == F.col("ba") + F.col("lag"),
        ],
    )
    agg = joined.groupBy("type_a", "type_b", "lag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (agg["n"] * agg["sxy"] - agg["sx"] * agg["sy"]).cast("double")
    vx = (agg["n"] * agg["sxx"] - agg["sx"] * agg["sx"]).cast("double")
    vy = (agg["n"] * agg["syy"] - agg["sy"] * agg["sy"]).cast("double")
    r = F.when(
        (vx > 0) & (vy > 0), num / F.sqrt(vx * vy)
    )
    return agg.select(
        "type_a",
        "type_b",
        "lag",
        "n",
        F.round(r, 6).alias("r"),
    ).orderBy("type_a", "type_b", "lag")


def xcorr_oracle_sql(
    bucket_seconds: int = 21600,
    max_lag: int = 2,
    table: str = "events",
) -> str:
    """DuckDB rendering — same integer bucket ids, same dense grid,
    same five exact int64 sums, same n·Σxy−ΣxΣy / sqrt(...) shape."""
    return f"""
WITH counts AS (
  SELECT event_type AS etype,
         CAST(floor(floor(epoch(ts)) / {bucket_seconds}) AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM {table} WHERE event_type IS NOT NULL
  GROUP BY 1, 2
),
span AS (SELECT MIN(b) AS blo, MAX(b) AS bhi FROM counts),
grid AS (
  SELECT t.etype, g.b
  FROM (SELECT DISTINCT etype FROM counts) t,
       (SELECT unnest(generate_series(blo, bhi)) AS b FROM span) g
),
dense AS (
  SELECT g.etype, g.b, COALESCE(c.c, 0) AS c
  FROM grid g LEFT JOIN counts c ON c.etype = g.etype AND c.b = g.b
),
lagged AS (
  SELECT a.etype AS type_a, y.etype AS type_b, l.lag,
         a.c AS x, y.c AS y
  FROM dense a
  JOIN (SELECT unnest(generate_series(-{max_lag}, {max_lag})) AS lag) l
    ON TRUE
  JOIN dense y
    ON a.etype < y.etype AND y.b = a.b + l.lag
),
agg AS (
  SELECT type_a, type_b, lag,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM lagged GROUP BY 1, 2, 3
)
SELECT type_a, type_b, CAST(lag AS INT) AS lag, n,
       ROUND(CASE WHEN (n * sxx - sx * sx) > 0
                   AND (n * syy - sy * sy) > 0
             THEN CAST(n * sxy - sx * sy AS DOUBLE)
                  / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                         * CAST(n * syy - sy * sy AS DOUBLE))
             END, 6) AS r
FROM agg
ORDER BY type_a, type_b, lag
"""
