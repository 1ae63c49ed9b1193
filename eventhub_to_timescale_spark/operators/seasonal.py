"""Classical seasonal decomposition (additive moving-average method —
the "classical decomposition" of Makridakis/Hyndman forecasting texts,
the same model statsmodels' ``seasonal_decompose`` implements) over
bucketed event series: value = trend + seasonal + residual.

The timeseries-analytics extension beside the reference's aggregation
queries (SURVEY §2.3 covers bucketed averages; decomposition is the
diagnostic layered on them — no reference analog): trend is the
centered moving average over one full period, the seasonal component
is the phase-mean of the detrended series re-centered to sum to ~0,
and the residual is what remains — the input to anomaly detection
(operators/anomaly.py) once level and season are removed.

Cross-engine exactness (the repo's micro-unit staging rule): every
stage keeps an exact BIGINT micro-value and performs ONE
double-division + round per derived quantity — bucket level =
round(Σ event micro-values / n), trend = round(Σ bucket micros /
window count), phase mean = round(Σ detrended micros / phase count),
centering = round(Σ phase means / phase cardinality).  Two identical
BIGINTs divide to the identical double in both engines, so each
rounding is deterministic and downstream subtraction stays exact
integer arithmetic — no float accumulation ever crosses engines.

100 TB posture: the raw corpus aggregates once into the bucket series
(map-side combinable groupBy); everything after operates on the
BUCKET-sized frame — one ordered window per series for the trend, a
phase-keyed aggregation bounded by ``period`` rows per series, and a
broadcast-sized join back.  Corpus size never enters the window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import epoch_bucket

MICRO = 1_000_000


def seasonal_decompose(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_col: str = "event_type",
    bucket_seconds: int = 3600,
    period: int = 24,
) -> DataFrame:
    """→ (group, bucket, value, trend, seasonal, residual) per
    ``bucket_seconds`` bucket and series: additive classical
    decomposition with the textbook centered moving-average trend —
    for even ``period`` the 2×period MA (period+1 points, HALF weight
    on both endpoints, so every phase contributes weight exactly 1;
    a plain mean would bias the trend by phase), for odd ``period``
    the plain period-point mean (NULL at series edges where the
    window is incomplete, the standard convention) — and a
    phase-mean seasonal component
    re-centered so one period sums to ~0.  ``residual = value − trend
    − seasonal`` is NULL exactly where ``trend`` is.  All components
    are micro-unit-exact doubles (6 dp).
    """
    if period < 2:
        raise ValueError(f"period must be ≥ 2, got {period}")
    half = period // 2
    even = period % 2 == 0
    v = F.col(value_col)
    bucket = epoch_bucket(F.col(ts_col), bucket_seconds)
    series = (
        events.filter(v.isNotNull())
        .groupBy(
            F.col(group_col).alias("grp"), bucket.alias("bucket")
        )
        .agg(
            F.sum(F.round(v * MICRO).cast("long")).alias("_vsum"),
            F.count(F.lit(1)).alias("_vn"),
        )
        .select(
            "grp",
            "bucket",
            F.round(F.col("_vsum") / F.col("_vn"))
            .cast("long")
            .alias("v_micro"),
        )
    )
    # classical centered MA: for EVEN period the window spans
    # period+1 points with HALF weight on both endpoints (the 2×m MA
    # of the textbooks) so every phase contributes exactly weight 1 —
    # a plain (period+1)-point mean would bias the trend by phase
    # (the endpoint phase appears twice); for ODD period the plain
    # period-point mean is already phase-balanced.
    npts = period + 1 if even else period  # window always spans ±half
    w = Window.partitionBy("grp").orderBy("bucket").rowsBetween(-half, half)
    s_win = F.sum("v_micro").over(w)
    n_win = F.count(F.lit(1)).over(w)
    if even:
        trend_expr = F.round(
            (
                2 * s_win
                - F.first("v_micro").over(w)
                - F.last("v_micro").over(w)
            )
            / F.lit(2 * period)
        ).cast("long")
    else:
        trend_expr = F.round(s_win / F.lit(period)).cast("long")
    with_trend = series.select(
        "grp",
        "bucket",
        "v_micro",
        F.when(n_win == npts, trend_expr).alias("trend_micro"),
        # bucket epochs are exact multiples of bucket_seconds, so the
        # truncating casts are exact integer arithmetic
        (
            (
                (F.unix_micros(F.col("bucket")) / F.lit(1_000_000))
                .cast("long")
                / F.lit(bucket_seconds)
            ).cast("long")
            % F.lit(period)
        ).alias("phase"),
    )
    phase_means = (
        with_trend.filter(F.col("trend_micro").isNotNull())
        .groupBy("grp", "phase")
        .agg(
            F.sum(F.col("v_micro") - F.col("trend_micro")).alias("_dsum"),
            F.count(F.lit(1)).alias("_dn"),
        )
        .select(
            "grp",
            "phase",
            F.round(F.col("_dsum") / F.col("_dn"))
            .cast("long")
            .alias("s_raw"),
        )
    )
    centered = (
        phase_means.groupBy("grp")
        .agg(
            F.sum("s_raw").alias("_ssum"),
            F.count(F.lit(1)).alias("_sn"),
        )
        .select(
            "grp",
            F.round(F.col("_ssum") / F.col("_sn"))
            .cast("long")
            .alias("s_adj"),
        )
    )
    seasonal = phase_means.join(F.broadcast(centered), "grp").select(
        "grp",
        "phase",
        (F.col("s_raw") - F.col("s_adj")).alias("seasonal_micro"),
    )
    out = with_trend.join(
        F.broadcast(seasonal), ["grp", "phase"], "left"
    )
    to_d = lambda c: (F.col(c) / F.lit(float(MICRO)))  # noqa: E731
    return out.select(
        F.col("grp").alias(group_col),
        "bucket",
        to_d("v_micro").alias("value"),
        to_d("trend_micro").alias("trend"),
        to_d("seasonal_micro").alias("seasonal"),
        F.when(
            F.col("trend_micro").isNotNull()
            & F.col("seasonal_micro").isNotNull(),
            (
                F.col("v_micro")
                - F.col("trend_micro")
                - F.col("seasonal_micro")
            )
            / F.lit(float(MICRO)),
        ).alias("residual"),
    ).orderBy(group_col, "bucket")


def seasonal_decompose_oracle_sql(
    value_expr: str = "value",
    ts_expr: str = "ts",
    group_expr: str = "event_type",
    bucket_seconds: int = 3600,
    period: int = 24,
    table: str = "events",
) -> str:
    """DuckDB rendering of ``seasonal_decompose`` — identical
    micro-unit staging: same bucket arithmetic, same ROWS window,
    same one-division-then-round rule at every stage."""
    half = period // 2
    even = period % 2 == 0
    win = period + 1 if even else period  # window spans ±half rows
    if even:
        # 2×period centered MA: half weight on both window endpoints
        trend_sql = (
            "CAST(round((2 * SUM(v_micro) OVER w "
            "- first_value(v_micro) OVER w "
            "- last_value(v_micro) OVER w) * 1.0 "
            f"/ {2 * period}) AS BIGINT)"
        )
    else:
        trend_sql = (
            f"CAST(round(SUM(v_micro) OVER w * 1.0 / {period}) AS BIGINT)"
        )
    return f"""
WITH series AS (
  SELECT {group_expr} AS grp,
         make_timestamp(CAST(floor(epoch({ts_expr}) / {bucket_seconds})
                        AS BIGINT) * {bucket_seconds} * 1000000) AS bucket,
         CAST(round(SUM(CAST(round({value_expr} * {MICRO}) AS BIGINT))
                    / COUNT(*)) AS BIGINT) AS v_micro
  FROM {table}
  WHERE {value_expr} IS NOT NULL
  GROUP BY 1, 2
), t AS (
  SELECT grp, bucket, v_micro,
         CASE WHEN COUNT(*) OVER w = {win}
              THEN {trend_sql}
         END AS trend_micro,
         (CAST(floor(epoch(bucket)) AS BIGINT)
             // {bucket_seconds}) % {period} AS phase
  FROM series
  WINDOW w AS (PARTITION BY grp ORDER BY bucket
               ROWS BETWEEN {half} PRECEDING AND {half} FOLLOWING)
), pm AS (
  SELECT grp, phase,
         CAST(round(SUM(v_micro - trend_micro) * 1.0 / COUNT(*))
              AS BIGINT) AS s_raw
  FROM t WHERE trend_micro IS NOT NULL
  GROUP BY 1, 2
), adj AS (
  SELECT grp,
         CAST(round(SUM(s_raw) * 1.0 / COUNT(*)) AS BIGINT) AS s_adj
  FROM pm GROUP BY 1
), sea AS (
  SELECT pm.grp, pm.phase, pm.s_raw - adj.s_adj AS seasonal_micro
  FROM pm JOIN adj USING (grp)
)
SELECT t.grp AS {group_expr}, t.bucket,
       CAST(t.v_micro AS DOUBLE) / {MICRO} AS value,
       CAST(t.trend_micro AS DOUBLE) / {MICRO} AS trend,
       CAST(sea.seasonal_micro AS DOUBLE) / {MICRO} AS seasonal,
       CASE WHEN t.trend_micro IS NOT NULL
                 AND sea.seasonal_micro IS NOT NULL
            THEN CAST(t.v_micro - t.trend_micro - sea.seasonal_micro
                      AS DOUBLE) / {MICRO}
       END AS residual
FROM t LEFT JOIN sea ON sea.grp = t.grp AND sea.phase = t.phase
ORDER BY t.grp, t.bucket
"""


__all__ = ["seasonal_decompose", "seasonal_decompose_oracle_sql"]


def phase_profile(
    events: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_col: str = "event_type",
    bucket_seconds: int = 3600,
    period: int = 24,
) -> DataFrame:
    """→ (grp, phase, prof_micro): the CAUSAL seasonal model — mean
    value per (series, phase-of-period) over history, micro-unit
    exact (one division+round over exact integer sums).

    ``seasonal_decompose``'s centered-MA trend needs FUTURE buckets,
    so it cannot score a live row; this profile is the
    leakage-free alternative a deployed monitor fits on history and
    applies in-flight (streaming/anomaly.py:
    streaming_deseasonalized_outliers).  Bounded output:
    |groups| × period rows.
    """
    v = F.col(value_col)
    phase = (
        (
            (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000)).cast("long")
            / F.lit(bucket_seconds)
        ).cast("long")
        % F.lit(period)
    )
    return (
        events.filter(v.isNotNull())
        .groupBy(F.col(group_col).alias("grp"), phase.alias("phase"))
        .agg(
            F.sum(F.round(v * MICRO).cast("long")).alias("_s"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "grp",
            "phase",
            F.round(F.col("_s") / F.col("_n")).cast("long").alias("prof_micro"),
        )
    )


def deseasonalized_rows(
    events: DataFrame,
    profile: DataFrame,
    value_col: str = "value",
    ts_col: str = "ts",
    group_col: str = "event_type",
    id_col: str = "event_id",
    bucket_seconds: int = 3600,
    period: int = 24,
) -> DataFrame:
    """→ (id, group, value, dev): each row's deviation from its
    series' phase profile (exact integer subtraction, /1e6 double) —
    the deseasonalized signal the MAD rule then scores.  Stateless
    projection + one broadcast join, so it applies identically to a
    batch frame and a live stream."""
    v = F.col(value_col)
    phase = (
        (
            (F.unix_micros(F.col(ts_col)) / F.lit(1_000_000)).cast("long")
            / F.lit(bucket_seconds)
        ).cast("long")
        % F.lit(period)
    )
    return (
        events.filter(v.isNotNull())
        .select(
            F.col(id_col),
            F.col(group_col).alias("grp"),
            v.alias("value"),
            F.round(v * MICRO).cast("long").alias("_vm"),
            phase.alias("phase"),
        )
        .join(F.broadcast(profile), ["grp", "phase"])
        .select(
            id_col,
            F.col("grp").alias(group_col),
            "value",
            ((F.col("_vm") - F.col("prof_micro")) / F.lit(float(MICRO)))
            .alias("dev"),
        )
    )
