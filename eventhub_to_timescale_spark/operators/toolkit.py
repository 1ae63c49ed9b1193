"""Timescale-Toolkit-parity temporal aggregates the reference's stack
offers around its own queries (toolkit ``counter_agg``, financial
``candlestick_agg``/``ohlc``, ``stats_agg`` regression) — re-expressed
as pure Spark window/aggregate plans.  Extensions beyond the
reference's own SQL surface (like the as-of and range joins), framed
as such: a TimescaleDB user migrating to this engine keeps these
queries.

All three operators are UDF-free — lag/window + groupBy aggregates,
fully codegen'd, one shuffle each on the natural (subject, bucket)
grain.

100 TB posture: each plan shuffles once on ``measurement_subject``
(window) and re-aggregates map-side-combinably on (subject, bucket).
Hot-subject skew has the same shape as Q8/Q9 and would take the same
time-chunk salting rewrite (operators/timeseries.py:323) — the window
carries one row of state (the previous sample), so a per-chunk
boundary repair is a single broadcastable summary per chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import epoch_bucket


def _measure_order():
    # deterministic tie-break mirrors the DuckDB oracle ORDER BY
    return [F.col("timestamp"), F.col("measurement_unique_id")]


def counter_delta(
    conditions: DataFrame,
    of: str = "value",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Counter-reset-aware increase per (subject, bucket) — Timescale
    Toolkit ``counter_agg → delta()`` semantics: a monotonic counter
    that can reset to ~0 (process restart).  For consecutive samples
    (prev, cur) within a subject, the contribution of ``cur`` is
    ``cur - prev`` when the counter advanced, else ``cur`` (a reset is
    assumed to restart from zero).  The first sample of a subject
    contributes nothing (no baseline).  Contributions are summed into
    the bucket of the CURRENT sample.

    → (measurement_subject, time, counter_delta) rounded to 6 dp.
    """
    w = Window.partitionBy("measurement_subject").orderBy(*_measure_order())
    samples = (
        conditions.filter(
            (F.col("measurement_of") == of)
            & F.col("measurement_number").isNotNull()
        )
        .select(
            "measurement_subject",
            "timestamp",
            "measurement_unique_id",
            F.col("measurement_number").alias("v"),
        )
        .withColumn("prev_v", F.lag("v").over(w))
    )
    contrib = F.when(F.col("prev_v").isNull(), F.lit(0.0)).otherwise(
        F.when(F.col("v") >= F.col("prev_v"), F.col("v") - F.col("prev_v"))
        .otherwise(F.col("v"))
    )
    return (
        samples.withColumn("contrib", contrib)
        .groupBy(
            "measurement_subject",
            epoch_bucket(F.col("timestamp"), bucket_seconds).alias("time"),
        )
        .agg(F.round(F.sum("contrib"), 6).alias("counter_delta"))
    )


def ohlc(
    conditions: DataFrame,
    of: str = "value",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Open/high/low/close per (subject, bucket) — Timescale
    ``candlestick_agg``.  Open/close are the first/last samples by
    (timestamp, measurement_unique_id); the struct-ordered
    ``min_by``/``max_by`` keeps the whole thing one map-side-combinable
    aggregate (no window, no second shuffle).

    → (measurement_subject, time, open, high, low, close).
    """
    order_key = F.struct(
        F.col("timestamp"), F.col("measurement_unique_id")
    )
    return (
        conditions.filter(
            (F.col("measurement_of") == of)
            & F.col("measurement_number").isNotNull()
        )
        .groupBy(
            "measurement_subject",
            epoch_bucket(F.col("timestamp"), bucket_seconds).alias("time"),
        )
        .agg(
            F.min_by(F.col("measurement_number"), order_key).alias("open"),
            F.max("measurement_number").alias("high"),
            F.min("measurement_number").alias("low"),
            F.max_by(F.col("measurement_number"), order_key).alias("close"),
        )
    )


def trend_slope(
    conditions: DataFrame,
    of: str = "value",
    bucket_seconds: int = 604800,
) -> DataFrame:
    """Per-(subject, bucket) least-squares trend — Timescale
    ``stats_agg → slope()/intercept()`` over (x = seconds SINCE
    BUCKET START, y = measurement quantized to 1e-4 units).

    Exact int64 moments, not ``regr_slope``: the regression
    aggregates' INTERNAL accumulation order is an engine detail, and
    on the 10× synthesized corpus one group's slope landed exactly on
    a 6-dp rounding boundary — Spark and DuckDB rounded opposite ways
    (r11, PARITY_SF1).  Summing n, Σx, Σy, Σxy, Σx² as exact integers
    (x ≤ bucket_seconds after centering at the bucket start, y in
    1e-4 units: Σxy ≤ ~9e16 even at 10⁵ rows/group) and doing the
    ONE division at the end in the same expression shape makes the
    doubles a pure function of the data.  The intercept is the fitted
    value AT the bucket start.  Single-point or zero-x-variance
    groups yield NULL slope in both engines.

    → (measurement_subject, time, n_samples, slope, intercept),
    slope/intercept rounded to 6 dp.
    """
    x = F.unix_timestamp(F.col("timestamp")) % bucket_seconds
    y = F.floor(F.col("measurement_number") * 10_000 + F.lit(0.5)).cast(
        "long"
    )
    agg = (
        conditions.filter(
            (F.col("measurement_of") == of)
            & F.col("measurement_number").isNotNull()
        )
        .select(
            "measurement_subject",
            epoch_bucket(F.col("timestamp"), bucket_seconds).alias("time"),
            x.alias("x"),
            y.alias("y"),
        )
        .groupBy("measurement_subject", "time")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    num = (
        agg["n_samples"].cast("double") * agg["sxy"]
        - agg["sx"].cast("double") * agg["sy"]
    )
    den = (
        agg["n_samples"].cast("double") * agg["sxx"]
        - agg["sx"].cast("double") * agg["sx"]
    )
    slope = F.when(den > 0, num / den / F.lit(10_000.0))
    intercept = (
        agg["sy"].cast("double") / F.lit(10_000.0)
        - slope * agg["sx"].cast("double")
    ) / agg["n_samples"]
    return agg.select(
        "measurement_subject",
        "time",
        "n_samples",
        # + 0.0 collapses IEEE -0.0 (a flat series whose tiny
        # negative slope rounds to -0.0) to +0.0 — engines render
        # the two zeros differently, values are equal
        (F.round(slope, 6) + F.lit(0.0)).alias("slope"),
        (F.round(intercept, 6) + F.lit(0.0)).alias("intercept"),
    )


def heartbeat_uptime(
    conditions: DataFrame,
    of: str = "value",
    tolerance_seconds: int = 3600,
) -> DataFrame:
    """Liveness coverage per subject — Timescale Toolkit
    ``heartbeat_agg → live_time()``: each measurement proves the
    subject alive for ``tolerance_seconds`` after it; covered time is
    the length of the UNION of those [t, t+tol) intervals, which for
    sorted heartbeats is Σ min(next_t − t, tol) over consecutive
    pairs plus ``tol`` for the final one (overlaps collapse via the
    ``min``; gaps longer than ``tol`` contribute exactly ``tol``).

    → (measurement_subject, n_beats, covered_s, span_s) where span_s
    is last-beat-plus-tolerance minus first beat: uptime fraction =
    covered_s / span_s.  Integer arithmetic end to end (second
    truncation), so oracle parity is exact.  One lag-family window +
    one aggregate, both keyed by subject — Q8's shuffle profile, same
    salting story if a subject dominates.
    """
    if tolerance_seconds <= 0:
        raise ValueError(
            f"tolerance_seconds must be positive, got {tolerance_seconds}"
        )
    w = Window.partitionBy("measurement_subject").orderBy(*_measure_order())
    t = F.unix_timestamp(F.col("timestamp"))
    beats = (
        conditions.filter(
            (F.col("measurement_of") == of)
            & F.col("measurement_number").isNotNull()
        )
        .select(
            "measurement_subject",
            "timestamp",
            "measurement_unique_id",
            t.alias("t"),
        )
        .withColumn("next_t", F.lead("t").over(w))
    )
    covered = F.when(
        F.col("next_t").isNull(), F.lit(tolerance_seconds)
    ).otherwise(
        F.least(F.col("next_t") - F.col("t"), F.lit(tolerance_seconds))
    )
    return (
        beats.withColumn("covered", covered)
        .groupBy("measurement_subject")
        .agg(
            F.count("*").alias("n_beats"),
            F.sum("covered").alias("covered_s"),
            (F.max("t") + tolerance_seconds - F.min("t")).alias("span_s"),
        )
    )


__all__ = ["counter_delta", "ohlc", "trend_slope", "heartbeat_uptime"]
