"""As-of join: latest measurement at-or-before each probe time.

The "what was the sensor reading when X happened" primitive — the
reference serves it per-panel with ``ORDER BY timestamp DESC LIMIT 1``
round-trips; joining two 100 TB streams that way is a correlated
subquery per row. Spark has no ASOF JOIN operator, and the naive
range-join (``probe.ts >= cond.ts`` + window to keep the max) explodes
to |probe| × |history-per-subject| intermediate rows.

The scalable shape is the classic sort-merge trick expressed with
DataFrame ops — union, one sort, one window:

1. tag measurement rows (side=0) and probe rows (side=1) into one
   frame with a common (subject, ts) key;
2. one window per subject ordered by (ts, side, m_time, tie):
   ``last(value, ignorenulls=True)`` over rows-unbounded-preceding
   carries the latest measurement forward INTO the probe rows —
   measurements sort before probes at the same timestamp (side 0 < 1),
   so an exactly-simultaneous measurement is visible to the probe,
   matching ASOF's ``>=``;
3. keep probe rows; optionally null out matches staler than
   ``tolerance_seconds``.

Duplicate measurement timestamps: when ``conditions`` has several rows
at the same (subject, ts), the carried value is the one with the
greatest tie-break — ``measurement_unique_id`` when the column exists,
else ``measurement_number`` — so results are deterministic (the
round-5 ordering ended at m_time, which ties for same-ts measurements
and let ``last`` pick an arbitrary row).

Cost: one shuffle on subject, one sort — identical asymptotics to a
co-partitioned merge join. Hot subjects: ``asof_join_salted`` applies
the same time-chunk salting as ``changed_rows_salted``
(timeseries.py): the window runs within (subject, chunk) partitions —
parallelism = subjects × chunks regardless of key skew — and rows
whose chunk holds no earlier measurement are repaired from a per-chunk
last-measurement summary (one row per non-empty (subject, chunk)),
carried across measurement-less chunks by an ignore-nulls window over
the tiny summary frame. Row-identity to ``asof_join`` is pinned by a
hot-subject property test (tests/test_asof_salted.py).

DuckDB's native ``ASOF LEFT JOIN`` is the oracle — an independent
implementation of the same semantics, so agreement is meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _sides(
    probes: DataFrame, conditions: DataFrame, of: str
) -> tuple[DataFrame, DataFrame]:
    """Measurement (side=0) and probe (side=1) frames with a common
    shape: (measurement_subject, ts, side, probe_id, m_value, m_time,
    _tie). ``_tie`` makes same-timestamp measurement ordering total."""
    if "measurement_unique_id" in conditions.columns:
        tie_m = F.col("measurement_unique_id").cast("string")
        tie_p = F.lit(None).cast("string")
    else:
        tie_m = F.col("measurement_number")
        tie_p = F.lit(None).cast("double")
    meas = conditions.filter(
        (F.col("measurement_of") == of)
        & F.col("measurement_number").isNotNull()
    ).select(
        "measurement_subject",
        F.col("timestamp").alias("ts"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("probe_id"),
        F.col("measurement_number").alias("m_value"),
        F.col("timestamp").alias("m_time"),
        tie_m.alias("_tie"),
    )
    pr = probes.select(
        "measurement_subject",
        F.col("probe_time").alias("ts"),
        F.lit(1).alias("side"),
        F.col("probe_id"),
        F.lit(None).cast("double").alias("m_value"),
        F.lit(None).cast("timestamp").alias("m_time"),
        tie_p.alias("_tie"),
    )
    return meas, pr


def _finish(carried: DataFrame, tolerance_seconds: int | None) -> DataFrame:
    """Probe-row projection + optional staleness nulling, shared by
    the vanilla and salted paths."""
    out = carried.filter(F.col("side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.col("asof_time").isNotNull()
            & (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_time"))
                <= tolerance_seconds * 1_000_000
            )
        )
        out = out.select(
            "measurement_subject",
            "ts",
            "probe_id",
            F.when(fresh, F.col("asof_value")).alias("asof_value"),
            F.when(fresh, F.col("asof_time")).alias("asof_time"),
        )
    return out.select(
        "probe_id",
        "measurement_subject",
        F.col("ts").alias("probe_time"),
        "asof_time",
        "asof_value",
    )


def asof_join(
    probes: DataFrame,
    conditions: DataFrame,
    of: str,
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """``probes`` (probe_id, measurement_subject, probe_time) ←
    latest ``conditions`` number of ``of`` at-or-before probe_time →
    (probe_id, measurement_subject, probe_time, asof_time, asof_value).

    Probes with no measurement at-or-before (or outside tolerance)
    keep NULL asof columns (left-join semantics). Same-timestamp
    measurement duplicates resolve to the greatest tie-break (module
    docstring)."""
    meas, pr = _sides(probes, conditions, of)
    unioned = meas.unionByName(pr)
    w = (
        Window.partitionBy("measurement_subject")
        .orderBy("ts", "side", "m_time", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "measurement_subject",
        "ts",
        "side",
        "probe_id",
        F.last("m_value", ignorenulls=True).over(w).alias("asof_value"),
        F.last("m_time", ignorenulls=True).over(w).alias("asof_time"),
    )
    return _finish(carried, tolerance_seconds)


def asof_join_salted(
    probes: DataFrame,
    conditions: DataFrame,
    of: str,
    tolerance_seconds: int | None = None,
    chunk_seconds: int | str = "auto",
    salt_factor: int | None = None,
) -> DataFrame:
    """``asof_join`` with the carry window salted by time-chunk.
    ``chunk_seconds="auto"`` (default, r13 verdict ask #3): the CMS
    skew profile (joinplan.choose_salt_factor) measures the hottest
    subject across BOTH sides and the observed ts span divided by
    that factor sets the chunk width; a balanced key gets one chunk
    (the unsalted plan).  Correctness is width-independent (pinned
    row-identical for arbitrary widths in tests/test_asof_salted.py).
    Callers that already measured the skew (``choose_salt_factor`` on
    a sample, a prior run's profile) pass ``salt_factor=`` to skip the
    CMS probe — only the 1-row span aggregate runs (r14 ADVICE #3);
    an explicit integer ``chunk_seconds`` keeps the fully lazy path.

    ``Window.partitionBy(subject)`` concentrates a hot subject's whole
    history (measurements AND probes) in ONE task; AQE cannot split a
    window exchange. Rewrite: the ignore-nulls carry runs within
    (subject, chunk) partitions, then rows whose chunk holds no
    earlier measurement take the latest measurement of any PREVIOUS
    chunk from a summary frame — one ``max_by`` row per (subject,
    chunk), itself carried across measurement-less chunks by an
    ignore-nulls lag-window over the summary (tiny: one row per
    non-empty chunk). Cross-chunk ties are impossible (chunks
    partition the timestamp axis), so within-chunk ordering (ts, side,
    m_time, _tie) reproduces the global order exactly."""
    meas, pr = _sides(probes, conditions, of)
    unioned_base = meas.unionByName(pr)
    if chunk_seconds == "auto":
        from eventhub_to_timescale_spark.operators.joinplan import (
            auto_chunk_seconds,
        )

        # shared data-span helper: profile + span in one collect
        chunk_seconds = auto_chunk_seconds(
            unioned_base, "ts", "measurement_subject", factor=salt_factor
        )
    chunk = F.floor(
        F.unix_micros(F.col("ts")) / F.lit(int(chunk_seconds) * 1_000_000)
    )
    unioned = unioned_base.withColumn("_chunk", chunk)
    w_chunk = (
        Window.partitionBy("measurement_subject", "_chunk")
        .orderBy("ts", "side", "m_time", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    in_chunk = unioned.select(
        "measurement_subject",
        "ts",
        "side",
        "probe_id",
        "_chunk",
        F.last("m_value", ignorenulls=True).over(w_chunk).alias("_in_v"),
        F.last("m_time", ignorenulls=True).over(w_chunk).alias("_in_t"),
    )
    # last measurement of each (subject, chunk); NULL struct for
    # probe-only chunks (the conditional ordering key excludes probes)
    ordk = F.when(
        F.col("side") == 0, F.struct(F.col("ts"), F.col("_tie"))
    )
    summary = unioned.groupBy("measurement_subject", "_chunk").agg(
        F.max_by(F.struct("m_value", "m_time"), ordk).alias("_lastm")
    )
    w_sum = (
        Window.partitionBy("measurement_subject")
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary = summary.select(
        "measurement_subject",
        "_chunk",
        F.last("_lastm", ignorenulls=True).over(w_sum).alias("_prevm"),
    )
    carried = (
        in_chunk.join(boundary, ["measurement_subject", "_chunk"], "left")
        .withColumn(
            "asof_value",
            F.coalesce(F.col("_in_v"), F.col("_prevm.m_value")),
        )
        .withColumn(
            "asof_time",
            F.coalesce(F.col("_in_t"), F.col("_prevm.m_time")),
        )
    )
    return _finish(carried, tolerance_seconds)


__all__ = ["asof_join", "asof_join_salted"]
