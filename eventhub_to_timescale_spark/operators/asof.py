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
2. one window per subject ordered by (ts, side, uid):
   ``last(value, ignorenulls=True)`` over rows-unbounded-preceding
   carries the latest measurement forward INTO the probe rows —
   measurements sort before probes at the same timestamp (side 0 < 1),
   so an exactly-simultaneous measurement is visible to the probe,
   matching ASOF's ``>=``;
3. keep probe rows; optionally null out matches staler than
   ``tolerance_seconds``.

Cost: one shuffle on subject, one sort — identical asymptotics to a
co-partitioned merge join. Hot subjects: the same time-chunk salting
as ``changed_rows_salted`` applies (carry each chunk's last
measurement through the chunk-summary frame); not duplicated here
because probes are dimension-scoped in every known caller.

DuckDB's native ``ASOF LEFT JOIN`` is the oracle — an independent
implementation of the same semantics, so agreement is meaningful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


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
    keep NULL asof columns (left-join semantics)."""
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
    )
    pr = probes.select(
        "measurement_subject",
        F.col("probe_time").alias("ts"),
        F.lit(1).alias("side"),
        F.col("probe_id"),
        F.lit(None).cast("double").alias("m_value"),
        F.lit(None).cast("timestamp").alias("m_time"),
    )
    unioned = meas.unionByName(pr)
    w = (
        Window.partitionBy("measurement_subject")
        .orderBy("ts", "side", "m_time")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "measurement_subject",
        "ts",
        "side",
        "probe_id",
        F.last("m_value", ignorenulls=True).over(w).alias("asof_value"),
        F.last("m_time", ignorenulls=True).over(w).alias("asof_time"),
    ).filter(F.col("side") == 1)
    if tolerance_seconds is not None:
        fresh = (
            F.col("asof_time").isNotNull()
            & (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_time"))
                <= tolerance_seconds * 1_000_000
            )
        )
        carried = carried.select(
            "measurement_subject",
            "ts",
            "probe_id",
            F.when(fresh, F.col("asof_value")).alias("asof_value"),
            F.when(fresh, F.col("asof_time")).alias("asof_time"),
        )
    return carried.select(
        "probe_id",
        "measurement_subject",
        F.col("ts").alias("probe_time"),
        "asof_time",
        "asof_value",
    )


__all__ = ["asof_join"]
