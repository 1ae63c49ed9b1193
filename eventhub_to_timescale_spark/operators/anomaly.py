"""Robust anomaly detection: median/MAD outlier flags per group.

The monitoring question the reference's stack answers with Grafana
alert rules over Timescale aggregates ("is this reading abnormal for
this feed?") — and the curation question a training pipeline asks of
per-source quality metrics — both want a scale-free outlier rule
that a handful of extreme points cannot corrupt. Mean/stddev z-scores
fail that (one 1e9 spike inflates σ until nothing is an outlier);
the median absolute deviation is 50%-breakdown robust:

    outlier(v) ⇔ |v − median(V_g)| > k · median(|V_g − median(V_g)|)

Plan shape (two tiny aggregates, two broadcast joins, zero row
explosion):

1. groupBy(group) → exact median          (≤ |groups| rows)
2. broadcast-join back, one scan computes |v − med|
3. groupBy(group) → exact median of that  (≤ |groups| rows)
4. broadcast-join + scan-side filter emits the outliers

100 TB posture: the corpus is scanned twice and shuffled never — both
aggregation outputs are bounded by the group-key cardinality and are
broadcast. Spark's exact ``median`` buffers a group's values on the
agg side; at extreme per-group cardinality swap step 1/3 to
``approx_percentile(…, 0.5, accuracy)`` (the rule is robust to the
swap by construction — MAD tolerates 50% corruption, a bounded-error
median estimate corrupts far less). The exact form is kept default
for bit-reproducible parity with the DuckDB oracle.

Cross-engine floats: both engines interpolate even-count medians as
``(a+b)/2``-style double arithmetic that can differ by an ulp, so the
decision thresholds round med/MAD to 6 dp on BOTH sides before the
comparison — the flag flips only if a value sits within ~1e-15 of the
rounded boundary, which continuous measurements do not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_stats(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Fit → (group, _med, _mad): the bounded per-group robust-stats
    frame (6-dp rounded).  This is the "model" half — batch
    ``mad_outliers`` and the stream-static applier
    (streaming/anomaly.py) both score against it, so batch and
    streaming flag the identical rows by construction."""
    g, v = F.col(group_col), F.col(value_col)
    med = events.groupBy(group_col).agg(
        F.round(F.median(v), 6).alias("_med")
    )
    dev = events.join(F.broadcast(med), group_col).withColumn(
        "_dev", F.abs(v - F.col("_med"))
    )
    mad = dev.groupBy(group_col).agg(
        F.round(F.median(F.col("_dev")), 6).alias("_mad")
    )
    # both sides are |groups|-sized; hint so the static plan never
    # falls back to a sort-merge exchange pair for two tiny frames
    return med.join(F.broadcast(mad), group_col)


def mad_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
    stage: bool = True,
) -> DataFrame:
    """→ (id, group, value) of rows whose value deviates from the
    group median by more than ``k`` MADs (see module docstring).

    ``stage`` (default on) materializes the ≤|groups|-row (med, mad)
    stats frame through the session's stage boundary — it is exactly
    the fitted-model artifact the stream-static applier persists, and
    without it every action re-runs BOTH median aggregations (two full
    input scans) before the final scoring scan.  The input frame is
    NOT staged (only scanned), so the caller controls its own
    caching; ``stage=False`` keeps the fully-lazy recomputable form
    for oracle comparison."""
    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    g, v = F.col(group_col), F.col(value_col)
    stats = mad_stats(events, group_col, value_col)
    if stage:
        from eventhub_to_timescale_spark.operators.boundary import (
            stage_boundary,
        )

        stats = stage_boundary(stats)
    return (
        events.join(F.broadcast(stats), group_col)
        .filter(F.abs(v - F.col("_med")) > F.lit(k) * F.col("_mad"))
        .select(F.col(id_col), g, v)
    )


def mad_outliers_oracle_sql(
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
    table: str = "events",
) -> str:
    """DuckDB rendering of ``mad_outliers`` — same 6-dp-rounded
    median/MAD thresholds."""
    # the deviation alias is deliberately NOT "dev": a caller scoring a
    # column literally named dev (events_phase_outliers) must not
    # collide with the internal alias, or median()/the filter silently
    # bind to the wrong column
    return f"""
WITH m AS (
  SELECT {group_col}, round(median({value_col}), 6) AS med
  FROM {table} GROUP BY {group_col}
), d AS (
  SELECT e.{id_col}, e.{group_col}, e.{value_col},
         abs(e.{value_col} - m.med) AS _absdev
  FROM {table} e JOIN m USING ({group_col})
), s AS (
  SELECT {group_col}, round(median(_absdev), 6) AS mad
  FROM d GROUP BY {group_col}
)
SELECT d.{id_col}, d.{group_col}, d.{value_col}
FROM d JOIN s USING ({group_col})
WHERE d._absdev > {k} * s.mad
"""


__all__ = ["mad_stats", "mad_outliers", "mad_outliers_oracle_sql"]
