"""Stream-static model apply: score a live stream against batch-fitted
robust stats (operators/anomaly.py:mad_stats).

The deployment shape every monitoring/curation pipeline ends up with:
FIT on history (batch — exact medians need the full distribution),
APPLY in-flight (streaming — each arriving row is scored against the
frozen per-group (median, MAD) frame and flagged immediately, no
state, no watermark, no shuffle of the stream).

This is Spark's stream-static join: the static side is a bounded
per-group stats frame, broadcast into every micro-batch; the stream
side stays a stateless projection+filter, so per-batch latency is the
scan cost of the batch alone. Refreshing the model is swapping the
static frame between restarts (or re-reading a stats table per batch
via ``foreachBatch`` — not needed here).

Batch/stream concordance is by construction: ``mad_outliers(events)``
≡ ``streaming_mad_outliers(stream_of(events), mad_stats(events))``
row-for-row, pinned by tests/test_streaming_anomaly.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_mad_outliers(
    stream: DataFrame,
    stats: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
) -> DataFrame:
    """Streaming (id, group, value) outlier rows: score ``stream``
    against the batch-fitted ``stats`` = (group, _med, _mad) frame
    (see module docstring)."""
    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    g, v = F.col(group_col), F.col(value_col)
    return (
        stream.join(F.broadcast(stats), group_col)
        .filter(F.abs(v - F.col("_med")) > F.lit(k) * F.col("_mad"))
        .select(F.col(id_col), g, v)
    )


def streaming_deseasonalized_outliers(
    stream: DataFrame,
    profile: DataFrame,
    stats: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
    bucket_seconds: int = 3600,
    period: int = 24,
) -> DataFrame:
    """Seasonality-aware live outliers: subtract the batch-fitted
    CAUSAL phase profile (operators/seasonal.py:phase_profile — the
    centered-MA decomposition cannot score live rows, it needs future
    buckets), then apply the frozen per-group MAD rule to the
    deviation.  Both model frames are bounded (|groups|×period and
    |groups| rows) and broadcast into every micro-batch; the stream
    side stays a stateless projection + filter.

    FIT = ``phase_profile(history)`` + ``mad_stats(
    deseasonalized_rows(history, profile), value_col="dev")``;
    batch/stream concordance is by construction and pinned by
    tests/test_streaming_seasonal.py.
    """
    from eventhub_to_timescale_spark.operators.seasonal import (
        deseasonalized_rows,
    )

    if k < 0:
        raise ValueError(f"k must be non-negative, got {k}")
    dev = deseasonalized_rows(
        stream, profile, value_col, "ts", group_col, id_col,
        bucket_seconds, period,
    )
    return (
        dev.join(F.broadcast(stats), group_col)
        .filter(F.abs(F.col("dev") - F.col("_med")) > F.lit(k) * F.col("_mad"))
        .select(id_col, group_col, "value", "dev")
    )


__all__ = ["streaming_mad_outliers", "streaming_deseasonalized_outliers"]
