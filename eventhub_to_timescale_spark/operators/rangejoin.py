"""Interval-overlap (range) join with time-bucket blocking.

"Which maintenance windows overlapped which alarm intervals" — the
interval-interval analog of the as-of join. Spark's only native plan
for ``l.start < r.end AND r.start < l.end`` is
BroadcastNestedLoopJoin / cartesian-per-key: |L|×|R| comparisons per
subject, hopeless at 100 TB.

The scalable shape is equi-join blocking on covered time buckets:

1. explode each interval to the bucket ids it touches
   (``sequence(floor(start/b), floor(last/b))``) — an interval of
   length ℓ touches ~ℓ/b + 1 buckets;
2. equi-join on (subject, bucket): shuffle-hash/sort-merge, no
   nested loop. Candidates are only pairs sharing a bucket —
   overlapping pairs ALWAYS share the bucket containing their
   overlap start, so recall is exact;
3. ``dropDuplicates`` on the id pair (a pair may share many buckets),
   then the exact half-open overlap predicate filters false
   positives from mere bucket adjacency.

``bucket_seconds`` trades explosion factor against candidate
precision: set it near the median interval length (the same knob as
every spatial/temporal grid join). Degenerate empty intervals
(start >= end under half-open semantics) match nothing and are
dropped up front on both sides.

Intervals are half-open ``[start, end)``: touching endpoints
(a.end == b.start) do NOT overlap — the convention Q9's state
intervals already follow (a state ends exactly when the next begins,
and those two must not "overlap").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucketed(df: DataFrame, prefix: str, bucket_seconds: int) -> DataFrame:
    b = int(bucket_seconds) * 1_000_000
    start_us = F.unix_micros(F.col("start"))
    # last microsecond inside the half-open interval
    end_us = F.unix_micros(F.col("end")) - 1
    return (
        df.filter(F.col("start") < F.col("end"))
        .select(
            F.col("interval_id").alias(f"{prefix}_id"),
            F.col("measurement_subject"),
            F.col("start").alias(f"{prefix}_start"),
            F.col("end").alias(f"{prefix}_end"),
            F.explode(
                F.sequence(F.floor(start_us / b), F.floor(end_us / b))
            ).alias("_bucket"),
        )
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Both inputs: (interval_id, measurement_subject, start, end).
    → (measurement_subject, l_id, r_id, overlap_start, overlap_end)
    for every half-open-overlapping same-subject pair."""
    if bucket_seconds <= 0:
        raise ValueError(f"bucket_seconds must be positive, got {bucket_seconds}")
    lb = _bucketed(left, "l", bucket_seconds)
    rb = _bucketed(right, "r", bucket_seconds)
    cand = lb.join(rb, ["measurement_subject", "_bucket"]).drop("_bucket")
    return (
        cand.dropDuplicates(["measurement_subject", "l_id", "r_id"])
        .filter(
            (F.col("l_start") < F.col("r_end"))
            & (F.col("r_start") < F.col("l_end"))
        )
        .select(
            "measurement_subject",
            "l_id",
            "r_id",
            F.greatest("l_start", "r_start").alias("overlap_start"),
            F.least("l_end", "r_end").alias("overlap_end"),
        )
    )


__all__ = ["overlap_join"]
