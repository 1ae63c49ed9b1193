"""Scalable global row enumeration and weighted-fair interleaving —
the ordering primitives a training-data pipeline needs to materialize
"the exact sequence the trainer will read".

The naive Spark spelling of "give every row its global rank" is
``row_number() OVER (ORDER BY key)`` — a window with NO partition key,
which Spark executes by moving the ENTIRE dataset through one
partition: the canonical single-task cliff at any real scale.  The
reference never needs this (single-node, Postgres does its own
ordering); at 100 TB it has to be built, and the scalable construction
is classic:

1. range-repartition on the (total) key — the one exchange, with
   sampled balanced boundaries;
2. sort within partitions — no exchange;
3. ``monotonically_increasing_id()`` = (partition_id << 33) + local
   row index, decomposed back into (pid, local) — pure JVM, no state;
4. per-partition row counts → a DRIVER-side running-sum of ≤
   |partitions| numbers (a bounded scalar collect, same contract as
   text.py:381) broadcast back as the partition offset.

global_pos = offset[pid] + local.  Total extra cost over the sort
itself: one tiny count pass.  No single-partition stage anywhere
(plan-pinned in tests/test_ordering.py).

``wfq_interleave`` builds on it: deterministic weighted-fair queueing
across corpus sources (curriculum mixing).  Source ``s`` with integer
weight ``w_s`` schedules its ``i``-th document (in stable hash/key
order) at virtual time ``(2i+1) · L/w_s`` (L = lcm of weights — all
integer, so both engines order identically with no float anywhere);
sorting by virtual time yields the canonical smooth weighted
round-robin: over any prefix, source shares track w_s/Σw within ±1.
"""

from __future__ import annotations

from math import lcm

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PID_SHIFT = 33  # monotonically_increasing_id: pid << 33 | local index
_LOCAL_MASK = (1 << _PID_SHIFT) - 1


def global_enumerate(
    df: DataFrame,
    key_cols: list[str],
    out: str = "global_pos",
    partitions: int = 32,
) -> DataFrame:
    """Attach a 0-based dense global position by ``key_cols`` order.

    ``key_cols`` must be a TOTAL order (include a unique tiebreaker):
    equal keys hash to one partition but their relative local order is
    arrival order, which is not deterministic.

    100 TB posture: one range exchange + in-partition sort; the only
    driver materialization is |partitions| counts (bounded, documented
    above).  The keyed frame is persisted so the count pass and the
    output pass see the identical partition layout.
    """
    keyed = (
        df.repartitionByRange(partitions, *key_cols)
        .sortWithinPartitions(*key_cols)
        .withColumn("__mid", F.monotonically_increasing_id())
        .persist()
    )
    counts = (
        keyed.groupBy(
            F.shiftrightunsigned("__mid", _PID_SHIFT).alias("__pid")
        )
        .agg(F.count(F.lit(1)).alias("__n"))
        .collect()
    )
    running, offsets = 0, []
    for row in sorted(counts, key=lambda r: r["__pid"]):
        offsets.append((row["__pid"], running))
        running += row["__n"]
    off_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0)], "__pid long, __offset long"
    )
    return (
        keyed.withColumn(
            "__pid", F.shiftrightunsigned("__mid", _PID_SHIFT)
        )
        .join(F.broadcast(off_df), "__pid")
        .withColumn(
            out,
            (F.col("__offset") + F.col("__mid").bitwiseAND(F.lit(_LOCAL_MASK)))
            .cast("long"),
        )
        .drop("__mid", "__pid", "__offset")
    )


def wfq_interleave(
    docs: DataFrame,
    weight_expr: Column,
    source_col: str = "source",
    key_col: str = "doc_id",
    weights_lcm: int | None = None,
    partitions: int = 32,
) -> DataFrame:
    """Deterministic weighted-fair interleave of corpus sources.

    ``weight_expr`` must evaluate to a positive INTEGER weight per row
    (constant within a source), with ``weights_lcm`` a common multiple
    of every weight the expression can produce (defaults to 720720 =
    lcm(1..14), covering small integer weights).  The i-th doc of
    source s (0-based, by ``key_col`` within source) gets virtual time
    ``(2i+1) · L/w_s`` — exact BIGINT — and the output enumerates docs
    in (vt, source, i) order.

    → input columns + (src_index, vtime, global_pos).

    100 TB posture: two global_enumerate passes (each one range
    exchange + bounded driver offsets) and one ≤|sources| broadcast
    join for the per-source first-position; the WFQ arithmetic is
    codegen.  No per-source single-partition window: the per-source
    index comes from the global enumeration minus the source's first
    position.
    """
    L = weights_lcm if weights_lcm is not None else lcm(*range(1, 15))
    en = global_enumerate(
        docs, [source_col, key_col], out="__gp", partitions=partitions
    )
    firsts = en.groupBy(source_col).agg(F.min("__gp").alias("__first"))
    en = en.join(F.broadcast(firsts), source_col).withColumn(
        "src_index", (F.col("__gp") - F.col("__first")).cast("long")
    )
    # exact integer L/w (w divides L by contract): (L - L % w) / w
    # divides exactly and the quotient ≤ L < 2^53, so the double
    # round-trip is lossless before the cast back to BIGINT
    w = weight_expr.cast("long")
    lw = ((F.lit(L).cast("long") - F.lit(L).cast("long") % w) / w).cast(
        "long"
    )
    en = en.withColumn(
        "vtime", ((F.lit(2) * F.col("src_index") + 1) * lw).cast("long")
    ).drop("__gp", "__first")
    return global_enumerate(
        en,
        ["vtime", source_col, "src_index"],
        out="global_pos",
        partitions=partitions,
    )


__all__ = ["global_enumerate", "wfq_interleave"]
