"""Approximate-aggregate parity with the Timescale Toolkit sketch
surface the reference's stack ships alongside its own SQL functions —
``hyperloglog → distinct_count()``, ``uddsketch/percentile_agg →
approx_percentile()``, ``histogram()``, and ``gauge_agg → delta()`` —
re-expressed as Spark's native sketch aggregates.  Extensions beyond
the reference's own `db/*.sql` queries (SURVEY.md §2.6 frames these as
toolkit-era capabilities a TimescaleDB user expects to keep).

Design note on gating approximate answers: a sketch's output is not
bit-reproducible across engines, so the exact value can't be the
oracle surface.  Each approximate operator therefore emits a
**concordance frame**: the exact answer (computed by both engines)
plus a boolean ``within_tolerance`` that Spark derives from
|approx − exact| and the oracle pins to TRUE.  The driver's value-hash
then *fails* whenever the sketch drifts outside its documented error
bound — the approximation itself is what's being gated, not a lucky
bit-match.  At 100 TB the exact branch is dropped and only the sketch
runs (see each docstring's posture note).

100 TB posture (family-wide): HLL and KLL/Greenwald-Khanna sketches
are constant-size, map-side-combinable aggregation buffers — shuffle
volume is one sketch per (partition × group), independent of row
count.  That is the entire point of the family: the exact
countDistinct re-shuffles raw (group, key) pairs, the sketch never
does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import epoch_bucket


def approx_distinct_concordance(
    conditions: DataFrame,
    rsd: float = 0.02,
    tolerance: float = 0.05,
) -> DataFrame:
    """Distinct subjects per measurement stream, HLL vs exact —
    Toolkit ``hyperloglog(32768, v) → distinct_count()`` parity.

    → (measurement_of, exact_distinct, within_tolerance) where
    ``within_tolerance`` asserts the HyperLogLog++ estimate
    (``approx_count_distinct``, relative sd ``rsd``) lands within
    ``tolerance`` of the exact count.  rsd=0.02 gives a 3σ bound of
    6% — tolerance 5% is ~2.5σ, comfortably reliable at these
    cardinalities while still tight enough that a broken sketch
    (or a wrong groupBy key) trips the gate.

    100 TB posture: production keeps ONLY the HLL branch — a 32 KiB
    buffer per (partition, measurement_of), map-side combined, one
    constant-size row per group over the wire.  The exact branch here
    exists to *be* the gate; it shuffles (of, subject) pairs and is
    the thing you deploy the sketch to avoid.
    """
    agg = conditions.groupBy("measurement_of").agg(
        F.countDistinct("measurement_subject").alias("exact_distinct"),
        F.approx_count_distinct("measurement_subject", rsd).alias("_approx"),
    )
    err = F.abs(F.col("_approx") - F.col("exact_distinct"))
    return agg.select(
        "measurement_of",
        "exact_distinct",
        (err <= tolerance * F.col("exact_distinct")).alias(
            "within_tolerance"
        ),
    )


def approx_percentile_concordance(
    conditions: DataFrame,
    of: str = "value",
    q: float = 0.5,
    accuracy: int = 10000,
    rank_tolerance: float = 0.05,
) -> DataFrame:
    """Per-subject quantile, sketch vs exact — Toolkit
    ``percentile_agg → approx_percentile()`` (uddsketch) parity via
    Spark's Greenwald-Khanna ``percentile_approx``.

    → (measurement_subject, exact_q, within_tolerance).  ``exact_q``
    is the exact linearly-interpolated quantile (identical definition
    to DuckDB ``quantile_cont``), rounded to 6 dp — the deterministic
    parity surface.  ``within_tolerance`` is a RANK-space bound (the
    quantity GK actually guarantees, and distribution-independent —
    a value-space bound breaks wherever the density is locally thin):
    the sketch value must lie inside the exact
    [q − rank_tolerance, q + rank_tolerance] quantile envelope.  At
    accuracy=10000 the sketch is rank-exact for groups under ~10 k
    rows; the ±0.05 envelope additionally absorbs the ≤1-rank
    disc-vs-cont definitional offset on small groups.

    100 TB posture: production keeps only the sketch — a bounded
    O(accuracy) buffer per (partition, subject), map-side combined.
    The exact interpolated percentile needs a full sort per group and
    exists here as the gate.
    """
    if not (0 < q - rank_tolerance and q + rank_tolerance < 1):
        raise ValueError(
            f"q ± rank_tolerance must stay inside (0, 1): {q} ± {rank_tolerance}"
        )
    v = F.col("measurement_number")
    agg = (
        conditions.filter(
            (F.col("measurement_of") == of) & v.isNotNull()
        )
        .groupBy("measurement_subject")
        .agg(
            F.percentile(v, F.lit(q)).alias("_exact"),
            F.percentile(v, F.lit(q - rank_tolerance)).alias("_lo"),
            F.percentile(v, F.lit(q + rank_tolerance)).alias("_hi"),
            F.percentile_approx(v, F.lit(q), F.lit(accuracy)).alias(
                "_approx"
            ),
        )
    )
    return agg.select(
        "measurement_subject",
        F.round(F.col("_exact"), 6).alias("exact_q"),
        (
            (F.col("_approx") >= F.col("_lo"))
            & (F.col("_approx") <= F.col("_hi"))
        ).alias("within_tolerance"),
    )


def value_histogram(
    conditions: DataFrame,
    of: str = "value",
    lo: float = 0.0,
    hi: float = 100.0,
    nbins: int = 20,
) -> DataFrame:
    """Equi-width histogram with saturating edge bins — Toolkit
    ``histogram(v, lo, hi, nbins)`` semantics: bin 0 additionally
    absorbs v < lo, bin nbins-1 absorbs v ≥ hi (Toolkit's
    underflow/overflow buckets folded into the edges so the output
    arity is fixed).  Deterministic integer output → exact oracle
    parity, no concordance indirection needed.

    → (measurement_of? no — measurement_subject-free: bin, bin_lo, n)
    one row per non-empty bin.

    100 TB posture: the bin id is a single codegen'd arithmetic
    expression — flat groupBy key, map-side partial counts, shuffle
    volume ≤ nbins rows per partition regardless of input size.
    """
    if nbins <= 0 or not hi > lo:
        raise ValueError(
            f"need nbins > 0 and hi > lo, got nbins={nbins} [{lo}, {hi})"
        )
    v = F.col("measurement_number")
    width = (hi - lo) / nbins
    raw = F.floor((v - F.lit(lo)) / F.lit(width))
    bin_id = F.least(
        F.greatest(raw, F.lit(0)), F.lit(nbins - 1)
    ).cast("int")
    return (
        conditions.filter(
            (F.col("measurement_of") == of)
            & v.isNotNull()
            & ~F.isnan(v)
        )
        .groupBy(bin_id.alias("bin"))
        .agg(F.count("*").alias("n"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias(
                "bin_lo"
            ),
            "n",
        )
    )


def gauge_delta(
    conditions: DataFrame,
    of: str = "value",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Per-(subject, bucket) gauge change — Toolkit ``gauge_agg →
    delta()``: last reading minus first reading of the bucket, with
    NO reset heuristic (a gauge may legitimately fall; contrast
    ``toolkit.counter_delta``).  First/last by (timestamp,
    measurement_unique_id) via struct-ordered min_by/max_by — one
    map-side-combinable aggregate, no window, no second shuffle.

    → (measurement_subject, time, gauge_delta) rounded to 6 dp.
    """
    order_key = F.struct(
        F.col("timestamp"), F.col("measurement_unique_id")
    )
    v = F.col("measurement_number")
    return (
        conditions.filter((F.col("measurement_of") == of) & v.isNotNull())
        .groupBy(
            "measurement_subject",
            epoch_bucket(F.col("timestamp"), bucket_seconds).alias("time"),
        )
        .agg(
            F.round(
                F.max_by(v, order_key) - F.min_by(v, order_key), 6
            ).alias("gauge_delta")
        )
    )


__all__ = [
    "approx_distinct_concordance",
    "approx_percentile_concordance",
    "value_histogram",
    "gauge_delta",
]
