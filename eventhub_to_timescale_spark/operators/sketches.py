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


HLL_M = 256  # buckets; 8 index bits of the 32-bit portable hash
HLL_SEED = "hll"
# classic HLL bias constant for m=256; ONE shared python float so the
# Spark plan, the DuckDB oracle, and the streaming operator all embed
# the identical literal
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)
# scale numerator alpha*m^2*2^25 precomputed as one double literal —
# the estimate is then a single division by the EXACT INTEGER Z, so
# both engines perform the same lone IEEE op
HLL_NUMER = HLL_ALPHA * HLL_M * HLL_M * float(1 << 25)


def hll_estimate_py(registers: list[int], m: int = HLL_M) -> float:
    """Estimate from a dense register list (0 = empty bucket) — the
    shared formula: Z_scaled = Σ 2^(25−ρ) with empty buckets at 2^25
    (all EXACT integers), raw = NUMER / Z, linear-counting correction
    below 2.5m when empty buckets remain.  Used by the streaming
    operator; ``hll_distinct_portable`` builds the identical
    arithmetic as Spark expressions; the oracle as SQL."""
    import math

    z_scaled = sum(1 << (25 - r) for r in registers if r) + (
        1 << 25
    ) * sum(1 for r in registers if not r)
    raw = HLL_NUMER / z_scaled
    empty = sum(1 for r in registers if not r)
    if raw < 2.5 * m and empty > 0:
        return round(float(m) * math.log(float(m) / empty), 4)
    return round(raw, 4)


def _hll_rho(rem):
    """ρ = position of the highest set bit from the top of the 24-bit
    remainder (1..25), as a 24-branch integer CASE ladder — exact in
    any engine, no float log2."""
    expr = None
    for b in range(1, 25):
        cond = rem >= F.lit(1 << (24 - b))
        expr = F.when(cond, b) if expr is None else expr.when(cond, b)
    return expr.otherwise(25)


def hll_distinct_portable(
    conditions: DataFrame, m: int = HLL_M, seed: str = HLL_SEED
) -> DataFrame:
    """Portable HyperLogLog distinct-subject estimate per measurement
    stream → (measurement_of, nonzero_registers, est_distinct).

    Unlike ``approx_distinct_concordance`` (Spark's built-in HLL++,
    whose registers are engine-internal), every step here is an
    explicit cross-engine expression: bucket = low 8 bits of the
    md5-derived ``portable_hash32``, ρ = leading-zero rank of the
    24-bit remainder via an integer CASE ladder, Z accumulated as the
    EXACT integer Σ 2^(25−ρ) (empty buckets at 2^25) so the only
    float op is one final division by the shared NUMER literal — the
    DuckDB oracle and the streaming register state reproduce the
    estimate bit-for-bit.  Linear-counting correction below 2.5m.

    100 TB posture: registers are a (measurement_of, bucket) max —
    map-side combinable, ≤ m rows per stream per map task over the
    wire, constant-size state regardless of corpus cardinality; the
    finalization aggregates ≤ m rows per stream.  This is the
    continuous-rollup-able form of distinct counting: the register
    frame can be stored and merged across days by the same max.
    """
    from eventhub_to_timescale_spark.functions.scalars import (
        portable_hash32,
    )

    if m != 256:
        raise ValueError("portable HLL is pinned to m=256 (8 index bits)")
    h = portable_hash32(F.col("measurement_subject"), seed)
    bucket = h.bitwiseAND(F.lit(m - 1))
    rem = F.shiftright(h, 8)
    regs = (
        conditions.select(
            "measurement_of",
            bucket.alias("bucket"),
            _hll_rho(rem).alias("rho"),
        )
        .groupBy("measurement_of", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    per_of = regs.groupBy("measurement_of").agg(
        F.count(F.lit(1)).alias("nonzero_registers"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 25 - r)")).alias(
            "z_nonzero"
        ),
    )
    empty = F.lit(m) - F.col("nonzero_registers")
    z_scaled = F.col("z_nonzero") + empty * F.lit(1 << 25)
    raw = F.lit(HLL_NUMER) / z_scaled
    est = F.when(
        (raw < F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return per_of.select(
        "measurement_of",
        "nonzero_registers",
        F.round(est, 4).alias("est_distinct"),
    ).orderBy("measurement_of")


def hll_distinct_oracle_sql(
    conditions_sql: str, m: int = HLL_M, seed: str = HLL_SEED
) -> str:
    """DuckDB rendering of ``hll_distinct_portable`` over a
    conditions-shaped subquery — same md5 hash, same CASE ladder,
    same exact-integer Z, same lone division."""
    ladder = " ".join(
        f"WHEN rem >= {1 << (24 - b)} THEN {b}" for b in range(1, 25)
    )
    return f"""
WITH c AS ({conditions_sql}),
h AS (
  SELECT measurement_of,
         CAST(('0x' || substr(md5('{seed}' || measurement_subject), 1, 8))
              AS BIGINT) AS hv
  FROM c
),
parts AS (
  SELECT measurement_of, hv % {m} AS bucket, hv // 256 AS rem FROM h
),
regs AS (
  SELECT measurement_of, bucket,
         MAX(CASE {ladder} ELSE 25 END) AS r
  FROM parts GROUP BY 1, 2
),
per_of AS (
  SELECT measurement_of,
         COUNT(*) AS nonzero_registers,
         SUM(CAST(1 AS BIGINT) << (25 - r)) AS z_nonzero
  FROM regs GROUP BY 1
)
SELECT measurement_of,
       CAST(nonzero_registers AS BIGINT) AS nonzero_registers,
       ROUND(CASE WHEN {HLL_NUMER!r} / (z_nonzero
                    + ({m} - nonzero_registers) * CAST({1 << 25} AS BIGINT))
                    < {2.5 * m}
                   AND {m} - nonzero_registers > 0
              THEN {float(m)} * LN({float(m)} / ({m} - nonzero_registers))
              ELSE {HLL_NUMER!r} / (z_nonzero
                    + ({m} - nonzero_registers) * CAST({1 << 25} AS BIGINT))
              END, 4) AS est_distinct
FROM per_of ORDER BY measurement_of
"""


def hll_union_estimate(
    conditions: DataFrame, m: int = HLL_M, seed: str = HLL_SEED
) -> DataFrame:
    """Distinct subjects across ALL measurement streams by MERGING the
    per-stream register frames of ``hll_distinct_portable`` — the
    mergeability property that makes HLL rollup-able: a per-day
    register frame stored at ingest merges across any date range with
    a plain ``max`` per bucket, no re-scan of the raw data.

    → one row (nonzero_registers, est_distinct).

    Deliberately computed as per-STREAM registers first, then a
    second ``max`` merge — the two-level plan IS the point (stage 1
    is what a continuous rollup would persist).  Both levels are
    map-side-combinable maxima; the result is bit-identical to
    hashing the union directly, which is what the oracle exploits.
    """
    from eventhub_to_timescale_spark.functions.scalars import (
        portable_hash32,
    )

    if m != 256:
        raise ValueError("portable HLL is pinned to m=256 (8 index bits)")
    h = portable_hash32(F.col("measurement_subject"), seed)
    per_stream = (
        conditions.select(
            "measurement_of",
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
            _hll_rho(F.shiftright(h, 8)).alias("rho"),
        )
        .groupBy("measurement_of", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    merged = per_stream.groupBy("bucket").agg(F.max("r").alias("r"))
    per_all = merged.agg(
        F.count(F.lit(1)).alias("nonzero_registers"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 25 - r)")).alias(
            "z_nonzero"
        ),
    )
    empty = F.lit(m) - F.col("nonzero_registers")
    z_scaled = F.col("z_nonzero") + empty * F.lit(1 << 25)
    raw = F.lit(HLL_NUMER) / z_scaled
    est = F.when(
        (raw < F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    return per_all.select(
        "nonzero_registers", F.round(est, 4).alias("est_distinct")
    )


def hll_union_oracle_sql(
    conditions_sql: str, m: int = HLL_M, seed: str = HLL_SEED
) -> str:
    """DuckDB rendering of ``hll_union_estimate`` — register max over
    streams equals hashing the union directly, so the oracle groups
    globally."""
    ladder = " ".join(
        f"WHEN rem >= {1 << (24 - b)} THEN {b}" for b in range(1, 25)
    )
    return f"""
WITH c AS ({conditions_sql}),
h AS (
  SELECT CAST(('0x' || substr(md5('{seed}' || measurement_subject), 1, 8))
              AS BIGINT) AS hv
  FROM c
),
regs AS (
  SELECT hv % {m} AS bucket,
         MAX(CASE {ladder} ELSE 25 END) AS r
  FROM (SELECT hv, hv // 256 AS rem FROM h) GROUP BY 1
),
per_all AS (
  SELECT COUNT(*) AS nonzero_registers,
         SUM(CAST(1 AS BIGINT) << (25 - r)) AS z_nonzero
  FROM regs
)
SELECT CAST(nonzero_registers AS BIGINT) AS nonzero_registers,
       ROUND(CASE WHEN {HLL_NUMER!r} / (z_nonzero
                    + ({m} - nonzero_registers) * CAST({1 << 25} AS BIGINT))
                    < {2.5 * m}
                   AND {m} - nonzero_registers > 0
              THEN {float(m)} * LN({float(m)} / ({m} - nonzero_registers))
              ELSE {HLL_NUMER!r} / (z_nonzero
                    + ({m} - nonzero_registers) * CAST({1 << 25} AS BIGINT))
              END, 4) AS est_distinct
FROM per_all
"""


CMS_D = 4
CMS_W = 64
CMS_SEED = "cms"


def _cms_bucket(key: F.Column, j: int, w: int, seed: str) -> F.Column:
    """Row-j bucket of ``key``: portable 32-bit hash of
    ``'{seed}{j}:' || key`` mod ``w`` — the ':' separator keeps
    (j=1, key='23') and (j=12, key='3') from colliding into one
    hash payload."""
    from eventhub_to_timescale_spark.functions.scalars import (
        portable_hash32,
    )

    return portable_hash32(key.cast("string"), f"{seed}{j}:") % w


def cms_cells(
    df: DataFrame,
    key_col: str,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = CMS_SEED,
) -> DataFrame:
    """Count-min sketch counter matrix over ``df[key_col]`` →
    (j, bucket, c): ``c`` = number of rows whose row-``j`` hash lands
    in ``bucket``.  ≤ d·w rows regardless of input size.

    This frame IS the mergeable sketch state: two corpora's cell
    frames combine with a plain per-cell SUM (pytest pins shard-sum ==
    global bit-for-bit), which makes it continuous-rollup-able the
    same way the portable HLL register frame is — store per-day cell
    frames at ingest, answer any date range by summing cells.

    100 TB posture: the explode is a d-wide array per row, collapsed
    by map-side partial aggregation to ≤ d·w counters per task before
    the single exchange; state size is d·w ints independent of key
    cardinality — the entire point vs an exact per-key count, whose
    shuffle is Θ(distinct keys).
    """
    k = F.col(key_col)
    jb = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                _cms_bucket(k, j, w, seed).alias("bucket"),
            )
            for j in range(d)
        ]
    )
    return (
        df.filter(k.isNotNull())
        .select(F.explode(jb).alias("jb"))
        .groupBy(F.col("jb.j").alias("j"), F.col("jb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_frequency_estimates(
    events: DataFrame,
    key_col: str = "user_id",
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = CMS_SEED,
    min_share_num: int = 0,
    min_share_den: int = 1,
) -> DataFrame:
    """Count-min frequency estimate per key → (key, est_count,
    exact_count), est = min over the d row-hash cells (Cormode &
    Muthukrishnan: est ≥ exact always; E[est − exact] ≤ N/w per row,
    min over d rows tightens).  ``min_share_num/den`` filters to keys
    whose ESTIMATE is at least that share of total N — the
    heavy-hitter gate, exact integer cross-multiplication (0 ⇒ all
    keys).

    ``exact_count`` is the concordance column (same contract as the
    sketch family's ``within_tolerance`` frames): it lets the oracle
    gate est ≥ exact and the min-cell arithmetic itself.  At 100 TB
    the exact branch is dropped — the sketch answers alone — and the
    probe side is whatever bounded candidate set you query (here: the
    distinct keys).

    100 TB posture: the cell matrix (≤ d·w rows) BROADCASTS to the
    probe join — the corpus is scanned once for cells and once for
    the probe, both map-side-combinable aggs; no key-on-key shuffle
    ever happens.
    """
    cells = cms_cells(events, key_col, d, w, seed)
    keys = (
        events.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    probes = keys.select(
        "key",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _cms_bucket(F.col("key"), j, w, seed).alias(
                            "bucket"
                        ),
                    )
                    for j in range(d)
                ]
            )
        ).alias("jb"),
    ).select("key", "exact_count", "jb.j", "jb.bucket")
    est = (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("key")
        .agg(
            F.min("c").alias("est_count"),
            F.first("exact_count").alias("exact_count"),
        )
    )
    total = events.filter(F.col(key_col).isNotNull()).agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        est.join(F.broadcast(total))
        .filter(
            F.col("est_count") * F.lit(min_share_den)
            >= F.col("n") * F.lit(min_share_num)
        )
        .select(
            F.col("key").alias(key_col),
            "est_count",
            "exact_count",
        )
        .orderBy(key_col)
    )


def cms_frequency_oracle_sql(
    events_sql: str,
    key_col: str = "user_id",
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = CMS_SEED,
    min_share_num: int = 0,
    min_share_den: int = 1,
) -> str:
    """DuckDB rendering of ``cms_frequency_estimates`` — same md5
    row hashes, same cell counts, same min-probe."""
    return f"""
WITH e AS (SELECT CAST({key_col} AS VARCHAR) AS key
           FROM ({events_sql}) WHERE {key_col} IS NOT NULL),
js AS (SELECT unnest(range({d})) AS j),
cells AS (
  SELECT j,
         CAST(('0x' || substr(md5('{seed}' || CAST(j AS VARCHAR) || ':'
                                  || key), 1, 8)) AS BIGINT) % {w}
           AS bucket,
         COUNT(*) AS c
  FROM e CROSS JOIN js
  GROUP BY 1, 2
),
keys AS (SELECT key, COUNT(*) AS exact_count FROM e GROUP BY 1),
probe AS (
  SELECT k.key, k.exact_count, MIN(c.c) AS est_count
  FROM keys k
  CROSS JOIN js
  JOIN cells c
    ON c.j = js.j
   AND c.bucket = CAST(('0x' || substr(md5('{seed}'
                      || CAST(js.j AS VARCHAR) || ':' || k.key), 1, 8))
                      AS BIGINT) % {w}
  GROUP BY 1, 2
)
SELECT CAST(key AS BIGINT) AS {key_col}, est_count, exact_count
FROM probe
WHERE est_count * {min_share_den}
      >= (SELECT COUNT(*) FROM e) * {min_share_num}
ORDER BY {key_col}
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) theta-sketch: cross-source distinct overlap
# ---------------------------------------------------------------------------

KMV_SEED = "kmv1:"


def kmv_source_overlap(
    docs: DataFrame,
    k: int = 256,
    group_col: str = "source",
    text_col: str = "text",
    seed: str = KMV_SEED,
    stage: bool = True,
) -> DataFrame:
    """→ (source_a, source_b, union_est, intersect_est, jaccard_est):
    estimated DISTINCT-content union / intersection / Jaccard for
    every source pair, from one bounded KMV (k-minimum-values)
    θ-sketch per source — the set-operation sketch the HLL family
    cannot provide (HLL unions; KMV also intersects), and the
    EXACT-duplicate complement of ``cross_source_matrix``'s near-dup
    contamination counts.

    Beyer et al. (PODS'07) KMV estimator, made CROSS-ENGINE
    DETERMINISTIC: the "random" permutation is the md5-derived
    ``portable_hash32`` of the document text, so both engines keep
    the same k smallest distinct hash values per source.  For a pair,
    the merged sketch is the k smallest of the union of the two
    sketches; with v = the k-th smallest merged hash,

        union_est     = (k-1) · 2^32 / v          (exact if < k seen)
        jaccard_est   = |both sources' sketches ∩ merged| / k'
        intersect_est = jaccard_est · union_est

    Every rank and count is exact integer work; the only float ops
    are one multiply and one divide on exactly-representable ints
    ((k-1)·2^32 < 2^53 for k ≤ 2^20) plus a 4-dp round — both engines
    agree bit-for-bit, so the ESTIMATE ITSELF is the gated value
    (same design as ``hll_distinct_portable``).

    100 TB posture: the per-source sketch is a rank-k window over
    DISTINCT (source, hash) — the distinct pre-aggregate map-side
    combines, and Spark 4 plans the rank filter as WindowGroupLimit
    (map tasks emit ≤ k rows per source before the exchange, the
    `sample_source_quota` shape).  Everything after operates on
    |sources| · k rows — driver-scale, broadcastable, and STORABLE:
    persisted per-day sketch frames re-merge by the same rank-k rule
    (the continuous-rollup mergeability the HLL registers have).
    """
    from pyspark.sql.window import Window

    from eventhub_to_timescale_spark.functions.scalars import (
        portable_hash32,
    )

    kmv = kmv_sketch(docs, k, group_col, text_col, seed)
    # r15 (guide §2.4/§5): the overlap shape consumes the sketch frame
    # twice (pair tagging + the broadcast source list); without a
    # boundary each reference re-ran the whole scan → distinct → rank
    # subplan (measured: 4 corpus scans, 34 Exchanges in one plan).
    # The sketch is ≤ |sources|·k rows — driver-scale — so an eager
    # localCheckpoint costs one tiny materialization and every
    # consumer reads a leaf.  At deployment scale this frame is the
    # STORED per-day sketch table anyway (see docstring) — the
    # boundary mirrors production, it does not fake it.
    # ``stage=False`` keeps the fully-lazy recomputable chain (no job
    # at construction; the oracle-comparison form — r15 ADVICE, same
    # escape hatch as the pipelines' ``persist_stages``).  Mechanism
    # session-selectable (operators/boundary.py).
    if stage:
        from eventhub_to_timescale_spark.operators.boundary import (
            stage_boundary,
        )

        kmv = stage_boundary(kmv)
    return kmv_overlap_from_sketches(kmv, k)


def kmv_sketch(
    docs: DataFrame,
    k: int = 256,
    group_col: str = "source",
    text_col: str = "text",
    seed: str = KMV_SEED,
) -> DataFrame:
    """→ (src, h): the per-source KMV sketch — the k smallest DISTINCT
    md5-derived 32-bit hashes of the text.  This frame IS the storable
    state: per-day sketch frames re-merge by the same union-then-rank
    rule (``kmv_overlap_from_sketches`` consumes any union of sketch
    frames), and the streaming operator's converged state equals it
    row-for-row (tests/test_streaming_kmv.py)."""
    from pyspark.sql.window import Window

    from eventhub_to_timescale_spark.functions.scalars import (
        portable_hash32,
    )

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    h = portable_hash32(F.col(text_col), seed)
    dist = (
        docs.filter(F.col(text_col).isNotNull() & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("src"), h.alias("h"))
        .distinct()
    )
    w = Window.partitionBy("src").orderBy("h")
    return (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("src", "h")
    )


def kmv_overlap_from_sketches(kmv: DataFrame, k: int) -> DataFrame:
    """Pairwise union/intersection/Jaccard estimates from a
    ``(src, h)`` sketch frame (see ``kmv_source_overlap`` for the
    estimator math).  Accepts any frame obeying the sketch contract —
    the batch ``kmv_sketch``, a union of stored per-day sketches
    (re-ranked here by the same k-smallest rule through the merged
    window), or exploded streaming state."""
    from pyspark.sql.window import Window  # noqa: F401

    # per-pair merged values; tag membership on each side.  Each
    # sketch row replicates to its |sources|-1 partner pairs via an
    # inequality join against the BROADCAST source list — a
    # BroadcastNestedLoop over (sketch rows × |sources|): both sides
    # bounded, never the corpus (a plain non-equi join here would
    # plan as CartesianProduct — pinned out by tests/test_kmv_sketch).
    # r15: ONE join in both roles instead of two joins + union — a row
    # (src, h) paired with partner ``other`` lands in the ordered pair
    # (least, greatest) flagged for whichever side ``src`` is; the
    # row multiset is identical to the old pairs_a ∪ pairs_b (each
    # unordered pair contributes every sketch row of each side exactly
    # once, one membership flag set), so ``merged`` is unchanged —
    # but the sketch subplan is referenced half as often and the
    # union branch disappears from the plan.
    srcs = kmv.select(F.col("src").alias("other")).distinct()
    tagged = kmv.join(
        F.broadcast(srcs), F.col("src") != F.col("other")
    ).select(
        F.least("src", "other").alias("source_a"),
        F.greatest("src", "other").alias("source_b"),
        "h",
        (F.col("src") < F.col("other")).cast("int").alias("in_a"),
        (F.col("src") > F.col("other")).cast("int").alias("in_b"),
    )
    merged = (
        tagged
        .groupBy("source_a", "source_b", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    wp = Window.partitionBy("source_a", "source_b").orderBy("h")
    ranked = merged.withColumn("rn", F.row_number().over(wp)).filter(
        F.col("rn") <= k
    )
    agg = ranked.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("kp"),          # merged sketch size k'
        F.max("h").alias("vk"),                  # k'-th smallest value
        F.sum(F.col("in_a") * F.col("in_b")).alias("nboth"),
    )
    exact = F.col("kp") < F.lit(k)  # fewer than k distinct seen: exact
    union_est = F.when(exact, F.col("kp").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(4294967296.0) / F.col("vk")
    )
    jac = F.col("nboth") / F.col("kp")
    return agg.select(
        "source_a",
        "source_b",
        F.round(union_est, 4).alias("union_est"),
        F.round(jac * union_est, 4).alias("intersect_est"),
        F.round(jac, 4).alias("jaccard_est"),
    ).orderBy("source_a", "source_b")


def kmv_overlap_oracle_sql(
    k: int = 256,
    group_col: str = "source",
    text_col: str = "text",
    seed: str = KMV_SEED,
    table: str = "documents",
) -> str:
    """DuckDB rendering of ``kmv_source_overlap`` — same md5 ranks,
    same merged-sketch construction, same lone multiply/divide."""
    return f"""
WITH dist AS (
  SELECT DISTINCT {group_col} AS src,
         CAST(('0x' || substr(md5('{seed}' || {text_col}), 1, 8))
              AS BIGINT) AS h
  FROM {table}
  WHERE {text_col} IS NOT NULL AND {group_col} IS NOT NULL
),
kmv AS (
  SELECT src, h FROM (
    SELECT src, h, row_number() OVER (PARTITION BY src ORDER BY h) AS rn
    FROM dist
  ) WHERE rn <= {k}
),
srcs AS (SELECT DISTINCT src FROM kmv),
tagged AS (
  SELECT a.src AS source_a, s.src AS source_b, a.h, 1 AS in_a, 0 AS in_b
  FROM kmv a JOIN srcs s ON a.src < s.src
  UNION ALL
  SELECT s.src AS source_a, b.src AS source_b, b.h, 0 AS in_a, 1 AS in_b
  FROM kmv b JOIN srcs s ON s.src < b.src
),
merged AS (
  SELECT source_a, source_b, h, MAX(in_a) AS in_a, MAX(in_b) AS in_b
  FROM tagged GROUP BY 1, 2, 3
),
ranked AS (
  SELECT * FROM (
    SELECT source_a, source_b, h, in_a, in_b,
           row_number() OVER (PARTITION BY source_a, source_b
                              ORDER BY h) AS rn
    FROM merged
  ) WHERE rn <= {k}
),
agg AS (
  SELECT source_a, source_b,
         COUNT(*) AS kp,
         MAX(h) AS vk,
         SUM(in_a * in_b) AS nboth
  FROM ranked GROUP BY 1, 2
)
SELECT source_a, source_b,
       ROUND(CASE WHEN kp < {k} THEN CAST(kp AS DOUBLE)
                  ELSE {float(k - 1)} * 4294967296.0 / vk END, 4)
         AS union_est,
       ROUND((CAST(nboth AS DOUBLE) / kp)
             * CASE WHEN kp < {k} THEN CAST(kp AS DOUBLE)
                    ELSE {float(k - 1)} * 4294967296.0 / vk END, 4)
         AS intersect_est,
       ROUND(CAST(nboth AS DOUBLE) / kp, 4) AS jaccard_est
FROM agg
ORDER BY source_a, source_b
"""


def cms_join_size(
    df_a: DataFrame,
    df_b: DataFrame,
    key_a: str = "user_id",
    key_b: str = "user_id",
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = CMS_SEED,
) -> DataFrame:
    """Equi-join CARDINALITY estimate from two count-min sketches —
    the classic CMS inner-product estimator (Cormode & Muthukrishnan,
    J. Algorithms 2005 §4.2): |A ⋈ B| ≈ min_j Σ_b cms_A[j][b]·
    cms_B[j][b], always an OVERestimate (hash collisions only add
    cross terms), with E[err] ≤ N_A·N_B/w per row and the min over d
    rows tightening.  → ONE row (est_rows, exact_rows).

    This is the number a planner wants BEFORE committing a 100 TB
    shuffle join: both sketches are ≤ d·w cells built by one
    map-side-combinable pass per side, the inner product joins two
    ≤ d·w frames on (j, bucket), and no key-on-key shuffle ever
    happens.  ``exact_rows`` (Σ_key cnt_A·cnt_B, computed from the
    per-key count frames) is the concordance column, same contract as
    the rest of the sketch family — at deployment scale the exact
    branch is dropped and the sketch answers alone.  A self-call
    (df_a is df_b, same key) estimates the SELF-join size Σ c_k² —
    the shuffle-explosion number behind the salted Q8/Q9 variants and
    skewprof's decisions."""
    ca = cms_cells(df_a, key_a, d, w, seed)
    cb = cms_cells(df_b, key_b, d, w, seed)
    # both cell frames are ≤ d·w rows; broadcasting side B keeps the
    # inner product shuffle-free end to end
    inner = (
        ca.join(
            F.broadcast(
                cb.select("j", "bucket", F.col("c").alias("cb"))
            ),
            ["j", "bucket"],
        )
        .groupBy("j")
        .agg(F.sum(F.col("c") * F.col("cb")).alias("inner"))
    )
    # a depth row whose buckets never collide across the two sketches
    # has inner product 0 — it must DRIVE the min, not vanish from it
    js = df_a.sparkSession.range(d).select(
        F.col("id").cast("int").alias("j")
    )
    est = (
        js.join(inner, "j", "left")
        .select(
            F.coalesce(F.col("inner"), F.lit(0).cast("long")).alias(
                "inner"
            )
        )
        .agg(F.min("inner").alias("est_rows"))
    )
    ka = (
        df_a.filter(F.col(key_a).isNotNull())
        .groupBy(F.col(key_a).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("na"))
    )
    kb = (
        df_b.filter(F.col(key_b).isNotNull())
        .groupBy(F.col(key_b).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    exact = (
        ka.join(kb, "key")
        .agg(
            F.coalesce(
                F.sum(F.col("na") * F.col("nb")), F.lit(0).cast("long")
            ).alias("exact_rows")
        )
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "est_rows", "exact_rows"
    )


def cms_join_size_oracle_sql(
    a_sql: str,
    b_sql: str,
    key_a: str = "user_id",
    key_b: str = "user_id",
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = CMS_SEED,
) -> str:
    """DuckDB rendering — same md5 row hashes, same cell counts, same
    min-of-inner-products and exact Σ cnt_A·cnt_B."""

    def cells(src: str, key: str, alias: str) -> str:
        return f"""{alias}_e AS (
  SELECT CAST({key} AS VARCHAR) AS key FROM ({src})
  WHERE {key} IS NOT NULL
),
{alias}_cells AS (
  SELECT j,
         CAST(('0x' || substr(md5('{seed}' || CAST(j AS VARCHAR) || ':'
                                  || key), 1, 8)) AS BIGINT) % {w}
           AS bucket,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM {alias}_e CROSS JOIN js
  GROUP BY 1, 2
)"""

    return f"""
WITH js AS (SELECT unnest(range({d})) AS j),
{cells(a_sql, key_a, 'a')},
{cells(b_sql, key_b, 'b')},
inner_products AS (
  SELECT a.j, CAST(SUM(a.c * b.c) AS BIGINT) AS inner_p
  FROM a_cells a JOIN b_cells b ON b.j = a.j AND b.bucket = a.bucket
  GROUP BY a.j
),
exact AS (
  SELECT CAST(COALESCE(SUM(ka.na * kb.nb), 0) AS BIGINT) AS exact_rows
  FROM (SELECT key, COUNT(*) AS na FROM a_e GROUP BY 1) ka
  JOIN (SELECT key, COUNT(*) AS nb FROM b_e GROUP BY 1) kb
    ON kb.key = ka.key
)
SELECT (SELECT CAST(MIN(COALESCE(ip.inner_p, 0)) AS BIGINT)
        FROM js LEFT JOIN inner_products ip ON ip.j = js.j)
         AS est_rows,
       exact_rows
FROM exact
"""


__all__ = [
    "approx_distinct_concordance",
    "approx_percentile_concordance",
    "value_histogram",
    "gauge_delta",
    "hll_distinct_portable",
    "hll_distinct_oracle_sql",
    "hll_estimate_py",
    "hll_union_estimate",
    "hll_union_oracle_sql",
    "cms_cells",
    "cms_frequency_estimates",
    "cms_frequency_oracle_sql",
    "cms_join_size",
    "cms_join_size_oracle_sql",
    "kmv_source_overlap",
    "kmv_overlap_oracle_sql",
]


def hll_rolling_distinct(
    events: DataFrame,
    window_days: int = 7,
    key_col: str = "user_id",
    group_col: str = "event_type",
    ts_col: str = "ts",
    m: int = HLL_M,
    seed: str = HLL_SEED,
    tolerance: float = 0.2,
) -> DataFrame:
    """Trailing-window distinct counting from MERGEABLE daily HLL
    registers → (group, day, exact_distinct, within_tolerance): for
    every active (series, day), the distinct keys over the trailing
    ``window_days`` window, estimated by merging the per-day register
    frames with a MAX — the register-sketch property that makes
    rolling/rollup distinct counting possible at all (exact distinct
    is not mergeable: yesterday's count + today's count ≠ the union).

    Gate shape (same contract as ``approx_distinct_concordance``):
    the EXACT trailing distinct is computed alongside and the oracle
    pins ``within_tolerance`` TRUE, so sketch drift beyond
    ``tolerance`` (relative, +2 absolute slack for tiny counts; m=256
    has ~6.5% standard error, so 20% ≈ 3σ) hash-mismatches.

    100 TB posture: production keeps ONLY the register branch — one
    (series, day, bucket) max aggregation over the corpus (map-side
    combinable, ≤ m rows per series-day), then a BOUNDED range join
    of the |series×days| day list against register rows within the
    window and a second ≤ m-row max per output day; registers stored
    daily roll up into weekly/monthly counts by the same max.  The
    exact branch exists to BE the gate; it re-shuffles keys per
    window and is the thing the sketch replaces.
    """
    from eventhub_to_timescale_spark.functions.scalars import (
        portable_hash32,
    )

    if m != 256:
        raise ValueError("portable HLL is pinned to m=256 (8 index bits)")
    if window_days < 1:
        raise ValueError(f"window_days must be positive, got {window_days}")
    base = events.filter(
        F.col(key_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("grp"),
        F.to_date(F.col(ts_col)).alias("day"),
        F.col(key_col).cast("string").alias("k"),
    )
    h = portable_hash32(F.col("k"), seed)
    daily = (
        base.select(
            "grp",
            "day",
            h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
            _hll_rho(F.shiftright(h, 8)).alias("rho"),
        )
        .groupBy("grp", "day", "bucket")
        .agg(F.max("rho").alias("r"))
    )
    days = daily.select("grp", "day").distinct()
    regs_src = daily.select(
        F.col("grp").alias("_g"),
        F.col("day").alias("_rd"),
        "bucket",
        "r",
    )
    merged = (
        days.join(
            regs_src,
            (F.col("_g") == F.col("grp"))
            & (F.col("_rd") <= F.col("day"))
            & (F.col("_rd") >= F.date_sub(F.col("day"), window_days - 1)),
        )
        .groupBy("grp", "day", "bucket")
        .agg(F.max("r").alias("r"))
    )
    per = merged.groupBy("grp", "day").agg(
        F.count(F.lit(1)).alias("nonzero"),
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), 25 - r)")).alias(
            "z_nonzero"
        ),
    )
    empty = F.lit(m) - F.col("nonzero")
    z_scaled = F.col("z_nonzero") + empty * F.lit(1 << 25)
    raw = F.lit(HLL_NUMER) / z_scaled
    est = F.when(
        (raw < F.lit(2.5 * m)) & (empty > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / empty),
    ).otherwise(raw)
    est_frame = per.select("grp", "day", est.alias("_est"))
    keys_src = base.select(
        F.col("grp").alias("_g"), F.col("day").alias("_kd"), "k"
    )
    exact = (
        days.join(
            keys_src,
            (F.col("_g") == F.col("grp"))
            & (F.col("_kd") <= F.col("day"))
            & (F.col("_kd") >= F.date_sub(F.col("day"), window_days - 1)),
        )
        .groupBy("grp", "day")
        .agg(F.countDistinct("k").alias("exact_distinct"))
    )
    err = F.abs(F.col("_est") - F.col("exact_distinct"))
    return (
        exact.join(est_frame, ["grp", "day"])
        .select(
            F.col("grp").alias(group_col),
            "day",
            "exact_distinct",
            (
                err <= F.lit(tolerance) * F.col("exact_distinct") + F.lit(2.0)
            ).alias("within_tolerance"),
        )
        .orderBy(group_col, "day")
    )


def hll_rolling_oracle_sql(
    window_days: int = 7,
    key_expr: str = "user_id",
    group_expr: str = "event_type",
    ts_expr: str = "ts",
    table: str = "events",
) -> str:
    """DuckDB rendering of ``hll_rolling_distinct``'s gate surface:
    the EXACT trailing-window distinct with ``within_tolerance``
    pinned TRUE — register drift beyond the bound flips the Spark-side
    boolean and hash-mismatches (same pattern as sketch_distinct)."""
    return f"""
WITH base AS (
  SELECT {group_expr} AS grp, CAST({ts_expr} AS DATE) AS day,
         CAST({key_expr} AS VARCHAR) AS k
  FROM {table}
  WHERE {key_expr} IS NOT NULL AND {group_expr} IS NOT NULL
),
days AS (SELECT DISTINCT grp, day FROM base)
SELECT d.grp AS {group_expr}, d.day,
       CAST(COUNT(DISTINCT b.k) AS BIGINT) AS exact_distinct,
       TRUE AS within_tolerance
FROM days d
JOIN base b ON b.grp = d.grp
           AND b.day <= d.day
           AND b.day >= d.day - {window_days - 1}
GROUP BY 1, 2
ORDER BY 1, 2
"""
