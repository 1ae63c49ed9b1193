"""CUSUM change-point detection over per-type event series — the
classical Page (1954) cumulative-sum control chart, made distributed-
exact.

Semantics: per ``event_type``, against the series' own mean μ, the
one-sided statistics

    S⁺_t = max(0, S⁺_{t−1} + (v_t − μ − κ))      (upward shift)
    S⁻_t = max(0, S⁻_{t−1} + (μ − v_t − κ))      (downward shift)

alarm whenever S > h. κ (the drift allowance) and h (the decision
threshold) are the user-set design parameters of the chart, in the
same unit as the values (classically κ ≈ δ/2 for the shift size δ one
wants to catch, h ≈ 4-5 σ).

Why this is expressible as a DataFrame plan at all: the recursive
``max(0, prev + x)`` fold is NOT a window aggregate — but it has the
standard closed form

    S_t = C_t − min(0, C_1, …, C_t)      where  C_t = Σ_{j≤t} x_j

(the reflected running sum), so two window functions — a running SUM
and a running MIN over the same ordered frame — compute it exactly.
Both Spark and DuckDB evaluate running-window aggregates sequentially
in frame order, and every quantity here is an INTEGER (values go
through the repo's integer-cents discipline; μ is the half-up-rounded
mean in cents, its ≤0.5-cent quantization being part of the operator
contract), so the result is bit-identical cross-engine with no
float-accumulation-order freedom.

Overflow headroom: |x_t| ≤ max|v|·100 + κ·100 ≈ 1e7 cents for these
tables; the running sum after 1e11 rows of one type is ≤ 1e18 < int64
max — a single event_type can hold a century of millisecond data
before the cumsum could wrap.

100 TB posture: ONE shuffle, on ``event_type``; within a type the
computation is an ordered linear scan — an intrinsic property of
exact CUSUM (S_t depends on the full prefix), so the unit of
parallelism is the type, exactly like the reference's per-series
continuous aggregates. For a single monster series, the practical
variant is segment-restarted CUSUM (reset per day/shard, one extra
groupBy key, embarrassingly parallel) at the cost of missing shifts
that straddle a reset — not implemented here because it changes the
alarm semantics; the docstring is the design note.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cusum_alarms(
    events: DataFrame,
    kappa_cents: int = 3000,
    h_cents: int = 24_000,
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    mu_cents: int | None = None,
) -> DataFrame:
    """→ (event_type, event_id, ts, direction): every event at which a
    one-sided CUSUM statistic first exceeds — is strictly above — the
    threshold ``h_cents``, direction ∈ {'up','down'}. An event tripping
    both sides (impossible for κ > 0, kept for κ = 0 completeness)
    emits two rows. Ordered by (event_type, event_id, direction).

    ``mu_cents``: the chart's target mean. None (default) uses each
    series' own half-up-rounded mean — the retrospective/batch form.
    An explicit value is the classical monitoring form (known process
    target) and the form the streaming twin
    (``streaming/stateful.py streaming_cusum_alarms``) converges to
    exactly, since a stream cannot know its full-series mean."""
    if kappa_cents < 0 or h_cents <= 0:
        raise ValueError(
            f"need kappa_cents ≥ 0 and h_cents > 0, got {kappa_cents}, {h_cents}"
        )
    base = events.filter(F.col(value_col).isNotNull()).select(
        F.col(type_col).alias("event_type"),
        F.col(id_col).alias("event_id"),
        F.col(ts_col).alias("ts"),
        # integer-cents discipline: round half-up, exact cross-engine
        F.floor(F.col(value_col) * 100 + F.lit(0.5))
        .cast("long")
        .alias("v_cents"),
    )
    if mu_cents is None:
        per_type = Window.partitionBy("event_type")
        # μ in cents, rounded half-up from the exact integer sums:
        # floor((2·Σv + n) / (2n)) — pure BIGINT arithmetic, no float
        # mean
        stats = base.withColumn(
            "_sum", F.sum("v_cents").over(per_type)
        ).withColumn("_n", F.count(F.lit(1)).over(per_type))
        mu = F.floor(
            (2 * F.col("_sum") + F.col("_n")) / (2 * F.col("_n"))
        ).cast("long")
    else:
        stats = base
        mu = F.lit(int(mu_cents))
    x_up = F.col("v_cents") - mu - F.lit(kappa_cents)
    x_dn = mu - F.col("v_cents") - F.lit(kappa_cents)
    ordered = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    scanned = (
        stats.withColumn("_c_up", F.sum(x_up).over(ordered))
        .withColumn("_c_dn", F.sum(x_dn).over(ordered))
        .withColumn(
            "_s_up",
            F.col("_c_up") - F.least(F.lit(0), F.min("_c_up").over(ordered)),
        )
        .withColumn(
            "_s_dn",
            F.col("_c_dn") - F.least(F.lit(0), F.min("_c_dn").over(ordered)),
        )
    )
    # one scan, one shuffle: both sides share the same window frame,
    # so emitting direction via a filtered-array explode keeps the
    # whole chart in a single Exchange + Sort + Window chain (a
    # unionAll of two filters would scan and window the source twice)
    alarms = F.filter(
        F.array(
            F.when(F.col("_s_up") > h_cents, F.lit("up")),
            F.when(F.col("_s_dn") > h_cents, F.lit("down")),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        scanned.select(
            "event_type",
            "event_id",
            "ts",
            F.explode(alarms).alias("direction"),
        )
        .orderBy("event_type", "event_id", "direction")
    )


def cusum_alarms_oracle_sql(
    kappa_cents: int = 3000,
    h_cents: int = 24_000,
    table: str = "events",
) -> str:
    """DuckDB rendering — the same integer cents, half-up μ, and
    reflected-running-sum identity over the same (ts, event_id)
    order."""
    return f"""
WITH base AS (
  SELECT event_type, event_id, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v_cents
  FROM {table} WHERE value IS NOT NULL
),
stats AS (
  SELECT *,
         SUM(v_cents) OVER (PARTITION BY event_type) AS _sum,
         COUNT(*) OVER (PARTITION BY event_type) AS _n
  FROM base
),
x AS (
  SELECT event_type, event_id, ts,
         v_cents - CAST(floor((2 * _sum + _n) / (2.0 * _n)) AS BIGINT)
           - {kappa_cents} AS x_up,
         CAST(floor((2 * _sum + _n) / (2.0 * _n)) AS BIGINT) - v_cents
           - {kappa_cents} AS x_dn
  FROM stats
),
csum AS (
  SELECT event_type, event_id, ts,
         SUM(x_up) OVER w AS c_up,
         SUM(x_dn) OVER w AS c_dn
  FROM x
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
scanned AS (
  SELECT event_type, event_id, ts,
         c_up - LEAST(0, MIN(c_up) OVER w) AS s_up,
         c_dn - LEAST(0, MIN(c_dn) OVER w) AS s_dn
  FROM csum
  WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, event_id, ts, direction FROM (
  SELECT event_type, event_id, ts, 'up' AS direction
  FROM scanned WHERE s_up > {h_cents}
  UNION ALL
  SELECT event_type, event_id, ts, 'down' AS direction
  FROM scanned WHERE s_dn > {h_cents}
)
ORDER BY event_type, event_id, direction
"""


__all__ = ["cusum_alarms", "cusum_alarms_oracle_sql"]
