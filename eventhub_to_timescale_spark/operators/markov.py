"""Event-sequence modelling: first-order Markov transition matrices and
inter-arrival (burstiness) statistics.

These are the sequence-level analytics a training-data pipeline runs
over clickstream-style event logs before building session corpora:
which state follows which (transition matrix, Laplace-smoothed so the
downstream LM never sees a zero), and how bursty each event type's
arrival process is (the classic Goh-Barabasi burstiness coefficient
(sigma - mu) / (sigma + mu) over inter-arrival gaps).

Reference parity note: the reference engine (mnbf9rca/eventhub-to-
timescale) has no sequence analytics; this module is part of the
separately-briefed LLM-data-pipeline extension.  Its time-ordering
semantics (ties broken by event_id) mirror the reference's
timestamp-ordered processing in shared_code/timeseries.py.

Scale posture (100 TB):
  * ``markov_transitions`` — ONE shuffle: the lag window partitions by
    ``user_id`` (per-user sequences are independent), then the pair
    count is a map-side-combinable groupBy on a bounded key space
    (|event_type|^2).  The per-source totals join is a broadcast of an
    aggregate that is at most |event_type| rows.  No collect, no
    global sort; the final orderBy exists only for the deterministic
    test surface.
  * ``interarrival_stats`` — the lag window partitions by
    ``event_type``.  A skewed type (one type = half the corpus) makes
    that window a straggler; at scale, pre-aggregate per (type, day)
    and merge moments, or salt the window by day.  The output is one
    row per event type, so everything after the window is map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "markov_transitions",
    "interarrival_stats",
    "markov_oracle_sql",
    "interarrival_oracle_sql",
]


def _seq_window(user_col: str, ts_col: str, id_col: str):
    """Per-user time order with a total tiebreak (ts then id)."""
    return Window.partitionBy(user_col).orderBy(ts_col, id_col)


def markov_transitions(
    events: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    state_col: str = "event_type",
    alpha: int = 1,
    persist_pairs: bool = True,
) -> DataFrame:
    """Laplace-smoothed first-order Markov transition matrix.

    For every ordered pair of consecutive events within one user's
    timeline, count the (state -> next_state) transition, then smooth:

        p = (pair_n + alpha) / (from_total + alpha * n_states)

    where ``n_states`` is the number of distinct DESTINATION states
    observed anywhere in the corpus (the vocabulary the smoother
    shares mass with).  Only observed pairs are emitted — the smoothed
    probability of an unobserved pair is derivable from the same
    constants and materialising |V|^2 zero rows helps nobody at scale.

    Returns one row per observed (from_state, to_state):
      from_state, to_state, pair_n, from_total, prob (double).
    """
    w = _seq_window(user_col, ts_col, id_col)
    pairs = (
        events.select(
            F.col(state_col).alias("from_state"),
            F.lead(state_col).over(w).alias("to_state"),
        )
        .filter(F.col("to_state").isNotNull())
    )
    pair_n = pairs.groupBy("from_state", "to_state").agg(
        F.count(F.lit(1)).alias("pair_n")
    )
    if persist_pairs:
        # pair_n feeds THREE consumers (totals, n_states, the final
        # join); without the boundary each re-runs the lag window
        # over raw events. The cached frame is |states|^2 rows max.
        pair_n = pair_n.persist()
    from_total = pair_n.groupBy("from_state").agg(
        F.sum("pair_n").alias("from_total")
    )
    n_states = pair_n.select(
        F.countDistinct("to_state").alias("n_states")
    )
    return (
        pair_n.join(F.broadcast(from_total), "from_state")
        .crossJoin(F.broadcast(n_states))
        .select(
            "from_state",
            "to_state",
            "pair_n",
            "from_total",
            (
                (F.col("pair_n") + F.lit(alpha))
                / (F.col("from_total") + F.lit(alpha) * F.col("n_states"))
            ).alias("prob"),
        )
        .orderBy("from_state", "to_state")
    )


def _burstiness(mu: Column, sigma: Column) -> Column:
    """Goh-Barabasi burstiness B = (sigma - mu) / (sigma + mu)."""
    denom = sigma + mu
    return F.when(denom > 0, (sigma - mu) / denom).otherwise(F.lit(0.0))


def interarrival_stats(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    id_col: str = "event_id",
    state_col: str = "event_type",
) -> DataFrame:
    """Per-event-type inter-arrival gap statistics.

    Gaps are milliseconds between consecutive events of the same type
    (ordered by ts, id-tiebroken), kept as exact int64 through the
    aggregation — mean and population stddev are derived from the
    exact moment sums (sum, sum of squares), so the result is a pure
    function of the data with NO float-summation order dependence:
    any engine computing the same integer moments produces the same
    doubles bit-for-bit.  (sum(gap_ms^2) fits int64 for spans up to
    ~3e9 ms per gap — a month-long gap squared is 6.9e18 < 2^63.)

    Emits n_gaps, mean/stddev of the gap in seconds, min/max gap in
    milliseconds, and the Goh-Barabasi burstiness coefficient.  Types
    with a single event have no gaps and are dropped.
    """
    w = Window.partitionBy(state_col).orderBy(ts_col, id_col)
    gaps = (
        events.select(
            F.col(state_col).alias("event_type"),
            (
                F.unix_millis(F.col(ts_col))
                - F.unix_millis(F.lag(ts_col).over(w))
            ).alias("gap_ms"),
        )
        .filter(F.col("gap_ms").isNotNull())
    )
    agg = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_ms").alias("sum_ms"),
        F.sum(F.col("gap_ms") * F.col("gap_ms")).alias("sum_sq_ms"),
        F.min("gap_ms").alias("min_gap_ms"),
        F.max("gap_ms").alias("max_gap_ms"),
    )
    # Same arithmetic shape as the oracle SQL: cast-to-double the
    # exact integer moments, then mean = s/n/1000, var = ss/n - m^2.
    mean_ms = agg["sum_ms"].cast("double") / agg["n_gaps"]
    var_ms = (
        agg["sum_sq_ms"].cast("double") / agg["n_gaps"] - mean_ms * mean_ms
    )
    mean_s = mean_ms / F.lit(1000.0)
    std_s = F.sqrt(F.greatest(var_ms, F.lit(0.0))) / F.lit(1000.0)
    return agg.select(
        "event_type",
        "n_gaps",
        F.round(mean_s, 6).alias("mean_gap_s"),
        F.round(std_s, 6).alias("std_gap_s"),
        "min_gap_ms",
        "max_gap_ms",
        F.round(_burstiness(mean_s, std_s), 6).alias("burstiness"),
    ).orderBy("event_type")


def markov_oracle_sql(alpha: int = 1, table: str = "events") -> str:
    """DuckDB rendering of markov_transitions — same (ts, event_id)
    sequence order, same Laplace smoothing over observed destination
    states.  Integer SUM is CAST AS BIGINT (type-strict oracle
    contract); the division of two BIGINTs is a true division in both
    engines, applied to identical exact integers, so the probability
    doubles match bit-for-bit with no rounding."""
    return f"""
WITH pairs AS (
  SELECT event_type AS from_state,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_state
  FROM {table}
),
pair_n AS (
  SELECT from_state, to_state, CAST(COUNT(*) AS BIGINT) AS pair_n
  FROM pairs WHERE to_state IS NOT NULL
  GROUP BY from_state, to_state
),
tot AS (
  SELECT from_state, CAST(SUM(pair_n) AS BIGINT) AS from_total
  FROM pair_n GROUP BY from_state
),
ns AS (SELECT CAST(COUNT(DISTINCT to_state) AS BIGINT) AS n_states
       FROM pair_n)
SELECT p.from_state, p.to_state, p.pair_n, t.from_total,
       (p.pair_n + {alpha}) / (t.from_total + {alpha} * ns.n_states)
         AS prob
FROM pair_n p JOIN tot t USING (from_state) CROSS JOIN ns
ORDER BY from_state, to_state
"""


def interarrival_oracle_sql(table: str = "events") -> str:
    """DuckDB rendering of interarrival_stats — the SAME exact-integer
    millisecond moments and the SAME arithmetic shape (s/n/1000,
    ss/n - (s/n)^2), so every double matches bit-for-bit before the
    final ROUND.  epoch_ms() truncates microseconds exactly like
    Spark's unix_millis for post-epoch timestamps."""
    return f"""
WITH gaps AS (
  SELECT event_type,
         epoch_ms(ts) - LAG(epoch_ms(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) AS gap_ms
  FROM {table}
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(gap_ms) AS BIGINT) AS sum_ms,
         CAST(SUM(gap_ms * gap_ms) AS BIGINT) AS sum_sq_ms,
         MIN(gap_ms) AS min_gap_ms,
         MAX(gap_ms) AS max_gap_ms
  FROM gaps WHERE gap_ms IS NOT NULL
  GROUP BY event_type
),
m AS (
  SELECT *,
         CAST(sum_ms AS DOUBLE) / n_gaps / 1000.0 AS mean_s,
         sqrt(greatest(
           CAST(sum_sq_ms AS DOUBLE) / n_gaps
             - (CAST(sum_ms AS DOUBLE) / n_gaps)
               * (CAST(sum_ms AS DOUBLE) / n_gaps),
           0.0)) / 1000.0 AS std_s
  FROM agg
)
SELECT event_type, n_gaps,
       ROUND(mean_s, 6) AS mean_gap_s,
       ROUND(std_s, 6) AS std_gap_s,
       min_gap_ms, max_gap_ms,
       ROUND(CASE WHEN std_s + mean_s > 0
                  THEN (std_s - mean_s) / (std_s + mean_s)
                  ELSE 0.0 END, 6) AS burstiness
FROM m ORDER BY event_type
"""
