"""Join-key skew profiler.

Before shuffling 100 TB on a key, you want to know: how heavy is the
heaviest key, how does it compare to the average, and which keys would
need salting?  This operator answers with exact integers — the same
numbers the salted Q8/Q9 variants (operators/timeseries.py) and the
AQE skew-join threshold decisions are made from.

Output: the top-k heaviest keys, each row carrying the key's exact
count, its corpus share in ppm (count·1e6 div total — exact integer
division), its rank, and the global context every row shares: distinct
key count, total rows, max/avg ratio ×100 (max·100·n_keys div total —
exact integer cross-multiplication, no float anywhere), and the p99
per-key count (the ceil(0.99·n)-th order statistic of the count
distribution, an actual observed count — same convention as
operators/winsorize.py).  max/avg ×100 ≈ 100 means uniform; the salt
factor a skewed key needs is about cnt/p99_cnt.

Scale posture (100 TB): one map-side-combinable groupBy count over
the raw data, then every statistic runs on the COUNTS frame (one row
per distinct key).  The rank windows are global single-reducer over
that frame — fine while distinct keys fit a partition (billions of
rows, millions of keys); beyond that, take the top-k via the
two-phase heavy-hitter plan (operators/heavyhitters.py) and the p99
via the GK sketch (operators/sketches.py) — the output contract is
unchanged.

Sibling decision surface: operators/joinplan.py turns the SAME
question into executable advice (broadcast/salt/shuffle + an
explosion flag) from count-min sketches instead of exact counts —
use joinplan when a one-pass sketch profile is enough, this profiler
when you need the exact per-key evidence rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["skew_profile", "skew_profile_oracle_sql"]


def skew_profile(
    df: DataFrame,
    key_col: str = "user_id",
    top_k: int = 10,
    persist_counts: bool = True,
) -> DataFrame:
    """→ top_k rows (key, cnt, share_ppm, rank, n_keys, total_rows,
    max_avg_x100, p99_cnt), rank 1 = heaviest, count-desc with a
    key-asc tiebreak so the profile is deterministic.

    ``persist_counts`` (r11 advice: match the sibling r11 operators'
    opt-out) caches the two multi-consumer frames — counts feeds the
    ranked frame and both stats passes, ranked feeds the top-k and the
    p99 probe.  In a LONG-LIVED session pass ``persist_counts=False``
    (the cached frames are not handed back, so the caller cannot
    unpersist just these two; a global ``spark.catalog.clearCache()``
    would evict every cached frame in the session — don't).  Both
    cached frames are one row per DISTINCT key, never raw-data-sized."""
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(F.col(key_col).cast("string").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if persist_counts:
        counts = counts.persist()
    w_rank = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    w_stat = Window.orderBy("cnt", "key")
    ranked = counts.select(
        "key",
        "cnt",
        F.row_number().over(w_rank).alias("rank"),
        F.row_number().over(w_stat).alias("_arank"),
    )
    if persist_counts:
        ranked = ranked.persist()
    base_stats = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("total_rows"),
        F.max("cnt").alias("_max"),
    )
    p99 = (
        ranked.crossJoin(F.broadcast(base_stats.select("n_keys")))
        .filter(
            F.col("_arank")
            == F.ceil(F.lit(0.99) * F.col("n_keys")).cast("long")
        )
        .select(F.col("cnt").alias("p99_cnt"))
    )
    stats = base_stats.crossJoin(F.broadcast(p99))
    return (
        ranked.filter(F.col("rank") <= top_k)
        .crossJoin(F.broadcast(stats))
        .select(
            "key",
            "cnt",
            F.expr("cnt * 1000000 div total_rows").alias("share_ppm"),
            F.col("rank").cast("long").alias("rank"),
            "n_keys",
            "total_rows",
            F.expr("_max * 100 * n_keys div total_rows").alias(
                "max_avg_x100"
            ),
            "p99_cnt",
        )
        .orderBy("rank")
    )


def skew_profile_oracle_sql(
    key_expr: str = "user_id",
    top_k: int = 10,
    table: str = "events",
) -> str:
    """DuckDB rendering — same exact counts, ranks, integer
    cross-multiplied ratios (`//` ≡ Spark `div` on non-negatives),
    and ceil(0.99·n) order statistic."""
    return f"""
WITH counts AS (
  SELECT CAST({key_expr} AS VARCHAR) AS key,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM {table} WHERE {key_expr} IS NOT NULL
  GROUP BY 1
),
ranked AS (
  SELECT key, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rank,
         ROW_NUMBER() OVER (ORDER BY cnt, key) AS arank
  FROM counts
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
         CAST(SUM(cnt) AS BIGINT) AS total_rows,
         MAX(cnt) AS max_cnt
  FROM counts
),
p99 AS (
  SELECT r.cnt AS p99_cnt
  FROM ranked r, stats s
  WHERE r.arank = CAST(ceil(0.99 * s.n_keys) AS BIGINT)
)
SELECT r.key, r.cnt,
       r.cnt * 1000000 // s.total_rows AS share_ppm,
       CAST(r.rank AS BIGINT) AS rank,
       s.n_keys, s.total_rows,
       s.max_cnt * 100 * s.n_keys // s.total_rows AS max_avg_x100,
       p.p99_cnt
FROM ranked r, stats s, p99 p
WHERE r.rank <= {top_k}
ORDER BY r.rank
"""
