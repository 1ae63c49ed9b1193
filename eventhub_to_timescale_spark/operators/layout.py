"""Z-order (Morton-curve) data layout — multi-dimensional clustering
for parquet row-group pruning at lakehouse scale.

A 100 TB hypertable is usually laid out along ONE axis (time), so a
predicate on any second dimension (device, user, value band) scans
every row group in the time slice.  Interleaving the bits of two
quantized dimensions into one sort key bounds BOTH dimensions' min/max
spread inside every file/row group, so the scan planner's ordinary
stats pruning (parquet footer min/max — no new reader support needed)
skips most of the table for 2-D predicates.  This is the standard
Delta/Iceberg `OPTIMIZE ZORDER BY` technique, built here from plain
Spark expressions; the reference's single-node engine has no layout
layer at all (its hypertable is Postgres-managed, SURVEY.md §1.1), so
this is framed as a scale extension.

Everything is exact integer arithmetic — quantize by true integer
division (SQL ``div``, mirrored by DuckDB ``//``) against dataset
bounds, spread via shift/mask ladders — so the oracle reproduces every
z-value bit-for-bit: the layout key itself is oracle-checked, not just
"some ordering".

100 TB posture: the bounds pass is a map-side-combinable min/max agg
broadcast back as a 1-row join (at warehouse scale you'd pin constants
in table metadata instead); quantize+interleave are per-row codegen
expressions fused into the scan; the only exchange is the
``repartitionByRange`` that IS the product — a range shuffle on the
z-key whose sampled bounds give ~equal-sized output files.  Nothing
here is quadratic, stateful, or Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Part1By1: spread a 16-bit int's bits into the even positions of a
# 32-bit word (classic Morton mask ladder; each step doubles the gap).
_SPREAD_STEPS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def spread16(col: Column) -> Column:
    """Bits of a value in [0, 2^16) → even bit positions of a bigint."""
    x = col.cast("long")
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue16(qx: Column, qy: Column) -> Column:
    """Interleave two 16-bit quantized dims into a 32-bit Morton key
    (qx in even bits, qy in odd bits)."""
    return spread16(qx).bitwiseOR(F.shiftleft(spread16(qy), 1))


def _with_zval(
    df: DataFrame, x_col: str, y_col: str, out_col: str = "zval"
) -> DataFrame:
    """Attach the Morton key of two integer-valued columns, quantized
    16-bit against the frame's own min/max bounds (1-row broadcast
    agg).  Quantization is ``(v - lo) * 65535 div (hi - lo)`` in TRUE
    integer division — no float anywhere, so DuckDB's ``//`` agrees on
    every row; degenerate bounds (hi == lo) quantize to 0.
    """
    xl, yl = F.col(x_col).cast("long"), F.col(y_col).cast("long")
    bounds = df.agg(
        F.min(xl).alias("__xlo"),
        F.max(xl).alias("__xhi"),
        F.min(yl).alias("__ylo"),
        F.max(yl).alias("__yhi"),
    )
    quant = (
        "CASE WHEN {hi} <= {lo} THEN CAST(0 AS BIGINT) "
        "ELSE (CAST({v} AS BIGINT) - {lo}) * 65535 div ({hi} - {lo}) END"
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn(
            out_col,
            zvalue16(
                F.expr(quant.format(v=x_col, lo="__xlo", hi="__xhi")),
                F.expr(quant.format(v=y_col, lo="__ylo", hi="__yhi")),
            ),
        )
        .drop("__xlo", "__xhi", "__ylo", "__yhi")
    )


def zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    partitions: int = 32,
) -> DataFrame:
    """Cluster ``df`` on the Morton key of two integer-valued columns:
    quantize each against its dataset min/max, interleave, range-
    repartition on the z-key and sort within partitions.  The returned
    frame, written to parquet, yields files whose footer min/max
    bounds BOTH source dimensions — the pruning property
    ``tests/test_layout.py`` measures on real row-group stats.
    """
    keyed = _with_zval(df, x_col, y_col)
    return keyed.repartitionByRange(partitions, "zval").sortWithinPartitions(
        "zval"
    )


def zorder_bucket_profile(
    events: DataFrame, prefix_bits: int = 12
) -> DataFrame:
    """Registered, oracle-checked surface for the z-key math: quantize
    (user_id, value-cents) over the events table, interleave, and
    profile the curve by its ``prefix_bits`` most-significant bits —
    per bucket the row count and the exact min/max z-value.

    → (z_bucket, n_events, z_min, z_max), ordered by z_bucket; ≤ 2^12
    rows regardless of SF, with every row's values depending on every
    input row's full 32-bit key (so a single bit-ladder mistake in
    either engine flips the hash).

    100 TB posture: one scan, one map-side-combinable aggregate over a
    fixed 4 096-key space; the quantization bounds come from a 1-row
    broadcast agg exactly as ``zorder_layout`` uses them.
    """
    base = events.select(
        F.col("user_id").cast("long").alias("u"),
        F.round(F.col("value") * 100).cast("long").alias("v"),
    )
    z = _with_zval(base, "u", "v").select("zval")
    return (
        z.groupBy(
            F.shiftrightunsigned(F.col("zval"), 32 - prefix_bits).alias(
                "z_bucket"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
        .orderBy("z_bucket")
    )


def zorder_bucket_profile_oracle_sql(prefix_bits: int = 12) -> str:
    """DuckDB rendering of ``zorder_bucket_profile`` — the same mask
    ladder in integer SQL (``//`` matches ``div`` on non-negative
    operands; all intermediates BIGINT)."""

    def spread(expr: str) -> str:
        x = f"CAST({expr} AS BIGINT)"
        for shift, mask in _SPREAD_STEPS:
            x = f"(({x} | ({x} << {shift})) & {mask})"
        return x

    quant = (
        "CASE WHEN s.{hi} <= s.{lo} THEN 0 "
        "ELSE ((b.{v} - s.{lo}) * 65535) // (s.{hi} - s.{lo}) END"
    )
    qx = quant.format(v="u", lo="xlo", hi="xhi")
    qy = quant.format(v="v", lo="ylo", hi="yhi")
    return f"""
WITH base AS (
  SELECT CAST(user_id AS BIGINT) AS u,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
), stats AS (
  SELECT MIN(u) AS xlo, MAX(u) AS xhi, MIN(v) AS ylo, MAX(v) AS yhi
  FROM base
), z AS (
  SELECT {spread(f'({qx})')}
         | ({spread(f'({qy})')} << 1) AS zval
  FROM base b, stats s
)
SELECT zval >> {32 - prefix_bits} AS z_bucket,
       COUNT(*) AS n_events,
       MIN(zval) AS z_min,
       MAX(zval) AS z_max
FROM z
GROUP BY 1 ORDER BY 1
"""


def range_partition_profile(
    events: DataFrame, n_buckets: int = 8
) -> DataFrame:
    """Balanced range-partition boundaries for a (event_type, value)
    sort layout: per event_type, split the value distribution into
    ``n_buckets`` equal-count tiles (NTILE with a total (value,
    event_id) tiebreak) and report each tile's exact row count and
    [lo, hi] value span — the split points a writer would hand to a
    range partitioner so every output file carries the same row count.

    → (event_type, bucket, n_rows, lo, hi), ordered; ≤ |types| x k
    rows regardless of SF.  min/max pass doubles through untouched
    (no float arithmetic), so cross-engine parity is exact.

    100 TB posture: the window partitions by event_type, so each
    type's tile assignment is one reducer — fine when |types| >>
    cores and types are balanced (this corpus), a straggler when one
    type dominates.  At that point swap the EXACT tiling for split
    points from the mergeable GK sketch (operators/sketches.py:
    gk_quantiles) and keep this operator as the verification path on
    a sample: the output contract (per-bucket count + span) is
    unchanged.  Everything after the window is a map-side-combinable
    agg on a bounded key space.
    """
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    tiled = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        "value",
        F.ntile(n_buckets).over(w).alias("bucket"),
    )
    return (
        tiled.groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("value").alias("lo"),
            F.max("value").alias("hi"),
        )
        .orderBy("event_type", "bucket")
    )


def range_partition_profile_oracle_sql(
    n_buckets: int = 8, table: str = "events"
) -> str:
    """DuckDB rendering of ``range_partition_profile`` — same NTILE
    semantics (both engines implement the SQL-standard equal-count
    tiling with remainder rows going to the leading tiles) over the
    same total order."""
    return f"""
WITH tiled AS (
  SELECT event_type, value,
         NTILE({n_buckets}) OVER (
           PARTITION BY event_type ORDER BY value, event_id) AS bucket
  FROM {table} WHERE value IS NOT NULL
)
SELECT event_type, bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       MIN(value) AS lo,
       MAX(value) AS hi
FROM tiled
GROUP BY event_type, bucket
ORDER BY event_type, bucket
"""


__all__ = [
    "spread16",
    "zvalue16",
    "zorder_layout",
    "zorder_bucket_profile",
    "zorder_bucket_profile_oracle_sql",
    "range_partition_profile",
    "range_partition_profile_oracle_sql",
]
