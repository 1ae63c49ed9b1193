"""Z-order layout (operators/layout.py): Morton-key bit math against
hand-computed values, and the property the operator exists for —
parquet footer min/max stats written from a z-ordered frame prune
row groups for predicates on EITHER dimension, where a 1-D sort only
prunes its own sort column.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F


class TestMortonKey:
    def test_known_interleavings(self, spark):
        from eventhub_to_timescale_spark.operators.layout import zvalue16

        cases = [
            (0, 0, 0),
            (1, 0, 1),
            (0, 1, 2),
            (1, 1, 3),
            (2, 0, 4),
            (0, 2, 8),
            (3, 3, 15),
            (65535, 0, 0x55555555),
            (0, 65535, 0xAAAAAAAA),
            (65535, 65535, 0xFFFFFFFF),
        ]
        df = spark.createDataFrame(
            [(x, y) for x, y, _ in cases], "qx long, qy long"
        )
        got = [
            r["z"]
            for r in df.select(
                zvalue16(F.col("qx"), F.col("qy")).alias("z")
            ).collect()
        ]
        assert got == [z for _, _, z in cases]

    def test_monotone_within_axis(self, spark):
        """Fixing one dim, the z-key is strictly increasing in the
        other — the curve never folds back within an axis line."""
        from eventhub_to_timescale_spark.operators.layout import zvalue16

        df = spark.range(0, 4096).select(
            F.col("id").alias("qx"), F.lit(7).alias("qy")
        )
        rows = df.select(
            "qx", zvalue16(F.col("qx"), F.col("qy")).alias("z")
        ).collect()
        zs = [r["z"] for r in sorted(rows, key=lambda r: r["qx"])]
        assert all(a < b for a, b in zip(zs, zs[1:]))


def _stats(path_glob: str, col_idx_by_name):
    """Per-file (min, max) of two columns from parquet footers —
    exactly the pruning surface a scan planner consults."""
    out = []
    for f in sorted(glob.glob(path_glob)):
        md = pq.ParquetFile(f).metadata
        mins = {}
        maxs = {}
        for rg in range(md.num_row_groups):
            for name, idx in col_idx_by_name.items():
                st = md.row_group(rg).column(idx).statistics
                mins[name] = min(mins.get(name, st.min), st.min)
                maxs[name] = max(maxs.get(name, st.max), st.max)
        out.append((mins, maxs))
    return out


class TestLayoutPruning:
    def _frame(self, spark):
        # two independent, deterministic uniform-ish dims
        return spark.range(0, 20000).select(
            (F.col("id") % 1000).alias("x"),
            ((F.col("id") * 7919) % 1000).alias("y"),
        )

    def test_zorder_bounds_both_dims(self, spark, tmp_path):
        from eventhub_to_timescale_spark.operators.layout import (
            zorder_layout,
        )

        df = self._frame(spark)
        zdir = str(tmp_path / "zorder")
        xdir = str(tmp_path / "xsort")
        zorder_layout(df, "x", "y", partitions=16).write.parquet(zdir)
        df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(
            xdir
        )
        cols = {"x": 0, "y": 1}
        zstats = _stats(zdir + "/part-*.parquet", cols)
        xstats = _stats(xdir + "/part-*.parquet", cols)
        assert len(zstats) >= 8 and len(xstats) >= 8

        # a y-only band predicate: y BETWEEN 100 AND 160 (~6% of rows)
        def hits(stats):
            return sum(
                1
                for mins, maxs in stats
                if not (maxs["y"] < 100 or mins["y"] > 160)
            ) / len(stats)

        # the x-sorted layout cannot prune on y at all …
        assert hits(xstats) == 1.0
        # … the z-ordered layout skips at least half the files on
        # footer stats alone
        assert hits(zstats) <= 0.5

        # and the z-layout still prunes x-band predicates too
        def hits_x(stats):
            return sum(
                1
                for mins, maxs in stats
                if not (maxs["x"] < 100 or mins["x"] > 160)
            ) / len(stats)

        assert hits_x(zstats) <= 0.5

    def test_layout_is_deterministic_and_lossless(self, spark):
        from eventhub_to_timescale_spark.operators.layout import (
            zorder_layout,
        )

        df = self._frame(spark)
        out = zorder_layout(df, "x", "y", partitions=8)
        assert out.count() == 20000
        # same rows, plus the key column
        assert set(out.columns) == {"x", "y", "zval"}
        a = sorted(
            (r["x"], r["y"], r["zval"]) for r in out.collect()
        )
        b = sorted(
            (r["x"], r["y"], r["zval"])
            for r in zorder_layout(df, "x", "y", partitions=8).collect()
        )
        assert a == b
