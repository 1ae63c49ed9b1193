"""global_enumerate / wfq_interleave (operators/ordering.py):
equivalence with the single-partition window they replace, the WFQ
smoothness guarantee, and the plan shape (range exchange, NO window
operator anywhere).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window


class TestGlobalEnumerate:
    def test_equals_window_rank(self, spark):
        from eventhub_to_timescale_spark.operators.ordering import (
            global_enumerate,
        )

        df = spark.range(0, 5000).select(
            (F.col("id") * 2654435761 % 100003).alias("k"),
            F.col("id").alias("uid"),
        )
        got = {
            (r["k"], r["uid"]): r["global_pos"]
            for r in global_enumerate(df, ["k", "uid"], partitions=16).collect()
        }
        want = {
            (r["k"], r["uid"]): r["rn"]
            for r in df.withColumn(
                "rn",
                F.row_number().over(Window.orderBy("k", "uid")) - 1,
            ).collect()
        }
        assert got == want

    def test_dense_and_stable_across_runs(self, spark):
        from eventhub_to_timescale_spark.operators.ordering import (
            global_enumerate,
        )

        df = spark.range(0, 3000).select(F.col("id").alias("k"))
        a = sorted(
            (r["k"], r["global_pos"])
            for r in global_enumerate(df, ["k"], partitions=8).collect()
        )
        b = sorted(
            (r["k"], r["global_pos"])
            for r in global_enumerate(df, ["k"], partitions=8).collect()
        )
        assert a == b
        poss = sorted(p for _, p in a)
        assert poss == list(range(3000))

    def test_no_window_no_single_partition_sort(self, spark):
        from eventhub_to_timescale_spark.operators.ordering import (
            global_enumerate,
        )

        df = spark.range(0, 1000).select(F.col("id").alias("k"))
        plan = (
            global_enumerate(df, ["k"], partitions=8)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert "rangepartitioning" in plan
        # the cliff this operator exists to avoid: an exchange that
        # funnels the data through one partition
        assert "Exchange SinglePartition" not in plan


class TestWfqInterleave:
    def _schedule(self, spark):
        from eventhub_to_timescale_spark.operators.ordering import (
            wfq_interleave,
        )

        docs = spark.createDataFrame(
            [(i, "s%d" % (i % 3)) for i in range(300)],
            "doc_id long, source string",
        )
        # weights: s0 → 1, s1 → 2, s2 → 3 (lcm 6)
        weight = F.expr(
            "CASE source WHEN 's0' THEN 1 WHEN 's1' THEN 2 ELSE 3 END"
        )
        return wfq_interleave(
            docs, weight, weights_lcm=6, partitions=8
        ).orderBy("global_pos")

    def test_prefix_shares_track_weights(self, spark):
        """Over any prefix of length n, source s holds within ±1 of
        n·w_s/Σw items — the smoothness bound WFQ guarantees."""
        rows = self._schedule(spark).collect()
        weights = {"s0": 1, "s1": 2, "s2": 3}
        total = sum(weights.values())
        seen = {s: 0 for s in weights}
        for n, r in enumerate(rows[:120], start=1):
            seen[r["source"]] += 1
            for s, w in weights.items():
                ideal = n * w / total
                assert abs(seen[s] - ideal) <= 1.0 + 1e-9, (
                    n,
                    s,
                    seen[s],
                    ideal,
                )

    def test_within_source_order_preserved(self, spark):
        """Docs of one source appear in key order in the schedule."""
        rows = self._schedule(spark).collect()
        by_source = {}
        for r in rows:
            by_source.setdefault(r["source"], []).append(r["doc_id"])
        for ids in by_source.values():
            assert ids == sorted(ids)

    def test_positions_dense(self, spark):
        rows = self._schedule(spark).collect()
        assert [r["global_pos"] for r in rows] == list(range(300))
