"""Physical-plan pins for the round-7 operators: the shuffle counts
and pushdown shapes the 100 TB postures in their docstrings claim.
A regression that adds an Exchange or drops the map-side group-limit
fails here, not in a bench three rounds later.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    return spark.createDataFrame(
        [(i, f"s{i % 3}", 100 + i) for i in range(30)],
        "doc_id long, source string, n_chars long",
    )


def _events(spark):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, 1 + i % 3), i % 5, "view") for i in range(20)],
        "event_id long, ts timestamp, user_id long, event_type string",
    )


class TestSamplingPlans:
    def test_source_quota_uses_map_side_group_limit(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            source_quota,
        )

        plan = _plan(source_quota(_docs(spark), "doc_id", "source", 5))
        # partial top-k runs BEFORE the exchange (WindowGroupLimit
        # appears on both sides of the shuffle)
        assert plan.count("WindowGroupLimit") >= 2
        assert plan.count("Exchange") <= 1

    def test_sample_weighted_is_scan_side_filter(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import (
            sample_weighted,
        )

        plan = _plan(
            sample_weighted(
                _docs(spark), "doc_id", F.col("n_chars") / F.lit(500.0)
            )
        )
        assert "Exchange" not in plan
        assert "Window" not in plan


class TestIntervalPlans:
    def test_coalesce_single_shuffle(self, spark):
        from eventhub_to_timescale_spark.operators.intervals import (
            coalesce_intervals,
        )

        iv = spark.createDataFrame(
            [("a", datetime(2024, 1, 1), datetime(2024, 1, 2))],
            "measurement_subject string, start timestamp, end timestamp",
        )
        plan = _plan(coalesce_intervals(iv))
        # both windows + the partial-agg groupBy share one partitioning
        assert plan.count("Exchange") <= 1


class TestRetentionPlans:
    def test_no_self_join(self, spark):
        from eventhub_to_timescale_spark.operators.retention import (
            cohort_retention,
        )

        plan = _plan(cohort_retention(_events(spark)))
        assert "Join" not in plan
        # grid distinct + user window + cell count: ≤3 exchanges, and
        # no distinct-aggregate Expand (count(*) on the grid suffices)
        assert plan.count("Exchange") <= 3
        assert "Expand" not in plan


class TestFunnelPlans:
    def test_single_fact_scan_no_join(self, spark):
        from eventhub_to_timescale_spark.operators.funnel import (
            funnel_reached,
        )

        plan = _plan(
            funnel_reached(_events(spark), ["view", "click", "purchase"])
        )
        assert "Join" not in plan
        assert plan.count("Scan ExistingRDD") + plan.count(
            "LocalTableScan"
        ) <= 1


class TestRelationalPlans:
    def test_q18_survivors_broadcast_orders_probe(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            large_quantity_orders,
        )

        li = spark.createDataFrame(
            [(1, 10.0)], "l_orderkey long, l_quantity double"
        )
        orders = spark.createDataFrame(
            [(1, 1, datetime(2024, 1, 1), 5.0)],
            "o_orderkey long, o_custkey long, o_orderdate timestamp, "
            "o_totalprice double",
        )
        cust = spark.createDataFrame(
            [(1, "c")], "c_custkey long, c_name string"
        )
        df = large_quantity_orders(li, orders, cust, 5)
        df.collect()  # let AQE finalize before reading the plan
        # toString includes the pre-AQE "Initial Plan" section — only
        # the final plan above it reflects what actually ran
        plan = _plan(df).split("== Initial Plan ==")[0]
        # the HAVING-aggregate survivor side is the broadcast build
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
