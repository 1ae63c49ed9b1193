"""trending_topk (operators/trending.py): tie-break totality and the
aggregate-before-window plan shape."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F


def _events(spark):
    base = datetime(2024, 1, 1)
    rows = []
    # bucket 0: a×3, b×3 (tie), c×1 ; bucket 1: c×2, a×1
    for i, t in enumerate(["a", "a", "a", "b", "b", "b", "c"]):
        rows.append((i, base + timedelta(minutes=i), t))
    for i, t in enumerate(["c", "c", "a"]):
        rows.append((10 + i, base + timedelta(hours=7, minutes=i), t))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string"
    )


class TestTrendingTopk:
    def test_counts_ranks_and_tiebreak(self, spark):
        from eventhub_to_timescale_spark.operators.trending import (
            trending_topk,
        )

        got = [
            (r["event_type"], r["n_events"], r["rk"])
            for r in trending_topk(_events(spark), 21600, k=2).collect()
        ]
        # bucket 0: tie a/b at 3 → a first by name; bucket 1: c then a
        assert got == [("a", 3, 1), ("b", 3, 2), ("c", 2, 1), ("a", 1, 2)]

    def test_window_runs_on_aggregated_frame(self, spark):
        from eventhub_to_timescale_spark.operators.trending import (
            trending_topk,
        )

        df = trending_topk(_events(spark), 21600, k=2)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the count aggregate must sit BELOW the window (executes
        # first): in toString order the Window prints above the
        # partial_count of the raw scan
        win, agg = plan.find("Window"), plan.find("partial_count")
        assert win != -1 and agg != -1 and win < agg
        assert "WindowGroupLimit" in plan
