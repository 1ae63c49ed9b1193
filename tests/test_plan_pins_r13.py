"""Physical-plan pins for the round-13 operators: the GK bands'
map-side-combinable aggregation (NO per-cell window sort), the Bloom
seen-verdicts' broadcast position join, the join-planning profile's
broadcast inner product, RRF's TakeOrderedAndProject — and,
everywhere, the absence of cartesian products.
"""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    rows = [
        (i, ("the quick brown fox jumps over the lazy dog " * 4) + str(i))
        for i in range(10)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _events(spark):
    from datetime import datetime

    rows = [
        (i, datetime(2024, 1, 1 + i // 24, i % 24), i % 5, "t",
         float(i % 7))
        for i in range(48)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


class TestQuantileBandsGKPlan:
    def test_no_window_sort_one_partial_agg(self, spark):
        """THE point of the GK twin: no Window (no per-cell full
        sort) — the bands come from a partial+final ObjectHashAggregate
        on (event_type, day), so a hot cell costs sketch memory,
        never a single-task sort of its row set."""
        from eventhub_to_timescale_spark.operators.quantband import (
            quantile_bands,
            quantile_bands_gk,
        )

        gk_plan = _plan(quantile_bands_gk(_events(spark)))
        assert "Window" not in gk_plan
        assert "percentile_approx" in gk_plan
        # partial aggregation happens before the exchange
        assert "partial_percentile_approx" in gk_plan
        assert "Cartesian" not in gk_plan
        # contrast pin: the exact form DOES have the window sort —
        # if this ever stops holding, the caveat docs are stale
        exact_plan = _plan(quantile_bands(_events(spark)))
        assert "Window" in exact_plan

    def test_streaming_twin_projection_is_jvm_side(self, spark):
        """The stream's pre-state projection (type, day, cents) is
        plain expression work — no Python stage before the stateful
        operator would be reachable in a streaming plan; pin the
        batch-analyzable projection here."""
        from pyspark.sql import functions as F

        ev = _events(spark).filter(
            F.col("event_type").isNotNull()
        ).select(
            "event_type",
            F.to_date("ts").cast("string").alias("day"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("v_cents"),
        )
        plan = _plan(ev)
        assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


class TestBloomSeenPlan:
    def test_broadcast_first_setter_join_no_cartesian(self, spark):
        """bloom_seen_verdicts: the ≤ m-row first-setter frame joins
        back BROADCAST (the k×N fan never shuffles for the probe);
        the only hash shuffles key on the bounded position space and
        the doc ids."""
        from eventhub_to_timescale_spark.operators.bloom import (
            bloom_seen_verdicts,
        )

        plan = _plan(bloom_seen_verdicts(_docs(spark)))
        assert "BroadcastHashJoin" in plan
        assert "Cartesian" not in plan

    def test_position_fan_is_expression_work(self, spark):
        """The k-position fan is JVM-side md5 expressions — no Python
        stage anywhere in the batch twin."""
        from eventhub_to_timescale_spark.operators.bloom import (
            bloom_seen_verdicts,
        )

        plan = _plan(bloom_seen_verdicts(_docs(spark)))
        assert "BatchEvalPython" not in plan
        assert "MapInPandas" not in plan


class TestJoinProfilePlan:
    def test_profile_broadcasts_sketch_sides(self, spark):
        """join_size_profile: both ≤ d·w cell frames reach the inner
        product and the final assembly as broadcasts — no key-on-key
        shuffle of the profiled frames ever happens."""
        from eventhub_to_timescale_spark.operators.joinplan import (
            join_size_profile,
        )

        left = _events(spark)
        right = _events(spark)
        plan = _plan(
            join_size_profile(left, right, "user_id", "user_id")
        )
        assert "BroadcastHashJoin" in plan
        assert "Cartesian" not in plan
        # the raw frames are only ever hash-aggregated into cells;
        # no sort-merge join of event rows
        assert "SortMergeJoin" not in plan


class TestRRFPlan:
    def test_fusion_is_topk_not_global_sort(self, spark):
        """rrf_fuse ends in TakeOrderedAndProject (limit pushed into
        the sort) — never a full global sort of the fused frame."""
        from eventhub_to_timescale_spark.operators.fusion import rrf_fuse

        a = spark.createDataFrame(
            [(i, i + 1) for i in range(30)], "doc_id long, rank long"
        )
        b = spark.createDataFrame(
            [(29 - i, i + 1) for i in range(30)], "doc_id long, rank long"
        )
        plan = _plan(rrf_fuse([a, b], top_n=5))
        assert "TakeOrderedAndProject" in plan
        assert "Cartesian" not in plan
        # the groupBy is map-side combined
        assert "partial" in plan
