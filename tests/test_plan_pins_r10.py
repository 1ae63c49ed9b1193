"""Physical-plan pins for the round-10 operators: winnowing's
persisted fingerprint index + equi-join pair stage, TF-IDF's
broadcast-one-row totals, heavy hitters' broadcast candidate
semi-join, and seasonal decomposition's single ordered window with a
broadcast seasonal join — and, everywhere, the absence of cartesian
products.
"""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    rows = [
        (i, ("shared overlap run of tokens " * 3 + f"tail {i} " * 2))
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _events(spark):
    from datetime import datetime

    rows = [
        (i, datetime(2024, 1, 1 + i // 24, i % 24), "t", float(i % 7))
        for i in range(48)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )


class TestWinnowingPlan:
    def test_pair_stage_reads_cached_index_and_no_cartesian(self, spark):
        from eventhub_to_timescale_spark.operators.winnowing import (
            winnow_pairs,
        )

        try:
            plan = _plan(winnow_pairs(_docs(spark)))
            assert "InMemoryTableScan" in plan, (
                "fingerprint index not persisted — the md5 k-gram "
                "extraction would re-scan the corpus per join side"
            )
            assert "Cartesian" not in plan
        finally:
            spark.catalog.clearCache()

    def test_lazy_form_has_no_cache(self, spark):
        from eventhub_to_timescale_spark.operators.winnowing import (
            winnow_pairs,
        )

        plan = _plan(winnow_pairs(_docs(spark), persist_fps=False))
        assert "InMemoryTableScan" not in plan
        assert "Cartesian" not in plan


class TestTfidfPlan:
    def test_corpus_total_is_broadcast_and_no_cartesian(self, spark):
        from eventhub_to_timescale_spark.operators.text import (
            tfidf_top_terms,
        )

        plan = _plan(tfidf_top_terms(_docs(spark)))
        # the one-row n_docs frame enters as a broadcast (a nested-loop
        # broadcast of a single row, NOT a cartesian shuffle)
        assert "BroadcastNestedLoopJoin" in plan or "Broadcast" in plan
        assert "CartesianProduct" not in plan
        assert "Window" in plan  # the per-doc top-k


class TestHeavyHittersPlan:
    def test_candidates_broadcast_and_no_cartesian(self, spark):
        from eventhub_to_timescale_spark.operators.heavyhitters import (
            frequent_terms,
        )

        plan = _plan(frequent_terms(_docs(spark), k=5))
        assert "BroadcastHashJoin" in plan, (
            "candidate set must re-enter phase 2 as a broadcast "
            "equi-join, not a shuffled join"
        )
        assert "CartesianProduct" not in plan


class TestSeasonalPlan:
    def test_single_window_broadcast_seasonal_no_cartesian(self, spark):
        from eventhub_to_timescale_spark.operators.seasonal import (
            seasonal_decompose,
        )

        plan = _plan(seasonal_decompose(_events(spark), period=4))
        assert plan.count("Window") >= 1
        assert "BroadcastHashJoin" in plan, (
            "phase-seasonal join must broadcast the bounded "
            "(group × period) frame"
        )
        assert "CartesianProduct" not in plan
