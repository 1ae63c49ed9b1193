"""Physical-plan pins for the round-9 changes: the composed dedup
pipeline's single-scan claim (each stage boundary is a persist, so no
consumer re-runs an upstream stage's subplan) and the SemDeDup k∝N
default's JVM-only small-k path.
"""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    rows = [
        (i, ("common boilerplate text block " * 4 + f"unique tail {i}"))
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _embs(spark):
    rows = [
        (i, [float((i * 7 + d) % 13) - 6.0 for d in range(8)])
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestDedupPipelinePlan:
    def test_stage_boundaries_are_cached(self, spark):
        """With persist_stages=True the final plan must read the
        cleaned corpus and the survivor frame from InMemory scans —
        NOT re-derive them: a plan that re-runs span removal per
        consumer would show multiple copies of the span-removal
        aggregate subtree instead of cache hits."""
        from eventhub_to_timescale_spark.operators.dedup_pipeline import (
            dedup_full_pipeline,
        )

        try:
            df = dedup_full_pipeline(
                _docs(spark), _embs(spark), k=2, dim=8, threshold=0.95
            )
            plan = _plan(df)
            assert "InMemoryTableScan" in plan, (
                "no cache scan in the pipeline plan — stage persist "
                "boundaries lost"
            )
            assert "Cartesian" not in plan
            assert "BroadcastNestedLoop" not in plan
        finally:
            spark.catalog.clearCache()

    def test_lazy_form_has_no_cache(self, spark):
        """persist_stages=False must keep the plan fully lazy (the
        oracle-comparison form): no cache scans anywhere."""
        from eventhub_to_timescale_spark.operators.dedup_pipeline import (
            dedup_full_pipeline,
        )

        df = dedup_full_pipeline(
            _docs(spark),
            _embs(spark),
            k=2,
            dim=8,
            threshold=0.95,
            persist_stages=False,
        )
        assert "InMemoryTableScan" not in _plan(df)


class TestSemanticDedupDefaults:
    def test_small_corpus_default_stays_jvm_only(self, spark):
        """Default (k=None) on a small corpus resolves to k=8 ≤ 32 →
        the pure-JVM expression argmin; no Python eval in the plan."""
        from eventhub_to_timescale_spark.operators.clustering import (
            semantic_dedup_keep,
        )

        df = semantic_dedup_keep(_embs(spark), iters=1, dim=8)
        plan = _plan(df)
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
