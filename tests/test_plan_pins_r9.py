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
        cleaned corpus and the survivor frame from stage-boundary
        leaves — NOT re-derive them: a plan that re-runs span removal
        per consumer would show multiple copies of the span-removal
        aggregate subtree.  r15: the boundaries are eager
        localCheckpoints (Scan ExistingRDD leaves — the persist left
        the full logical tree under every consumer and Catalyst/AQE
        re-planned it per execution); the semantic stage's internal
        assignment cache still shows as an InMemory scan."""
        from eventhub_to_timescale_spark.operators.dedup_pipeline import (
            dedup_full_pipeline,
        )

        try:
            df = dedup_full_pipeline(
                _docs(spark), _embs(spark), k=2, dim=8, threshold=0.95
            )
            plan = _plan(df)
            assert "char_start" not in plan, (
                "span-removal subtree visible in the final plan — the "
                "clean-stage checkpoint boundary lost (it should have "
                "run once at construction, leaving a leaf)"
            )
            assert "InMemoryTableScan" in plan, (
                "no cache scan in the pipeline plan — the semantic "
                "stage's assignment boundary lost"
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
        plan = _plan(df)
        assert "InMemoryTableScan" not in plan
        assert "char_start" in plan, (
            "span-removal subtree missing — the lazy form is no "
            "longer recomputable from the inputs"
        )


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
