"""Physical-plan pins for the round-14 surface (r14 verdict "What's
missing" #3): the composed curation chain's persist boundaries and
broadcast decontamination probe, GK-auto's partial/final aggregate
shape under ``accuracy="auto"``, and the auto-chunk prober's
single-collect contract — mirrors the r7–r13 plan-pin discipline.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# the CONCRETE class: in PySpark 4 pyspark.sql.DataFrame is the
# abstract facade and patching its collect never intercepts the
# classic-session instances the operators produce
from pyspark.sql.classic.dataframe import DataFrame


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    # the real sf0.001 corpus: synthetic look-alike rows all collapse
    # in one stage or another (identical bodies → MinHash kills all
    # but one, shared shingles → decontaminate kills the rest) and an
    # EMPTY manifest optimizes to a plan with no joins to pin
    from eventhub_to_timescale_spark.sources.testdata import load_table

    return load_table(spark, "/root/testdata/sf0.001", "documents")


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


class TestCurationPipelinePlan:
    def test_persist_boundaries_truncate_lineage_no_cartesian(self, spark):
        """The composed manifest plan must read its four
        multi-consumer stages (norm/clean/surv/decon) from
        materialized lineage-cut boundaries — localCheckpoint leaves
        (``Scan ExistingRDD``), the Spark analog of the oracle's
        MATERIALIZED CTEs (r15: persist kept the full 2k-node logical
        tree alive and AQE re-optimized it per stage; the checkpoint
        leaf is what makes the manifest's own plan this small) — and
        contain no cartesian product."""
        from eventhub_to_timescale_spark.operators.curation_pipeline import (
            curation_full_pipeline,
        )

        manifest = curation_full_pipeline(_docs(spark))
        plan = _plan(manifest)
        assert plan.count("Scan ExistingRDD") >= 4, plan
        assert "Cartesian" not in plan
        # the boundary actually shrank the plan: the lazy composed
        # form is hundreds of operators, the truncated one tens
        assert plan.count("\n") < 120, plan.count("\n")

    def test_lazy_composed_plan_broadcasts_probe_no_cartesian(self, spark):
        """The fully-lazy composed form (persist_stages=False — the
        oracle-comparison shape) must broadcast the decontaminate
        shingle probe and contain no cartesian product anywhere in
        the end-to-end chain."""
        from eventhub_to_timescale_spark.operators.curation_pipeline import (
            curation_full_pipeline,
        )

        manifest = curation_full_pipeline(_docs(spark), persist_stages=False)
        plan = _plan(manifest)
        assert "BroadcastHashJoin" in plan
        assert "Cartesian" not in plan

    def test_report_reads_persisted_stages(self, spark):
        """The attrition report consumes the SAME stage frames — its
        aggregates must also come off the materialized boundaries
        rather than re-deriving the chain per stage row."""
        from eventhub_to_timescale_spark.operators.curation_pipeline import (
            curation_stage_report,
        )

        report = curation_stage_report(_docs(spark))
        plan = _plan(report)
        assert "Scan ExistingRDD" in plan
        assert "Cartesian" not in plan


class TestGKAutoPlan:
    def test_auto_accuracy_keeps_partial_final_aggregate_shape(self, spark):
        """``accuracy="auto"`` must not change the aggregation shape
        the GK twin exists for: a partial+final percentile_approx
        (map-side-combinable bounded summaries), never a per-cell
        Window sort — the probe is a separate count-only job, not a
        plan node in the result."""
        from eventhub_to_timescale_spark.operators.quantband import (
            quantile_bands_gk,
        )

        plan = _plan(quantile_bands_gk(_events(spark), accuracy="auto"))
        assert "percentile_approx" in plan
        assert "partial_percentile_approx" in plan
        assert "Window" not in plan
        assert "Cartesian" not in plan


class TestAutoChunkSingleCollect:
    def test_auto_probe_issues_exactly_one_collect(self, spark, monkeypatch):
        """The skew profile and the data span travel in ONE driver
        collect (a crossJoin of two 1-row aggregates) — the r14
        review collapsed a two-collect version and this pin keeps it
        collapsed.  Counted at the DataFrame.collect boundary: raw
        Spark job counts are nondeterministic here (AQE + the
        broadcast subtree submit their own sub-jobs)."""
        from eventhub_to_timescale_spark.operators.joinplan import (
            auto_chunk_seconds,
        )

        df = _events(spark).select(
            "user_id", F.col("ts").alias("ts")
        )
        calls: list[int] = []
        orig = DataFrame.collect

        def counting(self):
            calls.append(1)
            return orig(self)

        monkeypatch.setattr(DataFrame, "collect", counting)
        width = auto_chunk_seconds(df, "ts", "user_id")
        assert width >= 1
        assert len(calls) == 1, f"expected 1 collect, saw {len(calls)}"

    def test_precomputed_factor_still_one_collect(self, spark, monkeypatch):
        """factor= skips the CMS subtree but still needs the span —
        exactly one collect, same contract."""
        from eventhub_to_timescale_spark.operators.joinplan import (
            auto_chunk_seconds,
        )

        df = _events(spark).select("user_id", "ts")
        calls: list[int] = []
        orig = DataFrame.collect

        def counting(self):
            calls.append(1)
            return orig(self)

        monkeypatch.setattr(DataFrame, "collect", counting)
        auto_chunk_seconds(df, "ts", "user_id", factor=3)
        assert len(calls) == 1
