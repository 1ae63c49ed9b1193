"""Session-selectable stage-boundary mechanism (operators/boundary.py,
r15 ADVICE: cluster runs choose a fault-tolerant boundary without code
edits).  The boundary must be semantically invisible — identical rows
in every mode — and unknown modes must fail loudly."""

from __future__ import annotations

import pytest

from eventhub_to_timescale_spark.operators.boundary import (
    BOUNDARY_CONF,
    stage_boundary,
)


def _frame(spark):
    return spark.range(20).selectExpr("id", "id * id AS sq")


def _set_mode(spark, mode):
    if mode is None:
        spark.conf.unset(BOUNDARY_CONF)
    else:
        spark.conf.set(BOUNDARY_CONF, mode)


@pytest.fixture()
def clean_conf(spark):
    yield spark
    spark.conf.unset(BOUNDARY_CONF)


class TestStageBoundary:
    def test_default_is_local_checkpoint_leaf(self, clean_conf):
        spark = clean_conf
        out = stage_boundary(_frame(spark))
        # lineage is cut: the plan is a leaf scan, not the range+project
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "Range" not in plan
        assert sorted(r.sq for r in out.collect()) == [
            i * i for i in range(20)
        ]

    def test_persist_mode_same_rows_no_lineage_cut(self, clean_conf):
        spark = clean_conf
        _set_mode(spark, "persist")
        out = stage_boundary(_frame(spark))
        try:
            assert sorted(r.sq for r in out.collect()) == [
                i * i for i in range(20)
            ]
            # persist keeps the frame recomputable — lineage intact
            plan = out._jdf.queryExecution().optimizedPlan().toString()
            assert "Range" in plan
        finally:
            out.unpersist()

    def test_unknown_mode_raises(self, clean_conf):
        spark = clean_conf
        _set_mode(spark, "replicate-3x")
        with pytest.raises(ValueError, match="stageBoundary"):
            stage_boundary(_frame(spark))

    def test_operators_follow_the_setting(self, clean_conf):
        """A staged operator run under persist mode returns the same
        rows as the default mode (the boundary is mechanism, not
        semantics)."""
        from pyspark.sql import functions as F

        from eventhub_to_timescale_spark.operators.dsir import dsir_topn

        spark = clean_conf
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta {i % 3}", i % 2 == 0)
             for i in range(30)],
            "doc_id long, text string, is_en boolean",
        )
        base = [
            (r.doc_id, r.dsir_logw)
            for r in dsir_topn(docs, F.col("is_en"), n=10).collect()
        ]
        _set_mode(spark, "persist")
        alt = [
            (r.doc_id, r.dsir_logw)
            for r in dsir_topn(docs, F.col("is_en"), n=10).collect()
        ]
        assert base == alt
