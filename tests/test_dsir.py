"""DSIR importance-resampling semantics (operators/dsir.py): target-
likeness ranking, Laplace smoothing sanity, empty-doc handling, and
the 100 TB plan shape (corpus never shuffles, partial top-n)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.dsir import dsir_topn


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, lang) for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string",
    )


class TestDsir:
    def test_target_like_docs_rank_first(self, spark):
        # target docs repeat "alpha beta"; off-target repeat "gamma
        # delta"; a fresh doc written in target-style bigrams must
        # outrank one written in off-target bigrams
        rows = (
            [("alpha beta alpha beta alpha beta", "en")] * 4
            + [("gamma delta gamma delta gamma delta", "de")] * 4
            + [("alpha beta alpha beta", "zz"), ("gamma delta gamma delta", "zz")]
        )
        out = dsir_topn(
            _docs(spark, rows), F.col("lang") == "en", n=10
        ).collect()
        pos = {r["doc_id"]: i for i, r in enumerate(out)}
        assert pos[8] < pos[9]  # target-style zz doc beats off-target zz doc
        # and every en doc outranks every de doc
        assert max(pos[i] for i in range(4)) < min(pos[i] for i in range(4, 8))

    def test_short_docs_score_zero(self, spark):
        # off-target rows make the two bucket models differ, so the
        # target-style doc scores > 0 while <2-token docs pin at 0
        rows = [
            ("alpha beta alpha beta", "en"),
            ("gamma delta gamma delta", "de"),
            ("solo", "en"),
            ("", "en"),
        ]
        out = dsir_topn(_docs(spark, rows), F.col("lang") == "en", n=10)
        got = {r["doc_id"]: r["dsir_logw"] for r in out.collect()}
        assert got[2] == 0.0 and got[3] == 0.0
        assert got[0] > 0.0

    def test_n_cuts_and_order_is_total(self, spark):
        rows = [("alpha beta " * (i + 1), "en") for i in range(8)]
        out = dsir_topn(_docs(spark, rows), F.col("lang") == "en", n=3).collect()
        assert len(out) == 3
        ws = [r["dsir_logw"] for r in out]
        assert ws == sorted(ws, reverse=True)

    def test_plan_never_shuffles_corpus(self, spark):
        rows = [("alpha beta gamma", "en")] * 20
        df = dsir_topn(_docs(spark, rows), F.col("lang") == "en", n=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
        assert "SortMergeJoin" not in plan
        assert "TakeOrderedAndProject" in plan
        # every hash exchange is the <=B-row bucket table, never a
        # corpus-keyed shuffle (no doc_id partitioning anywhere)
        assert "hashpartitioning(doc_id" not in plan
