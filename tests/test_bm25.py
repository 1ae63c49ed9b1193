"""BM25 retrieval semantics (operators/text.py:bm25_topk): ranking
sanity, idf weighting, determinism of the exact-integer scoring, and
the 100 TB plan shape (broadcast stats, partial top-k, no Python)."""

from __future__ import annotations

from eventhub_to_timescale_spark.operators.text import bm25_topk


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestBm25:
    def test_more_matching_terms_rank_higher(self, spark):
        docs = _docs(
            spark,
            [
                "spark window join",   # both terms
                "spark table scan",    # one term
                "row value batch",     # none → excluded
                "spark window window", # both, higher tf
            ],
        )
        out = bm25_topk(docs, terms=("spark", "window"), k=10).collect()
        ids = [r["doc_id"] for r in out]
        assert 2 not in ids  # no query term → no row
        assert set(ids) == {0, 1, 3}
        # doc 3 (tf window=2) beats doc 0 (tf=1) beats doc 1 (one term)
        assert ids.index(3) < ids.index(0) < ids.index(1)

    def test_rare_term_outweighs_common_term(self, spark):
        # "rare" appears in 1 of 6 docs, "common" in 5 of 6 — a doc
        # matching only the rare term must outrank one matching only
        # the common term at equal tf and length
        docs = _docs(
            spark,
            [
                "rare aaa bbb",
                "common aaa bbb",
                "common ccc ddd",
                "common eee fff",
                "common ggg hhh",
                "common iii jjj",
            ],
        )
        out = bm25_topk(docs, terms=("rare", "common"), k=10).collect()
        ids = [r["doc_id"] for r in out]
        assert ids[0] == 0

    def test_k_cuts_and_scores_descend(self, spark):
        docs = _docs(spark, [f"spark {'pad ' * i}x" for i in range(9)])
        out = bm25_topk(docs, terms=("spark",), k=4).collect()
        assert len(out) == 4
        scores = [r["bm25"] for r in out]
        assert scores == sorted(scores, reverse=True)

    def test_plan_is_jvm_broadcast_topk(self, spark):
        docs = _docs(spark, ["spark window"] * 20)
        df = bm25_topk(docs, terms=("spark", "window"), k=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "SortMergeJoin" not in plan
        assert "TakeOrderedAndProject" in plan


def test_staged_equals_lazy(spark):
    texts = (
        ["spark window dup"] * 3
        + ["spark spark spark"] * 2
        + ["window pane", "dup dedup dup", "unrelated words entirely"] * 4
    )
    docs = _docs(spark, texts)
    staged = bm25_topk(docs, terms=("spark", "dup"), k=8).collect()
    lazy = bm25_topk(docs, terms=("spark", "dup"), k=8, stage=False).collect()
    assert staged == lazy and len(staged) > 0
