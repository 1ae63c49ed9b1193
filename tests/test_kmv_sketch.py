"""KMV θ-sketch (operators/sketches.py:kmv_source_overlap): exact
small-set regime, estimator sanity in the sketched regime, and the
map-side WindowGroupLimit plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestExactRegime:
    def test_small_sets_are_exact(self, spark):
        """With fewer than k distinct values per pair, the estimator
        must return EXACT union/intersection counts."""
        from eventhub_to_timescale_spark.operators.sketches import (
            kmv_source_overlap,
        )

        rows = (
            [(i, "a", f"shared {i}") for i in range(10)]
            + [(100 + i, "b", f"shared {i}") for i in range(5)]  # 5 overlap
            + [(200 + i, "b", f"only-b {i}") for i in range(7)]
        )
        out = kmv_source_overlap(_docs(spark, rows), k=256).collect()
        assert len(out) == 1
        r = out[0]
        assert (r["source_a"], r["source_b"]) == ("a", "b")
        # union = 10 + 7 distinct texts + 5 shared = 17 distinct... the
        # shared 5 appear in both, union = 10 + 7 = 17, inter = 5
        assert r["union_est"] == 17.0
        assert r["intersect_est"] == 5.0
        assert abs(r["jaccard_est"] - 5.0 / 17.0) < 1e-3

    def test_duplicate_rows_do_not_inflate(self, spark):
        """DISTINCT-content semantics: repeating the same text many
        times in one source changes nothing."""
        from eventhub_to_timescale_spark.operators.sketches import (
            kmv_source_overlap,
        )

        rows = [(i, "a", "same text") for i in range(50)] + [
            (100, "b", "same text")
        ]
        r = kmv_source_overlap(_docs(spark, rows), k=64).collect()[0]
        assert r["union_est"] == 1.0
        assert r["intersect_est"] == 1.0
        assert r["jaccard_est"] == 1.0


class TestSketchedRegime:
    def test_estimates_within_tolerance(self, spark):
        """k=64 over 3 000 distinct values per side with a known 1/3
        overlap: KMV's relative error is ~1/sqrt(k-1) ≈ 13%; assert a
        generous 3σ-ish envelope so the test pins correctness, not
        luck."""
        from eventhub_to_timescale_spark.operators.sketches import (
            kmv_source_overlap,
        )

        n, overlap = 3000, 1000
        rows = (
            [(i, "a", f"doc {i}") for i in range(n)]
            + [(10_000 + i, "b", f"doc {i}") for i in range(overlap)]
            + [(20_000 + i, "b", f"bdoc {i}") for i in range(n - overlap)]
        )
        r = kmv_source_overlap(_docs(spark, rows), k=64).collect()[0]
        true_union = 2 * n - overlap
        assert abs(r["union_est"] - true_union) / true_union < 0.4
        assert abs(r["jaccard_est"] - overlap / true_union) < 0.15

    def test_nulls_excluded(self, spark):
        from eventhub_to_timescale_spark.operators.sketches import (
            kmv_source_overlap,
        )

        rows = [
            (0, "a", "x"), (1, "a", None), (2, None, "y"), (3, "b", "x"),
        ]
        r = kmv_source_overlap(_docs(spark, rows), k=16).collect()[0]
        assert r["union_est"] == 1.0 and r["intersect_est"] == 1.0


class TestPlanShape:
    def test_rank_limit_is_window_group_limit(self, spark):
        """The per-source k-smallest filter must plan as
        WindowGroupLimit (map-side limit before the exchange) and the
        whole plan must stay JVM-only with no cartesian."""
        from eventhub_to_timescale_spark.operators.sketches import (
            kmv_source_overlap,
        )

        rows = [(i, f"s{i % 3}", f"t{i}") for i in range(30)]
        df = kmv_source_overlap(_docs(spark, rows), k=8)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        # the pair-tagging inequality join must stream sketch rows
        # against the BROADCAST source list, never cartesian-pair two
        # distributed sides
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" in plan


def test_matches_oracle_on_testdata(spark):
    """Full estimator parity against the DuckDB oracle at sf0.001 —
    the same comparison the driver gate runs."""
    import duckdb

    from eventhub_to_timescale_spark.operators.sketches import (
        kmv_overlap_oracle_sql,
        kmv_source_overlap,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents")
    got = sorted(
        (r["source_a"], r["source_b"], r["union_est"], r["intersect_est"],
         r["jaccard_est"])
        for r in kmv_source_overlap(docs, k=64).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = sorted(map(tuple, con.execute(kmv_overlap_oracle_sql(k=64)).fetchall()))
    assert got == want and len(got) > 0
