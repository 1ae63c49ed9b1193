"""Exact two-phase heavy hitters (operators/heavyhitters.py)."""

from __future__ import annotations

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.heavyhitters import (
    frequent_terms,
    frequent_terms_oracle_sql,
)


def _docs(spark, rows, partitions=4):
    return spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(partitions)


class TestFrequentTerms:
    def test_exact_threshold_semantics(self, spark):
        """freq must STRICTLY exceed N/(k+1): with N=10 and k=4 the
        threshold is 2, so terms at freq 2 are out, freq 3 is in."""
        #      hot×3  warm×2  five singletons  → N = 10
        text = "hot hot hot warm warm a b c d e"
        got = frequent_terms(_docs(spark, [(1, text)]), k=4).collect()
        assert [(r["term"], r["freq"]) for r in got] == [("hot", 3)]

    def test_partitioning_independent(self, spark):
        """A term spread thin across partitions (never locally top)
        still surfaces when globally frequent — the pigeonhole
        guarantee, regardless of partition count."""
        # per doc: spread×3 common×3 filler×1 digit×1 → N = 320,
        # threshold (k=3) = 80; spread/common at 120 qualify, nothing
        # else does
        rows = [
            (i, "spread spread spread common common common filler%d" % i)
            for i in range(40)
        ]
        for p in (1, 2, 8, 16):
            got = frequent_terms(_docs(spark, rows, p), k=3).collect()
            terms = {r["term"] for r in got}
            assert {"spread", "common"} <= terms, f"partitions={p}: {terms}"

    def test_at_most_k_results(self, spark):
        rows = [(i, " ".join(f"t{j}" for j in range(5))) for i in range(10)]
        got = frequent_terms(_docs(spark, rows), k=3).collect()
        assert len(got) <= 3

    def test_bad_k_raises(self, spark):
        with pytest.raises(ValueError):
            frequent_terms(_docs(spark, [(1, "x")]), k=0)

    def test_matches_duckdb_oracle(self, spark):
        rows = [
            (i, ("alpha " * (i % 5)) + ("beta " * 2) + f"unique{i}")
            for i in range(30)
        ]
        got = sorted(
            tuple(r) for r in frequent_terms(_docs(spark, rows), k=10).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = sorted(
            map(tuple, con.execute(frequent_terms_oracle_sql(k=10)).fetchall())
        )
        assert got == want

    def test_matches_exact_group_by_across_k(self, spark):
        """The two-phase plan equals the plain exact GROUP BY/HAVING
        for every k — the claim the oracle makes, pinned in-process
        across a k sweep and a partitioning change."""
        import collections

        # pure-alpha tokens: the operator's lexer splits "w3" into
        # "w" + "3", which a str.split reference would miscount
        rng_rows = [
            (
                i,
                " ".join(
                    "w" + "abcdefghi"[(i * j) % 9] for j in range(1, 8)
                ),
            )
            for i in range(30)
        ]
        toks = collections.Counter(
            t for _, text in rng_rows for t in text.split()
        )
        n = sum(toks.values())
        for k in (2, 5, 20):
            for parts in (2, 7):
                got = sorted(
                    (r["term"], r["freq"])
                    for r in frequent_terms(
                        _docs(spark, rng_rows, parts), k=k
                    ).collect()
                )
                want = sorted(
                    (t, c) for t, c in toks.items() if c * (k + 1) > n
                )
                assert got == want, f"k={k} parts={parts}"


class TestStagePhase1:
    def test_lazy_and_staged_paths_agree(self, spark):
        """r15: the staged (checkpointed phase-1) default and the
        fully lazy chain must produce identical rows — the staging is
        a materialization boundary, not a semantics change."""
        rows = [
            (i, "hot hot hot warm warm cold filler%d x%d" % (i, i % 3))
            for i in range(25)
        ]
        staged = sorted(
            (r["term"], r["freq"])
            for r in frequent_terms(_docs(spark, rows), k=5).collect()
        )
        lazy = sorted(
            (r["term"], r["freq"])
            for r in frequent_terms(
                _docs(spark, rows), k=5, stage_phase1=False
            ).collect()
        )
        assert staged == lazy and staged

    def test_staged_plan_scans_corpus_once(self, spark):
        """The action-time plan must contain exactly ONE corpus
        explode (phase 2); phase 1 ran at construction and re-enters
        as a checkpoint leaf (was 4 explodes: phase-2 side, per_part,
        part_totals' re-run of per_part, and a separate global
        COUNT)."""
        rows = [(i, "a a b c") for i in range(10)]
        df = frequent_terms(_docs(spark, rows), k=3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Generate explode") == 1, plan
        assert "Scan ExistingRDD" in plan, plan

    def test_empty_corpus_is_empty_not_error(self, spark):
        """N derives from SUM over phase-1 counts now (NULL on empty
        input where COUNT was 0) — the coalesce keeps the threshold
        comparison well-typed and the result empty."""
        empty = spark.createDataFrame([], "doc_id long, text string")
        assert frequent_terms(empty, k=3).collect() == []
        assert (
            frequent_terms(empty, k=3, stage_phase1=False).collect() == []
        )
