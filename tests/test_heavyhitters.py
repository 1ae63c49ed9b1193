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
