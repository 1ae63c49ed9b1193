"""Winnowing fingerprints + pairs (operators/winnowing.py) and the
TF-IDF top-terms extractor (operators/text.py:tfidf_top_terms)."""

from __future__ import annotations

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.text import (
    tfidf_oracle_sql,
    tfidf_top_terms,
)
from eventhub_to_timescale_spark.operators.winnowing import (
    winnow_fingerprints,
    winnow_fingerprints_oracle_sql,
    winnow_pairs,
    winnow_pairs_oracle_sql,
)

WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestWinnowFingerprints:
    def test_short_docs_filtered(self, spark):
        """< k tokens → no fingerprints; ≥ k but < w k-grams → exactly
        one fingerprint (the min of all k-gram hashes)."""
        df = _docs(
            spark,
            [
                (1, "one two three four"),          # 4 toks < k=5
                (2, "one two three four five"),     # 1 k-gram
                (3, "one two three four five six"), # 2 k-grams < w=4
                (4, None),
            ],
        )
        got = winnow_fingerprints(df, k=5, w=4).collect()
        by_doc = {}
        for r in got:
            by_doc.setdefault(r["doc_id"], []).append(r["fp"])
        assert 1 not in by_doc and 4 not in by_doc
        assert len(by_doc[2]) == 1
        assert 1 <= len(by_doc[3]) <= 2  # min of 2 windows, distinct

    def test_guarantee_shared_substring_shares_fingerprint(self, spark):
        """The winnowing guarantee: two documents sharing a run of at
        least w + k − 1 tokens share at least one fingerprint."""
        shared = WORDS  # 10 tokens ≥ w+k−1 = 8
        df = _docs(
            spark,
            [
                (1, "unrelated prefix words here " + shared),
                (2, shared + " completely different suffix tokens"),
            ],
        )
        fps = winnow_fingerprints(df, k=5, w=4).collect()
        s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
        s2 = {r["fp"] for r in fps if r["doc_id"] == 2}
        assert s1 & s2, "guaranteed shared fingerprint missing"

    def test_disjoint_docs_share_nothing(self, spark):
        df = _docs(
            spark,
            [
                (1, "alpha bravo charlie delta echo foxtrot"),
                (2, "zulu yankee xray whiskey victor uniform"),
            ],
        )
        fps = winnow_fingerprints(df, k=5, w=4).collect()
        s1 = {r["fp"] for r in fps if r["doc_id"] == 1}
        s2 = {r["fp"] for r in fps if r["doc_id"] == 2}
        assert not (s1 & s2)

    def test_matches_duckdb_oracle(self, spark):
        df = _docs(
            spark,
            [
                (1, "Alpha BRAVO charlie delta echo foxtrot golf"),
                (2, "charlie delta echo foxtrot golf hotel india"),
                (3, "one two"),
                (4, None),
                (5, WORDS + " " + WORDS),  # internal repetition
            ],
        )
        got = sorted(tuple(r) for r in winnow_fingerprints(df, 5, 4).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)",
            [(r[0], r[1]) for r in df.collect()],
        )
        want = sorted(
            map(tuple, con.execute(winnow_fingerprints_oracle_sql(5, 4)).fetchall())
        )
        assert got == want


class TestWinnowPairs:
    def test_overlapping_docs_pair_up(self, spark):
        df = _docs(
            spark,
            [
                (1, "start padding words " + WORDS),
                (2, WORDS + " trailing filler content"),
                (3, "zulu yankee xray whiskey victor uniform tango sierra"),
            ],
        )
        got = winnow_pairs(df, k=5, w=4, min_shared=1).collect()
        assert [(r["doc_a"], r["doc_b"]) for r in got] == [(1, 2)]
        assert got[0]["shared"] >= 1

    def test_max_df_prunes_ubiquitous_fingerprints(self, spark):
        """A k-gram present in EVERY document is pruned at max_df=2,
        so three identical docs produce no pairs through it."""
        df = _docs(spark, [(i, WORDS) for i in range(1, 4)])
        none = winnow_pairs(df, k=5, w=4, min_shared=1, max_df=2).collect()
        assert none == []
        allp = winnow_pairs(df, k=5, w=4, min_shared=1, max_df=3).collect()
        assert [(r["doc_a"], r["doc_b"]) for r in allp] == [
            (1, 2), (1, 3), (2, 3),
        ]

    def test_matches_duckdb_oracle(self, spark):
        df = _docs(
            spark,
            [
                (1, "a1 b2 c3 " + WORDS),
                (2, WORDS + " x9 y8 z7"),
                (3, WORDS),
                (4, "totally unrelated words about other things entirely"),
            ],
        )
        got = sorted(tuple(r) for r in winnow_pairs(df, 5, 4, 1).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)",
            [(r[0], r[1]) for r in df.collect()],
        )
        want = sorted(
            map(tuple, con.execute(winnow_pairs_oracle_sql(5, 4, 1)).fetchall())
        )
        assert got == want

    def test_bad_params_raise(self, spark):
        df = _docs(spark, [(1, WORDS)])
        with pytest.raises(ValueError):
            winnow_fingerprints(df, k=0).collect()


class TestTfidfTopTerms:
    def test_known_scores(self, spark):
        """3 docs; 'rare' appears only in doc 1 → its top term there;
        'common' appears in all docs → idf ln(4/4)=0 → score 0."""
        df = _docs(
            spark,
            [
                (1, "common rare rare other"),
                (2, "common other other filler"),
                (3, "common filler words here"),
            ],
        )
        got = {
            (r["doc_id"], r["rank"]): (r["term"], r["tf"], r["tfidf"])
            for r in tfidf_top_terms(df, k=2).collect()
        }
        import math

        idf_rare = round(math.log(4 / 2) * 1e6) / 1e6
        assert got[(1, 1)] == ("rare", 2, round(2 * idf_rare * 1e6) / 1e6)
        # every doc contains 'common' → tfidf exactly 0, ranked by
        # term ASC among ties
        terms_doc1 = {v[0] for v in (got[(1, 1)], got[(1, 2)])}
        assert "rare" in terms_doc1

    def test_rank_tie_breaks_on_term(self, spark):
        df = _docs(
            spark,
            [(1, "zeta alpha"), (2, "unrelated")],
        )
        got = [
            (r["rank"], r["term"])
            for r in tfidf_top_terms(df, k=2).collect()
            if r["doc_id"] == 1
        ]
        assert got == [(1, "alpha"), (2, "zeta")]

    def test_matches_duckdb_oracle(self, spark):
        df = _docs(
            spark,
            [
                (1, "spark window scan merge spark spark"),
                (2, "window table row value window"),
                (3, "merge scan scan scan batch"),
                (4, None),
            ],
        )
        got = sorted(tuple(r) for r in tfidf_top_terms(df, k=3).collect())
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)",
            [(r[0], r[1]) for r in df.collect()],
        )
        want = sorted(map(tuple, con.execute(tfidf_oracle_sql(3)).fetchall()))
        assert got == want


def test_unpersisted_form_matches(spark):
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta " * 3),
            (2, "alpha beta gamma delta epsilon zeta eta theta " * 3 + "x"),
            (3, "one two three four five six seven eight nine ten"),
        ],
    )
    cached = winnow_pairs(docs, k=5, w=4, min_shared=2).collect()
    lazy = winnow_pairs(
        docs, k=5, w=4, min_shared=2, persist_fps=False
    ).collect()
    assert cached == lazy and len(cached) > 0
