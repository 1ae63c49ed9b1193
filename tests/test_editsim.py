"""Edit-distance similarity join (operators/editsim.py): known
distances, brute-force recall within the q-gram lemma's regime, and
cross-engine parity."""

from __future__ import annotations

import random

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.editsim import (
    edit_distance_pairs,
    edit_distance_pairs_oracle_sql,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


class TestEditDistancePairs:
    def test_known_distances(self, spark):
        base = "the quick brown fox jumps over the lazy dog"
        rows = [
            (1, base),
            (2, base.replace("quick", "quack")),        # distance 1 (i→a)
            (3, base + " twice"),                       # distance 6
            (4, "completely different text entirely"),
        ]
        got = {
            (r["doc_a"], r["doc_b"]): r["distance"]
            for r in edit_distance_pairs(_docs(spark, rows), 6).collect()
        }
        assert got[(1, 2)] == 1
        assert got[(1, 3)] == 6
        # distance(2,3) = 8 > the max_distance=6 threshold, so the
        # pair must NOT appear
        assert (2, 3) not in got
        assert not any(4 in p for p in got)

    def test_case_insensitive(self, spark):
        rows = [(1, "Hello World"), (2, "hello world")]
        got = edit_distance_pairs(_docs(spark, rows), 0).collect()
        assert [(r["doc_a"], r["doc_b"], r["distance"]) for r in got] == [
            (1, 2, 0)
        ]

    def test_recall_matches_brute_force_in_lemma_regime(self, spark):
        """For strings longer than q·(d+1) chars, q-gram blocking with
        min_shared=1 and no effective df cap loses nothing: the pair
        set equals the brute-force Levenshtein filter."""
        rng = random.Random(5)
        alpha = "abcdefgh"
        base = "".join(rng.choices(alpha, k=60))
        rows = []
        for i in range(25):
            s = list(base)
            for _ in range(rng.randint(0, 6)):  # up to 6 random edits
                s[rng.randrange(len(s))] = rng.choice(alpha)
            rows.append((i, "".join(s)))
        d, q = 4, 4
        got = sorted(
            (r["doc_a"], r["doc_b"], r["distance"])
            for r in edit_distance_pairs(
                _docs(spark, rows), d, q=q, max_df=10_000
            ).collect()
        )
        want = sorted(
            (a, b, _lev(ta, tb))
            for (a, ta) in rows
            for (b, tb) in rows
            if a < b and _lev(ta, tb) <= d
        )
        assert got == want and len(want) > 0

    def test_bad_params_raise(self, spark):
        with pytest.raises(ValueError):
            edit_distance_pairs(_docs(spark, [(1, "x")]), -1)

    def test_short_and_empty_texts_match_oracle(self, spark):
        """Texts shorter than q must yield NO q-grams (hence no
        candidate pairs), matching DuckDB's empty range(1, 1).
        Pre-guard, sequence(1, 0) stepped DOWN to [1, 0] and emitted a
        spurious truncated gram, so ('ab','ab') and ('','') paired in
        Spark but not in the oracle."""
        rows = [
            (1, "ab"),
            (2, "ab"),
            (3, ""),
            (4, ""),
            (5, "alpha beta gamma delta"),
            (6, "alpha beta gamma delta"),
        ]
        got = sorted(
            tuple(r)
            for r in edit_distance_pairs(_docs(spark, rows), 6).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = sorted(
            map(
                tuple,
                con.execute(
                    edit_distance_pairs_oracle_sql(max_distance=6)
                ).fetchall(),
            )
        )
        assert got == want
        # only the long pair survives; the sub-q texts produce nothing
        assert got == [(5, 6, 0)]

    def test_matches_duckdb_oracle(self, spark):
        rows = [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta epsilonX"),
            (3, "alpha beta gamma DELTA epsilon"),
            (4, None),
            (5, "zeta eta theta iota kappa"),
        ]
        got = sorted(
            tuple(r)
            for r in edit_distance_pairs(_docs(spark, rows), 6).collect()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = sorted(
            map(
                tuple,
                con.execute(
                    edit_distance_pairs_oracle_sql(max_distance=6)
                ).fetchall(),
            )
        )
        assert got == want and len(got) >= 1


class TestStagedIndex:
    def test_lazy_and_staged_paths_agree(self, spark):
        """r16: the staged (checkpointed text + pruned-gram-index)
        default and the fully lazy chain must produce identical rows —
        staging is a materialization boundary, not a semantics
        change."""
        rows = [
            (i, "the quick brown fox jumps over lazy dog %d" % (i % 4))
            for i in range(30)
        ] + [(99, None)]
        staged = sorted(
            tuple(r)
            for r in edit_distance_pairs(_docs(spark, rows), 4).collect()
        )
        lazy = sorted(
            tuple(r)
            for r in edit_distance_pairs(
                _docs(spark, rows), 4, stage=False
            ).collect()
        )
        assert staged == lazy and staged

    def test_staged_plan_scans_corpus_once(self, spark):
        """The action-time plan must read checkpoint leaves only: no
        in-plan corpus relation (the r15 profile showed the corpus
        subtree referenced ~6×: both verify sides re-scanned it and
        the df-prune aggregate ran once per self-join side) and no
        gram explode (the index is staged at construction)."""
        rows = [(i, "abcdefgh %d" % (i % 3)) for i in range(12)]
        df = edit_distance_pairs(_docs(spark, rows), 3)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Scan ExistingRDD" in plan, plan
        assert plan.count("Generate explode") == 0, plan
