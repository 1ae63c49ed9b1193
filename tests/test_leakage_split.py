"""Leakage-safe train/test split (operators/sampling.py:
leakage_safe_split): near-dup clusters are split-atomic."""

from __future__ import annotations

from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.sampling import (
    leakage_safe_split,
    sample_fraction,
)


def _docs(spark, n=60):
    return spark.createDataFrame(
        [(i, f"doc {i}") for i in range(n)], "doc_id long, text string"
    )


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "doc_a long, doc_b long")


class TestLeakageSafeSplit:
    def test_clusters_are_split_atomic(self, spark):
        """Every document of a connected component gets the SAME
        split — including transitive chains (0-1, 1-2 ⇒ {0,1,2})."""
        docs = _docs(spark)
        pairs = _pairs(
            spark, [(0, 1), (1, 2), (10, 11), (20, 25), (25, 30)]
        )
        got = {
            r["doc_id"]: (r["cluster"], r["split"])
            for r in leakage_safe_split(docs, pairs, 0.3).collect()
        }
        assert len(got) == 60
        for cluster in ({0, 1, 2}, {10, 11}, {20, 25, 30}):
            splits = {got[d][1] for d in cluster}
            cids = {got[d][0] for d in cluster}
            assert len(splits) == 1, f"cluster {cluster} straddles: {splits}"
            assert cids == {min(cluster)}

    def test_both_splits_nonempty_and_deterministic(self, spark):
        docs = _docs(spark, 200)
        pairs = _pairs(spark, [(0, 1)])
        a = leakage_safe_split(docs, pairs, 0.2).collect()
        b = leakage_safe_split(docs, pairs, 0.2).collect()
        assert a == b
        splits = {r["split"] for r in a}
        assert splits == {"train", "test"}

    def test_naive_split_would_leak_this_cluster(self, spark):
        """Motivating counterexample: find a pair the per-document
        md5 split separates; the cluster-keyed split must keep it
        together.  (Search a small id range for a witnessing pair —
        deterministic, no randomness.)"""
        docs = _docs(spark, 120)
        frac = 0.5
        in_test = {
            r["doc_id"]
            for r in sample_fraction(docs, "doc_id", frac, "lsplit-v1")
            .select("doc_id")
            .collect()
        }
        witness = None
        for a in range(119):
            if (a in in_test) != ((a + 1) in in_test):
                witness = (a, a + 1)
                break
        assert witness, "id range too small to witness (unexpected)"
        pairs = _pairs(spark, [witness])
        got = {
            r["doc_id"]: r["split"]
            for r in leakage_safe_split(docs, pairs, frac).collect()
        }
        assert got[witness[0]] == got[witness[1]]


class TestLeakageSplitWithWinnowing:
    def test_winnow_pair_frame_composes(self, spark):
        """The split accepts any pair frame — here winnowing's local
        reuse pairs — and keeps planted reuse pairs split-atomic."""
        from eventhub_to_timescale_spark.operators.winnowing import (
            winnow_pairs,
        )

        shared = "alpha bravo charlie delta echo foxtrot golf hotel"
        rows = [
            (1, "lead in words " + shared),
            (2, shared + " trailing words here"),
        ] + [(i, f"solo document number {i} with its own words") for i in range(3, 40)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        pairs = winnow_pairs(docs, k=5, w=4, min_shared=1)
        got = {
            r["doc_id"]: r["split"]
            for r in leakage_safe_split(docs, pairs, 0.5).collect()
        }
        assert got[1] == got[2]
        assert len(got) == 39
