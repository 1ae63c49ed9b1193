"""Prefix-filtered exact Jaccard join (operators/dedup.py:jaccard_prefix_pairs):
identity with the all-pairs baseline (recall 1 / precision 1) and the
frequent-gram non-explosion property the 100 TB posture claims.
"""


class TestJaccardPrefixPairs:
    def test_equals_brute_force_on_full_set(self, spark):
        """Prefix filtering is recall-1/precision-1: output must be
        IDENTICAL to the all-pairs baseline at the same threshold."""
        from eventhub_to_timescale_spark.operators.dedup import (
            jaccard_prefix_pairs,
            ngram_jaccard_pairs,
        )

        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different content with no overlap at all"),
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, "zzz"),
            (6, None),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = [
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in jaccard_prefix_pairs(
                docs, ngram=5, threshold=0.5
            ).collect()
        ]
        want = [
            (r["doc_a"], r["doc_b"], r["jaccard"])
            for r in ngram_jaccard_pairs(
                docs, ngram=5, threshold=0.5, max_doc_id=None
            ).collect()
        ]
        assert got == want and len(want) >= 2  # (1,2),(1,4),(2,4)

    def test_prefix_join_avoids_frequent_grams(self, spark):
        """A gram shared by EVERY doc must not blow up candidates: it
        sorts to the tail of each prefix order and never joins when
        rarer grams exist."""
        from eventhub_to_timescale_spark.operators.dedup import (
            jaccard_prefix_pairs,
        )

        # all docs share 'aaaaa'; no pair reaches jaccard 0.9
        docs = spark.createDataFrame(
            [(i, "aaaaa" + "%05d" % i) for i in range(40)],
            "doc_id long, text string",
        )
        out = jaccard_prefix_pairs(docs, ngram=5, threshold=0.9).collect()
        assert out == []


def test_cross_source_matrix_orientation_and_counts(spark):
    from eventhub_to_timescale_spark.operators.dedup import (
        cross_source_matrix,
    )

    docs = spark.createDataFrame(
        [(1, "web"), (2, "web"), (3, "books"), (4, "arxiv")],
        "doc_id long, source string",
    )
    # pair orientation must not matter: (3,1) counts as (books, web)
    pairs = spark.createDataFrame(
        [(1, 2), (3, 1), (1, 4), (2, 3)], "doc_a long, doc_b long"
    )
    got = {(r["src_a"], r["src_b"]): r["n_pairs"]
           for r in cross_source_matrix(docs, pairs).collect()}
    assert got == {
        ("web", "web"): 1,
        ("books", "web"): 2,
        ("arxiv", "web"): 1,
    }


def test_corpus_diff_statuses(spark):
    from eventhub_to_timescale_spark.operators.dedup import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    got = {(r["doc_id"], r["status"])
           for r in corpus_diff(old, new).collect()}
    # 1 unchanged (absent), 2 changed, 3 removed, 4 added
    assert got == {(2, "changed"), (3, "removed"), (4, "added")}
