"""Reciprocal Rank Fusion (operators/fusion.py): the SIGIR 2009
semantics against a literal python reference, integer exactness
cross-engine, and input validation."""

from __future__ import annotations

import pytest

from eventhub_to_timescale_spark.operators.fusion import rrf_fuse


def _ranked(spark, pairs):
    return spark.createDataFrame(pairs, "doc_id long, rank long")


class TestRRF:
    def test_matches_literal_reference(self, spark):
        a = [(10, 1), (11, 2), (12, 3)]
        b = [(12, 1), (13, 2), (10, 3)]
        got = [
            tuple(r)
            for r in rrf_fuse(
                [_ranked(spark, a), _ranked(spark, b)], k=60, top_n=10
            ).collect()
        ]
        scores: dict[int, list[int]] = {}
        for lst in (a, b):
            for d, r in lst:
                scores.setdefault(d, []).append(r)
        want = sorted(
            (
                (
                    d,
                    sum(10**9 // (60 + r) for r in rs),
                    len(rs),
                    min(rs),
                )
                for d, rs in scores.items()
            ),
            key=lambda t: (-t[1], t[0]),
        )
        assert got == want

    def test_doc_in_both_lists_beats_single_list_winner(self, spark):
        """The fusion property: rank-2-in-both outranks rank-1-in-one
        (2/(60+2) > 1/(60+1))."""
        a = [(1, 1), (2, 2)]
        b = [(3, 1), (2, 2)]
        got = rrf_fuse([_ranked(spark, a), _ranked(spark, b)]).collect()
        assert got[0].doc_id == 2 and got[0].n_lists == 2

    def test_single_list_passthrough_order(self, spark):
        a = [(5, 1), (9, 2), (3, 3)]
        got = [r.doc_id for r in rrf_fuse([_ranked(spark, a)]).collect()]
        assert got == [5, 9, 3]

    def test_bad_params_raise(self, spark):
        with pytest.raises(ValueError):
            rrf_fuse([])
        with pytest.raises(ValueError):
            rrf_fuse([_ranked(spark, [(1, 1)])], k=0)
        with pytest.raises(ValueError):
            rrf_fuse([_ranked(spark, [(1, 1)])], top_n=0)
