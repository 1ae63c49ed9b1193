"""Semantic tests for cross-document substring duplication
(operators/substrdup.py). Cross-engine parity runs in check_parity /
test_gate_tail_parity.
"""

from __future__ import annotations

import pytest

from eventhub_to_timescale_spark.operators.substrdup import (
    repeated_windows,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepeatedWindows:
    def test_shared_banner_found(self, spark):
        banner = "=" * 8 + "COMMON LICENSE HEADER TEXT HERE!" + "=" * 8
        assert len(banner) == 48
        docs = _docs(
            spark,
            [
                (1, banner + " unique tail one abcdefgh"),
                (2, banner + " different body 123456789"),
                (3, "totally unrelated text with no shared windows xx"),
            ],
        )
        out = repeated_windows(docs, window=48, stride=16).collect()
        hits = {r["window_text"]: r["n_docs"] for r in out}
        # the aligned stride-0 window is the banner itself
        assert hits.get(banner) == 2

    def test_within_doc_repeat_not_cross_doc(self, spark):
        w = "a" * 48
        docs = _docs(
            spark,
            [(1, w + "-" * 16 + w)],  # repeated inside ONE doc
        )
        out = repeated_windows(docs, window=48, stride=16, min_docs=2)
        assert out.collect() == []
        solo = repeated_windows(
            docs, window=48, stride=16, min_docs=1
        ).collect()
        occ = {r["window_text"]: r["n_occurrences"] for r in solo}
        assert occ[w] >= 2  # both occurrences counted at min_docs=1

    def test_short_and_null_docs_skipped(self, spark):
        docs = _docs(spark, [(1, "short"), (2, None), (3, "x" * 47)])
        assert repeated_windows(docs, window=48).collect() == []

    def test_alignment_guarantee(self, spark):
        # a shared run of length >= window + stride - 1 at offsets
        # congruent mod stride yields at least one identical window
        run = "SHARED-RUN-" * 6  # 66 chars >= 48 + 16 - 1
        docs = _docs(
            spark,
            [
                (1, "A" * 16 + run + "B" * 10),   # run starts at 17
                (2, "C" * 32 + run + "D" * 10),   # run starts at 33
            ],
        )
        out = repeated_windows(docs, window=48, stride=16).collect()
        assert any(r["n_docs"] == 2 for r in out)

    def test_rejects_bad_params(self, spark):
        docs = _docs(spark, [(1, "x" * 100)])
        with pytest.raises(ValueError):
            repeated_windows(docs, window=0)
        with pytest.raises(ValueError):
            repeated_windows(docs, stride=0)
        with pytest.raises(ValueError):
            repeated_windows(docs, min_docs=0)
