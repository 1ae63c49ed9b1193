"""Semantic tests for cross-document substring duplication
(operators/substrdup.py). Cross-engine parity runs in check_parity /
test_gate_tail_parity.
"""

from __future__ import annotations

import pytest

from eventhub_to_timescale_spark.operators.substrdup import (
    remove_repeated_spans,
    repeated_window_spans,
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


class TestRepeatedWindowSpans:
    def test_spans_cover_shared_banner(self, spark):
        banner = "=" * 8 + "COMMON LICENSE HEADER TEXT HERE!" + "=" * 8
        assert len(banner) == 48
        docs = _docs(
            spark,
            [
                # tails start with DIFFERENT chars so no window
                # extending past the banner is shared
                (1, banner + "Xunique tail one abcdefgh"),
                (2, "prefix of sixteen" + banner + " other body 12345"),
                (3, "totally unrelated text with no shared windows xx"),
            ],
        )
        # stride 48 → doc 1's banner is its window at pos 1 (chars
        # 0-48); doc 2's copy is NOT stride-aligned, so only doc 1's
        # aligned window can flag — use stride 1 for exact coverage
        out = repeated_window_spans(
            docs, window=48, stride=1, min_docs=2
        ).collect()
        spans = {r.doc_id: (r.char_start, r.char_end) for r in out}
        assert spans[1] == (0, 48)
        assert spans[2] == (17, 17 + 48)
        assert 3 not in spans

    def test_overlapping_windows_coalesce(self, spark):
        shared = "S" * 80  # spans multiple strided windows
        docs = _docs(
            spark,
            [(1, shared + "tail1-unique-abcdef"), (2, shared + "tail2-unique-ghijkl")],
        )
        out = repeated_window_spans(
            docs, window=48, stride=16, min_docs=2
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        # all flagged windows of the shared run merge into ONE span
        # per doc, starting at 0
        for d in (1, 2):
            assert len(by_doc[d]) == 1
            assert by_doc[d][0].char_start == 0
            assert by_doc[d][0].n_windows >= 2

    def test_span_bounds_are_half_open_char_offsets(self, spark):
        shared = "Z" * 48
        docs = _docs(
            spark,
            [(1, "aaaaaaaaaaaaaaaa" + shared), (2, shared + "bbbbbbbbbbbbbbbb")],
        )
        out = repeated_window_spans(
            docs, window=48, stride=16, min_docs=2
        ).collect()
        spans = {r.doc_id: (r.char_start, r.char_end) for r in out}
        # doc 1: shared run starts at char 16 (0-based), aligned to
        # stride 16 → flagged window [16, 64)
        assert spans[1] == (16, 64)
        assert spans[2] == (0, 48)

    def test_no_repeats_no_spans(self, spark):
        docs = _docs(
            spark,
            [(1, "first document with entirely unique content here"),
             (2, "second document sharing nothing with the first 12")],
        )
        assert (
            repeated_window_spans(docs, window=48, stride=16).collect()
            == []
        )


class TestRemoveRepeatedSpans:
    def test_boilerplate_cut_tails_kept(self, spark):
        banner = "B" * 48
        docs = _docs(
            spark,
            [
                (1, banner + "Xtail-one-unique-suffix!"),
                (2, banner + " tail two other suffix 9"),
                (3, "wholly unique text that survives unchanged ok!!"),
            ],
        )
        out = {
            r.doc_id: (r.clean_text, r.removed_chars)
            for r in remove_repeated_spans(
                docs, window=48, stride=16, min_docs=2
            ).collect()
        }
        assert out[1] == ("Xtail-one-unique-suffix!", 48)
        assert out[2] == (" tail two other suffix 9", 48)
        # unspanned doc passes through verbatim
        assert out[3] == ("wholly unique text that survives unchanged ok!!", 0)

    def test_interior_span_stitches_prefix_and_suffix(self, spark):
        shared = "S" * 64  # ≥ window + stride − 1 → aligned hit
        docs = _docs(
            spark,
            [
                (1, "head-A-0123456789ab" + "-" * 13 + shared + "tail-A!"),
                (2, shared + "tail-B-completely-different"),
            ],
        )
        out = {
            r.doc_id: r.clean_text
            for r in remove_repeated_spans(
                docs, window=48, stride=16, min_docs=2
            ).collect()
        }
        # doc 1: the shared run starts at char 32 (stride-aligned), so
        # flagged windows cover [32, 96); prefix + tail stitch together
        assert out[1] == "head-A-0123456789ab" + "-" * 13 + "tail-A!"
        assert out[2].endswith("tail-B-completely-different")
        assert "S" * 48 not in out[1] and "S" * 48 not in out[2]
