"""Boundary semantics for sessionize and the unigram LM scorer
(cross-engine parity is covered by check_parity + the gate tail test).
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _events(spark, rows):
    """rows: (user_id, iso_ts, event_id)"""
    return spark.createDataFrame(
        [(u, datetime.fromisoformat(t), e) for u, t, e in rows],
        "user_id long, ts timestamp, event_id long",
    )


class TestSessionize:
    def test_gap_boundary_exact_gap_continues(self, spark):
        from eventhub_to_timescale_spark.operators.sessions import sessionize

        rows = [
            (1, "2024-01-01 00:00:00", 1),
            (1, "2024-01-01 00:30:00", 2),  # gap == 1800 -> same session
            (1, "2024-01-01 01:00:01", 3),  # gap == 1801 -> new session
        ]
        out = sorted(
            sessionize(_events(spark, rows), gap_seconds=1800).collect(),
            key=lambda r: r["session_idx"],
        )
        assert [(r["session_idx"], r["n_events"]) for r in out] == [
            (1, 2), (2, 1),
        ]
        assert out[0]["duration_s"] == 1800

    def test_subjects_are_independent(self, spark):
        from eventhub_to_timescale_spark.operators.sessions import sessionize

        rows = [
            (1, "2024-01-01 00:00:00", 1),
            (2, "2024-01-01 00:00:10", 2),
            (1, "2024-01-01 02:00:00", 3),
        ]
        out = sessionize(_events(spark, rows), gap_seconds=1800).collect()
        by_user = {}
        for r in out:
            by_user.setdefault(r["user_id"], []).append(r)
        assert len(by_user[1]) == 2 and len(by_user[2]) == 1

    def test_duplicate_timestamps_number_deterministically(self, spark):
        from eventhub_to_timescale_spark.operators.sessions import sessionize

        rows = [
            (1, "2024-01-01 00:00:00", 2),
            (1, "2024-01-01 00:00:00", 1),
        ]
        out = sessionize(_events(spark, rows), gap_seconds=60).collect()
        assert len(out) == 1 and out[0]["n_events"] == 2

    def test_rejects_nonpositive_gap(self, spark):
        from eventhub_to_timescale_spark.operators.sessions import sessionize

        with pytest.raises(ValueError):
            sessionize(_events(spark, []), gap_seconds=0)


class TestSessionizeNative:
    def test_equivalence_with_window_form_on_integer_seconds(self, spark):
        """session_window merges overlapping-or-touching windows —
        the same 'continue on gap <= g' rule as the window form — so
        on integer-second data the two implementations draw identical
        islands for the SAME g (includes gaps of exactly 1800)."""
        from eventhub_to_timescale_spark.operators.sessions import (
            sessionize,
            sessionize_native,
        )

        import random

        rng = random.Random(42)
        rows, t, eid = [], 0, 0
        for _ in range(200):
            t += rng.choice([5, 60, 1799, 1800, 1801, 4000])
            eid += 1
            rows.append(
                (rng.randrange(3), f"2024-01-0{1 + t // 86400} "
                 f"{t % 86400 // 3600:02d}:{t % 3600 // 60:02d}:{t % 60:02d}",
                 eid)
            )
        ev = _events(spark, rows)
        a = {
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in sessionize(ev, gap_seconds=1800).collect()
        }
        b = {
            (r["user_id"], r["session_start"], r["session_end_event"],
             r["n_events"])
            for r in sessionize_native(ev, gap_seconds=1800).collect()
        }
        assert a == b

    def test_touching_windows_merge_and_strict_excess_splits(self, spark):
        from eventhub_to_timescale_spark.operators.sessions import (
            sessionize_native,
        )

        touching = [
            (1, "2024-01-01 00:00:00", 1),
            (1, "2024-01-01 00:30:00", 2),  # gap == 1800 -> merges
        ]
        over = [
            (1, "2024-01-01 00:00:00", 1),
            (1, "2024-01-01 00:30:01", 2),  # gap == 1801 -> splits
        ]
        assert sessionize_native(_events(spark, touching), gap_seconds=1800).count() == 1
        assert sessionize_native(_events(spark, over), gap_seconds=1800).count() == 2


class TestHeartbeatUptime:
    def _cond(self, spark, rows):
        return spark.createDataFrame(
            [
                (s, datetime.fromisoformat(t), "value", 1.0, uid)
                for s, t, uid in rows
            ],
            "measurement_subject string, timestamp timestamp, "
            "measurement_of string, measurement_number double, "
            "measurement_unique_id long",
        )

    def test_union_semantics(self, spark):
        from eventhub_to_timescale_spark.operators.toolkit import (
            heartbeat_uptime,
        )

        # tol 100: beats at 0, 50 (overlap), 300 (gap) ->
        # covered = min(50,100) + min(250,100) + 100 = 250
        rows = [
            ("a", "2024-01-01 00:00:00", 1),
            ("a", "2024-01-01 00:00:50", 2),
            ("a", "2024-01-01 00:05:00", 3),
        ]
        out = heartbeat_uptime(self._cond(spark, rows), "value", 100).collect()
        r = out[0]
        assert (r["n_beats"], r["covered_s"], r["span_s"]) == (3, 250, 400)

    def test_duplicate_beats_add_nothing(self, spark):
        from eventhub_to_timescale_spark.operators.toolkit import (
            heartbeat_uptime,
        )

        rows = [
            ("a", "2024-01-01 00:00:00", 1),
            ("a", "2024-01-01 00:00:00", 2),
        ]
        r = heartbeat_uptime(self._cond(spark, rows), "value", 60).collect()[0]
        assert (r["covered_s"], r["span_s"]) == (60, 60)


class TestUnigramLm:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )

    def test_common_tokens_score_lower(self, spark):
        from eventhub_to_timescale_spark.operators.text import unigram_lm_score

        docs = self._docs(
            spark,
            ["the the the", "the the the", "the the the", "zq xv wj"],
        )
        out = {
            r["doc_id"]: r["avg_neg_logprob"]
            for r in unigram_lm_score(docs, vocab_top_k=100).collect()
        }
        assert out[0] == out[1] == out[2]
        assert out[3] > out[0]  # rare tokens -> less fluent under the model

    def test_score_matches_hand_computation(self, spark):
        from eventhub_to_timescale_spark.operators.text import unigram_lm_score

        # corpus: 'a' x3, 'b' x1 -> total 4; p(a)=3/4, p(b)=1/4
        docs = self._docs(spark, ["a a a", "b"])
        out = {
            r["doc_id"]: r["avg_neg_logprob"]
            for r in unigram_lm_score(docs, vocab_top_k=10).collect()
        }
        assert out[0] == pytest.approx(-math.log(0.75), abs=1e-6)
        assert out[1] == pytest.approx(-math.log(0.25), abs=1e-6)

    def test_oov_floor_when_vocab_truncated(self, spark):
        from eventhub_to_timescale_spark.operators.text import unigram_lm_score

        # vocab_top_k=1 keeps only 'a' (count 3); 'b' becomes OOV with
        # floor p = 1/total = 1/4 — same value as its true count here
        docs = self._docs(spark, ["a a a", "b b"])
        out = {
            r["doc_id"]: r["avg_neg_logprob"]
            for r in unigram_lm_score(docs, vocab_top_k=1).collect()
        }
        assert out[1] == pytest.approx(-math.log(1 / 5), abs=1e-6)

    def test_empty_and_tokenless_docs_excluded(self, spark):
        from eventhub_to_timescale_spark.operators.text import unigram_lm_score

        docs = self._docs(spark, ["hello world", "", "!!! ???"])
        out = unigram_lm_score(docs, vocab_top_k=10).collect()
        assert [r["doc_id"] for r in out] == [0]


class TestBigramTopk:
    def test_pair_counts_and_ordering(self, spark):
        from eventhub_to_timescale_spark.operators.text import bigram_topk

        docs = spark.createDataFrame(
            [
                (1, "a b a b c"),   # pairs: ab, ba, ab, bc
                (2, "a b"),         # ab
                (3, "x"),           # <2 tokens → nothing
                (4, ""),            # empty → nothing
            ],
            "doc_id long, text string",
        )
        out = [(r["bigram"], r["cnt"]) for r in bigram_topk(docs, k=3).collect()]
        assert out == [("a b", 3), ("b a", 1), ("b c", 1)]

    def test_tie_breaks_lexicographically(self, spark):
        from eventhub_to_timescale_spark.operators.text import bigram_topk

        docs = spark.createDataFrame(
            [(1, "z z"), (2, "a a")], "doc_id long, text string"
        )
        out = [r["bigram"] for r in bigram_topk(docs, k=2).collect()]
        assert out == ["a a", "z z"]


class TestBigramLm:
    def test_conditional_probability_and_floor(self, spark):
        import math

        from eventhub_to_timescale_spark.operators.text import bigram_lm_score

        docs = spark.createDataFrame(
            [
                (1, "a b a b"),   # bigrams ab, ba, ab
                (2, "a c"),       # bigram ac
            ],
            "doc_id long, text string",
        )
        # unigrams: a=3, b=2, c=1  (total 6)
        # bigram counts: ab=2, ba=1, ac=1 — all in vocab at K=10
        # p(b|a)=2/3, p(a|b)=1/2, p(c|a)=1/3
        out = {
            r["doc_id"]: (r["n_bigrams"], r["avg_neg_logprob"])
            for r in bigram_lm_score(docs, bigram_top_k=10).collect()
        }
        exp1 = -(math.log(2 / 3) + math.log(1 / 2) + math.log(2 / 3)) / 3
        assert out[1][0] == 3
        assert abs(out[1][1] - round(exp1, 6)) < 1e-9
        assert out[2] == (1, round(-math.log(1 / 3), 6))

    def test_oov_floor_applies_outside_vocab(self, spark):
        import math

        from eventhub_to_timescale_spark.operators.text import bigram_lm_score

        # K=1 keeps only the most frequent pair; the rest floor at
        # ln(1/total_tokens)
        docs = spark.createDataFrame(
            [(1, "a b a b a"), (2, "x y")], "doc_id long, text string"
        )
        # bigrams: ab=2, ba=2, xy=1 → vocab cut (cnt DESC, w1, w2)
        # keeps "a b"; total tokens = 7
        out = {
            r["doc_id"]: r["avg_neg_logprob"]
            for r in bigram_lm_score(docs, bigram_top_k=1).collect()
        }
        floor = math.log(1 / 7)
        # doc 2: single OOV bigram → exactly the floor
        assert abs(out[2] - round(-floor, 6)) < 1e-9


class TestQualityLogit:
    def test_sigmoid_and_feature_saturation(self, spark):
        import math

        from eventhub_to_timescale_spark.operators.text import (
            QUALITY_LOGIT_BIAS,
            QUALITY_LOGIT_WEIGHTS,
            quality_logit_score,
        )

        # 60 stopword-free words of length 9 → x1 = 1 (saturated),
        # x2 = 0, x3 = 1 (no punctuation), x4 = min(9/10, 1) = 0.9
        text = " ".join(["wordwords"] * 60)
        docs = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        r = quality_logit_score(docs).collect()[0]
        w1, w2, w3, w4 = QUALITY_LOGIT_WEIGHTS
        logit = w1 * 1.0 + w2 * 0.0 + w3 * 1.0 + w4 * 0.9 + QUALITY_LOGIT_BIAS
        # fixed-point path: exact to the micro-unit quantization
        assert abs(r["logit"] - logit) < 2e-6
        assert abs(
            r["quality_prob"] - 1.0 / (1.0 + math.exp(-r["logit"]))
        ) < 1e-6

    def test_punctuation_floor(self, spark):
        from eventhub_to_timescale_spark.operators.text import (
            quality_logit_score,
        )

        # pure punctuation: x3 = 0, x1 ~ 0 → prob near the bias floor
        docs = spark.createDataFrame(
            [(1, "....."), (2, "the and of to in is it for on a " * 6)],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["quality_prob"] for r in quality_logit_score(docs).collect()}
        assert out[1] < 0.3 < out[2]
