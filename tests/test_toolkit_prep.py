"""Semantic edge cases for the round-6 toolkit aggregates
(counter/ohlc/trend) and training-prep operators (quantize, chunking,
shard order) — parity with DuckDB is covered by check_parity +
test_gate_tail_parity; these pin the boundary semantics directly.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _conditions(spark, rows):
    """rows: (subject, ts, value, uid)"""
    return spark.createDataFrame(
        [
            (s, datetime.fromisoformat(t), "value", float(v), uid)
            for s, t, v, uid in rows
        ],
        "measurement_subject string, timestamp timestamp, "
        "measurement_of string, measurement_number double, "
        "measurement_unique_id long",
    )


class TestCounterDelta:
    def test_reset_counts_restart_from_zero(self, spark):
        from eventhub_to_timescale_spark.operators.toolkit import counter_delta

        rows = [
            ("a", "2024-01-01 00:00:00", 10, 1),
            ("a", "2024-01-01 01:00:00", 25, 2),  # +15
            ("a", "2024-01-01 02:00:00", 3, 3),   # reset -> +3
            ("a", "2024-01-01 03:00:00", 8, 4),   # +5
        ]
        out = counter_delta(_conditions(spark, rows), "value", 86400).collect()
        assert len(out) == 1
        assert out[0]["counter_delta"] == pytest.approx(23.0)

    def test_first_sample_contributes_nothing_across_subjects(self, spark):
        from eventhub_to_timescale_spark.operators.toolkit import counter_delta

        rows = [
            ("a", "2024-01-01 00:00:00", 100, 1),
            ("b", "2024-01-01 00:30:00", 7, 2),
            ("b", "2024-01-01 01:00:00", 9, 3),
        ]
        out = {
            r["measurement_subject"]: r["counter_delta"]
            for r in counter_delta(
                _conditions(spark, rows), "value", 86400
            ).collect()
        }
        assert out == {"a": 0.0, "b": 2.0}

    def test_contribution_lands_in_current_sample_bucket(self, spark):
        from eventhub_to_timescale_spark.operators.toolkit import counter_delta

        rows = [
            ("a", "2024-01-01 23:59:00", 10, 1),
            ("a", "2024-01-02 00:01:00", 16, 2),  # crosses midnight
        ]
        out = {
            r["time"].isoformat(): r["counter_delta"]
            for r in counter_delta(
                _conditions(spark, rows), "value", 86400
            ).collect()
        }
        assert out["2024-01-01T00:00:00"] == 0.0
        assert out["2024-01-02T00:00:00"] == 6.0


class TestOhlc:
    def test_open_close_follow_time_order(self, spark):
        from eventhub_to_timescale_spark.operators.toolkit import ohlc

        rows = [
            ("a", "2024-01-01 02:00:00", 5, 2),
            ("a", "2024-01-01 01:00:00", 9, 1),  # earliest
            ("a", "2024-01-01 03:00:00", 1, 3),  # latest
        ]
        out = ohlc(_conditions(spark, rows), "value", 86400).collect()[0]
        assert (out["open"], out["high"], out["low"], out["close"]) == (
            9.0, 9.0, 1.0, 1.0,
        )

    def test_same_timestamp_ties_break_on_unique_id(self, spark):
        from eventhub_to_timescale_spark.operators.toolkit import ohlc

        rows = [
            ("a", "2024-01-01 01:00:00", 4, 2),
            ("a", "2024-01-01 01:00:00", 7, 1),  # lower uid -> open
        ]
        out = ohlc(_conditions(spark, rows), "value", 86400).collect()[0]
        assert out["open"] == 7.0 and out["close"] == 4.0

    def test_single_shuffle_plan(self, spark):
        from eventhub_to_timescale_spark.operators.toolkit import ohlc

        rows = [("a", "2024-01-01 01:00:00", 4, 1)]
        plan = ohlc(
            _conditions(spark, rows), "value", 86400
        )._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") <= 1  # one hash partition, no window


class TestTrendSlope:
    def test_perfect_line_recovers_slope(self, spark):
        from eventhub_to_timescale_spark.operators.toolkit import trend_slope

        # y = 2 * (seconds since bucket start) + 5
        rows = [
            ("a", "2024-01-01 00:00:00", 5, 1),
            ("a", "2024-01-01 00:00:10", 25, 2),
            ("a", "2024-01-01 00:00:20", 45, 3),
        ]
        out = trend_slope(_conditions(spark, rows), "value", 86400).collect()[0]
        assert out["n_samples"] == 3
        assert out["slope"] == pytest.approx(2.0)
        assert out["intercept"] == pytest.approx(5.0)

    def test_single_point_yields_null_slope(self, spark):
        from eventhub_to_timescale_spark.operators.toolkit import trend_slope

        rows = [("a", "2024-01-01 00:00:00", 5, 1)]
        out = trend_slope(_conditions(spark, rows), "value", 86400).collect()[0]
        assert out["n_samples"] == 1
        assert out["slope"] is None


class TestNormalizeQuantize:
    def test_codes_bounded_and_zero_norm_routed_out(self, spark):
        from eventhub_to_timescale_spark.operators.embeddings import (
            normalize_quantize,
        )

        df = spark.createDataFrame(
            [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, None)],
            "vec_id long, embedding array<double>",
        )
        out = normalize_quantize(df).collect()
        assert [r["vec_id"] for r in out] == [1]
        r = out[0]
        assert r["norm"] == pytest.approx(5.0)
        # 127 * (0.6, 0.8) = (76.2, 101.6) -> (76, 102)
        assert r["q"] == [76, 102]

    def test_quantization_error_bounded(self, spark):
        from eventhub_to_timescale_spark.operators.embeddings import (
            quantization_error,
        )

        df = spark.createDataFrame(
            [(i, [float(i), float(2 * i + 1), -3.5]) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        errs = quantization_error(df).collect()
        assert len(errs) == 20
        assert all(r["max_abs_err"] <= 0.5 / 127 + 1e-9 for r in errs)


class TestChunking:
    def _docs(self, spark, texts):
        return spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )

    def test_window_arithmetic(self, spark):
        from eventhub_to_timescale_spark.operators.chunking import (
            chunk_documents,
        )

        # size 10, stride 6: len 17 -> starts 0, 6, 12 (12 < 17)
        docs = self._docs(spark, ["x" * 17])
        out = sorted(
            chunk_documents(docs, 10, 6).collect(),
            key=lambda r: r["chunk_idx"],
        )
        assert [(r["chunk_start"], r["chunk_len"]) for r in out] == [
            (0, 10), (6, 10), (12, 5),
        ]

    def test_short_and_empty_docs(self, spark):
        from eventhub_to_timescale_spark.operators.chunking import (
            chunk_documents,
        )

        docs = self._docs(spark, ["abc", ""])
        out = chunk_documents(docs, 10, 6).collect()
        assert len(out) == 1  # empty doc yields no chunks
        assert (out[0]["chunk_start"], out[0]["chunk_len"]) == (0, 3)

    def test_exact_multiple_boundary(self, spark):
        from eventhub_to_timescale_spark.operators.chunking import (
            chunk_documents,
        )

        # len == stride: exactly one chunk (start=stride would be past end)
        docs = self._docs(spark, ["y" * 6])
        out = chunk_documents(docs, 10, 6).collect()
        assert len(out) == 1

    def test_no_shuffle_in_plan(self, spark):
        from eventhub_to_timescale_spark.operators.chunking import (
            chunk_documents,
        )

        docs = self._docs(spark, ["x" * 100])
        plan = chunk_documents(
            docs, 10, 6
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestShardOrder:
    def test_positions_contiguous_and_rerun_stable(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import shard_order

        df = spark.createDataFrame(
            [(i,) for i in range(300)], "doc_id long"
        )
        a = shard_order(df, "doc_id", 8, salt="s").collect()
        assert len(a) == 300
        by_shard: dict[int, list[int]] = {}
        for r in a:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for shard, positions in by_shard.items():
            assert sorted(positions) == list(range(1, len(positions) + 1))
        # every shard used with 300 keys over 8 shards
        assert len(by_shard) == 8
        b = shard_order(df, "doc_id", 8, salt="s").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_membership_stable_under_growth(self, spark):
        from eventhub_to_timescale_spark.operators.sampling import shard_order

        small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
        big = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
        sa = {
            r["doc_id"]: r["shard"]
            for r in shard_order(small, "doc_id", 8, salt="s").collect()
        }
        sb = {
            r["doc_id"]: r["shard"]
            for r in shard_order(big, "doc_id", 8, salt="s").collect()
        }
        assert all(sb[k] == v for k, v in sa.items())
