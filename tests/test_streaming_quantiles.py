"""Streaming GK quantile bands (streaming/quantiles.py, the 17th
stateful operator): exact batch-convergence — ordered micro-batch
replay of the events table must converge row-identically to BOTH
batch forms (quantile_bands_gk and, in the exact regime, the exact
order-statistic quantile_bands) — plus the GK core's rank-error and
bounded-state properties under forced compression."""

from __future__ import annotations

import math
import os
import random
import time as _time

import numpy as np
import pytest
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.streaming.quantiles import (
    gk_insert_batch,
    gk_query,
)

SF_DIR = os.environ.get("SPARK_GRAFT_STREAM_SF", "/root/testdata/sf0.001")


class TestGKCore:
    def test_exact_regime_returns_order_statistics(self):
        rng = random.Random(3)
        vals = [rng.randint(-1000, 1000) for _ in range(500)]
        eps = 1 / 10000
        vs = np.array([], dtype=np.int64)
        gs, ds, n = vs.copy(), vs.copy(), 0
        for i in range(0, 500, 37):
            vs, gs, ds, n = gk_insert_batch(
                vs, gs, ds, n, np.array(vals[i : i + 37]), eps
            )
        s = sorted(vals)
        assert n == 500 and vs.size == 500  # no compression fired
        for q in (0.01, 0.5, 0.9, 0.99):
            assert gk_query(vs, gs, ds, n, q, eps) == s[
                max(1, math.ceil(q * n)) - 1
            ]

    def test_exact_at_boundary_n_equals_accuracy(self):
        """r13 ADVICE (low): at exactly n == accuracy the tolerance
        scan (tol = εn = 1.0) admits rmin = r−1 first and returned the
        (r−1)-th order statistic (1..100 at accuracy=100 gave p50=49,
        p90=89, p99=98).  The pinned-rank fast path must keep the
        boundary exact, honouring the 'exact up to n = accuracy'
        docstring claim here and in quantband.py."""
        eps = 1 / 100
        vs = np.array([], dtype=np.int64)
        gs, ds, n = vs.copy(), vs.copy(), 0
        vs, gs, ds, n = gk_insert_batch(
            vs, gs, ds, n, np.arange(1, 101, dtype=np.int64), eps
        )
        assert n == 100 and vs.size == 100  # still merge-free
        for q, want in ((0.5, 50), (0.9, 90), (0.99, 99), (1.0, 100)):
            assert gk_query(vs, gs, ds, n, q, eps) == want

    def test_batch_split_invariance_in_exact_regime(self):
        """Same multiset through different micro-batch splits ⇒ same
        summary answers (order-independence is what makes the
        streaming twin converge)."""
        rng = random.Random(9)
        vals = [rng.randint(0, 5000) for _ in range(400)]
        eps = 1 / 10000
        answers = []
        for step in (1, 7, 100, 400):
            vs = np.array([], dtype=np.int64)
            gs, ds, n = vs.copy(), vs.copy(), 0
            for i in range(0, 400, step):
                vs, gs, ds, n = gk_insert_batch(
                    vs, gs, ds, n, np.array(vals[i : i + step]), eps
                )
            answers.append(
                tuple(
                    gk_query(vs, gs, ds, n, q, eps)
                    for q in (0.5, 0.9, 0.99)
                )
            )
        assert len(set(answers)) == 1

    def test_rank_bound_and_bounded_state_under_compression(self):
        """eps = 1/20 over 50 000 values: summary stays sketch-sized
        (not data-sized) and every queried band lands inside the
        exact ±eps·n rank envelope — the GK guarantee."""
        rng = random.Random(11)
        vals = [rng.randint(0, 10**6) for _ in range(50_000)]
        eps = 1 / 20
        vs = np.array([], dtype=np.int64)
        gs, ds, n = vs.copy(), vs.copy(), 0
        for i in range(0, 50_000, 4096):
            vs, gs, ds, n = gk_insert_batch(
                vs, gs, ds, n, np.array(vals[i : i + 4096]), eps
            )
        assert n == 50_000
        assert vs.size < 500  # bounded: O((1/eps)·log(eps·n)), ≪ n
        s = sorted(vals)
        for q in (0.5, 0.9, 0.99):
            got = gk_query(vs, gs, ds, n, q, eps)
            lo = s[max(1, math.ceil((q - eps) * n)) - 1]
            hi = s[min(n, math.ceil((q + eps) * n)) - 1]
            assert lo <= got <= hi, (q, got, lo, hi)
            assert got in set(vals)  # an actually-observed value

    def test_min_max_stay_exact(self):
        """First/last tuples are never compressed away: q→0 / q→1
        queries return the true extremes even under compression."""
        rng = random.Random(4)
        vals = [rng.randint(0, 10**6) for _ in range(20_000)]
        eps = 1 / 10
        vs = np.array([], dtype=np.int64)
        gs, ds, n = vs.copy(), vs.copy(), 0
        for i in range(0, 20_000, 2048):
            vs, gs, ds, n = gk_insert_batch(
                vs, gs, ds, n, np.array(vals[i : i + 2048]), eps
            )
        assert int(vs[0]) == min(vals)
        assert int(vs[-1]) == max(vals)


def _run_stream(spark, tmp_path, schema, raw_path, **kwargs):
    from conftest import drain_stateful_stream
    from eventhub_to_timescale_spark.streaming.quantiles import (
        streaming_quantile_bands,
    )

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(raw_path)
    )
    q = (
        streaming_quantile_bands(stream, **kwargs)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    drain_stateful_stream(q)
    return spark.read.parquet(str(tmp_path / "out"))


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_converges_to_both_batch_twins(spark, tmp_path):
    """4-micro-batch replay of the events table ⇒ finalized bands
    row-identical to quantile_bands_gk AND quantile_bands (all cells
    are in GK's exact regime at this scale)."""
    from eventhub_to_timescale_spark.operators.quantband import (
        quantile_bands,
        quantile_bands_gk,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.quantiles import (
        quantile_finalize,
    )

    events = load_table(spark, SF_DIR, "events")
    raw_path = str(tmp_path / "raw")
    hi = events.agg(F.max("event_id")).collect()[0][0]
    step = (hi + 4) // 4
    for i in range(4):
        events.filter(
            (F.col("event_id") >= i * step)
            & (F.col("event_id") < (i + 1) * step)
        ).coalesce(1).write.mode("append").parquet(raw_path)
        _time.sleep(0.05)

    bands = _run_stream(spark, tmp_path, events.schema, raw_path)
    got = [tuple(r) for r in quantile_finalize(bands).collect()]
    want_gk = [tuple(r) for r in quantile_bands_gk(events).collect()]
    want_exact = [tuple(r) for r in quantile_bands(events).collect()]
    assert got == want_gk == want_exact
    assert len(got) > 0


@pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"{SF_DIR} not present"
)
def test_stream_single_trigger_equals_batch(spark, tmp_path):
    """Degenerate replay (one micro-batch) — one insert must already
    converge."""
    from eventhub_to_timescale_spark.operators.quantband import (
        quantile_bands_gk,
    )
    from eventhub_to_timescale_spark.sources.testdata import load_table
    from eventhub_to_timescale_spark.streaming.quantiles import (
        quantile_finalize,
    )

    events = load_table(spark, SF_DIR, "events")
    raw_path = str(tmp_path / "raw")
    events.coalesce(1).write.parquet(raw_path)
    bands = _run_stream(spark, tmp_path, events.schema, raw_path)
    got = [tuple(r) for r in quantile_finalize(bands).collect()]
    want = [tuple(r) for r in quantile_bands_gk(events).collect()]
    assert got == want and len(got) > 0


def test_bad_params_raise(spark):
    import pytest as _pytest

    from eventhub_to_timescale_spark.streaming.quantiles import (
        streaming_quantile_bands,
    )

    df = spark.createDataFrame(
        [(1, None, "a", 1.0)], "event_id long, ts timestamp, "
        "event_type string, value double",
    )
    with _pytest.raises(ValueError):
        streaming_quantile_bands(df, accuracy=0)
    with _pytest.raises(ValueError):
        streaming_quantile_bands(df, watermark_seconds=0)
