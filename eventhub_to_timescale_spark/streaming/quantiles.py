"""Streaming Greenwald–Khanna quantile bands — the 17th stateful
operator, closing the sketch family's streaming matrix (r12 verdict
ask #6: HLL, CMS, KMV, heavy hitters and CDC dedup already have
streaming twins; quantiles and Bloom were the two missing cells).

Batch twin: ``operators/quantband.py quantile_bands_gk`` (Spark's
built-in GK ``percentile_approx`` per (event_type, day) cell).  This
operator maintains the SAME summary semantics as keyed state so a
live stream can serve p50/p90/p99 bands per (event_type, day) without
re-aggregating history.

GK summary (Greenwald & Khanna, SIGMOD 2001), batched:

* state per cell = tuples (v_i, g_i, Δ_i) sorted by v, where
  rank_min(v_i) = Σ_{j≤i} g_j and rank_max(v_i) = rank_min + Δ_i
  bracket the true rank.
* INSERT (vectorized): sort the arriving batch, ``np.searchsorted``
  each value's existing successor tuple i, insert with g = 1 and
  Δ = g_i + Δ_i − 1 (0 for a new global min/max — the first/last
  tuples stay exact and are never compressed away).
* COMPRESS: merge tuple i into i+1 while
  g_i + g_{i+1} + Δ_{i+1} ≤ 2εn — one pass over the summary (size
  O((1/ε)·log εn), never data-sized; the only non-vectorized loop).
* QUERY(q): target rank r = ceil(q·n); the first tuple whose
  [rank_min, rank_max] envelope is within εn of r.

EXACT REGIME: the compress condition needs 2εn > 2 to ever fire, so
while a cell holds ≤ accuracy rows every sample survives with
g = 1, Δ = 0 and QUERY returns exactly the ceil(q·n)-th order
statistic — bit-identical to BOTH batch forms
(tests/test_streaming_quantiles.py replays the events table in
ordered micro-batches and requires row-identical final bands).
Past the regime the ±n/accuracy rank bound applies — the same
property test envelope as the batch twin's.

Bounded state: one summary per live (event_type, day) cell;
``GroupStateTimeout.ProcessingTimeTimeout`` evicts cells idle past
the watermark (a day cell naturally goes quiet once its day passes).

100 TB posture: state is sharded on the same (event_type, day) key
the batch plan shuffles on; per-cell state is O(accuracy) regardless
of cell row count — the hot-cell cliff the exact window form has is
structurally absent here.  Per-batch Python work is numpy-vectorized
except the summary-sized compress pass.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_BANDS = (("p50", 0.50), ("p90", 0.90), ("p99", 0.99))

_OUT_SCHEMA = (
    "event_type string, day string, n long, "
    "p50_cents long, p90_cents long, p99_cents long"
)
_STATE_SCHEMA = (
    "n long, vs array<long>, gs array<long>, ds array<long>"
)


def gk_insert_batch(
    vs: np.ndarray,
    gs: np.ndarray,
    ds: np.ndarray,
    n: int,
    batch: np.ndarray,
    eps: float,
):
    """Insert ``batch`` into the (vs, gs, ds, n) summary and
    compress.  Returns the new (vs, gs, ds, n).  Pure function —
    shared by the stateful operator and the property tests."""
    batch = np.sort(np.asarray(batch, dtype=np.int64))
    if batch.size == 0:
        return vs, gs, ds, n
    if vs.size == 0:
        nvs = batch
        ngs = np.ones(batch.size, dtype=np.int64)
        nds = np.zeros(batch.size, dtype=np.int64)
    else:
        # successor tuple index for each new value (first v_i > x);
        # side='right' so x == v_i lands AFTER i (successor i+1),
        # keeping the existing exact tuple first
        succ = np.searchsorted(vs, batch, side="right")
        new_d = np.where(
            succ >= vs.size,
            0,  # new max region (or append after last): Δ = 0
            gs[np.minimum(succ, vs.size - 1)]
            + ds[np.minimum(succ, vs.size - 1)]
            - 1,
        )
        # new global min: Δ = 0
        new_d = np.where(succ == 0, 0, new_d)
        nvs = np.concatenate([vs, batch])
        ngs = np.concatenate([gs, np.ones(batch.size, dtype=np.int64)])
        nds = np.concatenate([ds, new_d])
        order = np.argsort(
            np.concatenate(
                [np.arange(vs.size) * 2, succ * 2 - 1]
            ),
            kind="stable",
        )
        nvs, ngs, nds = nvs[order], ngs[order], nds[order]
    n += int(batch.size)

    # compress: one pass, summary-sized, never data-sized
    thr = 2.0 * eps * n
    if thr > 2.0 and nvs.size > 2:
        keep_v: list[int] = []
        keep_g: list[int] = []
        keep_d: list[int] = []
        acc_g = 0
        last = nvs.size - 1
        for i in range(nvs.size):
            g = int(ngs[i]) + acc_g
            if (
                0 < i < last
                and g + int(ngs[i + 1]) + int(nds[i + 1]) <= thr
            ):
                acc_g = g  # fold tuple i into its successor
                continue
            keep_v.append(int(nvs[i]))
            keep_g.append(g)
            keep_d.append(int(nds[i]))
            acc_g = 0
        nvs = np.array(keep_v, dtype=np.int64)
        ngs = np.array(keep_g, dtype=np.int64)
        nds = np.array(keep_d, dtype=np.int64)
    return nvs, ngs, nds, n


def gk_query(
    vs: np.ndarray,
    gs: np.ndarray,
    ds: np.ndarray,
    n: int,
    q: float,
    eps: float,
) -> int:
    """The value whose rank envelope covers ceil(q·n) within εn.
    In the exact regime (all g=1, Δ=0) this is exactly the
    ceil(q·n)-th order statistic: a pinned-rank tuple (rmin == rmax
    == r) wins before the tolerance scan, which at exactly n ==
    accuracy (tol = εn = 1.0) would otherwise admit the (r−1)-th
    order statistic first (r13 ADVICE, low)."""
    r = max(1, int(np.ceil(q * n)))
    rmin = np.cumsum(gs)
    rmax = rmin + ds
    pinned = np.flatnonzero((rmin == r) & (rmax == r))
    if pinned.size:
        return int(vs[pinned[0]])
    tol = eps * n
    ok = np.flatnonzero((r - rmin <= tol) & (rmax - r <= tol))
    if ok.size:
        return int(vs[ok[0]])
    # invariant slack fallback: nearest rank_min
    return int(vs[int(np.argmin(np.abs(rmin - r)))])


def _make_gk_fn(accuracy: int, watermark_seconds: int):
    eps = 1.0 / accuracy

    def _fn(
        key: tuple,
        pdf_iter: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            n, vs, gs, ds = state.get
            vs = np.asarray(vs, dtype=np.int64)
            gs = np.asarray(gs, dtype=np.int64)
            ds = np.asarray(ds, dtype=np.int64)
        else:
            n = 0
            vs = np.array([], dtype=np.int64)
            gs = np.array([], dtype=np.int64)
            ds = np.array([], dtype=np.int64)
        batches = [pdf for pdf in pdf_iter if not pdf.empty]
        if not batches:
            if n:
                state.setTimeoutDuration(watermark_seconds * 1000)
            return
        batch = pd.concat(batches, ignore_index=True)[
            "v_cents"
        ].to_numpy(dtype=np.int64)
        vs, gs, ds, n = gk_insert_batch(vs, gs, ds, int(n), batch, eps)
        state.update((int(n), vs.tolist(), gs.tolist(), ds.tolist()))
        state.setTimeoutDuration(watermark_seconds * 1000)
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "day": [key[1]],
                "n": pd.array([n], dtype="int64"),
                **{
                    f"{name}_cents": pd.array(
                        [gk_query(vs, gs, ds, n, q, eps)], dtype="int64"
                    )
                    for name, q in _BANDS
                },
            }
        )

    return _fn


def streaming_quantile_bands(
    events: DataFrame,
    accuracy: int = 10000,
    watermark_seconds: int = 7 * 24 * 3600,
) -> DataFrame:
    """Continuous GK p50/p90/p99 bands per (event_type, day) →
    one row per cell per micro-batch that touched it (n strictly
    grows, so the max-n row per cell is the converged answer —
    ``quantile_finalize``).  Works on batch frames too (single
    trigger ≡ one insert)."""
    if accuracy < 1 or watermark_seconds < 1:
        raise ValueError(
            f"need accuracy ≥ 1 and watermark_seconds ≥ 1, got "
            f"{accuracy}, {watermark_seconds}"
        )
    base = events.filter(
        F.col("event_type").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("value").isNotNull()
    ).select(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("v_cents"),
    )
    return base.groupBy("event_type", "day").applyInPandasWithState(
        _make_gk_fn(accuracy, watermark_seconds),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def quantile_finalize(bands: DataFrame) -> DataFrame:
    """Latest (max-n) emission per cell → the converged band frame,
    ordered like the batch twins.  Batch-side helper (use inside
    ``foreachBatch`` or on the collected output)."""
    w_latest = (
        F.struct("n", "p50_cents", "p90_cents", "p99_cents")
    )
    return (
        bands.groupBy("event_type", "day")
        .agg(F.max(w_latest).alias("_m"))
        .select(
            "event_type",
            "day",
            F.col("_m.n").alias("n"),
            F.col("_m.p50_cents").alias("p50_cents"),
            F.col("_m.p90_cents").alias("p90_cents"),
            F.col("_m.p99_cents").alias("p99_cents"),
        )
        .orderBy("event_type", "day")
    )


__all__ = [
    "gk_insert_batch",
    "gk_query",
    "streaming_quantile_bands",
    "quantile_finalize",
]
