"""Micro-benchmark for the r8 vectorization of the stateful streaming
operators (VERDICT r7 ask #3): time the per-batch pandas work of
streaming/stateful.py's vectorized functions against the r7 row-at-a-
time loop formulations on a 100 000-row hot-key micro-batch.

Only the pure-Python/pandas batch function is timed (no Spark): that
is exactly the GIL-bound work `applyInPandasWithState` executes per
key per micro-batch, which the vectorization targets.

Usage: python scripts/stateful_microbench.py [rows]
Prints one JSON line {op: {"loop_s":…, "vec_s":…, "speedup":…}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eventhub_to_timescale_spark.streaming.stateful import (  # noqa: E402
    _changes_fn,
    _counter_delta_fn_factory,
    _heartbeat_fn_factory,
)


class FakeState:
    """Duck-typed GroupState: just enough surface for the batch fns."""

    def __init__(self, value=None):
        self._v = value
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v = None

    def setTimeoutDuration(self, ms):
        pass


def make_batch(rows: int) -> pd.DataFrame:
    rng = np.random.RandomState(8)
    ts = pd.to_datetime(
        np.sort(rng.randint(0, 10**6, size=rows)) * 1_000_000_000
    )
    return pd.DataFrame(
        {
            "timestamp": ts,
            "measurement_unique_id": np.arange(rows, dtype="int64"),
            "measurement_number": np.where(
                rng.rand(rows) < 0.02,
                np.nan,
                np.cumsum(rng.rand(rows)) % 1000.0,  # occasional resets
            ),
            # low-cardinality strings → long unchanged runs, the
            # change-filter's target workload
            "measurement_string": rng.choice(
                ["on", "off", "idle", None], size=rows, p=[0.5, 0.3, 0.19, 0.01]
            ),
        }
    )


# --- r7 row-at-a-time reference formulations (kept here verbatim in
# shape so the speedup is measured against what actually shipped) ----


def loop_changes(key, pdf_iter, state):
    subject, m_of = key
    if state.exists:
        (last_value, has_value) = state.get
    else:
        last_value, has_value = None, False
    out_rows = []
    for pdf in pdf_iter:
        # stable kind so ties at equal timestamps break identically to
        # the vectorized path (r7 shipped an unstable default sort —
        # tie order among equal timestamps was already unspecified)
        pdf = pdf.sort_values("timestamp", kind="stable")
        for _, row in pdf.iterrows():
            v = row["measurement_string"]
            v = None if pd.isna(v) else v
            if (
                not has_value
                or (v is None) != (last_value is None)
                or v != last_value
            ):
                out_rows.append(
                    {
                        "measurement_subject": subject,
                        "measurement_of": m_of,
                        "timestamp": row["timestamp"],
                        "value": v,
                    }
                )
                last_value, has_value = v, True
    state.update((last_value, has_value))
    if out_rows:
        yield pd.DataFrame(out_rows)


def loop_counter(bucket_seconds):
    def fn(key, pdf_iter, state):
        (subject,) = key
        last_v = None
        if state.exists:
            (last_v, _t, _u) = state.get
        partials = {}
        saw = False
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["timestamp", "measurement_unique_id"])
            epochs = (
                pdf["timestamp"].astype("datetime64[ns]").astype("int64")
                // 1_000_000_000
            )
            for v, ep, uid in zip(
                pdf["measurement_number"], epochs, pdf["measurement_unique_id"]
            ):
                if pd.isna(v):
                    continue
                v = float(v)
                saw = True
                if last_v is None:
                    contrib = 0.0
                elif v >= last_v:
                    contrib = v - last_v
                else:
                    contrib = v
                bucket = (int(ep) // bucket_seconds) * bucket_seconds
                partials[bucket] = partials.get(bucket, 0.0) + contrib
                last_v, last_t, last_uid = v, int(ep), int(uid)
        if saw:
            state.update((last_v, last_t, last_uid))
        if partials:
            yield pd.DataFrame(
                {
                    "measurement_subject": subject,
                    "time": pd.to_datetime(
                        [b * 1_000_000_000 for b in sorted(partials)]
                    ),
                    "partial_delta": [partials[b] for b in sorted(partials)],
                }
            )

    return fn


def loop_heartbeat(tolerance_seconds):
    def fn(key, pdf_iter, state):
        (subject,) = key
        last_t = state.get[0] if state.exists else None
        n = 0
        covered = 0
        mn = mx = None
        for pdf in pdf_iter:
            pdf = pdf.sort_values(["timestamp", "measurement_unique_id"])
            epochs = (
                pdf["timestamp"].astype("datetime64[ns]").astype("int64")
                // 1_000_000_000
            )
            for ep in epochs:
                ep = int(ep)
                if last_t is not None:
                    covered += min(ep - last_t, tolerance_seconds)
                last_t = ep
                n += 1
                mn = ep if mn is None else min(mn, ep)
                mx = ep if mx is None else max(mx, ep)
        if n:
            state.update((last_t,))
            yield pd.DataFrame(
                {
                    "measurement_subject": [subject],
                    "n_beats": [n],
                    "covered_partial_s": [covered],
                    "min_t": [mn],
                    "max_t": [mx],
                }
            )

    return fn


def run(fn, key, batch, state_val, reps=3):
    best = float("inf")
    out = None
    for _ in range(reps):
        st = FakeState(state_val)
        t0 = time.perf_counter()
        out = list(fn(key, iter([batch.copy()]), st))
        best = min(best, time.perf_counter() - t0)
    return best, out, st._v


def normalize(frames):
    if not frames:
        return None
    df = pd.concat(frames, ignore_index=True)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def frames_equal(a, b) -> bool:
    """Order-insensitive equality with FP tolerance on float columns
    (the vectorized sum associates additions differently)."""
    if a is None or b is None:
        return a is b
    if a.shape != b.shape or list(a.columns) != list(b.columns):
        return False
    for c in a.columns:
        x, y = a[c], b[c]
        if x.dtype.kind == "f" or y.dtype.kind == "f":
            if not np.allclose(
                x.astype(float), y.astype(float), rtol=1e-9, atol=1e-9,
                equal_nan=True,
            ):
                return False
        else:
            if not (
                x.fillna("<NA>").astype(str)
                == y.fillna("<NA>").astype(str)
            ).all():
                return False
    return True


def main():
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    batch = make_batch(rows)
    results = {}

    cases = [
        (
            "changes",
            ("subj-1", "value"),
            lambda k, it, st: _changes_fn(k, it, st),
            lambda k, it, st: loop_changes(k, it, st),
            ("on", True),
        ),
        (
            "counter_delta",
            ("subj-1",),
            _counter_delta_fn_factory(86400),
            loop_counter(86400),
            (10.0, 0, 0),
        ),
        (
            "heartbeat",
            ("subj-1",),
            _heartbeat_fn_factory(3600),
            loop_heartbeat(3600),
            (0,),
        ),
    ]
    for name, key, vec, loop, st0 in cases:
        t_vec, out_vec, s_vec = run(vec, key, batch, st0)
        t_loop, out_loop, s_loop = run(loop, key, batch, st0)
        same = frames_equal(normalize(out_vec), normalize(out_loop))
        results[name] = {
            "rows": rows,
            "loop_s": round(t_loop, 4),
            "vec_s": round(t_vec, 4),
            "speedup": round(t_loop / t_vec, 1),
            "outputs_identical": bool(same),
            "states_identical": s_vec == s_loop,
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
