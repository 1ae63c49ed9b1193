"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's only "state" is the BMW dedup table; its analytics are
batch-only. Here the change-point filter (Q8 / reference
db/filter_unchanged_rows.sql) becomes a continuous operator: per
subject, remember the last seen value and emit only rows whose value
differs (null-safely) — a Grafana state-timeline that updates live
instead of being recomputed per panel refresh.

State is one row per (subject, measurement_of): the last value + its
timestamp. GroupStateTimeout.ProcessingTimeTimeout evicts idle
subjects so state stays bounded at any key cardinality.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = (
    "measurement_subject string, measurement_of string, "
    "timestamp timestamp, value string"
)
_STATE_SCHEMA = "last_value string, has_value boolean"


def _changes_fn(
    key: tuple,
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    subject, m_of = key
    # Timeout invocation: no new data for this key within the idle
    # window — drop the state and do NOT re-arm the timer, otherwise
    # every idle subject is revisited forever and state never shrinks.
    if state.hasTimedOut:
        state.remove()
        return
    if state.exists:
        (last_value, has_value) = state.get
    else:
        last_value, has_value = None, False

    out_rows: list[dict[str, Any]] = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("timestamp")
        for _, row in pdf.iterrows():
            v = row["measurement_string"]
            v = None if pd.isna(v) else v
            # null-safe IS DISTINCT FROM (reference
            # filter_unchanged_rows.sql:33)
            if not has_value or (v is None) != (last_value is None) or v != last_value:
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
    state.setTimeoutDuration(24 * 3600 * 1000)  # evict idle subjects
    if out_rows:
        yield pd.DataFrame(out_rows)


_COUNTER_OUT_SCHEMA = (
    "measurement_subject string, time timestamp, partial_delta double"
)
# last sample carried across micro-batches: value + its order key
# (timestamp micros, unique id) so the within-batch sort and the
# cross-batch carry use the same total order as the batch operator
_COUNTER_STATE_SCHEMA = "last_v double, last_t long, last_uid long"


def _counter_delta_fn_factory(bucket_seconds: int):
    def fn(key, pdf_iter, state):
        import pandas as pd

        (subject,) = key
        if state.hasTimedOut:
            state.remove()
            return
        last_v = None
        if state.exists:
            (last_v, _last_t, _last_uid) = state.get

        partials: dict[int, float] = {}
        saw = False
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            pdf = pdf.sort_values(["timestamp", "measurement_unique_id"])
            # tz-free integer epoch: naive datetime64 ns in a UTC
            # session are ns-since-epoch directly
            epochs = (
                pdf["timestamp"].astype("datetime64[ns]").astype("int64")
                // 1_000_000_000
            )
            for v, ep, uid in zip(
                pdf["measurement_number"], epochs,
                pdf["measurement_unique_id"],
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
                    contrib = v  # counter reset: restart from zero
                bucket = (int(ep) // bucket_seconds) * bucket_seconds
                partials[bucket] = partials.get(bucket, 0.0) + contrib
                last_v, last_t, last_uid = v, int(ep), int(uid)
        if saw:
            state.update((last_v, last_t, last_uid))
            state.setTimeoutDuration(24 * 3600 * 1000)
        if partials:
            yield pd.DataFrame(
                {
                    "measurement_subject": subject,
                    "time": pd.to_datetime(
                        [b * 1_000_000_000 for b in sorted(partials)]
                    ),
                    "partial_delta": [
                        partials[b] for b in sorted(partials)
                    ],
                }
            )

    return fn


def streaming_counter_delta(
    conditions: DataFrame,
    of: str = "value",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """Stream-side Toolkit ``counter_agg → delta()``
    (operators/toolkit.py:counter_delta): per-subject state is ONE
    sample (the last value + its order key), each micro-batch emits
    the bucketed PARTIAL increase it observed, and
    ``sum(partial_delta) GROUP BY (subject, time)`` over the emitted
    rows equals the batch operator exactly — counter contributions
    are per-sample, so no window-close/watermark semantics are needed
    for the re-aggregation to be exact (contrast ``session_window``).

    At scale this is the canonical continuous-rollup shape: bounded
    state per key (3 scalars), append-only output, partials
    re-aggregated by the downstream sink or a follow-up batch agg.
    Requires event-time-ordered arrival per key across micro-batches
    (replay in order / per-key ordered source partitions) — the same
    contract the reference's dedup-ingest assumes.
    """
    return (
        conditions.filter(
            (conditions["measurement_of"] == of)
            & conditions["measurement_number"].isNotNull()
        )
        .select(
            "measurement_subject",
            "timestamp",
            "measurement_unique_id",
            "measurement_number",
        )
        .groupBy("measurement_subject")
        .applyInPandasWithState(
            _counter_delta_fn_factory(bucket_seconds),
            outputStructType=_COUNTER_OUT_SCHEMA,
            stateStructType=_COUNTER_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


_HEARTBEAT_OUT_SCHEMA = (
    "measurement_subject string, n_beats long, covered_partial_s long, "
    "min_t long, max_t long"
)
_HEARTBEAT_STATE_SCHEMA = "last_t long"


def _heartbeat_fn_factory(tolerance_seconds: int):
    def fn(key, pdf_iter, state):
        import pandas as pd

        (subject,) = key
        if state.hasTimedOut:
            state.remove()
            return
        last_t = state.get[0] if state.exists else None

        n = 0
        covered = 0
        mn = mx = None
        for pdf in pdf_iter:
            if pdf.empty:
                continue
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
            state.setTimeoutDuration(24 * 3600 * 1000)
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


def streaming_heartbeat(
    conditions: DataFrame,
    of: str = "value",
    tolerance_seconds: int = 3600,
) -> DataFrame:
    """Stream-side Toolkit ``heartbeat_agg``
    (operators/toolkit.py:heartbeat_uptime): one epoch of state per
    subject.  Each micro-batch emits a PARTIAL liveness summary —
    beat count, covered seconds over consecutive pairs INCLUDING the
    pair that crosses the batch boundary (carried by the state), and
    the batch's min/max beat time.  Re-aggregation over the emitted
    partials reproduces the batch operator exactly:

        n_beats   = sum(n_beats)
        covered_s = sum(covered_partial_s) + tolerance   (final beat)
        span_s    = max(max_t) + tolerance − min(min_t)

    Same ordered-arrival contract and bounded-state posture as
    ``streaming_counter_delta``.
    """
    return (
        conditions.filter(
            (conditions["measurement_of"] == of)
            & conditions["measurement_number"].isNotNull()
        )
        .select(
            "measurement_subject",
            "timestamp",
            "measurement_unique_id",
        )
        .groupBy("measurement_subject")
        .applyInPandasWithState(
            _heartbeat_fn_factory(tolerance_seconds),
            outputStructType=_HEARTBEAT_OUT_SCHEMA,
            stateStructType=_HEARTBEAT_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_changed_rows(conditions: DataFrame) -> DataFrame:
    """Stream-side Q8: keep only change points, keyed state per
    (subject, measurement_of). Input must already carry a watermark."""
    return (
        conditions.select(
            "measurement_subject",
            "measurement_of",
            "timestamp",
            "measurement_string",
        )
        .groupBy("measurement_subject", "measurement_of")
        .applyInPandasWithState(
            _changes_fn,
            outputStructType=_OUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
