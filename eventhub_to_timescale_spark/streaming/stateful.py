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
