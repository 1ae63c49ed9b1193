"""Property-based tests (hypothesis) — a test level the reference does
not have (SURVEY §5). Each property runs one Spark job over a
hypothesis-generated batch, comparing against an independent in-Python
model of the pinned semantics."""

from __future__ import annotations

import json
import math
from datetime import datetime, timezone

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# JSON-safe scalar leaves
leaf = st.one_of(
    st.booleans(),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x7F),
        max_size=12,
    ),
)
key = st.text(
    alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x7A),
    min_size=1,
    max_size=8,
).filter(lambda k: k != "time")


@given(payload=st.dictionaries(key, leaf, min_size=0, max_size=6))
@settings(**SETTINGS)
def test_emon_record_count_and_types(spark, payload):
    """For ANY flat payload with a valid time key, emon emits exactly
    one record per non-time key, typed by the same rules as the
    reference's get_record_type (modulo JSON's bool/number text)."""
    from eventhub_to_timescale_spark.ingest.envelope import parse_envelope
    from eventhub_to_timescale_spark.ingest.emon import emon_to_records

    full = {"time": 1706777400, **payload}
    raw = json.dumps(
        {
            "topic": "emon/emonTx4",
            "payload": json.dumps(full),
            "qos": 0,
            "retain": 0,
        }
    )
    env = parse_envelope(
        spark.createDataFrame([(raw,)], "value string"), deterministic_ids=True
    )
    rows = emon_to_records(env).collect()
    assert len(rows) == len(payload)
    by_of = {r.measurement_of: r for r in rows}
    for k, v in payload.items():
        tag = by_of[k].measurement_data_type
        if isinstance(v, bool):
            assert tag == "boolean"
        elif isinstance(v, (int, float)):
            assert tag == "number"
        elif v.lower() in ("true", "false"):
            assert tag == "boolean"  # textual bools indistinguishable post-JSON
        else:
            # numeric-looking strings are tagged number (type is inferred
            # from the leaf text, documented narrowing vs the reference)
            assert tag in ("number", "string")


@given(epochs=st.lists(st.integers(min_value=0, max_value=253402300799), min_size=1, max_size=20))
@settings(**SETTINGS)
def test_epoch_roundtrip(spark, epochs):
    from eventhub_to_timescale_spark.functions.scalars import parse_timestamp_any

    df = spark.createDataFrame([(str(e),) for e in epochs], "v string")
    out = [r[0] for r in df.select(parse_timestamp_any(F.col("v"))).collect()]
    expected = [
        datetime.fromtimestamp(e, tz=timezone.utc).replace(tzinfo=None) for e in epochs
    ]
    assert out == expected


@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False), min_size=1, max_size=20
    )
)
@settings(**SETTINGS)
def test_message_roundtrip(spark, vals):
    """records → JSON wire format → re-ingest parses back to identical
    typed values (S5 sink ↔ S3 source closure)."""
    from eventhub_to_timescale_spark.sinks.messages import records_to_messages

    recs = spark.createDataFrame(
        [
            (datetime(2024, 2, 1, 12, 0, 0), f"s{i}", "pub", "m", repr(v), "number", "c")
            for i, v in enumerate(vals)
        ],
        "timestamp timestamp, measurement_subject string, "
        "measurement_publisher string, measurement_of string, "
        "measurement_value string, measurement_data_type string, "
        "correlation_id string",
    )
    msgs = [json.loads(r.value) for r in records_to_messages(recs).collect()]
    got = sorted(float(m["measurement_value"]) for m in msgs)
    assert got == pytest.approx(sorted(vals))
    assert all(m["timestamp"] == "2024-02-01T12:00:00.000000Z" for m in msgs)


@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll",), max_codepoint=0x7A),
            min_size=1,
            max_size=30,
        ),
        min_size=2,
        max_size=8,
    )
)
@settings(**SETTINGS)
def test_exact_dedup_model(spark, texts):
    """exact_duplicates always partitions doc_ids exactly like a
    Python dict-of-lists over the raw text."""
    from eventhub_to_timescale_spark.operators.dedup import exact_duplicates

    docs = spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(texts)],
        "doc_id long, text string, source string",
    )
    model: dict[str, list[int]] = {}
    for i, t in enumerate(texts):
        model.setdefault(t, []).append(i)
    got = {
        (r.keep_id, r.n_docs) for r in exact_duplicates(docs).collect()
    }
    want = {(min(ids), len(ids)) for ids in model.values()}
    assert got == want


@given(
    pts=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3599),
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda p: p[0],
    )
)
@settings(**SETTINGS)
def test_timeweight_locf_model(spark, pts):
    """LOCF time-weighted average matches an independent Python fold
    for arbitrary in-bucket samples."""
    from eventhub_to_timescale_spark.operators.timeweight import time_weighted_average

    # place each point at its second offset within the single bucket
    from datetime import timedelta

    rows = [
        (datetime(2024, 1, 1) + timedelta(seconds=sec), "s", "p", "m", float(v),
         None, None, None, "c", i)
        for i, (sec, v) in enumerate(pts)
    ]
    df = spark.createDataFrame(
        rows,
        "timestamp timestamp, measurement_subject string, "
        "measurement_publisher string, measurement_of string, "
        "measurement_number double, measurement_string string, "
        "measurement_bool boolean, measurement_location string, "
        "correlation_id string, measurement_unique_id long",
    )
    out = time_weighted_average(
        df, "s", "m", datetime(2024, 1, 1), datetime(2024, 1, 1, 1), "locf", 1
    ).collect()
    srt = sorted(pts)
    num = den = 0.0
    for i, (sec, v) in enumerate(srt):
        nxt = srt[i + 1][0] if i + 1 < len(srt) else 3600
        num += v * (nxt - sec)
        den += nxt - sec
    assert out[0].time_weighted_value == pytest.approx(num / den)
    assert math.isfinite(out[0].time_weighted_value)
