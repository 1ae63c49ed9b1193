from __future__ import annotations

import json

import pytest

from eventhub_to_timescale_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def make_envelope(topic: str, payload, timestamp: str | None = None, qos: int = 0):
    """Build a raw event-hub message string the way publishers do:
    envelope JSON whose ``payload`` is itself a JSON-encoded string
    (double-encoded — reference test_utils/get_test_data.py re-wraps
    payloads the same way)."""
    body = {
        "topic": topic,
        "payload": payload if isinstance(payload, str) else json.dumps(payload),
        "qos": qos,
        "retain": 0,
    }
    if timestamp is not None:
        body["timestamp"] = timestamp
    return json.dumps(body)


@pytest.fixture()
def envelopes(spark):
    """Parsed-envelope DataFrame factory for converter tests."""
    from eventhub_to_timescale_spark.ingest.envelope import parse_envelope

    def _make(raw_messages: list[str]):
        df = spark.createDataFrame([(m,) for m in raw_messages], "value string")
        return parse_envelope(df, deterministic_ids=True)

    return _make
