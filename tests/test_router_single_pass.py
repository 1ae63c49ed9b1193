"""Differential test: the single-pass router must produce exactly the
rows the round-1 union-of-converters plan produced, across every edge
case each converter handles (reference json_converter.py:145-163 —
dispatch semantics are defined by the per-publisher converters)."""

from __future__ import annotations

import pytest

from tests.conftest import make_envelope
from tests.test_converters_golden import GLOW_ELEC_PAYLOAD, GLOW_GAS_PAYLOAD

MESSAGES = [
    make_envelope("glow/XXXXXX/SENSOR/electricitymeter", GLOW_ELEC_PAYLOAD),
    make_envelope("glow/XXXXXX/SENSOR/gasmeter", GLOW_GAS_PAYLOAD),
    # glow, but subject not in the allowlist → dropped
    make_envelope("glow/XXXXXX/SENSOR/watermeter", GLOW_ELEC_PAYLOAD),
    # glow whose payload lacks the topic's subject key → null meter
    # timestamp → dropped
    make_envelope("glow/XXXXXX/SENSOR/gasmeter", GLOW_ELEC_PAYLOAD),
    make_envelope(
        "homie/room/thermostat/mode", "auto", timestamp="2024-02-01T09:30:00Z"
    ),
    make_envelope(
        "homie/room/thermostat/measure-temperature",
        "19.5",
        timestamp="2024-02-01T09:31:00Z",
    ),
    # homie, measurement not of interest → dropped
    make_envelope(
        "homie/room/thermostat/battery", "77", timestamp="2024-02-01T09:32:00Z"
    ),
    # homie without an envelope timestamp → dropped
    make_envelope("homie/room/thermostat/state", "idle"),
    make_envelope(
        "emon/emonTx4", {"time": 1706777400.25, "vrms": 243.58, "P1": 155}
    ),
    # emon without the required 'time' key → dropped
    make_envelope("emon/emonTx4", {"vrms": 240.0}),
    # emon, wrong subject → dropped
    make_envelope("emon/other", {"time": 1706777400, "vrms": 240.0}),
    # unknown publisher → unrouted channel, no records
    make_envelope("mystery/topic", {"x": 1}),
    # corrupt (non-JSON) message → corrupt channel, no records
    "this is not json",
]

COLUMNS = [
    "timestamp",
    "measurement_subject",
    "measurement_publisher",
    "measurement_of",
    "measurement_value",
    "measurement_data_type",
    "correlation_id",
]


def _sorted_rows(df):
    return sorted(tuple(r[c] for c in COLUMNS) for r in df.collect())


@pytest.fixture()
def env(envelopes):
    return envelopes(MESSAGES)


def test_single_pass_matches_union(env):
    from eventhub_to_timescale_spark.ingest.router import (
        route_to_records,
        route_to_records_union,
    )

    single = _sorted_rows(route_to_records(env))
    union = _sorted_rows(route_to_records_union(env))
    assert single == union
    # sanity: the edge cases above leave 7 glow-elec + 10 glow-gas +
    # 2 homie + 2 emon records
    assert len(single) == 21


def test_single_pass_plan_has_one_scan(env):
    """The point of the restructure: the source must appear exactly
    once in the physical plan (the union plan scans it three times)."""
    from eventhub_to_timescale_spark.ingest.router import (
        route_to_records,
        route_to_records_union,
    )

    def n_scans(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        return plan.count("ExistingRDD") + plan.count("Scan parquet")

    assert n_scans(route_to_records(env)) == 1
    assert n_scans(route_to_records_union(env)) == 3
