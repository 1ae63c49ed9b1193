"""Publisher routing: one DAG, per-publisher branches, unioned.

Replaces the reference's ``send_to_converter`` dispatch
(json_converter.py:145-163): instead of a Python branch per message,
the parsed envelope DataFrame is filtered once per publisher and each
converter contributes a branch to a ``unionByName``. Catalyst collapses
the shared scan; each branch's topic/publisher filters are evaluated
before its payload ``from_json`` (the reference's early-drop,
glow.py:78-80), and unknown publishers fall out of every branch — the
reference raises ValueError; we expose them via ``unrouted``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.ingest.emon import emon_to_records
from eventhub_to_timescale_spark.ingest.glow import glow_to_records
from eventhub_to_timescale_spark.ingest.homie import homie_to_records

KNOWN_PUBLISHERS = ("glow", "homie", "emon")

_CONVERTERS = {
    "glow": glow_to_records,
    "homie": homie_to_records,
    "emon": emon_to_records,
}


def route_to_records(envelope_df: DataFrame) -> DataFrame:
    """Parsed envelope rows → canonical atomic records across all
    MQTT publishers (glow, homie, emon)."""
    branches = [conv(envelope_df) for conv in _CONVERTERS.values()]
    return reduce(lambda a, b: a.unionByName(b), branches)


def unrouted(envelope_df: DataFrame) -> DataFrame:
    """Messages whose publisher no converter handles (reference raises
    ValueError, json_converter.py:160-163) — error channel."""
    return envelope_df.filter(
        ~F.lower(F.col("publisher")).isin(*KNOWN_PUBLISHERS)
    )
