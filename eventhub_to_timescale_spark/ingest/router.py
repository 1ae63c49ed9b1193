"""Publisher routing: ONE pass over the envelope, per-publisher record
arrays, a single explode.

Replaces the reference's ``send_to_converter`` dispatch
(json_converter.py:145-163). Round 1 expressed routing as a 3-way
``unionByName`` of the converter DataFrames — semantically right, but
Catalyst does not share common subtrees across union branches, so the
raw scan and the envelope ``from_json`` executed once per branch (a 3×
scan tax measured as the worst bench entry, 4.6 s warm at sf0.1). The
single-pass plan evaluates the source exactly once:

    envelope rows (scanned once)
      → glow payload parse,   guarded by when(publisher = 'glow')
      → emon map parse,       guarded by when(publisher = 'emon')
        (both materialized through the Generate barrier — see
        envelope.materialize — so each parses at most once per row)
      → per-publisher array<struct<of, value, type>>:
          glow  = the 11 declared leaves (glow.glow_fields)
          homie = one element, measurement_of from the topic
          emon  = transform(map_entries(kv)) minus the 'time' key
      → concat → array-level null-value filter → ONE explode.

Row-level columns (timestamp, subject) are when/otherwise over the
same scan; per-branch guards reproduce each converter's filters. At
100 TB this is one linear stage with no shuffle and no repeated scan;
``route_to_records_union`` keeps the naive plan for differential
testing (tests/test_router_single_pass.py asserts identical output).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.functions.scalars import (
    parse_timestamp_any,
    topic_part,
    topic_subject,
)
from eventhub_to_timescale_spark.functions.typeinfer import infer_type_tag
from eventhub_to_timescale_spark.ingest.emon import EMON_SUBJECTS, emon_to_records
from eventhub_to_timescale_spark.ingest.envelope import materialize
from eventhub_to_timescale_spark.ingest.glow import (
    GLOW_PAYLOAD_SCHEMA,
    GLOW_SUBJECTS,
    glow_fields,
    glow_to_records,
)
from eventhub_to_timescale_spark.ingest.homie import (
    HOMIE_EVENTS_OF_INTEREST,
    _STRING_MEASURES,
    homie_to_records,
)
from eventhub_to_timescale_spark.schema import TYPE_NUMBER, TYPE_STRING

KNOWN_PUBLISHERS = ("glow", "homie", "emon")

_CONVERTERS = {
    "glow": glow_to_records,
    "homie": homie_to_records,
    "emon": emon_to_records,
}

_REC_TYPE = (
    "array<struct<measurement_of:string,measurement_value:string,"
    "measurement_data_type:string>>"
)


def _rec(of: Column, value: Column, type_tag: Column) -> Column:
    return F.struct(
        of.alias("measurement_of"),
        value.cast("string").alias("measurement_value"),
        type_tag.alias("measurement_data_type"),
    )


def route_to_records(
    envelope_df: DataFrame,
    dynamic_fallback: bool = False,
    dynamic_max_depth: int = 6,
    dynamic_ignore_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Parsed envelope rows → canonical atomic records across all
    MQTT publishers (glow, homie, emon) in a single pass.

    ``dynamic_fallback=True`` adds a fourth guarded branch: messages
    from publishers no converter declares flow through the
    arbitrary-depth dynamic flatten (``ingest.dynamic``) instead of
    being dropped — subject from the topic, timestamp from the
    envelope, leaf-key record names. Same single scan; the flatten
    expression only evaluates on unknown-publisher rows (CaseWhen
    short-circuit). This is the onboarding path for a sensor nobody
    has written a declared-struct converter for yet."""
    from eventhub_to_timescale_spark.ingest import emon as _emon

    if _emon.USE_VARIANT_PATH:
        # the single-pass plan inlines the emon map parse; honoring the
        # variant knob here would silently desynchronize the two
        # routers, so refuse loudly instead
        raise NotImplementedError(
            "route_to_records inlines the emon map<string,string> parse; "
            "with emon.USE_VARIANT_PATH=True use route_to_records_union "
            "(per-converter plan) for byte-faithful emon leaf text"
        )
    pub = F.lower(F.col("publisher"))
    has_payload = F.col("payload").isNotNull()
    base = (
        envelope_df
        if dynamic_fallback
        else envelope_df.filter(pub.isin(*KNOWN_PUBLISHERS))
    )

    # payload parses, evaluated only for the matching publisher's rows
    # (CaseWhen short-circuits) and at most once per row (Generate
    # attribute — from_json is CodegenFallback, see envelope.materialize)
    base = materialize(
        base,
        F.when(
            (pub == "glow") & has_payload,
            F.from_json(F.col("payload"), GLOW_PAYLOAD_SCHEMA),
        ),
        "gp",
    )
    base = materialize(
        base,
        F.when(
            (pub == "emon") & has_payload,
            F.from_json(F.col("payload"), "map<string,string>"),
        ),
        "kv",
    )

    subject_last = topic_subject(F.col("topic"))
    meter = F.when(
        subject_last == "electricitymeter", F.col("gp.electricitymeter")
    ).otherwise(F.col("gp.gasmeter"))
    homie_of = topic_part(F.col("topic"), -1)

    # record timestamp source differs per publisher: glow = payload
    # meter.timestamp (glow.py:17), homie = envelope timestamp
    # (homie.py:33), emon = payload 'time' key (emon.py
    # extract_timestamp), dynamic fallback = envelope timestamp;
    # null → row dropped, like each converter
    rec_ts = (
        F.when(pub == "glow", parse_timestamp_any(meter["timestamp"]))
        .when(pub == "emon", parse_timestamp_any(F.col("kv")["time"]))
        .otherwise(parse_timestamp_any(F.col("timestamp")))
    )
    subject = F.when(pub == "homie", topic_part(F.col("topic"), -2)).otherwise(
        subject_last
    )

    glow_arr = F.when(
        (pub == "glow") & has_payload & subject_last.isin(*GLOW_SUBJECTS),
        F.array(
            *[
                _rec(F.lit(name), value, F.lit(tag))
                for name, value, tag in glow_fields(meter, subject_last)
            ]
        ),
    )
    homie_arr = F.when(
        (pub == "homie")
        & has_payload
        & F.col("timestamp").isNotNull()
        & homie_of.isin(*HOMIE_EVENTS_OF_INTEREST),
        F.array(
            _rec(
                homie_of,
                F.col("payload"),
                F.when(
                    homie_of.isin(*_STRING_MEASURES), F.lit(TYPE_STRING)
                ).otherwise(F.lit(TYPE_NUMBER)),
            )
        ),
    )
    emon_arr = F.when(
        (pub == "emon") & has_payload & subject_last.isin(*EMON_SUBJECTS),
        F.filter(
            F.transform(
                F.map_entries(F.col("kv")),
                lambda e: _rec(e["key"], e["value"], infer_type_tag(e["value"])),
            ),
            lambda r: r["measurement_of"] != F.lit("time"),
        ),
    )

    arrays = [glow_arr, homie_arr, emon_arr]
    if dynamic_fallback:
        from eventhub_to_timescale_spark.ingest.dynamic import leaves_col

        leaves = leaves_col(
            F.col("payload"), dynamic_max_depth, tuple(dynamic_ignore_keys)
        )
        arrays.append(
            F.when(
                ~pub.isin(*KNOWN_PUBLISHERS)
                & has_payload
                & F.col("timestamp").isNotNull(),
                F.transform(
                    leaves,
                    lambda leaf: _rec(
                        leaf["k"], leaf["js"], infer_type_tag(leaf["js"])
                    ),
                ),
            )
        )

    empty = F.array().cast(_REC_TYPE)
    records = F.filter(
        F.concat(*[F.coalesce(a, empty) for a in arrays]),
        lambda r: r["measurement_value"].isNotNull(),
    )

    return (
        base.select(
            rec_ts.alias("timestamp"),
            subject.alias("measurement_subject"),
            pub.alias("measurement_publisher"),
            F.col("correlation_id"),
            F.explode(records).alias("rec"),
        )
        .filter(F.col("timestamp").isNotNull())
        .select(
            "timestamp",
            "measurement_subject",
            "measurement_publisher",
            F.col("rec.measurement_of").alias("measurement_of"),
            F.col("rec.measurement_value").alias("measurement_value"),
            F.col("rec.measurement_data_type").alias("measurement_data_type"),
            "correlation_id",
        )
    )


def route_to_records_union(envelope_df: DataFrame) -> DataFrame:
    """The round-1 plan — one filtered branch per converter, unioned.
    Kept as the differential-test baseline for the single-pass router
    (and as the shape a reader should compare against)."""
    branches = [conv(envelope_df) for conv in _CONVERTERS.values()]
    return reduce(lambda a, b: a.unionByName(b), branches)


def unrouted(envelope_df: DataFrame) -> DataFrame:
    """Messages whose publisher no converter handles (reference raises
    ValueError, json_converter.py:160-163) — error channel. With
    ``route_to_records(dynamic_fallback=True)`` these messages are
    instead converted via the dynamic flatten; this channel then only
    matters for auditing what WOULD have been dropped."""
    # coalesce: a NULL publisher (no topic) makes ~isin(...) NULL and
    # the filter would silently drop the row from THIS channel too —
    # such rows belong to the corrupt channel, everything else with an
    # unknown publisher belongs here
    unknown = ~F.coalesce(
        F.lower(F.col("publisher")).isin(*KNOWN_PUBLISHERS), F.lit(False)
    )
    if "corrupt" in envelope_df.columns:
        unknown = unknown & ~F.col("corrupt")
    return envelope_df.filter(unknown)
