"""asof_join_salted must be row-identical to asof_join — the same
contract test_q8_q9_salted_equivalence_property pins for the chunked
Q8/Q9 windows, applied to the as-of carry.

Covers: a hot subject dominating the data, duplicate measurement
timestamps (tie-break determinism), probes before the first
measurement (NULL carry), probes exactly at measurement time (>=
semantics), measurement-less chunks between probes (summary carry
across empty chunks), tolerance nulling, and chunk sizes from
one-row-per-chunk to one-chunk-total.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.asof import (
    asof_join,
    asof_join_salted,
)

COND_SCHEMA = (
    "timestamp timestamp, measurement_subject string, "
    "measurement_of string, measurement_number double, "
    "measurement_unique_id long"
)
PROBE_SCHEMA = (
    "probe_id long, measurement_subject string, probe_time timestamp"
)


def _corpus(spark, with_uid: bool = True):
    rng = random.Random(7)
    base = datetime(2024, 3, 1)
    cond_rows = []
    uid = 0
    for _ in range(400):
        subj = "hot" if rng.random() < 0.5 else f"s{rng.randrange(4)}"
        # coarse seconds force (subject, ts) ties; None values must be
        # skipped by the carry, not carried
        ts = base + timedelta(seconds=rng.randrange(90))
        val = rng.choice([None, 1.5, 2.0, 3.25, 7.0])
        cond_rows.append((ts, subj, "value", val, uid))
        uid += 1
    cond = spark.createDataFrame(cond_rows, COND_SCHEMA)
    if not with_uid:
        cond = cond.drop("measurement_unique_id")
    probe_rows = []
    for i in range(150):
        subj = "hot" if rng.random() < 0.5 else f"s{rng.randrange(5)}"
        # range [-10, 100) puts some probes before every measurement;
        # integer seconds land many probes exactly ON measurement times
        ts = base + timedelta(seconds=rng.randrange(-10, 100))
        probe_rows.append((i, subj, ts))
    probes = spark.createDataFrame(probe_rows, PROBE_SCHEMA)
    return probes, cond


def _rows(df):
    key = lambda t: tuple(map(repr, t))
    return sorted(map(tuple, df.collect()), key=key)


def test_asof_salted_equivalence_property(spark):
    for with_uid in (True, False):
        probes, cond = _corpus(spark, with_uid=with_uid)
        want = _rows(asof_join(probes, cond, "value"))
        for chunk_seconds in (1, 7, 86400):
            got = _rows(
                asof_join_salted(
                    probes, cond, "value", chunk_seconds=chunk_seconds
                )
            )
            assert got == want, (with_uid, chunk_seconds)


def test_asof_salted_equivalence_with_tolerance(spark):
    probes, cond = _corpus(spark)
    want = _rows(asof_join(probes, cond, "value", tolerance_seconds=15))
    for chunk_seconds in (5, 86400):
        got = _rows(
            asof_join_salted(
                probes, cond, "value",
                tolerance_seconds=15, chunk_seconds=chunk_seconds,
            )
        )
        assert got == want, chunk_seconds


def test_asof_tie_break_is_deterministic(spark):
    """Same (subject, ts) with different values: both paths must pick
    the row with the greatest measurement_unique_id, every time."""
    ts = datetime(2024, 3, 1, 0, 0, 10)
    cond = spark.createDataFrame(
        [
            (ts, "a", "value", 9.0, 1),
            (ts, "a", "value", 4.0, 3),  # max uid wins, not max value
            (ts, "a", "value", 6.0, 2),
        ],
        COND_SCHEMA,
    )
    probes = spark.createDataFrame(
        [(0, "a", ts), (1, "a", ts + timedelta(seconds=5))], PROBE_SCHEMA
    )
    for df in (
        asof_join(probes, cond, "value"),
        asof_join_salted(probes, cond, "value", chunk_seconds=1),
    ):
        got = {r["probe_id"]: r["asof_value"] for r in df.collect()}
        assert got == {0: 4.0, 1: 4.0}


def test_asof_empty_chunk_carry(spark):
    """A probe whose chunk (and several preceding chunks) hold no
    measurements must still see the last measurement from the distant
    past — the summary carry must cross empty chunks."""
    base = datetime(2024, 3, 1)
    cond = spark.createDataFrame(
        [(base, "a", "value", 5.0, 1)], COND_SCHEMA
    )
    probes = spark.createDataFrame(
        [(0, "a", base + timedelta(seconds=3600))], PROBE_SCHEMA
    )
    got = asof_join_salted(
        probes, cond, "value", chunk_seconds=10
    ).collect()
    assert len(got) == 1
    assert got[0]["asof_value"] == 5.0
    assert got[0]["asof_time"] == base


def test_asof_salted_precomputed_factor_row_identical(spark):
    """r14 ADVICE #3: salt_factor= (a precomputed skew factor from a
    sample or a prior run) must skip the CMS probe yet produce rows
    identical to the unsalted truth — width-independence already
    guarantees this for ANY factor, so pin both a splitting factor
    and the degenerate factor 1."""
    probes, cond = _corpus(spark)
    truth = _rows(asof_join(probes, cond, "value"))
    for factor in (1, 5):
        got = _rows(
            asof_join_salted(
                probes, cond, "value", salt_factor=factor
            )
        )
        assert got == truth
