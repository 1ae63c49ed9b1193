"""Exact quantile bands (operators/quantband.py): order-statistic
semantics against a literal Python reference, null exclusion, and
cross-engine oracle parity."""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

import duckdb

from eventhub_to_timescale_spark.operators.quantband import (
    quantile_bands,
    quantile_bands_oracle_sql,
)

T0 = datetime(2024, 3, 1)
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def _events(spark, spec):
    """spec: (event_type, day_offset, value) rows."""
    rows = [
        (i, T0 + timedelta(days=d, minutes=i % 600), 0, t, v, None)
        for i, (t, d, v) in enumerate(spec)
    ]
    return spark.createDataFrame(rows, SCHEMA)


def _ref_band(values, q):
    cents = sorted(int(math.floor(v * 100 + 0.5)) for v in values)
    return cents[math.ceil(q * len(cents)) - 1]


class TestQuantileBands:
    def test_matches_literal_order_statistics(self, spark):
        rng = random.Random(7)
        vals = [round(rng.uniform(-50, 50), 3) for _ in range(500)]
        spec = [("a", 0, v) for v in vals]
        row = quantile_bands(_events(spark, spec)).collect()[0]
        assert row["n"] == 500
        assert row["p50_cents"] == _ref_band(vals, 0.50)
        assert row["p90_cents"] == _ref_band(vals, 0.90)
        assert row["p99_cents"] == _ref_band(vals, 0.99)

    def test_single_value_cell(self, spark):
        row = quantile_bands(_events(spark, [("a", 0, 7.0)])).collect()[0]
        assert (
            row["n"],
            row["p50_cents"],
            row["p90_cents"],
            row["p99_cents"],
        ) == (1, 700, 700, 700)

    def test_cells_are_independent(self, spark):
        spec = [("a", 0, float(v)) for v in range(1, 101)]
        spec += [("a", 1, 5.0)]
        spec += [("b", 0, -1.0)]
        got = {
            (r["event_type"], r["day"]): r
            for r in quantile_bands(_events(spark, spec)).collect()
        }
        assert got[("a", "2024-03-01")]["p50_cents"] == 5000
        assert got[("a", "2024-03-02")]["n"] == 1
        assert got[("b", "2024-03-01")]["p99_cents"] == -100

    def test_nulls_excluded(self, spark):
        from pyspark.sql import functions as F

        df = _events(spark, [("a", 0, 1.0), ("a", 0, 2.0)]).unionByName(
            _events(spark, [("a", 0, 99.0)]).withColumn(
                "value", F.lit(None).cast("double")
            )
        )
        row = quantile_bands(df).collect()[0]
        assert row["n"] == 2 and row["p99_cents"] == 200


def test_oracle_parity_sf0001(spark):
    path = "/root/testdata/sf0.001/events.parquet"
    from eventhub_to_timescale_spark.sources.testdata import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    got = [tuple(r) for r in quantile_bands(ev).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute(quantile_bands_oracle_sql()).fetchall()
    assert len(got) == len(want) > 0
    assert got == [tuple(w) for w in want]
