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


class TestQuantileBandsGK:
    """The GK at-scale twin (r12 verdict ask #2): row-identity with
    the exact form in GK's exact regime, and the rank-error envelope
    once compression kicks in."""

    def test_exact_regime_row_identical_to_exact_form(self, spark):
        from eventhub_to_timescale_spark.operators.quantband import (
            quantile_bands_gk,
        )

        rng = random.Random(7)
        spec = [
            (t, d, rng.uniform(-50, 50))
            for t in ("a", "b", "c")
            for d in (0, 1)
            for _ in range(rng.randint(3, 60))
        ]
        ev = _events(spark, spec)
        exact = [tuple(r) for r in quantile_bands(ev).collect()]
        gk = [tuple(r) for r in quantile_bands_gk(ev).collect()]
        assert gk == exact and len(gk) == 6

    def test_rank_error_bound_under_compression(self, spark):
        """accuracy=20 on a 5000-row cell FORCES GK compression; each
        band must land within the exact ±1/accuracy rank envelope
        (the bound GK actually guarantees — Greenwald & Khanna 2001),
        and must be an actually-observed value."""
        from eventhub_to_timescale_spark.operators.quantband import (
            _BANDS,
            quantile_bands_gk,
        )

        rng = random.Random(11)
        vals = [rng.uniform(0, 1000) for _ in range(5000)]
        spec = [("a", 0, v) for v in vals]
        acc = 20
        row = quantile_bands_gk(_events(spark, spec), accuracy=acc).collect()[0]
        cents = sorted(int(math.floor(v * 100 + 0.5)) for v in vals)
        n = len(cents)
        eps = 1.0 / acc
        cent_set = set(cents)
        for name, q in _BANDS:
            got = row[f"{name}_cents"]
            lo_rank = max(1, math.ceil((q - eps) * n))
            hi_rank = min(n, math.ceil((q + eps) * n))
            assert cents[lo_rank - 1] <= got <= cents[hi_rank - 1], (
                name, got, cents[lo_rank - 1], cents[hi_rank - 1])
            assert got in cent_set

    def test_bad_accuracy_raises(self, spark):
        import pytest

        from eventhub_to_timescale_spark.operators.quantband import (
            quantile_bands_gk,
        )

        with pytest.raises(ValueError):
            quantile_bands_gk(_events(spark, [("a", 0, 1.0)]), accuracy=0)

    def test_gk_matches_shared_oracle_sf0001(self, spark):
        """The gate surface: the GK form shares the exact form's
        oracle at gate scale (cells ≤ accuracy ⇒ exact regime)."""
        from eventhub_to_timescale_spark.operators.quantband import (
            quantile_bands_gk,
        )
        from eventhub_to_timescale_spark.sources.testdata import load_table

        sf = "/root/testdata/sf0.001"
        got = [
            tuple(r)
            for r in quantile_bands_gk(load_table(spark, sf, "events")).collect()
        ]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'"
        )
        want = [tuple(r) for r in con.execute(quantile_bands_oracle_sql()).fetchall()]
        assert got == want and len(got) > 0


class TestAutoAccuracy:
    """accuracy="auto" (r13 verdict ask #4): the cell-size probe
    sizes the sketch so exactness no longer depends on the caller
    knowing the 2x-largest-cell rule."""

    def test_probe_returns_2n_plus_1(self, spark):
        from eventhub_to_timescale_spark.operators.quantband import (
            choose_gk_accuracy,
        )

        spec = [("a", 0, float(i)) for i in range(700)] + [
            ("b", 1, float(i)) for i in range(40)
        ]
        acc, largest = choose_gk_accuracy(_events(spark, spec))
        assert largest == 700 and acc == 1401

    def test_auto_is_bit_exact_without_manual_sizing(self, spark):
        """The r13 foot-gun scenario: a cell big enough that the old
        fixed default (10000) would NOT obviously cover it — auto
        mode must match the exact form with no caller knowledge."""
        from eventhub_to_timescale_spark.operators.quantband import (
            quantile_bands_gk,
        )

        rng = random.Random(31)
        spec = [("a", 0, rng.uniform(0, 1000)) for _ in range(6000)] + [
            ("b", 0, rng.uniform(-10, 10)) for _ in range(150)
        ]
        ev = _events(spark, spec)
        exact = [tuple(r) for r in quantile_bands(ev).collect()]
        auto = [tuple(r) for r in quantile_bands_gk(ev).collect()]
        assert auto == exact

    def test_cap_bounds_accuracy_and_envelope_holds(self, spark):
        """Past the cap the probe must NOT size accuracy to the data
        (that is the memory bound's whole point); the result falls
        back to the documented +-n/accuracy rank envelope."""
        from eventhub_to_timescale_spark.operators.quantband import (
            _BANDS,
            choose_gk_accuracy,
            quantile_bands_gk,
        )

        rng = random.Random(37)
        vals = [rng.uniform(0, 1000) for _ in range(5000)]
        ev = _events(spark, [("a", 0, v) for v in vals])
        cap = 50
        acc, largest = choose_gk_accuracy(ev, cap=cap)
        assert largest == 5000 and acc == cap
        row = quantile_bands_gk(ev, accuracy="auto", auto_cap=cap).collect()[0]
        cents = sorted(int(math.floor(v * 100 + 0.5)) for v in vals)
        n, eps = len(cents), 1.0 / cap
        for name, q in _BANDS:
            got = row[f"{name}_cents"]
            lo = cents[max(1, math.ceil((q - eps) * n)) - 1]
            hi = cents[min(n, math.ceil((q + eps) * n)) - 1]
            assert lo <= got <= hi, (name, got, lo, hi)

    def test_bad_cap_raises(self, spark):
        import pytest

        from eventhub_to_timescale_spark.operators.quantband import (
            choose_gk_accuracy,
        )

        with pytest.raises(ValueError):
            choose_gk_accuracy(_events(spark, [("a", 0, 1.0)]), cap=0)

    def test_non_int_accuracy_rejected(self, spark):
        import pytest

        from eventhub_to_timescale_spark.operators.quantband import (
            quantile_bands_gk,
        )

        with pytest.raises(ValueError):
            quantile_bands_gk(
                _events(spark, [("a", 0, 1.0)]), accuracy="fast"
            )


def test_gk_merge_free_threshold(spark):
    """The honest exactness rule (r13 sf1 sweep lesson): Spark's
    summary is provably merge-free only while n < accuracy/2 — at
    accuracy = 2n the GK bands are bit-exact, below that they may
    drift (but stay in the rank envelope, pinned above)."""
    from eventhub_to_timescale_spark.operators.quantband import (
        quantile_bands_gk,
    )

    rng = random.Random(23)
    vals = [rng.uniform(0, 1000) for _ in range(5000)]
    ev = _events(spark, [("a", 0, v) for v in vals])
    exact = [tuple(r) for r in quantile_bands(ev).collect()]
    gk = [tuple(r) for r in quantile_bands_gk(ev, accuracy=10000).collect()]
    assert gk == exact  # accuracy = 2n ⇒ merge-free ⇒ bit-exact
