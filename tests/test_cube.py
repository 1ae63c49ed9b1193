"""OLAP cube aggregation (operators/cube.py): grouping-set
completeness, rollup-consistency invariants, single-Expand plan shape,
and oracle parity."""

from __future__ import annotations

from datetime import datetime, timedelta

import duckdb
import pytest

from eventhub_to_timescale_spark.operators.cube import (
    cube_counts,
    cube_oracle_sql,
)

T0 = datetime(2024, 1, 1)


def _events(spark, spec):
    """spec: (event_type, day_offset, value) rows."""
    rows = [
        (i, T0 + timedelta(days=d, minutes=i), 0, t, float(v), None)
        for i, (t, d, v) in enumerate(spec)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


class TestCubeCounts:
    def test_all_grouping_sets_present(self, spark):
        df = _events(
            spark,
            [("a", 0, 1.0), ("a", 1, 2.0), ("b", 0, 3.0)],
        )
        got = {(r.event_type, r.day): r for r in cube_counts(df).collect()}
        # 3 detail cells + 2 type totals + 2 day totals + grand total
        assert len(got) == 8
        assert got[("ALL", "ALL")].n == 3
        assert got[("ALL", "ALL")].sum_cents == 600
        assert got[("a", "ALL")].n == 2
        assert got[("ALL", "2024-01-01")].sum_cents == 400
        assert got[("b", "2024-01-01")].n == 1

    def test_rollup_consistency(self, spark):
        # Every marginal equals the sum of its detail cells.
        df = _events(
            spark,
            [(t, d, v) for t in "abc" for d in range(3)
             for v in (1.5, 2.25)],
        )
        rows = cube_counts(df).collect()
        detail = [r for r in rows if "ALL" not in (r.event_type, r.day)]
        grand = next(
            r for r in rows if (r.event_type, r.day) == ("ALL", "ALL")
        )
        assert grand.n == sum(r.n for r in detail)
        assert grand.sum_cents == sum(r.sum_cents for r in detail)
        for t in "abc":
            marg = next(
                r for r in rows if (r.event_type, r.day) == (t, "ALL")
            )
            mine = [r for r in detail if r.event_type == t]
            assert marg.n == sum(r.n for r in mine)
            assert marg.sum_cents == sum(r.sum_cents for r in mine)

    def test_single_expand_single_scan(self, spark):
        df = _events(spark, [("a", 0, 1.0)])
        plan = cube_counts(df)._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Expand") == 1

    def test_null_values_excluded(self, spark):
        df = _events(spark, [("a", 0, 1.0)]).unionByName(
            _events(spark, [("a", 0, 99.0)]).withColumn(
                "value", __import__("pyspark").sql.functions.lit(None).cast("double")
            )
        )
        got = {(r.event_type, r.day): r for r in cube_counts(df).collect()}
        assert got[("ALL", "ALL")].n == 1


    def test_null_ts_excluded_no_all_collision(self, spark):
        """A NULL ts must not yield a base row whose day renders as
        the 'ALL' sentinel (r11 advice: that would collide with the
        genuine per-type rollup row and make its ORDER BY tie
        nondeterministic)."""
        from pyspark.sql import functions as F

        df = _events(spark, [("a", 0, 1.0), ("a", 1, 2.0)]).unionByName(
            _events(spark, [("a", 0, 99.0)]).withColumn(
                "ts", F.lit(None).cast("timestamp")
            )
        )
        rows = cube_counts(df).collect()
        # exactly ONE (a, ALL) row, and it excludes the NULL-ts event
        a_all = [r for r in rows if r.event_type == "a" and r.day == "ALL"]
        assert len(a_all) == 1 and a_all[0].n == 2
        assert a_all[0].sum_cents == 300


def test_oracle_parity_sf0001(spark):
    path = "/root/testdata/sf0.001/events.parquet"
    got = [
        tuple(r) for r in cube_counts(spark.read.parquet(path)).collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}')"
    )
    want = con.execute(cube_oracle_sql()).fetchall()
    assert got == want and len(got) > 0
