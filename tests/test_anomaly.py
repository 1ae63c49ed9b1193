"""MAD outlier semantics (operators/anomaly.py): robustness to
extreme points, exact thresholds, broadcast plan shape."""

from __future__ import annotations

import pytest

from eventhub_to_timescale_spark.operators.anomaly import mad_outliers


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, value double"
    )


def test_flags_only_the_spike(spark):
    # median=5, deviations [4,1,0,1,4,995] -> MAD=2.5 -> cut 7.5
    rows = [(i, "a", v) for i, v in
            enumerate([1.0, 4.0, 5.0, 6.0, 9.0, 1000.0])]
    got = mad_outliers(_ev(spark, rows)).collect()
    assert [(r["event_id"], r["value"]) for r in got] == [(5, 1000.0)]


def test_robust_where_zscore_fails(spark):
    # one 1e9 spike inflates stddev so a plain 3-sigma rule flags
    # NOTHING; MAD still isolates the spike
    vals = [10.0, 11.0, 12.0, 13.0, 14.0, 1e9]
    import statistics

    mean, sd = statistics.mean(vals), statistics.pstdev(vals)
    assert not any(abs(v - mean) > 3 * sd for v in vals)  # z fails
    rows = [(i, "a", v) for i, v in enumerate(vals)]
    got = mad_outliers(_ev(spark, rows)).collect()
    assert {r["event_id"] for r in got} == {5}


def test_groups_independent(spark):
    rows = [(i, "a", float(v)) for i, v in enumerate([1, 2, 3, 2, 100])]
    rows += [(10 + i, "b", float(v)) for i, v in
             enumerate([100, 101, 102, 101, 1])]
    got = mad_outliers(_ev(spark, rows)).collect()
    assert {r["event_id"] for r in got} == {4, 14}


def test_zero_mad_flags_any_deviation(spark):
    # constant group: MAD=0, any different value is an outlier
    rows = [(i, "a", 5.0) for i in range(5)] + [(9, "a", 5.0001)]
    got = mad_outliers(_ev(spark, rows)).collect()
    assert {r["event_id"] for r in got} == {9}


def test_rejects_negative_k(spark):
    with pytest.raises(ValueError):
        mad_outliers(_ev(spark, [(1, "a", 1.0)]), k=-1)


def test_plan_broadcasts_both_stats(spark):
    df = _ev(spark, [(i, "ab"[i % 2], float(i)) for i in range(20)])
    # lazy form (stage=False): both stats joins are in the action
    # plan — every stats join against the fact scan must broadcast;
    # the fact table itself is never shuffled for a join
    plan = (
        mad_outliers(df, stage=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # staged form (default): the fitted stats frame is a boundary
    # leaf, so the action plan holds exactly the one scoring join —
    # still broadcast, still no fact-side shuffle
    staged = (
        mad_outliers(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in staged
    assert "SortMergeJoin" not in staged
    assert staged.count("median") == 0  # aggregations ran at the boundary


def test_staged_equals_lazy(spark):
    rows = [(i, "abc"[i % 3], float((i * 7) % 23)) for i in range(60)]
    rows += [(100, "a", 1e6), (101, "b", -1e6)]
    df = _ev(spark, rows)
    staged = {tuple(r) for r in mad_outliers(df).collect()}
    lazy = {tuple(r) for r in mad_outliers(df, stage=False).collect()}
    assert staged == lazy and staged  # same verdicts, non-empty
