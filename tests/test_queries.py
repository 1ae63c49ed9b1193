"""Analytics query library unit tests on tiny hand-built conditions
data — exact expected values (the reference has NO tests for db/*.sql;
this is the strict upgrade promised in SURVEY §5)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from eventhub_to_timescale_spark.operators.asap import asap_core
from eventhub_to_timescale_spark.operators.timeseries import (
    aggregated_by_interval,
    changed_rows,
    most_frequent_value,
    state_intervals,
    unique_subjects,
)
from eventhub_to_timescale_spark.operators.timeweight import time_weighted_average

T0 = datetime(2024, 1, 1)


def _cond(spark, rows):
    return spark.createDataFrame(
        rows,
        "timestamp timestamp, measurement_subject string, "
        "measurement_publisher string, measurement_of string, "
        "measurement_number double, measurement_string string, "
        "measurement_bool boolean, measurement_location string, "
        "correlation_id string, measurement_unique_id long",
    )


def _row(ts, subj="s1", of="temp", num=None, s=None, uid=0):
    return (ts, subj, "pub", of, num, s, None, None, "c", uid)


def test_q1_bucket_average(spark):
    df = _cond(
        spark,
        [
            _row(datetime(2024, 1, 1, 0, 10), num=1.0),
            _row(datetime(2024, 1, 1, 0, 20), num=3.0),
            _row(datetime(2024, 1, 1, 1, 10), num=10.0),
            _row(datetime(2024, 1, 1, 1, 50), num=20.0),
            _row(datetime(2024, 1, 1, 0, 15), subj="other", num=100.0),
        ],
    )
    out = aggregated_by_interval(
        df, "s1", "temp", T0, datetime(2024, 1, 2), 3600
    ).collect()
    assert [(r.time, r.avg_value) for r in out] == [
        (datetime(2024, 1, 1, 0), 2.0),
        (datetime(2024, 1, 1, 1), 15.0),
    ]


def test_q4_deterministic_mode_tie_break(spark):
    df = _cond(
        spark,
        [
            _row(datetime(2024, 1, 1, 0, 0, 1), of="state", s="b", uid=1),
            _row(datetime(2024, 1, 1, 0, 0, 2), of="state", s="a", uid=2),
            _row(datetime(2024, 1, 1, 0, 0, 40), of="state", s="a", uid=3),
            _row(datetime(2024, 1, 1, 0, 0, 41), of="state", s="b", uid=4),
        ],
    )
    out = most_frequent_value(
        df, "s1", "state", T0, datetime(2024, 1, 1, 1)
    ).collect()
    # one 60-s bucket, tie between a(2) and b(2) → smallest value wins
    assert [(r.time, r.most_common_value) for r in out] == [
        (datetime(2024, 1, 1), "a")
    ]


def test_q5_locf_semantics(spark):
    # bucket [0, 3600): samples at t=0 (v=10) and t=1800 (v=20)
    # LOCF: 10×1800 + 20×1800 over 3600 → 15
    df = _cond(
        spark,
        [
            _row(datetime(2024, 1, 1, 0, 0), num=10.0),
            _row(datetime(2024, 1, 1, 0, 30), num=20.0),
        ],
    )
    out = time_weighted_average(
        df, "s1", "temp", T0, datetime(2024, 1, 1, 1), "locf", resolution=1
    ).collect()
    assert out[0].time_weighted_value == pytest.approx(15.0)


def test_q5_linear_semantics(spark):
    # trapezoid between (0,10) and (1800s,20) → 15 over span 1800
    df = _cond(
        spark,
        [
            _row(datetime(2024, 1, 1, 0, 0), num=10.0),
            _row(datetime(2024, 1, 1, 0, 30), num=20.0),
        ],
    )
    out = time_weighted_average(
        df, "s1", "temp", T0, datetime(2024, 1, 1, 1), "linear", resolution=1
    ).collect()
    assert out[0].time_weighted_value == pytest.approx(15.0)


def test_q5_single_sample_bucket_is_value(spark):
    df = _cond(spark, [_row(datetime(2024, 1, 1, 0, 10), num=7.0)])
    for method in ("locf", "linear"):
        out = time_weighted_average(
            df, "s1", "temp", T0, datetime(2024, 1, 1, 1), method, resolution=1
        ).collect()
        assert out[0].time_weighted_value == pytest.approx(7.0)


def test_q7_unique_subjects(spark):
    df = _cond(
        spark,
        [
            _row(datetime(2024, 1, 1, 1), subj="b", of="state", s="x"),
            _row(datetime(2024, 1, 1, 2), subj="a", of="state", s="y"),
            _row(datetime(2024, 1, 1, 3), subj="b", of="state", s="z"),
            _row(datetime(2024, 1, 1, 3), subj="c", of="other", s="w"),
        ],
    )
    out = unique_subjects(df, "state", T0, datetime(2024, 1, 2)).collect()
    assert [r.measurement_subject for r in out] == ["a", "b"]


def test_q8_changepoints_null_safe(spark):
    rows = [
        _row(datetime(2024, 1, 1, 0), of="state", s="on", uid=1),
        _row(datetime(2024, 1, 1, 1), of="state", s="on", uid=2),
        _row(datetime(2024, 1, 1, 2), of="state", s=None, uid=3),
        _row(datetime(2024, 1, 1, 3), of="state", s=None, uid=4),
        _row(datetime(2024, 1, 1, 4), of="state", s="off", uid=5),
    ]
    out = changed_rows(
        _cond(spark, rows), "s1", "state", T0, datetime(2024, 1, 2)
    ).collect()
    assert [(r.timestamp.hour, r.value) for r in out] == [
        (0, "on"),
        (2, None),
        (4, "off"),
    ]


def test_q9_state_intervals_close_open_end(spark):
    rows = [
        _row(datetime(2024, 1, 1, 0), of="state", s="heat", uid=1),
        _row(datetime(2024, 1, 1, 6), of="state", s="idle", uid=2),
    ]
    close = datetime(2024, 1, 2)
    out = state_intervals(
        _cond(spark, rows), "s1", "state", T0, close, close_at=close
    ).collect()
    assert [(r.time.hour, r.timeEnd, r.value) for r in out] == [
        (0, datetime(2024, 1, 1, 6), "heat"),
        (6, close, "idle"),
    ]


def test_lttb_core_preserves_endpoints_and_spikes():
    import numpy as np

    from eventhub_to_timescale_spark.operators.asap import lttb_core

    rng = np.random.RandomState(3)
    v = rng.normal(0, 0.1, size=2000)
    v[777] = 50.0  # spike the triangle test must keep
    t = np.arange(2000).astype(float)
    t2, v2 = lttb_core(t, v, 100)
    assert len(v2) == 100
    assert t2[0] == 0 and t2[-1] == 1999  # endpoints kept
    assert v2.max() == 50.0  # spike survives


def test_lttb_downsample_dataframe(spark):
    from datetime import timedelta

    from eventhub_to_timescale_spark.operators.asap import lttb_downsample

    rows = [
        _row(T0 + timedelta(minutes=i), num=float(i % 7)) for i in range(500)
    ]
    df = _cond(spark, rows)
    out = lttb_downsample(
        df, "s1", "temp", T0, datetime(2024, 1, 2), resolution=50
    ).collect()
    assert 3 <= len(out) <= 50
    assert out[0].time == T0  # first point preserved


def test_asap_core_reduces_roughness_preserving_spikes():
    # ASAP's constraint is kurtosis preservation: smoothing must keep
    # outliers visible. A spiky noisy series is the target case —
    # noise gets smoothed away, spikes survive.
    import numpy as np

    rng = np.random.RandomState(7)
    v = rng.normal(0, 0.3, size=2000)
    v[::200] += 10.0  # outlier spikes → high kurtosis
    t = np.arange(2000)
    _, sm = asap_core(t, v, resolution=500)
    assert len(sm) <= 500
    assert np.std(np.diff(sm)) < np.std(np.diff(v))
    assert sm.max() > 1.0  # spikes not erased


def test_asap_core_no_oversmoothing_without_outliers():
    # for a plain noisy sine the kurtosis constraint correctly rejects
    # aggressive windows; output must still be bounded by resolution
    import numpy as np

    rng = np.random.RandomState(7)
    t = np.arange(2000)
    v = np.sin(t / 50.0) + rng.normal(0, 0.4, size=2000)
    t2, sm = asap_core(t, v, resolution=500)
    assert len(sm) <= 500 and len(t2) == len(sm)


def test_q8_null_valued_first_row_dropped(spark):
    # reference `IS DISTINCT FROM prev`: first row's prev is NULL, so a
    # NULL-valued first row is NOT a change point (ADVICE r1 parity fix)
    rows = [
        _row(datetime(2024, 1, 1, 0), of="state", s=None, uid=1),
        _row(datetime(2024, 1, 1, 1), of="state", s="on", uid=2),
    ]
    out = changed_rows(
        _cond(spark, rows), "s1", "state", T0, datetime(2024, 1, 2)
    ).collect()
    assert [(r.timestamp.hour, r.value) for r in out] == [(1, "on")]


def test_q4_counts_nulls_and_emits_null_mode_bucket(spark):
    # phase-1 COUNT(*) includes NULL strings (reference counts the raw
    # slice), and a bucket holding only NULL strings still emits a row
    # with a NULL mode (PG mode() ignores nulls but the group exists)
    rows = [
        _row(datetime(2024, 1, 1, 0, 0, 1), of="state", s=None, uid=1),
        _row(datetime(2024, 1, 1, 0, 1, 1), of="state", s="a", uid=2),
        _row(datetime(2024, 1, 1, 0, 1, 2), of="state", s=None, uid=3),
        _row(datetime(2024, 1, 1, 0, 1, 3), of="state", s=None, uid=4),
    ]
    out = most_frequent_value(
        _cond(spark, rows), "s1", "state", T0, datetime(2024, 1, 1, 1)
    ).collect()
    # bucket 00:00 → only NULLs → NULL mode; bucket 00:01 → 'a' wins
    # over the more frequent NULL group (nulls rank last)
    assert [(r.time.minute, r.most_common_value) for r in out] == [
        (0, None),
        (1, "a"),
    ]


def test_q4_bucket_width_rounds_to_whole_seconds():
    from eventhub_to_timescale_spark.plans.adaptive import (
        adaptive_mode_bucket_seconds,
    )

    start = datetime(2024, 1, 1)
    # span 1000 s / 360 = 2.777… → reference's integer assignment
    # rounds to 3 s (numeric→int, ties away from zero)
    end = datetime(2024, 1, 1, 0, 16, 40)
    assert adaptive_mode_bucket_seconds(361, start, end) == 3.0
    assert adaptive_mode_bucket_seconds(360, start, end) == 60.0


def test_asap_lttb_pandas_stage_is_grid_bounded(spark):
    """The groupBy(lit(1)) funnel into a single pandas task is safe
    ONLY because the resolution×4 pre-aggregation bounds its input
    (VERDICT r1: keep that invariant tested). Pin the plan shape: a
    HashAggregate (the grid) must sit below FlatMapGroupsInPandas, and
    the output never exceeds the resolution."""
    from pyspark.sql import functions as F

    from eventhub_to_timescale_spark.operators.asap import (
        asap_smooth,
        lttb_downsample,
    )

    n = 50_000
    cond = spark.range(n).select(
        F.timestamp_seconds(
            F.lit(1704067200) + F.col("id") * 50
        ).alias("timestamp"),
        F.lit("s1").alias("measurement_subject"),
        F.lit("value").alias("measurement_of"),
        (F.col("id") % 97).cast("double").alias("measurement_number"),
    )
    start, end = datetime(2024, 1, 1), datetime(2024, 2, 1)
    for op, res in ((asap_smooth, 40), (lttb_downsample, 40)):
        df = op(cond, "s1", "value", start, end, resolution=res)
        plan = df._jdf.queryExecution().executedPlan().toString()
        pandas_pos = plan.find("FlatMapGroupsInPandas")
        assert pandas_pos != -1
        # at least one aggregate strictly below the pandas stage (plan
        # trees print top-down, so "below" = later in the string)
        assert "HashAggregate" in plan[pandas_pos:]
        assert df.count() <= res


def test_degenerate_spans_never_zero_bucket():
    from eventhub_to_timescale_spark.plans.adaptive import (
        adaptive_mode_bucket_seconds,
        daily_branch_bucket_seconds,
        resolution_bucket_seconds,
    )

    t = datetime(2024, 1, 1)
    # start == end → every helper must clamp, not emit a 0-width
    # bucket (epoch/0 would NULL every bucket key downstream)
    assert resolution_bucket_seconds(t, t, 200) == 1.0
    assert daily_branch_bucket_seconds(t, t) == 1.0
    # dense short slice: >360 rows over <180 s rounded to 0 before
    assert adaptive_mode_bucket_seconds(500, t, datetime(2024, 1, 1, 0, 2)) == 1.0


def test_q9_tied_timestamps_pair_deterministically(spark):
    # two change rows at the SAME timestamp: the (value, timeEnd)
    # pairing must follow the uid tie-break, not partition luck
    rows = [
        _row(datetime(2024, 1, 1, 0), of="state", s="a", uid=1),
        _row(datetime(2024, 1, 1, 0), of="state", s="b", uid=2),
        _row(datetime(2024, 1, 1, 2), of="state", s="c", uid=3),
    ]
    close = datetime(2024, 1, 2)
    out = state_intervals(
        _cond(spark, rows), "s1", "state", T0, close, close_at=close
    ).collect()
    assert [(r.value, r.time.hour, r.timeEnd) for r in out] == [
        ("a", 0, datetime(2024, 1, 1, 0)),  # zero-length, uid 1 first
        ("b", 0, datetime(2024, 1, 1, 2)),
        ("c", 2, close),
    ]


def test_q8_q9_salted_equivalence_property(spark):
    """The chunked (salted) window rewrite must be row-identical to the
    vanilla subject-partitioned window — including a hot subject that
    dominates the data, NULL-value runs, timestamp ties, and chunk
    sizes that force many boundary repairs (chunk_seconds=1 puts
    nearly every row in its own chunk)."""
    import random

    from eventhub_to_timescale_spark.operators.timeseries import (
        changed_rows,
        changed_rows_salted,
        state_intervals,
        state_intervals_salted,
    )

    rng = random.Random(42)
    rows = []
    uid = 0
    for i in range(400):
        subj = "hot" if rng.random() < 0.5 else f"s{rng.randrange(5)}"
        # coarse timestamps force ties; values include NULL runs
        ts = datetime(2024, 3, 1, 0, 0) + timedelta(seconds=rng.randrange(120))
        val = rng.choice(["a", "b", "b", None, None, "c"])
        rows.append((ts, subj, "state", val, str(uid), uid))
        uid += 1
    cond = spark.createDataFrame(
        rows,
        "timestamp timestamp, measurement_subject string, "
        "measurement_of string, measurement_string string, "
        "correlation_id string, measurement_unique_id long",
    )
    start, end = datetime(2024, 3, 1), datetime(2024, 3, 2)
    close = datetime(2024, 3, 2)

    for chunk_seconds in (1, 7, 86400):
        a = changed_rows(cond, None, "state", start, end).collect()
        b = changed_rows_salted(
            cond, None, "state", start, end, chunk_seconds=chunk_seconds
        ).collect()
        key = lambda t: tuple(map(repr, t))
        assert sorted(map(tuple, a), key=key) == sorted(
            map(tuple, b), key=key
        ), chunk_seconds

        ia = state_intervals(
            cond, None, "state", start, end, close_at=close
        ).collect()
        ib = state_intervals_salted(
            cond, None, "state", start, end, close_at=close,
            chunk_seconds=chunk_seconds,
        ).collect()
        assert sorted(map(tuple, ia), key=key) == sorted(
            map(tuple, ib), key=key
        ), chunk_seconds


def test_salted_auto_chunk_responds_to_measured_skew(spark):
    """chunk_seconds="auto" (r13 verdict ask #3): the CMS skew profile
    must SIZE the salt — a hot subject holding half the slice yields a
    factor > 1 (chunk narrower than the span ⇒ the straggler splits),
    a balanced slice yields factor 1 (one chunk ⇒ the unsalted plan) —
    and the auto result stays row-identical to the vanilla window."""
    import random

    from eventhub_to_timescale_spark.operators.timeseries import (
        _auto_chunk_seconds,
        _slice,
        changed_rows,
        changed_rows_salted,
        state_intervals,
        state_intervals_salted,
    )

    rng = random.Random(97)
    span_s = 3600
    start, end = datetime(2024, 3, 1), datetime(2024, 3, 1, 1)

    def _cond(hot_share):
        rows = []
        for uid in range(600):
            subj = (
                "hot" if rng.random() < hot_share
                else f"s{rng.randrange(40)}"
            )
            ts = datetime(2024, 3, 1) + timedelta(
                seconds=rng.randrange(span_s)
            )
            val = rng.choice(["a", "b", None, "c"])
            rows.append((ts, subj, "state", val, str(uid), uid))
        return spark.createDataFrame(
            rows,
            "timestamp timestamp, measurement_subject string, "
            "measurement_of string, measurement_string string, "
            "correlation_id string, measurement_unique_id long",
        )

    skewed = _cond(0.5)
    balanced = _cond(0.0)
    # explicit parallelism: the test session runs 4 shuffle
    # partitions, where a 600-row slice's fair share is so large no
    # key trips the ratio — the cluster-shaped question is 32 tasks
    auto_skew = _auto_chunk_seconds(
        _slice(skewed, None, "state", start, end), start, end,
        parallelism=32,
    )
    auto_flat = _auto_chunk_seconds(
        _slice(balanced, None, "state", start, end), start, end,
        parallelism=32,
    )
    # widths come from the OBSERVED data span (r14 review fix: a wide
    # query over a narrow extent must not defeat the salt), so compare
    # against the data's own extent, not the query window
    assert auto_skew <= auto_flat / 4, "hot subject must shrink the chunk"
    assert auto_flat > span_s - 60, "balanced slice must stay one chunk"

    # the query-window independence the fix is FOR: the same skewed
    # data probed through a 5x wider query window must still split
    wide_end = datetime(2024, 3, 1, 5)
    auto_wide = _auto_chunk_seconds(
        _slice(skewed, None, "state", start, wide_end), start, wide_end,
        parallelism=32,
    )
    assert auto_wide == auto_skew, "query width leaked into the chunk"

    key = lambda t: tuple(map(repr, t))
    a = changed_rows(skewed, None, "state", start, end).collect()
    b = changed_rows_salted(skewed, None, "state", start, end).collect()
    assert sorted(map(tuple, a), key=key) == sorted(map(tuple, b), key=key)
    close = datetime(2024, 3, 2)
    ia = state_intervals(
        skewed, None, "state", start, end, close_at=close
    ).collect()
    ib = state_intervals_salted(
        skewed, None, "state", start, end, close_at=close
    ).collect()
    assert sorted(map(tuple, ia), key=key) == sorted(map(tuple, ib), key=key)


def test_rollup_additivity_and_query_rewrite(spark):
    """Continuous-rollup invariants: (1) cascaded rollups are exactly
    re-aggregations (additivity), (2) an aligned Q1 answered from the
    rollup equals the raw-scan answer, (3) misalignment is refused."""
    import random

    from eventhub_to_timescale_spark.operators.rollup import (
        bucket_avg_from_rollup,
        rollup_cascade,
        rollup_conditions,
    )
    from eventhub_to_timescale_spark.operators.timeseries import (
        aggregated_by_interval,
    )

    rng = random.Random(11)
    rows = []
    for i in range(2000):
        ts = datetime(2024, 1, 1) + timedelta(seconds=rng.randrange(4 * 86400))
        rows.append(
            (ts, f"s{rng.randrange(3)}", "pub", "temp",
             round(rng.uniform(-5, 40), 3), None, None, None, str(i), i)
        )
    cond = _cond(spark, rows)
    start, end = datetime(2024, 1, 1), datetime(2024, 1, 5)

    fine = rollup_conditions(cond, bucket_seconds=3600)
    coarse = rollup_cascade(fine, 3600, 6)
    direct = rollup_conditions(cond, bucket_seconds=21600)
    key = lambda r: (r.measurement_subject, r.measurement_of, r.bucket_time)
    a = {key(r): (r.n, round(r.sum_value, 9), r.min_value, r.max_value)
         for r in coarse.collect()}
    b = {key(r): (r.n, round(r.sum_value, 9), r.min_value, r.max_value)
         for r in direct.collect()}
    assert a == b  # cascade == direct rollup (additivity)

    got = bucket_avg_from_rollup(
        fine, 3600, "s1", "temp", start, end, 21600
    ).collect()
    want = aggregated_by_interval(
        cond, "s1", "temp", start, end, 21600
    ).collect()
    assert [(r.time, round(r.avg_value, 6)) for r in got] == [
        (r.time, round(r.avg_value, 6)) for r in want
    ]

    with pytest.raises(ValueError):
        bucket_avg_from_rollup(fine, 3600, "s1", "temp", start, end, 5400)


def test_asof_join_semantics(spark):
    from eventhub_to_timescale_spark.operators.asof import asof_join

    cond = _cond(
        spark,
        [
            _row(datetime(2024, 1, 1, 0, 0), num=1.0, uid=1),
            _row(datetime(2024, 1, 1, 0, 10), num=2.0, uid=2),
            _row(datetime(2024, 1, 1, 0, 20), num=3.0, uid=3),
            _row(datetime(2024, 1, 1, 0, 5), subj="s2", num=9.0, uid=4),
        ],
    )
    probes = spark.createDataFrame(
        [
            (1, "s1", datetime(2024, 1, 1, 0, 10)),   # == measurement ts -> 2.0
            (2, "s1", datetime(2024, 1, 1, 0, 15)),   # between -> 2.0
            (3, "s1", datetime(2023, 12, 31)),        # before all -> NULL
            (4, "s2", datetime(2024, 1, 1, 1, 0)),    # other subject -> 9.0
            (5, "s3", datetime(2024, 1, 1)),          # unknown subject -> NULL
        ],
        "probe_id long, measurement_subject string, probe_time timestamp",
    )
    out = {r.probe_id: r for r in asof_join(probes, cond, "temp").collect()}
    assert out[1].asof_value == 2.0  # >= semantics: simultaneous row visible
    assert out[2].asof_value == 2.0
    assert out[3].asof_value is None and out[3].asof_time is None
    assert out[4].asof_value == 9.0
    assert out[5].asof_value is None
    assert len(out) == 5  # left-join: every probe survives

    # tolerance: probe 4 is 55 min after its match -> nulled at 600 s
    tol = {r.probe_id: r for r in asof_join(probes, cond, "temp", 600).collect()}
    assert tol[4].asof_value is None
    assert tol[1].asof_value == 2.0  # 0 s stale, kept


def test_overlap_join_blocking_is_exact(spark):
    """Bucketed range join == brute-force theta join on every edge
    case: touching endpoints (half-open: no overlap), containment,
    bucket-boundary straddles, empty intervals, cross-subject."""
    import random

    from eventhub_to_timescale_spark.operators.rangejoin import overlap_join

    rng = random.Random(5)

    def mk(n, offset):
        rows = []
        for i in range(n):
            s = datetime(2024, 1, 1) + timedelta(
                seconds=rng.randrange(48 * 3600)
            )
            dur = rng.choice([0, 60, 3600, 7200, 86400])
            rows.append(
                (offset + i, f"s{rng.randrange(3)}", s, s + timedelta(seconds=dur))
            )
        return spark.createDataFrame(
            rows,
            "interval_id long, measurement_subject string, "
            "start timestamp, end timestamp",
        )

    left, right = mk(120, 0), mk(120, 1000)
    # collect both sides ONCE: a `for r in right.collect()` inner loop
    # re-runs the Spark action per left row (120 jobs per bucket size —
    # measured 163 s for a test whose real work is ~9 s)
    left_rows, right_rows = left.collect(), right.collect()
    for bucket_seconds in (600, 3600, 86400):
        got = {
            (r.measurement_subject, r.l_id, r.r_id,
             r.overlap_start, r.overlap_end)
            for r in overlap_join(left, right, bucket_seconds).collect()
        }
        brute = {
            (l.measurement_subject, l.interval_id, r.interval_id,
             max(l.start, r.start), min(l.end, r.end))
            for l in left_rows
            for r in right_rows
            if l.measurement_subject == r.measurement_subject
            # [s,s) is the empty set: overlaps nothing (the raw
            # predicate would treat it as a point)
            and l.start < l.end and r.start < r.end
            and l.start < r.end and r.start < l.end
        }
        assert got == brute, bucket_seconds
    assert len(brute) > 50  # the case actually exercises overlaps


def test_bucket_gapfill_policies(spark):
    from eventhub_to_timescale_spark.operators.gapfill import bucket_gapfill

    cond = _cond(
        spark,
        [
            _row(datetime(2024, 1, 1, 1, 10), num=10.0, uid=1),
            _row(datetime(2024, 1, 1, 1, 20), num=20.0, uid=2),  # same bucket
            _row(datetime(2024, 1, 1, 4, 5), num=40.0, uid=3),
        ],
    )
    start, end = datetime(2024, 1, 1), datetime(2024, 1, 1, 6)

    dense = bucket_gapfill(cond, "s1", "temp", start, end, 3600, fill=None)
    rows = dense.collect()
    assert len(rows) == 6  # every bucket of [start, end) present
    vals = [r.value for r in rows]
    assert vals == [None, 15.0, None, None, 40.0, None]

    locf = [r.value for r in bucket_gapfill(
        cond, "s1", "temp", start, end, 3600, fill="locf").collect()]
    assert locf == [None, 15.0, 15.0, 15.0, 40.0, 40.0]

    lin = [r.value for r in bucket_gapfill(
        cond, "s1", "temp", start, end, 3600, fill="linear").collect()]
    # between observations at buckets 1 (15.0) and 4 (40.0):
    # bucket 2 -> 15 + 25/3, bucket 3 -> 15 + 50/3; outside -> NULL
    assert lin[0] is None and lin[5] is None
    assert lin[1] == 15.0 and lin[4] == 40.0
    assert lin[2] == pytest.approx(23.333333, abs=1e-6)
    assert lin[3] == pytest.approx(31.666667, abs=1e-6)

    with pytest.raises(ValueError):
        bucket_gapfill(cond, "s1", "temp", start, end, 3600, fill="cubic")


def test_journey_ngrams_semantics(spark):
    """Ordered per-user paths, completeness filter, distinct-traveller
    ranking, lexicographic tie-break."""
    from eventhub_to_timescale_spark.operators.trending import (
        journey_ngrams,
    )

    rows = [
        # user 1: a b c a b c  -> a>b>c x2, b>c>a x1, c>a>b x1
        (1, 1, "2024-01-01 00:00:00", "a"),
        (2, 1, "2024-01-01 00:01:00", "b"),
        (3, 1, "2024-01-01 00:02:00", "c"),
        (4, 1, "2024-01-01 00:03:00", "a"),
        (5, 1, "2024-01-01 00:04:00", "b"),
        (6, 1, "2024-01-01 00:05:00", "c"),
        # user 2: a b c       -> a>b>c x1 (second traveller)
        (7, 2, "2024-01-01 00:00:00", "a"),
        (8, 2, "2024-01-01 00:01:00", "b"),
        (9, 2, "2024-01-01 00:02:00", "c"),
        # user 3: only 2 events -> no complete trigram
        (10, 3, "2024-01-01 00:00:00", "x"),
        (11, 3, "2024-01-01 00:01:00", "y"),
    ]
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = [(r["path"], r["n_users"], r["n_occurrences"])
           for r in journey_ngrams(ev, n=3, k=10).collect()]
    assert got[0] == ("a>b>c", 2, 3)
    # remaining single-traveller paths tie on counts -> lexicographic
    assert got[1:] == [("b>c>a", 1, 1), ("c>a>b", 1, 1)]
    assert all("x" not in p for p, _, _ in got)


def test_journey_ngrams_rejects_bad_params(spark):
    import pytest

    from eventhub_to_timescale_spark.operators.trending import (
        journey_ngrams,
    )

    ev = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string"
    )
    with pytest.raises(ValueError):
        journey_ngrams(ev, n=1)
    with pytest.raises(ValueError):
        journey_ngrams(ev, k=0)
