"""Sketch-driven join planning (operators/joinplan.py): the CMS
join-size estimator driving a real plan decision (r12 verdict ask
#7).  Pins BOTH branches changing the executed plan — broadcast
advice ⇒ BroadcastHashJoin in the physical plan, salt advice ⇒ the
join keys gain the _salt fan — plus the profile's one-sided
guarantees and salted-join row-identity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.joinplan import (
    _salt_frames,
    apply_join_strategy,
    choose_join_strategy,
    choose_salt_factor,
    join_size_profile,
    key_profile,
)


def _skewed(spark, hot=4000, cold_keys=200):
    """One white-hot key (0) plus uniform cold keys."""
    rows = [(0, i) for i in range(hot)] + [
        (1 + i % cold_keys, i) for i in range(cold_keys * 3)
    ]
    return spark.createDataFrame(rows, "user_id long, payload long")


def _uniform(spark, n_keys=500, per_key=4):
    rows = [(k, i) for k in range(n_keys) for i in range(per_key)]
    return spark.createDataFrame(rows, "user_id long, payload long")


class TestProfile:
    def test_counts_exact_and_estimates_one_sided(self, spark):
        left = _skewed(spark, hot=300, cold_keys=50)
        right = _uniform(spark, n_keys=100, per_key=2)
        row = join_size_profile(
            left, right, "user_id", "user_id"
        ).collect()[0]
        n_l, n_r = left.count(), right.count()
        assert row.n_left == n_l and row.n_right == n_r
        # one-sided: est_max >= true heaviest key, est_join >= exact
        true_max_l = (
            left.groupBy("user_id").count().agg(F.max("count")).collect()[0][0]
        )
        exact_join = left.join(right, "user_id").count()
        assert row.est_max_key_left >= true_max_l
        assert row.est_join_rows >= exact_join


class TestAdvice:
    def test_small_dim_advises_broadcast(self, spark):
        fact = _uniform(spark, n_keys=400, per_key=5)
        dim = _uniform(spark, n_keys=50, per_key=1)
        adv = choose_join_strategy(fact, dim, broadcast_rows=1000)
        assert adv.strategy == "broadcast_right"
        assert adv.salt_factor == 1

    def test_skew_advises_salt(self, spark):
        left = _skewed(spark, hot=4000, cold_keys=100)
        right = _uniform(spark, n_keys=101, per_key=2)
        adv = choose_join_strategy(
            left, right, broadcast_rows=0, parallelism=32
        )
        assert adv.strategy == "salt"
        assert adv.salt_factor >= 2
        # the signal is the sketch's heavy-key overestimate
        assert adv.est_max_key_left >= 4000

    def test_uniform_advises_shuffle(self, spark):
        left = _uniform(spark, n_keys=600, per_key=3)
        right = _uniform(spark, n_keys=600, per_key=2)
        adv = choose_join_strategy(
            left, right, broadcast_rows=0, parallelism=32
        )
        assert adv.strategy == "shuffle"
        assert adv.salt_factor == 1

    def test_bad_thresholds_raise(self, spark):
        df = _uniform(spark, 5, 1)
        with pytest.raises(ValueError):
            choose_join_strategy(df, df, skew_ratio=0)
        with pytest.raises(ValueError):
            choose_join_strategy(df, df, max_salt=0)


class TestSaltFactor:
    """choose_salt_factor (r13 verdict ask #3): the one-sided CMS
    profile sizing the salt for the window/agg family AQE can't
    split."""

    def test_profile_one_sided(self, spark):
        df = _skewed(spark, hot=300, cold_keys=50)
        row = key_profile(df, "user_id").collect()[0]
        assert row.n == df.count()
        assert row.est_max_key >= 300  # one-sided overestimate

    def test_factor_responds_to_skew(self, spark):
        hot = _skewed(spark, hot=4000, cold_keys=100)
        factor = choose_salt_factor(hot, "user_id", parallelism=32)
        assert factor >= 2
        # the factor tracks the straggler's share: est_max / share
        row = key_profile(hot, "user_id").collect()[0]
        share = max(row.n / 32, 1.0)
        assert factor <= 64 and factor >= min(64, row.est_max_key / share / 2)

    def test_factor_one_on_balanced_keys(self, spark):
        flat = _uniform(spark, n_keys=600, per_key=3)
        assert choose_salt_factor(flat, "user_id", parallelism=32) == 1

    def test_factor_one_on_balanced_moderate_cardinality(self, spark):
        """r14 review finding: at the gate-demo CMS width (w=64) a
        BALANCED key space of ~128 keys reads as skewed — bucket
        collisions floor est_max at ~n/28 while the true max is
        n/128, tripping the ratio at parallelism 200.  The salt
        profile's default width (SALT_PROFILE_W) must keep the
        'balanced key returns 1' guarantee at exactly this shape."""
        flat = _uniform(spark, n_keys=128, per_key=8)  # n=1024
        assert choose_salt_factor(flat, "user_id", parallelism=200) == 1

    def test_bad_thresholds_raise(self, spark):
        df = _uniform(spark, 5, 1)
        with pytest.raises(ValueError):
            choose_salt_factor(df, "user_id", skew_ratio=0)
        with pytest.raises(ValueError):
            choose_salt_factor(df, "user_id", max_salt=0)

    def test_auto_chunk_empty_frame_returns_one(self, spark):
        """An empty slice (min/max ts NULL) must yield a harmless
        width, not crash the salted plan construction."""
        from eventhub_to_timescale_spark.operators.joinplan import (
            auto_chunk_seconds,
        )

        empty = spark.createDataFrame(
            [], "user_id long, ts timestamp"
        )
        assert auto_chunk_seconds(empty, "ts", "user_id") == 1

    def test_auto_chunk_one_chunk_on_balanced_moderate_cardinality(
        self, spark
    ):
        """r14 ADVICE #1: auto_chunk_seconds re-profiled at the
        gate-demo width (w=64) instead of SALT_PROFILE_W and
        duplicated the decision rule, so a balanced key space beyond
        ~64 distinct keys tripped the skew line (est_max floored at
        ~n/28 > 4·n/200) and silently chunk-split balanced data on
        the default chunk_seconds='auto' paths.  Mirror of
        test_factor_one_on_balanced_moderate_cardinality through the
        chunk sizer: 128 balanced keys at parallelism 200 must yield
        factor 1 ⇒ ONE chunk covering the whole span."""
        from eventhub_to_timescale_spark.operators.joinplan import (
            auto_chunk_seconds,
        )

        flat = _uniform(spark, n_keys=128, per_key=8).withColumn(
            "ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("payload")),
        )
        width = auto_chunk_seconds(
            flat, "ts", "user_id", parallelism=200
        )
        span = 7  # payload 0..7 within each key -> max-min = 7 s
        assert width >= span  # factor 1: one chunk spans the data

    def test_auto_chunk_precomputed_factor_skips_probe(self, spark):
        """r14 ADVICE #3: a caller with a precomputed skew factor
        (choose_salt_factor on a sample, a prior run) passes
        factor= and only the span aggregate runs.  The width must
        equal ceil(span / factor) exactly, and a bad factor raises."""
        from eventhub_to_timescale_spark.operators.joinplan import (
            auto_chunk_seconds,
        )

        flat = _uniform(spark, n_keys=16, per_key=8).withColumn(
            "ts",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("payload")),
        )
        # span = 7 s; factor 4 -> ceil(7/4) = 2
        assert auto_chunk_seconds(flat, "ts", "user_id", factor=4) == 2
        assert auto_chunk_seconds(flat, "ts", "user_id", factor=1) == 7
        with pytest.raises(ValueError):
            auto_chunk_seconds(flat, "ts", "user_id", factor=0)

    def test_factor_rule_is_shared(self):
        """The decision rule lives in ONE place (_salt_factor_from);
        the two sketch-width copies drifted once (r14 ADVICE #1) and
        must not exist to drift again."""
        import inspect

        from eventhub_to_timescale_spark.operators import joinplan

        for fn in (joinplan.choose_salt_factor, joinplan.auto_chunk_seconds):
            src = inspect.getsource(fn)
            assert "_salt_factor_from" in src
            assert "skew_ratio * share" not in src  # no inline copy


class TestExecutedPlans:
    def test_broadcast_advice_changes_plan(self, spark):
        fact = _uniform(spark, n_keys=400, per_key=5)
        dim = _uniform(spark, n_keys=50, per_key=1)
        adv = choose_join_strategy(fact, dim, broadcast_rows=1000)
        joined = apply_join_strategy(fact, dim, adv)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert joined.count() == fact.join(dim, "user_id").count()

    def test_salt_advice_changes_plan_and_preserves_rows(self, spark):
        left = _skewed(spark, hot=4000, cold_keys=100)
        right = _uniform(spark, n_keys=101, per_key=2)
        adv = choose_join_strategy(
            left, right, broadcast_rows=0, parallelism=32
        )
        assert adv.strategy == "salt"
        joined = apply_join_strategy(left, right, adv)
        plan = joined._jdf.queryExecution().analyzed().toString()
        assert "_salt" in plan  # the join key genuinely changed
        plain = left.join(right, left.user_id == right.user_id)
        assert joined.count() == plain.count()

    def test_right_skew_salts_the_right_side(self, spark):
        """r13 ADVICE (medium): the salt path used to always salt the
        LEFT side, so under right-side skew the hot key's right rows
        were copied into every salt partition — the straggler stayed
        whole while shuffle volume grew ×factor.  Pin that (a) the
        advice names the side whose est_max tripped the ratio, (b) the
        salt fan genuinely SPLITS that side's hot key across sub-keys,
        and (c) output rows stay identical to the plain join."""
        left = _uniform(spark, n_keys=101, per_key=2)
        right = _skewed(spark, hot=4000, cold_keys=100)
        adv = choose_join_strategy(
            left, right, broadcast_rows=0, parallelism=32
        )
        assert adv.strategy == "salt"
        assert adv.salt_side == "right"
        assert adv.est_max_key_right >= 4000
        salted, fanned = _salt_frames(right, left, adv.salt_factor)
        hot_salts = (
            salted.filter(F.col("user_id") == 0)
            .select("_salt")
            .distinct()
            .count()
        )
        assert hot_salts > 1, "hot key not split — straggler survives"
        joined = apply_join_strategy(left, right, adv)
        plain = left.join(right, left.user_id == right.user_id)
        assert joined.count() == plain.count()

    def test_left_skew_salt_side_is_left(self, spark):
        left = _skewed(spark, hot=4000, cold_keys=100)
        right = _uniform(spark, n_keys=101, per_key=2)
        adv = choose_join_strategy(
            left, right, broadcast_rows=0, parallelism=32
        )
        assert adv.strategy == "salt"
        assert adv.salt_side == "left"

    def test_shuffle_advice_is_plain_equijoin(self, spark):
        left = _uniform(spark, n_keys=600, per_key=3)
        right = _uniform(spark, n_keys=600, per_key=2)
        adv = choose_join_strategy(
            left, right, broadcast_rows=0, parallelism=32
        )
        joined = apply_join_strategy(left, right, adv)
        plan = joined._jdf.queryExecution().analyzed().toString()
        assert "_salt" not in plan
        assert joined.count() == 600 * 3 * 2


class TestExplosive:
    def test_explosive_join_flagged_before_commit(self, spark):
        """A join whose estimated output dwarfs its inputs gets
        flagged from the sketch alone — the pre-commit answer a
        planner wants at 100 TB.  One-sided estimate ⇒ a genuinely
        explosive join can never be missed."""
        # every row shares ONE key: output = 2000*2000 = 4M from 4k
        # inputs
        left = spark.createDataFrame(
            [(7, i) for i in range(2000)], "user_id long, payload long"
        )
        right = spark.createDataFrame(
            [(7, i) for i in range(2000)], "user_id long, r long"
        )
        adv = choose_join_strategy(
            left, right, broadcast_rows=0, parallelism=32
        )
        assert adv.explosive
        assert adv.est_join_rows >= 4_000_000

    def test_benign_join_not_flagged(self, spark):
        left = _uniform(spark, n_keys=300, per_key=2)
        right = _uniform(spark, n_keys=300, per_key=2)
        adv = choose_join_strategy(
            left, right, broadcast_rows=0, parallelism=32, w=4096
        )
        assert not adv.explosive


def test_profile_matches_duckdb_oracle_sf0001(spark):
    """The gated surface: same md5 cell rule in both engines —
    side counts exact, estimates bit-identical."""
    import duckdb

    from eventhub_to_timescale_spark.operators.joinplan import (
        join_size_profile_oracle_sql,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    od = spark.read.parquet(f"{sf}/orders.parquet")
    got = [
        tuple(r)
        for r in join_size_profile(ev, od, "user_id", "o_custkey").collect()
    ]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'")
    want = [
        tuple(r)
        for r in con.execute(
            join_size_profile_oracle_sql(
                "SELECT user_id FROM events",
                "SELECT o_custkey FROM orders",
                "user_id",
                "o_custkey",
            )
        ).fetchall()
    ]
    assert got == want and len(got) == 1
