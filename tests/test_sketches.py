"""Semantic edge cases for the sketch/approx-aggregate family
(operators/sketches.py) — HLL distinct, GK percentile, saturating
histogram, gauge delta.  Cross-engine parity is covered by
check_parity; these pin tolerance semantics and boundary behaviour
directly on tiny hand-built frames.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.sketches import (
    approx_distinct_concordance,
    approx_percentile_concordance,
    gauge_delta,
    value_histogram,
)

T0 = datetime(2024, 1, 1)


def _conditions(spark, rows):
    """rows: (subject, minutes-from-T0, of, value, uid)"""
    return spark.createDataFrame(
        [
            (s, T0 + timedelta(minutes=m), of,
             None if v is None else float(v), uid)
            for s, m, of, v, uid in rows
        ],
        "measurement_subject string, timestamp timestamp, "
        "measurement_of string, measurement_number double, "
        "measurement_unique_id long",
    )


class TestApproxDistinct:
    def test_small_cardinality_is_exact_and_concordant(self, spark):
        rows = [
            (f"s{i % 7}", i, "value", 1.0, i) for i in range(50)
        ] + [(f"s{i % 3}", i, "temp", 1.0, 100 + i) for i in range(9)]
        out = {
            r["measurement_of"]: r
            for r in approx_distinct_concordance(
                _conditions(spark, rows)
            ).collect()
        }
        assert out["value"]["exact_distinct"] == 7
        assert out["temp"]["exact_distinct"] == 3
        assert all(r["within_tolerance"] for r in out.values())


class TestApproxPercentile:
    def test_median_concordant_on_skewed_gaps(self, spark):
        # thin density right at the median — the case that broke a
        # value-space tolerance: adjacent samples jump 10 → 40
        vals = [1, 2, 3, 4, 10, 40, 46, 47, 48, 49]
        rows = [("a", i, "value", v, i) for i, v in enumerate(vals)]
        out = approx_percentile_concordance(
            _conditions(spark, rows), rank_tolerance=0.12
        ).collect()
        assert len(out) == 1
        assert out[0]["exact_q"] == pytest.approx(25.0)  # (10+40)/2
        assert out[0]["within_tolerance"]

    def test_null_values_excluded(self, spark):
        rows = [("a", 0, "value", 5.0, 0), ("a", 1, "value", None, 1)]
        out = approx_percentile_concordance(_conditions(spark, rows)).collect()
        assert out[0]["exact_q"] == pytest.approx(5.0)
        assert out[0]["within_tolerance"]

    def test_envelope_must_stay_in_unit_interval(self, spark):
        with pytest.raises(ValueError):
            approx_percentile_concordance(
                _conditions(spark, []), q=0.99, rank_tolerance=0.05
            )


class TestValueHistogram:
    def test_saturating_edges_and_widths(self, spark):
        rows = [
            ("a", 0, "value", -5.0, 0),   # underflow -> bin 0
            ("a", 1, "value", 0.0, 1),    # bin 0
            ("a", 2, "value", 9.99, 2),   # bin 0 (width 10)
            ("a", 3, "value", 10.0, 3),   # bin 1
            ("a", 4, "value", 95.0, 4),   # bin 9
            ("a", 5, "value", 100.0, 5),  # overflow -> bin 9
            ("a", 6, "value", 1e6, 6),    # overflow -> bin 9
        ]
        out = {
            r["bin"]: r
            for r in value_histogram(
                _conditions(spark, rows), "value", 0.0, 100.0, 10
            ).collect()
        }
        assert out[0]["n"] == 3 and out[0]["bin_lo"] == 0.0
        assert out[1]["n"] == 1 and out[1]["bin_lo"] == 10.0
        assert out[9]["n"] == 3 and out[9]["bin_lo"] == 90.0
        assert set(out) == {0, 1, 9}  # empty bins absent

    def test_bad_config_refused(self, spark):
        df = _conditions(spark, [])
        with pytest.raises(ValueError):
            value_histogram(df, "value", 0.0, 100.0, 0)
        with pytest.raises(ValueError):
            value_histogram(df, "value", 5.0, 5.0, 10)


class TestGaugeDelta:
    def test_last_minus_first_no_reset_heuristic(self, spark):
        # gauge falls 100 -> 7: delta is -93, NOT counter-style +7
        rows = [
            ("a", 0, "value", 100.0, 1),
            ("a", 30, "value", 42.0, 2),
            ("a", 60, "value", 7.0, 3),
        ]
        out = gauge_delta(_conditions(spark, rows), "value", 86400).collect()
        assert len(out) == 1
        assert out[0]["gauge_delta"] == pytest.approx(-93.0)

    def test_uid_breaks_timestamp_ties(self, spark):
        # same timestamp, uid orders: first=(t,1)=5, last=(t,9)=11
        rows = [
            ("a", 0, "value", 5.0, 1),
            ("a", 0, "value", 8.0, 4),
            ("a", 0, "value", 11.0, 9),
        ]
        out = gauge_delta(_conditions(spark, rows), "value", 86400).collect()
        assert out[0]["gauge_delta"] == pytest.approx(6.0)

    def test_buckets_are_independent(self, spark):
        rows = [
            ("a", 0, "value", 1.0, 1),
            ("a", 10, "value", 4.0, 2),      # day 1: +3
            ("a", 1440, "value", 10.0, 3),
            ("a", 1450, "value", 2.0, 4),    # day 2: -8
        ]
        out = sorted(
            gauge_delta(_conditions(spark, rows), "value", 86400).collect(),
            key=lambda r: r["time"],
        )
        assert [r["gauge_delta"] for r in out] == [
            pytest.approx(3.0),
            pytest.approx(-8.0),
        ]


class TestPortableHll:
    def _conds(self, spark, n, of="value"):
        from datetime import datetime

        return spark.createDataFrame(
            [(of, f"subj_{i}", datetime(2024, 1, 1)) for i in range(n)],
            "measurement_of string, measurement_subject string, "
            "timestamp timestamp",
        )

    def test_estimate_tracks_exact_within_sketch_error(self, spark):
        from eventhub_to_timescale_spark.operators.sketches import (
            hll_distinct_portable,
        )

        n = 5000
        r = hll_distinct_portable(self._conds(spark, n)).collect()[0]
        # m=256 → relative error ~1.04/sqrt(256) = 6.5%; allow 3σ
        assert abs(r["est_distinct"] - n) / n < 0.20

    def test_linear_counting_branch_small_cardinality(self, spark):
        import math

        from eventhub_to_timescale_spark.operators.sketches import (
            hll_distinct_portable,
        )

        out = hll_distinct_portable(self._conds(spark, 10)).collect()[0]
        # ≤10 distinct hit ≤10 buckets → raw << 2.5m → linear counting
        nz = out["nonzero_registers"]
        expect = round(256.0 * math.log(256.0 / (256 - nz)), 4)
        assert out["est_distinct"] == expect
        assert abs(out["est_distinct"] - 10) < 2

    def test_duplicates_do_not_move_registers(self, spark):
        from eventhub_to_timescale_spark.operators.sketches import (
            hll_distinct_portable,
        )

        once = hll_distinct_portable(self._conds(spark, 100)).collect()[0]
        tripled = hll_distinct_portable(
            self._conds(spark, 100).union(self._conds(spark, 100)).union(
                self._conds(spark, 100)
            )
        ).collect()[0]
        assert (once["nonzero_registers"], once["est_distinct"]) == (
            tripled["nonzero_registers"],
            tripled["est_distinct"],
        )

    def test_python_estimator_matches_spark_formula(self, spark):
        """hll_estimate_py (the streaming path's finalizer) agrees
        with the Spark-expression estimate on the same registers."""
        from eventhub_to_timescale_spark.operators.sketches import (
            HLL_M,
            HLL_SEED,
            hll_distinct_portable,
            hll_estimate_py,
        )
        import hashlib

        n = 700
        regs = [0] * HLL_M
        for i in range(n):
            h = int(
                hashlib.md5(
                    (HLL_SEED + f"subj_{i}").encode()
                ).hexdigest()[:8],
                16,
            )
            b, rem = h & (HLL_M - 1), h >> 8
            rho = 25 - rem.bit_length() if rem else 25
            regs[b] = max(regs[b], rho)
        spark_est = hll_distinct_portable(
            self._conds(spark, n)
        ).collect()[0]["est_distinct"]
        assert hll_estimate_py(regs) == spark_est

    def test_union_merge_equals_direct_union(self, spark):
        """Register max over per-stream frames == hashing the union
        directly (mergeability)."""
        from eventhub_to_timescale_spark.operators.sketches import (
            hll_distinct_portable,
            hll_union_estimate,
        )

        a = self._conds(spark, 300, of="a")
        b = self._conds(spark, 400, of="b")  # overlapping subjects
        both = a.union(b)
        merged = hll_union_estimate(both).collect()[0]
        direct = hll_distinct_portable(
            both.withColumn("measurement_of", F.lit("all"))
        ).collect()[0]
        assert merged["nonzero_registers"] == direct["nonzero_registers"]
        assert merged["est_distinct"] == direct["est_distinct"]


class TestCountMin:
    """Portable count-min sketch (operators/sketches.py:cms_cells /
    cms_frequency_estimates): cell-sum mergeability, the est ≥ exact
    invariant, and the broadcast-probe plan shape."""

    def _events(self, spark, n=500, mod=37):
        return spark.range(n).select(
            (F.col("id") % mod).alias("user_id")
        )

    def test_estimate_upper_bounds_exact(self, spark):
        from eventhub_to_timescale_spark.operators.sketches import (
            cms_frequency_estimates,
        )

        out = cms_frequency_estimates(
            self._events(spark), key_col="user_id", w=16
        ).collect()
        assert len(out) == 37
        assert all(r.est_count >= r.exact_count for r in out)
        # w=16 < 37 keys forces collisions: at least one true over-est
        assert any(r.est_count > r.exact_count for r in out)
        # total mass per row-hash is conserved, so min-cell est is
        # bounded by exact + N/w * d safety margin (loose sanity)
        assert all(r.est_count <= r.exact_count + 500 for r in out)

    def test_cells_merge_by_sum(self, spark):
        """CMS over a union == per-shard cell frames summed per cell —
        the rollup/streaming merge property, bit-for-bit."""
        from eventhub_to_timescale_spark.operators.sketches import (
            cms_cells,
        )

        ev = self._events(spark, 600)
        a = ev.filter(F.col("user_id") % 2 == 0)
        b = ev.filter(F.col("user_id") % 2 == 1)
        merged = (
            cms_cells(a, "user_id")
            .unionByName(cms_cells(b, "user_id"))
            .groupBy("j", "bucket")
            .agg(F.sum("c").alias("c"))
        )
        direct = cms_cells(ev, "user_id")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_probe_join_is_broadcast(self, spark):
        """The ≤ d·w cell matrix must broadcast to the probe — no
        shuffle keyed on the (unbounded) key column ever happens."""
        from eventhub_to_timescale_spark.operators.sketches import (
            cms_frequency_estimates,
        )

        plan = (
            cms_frequency_estimates(self._events(spark))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestCmsJoinSize:
    """CMS inner-product join-size estimate (Cormode & Muthukrishnan
    §4.2): overestimate guarantee, exactness without collisions,
    self-join semantics, zero-overlap floor, oracle parity."""

    def _df(self, spark, keys):
        return spark.createDataFrame(
            [(k,) for k in keys], "user_id long"
        )

    def test_estimate_never_underestimates(self, spark):
        from eventhub_to_timescale_spark.operators.sketches import (
            cms_join_size,
        )
        import random

        rng = random.Random(3)
        a = self._df(spark, [rng.randrange(40) for _ in range(500)])
        b = self._df(spark, [rng.randrange(60) for _ in range(400)])
        row = cms_join_size(a, b, w=16).collect()[0]
        assert row["est_rows"] >= row["exact_rows"] > 0

    def test_exact_when_no_collisions(self, spark):
        """With w far above the key cardinality, no two keys share a
        bucket in any row and the inner product IS the join size."""
        from eventhub_to_timescale_spark.operators.sketches import (
            cms_join_size,
        )

        a = self._df(spark, [1, 1, 2, 3, 3, 3])
        b = self._df(spark, [1, 3, 3, 4])
        row = cms_join_size(a, b, w=4096).collect()[0]
        # exact: 1 appears 2x1, 3 appears 3x2 -> 2 + 6 = 8
        assert row["exact_rows"] == 8
        assert row["est_rows"] == 8

    def test_self_join_size(self, spark):
        from eventhub_to_timescale_spark.operators.sketches import (
            cms_join_size,
        )

        a = self._df(spark, [1, 1, 1, 2, 2, 3])
        row = cms_join_size(a, a, w=4096).collect()[0]
        assert row["exact_rows"] == 9 + 4 + 1

    def test_disjoint_keys_zero(self, spark):
        from eventhub_to_timescale_spark.operators.sketches import (
            cms_join_size,
        )

        a = self._df(spark, [1, 2, 3])
        b = self._df(spark, [100, 200])
        row = cms_join_size(a, b, w=4096).collect()[0]
        assert row["exact_rows"] == 0
        assert row["est_rows"] == 0  # no bucket collisions at this w

    def test_matches_duckdb_oracle(self, spark):
        import random

        import duckdb

        from eventhub_to_timescale_spark.operators.sketches import (
            cms_join_size,
            cms_join_size_oracle_sql,
        )

        rng = random.Random(11)
        akeys = [rng.randrange(50) for _ in range(600)]
        bkeys = [rng.randrange(80) for _ in range(300)]
        # small w so collisions occur and the estimator actually
        # exercises the min-of-inner-products path
        got = [
            tuple(r)
            for r in cms_join_size(
                self._df(spark, akeys), self._df(spark, bkeys), w=16
            ).collect()
        ]
        con = duckdb.connect()
        con.execute("CREATE TABLE ta (user_id BIGINT)")
        con.execute("CREATE TABLE tb (user_id BIGINT)")
        con.executemany("INSERT INTO ta VALUES (?)", [(k,) for k in akeys])
        con.executemany("INSERT INTO tb VALUES (?)", [(k,) for k in bkeys])
        want = con.execute(
            cms_join_size_oracle_sql(
                "SELECT user_id FROM ta", "SELECT user_id FROM tb", w=16
            )
        ).fetchall()
        assert got == [tuple(x) for x in want]
        assert got[0][0] >= got[0][1]
