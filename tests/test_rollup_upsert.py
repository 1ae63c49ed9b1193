"""rollup_upsert (operators/rollup.py): the additivity invariant —
folding a late batch into an existing rollup equals rebuilding from
scratch — plus the plan shape that makes it an INCREMENTAL operation
(the big rollup never shuffles; both key probes are broadcast).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F


def _conditions(spark, n=500):
    base = datetime(2024, 1, 1)
    rows = [
        (
            base + timedelta(minutes=7 * i),
            "user_%d" % (i % 5),
            "value",
            i,
            round(100.0 + (i * 37 % 997) / 10.0, 2),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows,
        "timestamp timestamp, measurement_subject string, "
        "measurement_of string, measurement_unique_id long, "
        "measurement_number double",
    )


def _normalized(df):
    return sorted(
        (
            r["measurement_subject"],
            r["measurement_of"],
            r["bucket_time"],
            r["n"],
            round(r["sum_value"], 6),
            r["min_value"],
            r["max_value"],
        )
        for r in df.collect()
    )


class TestRollupUpsert:
    def test_merge_equals_rebuild(self, spark):
        from eventhub_to_timescale_spark.operators.rollup import (
            rollup_conditions,
            rollup_upsert,
        )

        cond = _conditions(spark)
        late_mask = F.col("measurement_unique_id") % 7 == 0
        base = rollup_conditions(cond.filter(~late_mask), 3600)
        merged = rollup_upsert(base, cond.filter(late_mask), 3600)
        rebuilt = rollup_conditions(cond, 3600)
        assert _normalized(merged) == _normalized(rebuilt)

    def test_late_only_buckets_appear(self, spark):
        """A bucket whose EVERY row is late must still show up in the
        merged rollup (the semi probe finds nothing to merge with)."""
        from eventhub_to_timescale_spark.operators.rollup import (
            rollup_conditions,
            rollup_upsert,
        )

        cond = _conditions(spark, n=50)
        # everything in the last hour arrives late
        cutoff = datetime(2024, 1, 1, 3, 0)
        base = rollup_conditions(
            cond.filter(F.col("timestamp") < F.lit(cutoff)), 3600
        )
        merged = rollup_upsert(
            base, cond.filter(F.col("timestamp") >= F.lit(cutoff)), 3600
        )
        rebuilt = rollup_conditions(cond, 3600)
        assert _normalized(merged) == _normalized(rebuilt)
        assert merged.count() > base.count()

    def test_untouched_rows_pass_through_unchanged(self, spark):
        """Buckets with no late rows must be byte-identical to the
        base rollup (not re-aggregated — their sums keep the original
        accumulation)."""
        from eventhub_to_timescale_spark.operators.rollup import (
            rollup_conditions,
            rollup_upsert,
        )

        cond = _conditions(spark)
        late = cond.filter(F.col("measurement_unique_id") == 3)
        base = rollup_conditions(
            cond.filter(F.col("measurement_unique_id") != 3), 3600
        )
        merged = rollup_upsert(base, late, 3600)
        [late_row] = late.collect()
        touched_bucket = late_row["timestamp"].replace(minute=0, second=0)
        base_rows = {
            (r["measurement_subject"], r["bucket_time"]): r["sum_value"]
            for r in base.collect()
        }
        for r in merged.collect():
            key = (r["measurement_subject"], r["bucket_time"])
            if not (
                key[0] == late_row["measurement_subject"]
                and key[1] == touched_bucket
            ):
                assert r["sum_value"] == base_rows[key]

    def test_rollup_side_never_shuffles(self, spark):
        from eventhub_to_timescale_spark.operators.rollup import (
            rollup_conditions,
            rollup_upsert,
        )

        cond = _conditions(spark)
        late_mask = F.col("measurement_unique_id") % 7 == 0
        base = rollup_conditions(cond.filter(~late_mask), 3600)
        plan = (
            rollup_upsert(base, cond.filter(late_mask), 3600)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # both probes broadcast the tiny touched-key set
        assert plan.count("BroadcastHashJoin") >= 2
        assert "SortMergeJoin" not in plan
        # the only hash exchanges belong to aggregates (base rollup,
        # late partials, merge) — none keyed by the anti/semi probes
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "bucket_time" in line or "timestamp" not in line
