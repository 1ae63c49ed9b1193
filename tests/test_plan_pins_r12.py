"""Physical-plan pins for the round-12 operators: gear CDC's
zero-shuffle Arrow chunking stage, the Bloom probe's broadcast bit
join, the CMS join-size estimator's broadcast inner product, quantile
bands' shared (type, day) partitioning — and, everywhere, the absence
of cartesian products.
"""

from __future__ import annotations


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    rows = [
        (i, ("the quick brown fox jumps over the lazy dog " * 4) + str(i))
        for i in range(10)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _events(spark):
    from datetime import datetime

    rows = [
        (i, datetime(2024, 1, 1 + i // 24, i % 24), i % 5, "t",
         float(i % 7))
        for i in range(48)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


class TestGearCdcPlan:
    def test_chunking_is_shuffle_free_arrow(self, spark):
        """gear_chunks is projection-only per-row work: one
        MapInPandas stage, NO exchange before it (chunking must never
        shuffle the corpus)."""
        from eventhub_to_timescale_spark.operators.cdcchunk import (
            gear_chunks,
        )

        plan = _plan(gear_chunks(_docs(spark)))
        assert "MapInPandas" in plan
        # the only exchange in the whole plan is the final orderBy's
        # range partitioning — nothing hash-partitions the raw text
        assert "hashpartitioning" not in plan
        assert "Cartesian" not in plan

    def test_dup_verdicts_single_chunk_hash_shuffle(self, spark):
        """cdc_dup_verdicts: owner aggregation is map-side combined
        (partial+final HashAggregate on chunk_hash) and the plan has
        no cartesian product."""
        from eventhub_to_timescale_spark.operators.cdcchunk import (
            cdc_dup_verdicts,
        )

        plan = _plan(cdc_dup_verdicts(_docs(spark)))
        assert "Cartesian" not in plan
        assert plan.count("MapInPandas") >= 1


class TestBloomPlan:
    def test_bits_join_broadcasts(self, spark):
        """The ≤ m bit frame must broadcast to the probe fan — the
        k×|probe| position rows never shuffle for the membership
        join."""
        from eventhub_to_timescale_spark.operators.bloom import (
            bloom_probe,
        )

        ref = spark.createDataFrame(
            [(f"k{i}",) for i in range(50)], "key string"
        )
        probe = spark.createDataFrame(
            [(f"p{i}",) for i in range(50)], "key string"
        )
        plan = _plan(bloom_probe(ref, probe))
        assert "BroadcastHashJoin" in plan
        assert "Cartesian" not in plan


class TestCmsJoinSizePlan:
    def test_inner_product_broadcasts_and_no_cartesian(self, spark):
        from eventhub_to_timescale_spark.operators.sketches import (
            cms_join_size,
        )

        ev = _events(spark)
        plan = _plan(cms_join_size(ev, ev))
        assert "BroadcastHashJoin" in plan
        # the one permitted BroadcastNestedLoopJoin is the final
        # one-row × one-row est/exact crossJoin
        assert "Cartesian" not in plan


class TestQuantileBandsPlan:
    def test_windows_share_one_partitioning(self, spark):
        """Both window functions and the final groupBy key on
        (event_type, day): exactly ONE hash exchange on that pair —
        the windows and the aggregation reuse the same shuffle."""
        from eventhub_to_timescale_spark.operators.quantband import (
            quantile_bands,
        )

        plan = _plan(quantile_bands(_events(spark)))
        n_pair_exchanges = plan.count(
            "hashpartitioning(event_type"
        )
        assert n_pair_exchanges == 1, plan[:2000]
        assert "Cartesian" not in plan
