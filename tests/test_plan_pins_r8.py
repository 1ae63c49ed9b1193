"""Physical-plan pins for the round-8 operator changes: the shapes the
100 TB postures in their docstrings claim. A regression that re-orders
the SimHash Hamming filter behind the dedup exchange, de-hashes the
substring shuffle key, or turns the multi-probe LSH join into a
shuffle fails here, not in a bench rounds later.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _docs(spark):
    rows = [
        (i, ("common boilerplate text block " * 4 + f"unique tail {i}"))
        for i in range(12)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _embs(spark):
    rows = [(i, [float((i * 7 + d) % 13) - 6.0 for d in range(64)]) for i in range(20)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestSimhashPlan:
    def test_hamming_filter_runs_before_dedup_exchange(self, spark):
        from eventhub_to_timescale_spark.operators.dedup import simhash_pairs

        plan = _plan(simhash_pairs(_docs(spark)))
        # the bit_count filter must sit BELOW (execute before) the
        # dropDuplicates exchange so the shuffle carries surviving
        # pairs, not the candidate set. In toString() order, operators
        # print top-down: the doc_a-partitioned exchange appears
        # ABOVE the bit_count filter.
        dedup_xchg = plan.find("Exchange hashpartitioning(doc_a")
        bitcount = plan.find("bit_count")
        assert dedup_xchg != -1, "dedup exchange missing from plan"
        assert bitcount != -1, "hamming filter missing from plan"
        assert dedup_xchg < bitcount, (
            "hamming filter printed above the dedup exchange — the "
            "shuffle is carrying unfiltered candidates"
        )

    def test_no_cartesian_product(self, spark):
        from eventhub_to_timescale_spark.operators.dedup import simhash_pairs

        plan = _plan(simhash_pairs(_docs(spark)))
        assert "Cartesian" not in plan
        assert "BroadcastNestedLoop" not in plan


class TestSubstrdupPlan:
    def test_repeated_windows_shuffles_hashed_key(self, spark):
        from eventhub_to_timescale_spark.operators.substrdup import (
            repeated_windows,
        )

        plan = _plan(repeated_windows(_docs(spark), window=16, stride=8))
        # the groupBy key is the 8-byte xxhash64 (inlined by Catalyst
        # as a _groupingexpression), not the raw window text: every
        # exchange partitions on the grouping expression / doc id,
        # never on the window string column `w`
        assert "xxhash64" in plan
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                keys = line.split("hashpartitioning(", 1)[1]
                assert "w#" not in keys, f"raw window text in shuffle key: {line}"

    def test_spans_join_and_coalesce_shape(self, spark):
        from eventhub_to_timescale_spark.operators.substrdup import (
            repeated_window_spans,
        )

        plan = _plan(
            repeated_window_spans(_docs(spark), window=16, stride=8)
        )
        assert "xxhash64" in plan
        assert "Cartesian" not in plan
        # per-doc island merge: windows + final agg share the doc
        # partitioning — exactly one subject-keyed exchange
        assert plan.count("Exchange hashpartitioning(measurement_subject") <= 1


class TestMultiProbeLshPlan:
    def test_probe_explosion_stays_on_broadcast_side(self, spark):
        from eventhub_to_timescale_spark.operators.similarity import (
            cosine_topk_lsh,
        )

        plan = _plan(
            cosine_topk_lsh(
                _embs(spark), query_max_id=4, k=3, probe_hamming=2
            )
        )
        # candidate generation is a broadcast hash join — the corpus
        # is never shuffled for it, with or without multi-probe
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "Cartesian" not in plan
