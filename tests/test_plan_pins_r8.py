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


class TestRelationalR8Plans:
    def _tables(self, spark):
        li = spark.createDataFrame(
            [(i, i % 5, i % 3, 10.0 + i, "N" if i % 4 else "R",
              "1996-03-0%d" % (i % 9 + 1))
             for i in range(40)],
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_extendedprice double, l_returnflag string, l_shipdate string",
        ).withColumn("l_shipdate", F.to_date("l_shipdate"))
        part = spark.createDataFrame(
            [(i, f"part{i}", "Brand#1") for i in range(5)],
            "p_partkey long, p_name string, p_brand string",
        )
        supp = spark.createDataFrame(
            [(i, f"supp{i}", i % 2) for i in range(3)],
            "s_suppkey long, s_name string, s_nationkey int",
        )
        nat = spark.createDataFrame(
            [(0, "A"), (1, "B")], "n_nationkey int, n_name string"
        )
        orders = spark.createDataFrame(
            [(i, i % 7, "1996-01-0%d" % (i % 9 + 1), f"{i%3}-P")
             for i in range(40)],
            "o_orderkey long, o_custkey long, o_orderdate string, "
            "o_orderpriority string",
        ).withColumn("o_orderdate", F.to_date("o_orderdate"))
        cust = spark.createDataFrame(
            [(i, f"c{i}", "SEG%d" % (i % 2)) for i in range(7)],
            "c_custkey long, c_name string, c_mktsegment string",
        )
        return li, part, supp, nat, orders, cust

    def test_cheapest_supplier_argmin_has_no_window(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            cheapest_supplier_per_part,
        )

        li, part, supp, nat, _, _ = self._tables(spark)
        plan = _plan(cheapest_supplier_per_part(li, part, supp, nat))
        # the argmin is the map-side-combinable struct-min, NOT a
        # row_number window (which would shuffle-sort the facts)
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan

    def test_priority_late_uses_left_semi(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            priority_late_orders,
        )

        li, _, _, _, orders, _ = self._tables(spark)
        plan = _plan(priority_late_orders(orders, li))
        assert "LeftSemi" in plan

    def test_no_return_customers_uses_semi_and_anti(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            customers_without_returns,
        )

        li, _, _, _, orders, cust = self._tables(spark)
        plan = _plan(customers_without_returns(cust, orders, li))
        assert "LeftSemi" in plan
        assert "LeftAnti" in plan


class TestRelationalR8TailPlans:
    """Pins for the Q12/Q14/Q16/Q19-shape additions. Q19's pushdown
    pin reads real parquet (sf0.001) because PushedFilters only exist
    on a file-source scan."""

    def test_promo_share_is_single_broadcast_join(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            promo_revenue_share,
        )
        from eventhub_to_timescale_spark.sources.testdata import load_table

        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        p = load_table(spark, "/root/testdata/sf0.001", "part")
        plan = _plan(promo_revenue_share(li, p))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # the dim side is pruned to (p_partkey, is_promo) BEFORE the
        # broadcast: no other part column may reach the exchange
        assert "p_type" not in plan.split("BroadcastExchange")[0]

    def test_supplier_variety_anti_join_is_broadcast(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            supplier_variety,
        )
        from eventhub_to_timescale_spark.sources.testdata import load_table

        p = load_table(spark, "/root/testdata/sf0.001", "part")
        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        s = load_table(spark, "/root/testdata/sf0.001", "supplier")
        plan = _plan(supplier_variety(p, li, s))
        assert "LeftAnti" in plan
        assert "BroadcastHashJoin" in plan

    def test_disjunctive_revenue_pushes_union_of_disjuncts(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            disjunctive_revenue,
        )
        from eventhub_to_timescale_spark.sources.testdata import load_table

        li = load_table(spark, "/root/testdata/sf0.001", "lineitem")
        p = load_table(spark, "/root/testdata/sf0.001", "part")
        plan = _plan(disjunctive_revenue(li, p))
        # each side's disjunct union reaches its parquet scan
        assert "PushedFilters" in plan
        assert "LessThanOrEqual(l_quantity" in plan
        assert "In(p_brand" in plan
        # the exact OR-of-ANDs survives as a residual filter
        assert plan.count("Filter") >= 2
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


class TestDedupJoinStrategy:
    """The gram-array dedup paths must never SortMergeJoin: sorting
    kilobyte array payloads through a sorted exchange spilled ~200 GB
    at the 10× sweep.  ShuffledHashJoin builds on the small slice and
    STREAMS the fat side — no sort, no payload-proportional spill."""

    def test_jaccard_verify_joins_are_hash_not_sort(self, spark):
        """r16 shape: the verify joins are UNHINTED (matching the r15
        minhash migration) and the shingle/prefix frames are stage
        boundaries, so the strategy is AQE-chosen from real sizes —
        the assertion covers the AQE-FINAL plan: the gram-array verify
        joins (on doc_a / doc_b) must never sort.  The candidate
        self-join on the scalar gram key may stay sort-merge: its rows
        are narrow (doc_id, gram, s, rn)."""
        from eventhub_to_timescale_spark.operators.dedup import (
            jaccard_prefix_pairs,
        )

        pairs = jaccard_prefix_pairs(_docs(spark), ngram=3)
        pairs.collect()
        whole = _plan(pairs)
        assert "isFinalPlan=true" in whole, whole
        final = whole.split("Initial Plan")[0]
        assert "SortMergeJoin [doc_a" not in final, final
        assert "SortMergeJoin [doc_b" not in final, final
        assert "ShuffledHashJoin" in final or "BroadcastHashJoin" in final

    def test_minhash_band_self_join_is_hash_not_sort(self, spark):
        """r15 shape: the band self-join is UNHINTED (the r8
        shuffle_hash hint was removed once only slim (doc_id, band_id,
        band_key) rows flow through it) — the planner/AQE picks the
        strategy from real sizes — and the shingle-array ATTACH joins
        — statically planned sort-merge — must be converted by AQE at
        runtime (broadcast when the pair side is small, shuffled-hash
        via adaptive.maxShuffledHashJoinLocalMapThreshold otherwise).
        The assertion therefore covers the AQE-FINAL plan only: it
        must never sort an array payload."""
        from eventhub_to_timescale_spark.operators.dedup import (
            minhash_lsh_pairs,
        )

        pairs = minhash_lsh_pairs(_docs(spark))
        # execute THIS Dataset's own query execution (count() would
        # build a separate aggregate plan and leave this one initial)
        pairs.collect()
        whole = _plan(pairs)
        assert "isFinalPlan=true" in whole, whole
        # the adaptive plan string prints the final plan first, then
        # the pre-execution "Initial Plan" (where the statically
        # planned SMJs legitimately appear) — assert on the final only
        final = whole.split("Initial Plan")[0]
        assert "SortMergeJoin" not in final, final
        assert "BroadcastHashJoin" in final or "ShuffledHashJoin" in final
