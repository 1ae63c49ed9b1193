"""Round-8 second relational batch (Q7/Q13/Q15/Q17 shapes): edge
semantics the oracle diff can't isolate (zero-order customers, argmax
ties) plus physical-plan pins for the 100 TB postures the docstrings
claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _tables(spark):
    li = spark.createDataFrame(
        [
            (i, i % 5, i % 3, 1.0 + i % 4, 100.0 + i, 0.05, "1996-02-0%d" % (i % 9 + 1))
            for i in range(40)
        ],
        "l_orderkey long, l_partkey long, l_suppkey long, l_quantity double, "
        "l_extendedprice double, l_discount double, l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
    orders = spark.createDataFrame(
        [(i, i % 7, "%d-P" % (i % 3 + 1)) for i in range(40)],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    cust = spark.createDataFrame(
        [(i, "c%d" % i, i % 2) for i in range(9)],
        "c_custkey long, c_name string, c_nationkey int",
    )
    supp = spark.createDataFrame(
        [(i, "s%d" % i, i % 2) for i in range(3)],
        "s_suppkey long, s_name string, s_nationkey int",
    )
    nat = spark.createDataFrame(
        [(0, "A"), (1, "B")], "n_nationkey int, n_name string"
    )
    part = spark.createDataFrame(
        [(i, "p%d" % i, "Brand#%d" % (i % 3 + 1)) for i in range(5)],
        "p_partkey long, p_name string, p_brand string",
    )
    return li, orders, cust, supp, nat, part


class TestOrderDistribution:
    def test_zero_order_customers_counted(self, spark):
        """Customers with NO orders (or only excluded-priority orders)
        must appear in the order_count=0 bucket — the outer-join
        semantics the fact-first aggregation has to preserve."""
        from eventhub_to_timescale_spark.operators.relational import (
            customer_order_distribution,
        )

        cust = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "c_custkey long, c_name string"
        )
        orders = spark.createDataFrame(
            [(10, 1, "2-HIGH"), (11, 1, "2-HIGH"), (12, 2, "1-URGENT")],
            "o_orderkey long, o_custkey long, o_orderpriority string",
        )
        got = {
            (r["order_count"], r["n_customers"])
            for r in customer_order_distribution(cust, orders).collect()
        }
        # cust 1 → 2 orders; cust 2 → only an excluded order → 0; cust 3 → 0
        assert got == {(2, 1), (0, 2)}

    def test_fact_aggregates_before_join(self, spark):
        """The orders aggregate must be a child of (execute before)
        the outer join — no per-order customer-row replication."""
        from eventhub_to_timescale_spark.operators.relational import (
            customer_order_distribution,
        )

        _, orders, cust, _, _, _ = _tables(spark)
        df = customer_order_distribution(
            cust.select("c_custkey", "c_name"), orders
        )
        plan = _plan(df)
        assert "Window" not in plan
        join_at = min(
            i for i in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"))
            if i != -1
        )
        # partial count agg on o_custkey prints BELOW the join node
        agg_at = plan.find("partial_count", join_at)
        assert agg_at != -1 and agg_at > join_at


class TestTopSupplier:
    def test_all_ties_kept(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            top_supplier,
        )

        li = spark.createDataFrame(
            [
                (1, 1, 10.0, 100.00, 0.00, "1996-02-01"),
                (2, 2, 10.0, 60.00, 0.00, "1996-02-01"),
                (3, 2, 10.0, 40.00, 0.00, "1996-02-01"),
                (4, 3, 10.0, 999.00, 0.00, "1990-01-01"),  # outside range
            ],
            "l_orderkey long, l_suppkey long, l_quantity double, "
            "l_extendedprice double, l_discount double, l_shipdate string",
        ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
        supp = spark.createDataFrame(
            [(1, "s1", 0), (2, "s2", 0), (3, "s3", 0)],
            "s_suppkey long, s_name string, s_nationkey int",
        )
        got = [
            (r["s_suppkey"], r["total_revenue"])
            for r in top_supplier(li, supp).collect()
        ]
        # suppliers 1 and 2 tie at 100.00 inside the window; 3's line
        # is date-pruned
        assert got == [(1, 100.0), (2, 100.0)]

    def test_argmax_is_broadcast_scalar_not_window(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            top_supplier,
        )

        li, _, _, supp, _, _ = _tables(spark)
        plan = _plan(top_supplier(li, supp))
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan
        assert "Cartesian" not in plan


class TestCrossNationVolume:
    def test_direction_matters(self, spark):
        """(supp A → cust B) and (supp B → cust A) are DISTINCT output
        groups; same-nation traffic is excluded."""
        from eventhub_to_timescale_spark.operators.relational import (
            cross_nation_volume,
        )

        li = spark.createDataFrame(
            [
                (1, 1, 1.0, 100.0, 0.0, "1996-02-01"),  # supp A, cust B
                (2, 2, 1.0, 200.0, 0.0, "1996-02-01"),  # supp B, cust A
                (3, 1, 1.0, 400.0, 0.0, "1996-02-01"),  # supp A, cust A — excluded
            ],
            "l_orderkey long, l_suppkey long, l_quantity double, "
            "l_extendedprice double, l_discount double, l_shipdate string",
        ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
        orders = spark.createDataFrame(
            [(1, 1), (2, 2), (3, 2)], "o_orderkey long, o_custkey long"
        )
        cust = spark.createDataFrame(
            [(1, "x", 1), (2, "y", 0)],
            "c_custkey long, c_name string, c_nationkey int",
        )
        supp = spark.createDataFrame(
            [(1, "s1", 0), (2, "s2", 1)],
            "s_suppkey long, s_name string, s_nationkey int",
        )
        nat = spark.createDataFrame(
            [(0, "A"), (1, "B")], "n_nationkey int, n_name string"
        )
        got = {
            (r["supp_nation"], r["cust_nation"], r["l_year"], r["revenue"])
            for r in cross_nation_volume(
                li, orders, cust, supp, nat, "A", "B"
            ).collect()
        }
        assert got == {("A", "B", 1996, 100.0), ("B", "A", 1996, 200.0)}

    def test_nation_dims_broadcast(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            cross_nation_volume,
        )

        li, orders, cust, supp, nat, _ = _tables(spark)
        plan = _plan(cross_nation_volume(li, orders, cust, supp, nat, "A", "B"))
        assert "Cartesian" not in plan
        assert "BroadcastNestedLoop" not in plan
        assert "BroadcastHashJoin" in plan


class TestSmallQuantityRevenue:
    def test_integer_threshold_semantics(self, spark):
        """qty·den·cnt < num·sum_qty — a line exactly AT the fraction
        boundary is excluded (strict <), and the per-part average
        covers only the brand's slice."""
        from eventhub_to_timescale_spark.operators.relational import (
            small_quantity_revenue,
        )

        li = spark.createDataFrame(
            [
                # part 1 (Brand#1): qtys 1, 9 → avg 5; 1/5·avg = 1 →
                # qty 1 is NOT < 1·10/ (5·2)=1 → excluded (boundary)
                (1, 1, 1.0, 50.0, 0.0, "1996-02-01"),
                (2, 1, 9.0, 70.0, 0.0, "1996-02-01"),
                # part 2 (Brand#1): qtys 1, 99 → avg 50; 1 < 10 → kept
                (3, 2, 1.0, 30.0, 0.0, "1996-02-01"),
                (4, 2, 99.0, 80.0, 0.0, "1996-02-01"),
                # part 3 (Brand#2) — pruned by brand
                (5, 3, 1.0, 999.0, 0.0, "1996-02-01"),
            ],
            "l_orderkey long, l_partkey long, l_quantity double, "
            "l_extendedprice double, l_discount double, l_shipdate string",
        ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))
        part = spark.createDataFrame(
            [(1, "p1", "Brand#1"), (2, "p2", "Brand#1"), (3, "p3", "Brand#2")],
            "p_partkey long, p_name string, p_brand string",
        )
        [row] = small_quantity_revenue(li, part).collect()
        assert row["avg_yearly"] == round(30.0 / 7.0, 6)

    def test_per_part_avg_join_is_broadcast(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            small_quantity_revenue,
        )

        li, _, _, _, _, part = _tables(spark)
        plan = _plan(small_quantity_revenue(li, part))
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


class TestRevenueRollup:
    def test_rollup_levels_and_totals(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            revenue_rollup,
        )

        rows = [
            (1, "1-URGENT", 10.50, "1996-03-01"),
            (2, "1-URGENT", 20.00, "1997-05-02"),
            (3, "2-HIGH", 5.25, "1996-07-09"),
        ]
        orders = spark.createDataFrame(
            rows, "o_orderkey long, o_orderpriority string, "
                  "o_totalprice double, o_orderdate string"
        ).withColumn("o_orderdate", __import__("pyspark.sql.functions",
                     fromlist=["F"]).to_timestamp("o_orderdate"))
        got = {(r["o_orderpriority"], r["order_year"]):
               (r["total_revenue"], r["n_orders"])
               for r in revenue_rollup(orders).collect()}
        # leaves
        assert got[("1-URGENT", 1996)] == (10.50, 1)
        assert got[("1-URGENT", 1997)] == (20.00, 1)
        assert got[("2-HIGH", 1996)] == (5.25, 1)
        # per-priority subtotals (year NULL)
        assert got[("1-URGENT", None)] == (30.50, 2)
        assert got[("2-HIGH", None)] == (5.25, 1)
        # grand total
        assert got[(None, None)] == (35.75, 3)
        assert len(got) == 6

    def test_single_expand_aggregate_plan(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            revenue_rollup,
        )
        from pyspark.sql import functions as F

        orders = spark.createDataFrame(
            [(1, "P", 1.0)], "o_orderkey long, o_orderpriority string, "
                             "o_totalprice double"
        ).withColumn("o_orderdate", F.to_timestamp(F.lit("1996-01-01")))
        plan = (revenue_rollup(orders)
                ._jdf.queryExecution().executedPlan().toString())
        # one Expand feeding one aggregation pipeline — no union of
        # per-level scans
        assert plan.count("Expand") == 1
        assert "Union" not in plan
