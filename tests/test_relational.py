"""Semantic tests for the relational star-schema queries
(operators/relational.py) on tiny hand-built frames — integer-cents
exactness, filter edges, and deterministic top-k ties.  Cross-engine
parity runs in check_parity / test_gate_tail_parity.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.relational import (
    large_quantity_orders,
    pricing_summary,
    returned_item_revenue,
    revenue_by_nation,
    top_revenue_orders,
)


def _li(spark, rows):
    """rows: (orderkey, qty, price, disc, tax, flag, status, shipdate)"""
    return spark.createDataFrame(
        [
            (ok, float(q), float(p), float(d), float(t), f, s,
             datetime.fromisoformat(sd))
            for ok, q, p, d, t, f, s, sd in rows
        ],
        "l_orderkey long, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp",
    )


class TestPricingSummary:
    def test_exact_cents_and_cutoff(self, spark):
        rows = [
            (1, 10, 100.10, 0.05, 0.02, "A", "F", "1998-01-01"),
            (2, 20, 200.20, 0.10, 0.00, "A", "F", "1998-09-01"),
            (3, 5, 999.99, 0.00, 0.08, "A", "F", "1998-09-02"),  # cut
        ]
        out = pricing_summary(_li(spark, rows), "1998-09-01").collect()
        assert len(out) == 1
        r = out[0]
        assert r["count_order"] == 2
        assert r["sum_qty"] == 30
        assert r["sum_base_price"] == pytest.approx(300.30)
        # 100.10*.95 + 200.20*.90 = 95.095 + 180.18 = 275.275
        assert r["sum_disc_price"] == pytest.approx(275.275)
        # 95.095*1.02 + 180.18*1.00 = 96.9969 + 180.18
        assert r["sum_charge"] == pytest.approx(277.1769)
        assert r["avg_disc"] == pytest.approx(0.075)

    def test_groups_are_flag_status(self, spark):
        rows = [
            (1, 1, 10.0, 0.0, 0.0, "A", "F", "1998-01-01"),
            (2, 1, 10.0, 0.0, 0.0, "N", "O", "1998-01-01"),
        ]
        out = pricing_summary(_li(spark, rows), "1998-09-01").collect()
        assert {(r["l_returnflag"], r["l_linestatus"]) for r in out} == {
            ("A", "F"),
            ("N", "O"),
        }


def _star(spark):
    orders = spark.createDataFrame(
        [
            (100, 1, datetime(1996, 6, 1), "1-URGENT"),
            (200, 2, datetime(1996, 6, 1), "2-HIGH"),
            (300, 1, datetime(1997, 6, 1), "1-URGENT"),  # out of window
        ],
        "o_orderkey long, o_custkey long, o_orderdate timestamp, "
        "o_orderpriority string",
    )
    customer = spark.createDataFrame(
        [(1, 10, "BUILDING"), (2, 20, "MACHINERY")],
        "c_custkey long, c_nationkey int, c_mktsegment string",
    )
    nation = spark.createDataFrame(
        [(10, "FRANCE", 3), (20, "BRAZIL", 1)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    region = spark.createDataFrame(
        [(3, "EUROPE"), (1, "AMERICA")],
        "r_regionkey int, r_name string",
    )
    li = _li(
        spark,
        [
            (100, 1, 1000.00, 0.10, 0.0, "N", "O", "1996-07-01"),
            (200, 1, 500.00, 0.00, 0.0, "N", "O", "1996-07-01"),
            (300, 1, 777.00, 0.00, 0.0, "N", "O", "1997-07-01"),
        ],
    )
    return li, orders, customer, nation, region


class TestRevenueByNation:
    def test_region_filter_and_window(self, spark):
        li, o, c, n, r = _star(spark)
        out = revenue_by_nation(
            li, o, c, n, r, "EUROPE", "1996-01-01", "1997-01-01"
        ).collect()
        # only order 100 (FRANCE in window); 1000*.9 = 900
        assert [(x["n_name"], x["revenue"]) for x in out] == [
            ("FRANCE", 900.0)
        ]


class TestTopRevenueOrders:
    def test_filters_and_tie_break(self, spark):
        orders = spark.createDataFrame(
            [
                (1, 1, datetime(1998, 1, 1), "1-URGENT"),
                (2, 1, datetime(1998, 1, 2), "2-HIGH"),
                (3, 1, datetime(1998, 4, 1), "1-URGENT"),  # after as_of
            ],
            "o_orderkey long, o_custkey long, o_orderdate timestamp, "
            "o_orderpriority string",
        )
        customer = spark.createDataFrame(
            [(1, 10, "BUILDING")],
            "c_custkey long, c_nationkey int, c_mktsegment string",
        )
        li = _li(
            spark,
            [
                # identical revenue on orders 1 and 2 -> orderkey tie-break
                (1, 1, 100.00, 0.0, 0.0, "N", "O", "1998-06-01"),
                (2, 1, 100.00, 0.0, 0.0, "N", "O", "1998-06-01"),
                (2, 1, 0.0, 0.0, 0.0, "N", "O", "1998-01-01"),  # pre-as_of
                (3, 1, 999.00, 0.0, 0.0, "N", "O", "1998-06-01"),
            ],
        )
        out = top_revenue_orders(
            li, orders, customer, "BUILDING", "1998-03-15", 10
        ).collect()
        assert [r["o_orderkey"] for r in out] == [1, 2]
        assert [r["revenue"] for r in out] == [100.0, 100.0]

    def test_k_limits(self, spark):
        li, o, c, n, r = _star(spark)
        out = top_revenue_orders(
            li, o, c, "BUILDING", "1996-06-15", 1
        ).collect()
        assert len(out) == 1


class TestReturnedItemRevenue:
    def test_returnflag_window_and_dims(self, spark):
        li, o, c, n, r = _star(spark)
        # make order 100's item a return, order 200's not; order 300
        # is outside the date window even though returned
        li = li.withColumn(
            "l_returnflag",
            F.when(F.col("l_orderkey").isin(100, 300), "R").otherwise("N"),
        )
        # full customer shape (name + acctbal) for the output columns
        c = c.withColumn(
            "c_name", F.concat(F.lit("cust"), F.col("c_custkey"))
        ).withColumn("c_acctbal", F.col("c_custkey") * 10.0)
        out = returned_item_revenue(
            li, o, c, n, "1996-01-01", "1997-01-01", 20
        ).collect()
        # only order 100 (returned, in window): 1000*.9 = 900, cust 1
        assert [
            (x["c_custkey"], x["c_name"], x["n_name"], x["revenue"])
            for x in out
        ] == [(1, "cust1", "FRANCE", 900.0)]

    def test_k_and_ordering(self, spark):
        li, o, c, n, r = _star(spark)
        li = li.withColumn("l_returnflag", F.lit("R"))
        c = c.withColumn(
            "c_name", F.concat(F.lit("cust"), F.col("c_custkey"))
        ).withColumn("c_acctbal", F.lit(0.0))
        out = returned_item_revenue(
            li, o, c, n, "1996-01-01", "1997-01-01", 1
        ).collect()
        # cust 1 (900.0) beats cust 2 (500.0); k=1 keeps the max
        assert len(out) == 1 and out[0]["c_custkey"] == 1


class TestLargeQuantityOrders:
    def test_having_threshold(self, spark):
        orders = spark.createDataFrame(
            [
                (1, 1, datetime(1998, 1, 1), 100.0),
                (2, 1, datetime(1998, 1, 2), 200.0),
            ],
            "o_orderkey long, o_custkey long, o_orderdate timestamp, "
            "o_totalprice double",
        )
        customer = spark.createDataFrame(
            [(1, "cust1")], "c_custkey long, c_name string"
        )
        li = _li(
            spark,
            [
                (1, 200, 1.0, 0.0, 0.0, "N", "O", "1998-01-01"),
                (1, 150, 1.0, 0.0, 0.0, "N", "O", "1998-01-02"),
                (2, 250, 1.0, 0.0, 0.0, "N", "O", "1998-01-01"),
            ],
        )
        out = large_quantity_orders(li, orders, customer, 300).collect()
        # order 1 totals 350 > 300; order 2 totals exactly 250 (and
        # 250 > 300 is false) — strict threshold
        assert [(r["o_orderkey"], r["total_qty"]) for r in out] == [(1, 350)]
        assert out[0]["c_name"] == "cust1"


class TestCheapestSupplierPerPart:
    def test_argmin_with_deterministic_tie_break(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            cheapest_supplier_per_part,
        )

        li = spark.createDataFrame(
            [
                # part 1: supplier 9 at 5.00, supplier 2 at 5.00 (tie
                # → lower suppkey wins), supplier 3 at 4.99 (winner)
                (10, 1, 9, 5.00),
                (11, 1, 2, 5.00),
                (12, 1, 3, 4.99),
                # part 2: only supplier 9
                (13, 2, 9, 7.50),
                # part 3 is a different brand → excluded
                (14, 3, 9, 0.01),
            ],
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_extendedprice double",
        )
        part = spark.createDataFrame(
            [(1, "p1", "Brand#1"), (2, "p2", "Brand#1"), (3, "p3", "Brand#2")],
            "p_partkey long, p_name string, p_brand string",
        )
        supp = spark.createDataFrame(
            [(2, "s2", 0), (3, "s3", 1), (9, "s9", 0)],
            "s_suppkey long, s_name string, s_nationkey int",
        )
        nat = spark.createDataFrame(
            [(0, "ZERO"), (1, "ONE")], "n_nationkey int, n_name string"
        )
        out = cheapest_supplier_per_part(li, part, supp, nat, "Brand#1").collect()
        got = {r["p_partkey"]: (r["best_price"], r["s_name"], r["n_name"]) for r in out}
        assert got == {1: (4.99, "s3", "ONE"), 2: (7.5, "s9", "ZERO")}

    def test_tie_breaks_to_lowest_suppkey(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            cheapest_supplier_per_part,
        )

        li = spark.createDataFrame(
            [(10, 1, 9, 5.00), (11, 1, 2, 5.00)],
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_extendedprice double",
        )
        part = spark.createDataFrame(
            [(1, "p1", "Brand#1")], "p_partkey long, p_name string, p_brand string"
        )
        supp = spark.createDataFrame(
            [(2, "s2", 0), (9, "s9", 0)],
            "s_suppkey long, s_name string, s_nationkey int",
        )
        nat = spark.createDataFrame([(0, "Z")], "n_nationkey int, n_name string")
        out = cheapest_supplier_per_part(li, part, supp, nat, "Brand#1").collect()
        assert out[0]["s_name"] == "s2"


class TestPriorityLateOrders:
    def test_counts_orders_once_regardless_of_late_lines(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            priority_late_orders,
        )

        orders = spark.createDataFrame(
            [
                (1, datetime(1996, 1, 1), "1-URGENT"),
                (2, datetime(1996, 1, 1), "1-URGENT"),
                (3, datetime(1996, 1, 1), "2-HIGH"),
            ],
            "o_orderkey long, o_orderdate timestamp, o_orderpriority string",
        )
        li = spark.createDataFrame(
            [
                # order 1: TWO late lines → still counted once
                (1, datetime(1996, 6, 1)),
                (1, datetime(1996, 7, 1)),
                # order 2: on-time only
                (2, datetime(1996, 1, 15)),
                # order 3: exactly 90 days → NOT late (strict >)
                (3, datetime(1996, 3, 31)),
            ],
            "l_orderkey long, l_shipdate timestamp",
        )
        out = {
            r["o_orderpriority"]: r["late_orders"]
            for r in priority_late_orders(orders, li, late_days=90).collect()
        }
        assert out == {"1-URGENT": 1}


class TestCustomersWithoutReturns:
    def test_semi_and_anti_membership(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            customers_without_returns,
        )

        customer = spark.createDataFrame(
            [(1, "a", "S1"), (2, "b", "S1"), (3, "c", "S2"), (4, "d", "S2")],
            "c_custkey long, c_name string, c_mktsegment string",
        )
        orders = spark.createDataFrame(
            # cust 4 never ordered → excluded by the semi-join
            [(10, 1), (11, 2), (12, 3)],
            "o_orderkey long, o_custkey long",
        )
        li = spark.createDataFrame(
            # cust 2's order 11 has a returned line → excluded by anti
            [(10, "N"), (11, "R"), (12, "N")],
            "l_orderkey long, l_returnflag string",
        )
        out = {
            r["c_mktsegment"]: r["n_customers"]
            for r in customers_without_returns(customer, orders, li).collect()
        }
        assert out == {"S1": 1, "S2": 1}


class TestShipmodePriorityMix:
    def test_conditional_counts_and_date_window(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            shipmode_priority_mix,
        )

        orders = spark.createDataFrame(
            [(1, "1-URGENT"), (2, "2-HIGH"), (3, "5-LOW")],
            "o_orderkey long, o_orderpriority string",
        )
        li = spark.createDataFrame(
            [
                (1, "O", datetime(1996, 6, 1)),   # high, in range
                (2, "O", datetime(1996, 6, 2)),   # high, in range
                (3, "O", datetime(1996, 6, 3)),   # low, in range
                (1, "F", datetime(1995, 1, 1)),   # before range → cut
                (3, "F", datetime(1997, 1, 1)),   # at exclusive end → cut
            ],
            "l_orderkey long, l_linestatus string, l_shipdate timestamp",
        )
        out = {
            r["l_linestatus"]: (r["high_line_count"], r["low_line_count"])
            for r in shipmode_priority_mix(
                orders, li, "1996-01-01", "1997-01-01"
            ).collect()
        }
        assert out == {"O": (2, 1)}


class TestPromoRevenueShare:
    def test_exact_integer_share(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            promo_revenue_share,
        )

        part = spark.createDataFrame(
            [(1, "PROMO"), (2, "STANDARD")],
            "p_partkey long, p_type string",
        )
        li = spark.createDataFrame(
            [
                # promo: 100.00 at 10% off → 90.00
                (1, 100.00, 0.10, datetime(1996, 1, 5)),
                # standard: 300.00 at 0% → 300.00
                (2, 300.00, 0.00, datetime(1996, 1, 6)),
                # out of window → cut
                (1, 999.99, 0.00, datetime(1995, 12, 31)),
            ],
            "l_partkey long, l_extendedprice double, l_discount double, "
            "l_shipdate timestamp",
        )
        r = promo_revenue_share(
            li, part, "1996-01-01", "1996-02-01"
        ).collect()[0]
        assert r["promo_revenue"] == pytest.approx(90.0)
        assert r["total_revenue"] == pytest.approx(390.0)
        # 100 * 900000 / 3900000 exact-integer division
        assert r["promo_share_pct"] == pytest.approx(23.076923)


class TestSupplierVariety:
    def test_distinct_suppliers_across_parts_in_one_group(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            supplier_variety,
        )

        part = spark.createDataFrame(
            # parts 1 & 2 share (brand, type, size) → one group
            [
                (1, "Brand#2", "SMALL", 5),
                (2, "Brand#2", "SMALL", 5),
                (3, "Brand#1", "SMALL", 5),   # excluded brand
                (4, "Brand#2", "PROMO", 5),   # excluded type
            ],
            "p_partkey long, p_brand string, p_type string, p_size int",
        )
        supplier = spark.createDataFrame(
            [(10, 5.0), (11, -1.0), (12, 0.0)],
            "s_suppkey long, s_acctbal double",
        )
        li = spark.createDataFrame(
            [
                # supplier 10 ships BOTH parts of the group → counted ONCE
                (1, 10), (2, 10), (2, 10),
                # supplier 11 is in bad standing → anti-joined out
                (1, 11),
                # supplier 12 ships only the excluded-brand part
                (3, 12),
                (4, 12),
            ],
            "l_partkey long, l_suppkey long",
        )
        out = supplier_variety(part, li, supplier, "Brand#1", "PROMO").collect()
        assert len(out) == 1
        r = out[0]
        assert (r["p_brand"], r["p_type"], r["p_size"]) == ("Brand#2", "SMALL", 5)
        assert r["supplier_cnt"] == 1


class TestDisjunctiveRevenue:
    def test_residual_keeps_exact_or_of_ands(self, spark):
        from eventhub_to_timescale_spark.operators.relational import (
            disjunctive_revenue,
        )

        part = spark.createDataFrame(
            [
                (1, "Brand#1", 5),    # size in [1,10]
                (2, "Brand#2", 15),   # size in [1,20]
                (3, "Brand#3", 25),   # size in [1,30]
                (4, "Brand#1", 40),   # size outside every disjunct
            ],
            "p_partkey long, p_brand string, p_size int",
        )
        li = spark.createDataFrame(
            [
                (1, 5.0, 100.00, 0.00),    # B1 ∧ qty∈[1,11] → in (100)
                (1, 12.0, 100.00, 0.00),   # B1 but qty 12 > 11 → out
                (2, 15.0, 200.00, 0.00),   # B2 ∧ qty∈[10,20] → in (200)
                (2, 5.0, 200.00, 0.00),    # B2 but qty 5 < 10 → out
                (3, 25.0, 400.00, 0.50),   # B3 ∧ qty∈[20,30] → in (200)
                (4, 5.0, 999.00, 0.00),    # part matches no disjunct
            ],
            "l_partkey long, l_quantity double, l_extendedprice double, "
            "l_discount double",
        )
        r = disjunctive_revenue(li, part).collect()[0]
        assert r["revenue"] == pytest.approx(500.0)
