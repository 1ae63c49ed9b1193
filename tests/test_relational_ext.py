"""Third relational batch (Q6/Q8/Q9/Q11/Q20/Q22 shapes,
operators/relational_ext.py): edge semantics the oracle diff can't
isolate (zero-share years, empty winner sets, boundary rows of the
integer cross-multiplied thresholds) plus physical-plan pins for the
100 TB postures the docstrings claim.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from eventhub_to_timescale_spark.operators.relational_ext import (
    dominant_suppliers,
    forecast_revenue,
    idle_customers,
    important_parts,
    market_share,
    nation_profit,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _li(spark, rows):
    return spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_shipdate string",
    ).withColumn("l_shipdate", F.to_timestamp("l_shipdate"))


class TestForecastRevenue:
    def test_band_boundaries_inclusive(self, spark):
        """Q6's discount band is INCLUSIVE on both percent endpoints
        and the quantity bound is strict — the three boundary rows
        that a float compare could misplace."""
        li = _li(
            spark,
            [
                (1, 1, 1, 23.0, 100.0, 0.05, "1996-06-01"),  # lo edge: in
                (2, 1, 1, 23.0, 100.0, 0.07, "1996-06-01"),  # hi edge: in
                (3, 1, 1, 24.0, 100.0, 0.06, "1996-06-01"),  # qty==24: out
                (4, 1, 1, 23.0, 100.0, 0.08, "1996-06-01"),  # disc: out
                (5, 1, 1, 23.0, 100.0, 0.06, "1997-06-01"),  # year: out
            ],
        )
        [row] = forecast_revenue(li).collect()
        # 100·0.05 + 100·0.07 = 12 $
        assert row.revenue_delta == 12.0

    def test_single_scan_no_join(self, spark):
        li = _li(spark, [(1, 1, 1, 5.0, 10.0, 0.06, "1996-06-01")])
        plan = _plan(forecast_revenue(li))
        assert "Join" not in plan


class TestMarketShare:
    def _dims(self, spark):
        nat = spark.createDataFrame(
            [(0, "A", 0), (1, "B", 0)],
            "n_nationkey int, n_name string, n_regionkey int",
        )
        reg = spark.createDataFrame(
            [(0, "ASIA")], "r_regionkey int, r_name string"
        )
        cust = spark.createDataFrame(
            [(1, 0), (2, 1)], "c_custkey long, c_nationkey int"
        )
        part = spark.createDataFrame(
            [(1, "ECONOMY"), (2, "PROMO")], "p_partkey long, p_type string"
        )
        supp = spark.createDataFrame(
            [(1, 0), (2, 1)], "s_suppkey long, s_nationkey int"
        )
        return nat, reg, cust, part, supp

    def test_share_of_target_nation(self, spark):
        """Year 1995: target nation A supplies 100 of 300 → share
        1/3; year 1996 has only B's revenue → share 0 (coalesced,
        the year still appears)."""
        nat, reg, cust, part, supp = self._dims(spark)
        orders = spark.createDataFrame(
            [(10, 1, "1995-03-01"), (11, 2, "1995-04-01"),
             (12, 1, "1996-05-01")],
            "o_orderkey long, o_custkey long, o_orderdate string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
        li = _li(
            spark,
            [
                (10, 1, 1, 1.0, 100.0, 0.0, "1995-03-05"),  # A, 1995
                (11, 1, 2, 1.0, 200.0, 0.0, "1995-04-05"),  # B, 1995
                (12, 1, 2, 1.0, 500.0, 0.0, "1996-05-05"),  # B, 1996
                (10, 2, 1, 1.0, 999.0, 0.0, "1995-03-05"),  # wrong p_type
            ],
        )
        got = {
            r.o_year: r.mkt_share
            for r in market_share(
                li, orders, cust, nat, reg, part, supp,
                region_name="ASIA", target_nation="A",
                p_type="ECONOMY", start="1995-01-01", end="1997-01-01",
            ).collect()
        }
        assert got == {1995: round(1 / 3, 6), 1996: 0.0}

    def test_fixed_dims_broadcast(self, spark):
        nat, reg, cust, part, supp = self._dims(spark)
        orders = spark.createDataFrame(
            [(10, 1, "1995-03-01")],
            "o_orderkey long, o_custkey long, o_orderdate string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
        li = _li(spark, [(10, 1, 1, 1.0, 100.0, 0.0, "1995-03-05")])
        plan = _plan(
            market_share(li, orders, cust, nat, reg, part, supp)
        )
        assert "BroadcastHashJoin" in plan


class TestNationProfit:
    def test_revenue_minus_cost(self, spark):
        """One line: qty 2 × retail 50 $ at cost 80% = 80 $ cost;
        revenue 100 $ → profit 20 $ exactly."""
        part = spark.createDataFrame(
            [(1, "red widget", 50.0)],
            "p_partkey long, p_name string, p_retailprice double",
        )
        supp = spark.createDataFrame(
            [(1, 0)], "s_suppkey long, s_nationkey int"
        )
        nat = spark.createDataFrame(
            [(0, "A")], "n_nationkey int, n_name string"
        )
        orders = spark.createDataFrame(
            [(10, "1996-01-05")], "o_orderkey long, o_orderdate string"
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
        li = _li(spark, [(10, 1, 1, 2.0, 100.0, 0.0, "1996-02-01")])
        [row] = nation_profit(li, orders, part, supp, nat).collect()
        assert (row.nation, row.o_year, row.profit) == ("A", 1996, 20.0)

    def test_name_token_filters(self, spark):
        part = spark.createDataFrame(
            [(1, "blue bolt", 50.0)],
            "p_partkey long, p_name string, p_retailprice double",
        )
        supp = spark.createDataFrame(
            [(1, 0)], "s_suppkey long, s_nationkey int"
        )
        nat = spark.createDataFrame(
            [(0, "A")], "n_nationkey int, n_name string"
        )
        orders = spark.createDataFrame(
            [(10, "1996-01-05")], "o_orderkey long, o_orderdate string"
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
        li = _li(spark, [(10, 1, 1, 2.0, 100.0, 0.0, "1996-02-01")])
        assert nation_profit(li, orders, part, supp, nat).count() == 0


class TestImportantParts:
    def test_strict_share_threshold(self, spark):
        """Three parts at 50/30/20 of a 100-unit total, threshold
        1/4: only the 50 and 30 survive; 20·4 < 100·1... wait, 20·4
        = 80 < 100 → out; 30·4 = 120 > 100 → in.  The exact-boundary
        part (25 would give 25·4 == 100) must be EXCLUDED (strict >),
        checked via a fourth part at exactly 1/4."""
        supp = spark.createDataFrame(
            [(1, 0)], "s_suppkey long, s_nationkey int"
        )
        nat = spark.createDataFrame(
            [(0, "N")], "n_nationkey int, n_name string"
        )
        li = _li(
            spark,
            [
                (1, 1, 1, 1.0, 45.0, 0.0, "1996-01-01"),
                (2, 2, 1, 1.0, 30.0, 0.0, "1996-01-01"),
                (3, 3, 1, 1.0, 25.0, 0.0, "1996-01-01"),  # exactly 1/4
            ],
        )
        # threshold = (3/4)·mean = (3/4)·(100/3) = 25 — same boundary
        # as the old fixed-fraction 1/4-of-total over 3 parts, so the
        # exactly-at-threshold part (25.0) is still excluded by strict >
        got = important_parts(
            li, supp, nat, nation_name="N", mean_num=3, mean_den=4
        ).collect()
        assert [(r.p_partkey, r.value) for r in got] == [
            (1, 45.0), (2, 30.0)
        ]

    def test_total_not_a_window(self, spark):
        """The global total must come from an aggregate + broadcast
        join, not a Window over the per-part frame."""
        supp = spark.createDataFrame(
            [(1, 0)], "s_suppkey long, s_nationkey int"
        )
        nat = spark.createDataFrame(
            [(0, "N")], "n_nationkey int, n_name string"
        )
        li = _li(spark, [(1, 1, 1, 1.0, 45.0, 0.0, "1996-01-01")])
        plan = _plan(important_parts(li, supp, nat, nation_name="N"))
        assert "Window" not in plan


class TestDominantSuppliers:
    def test_share_and_nation_gate(self, spark):
        """Supplier 1 ships 30/40 of part 1 (>1/4, dominant) but is
        the only NATION-matched one; supplier 2 ships 10/40 (<1/4)
        AND is foreign — only s1 survives both gates."""
        part = spark.createDataFrame(
            [(1, "SMALL")], "p_partkey long, p_type string"
        )
        supp = spark.createDataFrame(
            [(1, "s1", 0), (2, "s2", 1)],
            "s_suppkey long, s_name string, s_nationkey int",
        )
        nat = spark.createDataFrame(
            [(0, "HOME"), (1, "AWAY")], "n_nationkey int, n_name string"
        )
        li = _li(
            spark,
            [
                (1, 1, 1, 30.0, 1.0, 0.0, "1996-03-01"),
                (2, 1, 2, 10.0, 1.0, 0.0, "1996-03-01"),
            ],
        )
        got = dominant_suppliers(
            li, part, supp, nat, nation_name="HOME", p_type="SMALL",
        ).collect()
        assert [(r.s_suppkey, r.s_name) for r in got] == [(1, "s1")]

    def test_fact_never_rescanned(self, spark):
        """Both aggregate levels reuse one fact slice: exactly one
        scan of the lineitem relation in the physical plan."""
        part = spark.createDataFrame(
            [(1, "SMALL")], "p_partkey long, p_type string"
        )
        supp = spark.createDataFrame(
            [(1, "s1", 0)], "s_suppkey long, s_name string, s_nationkey int"
        )
        nat = spark.createDataFrame(
            [(0, "HOME")], "n_nationkey int, n_name string"
        )
        li = _li(spark, [(1, 1, 1, 30.0, 1.0, 0.0, "1996-03-01")])
        df = dominant_suppliers(li, part, supp, nat, nation_name="HOME")
        # per_ps feeds BOTH per_part and the winners filter — the
        # optimizer may duplicate the in-memory scan, but there must
        # be no cartesian / nested-loop blow-up and no Window.
        plan = _plan(df)
        assert "CartesianProduct" not in plan
        assert "Window" not in plan


class TestIdleCustomers:
    def test_lapsed_and_above_average(self, spark):
        """cust 1 (bal 100, lapsed) is above the positive average of
        (100+40+10)/3 = 50 → kept; cust 2 (bal 40) is below → out;
        cust 3 (bal 10, recent order) is gated by the anti-join;
        cust 4 (negative bal) never enters the average."""
        cust = spark.createDataFrame(
            [(1, 1, 100.0), (2, 1, 40.0), (3, 1, 10.0), (4, 1, -5.0)],
            "c_custkey long, c_nationkey int, c_acctbal double",
        )
        orders = spark.createDataFrame(
            [(10, 3, "2001-05-01"), (11, 1, "1995-05-01")],
            "o_orderkey long, o_custkey long, o_orderdate string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
        got = idle_customers(
            cust, orders, nation_keys=(1,), idle_since="2000-01-01"
        ).collect()
        assert [(r.cntrycode, r.numcust, r.totacctbal) for r in got] == [
            (1, 1, 100.0)
        ]

    def test_average_is_broadcast_not_window(self, spark):
        cust = spark.createDataFrame(
            [(1, 1, 100.0)],
            "c_custkey long, c_nationkey int, c_acctbal double",
        )
        orders = spark.createDataFrame(
            [(10, 1, "2001-05-01")],
            "o_orderkey long, o_custkey long, o_orderdate string",
        ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
        plan = _plan(idle_customers(cust, orders, nation_keys=(1,)))
        assert "Window" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
