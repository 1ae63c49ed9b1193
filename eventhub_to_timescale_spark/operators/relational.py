"""Relational analytics over the warehouse tables (TPC-H-shaped
``lineitem/orders/customer/nation/region``) — the star-schema join and
aggregation layer a Timescale deployment runs NEXT TO its hypertables
(the reference's Postgres instance holds ordinary relational tables in
the same database; SURVEY.md §1.1).  Extensions beyond the reference's
own `db/*.sql` surface, framed as such.

Cross-engine float rule (FIXTURES.md): a SUM over tens of thousands of
doubles is accumulation-order-dependent, so Spark and DuckDB can
legitimately disagree in the 1e-10 relative digits — past the 6-dp
round at Q1-revenue magnitudes (~1e8).  These operators therefore do
the money arithmetic in INTEGER units (cents; basis-point discount and
tax factors make discounted price exact in 1e-4 $ and charge in
1e-6 $): BIGINT sums are associative, both engines produce the same
integer, and the final cast-to-double + round is deterministic.  The
inputs are 2-dp dollar values by construction, so the cents cast is
lossless.

100 TB posture, per query, in the docstrings — the shared shape:
fact-to-fact joins (lineitem ⋈ orders) shuffle on the join key and are
the intended co-partitioning axis for a bucketed warehouse layout;
fixed-cardinality dims (nation 25, region 5) are broadcast
EXPLICITLY; SF-growing dims (customer, part) are left to AQE /
broadcast thresholds rather than hard-coded, because what is
broadcastable at sf0.1 is not at 100 TB.  All aggregates are
map-side-combinable (plain sums/counts on flat keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _cents(col: str) -> F.Column:
    """2-dp dollar double → exact integer cents."""
    return F.round(F.col(col) * 100).cast("long")


def _pct(col: str) -> F.Column:
    """2-dp fraction double (0.00–0.99) → exact integer percent."""
    return F.round(F.col(col) * 100).cast("long")


def pricing_summary(lineitem: DataFrame, ship_cutoff: str) -> DataFrame:
    """TPC-H Q1-shape pricing summary: per (l_returnflag,
    l_linestatus) over rows shipped on/before ``ship_cutoff``, the
    quantity/price/discount/charge roll-up.

    Integer units: base price in cents (1e-2 $), discounted price in
    1e-4 $ (cents × percent), charge in 1e-6 $.  Averages divide the
    exact integer sums by the group count in double — identical
    IEEE ops both engines — then round to 6 dp.

    100 TB posture: single pushed-filter scan (shipdate reaches the
    parquet row-group stats), one shuffle carrying ≤ |flags×status|
    partial-agg rows per map task.  The 6-group output is a scalar
    frame; nothing here grows with SF.
    """
    qty = F.col("l_quantity").cast("long")
    price_c = _cents("l_extendedprice")
    disc_p = _pct("l_discount")
    tax_p = _pct("l_tax")
    disc_price_u = price_c * (100 - disc_p)        # 1e-4 $
    charge_u = disc_price_u * (100 + tax_p)        # 1e-6 $
    n = F.count("*")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit(ship_cutoff))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.round(F.sum(price_c) / 100.0, 2).alias("sum_base_price"),
            F.round(F.sum(disc_price_u) / 1e4, 4).alias("sum_disc_price"),
            F.round(F.sum(charge_u) / 1e6, 6).alias("sum_charge"),
            F.round(F.sum(qty) / n, 6).alias("avg_qty"),
            F.round(F.sum(price_c) / n / 100.0, 6).alias("avg_price"),
            F.round(F.sum(disc_p) / n / 100.0, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str,
    year_start: str,
    year_end: str,
) -> DataFrame:
    """TPC-H Q5-shape: discounted revenue per customer nation within
    one region, for orders placed in [year_start, year_end).

    → (n_name, revenue) with revenue exact to 1e-4 $ then rounded.

    100 TB posture: region (5 rows) and nation (25) are broadcast
    explicitly — the region filter prunes the nation build side
    BEFORE it reaches the customer join, so the fact tables only see
    surviving nations.  customer ⋈ orders shuffles on custkey and
    orders ⋈ lineitem on orderkey — the two natural bucketing axes of
    a warehouse layout; neither side is hinted, leaving AQE free to
    pick broadcast at small SF and sort-merge at large.  The
    orderdate filter is pushed to the orders scan, shrinking the
    probe side before any join.
    """
    dims = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(
                        region.filter(F.col("r_name") == region_name)
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(year_start))
        & (F.col("o_orderdate") < F.lit(year_end))
    ).select("o_orderkey", "o_custkey")
    rev_u = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    return (
        lineitem.select("l_orderkey", rev_u.alias("rev_u"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(dims, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("n_name")
        .agg(F.round(F.sum("rev_u") / 1e4, 4).alias("revenue"))
    )


def top_revenue_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    segment: str,
    as_of: str,
    k: int = 10,
) -> DataFrame:
    """TPC-H Q3-shape: the ``k`` highest-revenue orders from one
    market segment placed before ``as_of`` with lineitems still
    shipping after it.

    → (o_orderkey, o_orderdate, o_orderpriority, revenue), ordered by
    (revenue DESC, o_orderkey) — the integer revenue makes the sort
    key exact, and the orderkey tie-break makes the LIMIT
    deterministic in both engines.

    100 TB posture: both date filters are pushed scans; the segment
    filter shrinks customer before its join.  The top-k is a full
    sort of the AGGREGATED frame (one row per qualifying order, not
    per lineitem) and Spark executes LIMIT-after-sort as TakeOrdered
    — no global sort materializes.
    """
    custs = customer.filter(F.col("c_mktsegment") == segment).select(
        "c_custkey"
    )
    ords = (
        orders.filter(F.col("o_orderdate") < F.lit(as_of))
        .join(custs, F.col("o_custkey") == F.col("c_custkey"))
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    rev_u = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    return (
        lineitem.filter(F.col("l_shipdate") > F.lit(as_of))
        .select("l_orderkey", rev_u.alias("rev_u"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum("rev_u").alias("rev_sum_u"))
        .orderBy(F.col("rev_sum_u").desc(), F.col("o_orderkey"))
        .limit(k)
        .select(
            "o_orderkey",
            "o_orderdate",
            "o_orderpriority",
            F.round(F.col("rev_sum_u") / 1e4, 4).alias("revenue"),
        )
    )


def returned_item_revenue(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    date_start: str,
    date_end: str,
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shape: the ``k`` customers who lost the most revenue
    to RETURNED items (``l_returnflag = 'R'``) on orders placed in
    [date_start, date_end).

    → (c_custkey, c_name, n_name, c_acctbal, revenue), ordered by
    (revenue DESC, c_custkey) — integer-cents revenue keeps the sort
    key and the LIMIT deterministic in both engines.

    100 TB posture: the returnflag + orderdate filters are pushed
    scans that shrink BOTH fact sides before the orderkey shuffle; the
    per-customer aggregate runs on the fact join output BEFORE the
    customer join, so customer joins an already-|customers|-bounded
    frame (aggregate-then-join, not join-then-aggregate); nation (25
    rows) is broadcast explicitly, customer is left to AQE.  Top-k is
    TakeOrdered on the aggregated frame.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(date_start))
        & (F.col("o_orderdate") < F.lit(date_end))
    ).select("o_orderkey", "o_custkey")
    rev_u = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    per_cust = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", rev_u.alias("rev_u"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum("rev_u").alias("rev_sum_u"))
    )
    return (
        per_cust.join(
            customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .orderBy(F.col("rev_sum_u").desc(), F.col("c_custkey"))
        .limit(k)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            "c_acctbal",
            F.round(F.col("rev_sum_u") / 1e4, 4).alias("revenue"),
        )
    )


def large_quantity_orders(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    min_total_qty: int = 300,
) -> DataFrame:
    """TPC-H Q18-shape: orders whose TOTAL lineitem quantity exceeds
    ``min_total_qty``, with the ordering customer.

    → (c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
    total_qty), ordered by (o_totalprice DESC, o_orderkey).

    100 TB posture: the HAVING aggregate runs FIRST — one map-side-
    combinable sum per orderkey over the bare (l_orderkey, l_quantity)
    projection — and the surviving keys (a tiny fraction at any
    realistic threshold) drive an equi-join back to orders; Spark
    plans that as a broadcast of the survivors under AQE, so the
    orders table is probed, never shuffled.  No sort precedes the
    final (already-small) ordered output.
    """
    qty = F.col("l_quantity").cast("long")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(qty).alias("total_qty"))
        .filter(F.col("total_qty") > min_total_qty)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
    )


def cheapest_supplier_per_part(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    brand: str = "Brand#1",
) -> DataFrame:
    """TPC-H Q2-shape: per part of the given brand, the single
    cheapest offer observed in the fact table — argmin per group with
    a deterministic tie-break, then the supplier/nation dim chain.

    → (p_partkey, p_name, best_price, s_name, n_name), ordered by
    (p_partkey).

    100 TB posture: the argmin is ``min(struct(price_cents, suppkey,
    orderkey))`` — a MAP-SIDE-COMBINABLE aggregate, not the textbook
    ``row_number() OVER (PARTITION BY part ORDER BY price)`` window,
    which would shuffle-sort the whole fact table; the struct-min
    collapses each map task to one candidate per part before the
    exchange.  The brand filter prunes the part dim FIRST and the
    semi-joined fact scan probes it broadcast; supplier/nation are
    broadcast dims.  Tie-break (suppkey, then orderkey) makes the
    argmin total, so both engines pick the identical row.
    """
    price = _cents("l_extendedprice")
    parts = part.filter(F.col("p_brand") == brand).select(
        "p_partkey", "p_name"
    )
    best = (
        lineitem.join(
            F.broadcast(parts),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_partkey", "p_name")
        .agg(
            F.min(
                F.struct(
                    price.alias("pc"),
                    F.col("l_suppkey").alias("sk"),
                    F.col("l_orderkey").alias("ok"),
                )
            ).alias("m")
        )
        .select(
            "p_partkey",
            "p_name",
            (F.col("m.pc") / 100.0).alias("best_price"),
            F.col("m.sk").alias("best_suppkey"),
        )
    )
    return (
        best.join(
            F.broadcast(supplier),
            F.col("best_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .orderBy("p_partkey")
        .select("p_partkey", "p_name", "best_price", "s_name", "n_name")
    )


def cheapest_supplier_oracle_sql(brand: str = "Brand#1") -> str:
    """DuckDB rendering of ``cheapest_supplier_per_part`` — the
    window formulation (fine for an oracle); rank-1 under
    (price_cents, suppkey, orderkey) equals the struct-min exactly."""
    return f"""
WITH offers AS (
  SELECT p.p_partkey, p.p_name,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS pc,
         l.l_suppkey, l.l_orderkey,
         row_number() OVER (
           PARTITION BY p.p_partkey
           ORDER BY CAST(round(l.l_extendedprice * 100) AS BIGINT),
                    l.l_suppkey, l.l_orderkey) AS rn
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = '{brand}'
)
SELECT o.p_partkey, o.p_name, o.pc / 100.0 AS best_price,
       s.s_name, n.n_name
FROM offers o
JOIN supplier s ON o.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE o.rn = 1
ORDER BY o.p_partkey
"""


def priority_late_orders(
    orders: DataFrame, lineitem: DataFrame, late_days: int = 90
) -> DataFrame:
    """TPC-H Q4-shape: per order priority, how many orders have AT
    LEAST ONE line shipped more than ``late_days`` after the order
    date — the EXISTS / left-semi-join plan shape.

    → (o_orderpriority, late_orders), ordered by priority.

    100 TB posture: the semi-join probes orders with the DISTINCT
    late-line orderkeys (Spark's LeftSemi keeps only the key column
    of the right side and short-circuits on first match — no fact×fact
    fan-out, no duplicate-orderkey inflation); the date predicate is
    evaluated on the joined pair, and the final aggregate is a
    map-side-combinable count over ≤ |priorities| groups.
    """
    late = lineitem.select("l_orderkey", "l_shipdate")
    probe = orders.join(
        late,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.date_add(F.col("o_orderdate"), late_days)
        ),
        "left_semi",
    )
    return (
        probe.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("late_orders"))
        .orderBy("o_orderpriority")
    )


def priority_late_oracle_sql(late_days: int = 90) -> str:
    """DuckDB rendering of ``priority_late_orders``."""
    return f"""
SELECT o.o_orderpriority, COUNT(*) AS late_orders
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL {late_days} DAY
)
GROUP BY 1 ORDER BY 1
"""


def customers_without_returns(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q21/Q22-shape: per market segment, customers who HAVE
    ordered (left-semi) but none of whose lines ever came back with
    ``l_returnflag = 'R'`` (left-anti) — the semi+anti join pair on
    one fact axis.

    → (c_mktsegment, n_customers), ordered by segment.

    100 TB posture: both probes collapse the fact table to DISTINCT
    custkey sets before touching customers — the anti side filters
    lineitem to returned lines FIRST (a small fraction), joins up to
    orders for the custkey, and Spark's LeftSemi/LeftAnti never
    replicate the customer row per matching fact row.  The final
    aggregate is a count over ≤ |segments| groups.
    """
    ordering_cust = orders.select("o_custkey")
    returned_cust = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select("o_custkey")
    )
    kept = customer.join(
        ordering_cust,
        F.col("c_custkey") == ordering_cust["o_custkey"],
        "left_semi",
    ).join(
        returned_cust,
        F.col("c_custkey") == returned_cust["o_custkey"],
        "left_anti",
    )
    return (
        kept.groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


def customers_without_returns_oracle_sql() -> str:
    """DuckDB rendering of ``customers_without_returns``."""
    return """
SELECT c.c_mktsegment, COUNT(*) AS n_customers
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND NOT EXISTS (
    SELECT 1
    FROM lineitem l JOIN orders o2 ON l.l_orderkey = o2.o_orderkey
    WHERE o2.o_custkey = c.c_custkey AND l.l_returnflag = 'R'
  )
GROUP BY 1 ORDER BY 1
"""


__all__ = [
    "pricing_summary",
    "revenue_by_nation",
    "top_revenue_orders",
    "returned_item_revenue",
    "large_quantity_orders",
    "cheapest_supplier_per_part",
    "cheapest_supplier_oracle_sql",
    "priority_late_orders",
    "priority_late_oracle_sql",
    "customers_without_returns",
    "customers_without_returns_oracle_sql",
]
