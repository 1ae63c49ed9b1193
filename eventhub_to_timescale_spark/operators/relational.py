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


def shipmode_priority_mix(
    orders: DataFrame,
    lineitem: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q12-shape: per line status (the schema's stand-in for
    ship mode), how many lines shipped in [date_from, date_to) belong
    to high-priority orders (1-URGENT / 2-HIGH) vs everything else —
    conditional aggregation over the fact-to-fact join.

    → (l_linestatus, high_line_count, low_line_count), ordered by
    status.

    100 TB posture: the shipdate range is pushed to the lineitem scan
    (row-group pruning on a date-partitioned layout makes this a
    partition-pruned read); the join to orders carries only
    (l_orderkey, l_linestatus) against (o_orderkey, o_orderpriority)
    and shuffles on the bucketed orderkey axis; both CASE counts fold
    into one map-side-combinable aggregate over 2 groups.
    """
    lines = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_orderkey", "l_linestatus")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lines.join(
            orders.select("o_orderkey", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def shipmode_priority_oracle_sql(
    date_from: str = "1996-01-01", date_to: str = "1997-01-01"
) -> str:
    """DuckDB rendering of ``shipmode_priority_mix``."""
    return f"""
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE l.l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '{date_to} 00:00:00'
GROUP BY 1 ORDER BY 1
"""


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    date_from: str = "1996-01-01",
    date_to: str = "1996-02-01",
) -> DataFrame:
    """TPC-H Q14-shape: the percentage of discounted revenue in
    [date_from, date_to) earned by PROMO-type parts — a scalar
    conditional-aggregate over the fact-to-dim join.

    → one row (promo_revenue, total_revenue, promo_share_pct).

    Integer units: discounted revenue in 1e-4 $ (cents × percent),
    summed as BIGINT in both engines; the share divides the two exact
    integers in double and rounds to 6 dp, so the percentage is
    bit-identical cross-engine.

    100 TB posture: part is a broadcast dim (only p_partkey + the
    one-byte promo flag survive column pruning — project BEFORE
    broadcasting); the date range prunes the fact scan; the whole
    query is one pushed-filter scan + broadcast hash join + a
    single-group map-side-combinable aggregate.  Output is one row;
    nothing grows with SF.
    """
    rev_u = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    promo = part.select(
        "p_partkey", (F.col("p_type") == "PROMO").alias("is_promo")
    )
    ranged = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(date_from).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_to).cast("timestamp"))
    ).select("l_partkey", rev_u.alias("rev_u"))
    return (
        ranged.join(
            F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey")
        )
        .agg(
            F.sum(F.when(F.col("is_promo"), F.col("rev_u")).otherwise(0)).alias(
                "promo_u"
            ),
            F.sum("rev_u").alias("total_u"),
        )
        .select(
            F.round(F.col("promo_u") / 1e4, 4).alias("promo_revenue"),
            F.round(F.col("total_u") / 1e4, 4).alias("total_revenue"),
            F.round(
                100.0 * F.col("promo_u") / F.col("total_u"), 6
            ).alias("promo_share_pct"),
        )
    )


def promo_revenue_oracle_sql(
    date_from: str = "1996-01-01", date_to: str = "1996-02-01"
) -> str:
    """DuckDB rendering of ``promo_revenue_share`` — same integer
    units, same two-integer division."""
    return f"""
WITH ranged AS (
  SELECT l.l_partkey,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_u
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '{date_from} 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '{date_to} 00:00:00'
), agg AS (
  SELECT SUM(CASE WHEN p.p_type = 'PROMO' THEN r.rev_u ELSE 0 END) AS promo_u,
         SUM(r.rev_u) AS total_u
  FROM ranged r JOIN part p ON r.l_partkey = p.p_partkey
)
SELECT round(promo_u / 1e4, 4) AS promo_revenue,
       round(total_u / 1e4, 4) AS total_revenue,
       round(100.0 * promo_u / total_u, 6) AS promo_share_pct
FROM agg
"""


def supplier_variety(
    part: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    excl_brand: str = "Brand#1",
    excl_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q16-shape: per (p_brand, p_type, p_size) — excluding one
    brand and one type — how many DISTINCT suppliers have ever shipped
    the part, with suppliers in bad standing (negative account
    balance, the schema's stand-in for Q16's complaints predicate)
    anti-joined out.

    → (p_brand, p_type, p_size, supplier_cnt), ordered by
    (supplier_cnt DESC, p_brand, p_type, p_size).

    100 TB posture: the supplier-part relation is derived as DISTINCT
    (l_partkey, l_suppkey) from the fact table — a partial-aggregable
    dedup that collapses each map task's duplicates before the
    exchange; the bad-supplier set is tiny and broadcast for the
    LeftAnti probe; the excluded brand/type prune the part dim BEFORE
    its join.  The final count(DISTINCT l_suppkey) must re-dedup
    because distinct (part, supplier) pairs still repeat a supplier
    across parts sharing one (brand, type, size) — Spark's two-phase
    distinct aggregate keeps that partial-combinable.
    """
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    bad = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    dims = part.filter(
        (F.col("p_brand") != excl_brand) & (F.col("p_type") != excl_type)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        pairs.join(
            F.broadcast(bad),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(dims, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


def supplier_variety_oracle_sql(
    excl_brand: str = "Brand#1", excl_type: str = "PROMO"
) -> str:
    """DuckDB rendering of ``supplier_variety``."""
    return f"""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> '{excl_brand}' AND p.p_type <> '{excl_type}'
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, 1, 2, 3
"""


def disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-shape: discounted revenue over an OR-of-ANDs
    predicate — three (brand, size range, quantity range) disjuncts
    spanning BOTH join sides.

    → one row (revenue).

    100 TB posture: the raw disjunction can't be pushed to either
    scan, so the rewrite pushes the UNION of each side's disjuncts
    down separately — part pre-filters to brand ∈ {{B1,B2,B3}} AND
    size ≤ max(size_hi), lineitem pre-filters to quantity ≤
    max(qty_hi) — and the exact OR-of-ANDs is evaluated as one
    codegen'd residual on the joined (broadcast) pair.  Both
    pre-filters reach the parquet scans (PushedFilters), so the join
    sees a small fraction of either table while the residual keeps
    exact semantics.  Revenue sums in exact 1e-4 $ integer units.
    """
    disjuncts = [
        ("Brand#1", 1, 10, 1, 11),
        ("Brand#2", 1, 20, 10, 20),
        ("Brand#3", 1, 30, 20, 30),
    ]
    brands = [d[0] for d in disjuncts]
    max_size = max(d[2] for d in disjuncts)
    max_qty = max(d[4] for d in disjuncts)
    pruned_part = part.filter(
        F.col("p_brand").isin(brands) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_size")
    pruned_li = lineitem.filter(F.col("l_quantity") <= max_qty).select(
        "l_partkey",
        "l_quantity",
        (_cents("l_extendedprice") * (100 - _pct("l_discount"))).alias(
            "rev_u"
        ),
    )
    residual = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in disjuncts:
        term = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & F.col("l_quantity").between(qty_lo, qty_hi)
        )
        residual = term if residual is None else (residual | term)
    return (
        pruned_li.join(
            F.broadcast(pruned_part),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .filter(residual)
        .agg(F.sum("rev_u").alias("rev_u_sum"))
        .select(F.round(F.col("rev_u_sum") / 1e4, 4).alias("revenue"))
    )


def disjunctive_revenue_oracle_sql() -> str:
    """DuckDB rendering of ``disjunctive_revenue`` — the undecomposed
    OR-of-ANDs (the optimizer-independent statement of the query)."""
    return """
SELECT round(SUM(
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) / 1e4,
       4) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity BETWEEN 1 AND 11)
   OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 20
       AND l.l_quantity BETWEEN 10 AND 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 30
       AND l.l_quantity BETWEEN 20 AND 30)
"""


def cross_nation_volume(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_19",
) -> DataFrame:
    """TPC-H Q7-shape: shipping volume between two nations by year —
    revenue of lines whose supplier sits in one nation and whose
    ordering customer sits in the other, in either direction.

    → (supp_nation, cust_nation, l_year, revenue), ordered.

    100 TB posture: the disjunctive nation-pair predicate is applied
    to the two 25-row broadcast nation dims AFTER the join (a residual
    on broadcast columns — free), but each dim is pre-filtered to the
    two named nations BEFORE broadcast, so the supplier and customer
    probes semi-prune their fact sides to the ~2/25 slice first.  The
    only shuffles are the two fact-axis joins (lineitem⋈supplier is a
    broadcast probe; lineitem⋈orders and orders⋈customer shuffle on
    orderkey/custkey — the bucketed-warehouse co-partitioning axes).
    The year comes from l_shipdate, and the aggregate is a
    map-side-combinable integer-cents sum over ≤ 2·|years| groups.
    """
    rev_u = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    pair = nation.filter(F.col("n_name").isin(nation_a, nation_b))
    supp = (
        supplier.join(
            F.broadcast(pair.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        customer.join(
            F.broadcast(
                pair.select(
                    F.col("n_nationkey").alias("c_nk"),
                    F.col("n_name").alias("cust_nation"),
                )
            ),
            F.col("c_nationkey") == F.col("c_nk"),
        )
        .select("c_custkey", "cust_nation")
    )
    joined = (
        lineitem.join(
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            (
                (F.col("supp_nation") == nation_a)
                & (F.col("cust_nation") == nation_b)
            )
            | (
                (F.col("supp_nation") == nation_b)
                & (F.col("cust_nation") == nation_a)
            )
        )
    )
    return (
        joined.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.round(F.sum(rev_u) / 1e4, 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def cross_nation_volume_oracle_sql(
    nation_a: str = "NATION_3", nation_b: str = "NATION_19"
) -> str:
    """DuckDB rendering of ``cross_nation_volume``."""
    return f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       round(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
             / 1e4, 4) AS revenue
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = '{nation_a}' AND n2.n_name = '{nation_b}')
   OR (n1.n_name = '{nation_b}' AND n2.n_name = '{nation_a}')
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def customer_order_distribution(
    customer: DataFrame,
    orders: DataFrame,
    exclude_priority: str = "1-URGENT",
) -> DataFrame:
    """TPC-H Q13-shape: the distribution of per-customer order counts
    INCLUDING zero-order customers, over orders outside the excluded
    priority class (standing in for Q13's comment NOT-LIKE filter).

    → (order_count, n_customers), ordered by order_count desc,
    then asc for determinism.

    100 TB posture: NOT the textbook ``customer LEFT JOIN orders``
    then count — that replicates every customer row per order and
    shuffles the full fact table attached to dim rows.  Instead the
    fact side collapses FIRST (groupBy custkey → count, map-side
    combinable, one shuffle of ≤ |customers| partial rows), and the
    dim side left-joins the tiny per-customer count frame; missing
    keys coalesce to 0.  The second aggregate groups ≤ max_count
    distinct values.  Join-key skew is structural here (every order
    has a customer, counts are bounded by customer activity, not by a
    hot key), and the left join preserves exactly one row per
    customer by construction.
    """
    per_cust = (
        orders.filter(F.col("o_orderpriority") != exclude_priority)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c_count"))
    )
    return (
        customer.select("c_custkey")
        .join(per_cust, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(F.coalesce(F.col("c_count"), F.lit(0)).alias("order_count"))
        .groupBy("order_count")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("order_count"))
    )


def customer_order_distribution_oracle_sql(
    exclude_priority: str = "1-URGENT",
) -> str:
    """DuckDB rendering of ``customer_order_distribution``."""
    return f"""
SELECT order_count, COUNT(*) AS n_customers
FROM (
  SELECT c.c_custkey,
         COUNT(o.o_orderkey) AS order_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey
   AND o.o_orderpriority <> '{exclude_priority}'
  GROUP BY c.c_custkey
)
GROUP BY order_count
ORDER BY n_customers DESC, order_count DESC
"""


def top_supplier(
    lineitem: DataFrame,
    supplier: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15-shape: the supplier(s) with the maximum shipped
    revenue in a quarter — aggregate-then-argmax against a scalar.

    → (s_suppkey, s_name, total_revenue), ordered by suppkey (the
    spec keeps ALL ties; integer-cents revenue makes tie detection
    exact in both engines).

    100 TB posture: revenue per supplier is ONE map-side-combinable
    shuffle over the date-pruned fact slice (the range filter reaches
    the parquet row-group stats).  The global max is an aggregate of
    that ≤ |suppliers| frame to a single row, broadcast back as a
    join — no window over the whole frame, no second scan of the
    fact.  The supplier dim attaches broadcast at the very end, to
    the (usually single-row) winners only.
    """
    rev_u = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    per_supp = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start))
            & (F.col("l_shipdate") < F.lit(end))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev_u).alias("rev_u"))
    )
    best = per_supp.agg(F.max("rev_u").alias("best_u"))
    return (
        per_supp.join(
            F.broadcast(best), F.col("rev_u") == F.col("best_u")
        )
        .join(
            F.broadcast(supplier),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_u") / 1e4, 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def top_supplier_oracle_sql(
    start: str = "1996-01-01", end: str = "1996-04-01"
) -> str:
    """DuckDB rendering of ``top_supplier``."""
    return f"""
WITH per_supp AS (
  SELECT l.l_suppkey,
         SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
           AS rev_u
  FROM lineitem l
  WHERE l.l_shipdate >= TIMESTAMP '{start} 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '{end} 00:00:00'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name, round(p.rev_u / 1e4, 4) AS total_revenue
FROM per_supp p JOIN supplier s ON p.l_suppkey = s.s_suppkey
WHERE p.rev_u = (SELECT MAX(rev_u) FROM per_supp)
ORDER BY s.s_suppkey
"""


def small_quantity_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    brand: str = "Brand#1",
    num: int = 1,
    den: int = 5,
) -> DataFrame:
    """TPC-H Q17-shape: average yearly revenue lost to small orders —
    lines of the brand's parts whose quantity is below ``num/den`` of
    that part's average ordered quantity.

    → one row (avg_yearly).

    100 TB posture: the brand filter prunes the part dim FIRST and
    broadcasts it, so the fact is scanned once, pre-pruned to the
    brand's slice; the per-part average is a map-side-combinable
    (sum, count) over that slice, re-joined BROADCAST (≤ |brand
    parts| rows) against the same persisted slice — the textbook
    correlated subquery becomes two passes over a pruned fraction of
    the fact, never a window over all of it.  The threshold compare
    is exact integer cross-multiplication (qty·den·cnt < num·sum), so
    no float boundary can disagree between engines.
    """
    parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    slice_ = lineitem.join(
        F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
    ).select(
        "p_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        _cents("l_extendedprice").alias("price_c"),
    )
    per_part = slice_.groupBy(F.col("p_partkey").alias("pk")).agg(
        F.sum("qty").alias("sum_qty"), F.count(F.lit(1)).alias("cnt")
    )
    kept = slice_.join(
        F.broadcast(per_part), F.col("p_partkey") == F.col("pk")
    ).filter(
        F.col("qty") * den * F.col("cnt") < num * F.col("sum_qty")
    )
    return kept.agg(
        F.round(F.sum("price_c") / 100.0 / 7.0, 6).alias("avg_yearly")
    )


def small_quantity_revenue_oracle_sql(
    brand: str = "Brand#1", num: int = 1, den: int = 5
) -> str:
    """DuckDB rendering of ``small_quantity_revenue`` — the correlated
    formulation; the integer cross-multiplied threshold matches the
    Spark side exactly."""
    return f"""
WITH slice AS (
  SELECT p.p_partkey,
         CAST(l.l_quantity AS BIGINT) AS qty,
         CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_brand = '{brand}'
), per_part AS (
  SELECT p_partkey AS pk, SUM(qty) AS sum_qty, COUNT(*) AS cnt
  FROM slice GROUP BY 1
)
SELECT round(SUM(s.price_c) / 100.0 / 7.0, 6) AS avg_yearly
FROM slice s JOIN per_part a ON s.p_partkey = a.pk
WHERE s.qty * {den} * a.cnt < {num} * a.sum_qty
"""



def revenue_rollup(orders: DataFrame) -> DataFrame:
    """Multi-level subtotal report → (o_orderpriority, order_year,
    total_revenue, n_orders) under ``ROLLUP(priority, year)``: leaf
    groups, per-priority subtotals (year NULL), and the grand total
    (both NULL) in ONE aggregation pass.

    The OLAP grouping-sets surface the reference's Grafana dashboards
    emulate with separate panels; Spark evaluates a rollup as a
    single Expand+hash-aggregate — each input row fans into its 3
    grouping sets map-side, partials combine as usual, so the plan
    costs one shuffle exactly like the plain groupBy (no per-level
    re-scan, no union of aggregates).

    Revenue sums exact integer cents (1 dp-rounding at the very end);
    the subtotal NULLs are produced by the same grouping-set rules in
    both engines, so rows align 1:1.
    """
    with_year = orders.withColumn(
        "order_year", F.year("o_orderdate").cast("int")
    )
    return (
        with_year.rollup("o_orderpriority", "order_year")
        .agg(
            F.round(F.sum(_cents("o_totalprice")) / 100.0, 2).alias(
                "total_revenue"
            ),
            F.count("*").alias("n_orders"),
        )
        .orderBy(
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("order_year").asc_nulls_first(),
        )
    )


def revenue_rollup_oracle_sql(table: str = "orders") -> str:
    """DuckDB rendering of ``revenue_rollup`` — GROUP BY ROLLUP with
    the identical integer-cents sum."""
    return f"""
SELECT o_orderpriority,
       CAST(year(o_orderdate) AS INTEGER) AS order_year,
       round(sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0, 2)
         AS total_revenue,
       count(*) AS n_orders
FROM {table}
GROUP BY ROLLUP (o_orderpriority, CAST(year(o_orderdate) AS INTEGER))
ORDER BY o_orderpriority NULLS FIRST, order_year NULLS FIRST
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
    "shipmode_priority_mix",
    "shipmode_priority_oracle_sql",
    "promo_revenue_share",
    "promo_revenue_oracle_sql",
    "supplier_variety",
    "supplier_variety_oracle_sql",
    "disjunctive_revenue",
    "disjunctive_revenue_oracle_sql",
    "cross_nation_volume",
    "cross_nation_volume_oracle_sql",
    "customer_order_distribution",
    "customer_order_distribution_oracle_sql",
    "top_supplier",
    "top_supplier_oracle_sql",
    "small_quantity_revenue",
    "small_quantity_revenue_oracle_sql",
    "revenue_rollup",
    "revenue_rollup_oracle_sql",
]
