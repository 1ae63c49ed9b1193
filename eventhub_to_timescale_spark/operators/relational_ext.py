"""Second-wave relational shapes completing the 22-shape TPC-H family
(Q6, Q8, Q9, Q11, Q20, Q22) over the reduced warehouse schema — the
remaining scalar-subquery / share-of-total / anti-join patterns the
first wave (operators/relational.py) did not cover.  Extensions beyond
the reference's own `db/*.sql` surface (SURVEY.md §1.1), framed as
such.

Schema adaptations (the testdata warehouse has no ``partsupp``, no
``l_commitdate``/``l_receiptdate``, no ``c_phone``): Q9's supply cost
is modeled as a fixed percentage of ``p_retailprice``; Q11's inventory
value and Q20's available quantity are derived from shipped lineitems;
Q22's country code is the customer nation key.  Each docstring states
the adaptation.

Cross-engine float rule (FIXTURES.md, same as relational.py): all
money in integer cents / 1e-4 $ / 1e-6 $ units so BIGINT sums are
associative and identical in Spark and DuckDB; every threshold against
an average or a fraction-of-total is an integer CROSS-MULTIPLICATION
(lhs·den > rhs·num), never a float compare, so no boundary row can
differ between engines.

100 TB posture: every scalar ("total", "average", "max") is computed
as a ≤1-row aggregate and broadcast back — never a window over the
unpartitioned fact.  Fixed-cardinality dims (nation 25, region 5)
broadcast explicitly; SF-growing dims stay un-hinted for AQE.  All
aggregates are map-side-combinable sums/counts on flat keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import _cents, _pct


# ---------------------------------------------------------------- Q6


def forecast_revenue(
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    disc_lo_pct: int = 5,
    disc_hi_pct: int = 7,
    max_qty: int = 24,
) -> DataFrame:
    """TPC-H Q6-shape forecast-revenue-change: the revenue that would
    be recovered by eliminating discounts in a band, for one shipping
    year and small quantities.

    → one row (revenue_delta), exact in 1e-4 $ then rounded.

    100 TB posture: the whole query is ONE pushed-filter scan + a
    global partial-aggregate — shipdate reaches the parquet row-group
    stats (a year of a date-partitioned layout prunes ~6/7 of files
    before any task launches), and the discount/quantity conjuncts
    evaluate inside the scan.  The shuffle carries one partial sum
    per map task.  This is the canonical "scan-bound at any SF" probe
    of the relational family.
    """
    disc_p = _pct("l_discount")
    rev_u = _cents("l_extendedprice") * disc_p  # 1e-4 $
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start))
            & (F.col("l_shipdate") < F.lit(end))
            & disc_p.between(disc_lo_pct, disc_hi_pct)
            & (F.col("l_quantity") < max_qty)
        )
        .agg(F.round(F.sum(rev_u) / 1e4, 4).alias("revenue_delta"))
    )


def forecast_revenue_oracle_sql(
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    disc_lo_pct: int = 5,
    disc_hi_pct: int = 7,
    max_qty: int = 24,
) -> str:
    """DuckDB rendering of ``forecast_revenue``."""
    return f"""
SELECT round(SUM(
         CAST(round(l_extendedprice * 100) AS BIGINT)
         * CAST(round(l_discount * 100) AS BIGINT)
       ) / 1e4, 4) AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{start} 00:00:00'
  AND l_shipdate <  TIMESTAMP '{end} 00:00:00'
  AND CAST(round(l_discount * 100) AS BIGINT)
        BETWEEN {disc_lo_pct} AND {disc_hi_pct}
  AND l_quantity < {max_qty}
"""


# ---------------------------------------------------------------- Q8


def market_share(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    region_name: str = "ASIA",
    target_nation: str = "NATION_3",
    p_type: str = "ECONOMY",
    start: str = "1995-01-01",
    end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q8-shape national market share: within one region's
    customer market and one part type, the per-year fraction of
    revenue supplied by a target nation.

    → (o_year, mkt_share), share exact as a ratio of two BIGINT 1e-4 $
    sums, rounded to 6 dp.

    100 TB posture: the three selective dims prune FIRST and
    broadcast — part(type) gates the fact scan, region→nation→
    customer yields the market's custkeys, nation alone attaches the
    supplier side.  The two fact-sized joins (lineitem⋈orders on
    orderkey, orders⋈customer on custkey) are the bucketed-layout
    axes and stay un-hinted for AQE.  The CASE-summed share avoids a
    second pass: numerator and denominator come out of the SAME
    map-side-combinable aggregate, keyed by ≤ |years| groups.
    """
    parts = part.filter(F.col("p_type") == p_type).select("p_partkey")
    mkt_cust = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(
                        region.filter(F.col("r_name") == region_name)
                    ),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey")
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        ).select("c_custkey")
    )
    supp_nat = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("supp_nation"))
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(start))
        & (F.col("o_orderdate") < F.lit(end))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    rev_u = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    vol = (
        lineitem.join(
            F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .select("l_orderkey", "l_suppkey", rev_u.alias("rev_u"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(mkt_cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    tgt = F.when(F.col("supp_nation") == target_nation, F.col("rev_u"))
    return (
        vol.groupBy("o_year")
        .agg(
            F.round(
                F.coalesce(F.sum(tgt), F.lit(0)) / F.sum("rev_u"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def market_share_oracle_sql(
    region_name: str = "ASIA",
    target_nation: str = "NATION_3",
    p_type: str = "ECONOMY",
    start: str = "1995-01-01",
    end: str = "1997-01-01",
) -> str:
    """DuckDB rendering of ``market_share``."""
    return f"""
WITH vol AS (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         sn.n_name AS supp_nation,
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev_u
  FROM lineitem l
  JOIN part p     ON l.l_partkey = p.p_partkey
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn  ON c.c_nationkey = cn.n_nationkey
  JOIN region r   ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
  WHERE p.p_type = '{p_type}'
    AND r.r_name = '{region_name}'
    AND o.o_orderdate >= TIMESTAMP '{start} 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '{end} 00:00:00'
)
SELECT o_year,
       round(COALESCE(SUM(CASE WHEN supp_nation = '{target_nation}'
                               THEN rev_u END), 0)
             / SUM(rev_u), 6) AS mkt_share
FROM vol GROUP BY o_year ORDER BY o_year
"""


# ---------------------------------------------------------------- Q9


def nation_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_token: str = "widget",
    cost_pct: int = 80,
) -> DataFrame:
    """TPC-H Q9-shape product-type profit: per (supplier nation,
    order year), revenue minus supply cost over parts whose name
    contains ``name_token``.

    Schema adaptation: the warehouse has no ``partsupp``, so supply
    cost is ``cost_pct``% of ``p_retailprice`` per unit — the same
    role ps_supplycost plays (a per-part unit cost joined into the
    fact), with identical plan shape.

    → (nation, o_year, profit), profit exact in 1e-4 $ then rounded.

    100 TB posture: the name filter prunes part FIRST; the pruned
    part (carrying its unit cost in cents) broadcasts into the fact
    scan, so profit is computed per line BEFORE any shuffle —
    revenue and cost never travel separately.  lineitem⋈orders on
    orderkey is the single fact-sized shuffle; nation attaches
    broadcast to the ≤|nations×years| aggregate, not to the fact.
    """
    parts = part.filter(
        F.col("p_name").contains(name_token)
    ).select("p_partkey", _cents("p_retailprice").alias("retail_c"))
    supp_nat = supplier.join(
        F.broadcast(nation.select("n_nationkey", "n_name")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", F.col("n_name").alias("nation"))
    rev_u = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    cost_u = (
        F.col("l_quantity").cast("long") * F.col("retail_c") * cost_pct
    )  # cents × pct = 1e-4 $
    amount = (
        lineitem.join(
            F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey")
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (rev_u - cost_u).alias("amount_u"),
        )
        .join(
            orders.select("o_orderkey", F.year("o_orderdate").alias("o_year")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(supp_nat, F.col("l_suppkey") == F.col("s_suppkey"))
    )
    return (
        amount.groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount_u") / 1e4, 4).alias("profit"))
        .orderBy("nation", "o_year")
    )


def nation_profit_oracle_sql(
    name_token: str = "widget", cost_pct: int = 80
) -> str:
    """DuckDB rendering of ``nation_profit``."""
    return f"""
SELECT sn.n_name AS nation,
       EXTRACT(year FROM o.o_orderdate) AS o_year,
       round(SUM(
         CAST(round(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
         - CAST(l.l_quantity AS BIGINT)
           * CAST(round(p.p_retailprice * 100) AS BIGINT) * {cost_pct}
       ) / 1e4, 4) AS profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
WHERE p.p_name LIKE '%{name_token}%'
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --------------------------------------------------------------- Q11


def important_parts(
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_7",
    mean_num: int = 2,
    mean_den: int = 1,
) -> DataFrame:
    """TPC-H Q11-shape important stock: parts whose shipped value
    from one nation's suppliers exceeds ``mean_num/mean_den`` times
    the MEAN per-part shipped value of that nation.

    Schema adaptation: no ``partsupp``, so "stock value" is the
    discounted revenue shipped per part by the nation's suppliers —
    same share-of-a-global-total shape, same HAVING-against-scalar
    plan.  The threshold is mean-relative rather than Q11's literal
    fixed fraction-of-total because the spec itself scales that
    fraction by 1/SF (0.0001/SF): a fixed fraction returns an empty
    set as soon as the part count outgrows it, whereas "k× the mean"
    is the same selectivity at every scale factor — the scale-free
    rendering of the same HAVING shape.

    → (p_partkey, value) — value exact in 1e-4 $ then rounded; the
    threshold compare is integer cross-multiplication
    (value_u·den > total_u·num), so no float boundary.

    100 TB posture: nation prunes supplier, the surviving suppkeys
    broadcast into the fact scan — the fact is never joined to an
    unpruned dim.  Per-part value is one map-side-combinable shuffle;
    the global total re-aggregates THAT ≤|parts| frame (not the
    fact) to a single row, broadcast back as a cross-join — the
    textbook scalar subquery with zero extra fact scans.
    """
    supps = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey")
    rev_u = _cents("l_extendedprice") * (100 - _pct("l_discount"))
    per_part = (
        lineitem.join(
            F.broadcast(supps), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("l_partkey")
        .agg(F.sum(rev_u).alias("value_u"))
    )
    total = per_part.agg(
        F.sum("value_u").alias("total_u"),
        F.count(F.lit(1)).alias("cnt"),
    )
    # value_u > (num/den)·(total_u/cnt) as integer cross-multiplication
    return (
        per_part.join(F.broadcast(total))
        .filter(
            F.col("value_u") * mean_den * F.col("cnt")
            > F.col("total_u") * mean_num
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("value_u") / 1e4, 4).alias("value"),
        )
        .orderBy("p_partkey")
    )


def important_parts_oracle_sql(
    nation_name: str = "NATION_7", mean_num: int = 2, mean_den: int = 1
) -> str:
    """DuckDB rendering of ``important_parts``."""
    return f"""
WITH per_part AS (
  SELECT l.l_partkey,
         SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l.l_discount * 100) AS BIGINT)))
           AS value_u
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = '{nation_name}'
  GROUP BY 1
)
SELECT l_partkey AS p_partkey, round(value_u / 1e4, 4) AS value
FROM per_part
WHERE value_u * {mean_den} * (SELECT COUNT(*) FROM per_part)
      > (SELECT SUM(value_u) FROM per_part) * {mean_num}
ORDER BY p_partkey
"""


# --------------------------------------------------------------- Q20


def dominant_suppliers(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = "NATION_1",
    p_type: str = "SMALL",
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    share_num: int = 1,
    share_den: int = 4,
) -> DataFrame:
    """TPC-H Q20-shape supplier short-list: suppliers from one nation
    who shipped more than ``share_num/share_den`` of a part type's
    total volume in a window — candidates holding excess share of
    supply.

    Schema adaptation: no ``partsupp.ps_availqty``, so "available
    quantity" is the supplier's shipped quantity of that part in the
    window, and the Q20 threshold (> ½ of the part's ordered volume)
    becomes a share-of-part-total test — the same correlated
    semi-join-chain shape.

    → (s_suppkey, s_name), ordered.  Integer quantities make the
    share compare exact cross-multiplication.

    100 TB posture: part(type) prunes and broadcasts into the
    date-pruned fact slice; per-(part, supp) and per-part sums are
    two map-side-combinable aggregates over that slice, the second
    re-aggregating the first's ≤|parts×supps of the slice| output —
    never re-scanning the fact.  The winner set is a DISTINCT
    suppkey frame, semi-joined broadcast against the nation-pruned
    supplier dim; the fact columns never travel past the first agg.
    """
    parts = part.filter(F.col("p_type") == p_type).select("p_partkey")
    slice_ = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start))
            & (F.col("l_shipdate") < F.lit(end))
        )
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "l_suppkey",
            F.col("l_quantity").cast("long").alias("qty"),
        )
    )
    per_ps = slice_.groupBy("p_partkey", "l_suppkey").agg(
        F.sum("qty").alias("supp_qty")
    )
    per_part = per_ps.groupBy(F.col("p_partkey").alias("pk")).agg(
        F.sum("supp_qty").alias("part_qty")
    )
    winners = (
        per_ps.join(F.broadcast(per_part), F.col("p_partkey") == F.col("pk"))
        .filter(
            F.col("supp_qty") * share_den > F.col("part_qty") * share_num
        )
        .select("l_suppkey")
        .distinct()
    )
    nat_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        nat_supp.join(
            F.broadcast(winners), F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def dominant_suppliers_oracle_sql(
    nation_name: str = "NATION_1",
    p_type: str = "SMALL",
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    share_num: int = 1,
    share_den: int = 4,
) -> str:
    """DuckDB rendering of ``dominant_suppliers``."""
    return f"""
WITH slice AS (
  SELECT p.p_partkey, l.l_suppkey, CAST(l.l_quantity AS BIGINT) AS qty
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  WHERE p.p_type = '{p_type}'
    AND l.l_shipdate >= TIMESTAMP '{start} 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '{end} 00:00:00'
), per_ps AS (
  SELECT p_partkey, l_suppkey, SUM(qty) AS supp_qty
  FROM slice GROUP BY 1, 2
), per_part AS (
  SELECT p_partkey AS pk, SUM(supp_qty) AS part_qty
  FROM per_ps GROUP BY 1
)
SELECT s.s_suppkey, s.s_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = '{nation_name}'
  AND s.s_suppkey IN (
    SELECT a.l_suppkey
    FROM per_ps a JOIN per_part b ON a.p_partkey = b.pk
    WHERE a.supp_qty * {share_den} > b.part_qty * {share_num}
  )
ORDER BY s.s_suppkey
"""


# --------------------------------------------------------------- Q22


def idle_customers(
    customer: DataFrame,
    orders: DataFrame,
    nation_keys: tuple = (1, 3, 5, 7, 9, 11, 13),
    idle_since: str = "2000-01-01",
) -> DataFrame:
    """TPC-H Q22-shape global sales opportunity: per country, the
    count and total balance of customers with above-average positive
    account balance who have placed no order since ``idle_since``.

    Schema adaptations: no ``c_phone``, so the country code is the
    customer's nation key (the phone prefix IS the nation in TPC-H);
    and because this synthetic warehouse gives every customer at
    least one lifetime order, the spec's "never ordered" anti-join
    becomes "lapsed since a cutoff" — the identical NOT-EXISTS plan
    against a date-pruned order slice, with a non-degenerate result.

    → (cntrycode, numcust, totacctbal).  The above-average test is
    integer cross-multiplication on cents (bal_c·cnt > sum_c), so no
    float-average boundary can differ between engines.

    100 TB posture: the positive-balance average over the nation
    slice is a single-row (sum, count) aggregate broadcast back as a
    cross-join — not a window.  The no-orders test is a left-anti
    join against DISTINCT o_custkey, the pre-aggregated (and at
    100 TB bucketed-on-custkey) side, so the anti-join shuffles keys
    only.  Output is ≤|nation_keys| rows.
    """
    keys = list(nation_keys)
    slice_ = customer.filter(F.col("c_nationkey").isin(keys)).select(
        "c_custkey",
        "c_nationkey",
        _cents("c_acctbal").alias("bal_c"),
    )
    avg_ = slice_.filter(F.col("bal_c") > 0).agg(
        F.sum("bal_c").alias("sum_c"), F.count(F.lit(1)).alias("cnt")
    )
    rich = slice_.join(F.broadcast(avg_)).filter(
        F.col("bal_c") * F.col("cnt") > F.col("sum_c")
    )
    never = rich.join(
        orders.filter(F.col("o_orderdate") >= F.lit(idle_since))
        .select("o_custkey")
        .distinct(),
        F.col("c_custkey") == F.col("o_custkey"),
        "left_anti",
    )
    return (
        never.groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("bal_c") / 100.0, 2).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


def idle_customers_oracle_sql(
    nation_keys: tuple = (1, 3, 5, 7, 9, 11, 13),
    idle_since: str = "2000-01-01",
) -> str:
    """DuckDB rendering of ``idle_customers``."""
    keys = ", ".join(str(k) for k in nation_keys)
    return f"""
WITH slice AS (
  SELECT c_custkey, c_nationkey,
         CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
  FROM customer WHERE c_nationkey IN ({keys})
), avg_ AS (
  SELECT SUM(bal_c) AS sum_c, COUNT(*) AS cnt
  FROM slice WHERE bal_c > 0
)
SELECT s.c_nationkey AS cntrycode,
       COUNT(*) AS numcust,
       round(SUM(s.bal_c) / 100.0, 2) AS totacctbal
FROM slice s, avg_
WHERE s.bal_c * avg_.cnt > avg_.sum_c
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = s.c_custkey
      AND o.o_orderdate >= TIMESTAMP '{idle_since} 00:00:00'
  )
GROUP BY 1 ORDER BY 1
"""


__all__ = [
    "forecast_revenue",
    "forecast_revenue_oracle_sql",
    "market_share",
    "market_share_oracle_sql",
    "nation_profit",
    "nation_profit_oracle_sql",
    "important_parts",
    "important_parts_oracle_sql",
    "dominant_suppliers",
    "dominant_suppliers_oracle_sql",
    "idle_customers",
    "idle_customers_oracle_sql",
]
