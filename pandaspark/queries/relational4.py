"""Third relational tranche — the remaining classic TPC-H join/agg shapes
expressible over the fixture schema (no partsupp / shipmode / receiptdate
columns exist, so Q7/Q8/Q10/Q13/Q15/Q17/Q19/Q22 are adapted to the columns
that do): cross-nation volume, market share, returned-item ranking,
order-count distribution, argmax-by-aggregate, correlated-threshold scans,
disjunctive join predicates, and anti-join cohort rollups.

Scale notes (100 TB): every query here shuffles only on its natural fact
keys (orderkey / partkey / suppkey / custkey); all dimension chains
broadcast; thresholds computed from aggregates travel as single-row
broadcasts, never as recomputed subplans per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import load, register, round4


def _rev_cents():
    # built lazily: Column construction needs an active SparkContext
    return F.round(
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")) * 100
    ).cast("long")


_SQL_REV_CENTS = "CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)"


# --- q89: cross-nation shipping volume (TPC-H Q7 shape) --------------------

_Q89_ORACLE = f"""
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(CAST(l_shipdate AS DATE)) AS INT) AS l_year,
       CAST(sum({_SQL_REV_CENTS}) AS BIGINT) / 100.0 AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
JOIN nation cn ON cn.n_nationkey = c_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
  AND cn.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
  AND sn.n_name <> cn.n_name
  AND CAST(l_shipdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1998-12-31'
GROUP BY sn.n_name, cn.n_name, CAST(year(CAST(l_shipdate AS DATE)) AS INT)
"""


@register("q89_volume_shipping", _Q89_ORACLE, "cross-nation yearly volume (TPC-H Q7 shape)")
def q89(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both nation filters push into the dimension chains BEFORE the fact
    join: supplier and customer are each pre-joined (broadcast) to the
    four-nation slice, so the fact rows that survive the date filter join
    against dims that already exclude most of the key space. The only
    shuffle is lineitem⋈orders on orderkey. (Four nations / four years
    rather than TPC-H's two: the check must stay non-vacuous at every
    verification scale — 12 groups even at sf0.001.)"""
    n = load(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3", "NATION_4")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate").cast("date").between("1995-01-01", "1998-12-31")
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("l_shipdate").cast("date")).alias("l_year"),
        )
        .agg((F.sum(_rev_cents()) / F.lit(100.0)).alias("revenue"))
    )


# --- q90: market share (TPC-H Q8 shape) ------------------------------------

_Q90_ORACLE = f"""
WITH vol AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
         {_SQL_REV_CENTS} AS rev_cents,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  JOIN part ON p_partkey = l_partkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND CAST(o_orderdate AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1996-12-31'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN rev_cents ELSE 0 END) AS DOUBLE)
         / CAST(sum(rev_cents) AS DOUBLE) AS mkt_share,
       CAST(sum(rev_cents) AS BIGINT) / 100.0 AS total_volume
FROM vol GROUP BY o_year
"""


@register("q90_market_share", _Q90_ORACLE, "nation market share within region (TPC-H Q8 shape)")
def q90(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share = conditional-cents-sum / cents-sum, one hash aggregate over
    the joined fact — never two scans. Numerator and denominator are exact
    BIGINTs; the single final IEEE division is deterministic cross-engine.
    part/supplier/nation/region all broadcast; customer broadcasts after
    its region filter (1/5 of customers)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date").between("1995-01-01", "1996-12-31")
    )
    li = load(spark, sf_dir, "lineitem")
    vol = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
            _rev_cents().alias("rev_cents"),
            "supp_nation",
        )
    )
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_2", F.col("rev_cents")).otherwise(F.lit(0)))
    tot = F.sum("rev_cents")
    return vol.groupBy("o_year").agg(
        (nat.cast("double") / tot.cast("double")).alias("mkt_share"),
        (tot / F.lit(100.0)).alias("total_volume"),
    )


# --- q91: returned-item ranking (TPC-H Q10 shape) --------------------------

_Q91_ORACLE = f"""
SELECT c_custkey, c_name, n_name, c_acctbal,
       CAST(sum({_SQL_REV_CENTS}) AS BIGINT) / 100.0 AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
WHERE l_returnflag = 'R'
  AND CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-04-01'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("q91_returned_items", _Q91_ORACLE, "top-20 customers by returned revenue (TPC-H Q10 shape)")
def q91(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Return-flag and quarter filters hit the scans before the orderkey
    shuffle; the customer attributes ride a broadcast. Top-20 compiles to
    TakeOrdered (per-partition heaps + driver merge) with a total-order
    tie-break — no global sort materialization at any scale."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate").cast("date") < F.lit("1996-04-01"))
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(load(spark, sf_dir, "nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    )
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg((F.sum(_rev_cents()) / F.lit(100.0)).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# --- q92: customer order-count distribution (TPC-H Q13 shape) ---------------

_Q92_ORACLE = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'O'
  GROUP BY c_custkey)
GROUP BY c_count
"""


@register("q92_order_count_dist", _Q92_ORACLE, "order-count histogram via double agg (TPC-H Q13 shape)")
def q92(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-level aggregation: per-customer counts shuffle on custkey (the
    join key — one shuffle serves join AND first agg), then the tiny
    (count → custdist) regroup. count(o_orderkey) over the LEFT join counts
    only matches, so no-order customers land in the c_count=0 bucket."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --- q93: top supplier by quarter revenue (TPC-H Q15 shape) -----------------

_Q93_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum({_SQL_REV_CENTS}) AS BIGINT) AS rev_cents
  FROM lineitem
  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rev_cents / 100.0 AS total_revenue
FROM rev JOIN supplier ON s_suppkey = supplier_no
WHERE rev_cents = (SELECT max(rev_cents) FROM rev)
"""


@register("q93_top_supplier", _Q93_ORACLE, "argmax supplier by revenue (TPC-H Q15 shape)")
def q93(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmax-over-aggregate without a window: the per-supplier revenue agg
    is computed once, its global max reduces to a single broadcast row, and
    the equality join filters winners. Exact integer cents make 'ties'
    well-defined cross-engine (no double-compare flakiness)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate").cast("date") < F.lit("1996-04-01"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_cents()).alias("rev_cents")
    )
    top = rev.agg(F.max("rev_cents").alias("max_cents"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(top), F.col("rev_cents") == F.col("max_cents"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("supplier_no"))
        .select(
            "s_suppkey", "s_name", (F.col("rev_cents") / F.lit(100.0)).alias("total_revenue")
        )
    )


# --- q94: small-quantity-order revenue (TPC-H Q17 shape) --------------------

_Q94_ORACLE = """
WITH brand_parts AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#1' AND p_type = 'SMALL'
),
stats AS (
  SELECT l_partkey,
         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents_sum,
         CAST(count(*) AS BIGINT) AS n
  FROM lineitem JOIN brand_parts ON p_partkey = l_partkey
  GROUP BY l_partkey
)
SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         / 100.0 / 7.0 AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
JOIN stats ON stats.l_partkey = lineitem.l_partkey
WHERE CAST(round(l_quantity * 100) AS BIGINT) * 5 * n < qty_cents_sum
"""


@register("q94_small_qty_revenue", _Q94_ORACLE, "per-key avg threshold scan (TPC-H Q17 shape)")
def q94(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The correlated 'quantity < 0.2 * avg(quantity per part)' subquery is
    decorrelated into one agg + an equi-join, and the comparison is kept in
    pure integers (qty_cents * 5 * n < sum_cents ⟺ qty < avg/5), so both
    engines decide every knife-edge row identically. Only brand-filtered
    parts reach the agg (semi-join via broadcast of the filtered part dim),
    and the stats join broadcasts back — the fact table shuffles zero
    times."""
    bp = (
        load(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#1") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    qty_cents = F.round(F.col("l_quantity") * 100).cast("long")
    stats = (
        li.join(F.broadcast(bp), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(F.col("l_partkey").alias("sp_partkey"))
        .agg(
            F.sum(qty_cents).alias("qty_cents_sum"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        li.join(F.broadcast(stats), F.col("sp_partkey") == F.col("l_partkey"))
        .filter(qty_cents * 5 * F.col("n") < F.col("qty_cents_sum"))
        .agg(
            (F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")) / F.lit(100.0) / F.lit(7.0)).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- q95: disjunctive join predicates (TPC-H Q19 shape) ---------------------

_Q95_ORACLE = f"""
SELECT CAST(sum({_SQL_REV_CENTS}) AS BIGINT) / 100.0 AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 11 AND 25 AND l_quantity BETWEEN 10 AND 25)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 26 AND 50 AND l_quantity BETWEEN 20 AND 35)
"""


@register("q95_or_predicate_revenue", _Q95_ORACLE, "OR-of-ANDs join predicate (TPC-H Q19 shape)")
def q95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive mixed-table predicate: Catalyst factors the part-only
    disjuncts (brand ∈ {1,2,3} ∨-union of size ranges) down into the
    broadcast side's scan, and the lineitem-side quantity bounds
    (1 ≤ qty ≤ 35) into the fact scan, so the OR survives only as the
    residual join filter — the standard Q19 plan."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    qty = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & qty.between(1, 15))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(11, 25) & qty.between(10, 25))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(26, 50) & qty.between(20, 35))
    )
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            (F.sum(_rev_cents()) / F.lit(100.0)).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# --- q96: dormant high-balance customers (TPC-H Q22 shape) ------------------

_Q96_ORACLE = """
WITH thresh AS (
  SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS bal_cents_sum,
         CAST(count(*) AS BIGINT) AS n
  FROM customer WHERE c_acctbal > 0.0
)
SELECT n_name,
       CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) / 100.0 AS totacctbal
FROM customer
JOIN nation ON n_nationkey = c_nationkey
CROSS JOIN thresh
WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > bal_cents_sum
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01')
GROUP BY n_name
"""


@register("q96_dormant_customers", _Q96_ORACLE, "above-avg balance, no orders (TPC-H Q22 shape)")
def q96(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery threshold (avg positive balance) becomes a one-row
    broadcast and an integer cross-compare (bal_cents * n > sum_cents ⟺
    bal > avg); the 'dormant' test (no order since 2000) is a left-anti
    join on custkey — the decorrelated form of NOT EXISTS that scales as
    one shuffle, with the date filter pushed into the anti side's scan."""
    c = load(spark, sf_dir, "customer")
    bal_cents = F.round(F.col("c_acctbal") * 100).cast("long")
    thresh = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(bal_cents).alias("bal_cents_sum"), F.count(F.lit(1)).alias("n")
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").cast("date") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(bal_cents * F.col("n") > F.col("bal_cents_sum"))
        .join(o, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum(bal_cents) / F.lit(100.0)).alias("totacctbal"),
        )
    )


# --- q101: year-over-year growth --------------------------------------------

_Q101_ORACLE = """
WITH yearly AS (
  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS INT) AS o_year,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders GROUP BY o_year
)
SELECT o_year,
       rev_cents / 100.0 AS revenue,
       lag(rev_cents) OVER (ORDER BY o_year) / 100.0 AS prev_revenue,
       floor(CAST(rev_cents - lag(rev_cents) OVER (ORDER BY o_year) AS DOUBLE)
             / CAST(lag(rev_cents) OVER (ORDER BY o_year) AS DOUBLE)
             * 10000 + 0.5) / 10000.0 AS yoy_growth
FROM yearly
"""


@register("q101_yoy_growth", _Q101_ORACLE, "year-over-year revenue growth (lag over year agg)")
def q101(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The lag window runs over the AGGREGATE output (one row per year) —
    a partition-less frame over provably bounded input, which the
    partition-less-window plan gate explicitly allows. The fact scan
    itself only feeds a map-side-partial hash aggregate."""
    o = load(spark, sf_dir, "orders")
    yearly = o.groupBy(
        F.year(F.col("o_orderdate").cast("date")).alias("o_year")
    ).agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents"))
    w = Window.orderBy("o_year")
    prev = F.lag("rev_cents").over(w)
    return yearly.select(
        "o_year",
        (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        (prev / F.lit(100.0)).alias("prev_revenue"),
        round4((F.col("rev_cents") - prev).cast("double") / prev.cast("double")).alias(
            "yoy_growth"
        ),
    )


# --- q102: share of parent (nation within region) ---------------------------

_Q102_ORACLE = """
WITH nat AS (
  SELECT r_name, n_name,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS rev_cents
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       rev_cents / 100.0 AS revenue,
       floor(CAST(rev_cents AS DOUBLE)
             / CAST(sum(rev_cents) OVER (PARTITION BY r_name) AS DOUBLE)
             * 10000 + 0.5) / 10000.0 AS region_share
FROM nat
"""


@register("q102_share_of_parent", _Q102_ORACLE, "nation revenue share within its region")
def q102(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent without a wide window: the per-(region, nation)
    aggregate is grouping-bounded (≤ |nations| rows), so the region-total
    window runs over a tiny frame. Integer-cents numerator/denominator and
    one round4 division keep the share engine-exact. The dim chain
    broadcasts onto the fact scan; the only shuffle is the tiny
    (region, nation) group-key aggregate."""
    o = load(spark, sf_dir, "orders")
    dims = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(load(spark, sf_dir, "region")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey", "n_name", "r_name")
    )
    nat = (
        o.join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("r_name", "n_name")
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("rev_cents"))
    )
    tot = F.sum("rev_cents").over(Window.partitionBy("r_name"))
    return nat.select(
        "r_name",
        "n_name",
        (F.col("rev_cents") / F.lit(100.0)).alias("revenue"),
        round4(F.col("rev_cents").cast("double") / tot.cast("double")).alias("region_share"),
    )


# --- q104: per-group OLS revenue trend --------------------------------------

_Q104_ORACLE = """
WITH monthly AS (
  SELECT n_name,
         CAST(date_diff('month', DATE '1995-01-01',
                        date_trunc('month', CAST(o_orderdate AS DATE))) AS BIGINT) AS m,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
  FROM orders
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ON n_nationkey = c_nationkey
  GROUP BY n_name, m
),
s AS (
  SELECT n_name,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(m) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(m * m) AS BIGINT) AS sxx,
         CAST(sum(m * y) AS BIGINT) AS sxy
  FROM monthly GROUP BY n_name
)
SELECT n_name, n AS n_months,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE floor(CAST(n * sxy - sx * sy AS DOUBLE)
                       / CAST(n * sxx - sx * sx AS DOUBLE) / 100.0 * 10000 + 0.5)
                 / 10000.0 END
         AS slope_eur_per_month,
       floor(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 * 10000 + 0.5) / 10000.0
         AS mean_monthly_eur
FROM s
"""


@register("q104_revenue_trend", _Q104_ORACLE, "per-nation OLS revenue slope, exact integer sums")
def q104(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-wise least-squares trend with ZERO float aggregation: the five
    OLS sufficient statistics (n, Σx, Σy, Σx², Σxy) are exact BIGINT sums
    over (month-index, cents) — associative, partition-order-independent —
    and slope = (nΣxy − ΣxΣy)/(nΣxx − Σx²) touches doubles only in one
    final division + round4. Two hash aggregates (orders→monthly on the
    join shuffle, monthly→stats on |nations| rows); dims broadcast. The
    same sufficient-statistics shape is how a 100 TB trend fit stays one
    pass — no per-group matrix solve, no collect."""
    o = load(spark, sf_dir, "orders")
    dims = (
        load(spark, sf_dir, "customer")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    monthly = (
        o.join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "n_name",
            F.months_between(
                F.date_trunc("month", F.col("o_orderdate").cast("date")),
                F.lit("1995-01-01").cast("date"),
            )
            .cast("long")
            .alias("m"),
        )
        .agg(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("y"))
    )
    s = monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("m").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("m") * F.col("m")).alias("sxx"),
        F.sum(F.col("m") * F.col("y")).alias("sxy"),
    )
    # a single-month group has a zero OLS denominator: NULL slope (matches
    # the oracle's CASE), never an ANSI-mode DIVIDE_BY_ZERO crash
    denom = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = F.when(
        denom != 0.0,
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double") / denom,
    )
    mean = F.col("sy").cast("double") / F.col("n").cast("double")
    return s.select(
        "n_name",
        F.col("n").alias("n_months"),
        round4(slope / F.lit(100.0)).alias("slope_eur_per_month"),
        round4(mean / F.lit(100.0)).alias("mean_monthly_eur"),
    )
