"""Named query catalog: one entry per implemented operator from SURVEY.md §2,
plus the DuckDB oracle SQL for each (the driver's correctness gate).

Determinism discipline (so value hashes match DuckDB exactly):
- Money/quantity aggregates are summed as DECIMAL (exact) and cast to DOUBLE
  at the end; both engines produce the identical IEEE value.
- Derived ratios are computed from those exact values with the same scalar
  double ops on both sides (deterministic, order-free).
- Floating-point folds over arrays (cosine etc.) use an explicit left-to-right
  fold in BOTH engines (Spark ``aggregate``; DuckDB ``list_reduce``).
- Top-k queries always carry a unique tiebreak key in the ordering.
- Timestamps are cast to DATE (or epoch seconds) at the boundary; the Spark
  session runs in UTC.

Each Spark callable takes (spark, sf_dir) and returns a DataFrame; the oracle
SQL runs on DuckDB views named after the tables.
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from kafka_connect_jsonata_spark.functions import (
    classifier,
    curation,
    dedup,
    filtering,
    multimodal,
    similarity,
    text,
)
from kafka_connect_jsonata_spark.operators import relational as R
from kafka_connect_jsonata_spark.sources.readers import (
    embedding_dim,
    load_table,
    ts_micros,
    ts_millis,
)
from kafka_connect_jsonata_spark.transform import transform


def _dec(c: str, scale: int = 2) -> F.Column:
    return F.col(c).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# C9/C13: TPC-H-style aggregation queries
# ---------------------------------------------------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with 8 aggregates; partial
    aggregation makes it one pass over the fact table."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    charge = disc_price * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .withColumn("avg_qty", F.col("sum_qty") / F.col("count_order"))
        .withColumn("avg_price", F.col("sum_base_price") / F.col("count_order"))
    )
    return out.orderBy("l_returnflag", "l_linestatus")


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, agg, total-order top 10 (unique tiebreak
    on orderkey keeps the limit deterministic)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer grows with the fact — no forced broadcast hint; the
        # optimizer/AQE broadcasts it from size stats while it fits the
        # threshold and degrades to a shuffled join at scale (round-8 fix:
        # a hardcoded hint overrides AQE and OOMs at the 100-TB point)
        .join(cust.filter(F.col("c_mktsegment") == "BUILDING"),
              F.col("o_custkey") == F.col("c_custkey"))
    )
    return (
        j.groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"))
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, strftime(o_orderdate, '%Y-%m-%d')
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer over one quarter
    — selective fact filter (flag + date range, both pushed to the scan),
    two broadcast dims, agg by customer, total-order top 20. o_orderdate is
    NTZ; the literal-string comparison is session-timezone independent."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    j = (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1995-10-01")
                & (F.col("o_orderdate") < "1996-01-01")
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        # customer is sf-proportional: no forced hint (AQE broadcasts it
        # while small, shuffles at scale); nation is constant-size (25
        # rows at every sf) — the hint stays
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    return (
        j.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            _dec("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
    )


Q10_SQL = """
SELECT c_custkey, c_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       CAST(CAST(c_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal, n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1995-10-01'
  AND o_orderdate < TIMESTAMP '1996-01-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-style semi-join — orders whose lineitems sum
    past a quantity threshold, re-joined to customer + lineitem for the
    report. The qualifying-order set is an aggregate-then-filter (map-side
    combined), broadcast back against the fact; integer quantities keep the
    threshold cut exact."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("__q"))
        .filter(F.col("__q") > 300)
        .select("l_orderkey", F.col("__q").cast("double").alias("sum_qty"))
    )
    # both the qualifying-order aggregate and customer grow with sf — no
    # forced hints; AQE sees the agg's actual runtime size (tiny: HAVING
    # > 300 is selective) and broadcast-converts at every realistic scale,
    # without the OOM cliff a hardcoded hint buys at 100 TB (round-8 fix)
    j = (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
    )
    return j.select(
        "c_name",
        "c_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
        _dec("o_totalprice").cast("double").alias("o_totalprice"),
        "sum_qty",
    ).orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    ).limit(100)


Q18_SQL = """
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300)
SELECT c_name, c_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS o_totalprice,
       sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join — orders in a quarter having at
    least one lineitem shipped >90 days after the order date (the driver
    schema carries no commit/receipt dates; the late-shipment predicate
    keeps Q4's correlated-EXISTS structure), counted by priority. The
    semi-join never duplicates orders regardless of lineitem fanout."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    late = (li.l_orderkey == o.o_orderkey) & (
        li.l_shipdate > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    return (
        o.join(li, late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q12_shipping_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact join + dual conditional aggregation — per
    return flag (the schema's stand-in for ship mode), how many lines
    belong to high- vs low-priority orders in one shipping year. The CASE
    sums fold into ONE pass over the joined rows."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    j = li.filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    ).join(orders, li.l_orderkey == orders.o_orderkey)
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: single-month fact slice joined to part, promo
    revenue share as a ratio of two conditional decimal sums — one scan,
    one join, one row out."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    j = li.filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    ).join(part, li.l_partkey == part.p_partkey)
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return j.agg(
        (
            F.lit(100.0) * F.sum(promo).cast("double")
            / F.sum(rev).cast("double")
        ).alias("promo_revenue")
    )


Q14_SQL = """
SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                 ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
       AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01'
  AND l_shipdate < TIMESTAMP '1997-10-01'
"""


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunction of conjunctive brand/size/quantity
    predicates across the join — the optimizer pushes the common part
    (the join key) and evaluates the OR per joined row; revenue over the
    union of three disjoint slices."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    j = li.join(part, li.l_partkey == part.p_partkey)
    c1 = (
        (F.col("p_brand") == "Brand#1")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity") >= 1)
        & (F.col("l_quantity") <= 11)
    )
    c2 = (
        (F.col("p_brand") == "Brand#13")
        & (F.col("p_size").between(1, 25))
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 20)
    )
    c3 = (
        (F.col("p_brand") == "Brand#20")
        & (F.col("p_size").between(1, 35))
        & (F.col("l_quantity") >= 20)
        & (F.col("l_quantity") <= 30)
    )
    return j.filter(c1 | c2 | c3).agg(
        F.sum(rev).cast("double").alias("revenue")
    )


Q19_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold (avg positive balance,
    one broadcast row) + anti-join against recent orders (every synthetic
    customer has SOME order, so "lapsed since 2000" keeps Q22's NOT
    EXISTS structure non-vacuous), rolled up by nation (the schema's
    stand-in for the phone country code). The anti-join is key-local; the
    scalar rides a 1-row broadcast crossJoin."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg(_dec("c_acctbal")).cast("double").alias("__avg")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("__avg"))
    )
    recent = orders.filter(F.col("o_orderdate") >= "2000-01-01")
    no_orders = rich.join(
        recent, rich.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        no_orders.groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = """
WITH avg_bal AS (
  SELECT CAST(avg(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS a
  FROM customer WHERE c_acctbal > 0)
SELECT c_nationkey AS cntrycode, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer, avg_bal
WHERE CAST(c_acctbal AS DOUBLE) > a
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_nationkey
ORDER BY cntrycode
"""


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (C84): correlated scalar AVG subquery — yearly
    revenue lost if small-quantity orders (below 20% of the part's own
    average quantity) went unshipped. The driver schema has no
    p_container, so the brand predicate alone selects the part slice; the
    correlated-aggregate STRUCTURE — the hard part — is intact. Plan: the
    brand part list broadcasts into lineitem once; the per-part threshold
    (a dozen rows) broadcasts back over the same slice — the correlated
    subquery decorrelates into one keyed aggregate + one broadcast join,
    never a per-row re-scan. Quantities are integral doubles, so the AVG
    is order-independent and deterministic; revenue sums in decimal."""
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#13")
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem")
    # no forced broadcasts: the brand part list and the per-part threshold
    # are sf-proportional (the round-8 no-hint rule) — AQE broadcasts both
    # at runtime while they fit, shuffles on the part key when they don't
    brand_lines = li.join(part, li.l_partkey == part.p_partkey)
    # round 13 (guide §2.4): the per-part threshold used to be a separate
    # groupBy aggregate joined back, which built the lineitem⋈part subtree
    # twice (two full lineitem scans at scale). An avg() window over the
    # same rows computes it in one pass — value-identical: quantities are
    # integral doubles, so the average is summation-order independent.
    small = brand_lines.withColumn(
        "__thr",
        F.lit(0.2) * F.avg("l_quantity").over(Window.partitionBy("l_partkey")),
    ).filter(F.col("l_quantity") < F.col("__thr"))
    return small.agg(
        (F.sum(_dec("l_extendedprice")).cast("double") / 7.0).alias("avg_yearly")
    )


Q17_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (C84): the hardest classic correlated join — per
    supplier, count lineitems that were the SOLE late line in a
    multi-supplier finished order (EXISTS another supplier's line, NOT
    EXISTS another supplier's LATE line). The driver schema carries no
    commit/receipt dates, so "late" = shipped >90 days after the order
    date (the q4 substitution); it is constant within an order, so the
    l2/l3 correlations keep their exact semantics. Plan: both EXISTS
    collapse into per-order counts — distinct suppliers and distinct LATE
    suppliers — computed by collect_set windows over ONE shuffle on the
    order key (set size bounded by lines-per-order, single digits); the
    constant-size nation keeps its broadcast hint, sf-proportional
    supplier is left to AQE (the round-8 no-hint rule).
    No correlated re-scan, no cartesian:
    a qualifying l1 line is late AND in an order with >= 2 suppliers AND
    exactly 1 late supplier (itself)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").like("NATION_1%")
    )
    lines = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        ).alias("__late"),
    )
    w = Window.partitionBy("l_orderkey")
    flagged = lines.withColumn(
        "__n_supp", F.size(F.collect_set("l_suppkey").over(w))
    ).withColumn(
        "__n_late_supp",
        F.size(
            F.collect_set(
                F.when(F.col("__late"), F.col("l_suppkey"))
            ).over(w)
        ),
    )
    l1 = flagged.filter(
        F.col("__late") & (F.col("__n_supp") >= 2) & (F.col("__n_late_supp") == 1)
    )
    named = supplier.join(
        F.broadcast(nation.select("n_nationkey")),
        supplier.s_nationkey == F.col("n_nationkey"),
        "left_semi",
    ).select("s_suppkey", "s_name")
    return (
        l1.join(named, l1.l_suppkey == named.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name"))
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM supplier, lineitem l1, orders, nation
WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
  AND o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL 90 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o_orderdate + INTERVAL 90 DAY)
  AND s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100
"""


def q2_minimum_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (C84): correlated MIN over the supply relation —
    for every STANDARD part, the European suppliers offering exactly the
    part's minimum unit price. The driver schema has no partsupp table,
    so the supply relation derives from lineitem (min observed unit
    price per (part, supplier) — one keyed aggregate); the correlated
    `= (SELECT min(...))` decorrelates into a per-part MIN + an equality
    join that PRESERVES TIES (all suppliers at the minimum), Q2's defining
    semantics. Constant-size nation/region keep broadcast hints;
    supplier and the derived supply table are left to AQE. Unit price is
    one IEEE division and the min/equality compare identical doubles, so
    the float equality is engine-portable."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "STANDARD"
    ).select("p_partkey")
    ps = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    eur = (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eur = ps.join(eur, ps.sk == eur.s_suppkey)
    # round 13 (guide §2.4/§7.2): the per-part minimum used to be a
    # separate groupBy('pk') aggregate joined back — the physical plan
    # built the whole ps_eur subtree (lineitem aggregate + supplier/nation/
    # region joins) TWICE and merged the copies with a sort-merge join.
    # A min() window over the part-joined rows is value-identical (the
    # part join filters whole pk groups, never rows within one) and
    # computes the minimum in the same exchange that already hash-
    # partitions by pk: one subtree, one shuffle, no self-join.
    return (
        ps_eur.join(part, ps_eur.pk == part.p_partkey)
        .withColumn("__mc", F.min("cost").over(Window.partitionBy("pk")))
        .filter(F.col("cost") == F.col("__mc"))
        # min_cost ships UNROUNDED: both engines divide and MIN the same
        # doubles, so the raw value is bit-portable — a round(x, 4) is NOT
        # (Spark HALF_UP vs DuckDB rint diverge one ulp at half boundaries)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("cost").alias("min_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


Q2_SQL = """
WITH ps AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         min(l_extendedprice / l_quantity) AS cost
  FROM lineitem GROUP BY 1, 2),
eur AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE')
SELECT s.s_acctbal, s.s_name, s.n_name, p.p_partkey,
       ps.cost AS min_cost
FROM part p JOIN ps ON ps.pk = p.p_partkey JOIN eur s ON s.s_suppkey = ps.sk
WHERE p.p_type = 'STANDARD'
  AND ps.cost = (SELECT min(ps2.cost)
                 FROM ps ps2 JOIN eur s2 ON s2.s_suppkey = ps2.sk
                 WHERE ps2.pk = p.p_partkey)
ORDER BY s.s_acctbal DESC, s.n_name, s.s_name, p.p_partkey LIMIT 100
"""


def q20_potential_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (C84): nested IN-subqueries + a correlated
    aggregate threshold — suppliers in a nation group whose shipments of
    a name-selected part class SURGED (1997 quantity exceeding half their
    all-time quantity for that part; the schema has no partsupp.availqty,
    so the two quantities aggregate the same fact at different date
    slices, keeping the correlated same-key two-aggregate compare). The
    part IN-list is a semi-join, the qualifying (part, supplier) set is
    one keyed aggregate over lineitem, and the supplier IN is a final
    semi-join — no correlated re-scan. Quantities are integral doubles:
    sums are exact, the 0.5 threshold is engine-portable."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").like("NATION_1%")
    )
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("large%")
    ).select("p_partkey")
    in_97 = (F.col("l_shipdate") >= "1997-01-01") & (
        F.col("l_shipdate") < "1998-01-01"
    )
    psq = li.groupBy(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).agg(
        F.sum("l_quantity").alias("__total"),
        F.sum(F.when(in_97, F.col("l_quantity")).otherwise(F.lit(0.0))).alias(
            "__yr"
        ),
    )
    qual = (
        psq.join(parts, psq.pk == parts.p_partkey, "left_semi")
        .filter(F.col("__yr") > 0.5 * F.col("__total"))
        .select("sk")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
        )
        .join(qual, supplier.s_suppkey == qual.sk, "left_semi")
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


Q20_SQL = """
WITH psq AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         sum(l_quantity) AS total_qty,
         sum(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                   AND l_shipdate < TIMESTAMP '1998-01-01'
                  THEN l_quantity ELSE 0 END) AS yr_qty
  FROM lineitem GROUP BY 1, 2)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name LIKE 'NATION_1%'
  AND s_suppkey IN (
    SELECT sk FROM psq
    WHERE pk IN (SELECT p_partkey FROM part WHERE p_name LIKE 'large%')
      AND yr_qty > 0.5 * total_qty)
ORDER BY s_name
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with two broadcast dims, agg by nation."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # supplier/customer are sf-proportional — no forced hints
        # (round-8 fix); nation/region are constant-size, hints stay
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(F.broadcast(region.filter(F.col("r_name") == "ASIA")),
              nation.n_regionkey == region.r_regionkey)
    )
    return (
        j.groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


Q5_SQL = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (C84): bidirectional nation-pair trade volume —
    lineitem joined to its supplier's nation AND its order's customer's
    nation, keeping the two (NATION_1, NATION_2) directions, revenue by
    (supp_nation, cust_nation, ship year). Plan: the two nation slices
    are constant-size broadcast dims; supplier/customer/orders join on
    their sf-proportional keys under AQE. One aggregate, no correlated
    subquery — the classic multi-dim star join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_18", "NATION_19")
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("__cn_key"), F.col("n_name").alias("cust_nation")
    )
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    j = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__sn_key"))
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year, CAST(revenue AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS INTEGER) AS l_year,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS revenue
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_18', 'NATION_19')
    AND n2.n_name IN ('NATION_18', 'NATION_19')
    AND n1.n_name <> n2.n_name
    AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2, 3) t
ORDER BY supp_nation, cust_nation, l_year
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (C84): national market share — of the ECONOMY-part
    revenue sold into AMERICA-region customers, the fraction supplied by
    NATION_3, per order year. The share is a conditional-sum ratio over
    one joined slice: both the numerator and denominator aggregate in the
    SAME pass (decimal-exact), divided as doubles afterwards. Nation and
    region broadcast; everything else is AQE-planned."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cn = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select(F.col("n_nationkey").alias("__cn_key"))
    sn = nation.select(
        F.col("n_nationkey").alias("__sn_key"), F.col("n_name").alias("supp_nation")
    )
    volume = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    j = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("__cn_key"), "left_semi")
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("__sn_key"))
    )
    return (
        j.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
                    F.lit(0).cast("decimal(18,2)")
                )
            ).cast("double").alias("__num"),
            F.sum(volume).cast("double").alias("__den"),
        )
        .select(
            "o_year",
            (F.col("__num") / F.col("__den")).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year, CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         sum(CASE WHEN n2.n_name = 'NATION_3'
             THEN CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
             ELSE CAST(0 AS DECIMAL(18,2)) END) AS num,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS den
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA'
    AND o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  GROUP BY 1) t
ORDER BY o_year
"""


def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (C84): product-type profit by supplier nation and
    year. The driver schema has no partsupp, so supply cost is the
    documented proxy 0.6 x p_retailprice per unit (constant, so the
    aggregate STRUCTURE — profit = revenue - cost summed over a
    name-sliced part set, grouped by (nation, year) — is intact).
    Decimal-exact both sides."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    # revenue and cost are summed SEPARATELY (decimal-exact, narrow
    # precision on both engines — a single chained decimal product
    # overflows DuckDB's 38-digit cap) and differenced as doubles: the
    # same scalar op on identical IEEE inputs in both engines
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(18,2)") - _dec("l_discount")
    )
    cost = (
        F.lit(0.6).cast("decimal(8,2)")
        * F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    j = (
        li.join(part.select("p_partkey", "p_retailprice"), li.l_partkey == F.col("p_partkey"))
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders.select("o_orderkey", "o_orderdate"), li.l_orderkey == F.col("o_orderkey"))
    )
    return (
        j.groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(
            F.sum(revenue).cast("double").alias("__r"),
            F.sum(cost).cast("double").alias("__c"),
        )
        .select(
            "nation",
            "o_year",
            (F.col("__r") - F.col("__c")).alias("sum_profit"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT nation, o_year, CAST(r AS DOUBLE) - CAST(c AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS r,
         sum(CAST(0.6 AS DECIMAL(8,2)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS c
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON o_orderkey = l_orderkey
  WHERE p_name LIKE '%red%'
  GROUP BY 1, 2) t
ORDER BY nation, o_year DESC
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (C84): the HAVING-against-a-global-scalar plan —
    per-part supply value from NATION_3 suppliers, keeping parts above a
    fixed fraction of the TOTAL value. No partsupp in the driver schema,
    so value derives from lineitem (extendedprice x quantity per line,
    the observed supply relation). The global total is a one-row
    aggregate joined back as a scalar (AQE broadcasts it); the per-part
    aggregate shuffles once on the part key. Both aggregates reuse the
    SAME filtered slice — Spark caches nothing, but the scan is
    column-pruned and the filter is pushed to parquet both times."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    sk = supp.join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey, "left_semi"
    ).select("s_suppkey")
    sliced = li.join(sk, li.l_suppkey == sk.s_suppkey, "left_semi")
    per_part = sliced.groupBy("l_partkey").agg(
        F.sum(_dec("l_extendedprice") * _dec("l_quantity"))
        .cast("double")
        .alias("value")
    )
    # the threshold derives from the EXACT decimal grand total (a double
    # re-sum of per-part values would be order-dependent), cast to double
    # and scaled with the same scalar op on both engines (a decimal
    # multiply here would blow DuckDB's 38-digit precision cap)
    total = sliced.agg(
        (
            F.sum(_dec("l_extendedprice") * _dec("l_quantity")).cast("double")
            * F.lit(0.001)
        ).alias("__thr")
    )
    return (
        # the 1-row scalar is constant-size at every sf — the broadcast
        # hint is justified (q22's rule) and keeps the inequality filter
        # from planning as a cartesian when stats are unavailable
        per_part.join(F.broadcast(total))
        .filter(F.col("value") > F.col("__thr"))
        .select(F.col("l_partkey").alias("p_partkey"), "value")
        .orderBy(F.col("value").desc(), "p_partkey")
    )


Q11_SQL = """
WITH sliced AS (
  SELECT l_partkey, CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS v
  FROM lineitem
  WHERE l_suppkey IN (SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
                      WHERE n_name = 'NATION_3')),
per_part AS (SELECT l_partkey, CAST(sum(v) AS DOUBLE) AS value FROM sliced GROUP BY 1)
SELECT l_partkey AS p_partkey, value
FROM per_part
WHERE value > (SELECT CAST(sum(v) AS DOUBLE) * 0.001 FROM sliced)
ORDER BY value DESC, p_partkey
"""


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (C84): the outer-join histogram — customers by how
    many qualifying orders they placed, INCLUDING zero-order customers
    (the left join's defining row preservation). The driver schema has no
    o_comment, so the classic NOT-LIKE comment exclusion substitutes the
    '4-NOT SPECIFIED' priority class (same plan: filter BEFORE the join
    so unqualified orders drop without losing customers). Two aggregates:
    per-customer count, then the count distribution."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (C84): the view + global-MAX equality — quarterly
    revenue per supplier, returning every supplier AT the maximum
    (tie-preserving, like q2's correlated MIN). The revenue view is one
    keyed aggregate; the max is a one-row scalar joined back (AQE
    broadcast). Decimal-exact so the equality is bit-precise in both
    engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(
            _dec("l_extendedprice")
            * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
        ).alias("__rev")
    )
    mx = rev.agg(F.max("__rev").alias("__mx"))
    return (
        rev.join(mx)  # 1-row scalar join: AQE broadcast
        .filter(F.col("__rev") == F.col("__mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("__rev").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT max(total_rev) FROM revenue)
ORDER BY s_suppkey
"""


def q16_parts_supplier_relationship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (C84): COUNT(DISTINCT supplier) per part attribute
    triple with a NOT-IN supplier exclusion. The supplier-part relation
    derives from lineitem (no partsupp); the classic complaint-comment
    exclusion substitutes negative account balance (s_acctbal < 0), the
    same anti-membership plan. Distinct pairs first (one shuffle), then
    the count-distinct aggregate; the excluded-supplier list is a
    NULL-safe anti-join."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (~F.col("p_type").like("PROMO%"))
        & (F.col("p_size").isin(1, 2, 3, 4, 5))
    )
    li = load_table(spark, sf_dir, "lineitem")
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    rel = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey")
    )
    return (
        rel.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%'
  AND p_size IN (1, 2, 3, 4, 5)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# C3/C4/C18: projection, filter, JSON ops (the reference's A4 drop + B-path
# semantics lifted to rows)
# ---------------------------------------------------------------------------

def filter_project_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return R.project(
        R.keep(ev, (F.col("event_type") == "purchase") & (F.col("value") > 100)),
        F.col("event_id"),
        F.col("user_id"),
        (_dec("value") * F.lit(2).cast("decimal(18,2)")).cast("double").alias("value2"),
    )


FILTER_PROJECT_SQL = """
SELECT event_id, user_id,
       CAST(CAST(value AS DECIMAL(18,2)) * CAST(2 AS DECIMAL(18,2)) AS DOUBLE) AS value2
FROM events WHERE event_type = 'purchase' AND value > 100
"""


def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18 JSON path extraction on events.props — the flagship JSONata idiom
    (``value.k > 50 ? {...} : null``) expressed as pushed-down Column ops."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select("event_id", "event_type", k.alias("k"))
        .filter(F.col("k") > 50)
    )


JSON_PROPS_SQL = """
SELECT event_id, event_type, CAST(props->>'$.k' AS INT) AS k
FROM events WHERE CAST(props->>'$.k' AS INT) > 50
"""


# ---------------------------------------------------------------------------
# C12/C13: windows and top-k
# ---------------------------------------------------------------------------

def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13 gate: top-3 lineitems per returnflag. l_returnflag has THREE
    distinct values, so the plain window plan would funnel a third of the
    corpus through one task at scale — the gate runs the partial-top-k
    path (map-side nlargest per partition, window over the bounded
    survivor set)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = R.top_k_per_group(
        li.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"),
        ["l_returnflag"],
        None,
        3,
        order_spec=[("l_extendedprice", True), ("l_orderkey", False), ("l_linenumber", False)],
    )
    return out.select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")


TOPK_SQL = """
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice, rn FROM (
  SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC) AS rn
  FROM lineitem) t
WHERE rn <= 3
"""


def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(_dec("o_totalprice")).over(w).cast("double").alias("running_total"),
        F.lag("o_orderkey", 1).over(
            Window.partitionBy("o_custkey").orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        ).alias("prev_orderkey"),
    )


WINDOW_RUNNING_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       lag(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_orderkey
FROM orders
"""


# ---------------------------------------------------------------------------
# C11: rollup / cube
# ---------------------------------------------------------------------------

def rollup_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return R.rollup_agg(
        li,
        ["l_returnflag", "l_linestatus"],
        F.count("*").alias("n"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return R.cube_agg(
        orders,
        ["o_orderstatus", "o_orderpriority"],
        F.count("*").alias("n"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total"),
    )


CUBE_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11 explicit GROUPING SETS (neither rollup nor cube): totals by
    status, by priority, and grand total — one shuffle, Catalyst expands
    the sets into a single Expand+Aggregate plan."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12 ranking-function family over one window spec: rank, dense_rank,
    ntile, lead — single sort per partition serves all four (one window
    exchange in the plan, not four)."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_orderpriority",
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
    ).filter(F.col("rnk") <= 20)


WINDOW_RANK_SQL = """
SELECT * FROM (
  SELECT o_orderpriority, o_orderkey,
         rank()       OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         ntile(4)     OVER w AS quartile,
         lead(o_orderkey, 1) OVER w AS next_orderkey
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey ASC)
) t WHERE rnk <= 20
"""


# ---------------------------------------------------------------------------
# C5-C8: join family
# ---------------------------------------------------------------------------

def semi_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having at least one open order (left-semi: no fanout)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return R.equi_join(
        cust, orders.select(F.col("o_custkey").alias("c_custkey")), ["c_custkey"], "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


SEMI_JOIN_SQL = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
"""


def anti_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT order (left-anti = NOT EXISTS).

    The right side is sliced to priority 1-URGENT so the anti set is
    NON-EMPTY at every test sf (203 rows at sf0.01) — an anti join whose
    gate passes on 0 = 0 rows proves nothing (round-6 fix; previously
    anti-joined against ALL orders, and every customer has one)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return R.equi_join(
        cust, orders.select(F.col("o_custkey").alias("c_custkey")), ["c_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
"""


def range_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 theta join: parts priced within a size-dependent band of suppliers'
    account balance decile (synthetic non-equi condition; BNLJ with broadcast
    dim — the only sane physical plan for a non-equi join)."""
    part = load_table(spark, sf_dir, "part")
    supp = load_table(spark, sf_dir, "supplier")
    cond = (F.col("p_retailprice") >= F.col("s_acctbal") / 5) & (
        F.col("p_retailprice") < F.col("s_acctbal") / 5 + 50
    )
    return (
        R.theta_join(part, F.broadcast(supp), cond)
        .select("p_partkey", "s_suppkey", "p_retailprice", "s_acctbal")
    )


RANGE_JOIN_SQL = """
SELECT p_partkey, s_suppkey, p_retailprice, s_acctbal
FROM part JOIN supplier
  ON p_retailprice >= s_acctbal / 5 AND p_retailprice < s_acctbal / 5 + 50
"""


def interval_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 at scale: the SAME point-in-interval semantics as
    range_join_parts, executed as the bucketized equi-join
    (`interval_join`) instead of a BroadcastNestedLoopJoin — the plan that
    still works when neither side broadcasts. Same SQL oracle: the
    rewrite must be invisible in the result."""
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_retailprice")
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_acctbal",
        (F.col("s_acctbal") / 5).alias("lo"),
        (F.col("s_acctbal") / 5 + 50).alias("hi"),
    )
    out = R.interval_join(part, supp, "p_retailprice", "lo", "hi", bucket_width=50.0)
    return out.select("p_partkey", "s_suppkey", "p_retailprice", "s_acctbal")


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 as-of join: latest order date at-or-before each event, per user."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    out = R.asof_join(ev, orders, "user_id", "o_custkey", "ts", "o_orderdate", "event_id")
    return out.select(
        "event_id", "user_id", F.date_format("asof_o_orderdate", "yyyy-MM-dd").alias("asof_date")
    )


ASOF_SQL = """
SELECT event_id, user_id,
       strftime((SELECT max(o_orderdate) FROM orders
             WHERE o_custkey = user_id AND o_orderdate <= ts), '%Y-%m-%d') AS asof_date
FROM events
"""


def asof_forward_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8 forward as-of: earliest order date at-or-after each event, per
    user — the direction='forward' scan of the same merge-window plan."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    orders = load_table(spark, sf_dir, "orders")
    out = R.asof_join(
        ev, orders, "user_id", "o_custkey", "ts", "o_orderdate", direction="forward"
    )
    return out.select(
        "event_id", "user_id",
        F.date_format("asof_o_orderdate", "yyyy-MM-dd").alias("asof_date"),
    )


ASOF_FORWARD_SQL = """
SELECT event_id, user_id,
       strftime((SELECT min(o_orderdate) FROM orders
             WHERE o_custkey = user_id AND o_orderdate >= ts), '%Y-%m-%d') AS asof_date
FROM events
"""


# ---------------------------------------------------------------------------
# C14/C15: set ops, distinct, dedup
# ---------------------------------------------------------------------------

def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with both a finished and an open order."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


SETOP_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with finished orders but no open orders."""
    orders = load_table(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(o)  # EXCEPT (set semantics), matching the SQL oracle


SETOP_EXCEPT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
EXCEPT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def union_party_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 UNION ALL + C9 count-distinct: customers and suppliers stacked
    with unionByName into one party relation, then per-nation totals. The
    union is plan-level concatenation (no shuffle); only the groupBy
    shuffles, on the low-cardinality nation key with map-side combine."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    both = cust.select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("kind"),
    ).unionByName(
        supp.select(
            F.col("s_nationkey").alias("nationkey"),
            F.col("s_acctbal").alias("acctbal"),
            F.lit("supplier").alias("kind"),
        )
    )
    return both.groupBy("nationkey").agg(
        F.count("*").alias("n_parties"),
        F.count_distinct("kind").alias("n_kinds"),
        F.sum(_dec("acctbal")).cast("double").alias("total_bal"),
    )


UNION_PARTIES_SQL = """
WITH parties AS (
  SELECT c_nationkey AS nationkey, c_acctbal AS acctbal, 'customer' AS kind FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey, s_acctbal AS acctbal, 'supplier' AS kind FROM supplier
)
SELECT nationkey, count(*) AS n_parties, count(DISTINCT kind) AS n_kinds,
       CAST(sum(CAST(acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM parties GROUP BY nationkey
"""


def outer_join_nation_parties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 full-outer equi-join of two aggregates: customer count vs supplier
    count per nation, nations missing on either side kept with zero counts.
    Both inputs pre-aggregate to ~nation cardinality before the join, so the
    outer join runs on tiny inputs regardless of fact-table scale (and AQE
    converts it to a broadcast join at runtime)."""
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("nationkey")).agg(F.count("*").alias("n_cust"))
    s = supp.groupBy(F.col("s_nationkey").alias("nationkey")).agg(F.count("*").alias("n_supp"))
    return c.join(s, "nationkey", "full_outer").select(
        "nationkey",
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


OUTER_JOIN_SQL = """
WITH c AS (SELECT c_nationkey AS nationkey, count(*) AS n_cust FROM customer GROUP BY 1),
     s AS (SELECT s_nationkey AS nationkey, count(*) AS n_supp FROM supplier GROUP BY 1)
SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
       coalesce(n_cust, 0) AS n_cust,
       coalesce(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey
"""


def left_join_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 left outer join keeping customers with few-or-no orders (the
    classic find-the-gaps shape; the null-extension side surfaces as
    order_count=0 and survives the post-join filter)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy(F.col("o_custkey")).agg(F.count("*").alias("n"))
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("n", F.lit(0)).alias("order_count"),
        )
        .filter(F.col("order_count") <= 3)
    )


LEFT_JOIN_GAPS_SQL = """
SELECT c_custkey, c_mktsegment, coalesce(n, 0) AS order_count
FROM customer LEFT JOIN (
  SELECT o_custkey, count(*) AS n FROM orders GROUP BY o_custkey
) o ON c_custkey = o.o_custkey
WHERE coalesce(n, 0) <= 3
"""


def distinct_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select("c_mktsegment").distinct()


DISTINCT_SQL = "SELECT DISTINCT c_mktsegment FROM customer"


def dedup_first_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15 deterministic dedup: first lineitem per order by line number."""
    li = load_table(spark, sf_dir, "lineitem")
    out = R.dedup_exact(
        li.select("l_orderkey", "l_linenumber", "l_partkey"),
        ["l_orderkey"],
        [F.col("l_linenumber").asc(), F.col("l_partkey").asc()],
    )
    return out


DEDUP_FIRST_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey FROM (
  SELECT l_orderkey, l_linenumber, l_partkey,
         row_number() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber ASC, l_partkey ASC) AS rn
  FROM lineitem) t
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# C16/C17: explode, pivot
# ---------------------------------------------------------------------------

def explode_term_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16+C24: tokenize+explode documents, top 20 terms by frequency."""
    docs = load_table(spark, sf_dir, "documents")
    tf = text.term_frequencies(docs)
    return tf.orderBy(F.col("tf").desc(), F.col("token").asc()).limit(20)


TERM_FREQ_SQL = """
SELECT token, count(*) AS tf FROM (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS token FROM documents) t
WHERE token <> ''
GROUP BY token ORDER BY tf DESC, token ASC LIMIT 20
"""


def pivot_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    out = R.pivot_table(
        li,
        ["l_returnflag"],
        "l_linestatus",
        ["F", "O"],
        F.sum(_dec("l_quantity")).cast("double"),
    )
    return out.select("l_returnflag", F.col("F").alias("qty_f"), F.col("O").alias("qty_o"))


PIVOT_SQL = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
       CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


def unpivot_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount"
    )
    return R.unpivot(
        li, ["l_orderkey", "l_linenumber"], ["l_quantity", "l_discount"], "measure", "val"
    )


UNPIVOT_SQL = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount' AS measure, l_discount AS val FROM lineitem
"""


# ---------------------------------------------------------------------------
# C24: text analysis
# ---------------------------------------------------------------------------

def text_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return text.doc_stats(docs).select(
        "doc_id", "n_tokens", "n_chars_computed", "fingerprint"
    )


TEXT_STATS_SQL = """
SELECT doc_id,
       len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS n_tokens,
       length(text) AS n_chars_computed,
       md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fingerprint
FROM documents
"""


def lang_id_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(text.lang_id(F.col("text")).alias("lang_pred"))
        .groupBy("lang_pred")
        .agg(F.count("*").alias("n"))
    )


# Oracle mirrors the same stopword-vote heuristic.
_LANG_HIT = (
    "len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),"
    " t -> list_contains({words}, t)))"
)
LANG_ID_SQL = f"""
WITH scored AS (
  SELECT {_LANG_HIT.format(words=str(list(text.STOPWORDS_EN)))} AS en,
         {_LANG_HIT.format(words=str(list(text.STOPWORDS_FR)))} AS fr,
         {_LANG_HIT.format(words=str(list(text.STOPWORDS_DE)))} AS de
  FROM documents)
SELECT CASE WHEN greatest(en, fr, de) = 0 THEN 'unknown'
            WHEN en = greatest(en, fr, de) THEN 'en'
            WHEN fr = greatest(en, fr, de) THEN 'fr'
            ELSE 'de' END AS lang_pred,
       count(*) AS n
FROM scored GROUP BY 1
"""


def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dup groups gate. The synthetic corpus holds no exact
    duplicates, so at gate scale the raw operator returns 0 rows — a
    vacuous pass (round-4 verdict item 3). Like pii_redact_docs, the gate
    PLANTS its targets: every doc with doc_id % 7 == 3 becomes shared
    boilerplate keyed by doc_id % 21 (three large dup groups), with
    case/whitespace variants by parity so the normalizing fingerprint does
    real work; all other docs keep their unique text and must NOT appear."""
    docs = load_table(spark, sf_dir, "documents")
    group = (F.col("doc_id") % 21).cast("string")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 3,
            F.when(
                F.col("doc_id") % 2 == 0,
                F.concat(F.lit("Shared Boilerplate Text "), group),
            ).otherwise(F.concat(F.lit("shared  boilerplate   text "), group)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup.exact_dup_groups(planted)


DEDUP_DOCS_SQL = """
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 3 THEN
           CASE WHEN doc_id % 2 = 0
                THEN 'Shared Boilerplate Text ' || CAST(doc_id % 21 AS VARCHAR)
                ELSE 'shared  boilerplate   text ' || CAST(doc_id % 21 AS VARCHAR) END
         ELSE text END AS text
  FROM documents)
SELECT fp, count(*) AS n_dups, min(doc_id) AS keep_id FROM (
  SELECT doc_id, md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
  FROM planted) t
GROUP BY fp HAVING count(*) > 1
"""


# ---------------------------------------------------------------------------
# C25/C26: similarity + near-dup
# ---------------------------------------------------------------------------

def cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return similarity.cosine_topk(q, emb, k=5)


COSINE_TOPK_SQL = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
pairs AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(q.qv, e.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (a, b) -> a + b)
         / (sqrt(list_reduce(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b))
          * sqrt(list_reduce(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)))
         AS sim
  FROM embeddings e CROSS JOIN q
  WHERE e.vec_id <> q.query_id)
SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM pairs) t
WHERE rank <= 5
"""


def knn_graph_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C70: corpus-internal kNN graph — every vector's top-3 cosine
    neighbors within the same table (GEMM winnow to k+margin candidate
    edges, Catalyst-fold re-rank so ranking is engine-exact). The oracle
    is the full brute-force per-node window; the LSH self-join tier is
    the non-broadcastable-corpus path (recall unit-tested)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.knn_graph(emb, k=3, strategy="gemm")


KNN_GRAPH_SQL = """
WITH pairs AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
         / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
          * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)))
         AS sim
  FROM embeddings a CROSS JOIN embeddings b
  WHERE a.vec_id <> b.vec_id)
SELECT query_id, neighbor_id, round(sim, 4) AS cosine_sim, rank FROM (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM pairs) t
WHERE rank <= 3
"""


def token_count_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C24 token budgeting: whitespace tokens and BPE-ish (GPT-2-style
    pre-tokenization regex) piece counts per document — the JVM-regex
    pass a corpus-budget pipeline runs before training."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_ws_tokens"),
        text.bpe_ish_token_count(F.col("text")).alias("n_bpe_tokens"),
    )


TOKEN_COUNT_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]')) AS INT) AS n_bpe_tokens
FROM documents
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25 scale path #2: IVF-flat — coarse cells + probe-nearest-cells +
    exact re-rank.

    Gate parameters (n_probe=12 of 16 cells) are chosen so recall@5 is
    exactly 1.0 on the synthetic embeddings at sf0.001/0.01/0.1 (verified
    empirically; deterministic — seeded centroids, stable tie-breaks), which
    makes the brute-force COSINE_TOPK_SQL an exact value oracle for the
    whole approximate pipeline: candidate generation, probe join, re-rank
    and top-k all have to be right for the hash to match. The
    aggressive-pruning operating point (n_probe=4) keeps its recall-floor
    pin in tests/test_queries_smoke.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    return similarity.ivf_topk(q, emb, k=5, n_cells=16, n_probe=12)


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25 scale path: random-hyperplane LSH candidate generation + exact
    re-rank. The corpus shuffles on (band, signature) with bounded fanout
    instead of cross-joining.

    Gate parameters (32 bands x 3 bits) give recall@5 = 1.0 on the
    synthetic embeddings at sf0.001/0.01/0.1 (verified empirically;
    deterministic — seeded hyperplanes, stable tie-breaks), so the
    brute-force COSINE_TOPK_SQL is an exact value oracle for the full LSH
    pipeline. The synthetic corpus is near-orthogonal (true top-5 cosine
    ~0.25-0.40), so recall-1.0 settings barely prune HERE — on real
    embedding corpora (neighbor cosine >=0.7) the same machinery prunes
    hard; the pruning/recall tradeoff is pinned separately in
    tests/test_queries_smoke.py with aggressive parameters."""
    emb = load_table(spark, sf_dir, "embeddings")
    # vector width via the per-application metadata memo (readers.py) —
    # drops the single-row probe job from steady-state construction
    dim = embedding_dim(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    return similarity.lsh_topk(q, emb, k=5, dim=dim, n_bands=32, band_bits=3)


def ngram_jaccard_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT near-dup pairs by token 3-gram Jaccard >= 0.5 via a
    prefix-filtered set-similarity self-join (AllPairs/PPJoin family) —
    lossless, so the oracle is the brute-force all-pairs answer."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, threshold=0.5)


NGRAM_JACCARD_SQL = """
WITH toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
  FROM documents),
docs AS (
  SELECT doc_id,
         CASE WHEN len(ts) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(ts) - 2),
                         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
         ELSE [] END AS grams
  FROM toks)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
             len(list_distinct(list_concat(a.grams, b.grams))), 4) AS jaccard
FROM docs a JOIN docs b ON a.doc_id < b.doc_id
WHERE len(list_distinct(list_concat(a.grams, b.grams))) > 0
  AND CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
      len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
"""


def hash_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 10% content-hash sample (training-pipeline sampling:
    reproducible across engines/runs/partitionings, pushdown-friendly
    map-side filter). Oracle: identical md5-threshold predicate."""
    from kafka_connect_jsonata_spark.operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.1).select("doc_id", "lang")


HASH_SAMPLE_SQL = """
SELECT doc_id, lang FROM documents
WHERE md5(CAST(doc_id AS VARCHAR)) < '19999999000000000000000000000000'
"""


def hash_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by content hash —
    exhaustive, disjoint, leakage-safe. Returns per-split doc counts."""
    from kafka_connect_jsonata_spark.operators.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    splits = hash_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    parts = [
        df.select(F.lit(name).alias("split")).groupBy("split").agg(F.count("*").alias("n"))
        for name, df in splits.items()
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


HASH_SPLIT_SQL = """
SELECT CASE
         WHEN md5(CAST(doc_id AS VARCHAR)) < 'cccccccc000000000000000000000000' THEN 'train'
         WHEN md5(CAST(doc_id AS VARCHAR)) < 'e6666666000000000000000000000000' THEN 'val'
         ELSE 'test'
       END AS split,
       count(*) AS n
FROM documents GROUP BY 1
"""


def safe_transform_dlq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 error path: error-tolerant transform with dead-letter routing
    (Connect errors.tolerance=all). $error() raises per record; failures
    become (error_code, error, record) rows instead of job failures —
    guards (timeout/depth) route the same way. Per-record id recovered
    from the ok payload or the DLQ record JSON."""
    from kafka_connect_jsonata_spark.transform import transform_safe

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = transform_safe(
        docs, 'n_chars <= 260 ? {"id": doc_id} : $error("oversize document")'
    )
    return out.select(
        F.coalesce(
            F.get_json_object("value_json", "$.id"),
            F.get_json_object("record_json", "$.doc_id"),
        )
        .cast("bigint")
        .alias("doc_id"),
        "status",
        "error_code",
        "error",
    )


SAFE_TRANSFORM_SQL = """
SELECT doc_id,
       CASE WHEN n_chars <= 260 THEN 'ok' ELSE 'error' END AS status,
       CASE WHEN n_chars <= 260 THEN NULL ELSE 'D3137' END AS error_code,
       CASE WHEN n_chars <= 260 THEN NULL ELSE 'D3137: oversize document' END AS error
FROM documents
"""


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 5-per-language stratified sample (training-mix
    balancing). One shuffle keyed by the stratum; per-group output bounded
    at n regardless of skew. Oracle: identical md5-order row_number."""
    from kafka_connect_jsonata_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, "doc_id", "lang", 5).select("doc_id", "lang")


STRATIFIED_SAMPLE_SQL = """
SELECT doc_id, lang FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents) t
WHERE rn <= 5
"""


def shuffle_positions_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C28 epoch shuffle: every doc's global position under the seed-7
    content-hash permutation — two-phase distributed prefix rank, never a
    single-task global window. The oracle IS the naive global window: the
    distributed rank must reproduce it exactly."""
    from kafka_connect_jsonata_spark.operators.sampling import deterministic_shuffle

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(docs, "doc_id", seed=7).select("doc_id", "shuffle_pos")


SHUFFLE_POSITIONS_SQL = """
SELECT doc_id,
       CAST(row_number() OVER (ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id) - 1
            AS BIGINT) AS shuffle_pos
FROM documents
"""


def mixture_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C28 data-mixture step: per-source keep rates (src0 100%, src1 50%,
    src2 25%, everything else 10%) via the md5-position predicate — one
    map-side filter, no shuffle, no RNG; membership is a pure function of
    content so the mixture is reproducible on any engine."""
    from kafka_connect_jsonata_spark.operators.sampling import mixture_sample

    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(
        docs,
        "doc_id",
        "source",
        {"src0": 1.0, "src1": 0.5, "src2": 0.25},
        default_rate=0.1,
    ).select("doc_id", "source")


MIXTURE_SAMPLE_SQL = """
SELECT doc_id, source FROM documents
WHERE md5(CAST(doc_id AS VARCHAR)) <
      CASE source
        WHEN 'src0' THEN 'gggggggggggggggggggggggggggggggg'
        WHEN 'src1' THEN '80000000000000000000000000000000'
        WHEN 'src2' THEN '40000000000000000000000000000000'
        ELSE '19999999000000000000000000000000'
      END
"""


def pack_token_budget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing at 512 tokens/pack: per document
    the global start offset, owning pack, and boundary-straddle flag.
    Spark side is the two-phase distributed prefix sum
    (operators/packing.py — per-bucket totals + within-bucket running sum,
    never a single-partition global window); the oracle is the
    straightforward global window cumsum DuckDB can afford at gate scale."""
    from kafka_connect_jsonata_spark.operators.packing import pack_token_budget

    docs = load_table(spark, sf_dir, "documents")
    return pack_token_budget(docs, budget=512)


PACK_TOKEN_BUDGET_SQL = r"""
WITH t AS (
  SELECT doc_id,
         CAST(COALESCE(len(regexp_extract_all(text, '\S+')), 0) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_offset
  FROM t)
SELECT doc_id, n_tokens, start_offset,
       CAST(start_offset // 512 AS BIGINT) AS pack_id,
       (n_tokens > 0 AND
        start_offset // 512 <> (start_offset + n_tokens - 1) // 512)
       AS spans_boundary
FROM c
"""


_BM25_TERMS = ["spark", "vector", "stream"]


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C24 keyword relevance search: BM25 top-20 documents for a fixed
    query. The plan has zero per-token shuffles — tf/dl are map-side
    Column math over the token array, corpus stats one broadcast row
    (functions/text.py:bm25_scores) — and the per-term score sum is a
    static expression in term order, so the SQL oracle reproduces it
    bit-for-bit."""
    docs = load_table(spark, sf_dir, "documents")
    scored = text.bm25_scores(docs, _BM25_TERMS)
    # distributed top-k (TakeOrderedAndProject) first; the single-partition
    # rank window then only ever sees 20 rows
    top = scored.orderBy(F.col("score").desc(), F.col("doc_id")).limit(20)
    w = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", F.round("score", 4).alias("bm25"), "rank"
    )


_BM25_TOKS = "list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '')"
_BM25_TF = (
    "len(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t = '{term}'))"
)
# Same arithmetic, same term order, same fold shapes as bm25_scores —
# value-exact (k1=1.2, b=0.75; Spark ln == DuckDB ln on doubles).
BM25_SQL = f"""
WITH per_doc AS (
  SELECT doc_id,
         len({_BM25_TOKS}) AS dl,
         {_BM25_TF.format(term="spark")} AS tf_0,
         {_BM25_TF.format(term="vector")} AS tf_1,
         {_BM25_TF.format(term="stream")} AS tf_2
  FROM documents),
stats AS (
  SELECT count(*) AS n_docs, sum(dl) AS sum_dl,
         sum(CASE WHEN tf_0 > 0 THEN 1 ELSE 0 END) AS df_0,
         sum(CASE WHEN tf_1 > 0 THEN 1 ELSE 0 END) AS df_1,
         sum(CASE WHEN tf_2 > 0 THEN 1 ELSE 0 END) AS df_2
  FROM per_doc),
scored AS (
  SELECT doc_id,
         (0.0
          + ln((n_docs - CAST(df_0 AS DOUBLE) + 0.5) / (CAST(df_0 AS DOUBLE) + 0.5) + 1.0)
            * CAST(tf_0 AS DOUBLE) * 2.2
            / (CAST(tf_0 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
          + ln((n_docs - CAST(df_1 AS DOUBLE) + 0.5) / (CAST(df_1 AS DOUBLE) + 0.5) + 1.0)
            * CAST(tf_1 AS DOUBLE) * 2.2
            / (CAST(tf_1 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
          + ln((n_docs - CAST(df_2 AS DOUBLE) + 0.5) / (CAST(df_2 AS DOUBLE) + 0.5) + 1.0)
            * CAST(tf_2 AS DOUBLE) * 2.2
            / (CAST(tf_2 AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl AS DOUBLE) / (CAST(sum_dl AS DOUBLE) / n_docs)))
         ) AS score
  FROM per_doc CROSS JOIN stats
  WHERE tf_0 > 0 OR tf_1 > 0 OR tf_2 > 0)
SELECT doc_id, round(score, 4) AS bm25, rank FROM (
  SELECT doc_id, score, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM scored) t
WHERE rank <= 20
"""


def embedding_quantize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25 embedding storage prep: unit-normalize + symmetric int8
    quantization, verified per vector by exact integer checksums. All
    map-side Column math (functions/similarity.py) — no shuffle, no
    Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    q = similarity.quantize_int8(v)
    return emb.select(
        "vec_id",
        F.round(similarity.l2_norm(v), 4).alias("l2_before"),
        F.round(similarity.l2_norm(similarity.l2_normalize(v)), 4).alias("l2_after"),
        F.aggregate(q, F.lit(0).cast("long"), lambda acc, x: acc + x).alias("q8_sum"),
        F.array_max(q).alias("q8_max"),
        F.array_min(q).alias("q8_min"),
    )


_Q8 = (
    "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
    " / list_aggregate(list_transform(embedding, y -> abs(CAST(y AS DOUBLE))), 'max')"
    " * 127) AS INT))"
)
_NORM = (
    "sqrt(list_reduce(list_transform({v}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),"
    " (a, b) -> a + b))"
)
EMBEDDING_QUANTIZE_SQL = f"""
SELECT vec_id,
       round({_NORM.format(v="embedding")}, 4) AS l2_before,
       round({_NORM.format(v=f"list_transform(embedding, e -> CAST(e AS DOUBLE) / {_NORM.format(v='embedding')})")}, 4) AS l2_after,
       CAST(list_reduce({_Q8}, (a, b) -> a + b) AS BIGINT) AS q8_sum,
       list_aggregate({_Q8}, 'max') AS q8_max,
       list_aggregate({_Q8}, 'min') AS q8_min
FROM embeddings
"""


def dedup_group_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C26 end-to-end: exact near-dup PAIRS -> connected-component GROUPS
    (canonical min-id per cluster) via iterative label propagation — the
    iterative-algorithm shape Spark runs as bounded join+groupBy rounds.
    Oracle: DuckDB recursive CTE over the same exact pair set."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
    return dedup.dup_groups_from_pairs(pairs)


DEDUP_GROUPS_SQL = """
WITH RECURSIVE toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS ts
  FROM documents),
docs AS (
  SELECT doc_id,
         CASE WHEN len(ts) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(ts) - 2),
                         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]))
         ELSE [] END AS grams
  FROM toks),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM docs a JOIN docs b ON a.doc_id < b.doc_id
  WHERE len(list_distinct(list_concat(a.grams, b.grams))) > 0
    AND CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) /
        len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src)
SELECT src AS doc_id, LEAST(src, MIN(dst)) AS group_id
FROM reach GROUP BY src
"""


def jsonata_object_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B4 object functions on the COMPILED tier, oracle-gated: $sift picks
    fields statically (the reference's remove-field idiom), $merge overlays
    the result with computed fields — the whole expression is a Catalyst
    projection."""
    cust = load_table(spark, sf_dir, "customer")
    expr = (
        "$merge([$sift($, function($v, $k) { $k = 'c_custkey' or $k = 'c_name' }),"
        " {'bal2': c_acctbal * 2, 'seg_lower': $lowercase(c_mktsegment)}])"
    )
    return transform(cust, expr, force_tier="compiled")


JSONATA_OBJECT_OPS_SQL = """
SELECT c_custkey, c_name, c_acctbal * 2 AS bal2, lower(c_mktsegment) AS seg_lower
FROM customer
"""


def jsonata_transform_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2.6 transform operator ``~> |pattern|update, delete|`` on the
    COMPILED tier (round 9), oracle-gated: the reference SMT's
    record-update idiom — rewrite fields of a nested record struct in
    place, add a computed field, drop one — compiled to withField/
    dropFields, a pure Catalyst projection (plan-pinned in
    tests/test_round9_compile.py)."""
    cust = load_table(spark, sf_dir, "customer")
    base = cust.select(
        F.col("c_custkey").alias("id"),
        F.struct(
            F.col("c_name").alias("name"),
            F.col("c_acctbal").alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        ).alias("acct"),
    )
    expr = (
        "$ ~> |acct|{'bal': bal * 2,"
        " 'tier': bal >= 5000 ? 'gold' : 'std'}, ['seg']|"
    )
    out = transform(base, expr, force_tier="compiled")
    return out.select(
        "id",
        F.col("acct.name").alias("name"),
        F.col("acct.bal").alias("bal"),
        F.col("acct.tier").alias("tier"),
    ).orderBy("id")


JSONATA_TRANSFORM_UPDATE_SQL = """
SELECT c_custkey AS id, c_name AS name,
       c_acctbal * 2 AS bal,
       CASE WHEN c_acctbal >= 5000 THEN 'gold' ELSE 'std' END AS tier
FROM customer ORDER BY id
"""


def envelope_reroute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/A6 through the full dynamic-envelope pipeline, oracle-gated:
    wrap events as ConnectRecord envelopes, rewrite topic + partition with
    the reference's $merge idiom (README.md:21-27 shape), read fields back
    out of the value JSON. Runs in the interpreter tier (schema-as-data)."""
    from kafka_connect_jsonata_spark.envelope import wrap_as_dynamic_envelope
    from kafka_connect_jsonata_spark.transform import transform_envelope

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    env = wrap_as_dynamic_envelope(ev, topic="events", key_col="event_id")
    out = transform_envelope(env, "$merge([$, {'topic': 'purchases', 'kafkaPartition': 3}])")
    return out.select(
        "topic",
        "kafkaPartition",
        F.col("key").cast("bigint").alias("event_id"),
        F.get_json_object("value", "$.event_type").alias("event_type"),
    )


ENVELOPE_REROUTE_SQL = """
SELECT 'purchases' AS topic, 3 AS kafkaPartition, event_id, event_type
FROM events
"""


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 under skew: customer->nation on nationkey (25 hot keys — the
    shape where one key's rows swamp a task) through salted_join, then
    aggregate. The oracle is the PLAIN join: salting must be invisible in
    the result."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey"), "c_acctbal"
    )
    nat = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("nationkey"), "n_name"
    )
    j = R.salted_join(cust, nat, ["nationkey"], n_salts=8)
    return j.groupBy("n_name").agg(
        F.count("*").alias("n_cust"),
        F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
    )


SKEW_SALTED_JOIN_SQL = """
SELECT n_name,
       count(*) AS n_cust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def skew_split_right_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 skew completeness (round-4 verdict item 8): RIGHT OUTER join
    through the hot-key split — hot custkeys route through the salted
    inner join + broadcast-anti unmatched recovery, cold keys through a
    plain right join, unioned. The oracle is the PLAIN right join: the
    split must be invisible in the result (customers without orders
    null-extend exactly once)."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"), "o_totalprice"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_mktsegment", "c_acctbal"
    )
    j = R.skew_split_join(
        orders, cust, ["custkey"], how="right", hot_keys=[(1,), (2,), (5,), (7,)], n_salts=8
    )
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.count("o_totalprice").alias("n_matched"),
        F.sum(_dec("o_totalprice")).cast("double").alias("total_price"),
        F.sum(_dec("c_acctbal")).cast("double").alias("total_bal"),
    )


SKEW_SPLIT_RIGHT_SQL = """
SELECT c_mktsegment,
       count(*) AS n_rows,
       count(o_totalprice) AS n_matched,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


def udtf_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C27 UDTF hosting through the oracle gate: the set-returning JSONata
    transform ($split -> one row per token) over a bounded doc slice; the
    oracle is DuckDB's UNNEST with an indexed list_transform."""
    from kafka_connect_jsonata_spark.transform import transform_explode

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return transform_explode(docs, "$split(text, ' ')")


UDTF_EXPLODE_SQL = """
SELECT s.pos AS pos, s.item_json AS item_json
FROM (
  SELECT unnest(list_transform(string_split(text, ' '),
                (x, i) -> {'pos': i - 1, 'item_json': to_json(x)})) AS s
  FROM documents WHERE doc_id < 20
)
"""


# ---------------------------------------------------------------------------
# C19/C20: event-time windows (batch emulation of the streaming operators —
# the streaming path itself is covered rows-only in tests/test_streaming.py)
# ---------------------------------------------------------------------------

def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C19 tumbling 1h window aggregation over events (same groupBy(window)
    plan Structured Streaming runs incrementally)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("value")).cast("double").alias("total"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


TUMBLING_SQL = """
SELECT strftime(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:%M') AS window_start,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events GROUP BY 1, 2
"""


def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C19 sliding (hopping) 1h/30min window aggregation — each event lands
    in duration/slide = 2 windows; same groupBy(window) plan Structured
    Streaming runs incrementally. Oracle replicates the window expansion
    with an UNNEST over hop offsets."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("value")).cast("double").alias("total"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm").alias("window_start"),
            "event_type",
            "n",
            "total",
        )
    )


SLIDING_SQL = """
SELECT strftime(time_bucket(INTERVAL '30 minutes', ts) - to_minutes(30 * k), '%Y-%m-%d %H:%M') AS window_start,
       event_type, count(*) AS n,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM events, UNNEST([0, 1]) AS t(k)
GROUP BY 1, 2
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C20 batch sessionization: lag-gap detection + running session count —
    the classic window-function sessionizer (streaming variant uses
    session_window, tests/test_streaming.py)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    gap_us = 30 * 60 * 1_000_000  # microsecond precision on both engines
    us = ts_micros(F.col("ts"))
    with_gap = ev.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w) > gap_us, 1)
        .otherwise(F.when(F.lag("ts").over(w).isNull(), 1).otherwise(0)),
    )
    with_sid = with_gap.withColumn(
        "session_id", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_sid.groupBy("user_id", "session_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min(ts_micros(F.col("ts"))).alias("start_us"),
            F.max(ts_micros(F.col("ts"))).alias("end_us"),
        )
    )


SESSIONIZE_SQL = """
WITH gaps AS (
  SELECT user_id, event_id, ts,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000 THEN 1
              WHEN lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
sids AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
  FROM gaps)
SELECT user_id, session_id, count(*) AS n_events,
       min(epoch_us(ts)) AS start_us, max(epoch_us(ts)) AS end_us
FROM sids GROUP BY user_id, session_id
"""


# ---------------------------------------------------------------------------
# C10: approximate / exact distributional aggregates
# ---------------------------------------------------------------------------

def percentile_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 exact interpolated percentiles per group (approx variant is
    approx_distinct_stats, rows-only)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("p50"),
        F.percentile("l_quantity", 0.9).alias("p90"),
    )


PERCENTILE_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS p50,
       quantile_cont(l_quantity, 0.9) AS p90
FROM lineitem GROUP BY l_returnflag
"""


def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 approx: HLL distinct + approx percentile, made oracle-checkable
    by emitting the EXACT aggregates plus error-bound booleans for the
    sketches. The sketch values themselves are deterministic but engine-
    specific, so the hash compares the exact columns and the bound checks:
    HLL++ (rsd 0.05 default) must land within 5% of the exact distinct
    count, approx median (accuracy 10000) between the exact p40/p60. A
    broken sketch flips a boolean and fails the hash."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.count_distinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey").alias("__approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5).alias("__approx_median"),
        F.percentile("l_extendedprice", 0.4).alias("__p40"),
        F.percentile("l_extendedprice", 0.6).alias("__p60"),
    )
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (
            F.abs(F.col("__approx_parts") - F.col("exact_parts"))
            <= 0.05 * F.col("exact_parts")
        ).alias("hll_within_5pct"),
        (
            (F.col("__approx_median") >= F.col("__p40"))
            & (F.col("__approx_median") <= F.col("__p60"))
        ).alias("approx_median_in_p40_p60"),
    )


APPROX_DISTINCT_SQL = """
SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       TRUE AS hll_within_5pct,
       TRUE AS approx_median_in_p40_p60
FROM lineitem GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# C26: minhash-LSH and simhash near-dup (sketch-based candidate generation)
# ---------------------------------------------------------------------------

def minhash_lsh_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+banded-LSH near-dup pairs verified by exact shingle Jaccard,
    oracle-checked against brute-force all-pairs SQL on a high-similarity
    slice.

    Precision is 1 by construction (exact verify). Recall is probabilistic
    in general, but on the synthetic corpus every true near-dup pair has
    char-5-gram Jaccard >= 0.92 (next pair down is < 0.5), and at J=0.92
    a (32-hash, 8-band, r=4) LSH misses with p ~= 4e-5 per pair — and the
    seeded hash family is deterministic, so the sf0.001/0.01/0.1 outputs
    were verified equal to brute force. Thresholding the output at 0.9
    therefore makes MINHASH_LSH_SQL (brute-force char-5-gram Jaccard with a
    size-ratio prefilter) an exact value oracle for the whole sketch
    pipeline: shingling, signatures, banding, candidate gen and verify all
    must be right for the hash to match."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, num_hashes=32, n_bands=8, threshold=0.9)


# Brute-force verifier for the J >= 0.9 slice. list_intersect-per-pair is
# quadratic — fine as a sf0.01 oracle, never a production plan (the Spark
# side is the point: LSH shuffles (id, band, bucket) only). The size-ratio
# prefilter (J >= t needs |A|/|B| within [t, 1/t]) keeps the oracle cheap.
MINHASH_LSH_SQL = """
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(s)-4,1)+1),
                                      i -> s[i:i+4])) AS grams
  FROM (SELECT doc_id,
               lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS s
        FROM documents)),
sized AS (SELECT doc_id, grams, len(grams) AS sz FROM g)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       round(len(list_intersect(a.grams, b.grams))::DOUBLE /
             (a.sz + b.sz - len(list_intersect(a.grams, b.grams))), 4) AS jaccard
FROM sized a JOIN sized b
  ON a.doc_id < b.doc_id
 AND a.sz >= 0.9 * b.sz AND b.sz >= 0.9 * a.sz
WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
      (a.sz + b.sz - len(list_intersect(a.grams, b.grams))) >= 0.9
"""


def minhash_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C79 end-to-end composed fuzzy dedup: MinHash -> banded LSH ->
    exact-Jaccard verify -> connected components -> keep-min-id, as ONE
    operator call returning the kept corpus (the canonical 100-TB curation
    job). Same LSH parameters as the minhash_lsh_dups gate, whose recall
    on this corpus is exact (J >= 0.92 vs < 0.5 margin, miss p ~= 4e-5 —
    see that gate's docstring), so the brute-force SQL closure is an exact
    value oracle for the whole composition: any error in signatures,
    banding, verify, component labels, or the anti-join changes the kept
    id set and the hash."""
    docs = load_table(spark, sf_dir, "documents")
    kept = dedup.minhash_dedup(docs, num_hashes=32, n_bands=8, threshold=0.9)
    return kept.select("doc_id", "lang", F.length("text").alias("text_len"))


# Brute-force oracle for the composed dedup: exact J >= 0.9 pairs (the
# MINHASH_LSH_SQL core), undirected transitive closure (recursive CTE),
# drop every doc that can reach a smaller id (== keep the component
# minimum), then project the kept rows.
MINHASH_DEDUP_SQL = """
WITH RECURSIVE g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(s)-4,1)+1),
                                      i -> s[i:i+4])) AS grams
  FROM (SELECT doc_id,
               lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS s
        FROM documents)),
sized AS (SELECT doc_id, grams, len(grams) AS sz FROM g),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sized a JOIN sized b
    ON a.doc_id < b.doc_id
   AND a.sz >= 0.9 * b.sz AND b.sz >= 0.9 * a.sz
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
        (a.sz + b.sz - len(list_intersect(a.grams, b.grams))) >= 0.9),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
dropped AS (SELECT DISTINCT src AS doc_id FROM reach WHERE dst < src)
SELECT d.doc_id, d.lang, CAST(length(d.text) AS INT) AS text_len
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def minhash_dedup_boiler_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C79 hot-bucket stress gate (round-9, round-8 verdict item 1): the
    corpus is every document PLUS three byte-identical replicas under
    offset ids — the crawl-boilerplate shape whose LSH buckets used to
    expand k^2/2 candidate structs inside one task. Exact pre-collapse
    (Lee et al. 2021 §4) feeds ONE representative per identical class into
    LSH and bucket_cap guards the residual near-identical classes, so the
    job stays population-linear — and the kept set is PROVABLY unchanged:
    every replica has its original's exact shingle set, so it joins the
    original's component (J = 1.0) and loses to the smaller original id,
    while adding no new near-dup structure among the originals. The oracle
    is therefore the PLAIN-corpus dedup closure (MINHASH_DEDUP_SQL,
    verbatim): any candidate the collapse or the cap wrongly drops — or
    any replica wrongly kept — changes the id set and the hash."""
    docs = load_table(spark, sf_dir, "documents")
    rep = docs
    for k in range(1, 4):  # 10M offset clears every SF's id range
        rep = rep.union(
            docs.withColumn("doc_id", F.col("doc_id") + F.lit(10_000_000 * k))
        )
    kept = dedup.minhash_dedup(rep, num_hashes=32, n_bands=8, threshold=0.9)
    return kept.select("doc_id", "lang", F.length("text").alias("text_len"))


def minhash_dedup_best_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C79 keep='best': same composed dedup, but each duplicate component
    keeps its highest-quality copy (score = text length here; any quality
    signal plugs in) with min-id tie-break — the FineWeb-style survivor
    policy. The rank window runs over grouped docs only (output-sized)."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "__q", F.length("text")
    )
    kept = dedup.minhash_dedup(
        docs, num_hashes=32, n_bands=8, threshold=0.9,
        keep="best", score_col="__q",
    )
    return kept.select("doc_id", "lang", F.col("__q").alias("text_len"))


MINHASH_DEDUP_BEST_SQL = """
WITH RECURSIVE g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(s)-4,1)+1),
                                      i -> s[i:i+4])) AS grams
  FROM (SELECT doc_id,
               lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS s
        FROM documents)),
sized AS (SELECT doc_id, grams, len(grams) AS sz FROM g),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sized a JOIN sized b
    ON a.doc_id < b.doc_id
   AND a.sz >= 0.9 * b.sz AND b.sz >= 0.9 * a.sz
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
        (a.sz + b.sz - len(list_intersect(a.grams, b.grams))) >= 0.9),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
labels AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS group_id
  FROM reach GROUP BY src),
losers AS (
  SELECT doc_id FROM (
    SELECT l.doc_id,
           row_number() OVER (PARTITION BY l.group_id
                              ORDER BY length(d.text) DESC, l.doc_id ASC) AS r
    FROM labels l JOIN documents d USING (doc_id))
  WHERE r > 1)
SELECT d.doc_id, d.lang, CAST(length(d.text) AS INT) AS text_len
FROM documents d
WHERE d.doc_id NOT IN (SELECT doc_id FROM losers)
"""


def minhash_dedup_incr_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C81 incremental dedup: the doc_id % 3 == 0 slice plays the
    historical kept corpus, the rest is the new batch — new docs
    near-dup with history are dropped (cross-corpus LSH match, reference
    never broadcast), survivors are fuzzy-deduped among themselves.
    Oracle = brute-force cross pairs + intra closure in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    new = docs.filter(F.col("doc_id") % 3 != 0)
    kept = dedup.minhash_dedup_incremental(
        new, ref, num_hashes=32, n_bands=8, threshold=0.9
    )
    return kept.select("doc_id", "lang", F.length("text").alias("text_len"))


MINHASH_DEDUP_INCR_SQL = """
WITH RECURSIVE g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(s)-4,1)+1),
                                      i -> s[i:i+4])) AS grams
  FROM (SELECT doc_id,
               lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS s
        FROM documents)),
sized AS (SELECT doc_id, grams, len(grams) AS sz FROM g),
refd AS (SELECT * FROM sized WHERE doc_id % 3 = 0),
newd AS (SELECT * FROM sized WHERE doc_id % 3 <> 0),
hit AS (
  SELECT DISTINCT n.doc_id
  FROM newd n JOIN refd r
    ON n.sz >= 0.9 * r.sz AND r.sz >= 0.9 * n.sz
  WHERE len(list_intersect(n.grams, r.grams))::DOUBLE /
        (n.sz + r.sz - len(list_intersect(n.grams, r.grams))) >= 0.9),
fresh AS (SELECT * FROM newd WHERE doc_id NOT IN (SELECT doc_id FROM hit)),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM fresh a JOIN fresh b
    ON a.doc_id < b.doc_id
   AND a.sz >= 0.9 * b.sz AND b.sz >= 0.9 * a.sz
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
        (a.sz + b.sz - len(list_intersect(a.grams, b.grams))) >= 0.9),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
dropped AS (SELECT DISTINCT src AS doc_id FROM reach WHERE dst < src)
SELECT d.doc_id, d.lang, CAST(length(d.text) AS INT) AS text_len
FROM documents d
WHERE d.doc_id % 3 <> 0
  AND d.doc_id NOT IN (SELECT doc_id FROM hit)
  AND d.doc_id NOT IN (SELECT doc_id FROM dropped)
"""


def simhash_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash per document (pure Column bit math, no UDF). The gate runs
    the md5-parity portable variant so the DuckDB oracle can rebuild every
    signature bit-for-bit — value-exact evidence for the majority-vote
    core that the xxhash64 production variant (dedup.simhash64, pinned by
    unit tests) shares. Repartitioned so the compute-bound signature
    projection uses every core even when the scan is one small file (at
    100 TB the scan itself yields thousands of partitions and
    ``spread_narrow_scan`` detects that and skips the shuffle — round 13:
    the spread is now conditional instead of unconditional)."""
    docs = load_table(spark, sf_dir, "documents")
    docs = dedup.spread_narrow_scan(docs.select("doc_id", "text"))
    return docs.select(
        "doc_id", dedup.simhash_portable(F.col("text")).alias("simhash")
    )


SIMHASH_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents
), bits AS (
  SELECT doc_id, g.i,
         sum(CASE WHEN substr(md5(tok), g.i + 1, 1)
                       IN ('1','3','5','7','9','b','d','f')
                  THEN 1 ELSE 0 END) AS c,
         count(*) AS n
  FROM toks CROSS JOIN generate_series(0, 31) AS g(i)
  GROUP BY doc_id, g.i
), sigs AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN 2 * c > n THEN CAST(power(2, i) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id, CAST(coalesce(s.simhash, 0) AS BIGINT) AS simhash
FROM documents d LEFT JOIN sigs s USING (doc_id)
"""


def simhash_dup_pairs_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C83: SimHash near-dup pairs at Hamming <= 3 via the Manku et al.
    banded EXACT algorithm (pigeonhole: 4 chunks, any qualifying pair
    shares one whole chunk — recall 1.0 by construction, popcount
    verify for precision). Gate runs the md5-parity portable signature
    so the oracle recomputes every bit and the brute-force Hamming join
    is a value-exact check of banding + candidate gen + verify."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.simhash_dup_pairs(
        docs, max_hamming=3, portable=True
    ).select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


SIMHASH_PAIRS_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                            t -> t <> '')) AS tok
  FROM documents
), bits AS (
  SELECT doc_id, g.i,
         sum(CASE WHEN substr(md5(tok), g.i + 1, 1)
                       IN ('1','3','5','7','9','b','d','f')
                  THEN 1 ELSE 0 END) AS c,
         count(*) AS n
  FROM toks CROSS JOIN generate_series(0, 31) AS g(i)
  GROUP BY doc_id, g.i
), sigs AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN 2 * c > n THEN CAST(power(2, i) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS simhash
  FROM bits GROUP BY doc_id
), s AS (
  SELECT d.doc_id, CAST(coalesce(g.simhash, 0) AS BIGINT) AS sig
  FROM documents d LEFT JOIN sigs g USING (doc_id))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= 3
"""


def embedding_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C26 embedding near-dup pairs. Threshold 0.4 yields a non-trivial
    pair set on the synthetic embeddings (max pairwise cosine ~0.51)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return dedup.embedding_dup_pairs(emb, threshold=0.4)


EMBEDDING_DUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(
         list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                     p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
         / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
          * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))), 4)
       AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
      / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
       * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y)))
      >= 0.4
"""


# ---------------------------------------------------------------------------
# A1/A4 + B-surface: JSONata transforms (the reference's core capability)
# ---------------------------------------------------------------------------

_FLAGSHIP_EXPR = "props.k > 50 ? {'event_id': event_id, 'k': props.k} : null"


def _events_with_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.withColumn("props", F.from_json("props", "struct<k:int>"))


def jsonata_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's README idiom (JSON-field filter + projection +
    tombstone drop, README.md:13-19) as a JSONata expression compiled to
    native Columns (tier 1): pure Catalyst projection+filter, pushdown
    applies, no Python at runtime."""
    return transform(_events_with_props(spark, sf_dir), _FLAGSHIP_EXPR, force_tier="compiled")


def jsonata_interpreter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same expression through the tier-2 interpreter UDF (Arrow-batched) —
    the fully-general path; also serves as the tier-equivalence check."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [T.StructField("event_id", T.LongType()), T.StructField("k", T.IntegerType())]
    )
    return transform(
        _events_with_props(spark, sf_dir),
        _FLAGSHIP_EXPR,
        force_tier="interpreter",
        output_schema=schema,
    )


JSONATA_FLAGSHIP_SQL = """
SELECT event_id, CAST(props->>'$.k' AS INT) AS k
FROM events WHERE CAST(props->>'$.k' AS INT) > 50
"""


def jsonata_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compiled JSONata scalar-function coverage over customer rows."""
    cust = load_table(spark, sf_dir, "customer")
    expr = (
        "{'c_custkey': c_custkey,"
        " 'name_up': $uppercase(c_name),"
        " 'name_len': $length(c_name),"
        " 'seg3': $substring(c_mktsegment, 0, 3),"
        " 'id_str': $string(c_custkey),"
        " 'bal2': $round(c_acctbal / 7, 2)}"
    )
    return transform(cust, expr, force_tier="compiled")


JSONATA_STRING_OPS_SQL = """
SELECT c_custkey,
       upper(c_name) AS name_up,
       length(c_name) AS name_len,
       substr(c_mktsegment, 1, 3) AS seg3,
       CAST(c_custkey AS VARCHAR) AS id_str,
       round(c_acctbal / 7, 2) AS bal2
FROM customer
"""


def jsonata_datetime_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compiled JSONata datetime + array-function coverage over events:
    $fromMillis/$toMillis round-trip, array constructor + $distinct + $sort
    + $join, $base64encode — all tier-1 native Columns."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_ms", ts_millis(F.col("ts"))
    )
    expr = (
        "{'event_id': event_id,"
        " 'ts_iso': $fromMillis(ts_ms),"
        " 'roundtrip_ms': $toMillis($fromMillis(ts_ms)),"
        " 'tags': $join($sort($distinct([event_type, 'click', 'view'])), '-'),"
        " 'b64': $base64encode(event_type)}"
    )
    return transform(ev, expr, force_tier="compiled")


JSONATA_DATETIME_SQL = """
SELECT event_id,
       strftime(make_timestamp(epoch_ms(ts) * 1000), '%Y-%m-%dT%H:%M:%S.%g') || 'Z' AS ts_iso,
       epoch_ms(ts) AS roundtrip_ms,
       array_to_string(list_sort(list_distinct([event_type, 'click', 'view'])), '-') AS tags,
       base64(encode(event_type)) AS b64
FROM events
"""


def jsonata_picture_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compiled picture strings (round-1 verdict #8): $formatNumber's
    '#,##0.00' family -> native format_number, $fromMillis with padded
    components -> native date_format. Pure Catalyst projection, no Python.

    Amounts are constructed as event_id + 0.25 (exact binary fraction) so
    the DuckDB oracle can form the expected string from integer grouping —
    float grouping is unsupported there — while the Spark side exercises
    the real format_number path."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_ms", ts_millis(F.col("ts"))
    ).withColumn("amount", F.col("event_id") + F.lit(0.25))
    expr = (
        "{'event_id': event_id,"
        " 'amount_fmt': $formatNumber(amount, '#,##0.00'),"
        " 'amount_int': $formatNumber(amount, '#,##0'),"
        " 'day': $fromMillis(ts_ms, '[Y0001]-[M01]-[D01]'),"
        " 'minute': $fromMillis(ts_ms, '[D01]/[M01]/[Y0001] [H01]:[m01]')}"
    )
    return transform(ev, expr, force_tier="compiled")


JSONATA_PICTURE_SQL = """
SELECT event_id,
       format('{:,}', event_id) || '.25' AS amount_fmt,
       format('{:,}', event_id) AS amount_int,
       strftime(ts, '%Y-%m-%d') AS day,
       strftime(ts, '%d/%m/%Y %H:%M') AS minute
FROM events
"""


# ---------------------------------------------------------------------------
# multimodal: opaque binary payload columns + Arrow-batched decode stages
# ---------------------------------------------------------------------------


def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column -> mapInPandas numpy byte sum/count. The
    corpus text is ASCII, so DuckDB recomputes the identical sums from
    codepoints — a value-exact probe of the Arrow binary boundary."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return multimodal.text_byte_stats(media)


MULTIMODAL_BYTE_SQL = """
SELECT doc_id,
       CAST(list_sum(list_transform(split(text, ''), c -> unicode(c))) AS BIGINT) AS byte_sum,
       CAST(length(text) AS INT) AS byte_cnt
FROM documents
"""


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth deterministic fake videos (4 + id%5 frames), sample every 2nd
    frame via mapInPandas fan-out. Frame counts are closed-form in the id,
    so the oracle reproduces the exact (media_id, frame_idx) set."""
    docs = load_table(spark, sf_dir, "documents")
    docs = dedup.spread_narrow_scan(docs.select("doc_id"))
    vids = multimodal.synth_media(docs, "doc_id", multimodal.KIND_VIDEO)
    return multimodal.sample_frames(vids, stride=2).select("media_id", "frame_idx")


MULTIMODAL_FRAME_SQL = """
SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx
FROM documents, unnest(range(0, CAST(4 + doc_id % 5 AS BIGINT), 2)) t(f)
"""


def multimodal_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth fake images -> decode -> per-image pixel stats (rng-dependent
    content: rows-only check; exact values pinned in unit tests)."""
    docs = load_table(spark, sf_dir, "documents")
    docs = dedup.spread_narrow_scan(docs.select("doc_id"))
    imgs = multimodal.synth_media(docs, "doc_id", multimodal.KIND_IMAGE)
    return multimodal.image_stats(imgs)


def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synth fake audio -> RMS + zero-crossing features (rows-only)."""
    docs = load_table(spark, sf_dir, "documents")
    docs = dedup.spread_narrow_scan(docs.select("doc_id"))
    auds = multimodal.synth_media(docs, "doc_id", multimodal.KIND_AUDIO)
    return multimodal.audio_features(auds)


# ---------------------------------------------------------------------------
# training-data curation: decontamination, PII, quality, keywords, clustering
# ---------------------------------------------------------------------------


def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pretraining decontamination: flag training docs sharing any 8-word
    shingle with the eval/benchmark subset (here: doc_id % 50 == 0). Eval
    shingles dedup + broadcast; corpus streams map-side (functions/
    curation.py)."""
    docs = load_table(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    return curation.ngram_overlap_contamination(docs, eval_set, n=8, min_overlap=1)


DECONTAMINATE_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS w FROM documents),
sh AS (
  SELECT doc_id, array_to_string(w[CAST(i AS BIGINT):CAST(i + 7 AS BIGINT)], ' ') AS s
  FROM words, UNNEST(range(1, len(w) - 8 + 2)) AS t(i)
  WHERE len(w) >= 8),
ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
hits AS (
  SELECT sh.doc_id, count(DISTINCT sh.s) AS n_overlap
  FROM sh JOIN ev USING (s) GROUP BY 1)
SELECT d.doc_id,
       COALESCE(h.n_overlap, 0) AS n_overlap,
       COALESCE(h.n_overlap, 0) >= 1 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
"""


def pii_redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction gate. The corpus is synthetic word-salad with no real
    PII, so the query plants deterministic contact strings (email + phone
    for every doc, SSN-shaped ids on every 5th) and the operator must both
    count and scrub them — value-exact against the oracle that plants the
    identical strings."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.format_string(" contact user%d@mail.example.com or 555-%03d-%04d",
                            F.col("doc_id"), F.col("doc_id") % 900 + 100,
                            (F.col("doc_id") * 7) % 9000 + 1000),
            F.when(
                F.col("doc_id") % 5 == 0,
                F.format_string(" id %03d-%02d-%04d", F.col("doc_id") % 900 + 100,
                                F.col("doc_id") % 90 + 10, (F.col("doc_id") * 3) % 9000 + 1000),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    red = curation.pii_redact(planted, "text")
    return red.select(
        "doc_id", "n_email", "n_phone", "n_ssn",
        F.substring("redacted", -60, 60).alias("redacted_tail"),
    )


PII_REDACT_SQL = r"""
WITH planted AS (
  SELECT doc_id,
         text || printf(' contact user%d@mail.example.com or 555-%03d-%04d',
                        doc_id, doc_id % 900 + 100, (doc_id * 7) % 9000 + 1000)
              || CASE WHEN doc_id % 5 = 0
                      THEN printf(' id %03d-%02d-%04d', doc_id % 900 + 100,
                                  doc_id % 90 + 10, (doc_id * 3) % 9000 + 1000)
                      ELSE '' END AS text
  FROM documents),
red AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_email,
         CAST(len(regexp_extract_all(text, '\b\d{3}-\d{3}-\d{4}\b')) AS INT) AS n_phone,
         CAST(len(regexp_extract_all(text, '\b\d{3}-\d{2}-\d{4}\b')) AS INT) AS n_ssn,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b\d{3}-\d{3}-\d{4}\b', '[PHONE]', 'g'),
           '\b\d{3}-\d{2}-\d{4}\b', '[SSN]', 'g') AS redacted
  FROM planted)
SELECT doc_id, n_email, n_phone, n_ssn,
       CASE WHEN len(redacted) <= 60 THEN redacted
            ELSE substr(redacted, len(redacted) - 59, 60) END AS redacted_tail
FROM red
"""


def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition/quality signals per document: word counts, top-term
    ratio, distinct ratio, repetitive flag (functions/curation.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.repetition_stats(docs)


REPETITION_SQL = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(trim(text), '\S+')) AS w FROM documents),
pw AS (SELECT doc_id, w, count(*) AS c FROM words GROUP BY 1, 2),
pd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
              count(*) AS n_distinct_words, max(c) AS top
       FROM pw GROUP BY 1)
SELECT doc_id, n_words, n_distinct_words,
       round(top / n_words, 6) AS top_term_ratio,
       round(n_distinct_words / n_words, 6) AS distinct_ratio,
       top / n_words > 0.2 AS repetitive
FROM pd
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document; rank ties broken on the rounded
    score then term so both engines pick identical winners."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.tfidf_top_terms(docs, k=3)


TFIDF_SQL = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(trim(text), '\S+')) AS term FROM documents),
tf AS (SELECT doc_id, term, count(*) AS tf FROM words GROUP BY 1, 2),
dfreq AS (SELECT term, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, term, round(tf * ln((n + 1) / (df + 1)), 6) AS tfidf
  FROM tf JOIN dfreq USING (term) CROSS JOIN n)
SELECT doc_id, term, tfidf, rank FROM (
  SELECT doc_id, term, tfidf,
         row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored) t
WHERE rank <= 3
"""


def kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-means E-step gate: nearest of 8 deterministic centroids (the
    embeddings with vec_id < 8) per vector, squared-L2 in double with a
    left-to-right fold both engines share. The full Lloyd loop
    (curation.kmeans_lloyd) is iterative and pinned by tests instead."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        F.col("embedding").alias("centroid"),
    )
    return curation.assign_nearest_centroid(emb, cents)


KMEANS_ASSIGN_SQL = """
WITH c AS (
  SELECT CAST(vec_id AS INT) AS cluster_id, embedding AS cv
  FROM embeddings WHERE vec_id < 8),
pairs AS (
  SELECT e.vec_id, c.cluster_id,
         list_reduce(list_transform(list_zip(e.embedding, c.cv),
             p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
                * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))),
             (a, b) -> a + b) AS d
  FROM embeddings e CROSS JOIN c)
SELECT vec_id, cluster_id, round(d, 4) AS dist_sq FROM (
  SELECT vec_id, cluster_id, d,
         row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cluster_id ASC) AS r
  FROM pairs) t
WHERE r = 1
"""


def embedding_covariance_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-prep gate: population covariance entries (i, j < 8) of the
    embedding corpus. Partials are per-Arrow-batch numpy GEMMs (O(parts *
    d^2) crosses the wire, never the corpus); the d x d reduce is driver-
    side bounded state. Oracle recomputes the same naive-sum formula
    per entry."""
    emb = load_table(spark, sf_dir, "embeddings")
    return curation.covariance_entries(emb, max_dim=8)


EMBEDDING_COV_SQL = """
WITH idx AS (SELECT CAST(i AS INT) AS i FROM range(8) t(i)),
vals AS (
  SELECT i.i AS i, j.i AS j,
         CAST(e.embedding[i.i + 1] AS DOUBLE) AS x,
         CAST(e.embedding[j.i + 1] AS DOUBLE) AS y
  FROM embeddings e CROSS JOIN idx i CROSS JOIN idx j)
SELECT i, j,
       round((sum(x * y) - sum(x) * sum(y) / count(*)) / count(*), 6) AS cov
FROM vals GROUP BY i, j
"""


def chunk_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document dedup gate: global first-occurrence dedup of 10-word
    chunks with order-preserving reassembly (functions/curation.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.chunk_dedup(docs, chunk_words=10)


CHUNK_DEDUP_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS w FROM documents),
chunks AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(w[CAST(i * 10 + 1 AS BIGINT):CAST(i * 10 + 10 AS BIGINT)], ' ') AS chunk
  FROM words, UNNEST(range(0, CAST(ceil(len(w) / 10.0) AS BIGINT))) t(i)),
ranked AS (
  SELECT doc_id, pos, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id ASC, pos ASC) AS rn
  FROM chunks),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS BIGINT) AS n_chunks,
         CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         COALESCE(string_agg(CASE WHEN rn = 1 THEN chunk END, ' ' ORDER BY pos), '') AS text_dedup
  FROM ranked GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(a.n_chunks, 0) AS n_chunks,
       COALESCE(a.n_kept, 0) AS n_kept,
       COALESCE(a.text_dedup, '') AS text_dedup
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


def unigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram LM quality score gate: mean -log p(w) under the corpus's
    own unigram distribution, the distributed perplexity-filter proxy."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.unigram_logprob_score(docs)


UNIGRAM_LOGPROB_SQL = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(trim(text), '\S+')) AS w FROM documents),
vocab AS (SELECT w, count(*) AS c FROM words GROUP BY 1),
total AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM vocab)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       round(avg(ln(t) - ln(CAST(c AS DOUBLE))), 6) AS avg_neg_logp
FROM words JOIN vocab USING (w) CROSS JOIN total
GROUP BY doc_id
"""


def unigram_floor_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-floored unigram LM score: terms seen < 3 times collapse to
    a default logprob, bounding the vocabulary by construction (at most
    total_tokens/3 entries) — the 100 TB-safe configuration of the
    perplexity-proxy filter."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.unigram_logprob_score(docs, min_term_count=3)


UNIGRAM_FLOOR_SQL = r"""
WITH words AS (
  SELECT doc_id, unnest(regexp_extract_all(trim(text), '\S+')) AS w FROM documents),
vocab AS (SELECT w, count(*) AS c FROM words GROUP BY 1),
total AS (SELECT CAST(sum(c) AS DOUBLE) AS t FROM vocab),
kept AS (SELECT * FROM vocab WHERE c >= 3)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       round(avg(ln(t) - ln(CAST(coalesce(kept.c, 2) AS DOUBLE))), 6) AS avg_neg_logp
FROM words LEFT JOIN kept USING (w) CROSS JOIN total
GROUP BY doc_id
"""


def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 corpus terms via bounded-state Misra-Gries candidates +
    exact candidate re-count (functions/text.py) — the no-vocab-shuffle
    heavy-hitters path; oracle is the plain exact top-10."""
    docs = load_table(spark, sf_dir, "documents")
    return text.heavy_hitter_terms(docs, k=10, capacity=64)


HEAVY_HITTERS_SQL = r"""
SELECT w AS term, CAST(count(*) AS BIGINT) AS freq
FROM (SELECT unnest(regexp_extract_all(trim(text), '\S+')) AS w FROM documents)
GROUP BY w
ORDER BY freq DESC, term ASC
LIMIT 10
"""


def pca_project_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA projection onto the top-2 components (rows-only: the driver-side
    eigh has no SQL analog; determinism — sign convention included — is
    pinned in tests/test_curation.py). The distributed halves are each
    value-gated separately: covariance by embedding_covariance_stats,
    projection by pca_project_fixed."""
    emb = load_table(spark, sf_dir, "embeddings")
    return curation.pca_project(emb, n_components=2)


def _fixed_components(dim: int = 64, k: int = 2, seed: int = 7):
    """Seeded orthonormal component vectors + mean, rounded to 6 decimals so
    the identical literals embed exactly in both the Column plan and the SQL
    oracle. Data-independent by design — see pca_project's docstring for why
    an exact-hash gate through a data-dependent eigh would be flaky."""
    rng = np.random.RandomState(seed)
    m = rng.standard_normal((k, dim))
    for i in range(k):  # Gram-Schmidt
        for j in range(i):
            m[i] -= np.dot(m[i], m[j]) * m[j]
        m[i] /= np.linalg.norm(m[i])
    comps = np.round(m, 6)
    mean = np.round(rng.standard_normal(dim) / 10.0, 6)
    return comps, mean


def pca_project_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C34 projection gate: the zero-shuffle literal-dot-product projection
    scan (zip_with + left fold — the same physical pipeline pca_project
    emits) over seeded orthonormal components, value-exact against
    PCA_FIXED_SQL because both engines evaluate the identical float ops in
    the identical order."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps, mean = _fixed_components()
    return curation.project_components(emb, comps, mean)


def _pca_fixed_sql() -> str:
    comps, mean = _fixed_components()

    def arr(v):
        return "[" + ", ".join(repr(float(x)) for x in v) + "]"

    pcs = []
    for i, w in enumerate(comps):
        md = repr(float(np.dot(mean, w)))
        pcs.append(
            f"round(list_reduce(list_transform(list_zip(embedding, {arr(w)}), "
            f"p -> CAST(p[1] AS DOUBLE) * p[2]), (a, b) -> a + b) - {md}, 6) AS pc{i + 1}"
        )
    return "SELECT vec_id, " + ", ".join(pcs) + " FROM embeddings"


PCA_FIXED_SQL = _pca_fixed_sql()


def stream_incremental_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C85 end-to-end demo gate (round-10 verdict item 7): the steady-state
    streaming ingest loop — documents split into THREE rate-limited
    micro-batches (maxFilesPerTrigger=1 under one availableNow drain),
    each batch incrementally fuzzy-deduped against the PRUNED sketch store
    rolled forward from the previous batches — SELF-PINNED in-query
    against the batch fold (dedup(b1), then incremental(b2), then
    incremental(b3) over flat sketches): any divergence raises, so the
    registry sweep exercises the C85 parity contract every round.
    Rows-only by construction (streaming + checkpoint side effects)."""
    import os
    import shutil
    import tempfile

    from kafka_connect_jsonata_spark.functions import dedup as D
    from kafka_connect_jsonata_spark.streaming.transform import (
        stream_incremental_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    params = dict(num_hashes=32, n_bands=8, threshold=0.9)
    tmp = tempfile.mkdtemp(prefix="c85_demo_")
    try:
        src = os.path.join(tmp, "src")
        parts = [docs.filter(F.col("doc_id") % 3 == m) for m in range(3)]
        for m, part in enumerate(parts):
            d = os.path.join(src, f"b{m}")
            part.coalesce(1).write.parquet(d)
            # pin the micro-batch ORDER: the file source orders batches by
            # mtime, and the fold below must fold in the same order
            for name in os.listdir(d):
                os.utime(os.path.join(d, name), (1_700_000_000 + m, 1_700_000_000 + m))
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*")
        )
        out = os.path.join(tmp, "kept")
        stream_incremental_dedup(
            stream, out, os.path.join(tmp, "store"), os.path.join(tmp, "ckpt"),
            **params,
        )
        got = sorted(
            r[0] for r in spark.read.parquet(out).select("doc_id").collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    kept = D.minhash_dedup(parts[0], **params)
    for part in parts[1:]:
        nxt = D.minhash_dedup_incremental(
            part,
            None,
            ref_sketches=D.minhash_sketches(
                kept, num_hashes=params["num_hashes"], n_bands=params["n_bands"]
            ),
            **params,
        )
        kept = D.barrier(kept.select("doc_id", "text").unionByName(
            nxt.select("doc_id", "text")
        ))
    exp = sorted(r[0] for r in kept.select("doc_id").collect())
    if got != exp:
        raise AssertionError(
            f"C85 stream/batch divergence: {len(got)} streamed vs "
            f"{len(exp)} folded kept docs"
        )
    return spark.createDataFrame(
        [(i,) for i in got], "doc_id bigint"
    ).orderBy("doc_id")


def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Lloyd k-means, k=8, 3 iterations, deterministic init (rows-only:
    iterative; the E-step is oracle-gated separately as kmeans_assign)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return curation.kmeans_lloyd(emb, k=8, iters=3)


# ---------------------------------------------------------------------------
# C43: Bloom-filter semi-join
# ---------------------------------------------------------------------------

def bloom_semi_join_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C43 Bloom semi-join gate: lineitems of URGENT orders through a
    fixed-size Bloom prefilter + exact verify join
    (functions/filtering.py). The Bloom stage may only pass a superset, so
    the result is row-equal to the plain IN-subquery semi-join the oracle
    runs — what the gate checks is exactness THROUGH the prefilter."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderkey")
    joined = filtering.bloom_semi_join(
        li, urgent, "l_orderkey", "o_orderkey", num_bits=1 << 20
    )
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


BLOOM_SEMI_SQL = """
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


# ---------------------------------------------------------------------------
# C44: exact duplicated-substring removal (suffix-array dedup semantics)
# ---------------------------------------------------------------------------

def dup_span_removal_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C44 gate: corpus-wide exact duplicated-substring removal (Lee et al.
    2021 semantics at 40-char window granularity) — all-but-first
    occurrences of duplicated windows merged into maximal spans and cut
    (functions/dedup.py:duplicate_span_removal). Output aggregated per doc
    is the full cleaned text, so the hash pins every surviving character."""
    docs = load_table(spark, sf_dir, "documents")
    return dedup.duplicate_span_removal(docs, window=40)


DUP_SPAN_SQL = r"""
WITH g AS (
  SELECT doc_id, CAST(i AS INT) AS pos, substr(text, CAST(i AS INT), 40) AS gram
  FROM documents, UNNEST(range(1, CAST(greatest(length(text) - 38, 1) AS BIGINT))) t(i)
),
occ AS (
  SELECT doc_id, pos,
         row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn,
         count(*) OVER (PARTITION BY gram) AS c
  FROM g),
m AS (SELECT doc_id, pos FROM occ WHERE c > 1 AND rn > 1),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 40
              THEN 1 ELSE 0 END AS brk
  FROM m WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
isl2 AS (
  SELECT doc_id, pos,
         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM isl),
spans AS (
  SELECT doc_id, island, min(pos) AS s, max(pos) + 39 AS e
  FROM isl2 GROUP BY doc_id, island),
kept AS (
  SELECT doc_id, s, e,
         coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS ks,
         s - coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 0) - 1 AS klen
  FROM spans),
agg AS (
  SELECT k.doc_id,
         string_agg(substr(d.text, CAST(k.ks AS INT), CAST(k.klen AS INT)),
                    '' ORDER BY k.s) AS head,
         max(k.e) AS last_e,
         count(*) AS n_spans,
         sum(k.e - k.s + 1) AS removed
  FROM kept k JOIN documents d USING (doc_id) GROUP BY k.doc_id)
SELECT d.doc_id,
       CASE WHEN a.doc_id IS NULL THEN d.text
            ELSE coalesce(a.head, '') || substr(d.text, CAST(a.last_e + 1 AS INT))
       END AS text_clean,
       CAST(coalesce(a.n_spans, 0) AS BIGINT) AS n_spans,
       CAST(coalesce(a.removed, 0) AS BIGINT) AS chars_removed
FROM documents d LEFT JOIN agg a USING (doc_id)
"""


# ---------------------------------------------------------------------------
# C45: hashed-feature quality classifier
# ---------------------------------------------------------------------------

def quality_classifier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C45 gate: model-based quality filter — logistic margin over hashed
    bag-of-words features (functions/classifier.py) with the deterministic
    seeded weight vector. Weights are integer-quantized so the margin sum
    is order-free int64 arithmetic; the oracle recomputes the identical
    md5-bucket + LCG-weight formula in SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return classifier.score_documents(docs)


QUALITY_CLASSIFIER_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(trim(text), '\s+'),
                            t -> t <> '')) AS tok
  FROM documents),
b AS (
  SELECT doc_id,
         (strpos('0123456789abcdef', substr(md5(tok), 1, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substr(md5(tok), 2, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5(tok), 3, 1)) - 1) AS j
  FROM toks),
m AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum((j * 1103515245 + 12345) % 100001 - 50000) AS mi
  FROM b GROUP BY doc_id)
SELECT d.doc_id,
       CAST(coalesce(m.n_tokens, 0) AS INT) AS n_tokens,
       CAST(coalesce(m.mi, 0) AS DOUBLE) / 100000 AS margin,
       coalesce(m.mi, 0) > 0 AS keep
FROM documents d LEFT JOIN m USING (doc_id)
"""


def quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C45 training half (rows-only: iterative optimization, no SQL
    analog): 3 full-batch GD iterations on a text-derived label, returning
    the nonzero learned weights. The distributed trajectory is pinned
    against a local numpy reference in tests/test_classifier.py."""
    docs = load_table(spark, sf_dir, "documents")
    label = F.col("text").contains("the")
    w = classifier.train_logreg(docs, label, iters=3)
    nz = [(int(j), float(w[j])) for j in np.nonzero(w)[0]]
    return spark.createDataFrame(nz or [(0, 0.0)], "bucket int, weight double")


# ---------------------------------------------------------------------------
# C46: Gopher-rules quality filter
# ---------------------------------------------------------------------------

def gopher_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C46 gate: the Gopher heuristic quality battery (word-count bounds,
    mean word length, symbol ratio, bullet/ellipsis line fractions,
    alphabetic fraction, stopword floor) as one zero-shuffle projection
    (functions/curation.py:gopher_quality). All ratios divide exact int
    counts, so values hash-match the SQL recomputation."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.gopher_quality(docs)


GOPHER_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> x <> '') AS w,
         string_split(text, chr(10)) AS lines
  FROM documents),
s AS (
  SELECT doc_id,
         len(w) AS nw,
         CASE WHEN len(w) = 0 THEN 0
              ELSE list_reduce(list_transform(w, x -> length(x)),
                               (a, b) -> a + b) END AS sum_len,
         length(text) - length(replace(text, '#', '')) AS n_hash,
         (length(text) - length(replace(text, '...', ''))) / 3 AS n_ell,
         len(lines) AS nl,
         len(list_filter(lines, x -> starts_with(x, '- ')
                                  OR starts_with(x, '* ')
                                  OR starts_with(x, '•'))) AS n_bullet,
         len(list_filter(lines, x -> x LIKE '%...')) AS n_ell_end,
         len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
         len(list_filter(w, x -> list_contains(
             ['the','and','of','to','a','in','is','that','for','it'],
             lower(x)))) AS n_stop
  FROM t)
SELECT doc_id,
       CAST(nw AS INT) AS n_words,
       round(CASE WHEN nw = 0 THEN 0.0 ELSE CAST(sum_len AS DOUBLE) / nw END, 6)
         AS avg_word_len,
       round(CASE WHEN nw = 0 THEN 0.0 ELSE (n_hash + n_ell) / nw END, 6)
         AS symbol_ratio,
       round(CAST(n_bullet AS DOUBLE) / nl, 6) AS bullet_frac,
       round(CAST(n_ell_end AS DOUBLE) / nl, 6) AS ellipsis_frac,
       round(CASE WHEN nw = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / nw END, 6)
         AS alpha_frac,
       CAST(n_stop AS INT) AS stop_hits,
       (nw >= 50 AND nw <= 100000
        AND (CASE WHEN nw = 0 THEN 0.0 ELSE CAST(sum_len AS DOUBLE) / nw END)
             BETWEEN 3.0 AND 10.0
        AND (CASE WHEN nw = 0 THEN 0.0 ELSE (n_hash + n_ell) / nw END) <= 0.1
        AND CAST(n_bullet AS DOUBLE) / nl <= 0.9
        AND CAST(n_ell_end AS DOUBLE) / nl <= 0.3
        AND (CASE WHEN nw = 0 THEN 0.0 ELSE CAST(n_alpha AS DOUBLE) / nw END) >= 0.8
        AND n_stop >= 2) AS keep
FROM s
"""


# ---------------------------------------------------------------------------
# C47: per-group quantile filter / C48: temperature-resampled mixing
# ---------------------------------------------------------------------------

def quantile_filter_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C47 gate: keep the top 25% of docs per source by length (the
    per-domain "train on the best X%" selection,
    functions/curation.py:quantile_filter exact tier). percent_rank is an
    exact int ratio, so the kept set is engine-identical."""
    docs = load_table(spark, sf_dir, "documents")
    out = curation.quantile_filter(
        docs, score_col="n_chars", q=0.75, group_col="source", tiebreak_col="doc_id"
    )
    return out.select("doc_id", "source", "n_chars")


QUANTILE_FILTER_SQL = """
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         percent_rank() OVER (PARTITION BY source
                              ORDER BY n_chars ASC, doc_id ASC) AS pr
  FROM documents) t
WHERE pr >= 0.75
"""


def temperature_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C48 gate: temperature-flattened mixture sampling — per-group keep
    rates p_g ∝ sqrt(n_g) scaled to an expected total of 250 docs, applied
    through the deterministic md5-position filter
    (operators/sampling.py:temperature_mix_sample). The oracle recomputes
    the rates in SQL with the identical left-to-right weight fold and the
    identical hex-threshold predicate, so kept counts match exactly."""
    from kafka_connect_jsonata_spark.operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    rates = sampling.temperature_mix_rates(docs, "lang", target_total=250, alpha=0.5)
    sampled = sampling.mixture_sample(docs, "doc_id", "lang", rates, salt="mix")
    totals = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    kept = sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    rate_df = spark.createDataFrame(
        [(g, float(r)) for g, r in sorted(rates.items())], "lang string, rate double"
    )
    return (
        totals.join(kept, "lang", "left")
        .join(rate_df, "lang")
        .select(
            "lang",
            "n_docs",
            F.round("rate", 9).alias("rate"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )


TEMPERATURE_MIX_SQL = """
WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
s AS (SELECT list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang),
                         (a, b) -> a + b) AS sw FROM c),
r AS (SELECT lang, n,
             least(1.0, sqrt(CAST(n AS DOUBLE)) / s.sw * 250.0 / n) AS rate
      FROM c CROSS JOIN s),
k AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept
      FROM documents d JOIN r USING (lang)
      WHERE CASE WHEN r.rate >= 1.0 THEN TRUE
                 ELSE md5(CAST(d.doc_id AS VARCHAR) || 'mix')
                      < lpad(lower(to_hex(CAST(trunc(r.rate * 4294967296.0) AS BIGINT))),
                             8, '0') || repeat('0', 24) END
      GROUP BY d.lang)
SELECT r.lang, r.n AS n_docs, round(r.rate, 9) AS rate,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
FROM r LEFT JOIN k USING (lang)
"""


def temperature_token_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C48 token-budget variant: temperature mixing where a group's mass is
    its CHARACTER total (``weight_col='n_chars'``, the token-count proxy in
    this corpus) and the target is 100k chars — the form pretraining
    recipes actually specify. Same sqrt weights, same left-to-right fold,
    same md5 filter; the oracle mirrors each step in SQL."""
    from kafka_connect_jsonata_spark.operators import sampling

    docs = load_table(spark, sf_dir, "documents")
    rates = sampling.temperature_mix_rates(
        docs, "lang", target_total=100_000, alpha=0.5, weight_col="n_chars"
    )
    sampled = sampling.mixture_sample(docs, "doc_id", "lang", rates, salt="tokmix")
    totals = docs.groupBy("lang").agg(
        F.sum(F.col("n_chars").cast("long")).alias("mass_chars")
    )
    kept = sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_chars").cast("long")).alias("kept_chars"),
    )
    rate_df = spark.createDataFrame(
        [(g, float(r)) for g, r in sorted(rates.items())], "lang string, rate double"
    )
    return (
        totals.join(kept, "lang", "left")
        .join(rate_df, "lang")
        .select(
            "lang",
            "mass_chars",
            F.round("rate", 9).alias("rate"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("kept_chars"), F.lit(0)).cast("long").alias("kept_chars"),
        )
    )


TEMPERATURE_TOKEN_MIX_SQL = """
WITH c AS (SELECT lang, CAST(sum(n_chars) AS BIGINT) AS m
           FROM documents GROUP BY lang),
s AS (SELECT list_reduce(list(sqrt(CAST(m AS DOUBLE)) ORDER BY lang),
                         (a, b) -> a + b) AS sw FROM c),
r AS (SELECT lang, m,
             least(1.0, sqrt(CAST(m AS DOUBLE)) / s.sw * 100000.0 / m) AS rate
      FROM c CROSS JOIN s),
k AS (SELECT d.lang, CAST(count(*) AS BIGINT) AS n_kept,
             CAST(sum(d.n_chars) AS BIGINT) AS kept_chars
      FROM documents d JOIN r USING (lang)
      WHERE CASE WHEN r.rate >= 1.0 THEN TRUE
                 ELSE md5(CAST(d.doc_id AS VARCHAR) || 'tokmix')
                      < lpad(lower(to_hex(CAST(trunc(r.rate * 4294967296.0) AS BIGINT))),
                             8, '0') || repeat('0', 24) END
      GROUP BY d.lang)
SELECT r.lang, r.m AS mass_chars, round(r.rate, 9) AS rate,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(k.kept_chars, 0) AS BIGINT) AS kept_chars
FROM r LEFT JOIN k USING (lang)
"""


# ---------------------------------------------------------------------------
# C49: end-to-end curation pipeline (operators composed, still exact)
# ---------------------------------------------------------------------------

def curation_pipeline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C49 gate: the whole curation chain composed lazily into ONE Spark
    plan — Gopher rule filter -> classifier margin filter -> exact
    keep-first dedup -> deterministic 50% hash sample -> per-lang rollup —
    and still value-exact against the same chain in SQL. Margin sums stay
    integer (the classifier's quantized weights), so no float ordering
    leaks into the hash."""
    from kafka_connect_jsonata_spark.operators.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    g = curation.gopher_quality(docs).select("doc_id", F.col("keep").alias("g_keep"))
    s = classifier.score_documents(docs).select(
        "doc_id",
        "n_tokens",
        F.round(F.col("margin") * 100000).cast("long").alias("mi"),
    )
    base = (
        docs.join(g, "doc_id")
        .join(s, "doc_id")
        .filter(F.col("g_keep") & (F.col("mi") > 0))
    )
    w = Window.partitionBy("text").orderBy("doc_id")
    ded = base.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    samp = hash_sample(ded, "doc_id", 0.5, salt="pipe")
    return samp.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
        F.sum("mi").alias("sum_margin_int"),
    )


CURATION_PIPELINE_SQL = f"""
WITH g AS ({GOPHER_SQL}),
q AS ({QUALITY_CLASSIFIER_SQL}),
base AS (
  SELECT d.doc_id, d.text, d.lang, q.n_tokens,
         CAST(round(q.margin * 100000) AS BIGINT) AS mi
  FROM documents d JOIN g USING (doc_id) JOIN q USING (doc_id)
  WHERE g.keep AND q.margin > 0),
ded AS (
  SELECT *, row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
  FROM base),
samp AS (
  SELECT * FROM ded
  WHERE rn = 1
    AND md5(CAST(doc_id AS VARCHAR) || 'pipe') < '80000000' || repeat('0', 24))
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       CAST(sum(mi) AS BIGINT) AS sum_margin_int
FROM samp GROUP BY lang
"""


# ---------------------------------------------------------------------------
# C50: BPE tokenizer (rows-only: iterative merge recursion has no SQL analog)
# ---------------------------------------------------------------------------

def bpe_encode_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C50 gate (rows-only): train 100 BPE merges from the corpus word
    histogram (frequency floor 2 bounds driver state), then encode every
    document with the closure-shipped merge table
    (functions/bpe.py). Semantics pinned by tests/test_bpe.py including
    the published worked example; deterministic across partitionings."""
    from kafka_connect_jsonata_spark.functions import bpe

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.train_bpe(docs, num_merges=100, min_count=2)
    return bpe.encode_documents(docs, merges).select("doc_id", "n_bpe_tokens")


# ---------------------------------------------------------------------------
# C51: Unicode text normalization
# ---------------------------------------------------------------------------

def normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C51 gate: control-char strip + whitespace collapse + trim (JVM
    regex) + Unicode NFC (Arrow-batched pandas str.normalize) —
    functions/text.py:normalize_text. NFC is fixed by the Unicode
    standard, so DuckDB's nfc_normalize is an exact oracle; non-ASCII
    behavior is pinned in tests/test_text_normalize.py."""
    docs = load_table(spark, sf_dir, "documents")
    return text.normalize_text(docs)


NORMALIZE_SQL = r"""
SELECT doc_id,
       nfc_normalize(trim(regexp_replace(regexp_replace(text,
           '[\x00-\x08\x0B-\x1F\x7F-\x9F]', '', 'g'),
           '[ \t]+', ' ', 'g'))) AS text_norm,
       nfc_normalize(trim(regexp_replace(regexp_replace(text,
           '[\x00-\x08\x0B-\x1F\x7F-\x9F]', '', 'g'),
           '[ \t]+', ' ', 'g'))) <> text AS changed
FROM documents
"""


def bigram_logprob_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C53 gate: mean -log p(w2|w1) under the corpus's own add-0.1-smoothed
    bigram model (functions/curation.py:bigram_logprob_score) — the
    conditional upgrade of the unigram perplexity proxy; word-order
    anomalies score high even with a normal unigram mix."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.bigram_logprob_score(docs)


BIGRAM_LOGPROB_SQL = r"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents),
pairs AS (
  SELECT doc_id, w[CAST(i AS INT)] AS w1, w[CAST(i AS INT) + 1] AS w2
  FROM words, UNNEST(range(1, CAST(greatest(len(w), 1) AS BIGINT))) t(i)),
c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM pairs GROUP BY w1),
c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM pairs GROUP BY w1, w2),
v AS (SELECT CAST(count(DISTINCT tok) AS BIGINT) AS v
      FROM (SELECT unnest(w) AS tok FROM words)),
sc AS (
  SELECT p.doc_id, count(*) AS n_bigrams,
         round(avg(-ln((c12.c12 + 0.1)
                       / (CAST(c1.c1 AS DOUBLE) + 0.1 * CAST(v.v AS DOUBLE)))),
               6) AS avg_neg_logp2
  FROM pairs p JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v
  GROUP BY p.doc_id)
SELECT d.doc_id,
       CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       sc.avg_neg_logp2
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def compression_ratio_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C52 gate (rows-only: zlib has no SQL analog): per-doc deflate
    compression ratio, the redundancy quality signal
    (functions/curation.py:compression_ratio). Value behavior pinned in
    tests/test_curation.py."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.compression_ratio(docs)


# ---------------------------------------------------------------------------
# C54: overlapping chunking / q6
# ---------------------------------------------------------------------------

def chunk_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C54 gate: overlapping word-window chunking (20-word chunks, stride
    10 — 50% overlap), the retrieval/embedding prep step
    (functions/text.py:chunk_with_overlap). Pure Column explode, zero
    shuffle; every chunk's full text enters the hash."""
    docs = load_table(spark, sf_dir, "documents")
    return text.chunk_with_overlap(docs, chunk_words=20, stride_words=10)


CHUNK_OVERLAP_SQL = r"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents)
SELECT doc_id, CAST(i AS INT) AS chunk_id,
       CAST(least(len(w) - i * 10, 20) AS INT) AS n_chunk_words,
       array_to_string(w[CAST(i * 10 + 1 AS BIGINT):CAST(i * 10 + 20 AS BIGINT)], ' ')
         AS chunk_text
FROM words, UNNEST(range(0,
    CAST(CASE WHEN len(w) = 0 THEN 0
              ELSE floor((len(w) - 1) / 10) + 1 END AS BIGINT))) t(i)
"""


def dup_ngram_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C55 gate: within-doc duplicate bigram coverage — the second half of
    the Gopher repetition battery
    (functions/curation.py:dup_ngram_coverage). Integer positions and
    counts, one final division."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.dup_ngram_coverage(docs, n=2)


DUP_NGRAM_SQL = r"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> x <> '') AS w
  FROM documents),
g AS (
  SELECT doc_id, CAST(i AS INT) AS p,
         array_to_string(w[CAST(i AS BIGINT):CAST(i + 1 AS BIGINT)], ' ') AS gram
  FROM words, UNNEST(range(1, CAST(greatest(len(w) - 0, 1) AS BIGINT))) t(i)),
dup AS (
  SELECT doc_id, p FROM (
    SELECT doc_id, p, count(*) OVER (PARTITION BY doc_id, gram) AS c FROM g) x
  WHERE c > 1),
cov AS (
  SELECT doc_id, CAST(count(DISTINCT pos) AS BIGINT) AS n_covered
  FROM dup, UNNEST([p, p + 1]) u(pos)
  GROUP BY doc_id)
SELECT w.doc_id,
       CAST(len(w.w) AS INT) AS n_words,
       CAST(coalesce(c.n_covered, 0) AS BIGINT) AS n_covered,
       CASE WHEN len(w.w) > 0
            THEN CAST(coalesce(c.n_covered, 0) AS DOUBLE) / len(w.w)
            ELSE 0.0 END AS dup_ngram_frac
FROM words w LEFT JOIN cov c USING (doc_id)
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan + conjunctive filter + single aggregate —
    the predicate-pushdown showcase (every filter reaches the parquet
    scan; decimal-exact revenue sum)."""
    li = load_table(spark, sf_dir, "lineitem")
    out = li.filter(
        (F.col("l_shipdate") >= F.lit("1994-01-01"))
        & (F.col("l_shipdate") < F.lit("1995-01-01"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount", 4))
        .cast("double")
        .alias("revenue")
    )
    return out


Q6_SQL = """
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1994-01-01' AND l_shipdate < DATE '1995-01-01'
  AND l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
"""


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C56 gate: deterministic weighted sampling without replacement
    (Efraimidis-Spirakis A-ES, priority -ln(u)/w from the md5 position,
    operators/sampling.py:weighted_sample) — 100 docs weighted by length.
    The oracle rebuilds u by per-hex-digit strpos arithmetic and ranks
    with the identical log-space key."""
    from kafka_connect_jsonata_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, "doc_id", "n_chars", k=100).select(
        "doc_id", "source", "n_chars"
    )


def _weighted_sample_sql() -> str:
    hexv = "+".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return f"""
WITH h AS (SELECT doc_id, source, n_chars, md5(CAST(doc_id AS VARCHAR)) AS h
           FROM documents),
k AS (SELECT doc_id, source, n_chars,
             -ln(({hexv} + 1.0) / 4294967296.0) / CAST(n_chars AS DOUBLE) AS wkey
      FROM h WHERE n_chars > 0)
SELECT doc_id, source, n_chars FROM k
ORDER BY wkey ASC, doc_id ASC LIMIT 100
"""


WEIGHTED_SAMPLE_SQL = _weighted_sample_sql()


def pack_bpe_budget_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C57 gate (rows-only: BPE has no SQL analog): tokenizer-aware
    sequence packing — train BPE merges, encode, then pack by the REAL
    token counts via pack_token_budget(n_tokens_col=...). The whitespace
    path stays oracle-gated separately (pack_token_budget_docs); equality
    of the two paths on a shared count column is pinned in
    tests/test_queries_smoke.py."""
    from kafka_connect_jsonata_spark.functions import bpe
    from kafka_connect_jsonata_spark.operators.packing import pack_token_budget

    docs = load_table(spark, sf_dir, "documents")
    merges = bpe.train_bpe(docs, num_merges=100, min_count=2)
    enc = bpe.encode_documents(docs, merges).select("doc_id", "n_bpe_tokens")
    return pack_token_budget(
        enc, budget=2048, n_tokens_col="n_bpe_tokens"
    )


def clean_lines_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C58: C4-style line-level cleaning, zero-shuffle Column projection.
    The synthetic corpus is single-line word soup, so the gate splits on
    the word 'the' to get variable-length pseudo-lines — the operator
    itself takes any delimiter ('\\n' in production). Rules exercised:
    min-words and badword."""
    docs = load_table(spark, sf_dir, "documents")
    return text.clean_lines(
        docs, delimiter=" the ", min_words=4, badwords=("spark",)
    )


CLEAN_LINES_SQL = """
WITH l AS (SELECT doc_id, str_split(text, ' the ') AS lines FROM documents),
k AS (
  SELECT doc_id, lines,
         list_filter(lines, x ->
            len(list_filter(str_split(trim(x), ' '), w -> w <> '')) >= 4
            AND NOT contains(lower(x), 'spark')) AS kept
  FROM l)
SELECT doc_id,
       coalesce(array_to_string(kept, ' the '), '') AS cleaned,
       len(lines) AS n_lines,
       len(kept) AS n_kept
FROM k
"""


def inverted_index_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C59: corpus inverted index — term -> doc_freq, total_tf, ascending
    posting list (comma-joined for engine-portable value comparison). One
    term-keyed hash agg after a per-(term,doc) pre-aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    return text.inverted_index(docs)


INVERTED_INDEX_SQL = """
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(str_split_regex(trim(text), '\\s+'), t -> t <> '')) AS term
  FROM documents),
tf AS (SELECT term, doc_id, count(*) AS tf FROM w GROUP BY term, doc_id)
SELECT term,
       count(*) AS doc_freq,
       CAST(sum(tf) AS BIGINT) AS total_tf,
       array_to_string(list_sort(list(doc_id)), ',') AS postings
FROM tf GROUP BY term
"""


def boilerplate_removal_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C60: CCNet-style per-source boilerplate line removal. Gate uses
    single words as 'lines' (delimiter=' ') so the frequency threshold is
    non-vacuous on the synthetic word-soup corpus; production calls use
    '\\n'. Broadcast tier (frequent set far below the cap) — the corpus
    never shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    return curation.remove_boilerplate_lines(
        docs, delimiter=" ", group_col="source", max_doc_frac=0.85, min_docs=2
    )


BOILERPLATE_SQL = """
WITH l AS (SELECT doc_id, source, str_split(text, ' ') AS lines FROM documents),
dw AS (
  SELECT DISTINCT doc_id, source, unnest(lines) AS line FROM l),
gs AS (SELECT source, count(*) AS gn FROM documents GROUP BY source),
freq AS (
  SELECT dw.source, line
  FROM dw JOIN gs USING (source)
  GROUP BY dw.source, line, gs.gn
  HAVING count(*) >= 2 AND count(*)::DOUBLE > 0.85 * gs.gn),
fa AS (SELECT source, list(line) AS fl FROM freq GROUP BY source),
j AS (
  SELECT l.doc_id, l.source, l.lines,
         list_filter(l.lines, x -> fl IS NULL OR NOT list_contains(fl, x)) AS kept
  FROM l LEFT JOIN fa USING (source))
SELECT doc_id, source,
       coalesce(array_to_string(kept, ' '), '') AS cleaned,
       len(lines) AS n_lines,
       len(lines) - len(kept) AS n_removed
FROM j
"""


def fuzzy_decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C61: fuzzy (MinHash-LSH) decontamination of the corpus against an
    eval slice (doc_id % 10 = 0). Banding at r=2 gives recall ~1-1e-11 at
    J >= 0.9 and candidates verify with EXACT shingle Jaccard, so the
    brute-force cross join below is an exact value oracle — same evidence
    pattern as minhash_lsh_dups. The corpus side never shuffles: (band,
    bucket) keys equi-join the broadcast eval buckets map-side."""
    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("doc_id") % 10 == 0)
    return curation.fuzzy_contamination_pairs(
        docs, ev, num_hashes=32, n_bands=16, threshold=0.9
    )


FUZZY_DECON_SQL = """
WITH g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(s)-4,1)+1),
                                      i -> s[i:i+4])) AS grams
  FROM (SELECT doc_id,
               lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS s
        FROM documents)),
sized AS (SELECT doc_id, grams, len(grams) AS sz FROM g),
ev AS (SELECT * FROM sized WHERE doc_id % 10 = 0)
SELECT a.doc_id AS id, b.doc_id AS eval_id,
       round(len(list_intersect(a.grams, b.grams))::DOUBLE /
             (a.sz + b.sz - len(list_intersect(a.grams, b.grams))), 4) AS jaccard
FROM sized a JOIN ev b
  ON a.doc_id <> b.doc_id
 AND a.sz >= 0.9 * b.sz AND b.sz >= 0.9 * a.sz
WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
      (a.sz + b.sz - len(list_intersect(a.grams, b.grams))) >= 0.9
"""


def semantic_dedup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C62: SemDeDup — semantic near-dup pairs found ONLY within k-means
    clusters (fixed centroids = the first 8 vectors, as in kmeans_assign),
    so the quadratic cosine join is bounded by cluster population, never
    the corpus. Oracle recomputes assignment + in-cluster pair cosine."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        F.col("embedding").alias("centroid"),
    )
    return dedup.semantic_dup_pairs(emb, cents, threshold=0.3)


SEMANTIC_DEDUP_SQL = """
WITH c AS (
  SELECT CAST(vec_id AS INT) AS cluster_id, embedding AS cv
  FROM embeddings WHERE vec_id < 8),
p AS (
  SELECT e.vec_id, c.cluster_id,
         list_reduce(list_transform(list_zip(e.embedding, c.cv),
             q -> (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))
                * (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))),
             (x, y) -> x + y) AS d
  FROM embeddings e CROSS JOIN c),
a AS (
  SELECT vec_id, cluster_id FROM (
    SELECT vec_id, cluster_id,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cluster_id ASC) AS r
    FROM p) t
  WHERE r = 1),
s AS (SELECT a.vec_id, a.cluster_id, e.embedding
      FROM a JOIN embeddings e USING (vec_id))
SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.cluster_id,
       round(
         list_reduce(list_transform(list_zip(x.embedding, y.embedding),
                     q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), (u, v) -> u + v)
         / (sqrt(list_reduce(list_transform(x.embedding, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE)), (u, v) -> u + v))
          * sqrt(list_reduce(list_transform(y.embedding, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE)), (u, v) -> u + v))), 4)
       AS cosine_sim
FROM s x JOIN s y ON x.cluster_id = y.cluster_id AND x.vec_id < y.vec_id
WHERE list_reduce(list_transform(list_zip(x.embedding, y.embedding),
                  q -> CAST(q[1] AS DOUBLE) * CAST(q[2] AS DOUBLE)), (u, v) -> u + v)
      / (sqrt(list_reduce(list_transform(x.embedding, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE)), (u, v) -> u + v))
       * sqrt(list_reduce(list_transform(y.embedding, z -> CAST(z AS DOUBLE) * CAST(z AS DOUBLE)), (u, v) -> u + v)))
      >= 0.3
"""


# Shared DSIR feature table (round-8, verdict item 7): dsir_select_docs
# and dsir_gumbel_docs score the SAME corpus against the SAME target
# slice — on a cluster the (id, target, bucket, count) pre-aggregation is
# written once and both jobs read it. The gate-scale equivalent is one
# persisted dsir_features() DataFrame memoized per (application, sf_dir):
# the first DSIR gate pays the tokenize+hash scan, every later consumer
# (the other gate AND the three consumers inside each weight computation)
# reads the persisted bounded table. features= parity with the direct
# path is pinned at classifier.py:268 and tests/test_round7_ops.py.
_DSIR_SHARED_FEATURES: dict = {}


def _dsir_features_shared(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    feats = _DSIR_SHARED_FEATURES.get(key)
    if feats is None:
        docs = load_table(spark, sf_dir, "documents")
        feats = classifier.dsir_features(
            docs, F.col("source").isin("src0", "src1")
        ).persist()
        _DSIR_SHARED_FEATURES[key] = feats
    return feats


def dsir_select_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C63: DSIR data selection — top-20 raw documents by hashed-bigram
    importance weight against the src0/src1 target slice. Feature space is
    the constant 4096-bucket md5 hash (no vocabulary state); the oracle
    recomputes the identical buckets and the float-stable per-feature
    log-ratio sum. Reads the shared persisted feature table (one corpus
    scan serves both DSIR gates — the cluster pattern of materializing
    dsir_features once)."""
    docs = load_table(spark, sf_dir, "documents")
    return classifier.dsir_select(
        docs, F.col("source").isin("src0", "src1"), k=20,
        features=_dsir_features_shared(spark, sf_dir),
    )


DSIR_SELECT_SQL = r"""
WITH w AS (
  SELECT doc_id, source IN ('src0', 'src1') AS t,
         regexp_extract_all(trim(text), '\S+') AS ws
  FROM documents),
uni AS (SELECT doc_id, t, unnest(ws) AS g FROM w),
bi AS (
  SELECT doc_id, t,
         ws[CAST(i AS INT) + 1] || ' ' || ws[CAST(i AS INT) + 2] AS g
  FROM w, unnest(range(len(ws) - 1)) u(i)
  WHERE len(ws) >= 2),
f AS (
  SELECT doc_id, t,
         (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5(g), 3, 1)) - 1) AS j
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
dj AS (
  SELECT doc_id, t, j, CAST(count(*) AS BIGINT) AS c
  FROM f GROUP BY doc_id, t, j),
s AS (
  SELECT j, sum(CASE WHEN t THEN c ELSE 0 END) AS ct,
         sum(CASE WHEN t THEN 0 ELSE c END) AS cr
  FROM dj GROUP BY j),
tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS tt, CAST(sum(cr) AS DOUBLE) AS tr FROM s),
per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_features,
         sum(c * (ln(ct + 1.0) - ln(cr + 1.0))) AS ss
  FROM dj JOIN s USING (j) WHERE NOT t GROUP BY doc_id)
SELECT doc_id, n_features,
       round(ss + n_features * (ln(tr + 4096.0) - ln(tt + 4096.0)), 6) AS log_weight
FROM per CROSS JOIN tot
ORDER BY ss + n_features * (ln(tr + 4096.0) - ln(tt + 4096.0)) DESC, doc_id ASC
LIMIT 20
"""


def zipf_fit_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C64: Zipf rank-frequency least-squares fit over the corpus's top-200
    terms — the corpus-health slope metric. The rank window runs over 200
    rows (bounded by the parameter), never the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return text.zipf_fit(docs, top_n=200)


ZIPF_FIT_SQL = r"""
WITH w AS (SELECT unnest(regexp_extract_all(trim(text), '\S+')) AS term FROM documents),
c AS (SELECT term, count(*) AS c FROM w GROUP BY term
      ORDER BY c DESC, term ASC LIMIT 200),
r AS (SELECT ln(CAST(row_number() OVER (ORDER BY c DESC, term ASC) AS DOUBLE)) AS x,
             ln(CAST(c AS DOUBLE)) AS y
      FROM c)
SELECT CAST(count(*) AS BIGINT) AS n_terms,
       round(covar_pop(x, y) / var_pop(x), 6) AS slope,
       round(avg(y) - covar_pop(x, y) / var_pop(x) * avg(x), 6) AS intercept
FROM r
"""


def vocab_coverage_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C65: tokenizer-vocabulary sizing — token coverage and type-OOV rate
    of a 500-term top-frequency vocabulary. Term counts hash-agg once; the
    vocabulary cut is a distributed top-k."""
    docs = load_table(spark, sf_dir, "documents")
    return text.vocab_coverage(docs, vocab_size=500)


VOCAB_COVERAGE_SQL = r"""
WITH w AS (SELECT unnest(regexp_extract_all(trim(text), '\S+')) AS term FROM documents),
c AS (SELECT term, count(*) AS c FROM w GROUP BY term),
top AS (SELECT * FROM c ORDER BY c DESC, term ASC LIMIT 500),
t AS (SELECT CAST(sum(c) AS BIGINT) AS total_tokens,
             CAST(count(*) AS BIGINT) AS total_types FROM c),
v AS (SELECT CAST(sum(c) AS BIGINT) AS vocab_tokens,
             CAST(count(*) AS BIGINT) AS vocab_types FROM top)
SELECT total_tokens, total_types, vocab_tokens,
       round(CAST(vocab_tokens AS DOUBLE) / total_tokens, 6) AS coverage,
       total_types - vocab_types AS oov_types
FROM t CROSS JOIN v
"""


def curriculum_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C66: curriculum ordering — 4 difficulty stages by document length,
    every row placed at a global easy-to-hard position. Auto tier takes the
    exact (SQL-reproducible) path at gate scale; the 100 TB tier swaps in
    approx-quantile stage cuts + the md5 prefix-sum rank (plan/unit
    tested)."""
    from kafka_connect_jsonata_spark.operators.sampling import curriculum_order

    docs = load_table(spark, sf_dir, "documents")
    out = curriculum_order(docs, score_col="n_chars", n_stages=4)
    return out.select("doc_id", "stage", "curriculum_pos")


CURRICULUM_SQL = """
SELECT doc_id,
       CAST(ntile(4) OVER (ORDER BY n_chars ASC, doc_id ASC) AS INT) AS stage,
       CAST(row_number() OVER (ORDER BY n_chars ASC, doc_id ASC) - 1 AS BIGINT)
         AS curriculum_pos
FROM documents
"""


def embedding_outlier_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C67: per-cluster embedding outlier pruning — keep the 80% of each
    cluster closest to its centroid (fixed centroids = first 8 vectors).
    Exact tier at gate scale; the approx t-digest tier is the plan-pinned
    100 TB route (quantile_filter auto-tier)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        F.col("embedding").alias("centroid"),
    )
    return dedup.embedding_outlier_filter(emb, cents, q=0.8)


EMBEDDING_OUTLIER_SQL = """
WITH c AS (
  SELECT CAST(vec_id AS INT) AS cluster_id, embedding AS cv
  FROM embeddings WHERE vec_id < 8),
p AS (
  SELECT e.vec_id, c.cluster_id,
         list_reduce(list_transform(list_zip(e.embedding, c.cv),
             q -> (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))
                * (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))),
             (x, y) -> x + y) AS d
  FROM embeddings e CROSS JOIN c),
a AS (
  SELECT vec_id, cluster_id, round(d, 4) AS dist_sq FROM (
    SELECT vec_id, cluster_id, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cluster_id ASC) AS r
    FROM p) t
  WHERE r = 1)
SELECT vec_id, cluster_id, dist_sq FROM (
  SELECT vec_id, cluster_id, dist_sq,
         percent_rank() OVER (PARTITION BY cluster_id
                              ORDER BY -dist_sq ASC, vec_id ASC) AS pr
  FROM a) t
WHERE pr >= 0.19999999999999996
-- ^ the exact IEEE double Python computes for 1.0 - 0.8 (the engine's
-- quantile_filter threshold); a bare 0.2 literal is the *next* double up
-- and would exclude a boundary row the engine keeps.
"""


def unimax_mix_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C68: UniMax epoch-capped mixture (Chung et al. 2023) — budget 701
    docs over the skewed ``lang`` sources at a 2-epoch cap. Small sources
    (fr, de) bind at their full 2-epoch capacity; the rest split the
    remaining budget evenly (es/zh get a full pass + a partial one, en a
    sub-epoch slice). The oracle reruns the identical closed-form
    waterfilling in SQL — integer-exact by construction."""
    from kafka_connect_jsonata_spark.operators.sampling import unimax_sample

    docs = load_table(spark, sf_dir, "documents")
    out = unimax_sample(docs, "doc_id", "lang", budget=701, max_epochs=2)
    return out.select("doc_id", "lang", F.col("epoch").cast("int").alias("epoch"))


UNIMAX_SQL = """
WITH cnt AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n FROM documents GROUP BY lang),
ord AS (
  SELECT lang, n, n * 2 AS cap,
         row_number() OVER (ORDER BY n ASC, lang ASC) AS j,
         count(*) OVER () AS k,
         coalesce(sum(n * 2) OVER (ORDER BY n ASC, lang ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx
  FROM cnt),
flg AS (
  SELECT *, (cap * (k - j + 1) <= 701 - pfx) AS binding FROM ord),
fin AS (
  SELECT lang, n,
         CASE WHEN binding THEN cap
              ELSE CAST(floor((701 - (SELECT coalesce(sum(cap), 0)
                                      FROM flg WHERE binding))
                   / (SELECT nullif(count(*), 0) FROM flg WHERE NOT binding))
                   AS BIGINT) END AS a
  FROM flg),
ranked AS (
  SELECT d.doc_id, d.lang, f.a, f.n,
         row_number() OVER (PARTITION BY d.lang
             ORDER BY md5(CAST(d.doc_id AS VARCHAR)) ASC, d.doc_id ASC) - 1 AS rn
  FROM documents d JOIN fin f USING (lang)),
epochs AS (
  SELECT doc_id, lang,
         (a // n) + CASE WHEN rn < (a % n) THEN 1 ELSE 0 END AS e
  FROM ranked)
SELECT doc_id, lang, CAST(unnest(range(e)) AS INT) AS epoch
FROM epochs WHERE e > 0
"""


def score_normalize_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C69: per-source score calibration — document length normalized per
    ``lang`` by ECDF position (percent_rank: integer-ratio arithmetic,
    engine-exact) and by min-max (order statistics, engine-exact). The
    zscore method and the approx ECDF-binning 100 TB tier are test-pinned
    instead (sum-order float sensitivity / t-digest)."""
    from kafka_connect_jsonata_spark.functions.curation import normalize_scores

    docs = load_table(spark, sf_dir, "documents")
    out = normalize_scores(
        docs, "n_chars", group_col="lang", method="percent_rank",
        out_col="pr_score", exact=True,
    )
    out = normalize_scores(
        out, "n_chars", group_col="lang", method="minmax", out_col="mm_score"
    )
    return out.select("doc_id", "lang", "pr_score", "mm_score")


SCORE_NORMALIZE_SQL = """
WITH s AS (
  SELECT doc_id, lang, CAST(n_chars AS DOUBLE) AS x,
         min(CAST(n_chars AS DOUBLE)) OVER (PARTITION BY lang) AS lo,
         max(CAST(n_chars AS DOUBLE)) OVER (PARTITION BY lang) AS hi,
         percent_rank() OVER (PARTITION BY lang
                              ORDER BY CAST(n_chars AS DOUBLE) ASC) AS pr_score
  FROM documents)
SELECT doc_id, lang, pr_score,
       CASE WHEN hi - lo > 0 THEN (x - lo) / (hi - lo) ELSE 0.0 END AS mm_score
FROM s
"""


def embedding_diversify_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C67 D4 mode: per-cluster prototype pruning (Tirumala et al. 2023) —
    drop the 30% of each cluster CLOSEST to its centroid (the most
    redundant points after semantic dedup), keeping the spread. Same
    assignment + auto-tiered quantile machinery as embedding_outlier_docs,
    opposite tail."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").cast("int").alias("cluster_id"),
        F.col("embedding").alias("centroid"),
    )
    return dedup.embedding_outlier_filter(emb, cents, q=0.7, prune="near")


EMBEDDING_DIVERSIFY_SQL = """
WITH c AS (
  SELECT CAST(vec_id AS INT) AS cluster_id, embedding AS cv
  FROM embeddings WHERE vec_id < 8),
p AS (
  SELECT e.vec_id, c.cluster_id,
         list_reduce(list_transform(list_zip(e.embedding, c.cv),
             q -> (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))
                * (CAST(q[1] AS DOUBLE) - CAST(q[2] AS DOUBLE))),
             (x, y) -> x + y) AS d
  FROM embeddings e CROSS JOIN c),
a AS (
  SELECT vec_id, cluster_id, round(d, 4) AS dist_sq FROM (
    SELECT vec_id, cluster_id, d,
           row_number() OVER (PARTITION BY vec_id ORDER BY d ASC, cluster_id ASC) AS r
    FROM p) t
  WHERE r = 1)
SELECT vec_id, cluster_id, dist_sq FROM (
  SELECT vec_id, cluster_id, dist_sq,
         percent_rank() OVER (PARTITION BY cluster_id
                              ORDER BY dist_sq ASC, vec_id ASC) AS pr
  FROM a) t
WHERE pr >= 0.30000000000000004
-- ^ the exact IEEE double Python computes for 1.0 - 0.7 (the engine's
-- quantile_filter threshold). DuckDB's bare `1.0 - 0.7` is DECIMAL
-- arithmetic (exactly 0.3 -> double 0.29999999999999999), which admits a
-- boundary row the engine excludes — the round-6 348-vs-349 red row.
"""


def dsir_gumbel_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C71: DSIR Gumbel top-k resampling (the paper's actual sampling step;
    dsir_select is the argmax flavor) — 25 raw docs drawn without
    replacement with probability ∝ exp(log_weight / 2) via the
    deterministic md5-position Gumbel key. The oracle reruns the identical
    DSIR stats AND the identical key arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    return classifier.dsir_gumbel_select(
        docs, F.col("source").isin("src0", "src1"), k=25, temperature=2.0,
        features=_dsir_features_shared(spark, sf_dir),
    )


def _dsir_gumbel_sql() -> str:
    hexv = "+".join(
        f"(strpos('0123456789abcdef', substr(h, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    return rf"""
WITH w AS (
  SELECT doc_id, source IN ('src0', 'src1') AS t,
         regexp_extract_all(trim(text), '\S+') AS ws
  FROM documents),
uni AS (SELECT doc_id, t, unnest(ws) AS g FROM w),
bi AS (
  SELECT doc_id, t,
         ws[CAST(i AS INT) + 1] || ' ' || ws[CAST(i AS INT) + 2] AS g
  FROM w, unnest(range(len(ws) - 1)) u(i)
  WHERE len(ws) >= 2),
f AS (
  SELECT doc_id, t,
         (strpos('0123456789abcdef', substr(md5(g), 1, 1)) - 1) * 256
       + (strpos('0123456789abcdef', substr(md5(g), 2, 1)) - 1) * 16
       + (strpos('0123456789abcdef', substr(md5(g), 3, 1)) - 1) AS j
  FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)),
dj AS (
  SELECT doc_id, t, j, CAST(count(*) AS BIGINT) AS c
  FROM f GROUP BY doc_id, t, j),
s AS (
  SELECT j, sum(CASE WHEN t THEN c ELSE 0 END) AS ct,
         sum(CASE WHEN t THEN 0 ELSE c END) AS cr
  FROM dj GROUP BY j),
tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS tt, CAST(sum(cr) AS DOUBLE) AS tr FROM s),
per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_features,
         sum(c * (ln(ct + 1.0) - ln(cr + 1.0))) AS ss
  FROM dj JOIN s USING (j) WHERE NOT t GROUP BY doc_id),
lw AS (
  SELECT doc_id, n_features,
         ss + n_features * (ln(tr + 4096.0) - ln(tt + 4096.0)) AS l
  FROM per CROSS JOIN tot),
g AS (
  SELECT doc_id, n_features, l,
         l / 2.0 - ln(-ln(({hexv} + 0.5) / 4294967296.0)) AS gk
  FROM (SELECT *, md5(CAST(doc_id AS VARCHAR)) AS h FROM lw))
SELECT doc_id, n_features, round(l, 6) AS log_weight, round(gk, 6) AS gumbel_key
FROM g ORDER BY gk DESC, doc_id ASC LIMIT 25
"""


DSIR_GUMBEL_SQL = _dsir_gumbel_sql()


def char_entropy_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C72: per-document character-distribution Shannon entropy (bits) —
    the cheap gibberish/boilerplate tail signal. One (doc, char) count
    shuffle bounded by distinct chars per doc; the float sum is per-doc
    over ~dozens of terms, rounded to 6 (the bigram/DSIR convention)."""
    docs = load_table(spark, sf_dir, "documents")
    return text.char_entropy(docs)


CHAR_ENTROPY_SQL = """
WITH c AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
  WHERE ch <> '' GROUP BY doc_id, ch),
p AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars_counted,
         sum(CAST(n AS DOUBLE) * log2(n)) AS s
  FROM c GROUP BY doc_id)
SELECT doc_id, n_chars_counted,
       round(log2(n_chars_counted) - s / n_chars_counted, 6) AS char_entropy
FROM p
"""


def semantic_clusters_vecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C73: graph-based semantic clustering — connected components over the
    corpus kNN graph thresholded at cosine >= 0.4 (k=3). The oracle reruns
    the brute-force kNN, the same rounded threshold cut, and the component
    closure as a recursive CTE (same pattern as dedup_group_ids)."""
    from kafka_connect_jsonata_spark.functions.similarity import semantic_clusters

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_clusters(emb, k=3, threshold=0.4)


SEMANTIC_CLUSTERS_SQL = """
WITH RECURSIVE pairs AS (
  SELECT query_id, neighbor_id FROM (
    SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY a.vec_id ORDER BY
             list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
              * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))) DESC,
             b.vec_id ASC) AS rank,
           round(list_reduce(list_transform(list_zip(a.embedding, b.embedding),
                         p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)
             / (sqrt(list_reduce(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
              * sqrt(list_reduce(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))), 4) AS sim
    FROM embeddings a CROSS JOIN embeddings b
    WHERE a.vec_id <> b.vec_id) t
  WHERE rank <= 3 AND sim >= 0.4),
edges AS (
  SELECT query_id AS src, neighbor_id AS dst FROM pairs
  UNION
  SELECT neighbor_id AS src, query_id AS dst FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
grp AS (SELECT src AS id, LEAST(src, MIN(dst)) AS gid FROM reach GROUP BY src)
SELECT e.vec_id, CAST(COALESCE(g.gid, e.vec_id) AS BIGINT) AS cluster_id
FROM embeddings e LEFT JOIN grp g ON e.vec_id = g.id
"""


def scrub_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C75: exact-span decontamination scrubbing — every 5-word span of a
    training doc that appears in the eval slice (doc_id % 50 == 0) is cut
    from the text; survivors rejoin with single spaces. The whole-doc flag
    flavor is decontaminate_docs; this is the keep-the-document variant."""
    docs = load_table(spark, sf_dir, "documents")
    eval_set = docs.filter(F.col("doc_id") % 50 == 0)
    return curation.scrub_contaminated_spans(docs, eval_set, ngram=5)


SCRUB_SPANS_SQL = r"""
WITH words AS (
  SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS w FROM documents),
sh AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p,
         array_to_string(w[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' ') AS s
  FROM words, UNNEST(range(1, len(w) - 5 + 2)) AS t(i)
  WHERE len(w) >= 5),
ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
cov AS (
  SELECT DISTINCT sh.doc_id, CAST(unnest(range(p, p + 5)) AS BIGINT) AS i
  FROM sh JOIN ev USING (s)),
agg AS (
  SELECT doc_id, count(*) AS nrem, list_sort(list(i)) AS cov FROM cov GROUP BY 1)
SELECT d.doc_id,
       COALESCE(array_to_string(
         list_filter(
           list_transform(range(len(w)), j -> CASE WHEN a.cov IS NULL
                 OR NOT list_contains(a.cov, j) THEN w[CAST(j + 1 AS BIGINT)] END),
           x -> x IS NOT NULL), ' '), '') AS text_clean,
       CAST(COALESCE(a.nrem, 0) AS BIGINT) AS words_removed
FROM words d LEFT JOIN agg a USING (doc_id)
"""


def resample_gapfill_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C74: hypertable-style fixed-interval resample + gap fill — per-user
    hourly average of ``value`` from each user's first to last event,
    empty hours forward-filled (LOCF). Oracle: identical bucket/grid/
    window in SQL (generate_series + last_value IGNORE NULLS)."""
    from kafka_connect_jsonata_spark.operators.relational import resample_gapfill

    ev = load_table(spark, sf_dir, "events")
    return resample_gapfill(ev, "ts", "user_id", "value", interval_sec=3600)


RESAMPLE_GAPFILL_SQL = """
WITH b AS (
  SELECT user_id, CAST(floor(epoch_ms(ts) / 3600000) AS BIGINT) AS b,
         avg(value) AS a
  FROM events GROUP BY 1, 2),
span AS (SELECT user_id, min(b) AS lo, max(b) AS hi FROM b GROUP BY 1),
grid AS (SELECT user_id, CAST(unnest(range(lo, hi + 1)) AS BIGINT) AS b FROM span),
j AS (SELECT g.user_id, g.b, bb.a FROM grid g LEFT JOIN b bb USING (user_id, b))
SELECT user_id,
       make_timestamp(b * 3600 * 1000000) AS bucket_start,
       round(last_value(a IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS value,
       a IS NULL AS filled
FROM j
"""


def cluster_balanced_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C76: cluster-balanced selection — a 300-doc budget spread uniformly
    across ``lang`` clusters (waterfilling, 80-per-cluster cap), each
    cluster contributing its LONGEST documents first. The oracle reruns
    the identical closed-form allocation + per-cluster rank in SQL."""
    from kafka_connect_jsonata_spark.operators.sampling import (
        cluster_balanced_select,
    )

    docs = load_table(spark, sf_dir, "documents")
    out = cluster_balanced_select(
        docs, "lang", "n_chars", budget=300, max_per_cluster=80
    )
    return out.select("doc_id", "lang", "n_chars", "sel_rank")


CLUSTER_BALANCED_SQL = """
WITH cnt AS (
  SELECT lang, LEAST(CAST(count(*) AS BIGINT), 80) AS cap FROM documents GROUP BY lang),
ord AS (
  SELECT lang, cap,
         row_number() OVER (ORDER BY cap ASC, lang ASC) AS j,
         count(*) OVER () AS k,
         coalesce(sum(cap) OVER (ORDER BY cap ASC, lang ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pfx
  FROM cnt),
flg AS (
  SELECT *, (cap * (k - j + 1) <= 300 - pfx) AS binding FROM ord),
fin AS (
  SELECT lang,
         CASE WHEN binding THEN cap
              ELSE CAST(floor((300 - (SELECT coalesce(sum(cap), 0)
                                      FROM flg WHERE binding))
                   / (SELECT nullif(count(*), 0) FROM flg WHERE NOT binding))
                   AS BIGINT) END AS a
  FROM flg),
ranked AS (
  SELECT d.doc_id, d.lang, d.n_chars, f.a,
         row_number() OVER (PARTITION BY d.lang
             ORDER BY d.n_chars DESC, d.doc_id ASC) - 1 AS r
  FROM documents d JOIN fin f USING (lang))
SELECT doc_id, lang, n_chars, CAST(r AS BIGINT) AS sel_rank
FROM ranked WHERE r < a
"""


def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C77: ordered conversion funnel over the events stream — users whose
    first signup is followed by a purchase and then an error, each step
    strictly after the previous and within 7 days of it (first-touch
    semantics: every step binds to the earliest qualifying occurrence)."""
    from kafka_connect_jsonata_spark.operators.relational import funnel_counts

    ev = load_table(spark, sf_dir, "events")
    return funnel_counts(
        ev,
        ["signup", "purchase", "error"],
        "ts",
        "user_id",
        "event_type",
        max_gap_sec=7 * 86400,
    )


FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, min(epoch_ms(ts)) AS t FROM events
  WHERE event_type = 'signup' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS t
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) > s1.t
    AND epoch_ms(e.ts) - s1.t <= 604800000
  GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS t
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'error' AND epoch_ms(e.ts) > s2.t
    AND epoch_ms(e.ts) - s2.t <= 604800000
  GROUP BY e.user_id)
SELECT 1 AS step, 'signup' AS event_type, (SELECT count(*) FROM s1) AS n_users
UNION ALL
SELECT 2, 'purchase', (SELECT count(*) FROM s2)
UNION ALL
SELECT 3, 'error', (SELECT count(*) FROM s3)
"""


def curation_pipeline_v3_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C82: composed curation pipeline v3 — the round-8 capstone with
    FUZZY DEDUP inside the chain: char-entropy gate (C72, H >= 3.0) ->
    minhash_dedup keep='best' on the exact per-doc character count (C79:
    each near-dup component keeps its longest-counted copy) -> 40-word
    floor -> per-lang rollup. Value-exact against the identical CTE
    chain (entropy + brute-force closure + per-component argmax in SQL)
    — the composability proof that the dedup family plugs into the
    quality chain like every other operator."""
    docs = load_table(spark, sf_dir, "documents")
    return curation_pipeline_v3(docs)


def curation_pipeline_v3(docs: DataFrame) -> DataFrame:
    from kafka_connect_jsonata_spark.functions.dedup import barrier

    ent = text.char_entropy(docs)
    # materialize the entropy-gated survivor set ONCE: minhash_dedup
    # references its input four ways (fingerprint pass, representative
    # semi-join, keep='best' score join, final anti-join) and the rollup
    # reads it again — without the barrier the entropy explode+aggregate
    # subtree re-executes per reference (round 13; the same round-7 fix
    # curation_pipeline_v2 already carries)
    survivors = barrier(
        docs.join(
            ent.filter(F.col("char_entropy") >= 3.0).select(
                "doc_id", "n_chars_counted"
            ),
            "doc_id",
        )
    )
    kept = dedup.minhash_dedup(
        survivors, num_hashes=32, n_bands=8, threshold=0.9,
        keep="best", score_col="n_chars_counted",
    )
    floored = kept.filter(
        F.size(
            F.filter(
                F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != ""
            )
        )
        >= 40
    )
    return (
        floored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars_counted").alias("total_chars"),
        )
        .orderBy("lang")
    )


CURATION_PIPELINE_V3_SQL = r"""
WITH RECURSIVE c AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents)
  WHERE ch <> '' GROUP BY doc_id, ch),
p AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS nc,
         log2(sum(n)) - sum(CAST(n AS DOUBLE) * log2(n)) / sum(n) AS h
  FROM c GROUP BY doc_id),
surv AS (
  SELECT d.doc_id, d.lang, d.text, p.nc
  FROM documents d JOIN p USING (doc_id) WHERE p.h >= 3.0),
g AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(s)-4,1)+1),
                                      i -> s[i:i+4])) AS grams
  FROM (SELECT doc_id,
               lower(regexp_replace(trim(text), '\s+', ' ', 'g')) AS s
        FROM surv)),
sized AS (SELECT doc_id, grams, len(grams) AS sz FROM g),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM sized a JOIN sized b
    ON a.doc_id < b.doc_id
   AND a.sz >= 0.9 * b.sz AND b.sz >= 0.9 * a.sz
  WHERE len(list_intersect(a.grams, b.grams))::DOUBLE /
        (a.sz + b.sz - len(list_intersect(a.grams, b.grams))) >= 0.9),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs),
reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
labels AS (
  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS group_id
  FROM reach GROUP BY src),
losers AS (
  SELECT doc_id FROM (
    SELECT l.doc_id,
           row_number() OVER (PARTITION BY l.group_id
                              ORDER BY s.nc DESC, l.doc_id ASC) AS r
    FROM labels l JOIN surv s USING (doc_id))
  WHERE r > 1),
kept AS (
  SELECT * FROM surv
  WHERE doc_id NOT IN (SELECT doc_id FROM losers)
    AND len(list_filter(regexp_split_to_array(trim(text), '\s+'),
            w -> w <> '')) >= 40)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(nc) AS BIGINT) AS total_chars
FROM kept GROUP BY lang ORDER BY lang
"""


def curation_pipeline_v2_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed round-6/7 curation pipeline — line-level cleaning (C58) ->
    character-entropy gate (C72, keep H >= 3.0) -> exact-span eval
    decontamination scrubbing (C75, 5-grams vs the doc_id % 50 slice of
    the CLEANED corpus) -> post-scrub length floor (>= 40 words) ->
    per-lang rollup. Value-exact against the same chain composed as SQL
    CTEs — the composability proof for the new operators (the round-5
    pipeline gate covers gopher/classifier/dedup/sample).

    The survivor set feeds FOUR downstream references (eval slice, scrub
    tokens, scrub grams, lang re-join) and the scrub's eval probe, so it
    is materialized once behind a lineage barrier — without it the
    clean+entropy subtree re-executes per reference (round-7 second-review
    fix)."""
    docs = load_table(spark, sf_dir, "documents")
    return curation_pipeline_v2(docs)


def curation_pipeline_v2(docs: DataFrame) -> DataFrame:
    """The pipeline body over an arbitrary documents frame — shared by the
    batch gate above and the foreachBatch stream-parity test (round-8:
    the same callable runs unchanged per micro-batch)."""
    from kafka_connect_jsonata_spark.functions.dedup import barrier

    cleaned = text.clean_lines(
        docs, delimiter=" the ", min_words=4, badwords=("spark",)
    ).select("doc_id", F.col("cleaned").alias("text"))
    cleaned = cleaned.join(docs.select("doc_id", "lang"), "doc_id")
    # spread=False: `cleaned` is a computed join, not a narrow scan — the
    # forced repartition measured +5-10% here (round-14 A/B)
    ent = text.char_entropy(cleaned, spread=False).filter(
        F.col("char_entropy") >= 3.0
    )
    survivors = barrier(cleaned.join(ent.select("doc_id"), "doc_id"))
    eval_set = survivors.filter(F.col("doc_id") % 50 == 0)
    scrubbed = curation.scrub_contaminated_spans(survivors, eval_set, ngram=5)
    kept = scrubbed.filter(
        F.size(F.split(F.trim(F.col("text_clean")), r"\s+")) >= 40
    )
    final = kept.join(survivors.select("doc_id", "lang"), "doc_id")
    return (
        final.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("words_removed").alias("total_scrubbed"),
        )
        .orderBy("lang")
    )


CURATION_PIPELINE_V2_SQL = r"""
WITH cleaned AS (
  SELECT d.doc_id, d.lang,
         coalesce(array_to_string(
           list_filter(str_split(d.text, ' the '), x ->
              len(list_filter(str_split(trim(x), ' '), w -> w <> '')) >= 4
              AND NOT contains(lower(x), 'spark')), ' the '), '') AS text
  FROM documents d),
chars AS (
  SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM cleaned)
  WHERE ch <> '' GROUP BY doc_id, ch),
ent AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           log2(sum(n)) - sum(CAST(n AS DOUBLE) * log2(n)) / sum(n) AS h
    FROM chars GROUP BY doc_id) t
  WHERE round(h, 6) >= 3.0),
surv AS (SELECT c.* FROM cleaned c JOIN ent USING (doc_id)),
words AS (
  SELECT doc_id, lang, regexp_extract_all(trim(text), '\S+') AS w FROM surv),
sh AS (
  SELECT doc_id, CAST(i - 1 AS BIGINT) AS p,
         array_to_string(w[CAST(i AS BIGINT):CAST(i + 4 AS BIGINT)], ' ') AS s
  FROM words, UNNEST(range(1, len(w) - 5 + 2)) AS t(i)
  WHERE len(w) >= 5),
ev AS (SELECT DISTINCT s FROM sh WHERE doc_id % 50 = 0),
cov AS (
  SELECT DISTINCT sh.doc_id, CAST(unnest(range(p, p + 5)) AS BIGINT) AS i
  FROM sh JOIN ev USING (s)),
agg AS (
  SELECT doc_id, count(*) AS nrem, list_sort(list(i)) AS cov
  FROM cov GROUP BY 1),
scrubbed AS (
  SELECT d.doc_id, d.lang,
         coalesce(array_to_string(
           list_filter(
             list_transform(range(len(w)), j -> CASE WHEN a.cov IS NULL
                   OR NOT list_contains(a.cov, j)
                 THEN w[CAST(j + 1 AS BIGINT)] END),
             x -> x IS NOT NULL), ' '), '') AS text_clean,
         CAST(coalesce(a.nrem, 0) AS BIGINT) AS words_removed
  FROM words d LEFT JOIN agg a USING (doc_id)),
kept AS (
  SELECT * FROM scrubbed
  WHERE len(list_filter(regexp_split_to_array(trim(text_clean), '\s+'),
            w -> w <> '')) >= 40)
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(words_removed) AS BIGINT) AS total_scrubbed
FROM kept GROUP BY lang ORDER BY lang
"""


def dataset_diff_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C87: dataset snapshot diff — classify every doc across two corpus
    snapshots as added / removed / changed / unchanged
    (:func:`~kafka_connect_jsonata_spark.operators.relational.snapshot_diff`).
    The versioning/audit primitive around every ingest, takedown, or
    recrawl of a production corpus. Snapshots are simulated
    deterministically from the documents table: v1 drops doc_id % 7 == 0,
    v2 drops doc_id % 5 == 0 and rewrites the text of doc_id % 11 == 0.
    Scale shape: two map-side (id, md5) reductions into one full-outer
    join on the unique id — the shuffle carries 16-byte fingerprints, not
    documents."""
    docs = load_table(spark, sf_dir, "documents")
    v1 = docs.filter(F.col("doc_id") % 7 != 0)
    v2 = docs.filter(F.col("doc_id") % 5 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 11 == 0, F.concat(F.col("text"), F.lit(" v2"))
        ).otherwise(F.col("text")),
    )
    return R.snapshot_diff(v1, v2, id_col="doc_id").orderBy("doc_id")


# fingerprint mirrors snapshot_diff's NULL sentinel (relational.py:
# coalesce to \x00) so a NULL text present in both snapshots hashes
# equal on both sides instead of NULL = NULL -> 'changed' (ADVICE r12)
DATASET_DIFF_SQL = """
WITH v1 AS (
  SELECT doc_id, md5(coalesce(text, chr(0))) AS fp
  FROM documents WHERE doc_id % 7 <> 0),
v2 AS (
  SELECT doc_id,
         md5(coalesce(
           CASE WHEN doc_id % 11 = 0 THEN text || ' v2' ELSE text END,
           chr(0))) AS fp
  FROM documents WHERE doc_id % 5 <> 0)
SELECT coalesce(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            WHEN v1.fp = v2.fp THEN 'unchanged'
            ELSE 'changed' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
ORDER BY doc_id
"""


def sorted_neighbor_dups_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C88: sorted-neighborhood near-dup blocking (Hernandez & Stolfo,
    SIGMOD '95) — sort on the normalized key, compare each doc to its 2
    sort successors, keep pairs with equal keys or a 40-char shared
    prefix. The third blocking family beside LSH and prefix-filtered
    set-similarity; comparisons are window*N by construction. Auto tier
    takes the exact global-window path at gate scale; the 100 TB tier is
    a range exchange + driver prefix-sum rank (no single-task stage) —
    parity unit-pinned."""
    from kafka_connect_jsonata_spark.functions.dedup import (
        sorted_neighbor_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sorted_neighbor_pairs(
        docs, window=2, key_len=80, prefix_len=40
    ).orderBy("a_id", "b_id")


SORTED_NEIGHBOR_SQL = """
WITH k AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'), 1, 80)
           AS key
  FROM documents WHERE text IS NOT NULL),
r AS (
  SELECT doc_id, key,
         row_number() OVER (ORDER BY key, doc_id) AS rnk
  FROM k)
SELECT a.doc_id AS a_id, b.doc_id AS b_id, CAST(b.rnk - a.rnk AS INT) AS gap
FROM r a JOIN r b ON b.rnk > a.rnk AND b.rnk <= a.rnk + 2
WHERE a.key = b.key
   OR (length(a.key) >= 40 AND length(b.key) >= 40
       AND substr(a.key, 1, 40) = substr(b.key, 1, 40))
ORDER BY a_id, b_id
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# Ordering contract (round-3 verdict item 1): the driver's correctness gate
# checks the FIRST 50 entries, so the first 50 are one oracle-gated
# representative per operator family — every §2C/C24-C37 family included.
# Entries past 50 are equally registered and oracle-checked by the builder's
# own sweep (tools/check_oracle.py, COVERAGE.md); they are siblings of an
# in-window gate (e.g. cube/grouping-sets vs rollup) or rows-only by
# construction.
# Round-5 rotation (round-4 verdict item 9): six always-green basics
# (window_running_total, distinct_segments, setop_intersect,
# outer_join_nation_parties, pivot_returnflag, explode_term_freq) moved
# past the window in favor of first-party driver rows for the newest
# operators (mixture/pack/picture/interpreter) plus the de-vacuated
# dedup_exact_docs and the new unigram_floor_docs.
# Round-5 second rotation: the seven C43-C49 additions (bloom semi-join,
# duplicated-substring removal, hashed classifier, Gopher filter,
# quantile filter, temperature mixing, composed pipeline) get in-window
# rows; demoted to the builder sweep: seven siblings whose family stays
# represented (lang_id_counts, cosine_topk_bruteforce,
# stratified_sample_docs, jsonata_datetime_array_ops, simhash_docs,
# unigram_floor_docs, pca_project_fixed).
# Round-6 rotation: the four C58-C61 additions (line cleaning, inverted
# index, boilerplate removal, fuzzy decontamination) get in-window rows;
# demoted: mixture_sample_docs (sampling family keeps temperature_mix +
# hash_sample), jsonata_picture_format (jsonata family keeps flagship/
# object_ops/interpreter), sliding_window_agg (streaming family keeps
# sessionize), approx_distinct_stats (sketch family keeps percentile).
# Round-6 second rotation: the five C62-C66 additions (SemDeDup, DSIR,
# Zipf fit, vocab coverage, curriculum order) get in-window rows; demoted
# with family kept represented: tfidf_top_terms (term weighting: bm25 +
# unigram stay), kmeans_assign (clustering: semantic_dedup_pairs runs the
# same centroid assignment), chunk_dedup_docs (sub-doc dedup:
# dup_span_removal stays), heavy_hitter_terms (sketches: percentile
# stays), hash_sample_docs (sampling: temperature_mix + curriculum stay).
# Round-6 third rotation: embedding_outlier_docs (C67, added after the
# second rotation) gets an in-window row; multimodal_byte_stats demoted
# (multimodal keeps multimodal_frame_sample in-window).
# Round-6 fourth rotation: the late C68-C70 additions (UniMax mixing,
# score normalization, kNN graph) get in-window rows; demoted with family
# kept represented: q5_local_supplier (equi-join: q1 TPC-H + skew_salted
# stay), semi_join_customers (semi-join: bloom_semi_join stays),
# udtf_explode_tokens (Python hosting: jsonata_interpreter stays).
# Round-7 rotation: embedding_diversify_docs (C67 prune="near", the round-6
# red oracle row — fixed + unit-tested this round) takes the in-window slot
# of its sibling embedding_outlier_docs (same assignment+quantile machinery;
# the far mode stays oracle-registered in the builder/judge sweep).
# Round-7 second rotation: the two genuinely NEW-family round-7 gates get
# in-window rows — resample_gapfill_events (C74 time-series rollup) and
# funnel_events (C77 sequence analytics); demoted with family kept
# represented: jsonata_object_ops (jsonata keeps flagship + interpreter
# in-window, picture/string/datetime gates in the sweep) and
# decontaminate_docs (decontamination keeps fuzzy_decontaminate_docs
# in-window, plus the new scrub_spans_docs in the sweep). The other
# round-7 additions (q10/q18, C71 gumbel, C72 entropy, C73 clusters, C75
# scrub, C76 balanced-select) stay in the sweep: each extends a family
# that already holds an in-window representative.
# Round-8 rotation (round-7 verdict item 4): every judge-green round-7
# gate that never had a driver CORRECTNESS row moves in-window —
# dsir_gumbel_docs, char_entropy_docs, semantic_clusters_vecs,
# scrub_spans_docs, cluster_balanced_docs, curation_pipeline_v2_docs,
# q10_returned_items, q18_large_volume_customer — plus the new composed
# C79 minhash_dedup_docs. Demoted with family kept represented:
# q1_pricing_summary (TPC-H: q10 + q18 in-window), text_doc_stats (text
# stats: char_entropy + zipf in-window), ngram_jaccard_dups +
# dedup_group_ids + minhash_lsh_dups (near-dup: minhash_dedup_docs runs
# pairs -> components -> anti-join end-to-end), curation_pipeline_docs
# (pipeline: v2 in-window), dsir_select_docs (DSIR: gumbel in-window),
# vocab_coverage_docs (corpus stats: zipf in-window), knn_graph_edges
# (semantic graph: semantic_clusters_vecs builds on the same kNN graph).
# Round-9 rotation (round-8 verdict item 2): the nine judge-green round-8
# gates move in-window — q4/q12/q14/q19/q22, minhash_dedup_best_docs,
# minhash_dedup_incr_docs, curation_pipeline_v3_docs,
# simhash_dup_pairs_docs — plus the new round-9 hot-bucket stress gate
# minhash_dedup_boiler_docs. Demoted with family kept represented:
# q10_returned_items + q18_large_volume_customer (TPC-H: the five round-8
# shapes in-window), bloom_semi_join_lineitem (semi-join: q4's EXISTS
# semi-join in-window), curation_pipeline_v2_docs (pipeline: v3
# in-window), score_normalize_docs + curriculum_order_docs (sampling/
# mixing: temperature_mix + unimax_mix + cluster_balanced in-window),
# embedding_covariance_stats (embedding stats: pca/quantize in sweep,
# five embedding gates in-window), unigram_logprob_docs (LM scoring:
# dsir_gumbel + zipf_fit in-window), repetition_quality (quality: gopher
# + quality_classifier + char_entropy in-window), clean_lines_docs (line
# cleaning: boilerplate_removal in-window).
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    # -- relational / text / similarity / jsonata representatives --
    "filter_project_events": filter_project_events,
    "json_props_extract": json_props_extract,
    "topk_per_group": topk_per_group,
    "rollup_lineitem": rollup_lineitem,
    # round-14 rotations IN (round-13 verdict item 3: driver ground truth
    # over the round-13 rewrites — O6 window rewrite, O12 literal arrays,
    # O7 guard fold, O9 prefilter). Demoted with family kept represented:
    # range_join_parts (range/interval joins: asof_join + skew_salted
    # in-window), dedup_exact_docs (exact dedup: minhash_dedup_docs runs
    # the same collapse-exact stage in-window), dataset_diff_docs
    # (decontamination diff: fuzzy_decontaminate + decontaminate in
    # sweep), envelope_reroute (jsonata: flagship + interpreter +
    # safe_transform_dlq in-window), resample_gapfill_events +
    # percentile_summary (events/agg: sessionize + asof_join + funnel +
    # rollup + topk in-window), vocab_coverage_docs (corpus stats:
    # char_entropy + clean_lines in-window). All seven stay
    # oracle-registered in the builder/judge sweep.
    "q2_minimum_cost_supplier": q2_minimum_cost_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "kmeans_assign": kmeans_assign,
    "pca_project_fixed": pca_project_fixed,
    "embedding_outlier_docs": embedding_outlier_docs,
    "heavy_hitter_terms": heavy_hitter_terms,
    "minhash_lsh_dups": minhash_lsh_dups,
    "asof_join_events_orders": asof_join_events_orders,
    "char_entropy_docs": char_entropy_docs,
    "inverted_index_terms": inverted_index_terms,
    "minhash_dedup_docs": minhash_dedup_docs,
    "semantic_clusters_vecs": semantic_clusters_vecs,
    "cluster_balanced_docs": cluster_balanced_docs,
    "pack_token_budget_docs": pack_token_budget_docs,
    "safe_transform_dlq": safe_transform_dlq,
    "bm25_search": bm25_search,
    "skew_salted_join": skew_salted_join,
    "jsonata_flagship": jsonata_flagship,
    "quality_classifier_docs": quality_classifier_docs,
    "jsonata_interpreter": jsonata_interpreter,
    "score_normalize_docs": score_normalize_docs,
    "curriculum_order_docs": curriculum_order_docs,
    # -- streaming / sketch / multimodal / curation gates --
    "sessionize_events": sessionize_events,
    "sorted_neighbor_dups_docs": sorted_neighbor_dups_docs,
    "embedding_dup_pairs": embedding_dup_pairs_q,
    "multimodal_frame_sample": multimodal_frame_sample,
    "funnel_events": funnel_events,
    "unimax_mix_docs": unimax_mix_docs,
    "q20_potential_promotion_suppliers": q20_potential_promotion_suppliers,
    "ngram_jaccard_dups": ngram_jaccard_dups,
    "clean_lines_docs": clean_lines_docs,
    "dsir_select_docs": dsir_select_docs,
    "quantile_filter_docs": quantile_filter_docs,
    "minhash_dedup_incr_docs": minhash_dedup_incr_docs,
    "q11_important_stock": q11_important_stock,
    "boilerplate_removal_docs": boilerplate_removal_docs,
    "fuzzy_decontaminate_docs": fuzzy_decontaminate_docs,
    "semantic_dedup_pairs": semantic_dedup_pairs,
    "dsir_gumbel_docs": dsir_gumbel_docs,
    "q7_volume_shipping": q7_volume_shipping,
    "embedding_quantize_stats": embedding_quantize_stats,
    "simhash_dup_pairs_docs": simhash_dup_pairs_docs,
    "scrub_spans_docs": scrub_spans_docs,
    "multimodal_byte_stats": multimodal_byte_stats,
    "knn_graph_edges": knn_graph_edges,
    "curation_pipeline_v3_docs": curation_pipeline_v3_docs,
    # -- past the gate window: oracle-registered siblings (builder sweep) --
    # round-14 window demotions (see the rotation-IN note above):
    "range_join_parts": range_join_parts,
    "dedup_exact_docs": dedup_exact_docs,
    "dataset_diff_docs": dataset_diff_docs,
    "envelope_reroute": envelope_reroute,
    "resample_gapfill_events": resample_gapfill_events,
    "percentile_summary": percentile_summary,
    "vocab_coverage_docs": vocab_coverage_docs,
    # round-12 window demotions (families stay represented in-window:
    # TPC-H by q2/q6/q7/q11/q20, ANN by ann_ivf_topk + embedding_dup_pairs
    # + knn_graph_edges, near-dup by ngram_jaccard/minhash_dedup(_incr)/
    # simhash, span signals by scrub_spans + dup_ngram_coverage, mixing by
    # weighted_sample + dsir_gumbel, quality by quality_classifier +
    # char_entropy + quantile_filter, redaction by scrub_spans, jsonata by
    # flagship/interpreter/safe_transform_dlq, corpus stats by
    # char_entropy):
    "q21_suppliers_kept_waiting": q21_suppliers_kept_waiting,
    "dup_span_removal_docs": dup_span_removal_docs,
    "ann_lsh_topk": ann_lsh_topk,
    "temperature_mix_docs": temperature_mix_docs,
    "gopher_quality_docs": gopher_quality_docs,
    "pii_redact_docs": pii_redact_docs,
    "jsonata_transform_update": jsonata_transform_update,
    "dedup_group_ids": dedup_group_ids,
    "zipf_fit_docs": zipf_fit_docs,
    # round-10 window demotions (judge verdict item 2: the eleven
    # round-9 judge-green gates rotated in; each demoted family stays
    # represented in-window -- TPC-H by q7+the ten new shapes, dedup by
    # minhash_dedup_docs/_incr/simhash/fuzzy_decontaminate, similarity by
    # ann_lsh/semantic_clusters/semantic_dedup/embedding_dup_pairs+knn,
    # mixing by temperature_mix/dsir_gumbel, IR by bm25_search):
    "q4_order_priority": q4_order_priority,
    "q12_shipping_priority_class": q12_shipping_priority_class,
    "q14_promo_effect": q14_promo_effect,
    "q19_discounted_revenue": q19_discounted_revenue,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
    "minhash_dedup_best_docs": minhash_dedup_best_docs,
    "ann_ivf_topk": ann_ivf_topk,
    "weighted_sample_docs": weighted_sample_docs,
    "embedding_diversify_docs": embedding_diversify_docs,
    "normalize_docs": normalize_docs,
    "minhash_dedup_boiler_docs": minhash_dedup_boiler_docs,
    # round-9 window demotions (families stay represented in-window by
    # dup_span_removal_docs / char_entropy_docs):
    "q15_top_supplier": q15_top_supplier,
    "q16_parts_supplier_relationship": q16_parts_supplier_relationship,
    # round-9 TPC-H completion (all 22 classic shapes now adapted):
    "q1_pricing_summary": q1_pricing_summary,
    "q10_returned_items": q10_returned_items,
    "q18_large_volume_customer": q18_large_volume_customer,
    "bloom_semi_join_lineitem": bloom_semi_join_lineitem,
    "curation_pipeline_v2_docs": curation_pipeline_v2_docs,
    "q6_forecast_revenue": q6_forecast_revenue,
    "unpivot_lineitem": unpivot_lineitem,
    "embedding_covariance_stats": embedding_covariance_stats,
    "unigram_logprob_docs": unigram_logprob_docs,
    "repetition_quality": repetition_quality,
    "interval_join_parts": interval_join_parts,
    "text_doc_stats": text_doc_stats,
    "q8_market_share": q8_market_share,
    "q13_customer_distribution": q13_customer_distribution,
    "q9_product_type_profit": q9_product_type_profit,
    "curation_pipeline_docs": curation_pipeline_docs,
    "bigram_logprob_docs": bigram_logprob_docs,
    "tumbling_window_agg": tumbling_window_agg,
    "q5_local_supplier": q5_local_supplier,
    # round-9 TPC-H correlated-subquery tail (verdict item 4; sweep —
    # TPC-H family holds five in-window rows via the round-9 rotation)
    "semi_join_customers": semi_join_customers,
    "udtf_explode_tokens": udtf_explode_tokens,
    "temperature_token_mix_docs": temperature_token_mix_docs,
    "dup_ngram_coverage_docs": dup_ngram_coverage_docs,
    "tfidf_top_terms": tfidf_top_terms,
    "chunk_dedup_docs": chunk_dedup_docs,
    "hash_sample_docs": hash_sample_docs,
    "mixture_sample_docs": mixture_sample_docs,
    "jsonata_picture_format": jsonata_picture_format,
    "sliding_window_agg": sliding_window_agg,
    "approx_distinct_stats": approx_distinct_stats,
    "lang_id_counts": lang_id_counts,
    "cosine_topk_bruteforce": cosine_topk_bruteforce,
    "stratified_sample_docs": stratified_sample_docs,
    "jsonata_datetime_array_ops": jsonata_datetime_array_ops,
    "simhash_docs": simhash_docs,
    "unigram_floor_docs": unigram_floor_docs,
    "q3_shipping_priority": q3_shipping_priority,
    "window_running_total": window_running_total,
    "cube_orders": cube_orders,
    "grouping_sets_orders": grouping_sets_orders,
    "window_rank_suite": window_rank_suite,
    "anti_join_customers": anti_join_customers,
    "setop_intersect": setop_intersect,
    "setop_except": setop_except,
    "union_party_balances": union_party_balances,
    "outer_join_nation_parties": outer_join_nation_parties,
    "left_join_order_gaps": left_join_order_gaps,
    "distinct_segments": distinct_segments,
    "dedup_first_line": dedup_first_line,
    "explode_term_freq": explode_term_freq,
    "pivot_returnflag": pivot_returnflag,
    "token_count_summary": token_count_summary,
    "hash_split_counts": hash_split_counts,
    "chunk_overlap_docs": chunk_overlap_docs,
    "jsonata_string_ops": jsonata_string_ops,
    "skew_split_right_join": skew_split_right_join,
    "asof_forward_events_orders": asof_forward_events_orders,
    "shuffle_positions_docs": shuffle_positions_docs,
    "jsonata_object_ops": jsonata_object_ops,
    "decontaminate_docs": decontaminate_docs,
    # -- rows-only (driver-side eigh / iterative / rng payloads) --
    "quality_classifier_train": quality_classifier_train,
    "bpe_encode_docs": bpe_encode_docs,
    "compression_ratio_docs": compression_ratio_docs,
    "pack_bpe_budget_docs": pack_bpe_budget_docs,
    "multimodal_image_stats": multimodal_image_stats,
    "multimodal_audio_features": multimodal_audio_features,
    "pca_project_embeddings": pca_project_embeddings,
    "kmeans_clusters": kmeans_clusters,
    "stream_incremental_dedup_docs": stream_incremental_dedup_docs,
}

ORACLES: dict[str, str] = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "filter_project_events": FILTER_PROJECT_SQL,
    "json_props_extract": JSON_PROPS_SQL,
    "topk_per_group": TOPK_SQL,
    "window_running_total": WINDOW_RUNNING_SQL,
    "rollup_lineitem": ROLLUP_SQL,
    "cube_orders": CUBE_SQL,
    "grouping_sets_orders": GROUPING_SETS_SQL,
    "window_rank_suite": WINDOW_RANK_SQL,
    "semi_join_customers": SEMI_JOIN_SQL,
    "anti_join_customers": ANTI_JOIN_SQL,
    "range_join_parts": RANGE_JOIN_SQL,
    "asof_join_events_orders": ASOF_SQL,
    "setop_intersect": SETOP_INTERSECT_SQL,
    "setop_except": SETOP_EXCEPT_SQL,
    "union_party_balances": UNION_PARTIES_SQL,
    "outer_join_nation_parties": OUTER_JOIN_SQL,
    "left_join_order_gaps": LEFT_JOIN_GAPS_SQL,
    "distinct_segments": DISTINCT_SQL,
    "dedup_first_line": DEDUP_FIRST_SQL,
    "explode_term_freq": TERM_FREQ_SQL,
    "pivot_returnflag": PIVOT_SQL,
    "unpivot_lineitem": UNPIVOT_SQL,
    "text_doc_stats": TEXT_STATS_SQL,
    "lang_id_counts": LANG_ID_SQL,
    "token_count_summary": TOKEN_COUNT_SQL,
    "dedup_exact_docs": DEDUP_DOCS_SQL,
    "cosine_topk_bruteforce": COSINE_TOPK_SQL,
    "ngram_jaccard_dups": NGRAM_JACCARD_SQL,
    "dedup_group_ids": DEDUP_GROUPS_SQL,
    "hash_sample_docs": HASH_SAMPLE_SQL,
    "hash_split_counts": HASH_SPLIT_SQL,
    "stratified_sample_docs": STRATIFIED_SAMPLE_SQL,
    "safe_transform_dlq": SAFE_TRANSFORM_SQL,
    "bm25_search": BM25_SQL,
    "embedding_quantize_stats": EMBEDDING_QUANTIZE_SQL,
    "skew_salted_join": SKEW_SALTED_JOIN_SQL,
    "skew_split_right_join": SKEW_SPLIT_RIGHT_SQL,
    "interval_join_parts": RANGE_JOIN_SQL,
    "asof_forward_events_orders": ASOF_FORWARD_SQL,
    "shuffle_positions_docs": SHUFFLE_POSITIONS_SQL,
    "normalize_docs": NORMALIZE_SQL,
    "bigram_logprob_docs": BIGRAM_LOGPROB_SQL,
    "chunk_overlap_docs": CHUNK_OVERLAP_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "dup_ngram_coverage_docs": DUP_NGRAM_SQL,
    "weighted_sample_docs": WEIGHTED_SAMPLE_SQL,
    "bloom_semi_join_lineitem": BLOOM_SEMI_SQL,
    "dup_span_removal_docs": DUP_SPAN_SQL,
    "quality_classifier_docs": QUALITY_CLASSIFIER_SQL,
    "gopher_quality_docs": GOPHER_SQL,
    "quantile_filter_docs": QUANTILE_FILTER_SQL,
    "clean_lines_docs": CLEAN_LINES_SQL,
    "inverted_index_terms": INVERTED_INDEX_SQL,
    "boilerplate_removal_docs": BOILERPLATE_SQL,
    "fuzzy_decontaminate_docs": FUZZY_DECON_SQL,
    "semantic_dedup_pairs": SEMANTIC_DEDUP_SQL,
    "dsir_select_docs": DSIR_SELECT_SQL,
    "zipf_fit_docs": ZIPF_FIT_SQL,
    "vocab_coverage_docs": VOCAB_COVERAGE_SQL,
    "curriculum_order_docs": CURRICULUM_SQL,
    "embedding_outlier_docs": EMBEDDING_OUTLIER_SQL,
    "unimax_mix_docs": UNIMAX_SQL,
    "score_normalize_docs": SCORE_NORMALIZE_SQL,
    "temperature_token_mix_docs": TEMPERATURE_TOKEN_MIX_SQL,
    "knn_graph_edges": KNN_GRAPH_SQL,
    "embedding_diversify_docs": EMBEDDING_DIVERSIFY_SQL,
    "temperature_mix_docs": TEMPERATURE_MIX_SQL,
    "curation_pipeline_docs": CURATION_PIPELINE_SQL,
    "envelope_reroute": ENVELOPE_REROUTE_SQL,
    "jsonata_object_ops": JSONATA_OBJECT_OPS_SQL,
    "udtf_explode_tokens": UDTF_EXPLODE_SQL,
    "jsonata_flagship": JSONATA_FLAGSHIP_SQL,
    "jsonata_interpreter": JSONATA_FLAGSHIP_SQL,
    "jsonata_string_ops": JSONATA_STRING_OPS_SQL,
    "jsonata_datetime_array_ops": JSONATA_DATETIME_SQL,
    "jsonata_picture_format": JSONATA_PICTURE_SQL,
    "tumbling_window_agg": TUMBLING_SQL,
    "sliding_window_agg": SLIDING_SQL,
    "sessionize_events": SESSIONIZE_SQL,
    "percentile_summary": PERCENTILE_SQL,
    # sketch-based queries carry oracles via deterministic exact slices /
    # error-bound projections; simhash via the md5-parity portable variant
    "approx_distinct_stats": APPROX_DISTINCT_SQL,
    "minhash_lsh_dups": MINHASH_LSH_SQL,
    "simhash_docs": SIMHASH_SQL,
    "ann_lsh_topk": COSINE_TOPK_SQL,
    "ann_ivf_topk": COSINE_TOPK_SQL,
    "embedding_dup_pairs": EMBEDDING_DUP_SQL,
    "multimodal_byte_stats": MULTIMODAL_BYTE_SQL,
    "multimodal_frame_sample": MULTIMODAL_FRAME_SQL,
    # multimodal_image_stats / multimodal_audio_features: payload content is
    # rng-generated (no SQL analog) - rows-only; exact values pinned in
    # tests/test_multimodal.py
    "decontaminate_docs": DECONTAMINATE_SQL,
    "pii_redact_docs": PII_REDACT_SQL,
    "repetition_quality": REPETITION_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "kmeans_assign": KMEANS_ASSIGN_SQL,
    "embedding_covariance_stats": EMBEDDING_COV_SQL,
    "chunk_dedup_docs": CHUNK_DEDUP_SQL,
    "unigram_logprob_docs": UNIGRAM_LOGPROB_SQL,
    "unigram_floor_docs": UNIGRAM_FLOOR_SQL,
    "heavy_hitter_terms": HEAVY_HITTERS_SQL,
    "pca_project_fixed": PCA_FIXED_SQL,
    "mixture_sample_docs": MIXTURE_SAMPLE_SQL,
    "pack_token_budget_docs": PACK_TOKEN_BUDGET_SQL,
    "q10_returned_items": Q10_SQL,
    "q18_large_volume_customer": Q18_SQL,
    "dsir_gumbel_docs": DSIR_GUMBEL_SQL,
    "char_entropy_docs": CHAR_ENTROPY_SQL,
    "dataset_diff_docs": DATASET_DIFF_SQL,
    "sorted_neighbor_dups_docs": SORTED_NEIGHBOR_SQL,
    "semantic_clusters_vecs": SEMANTIC_CLUSTERS_SQL,
    "scrub_spans_docs": SCRUB_SPANS_SQL,
    "resample_gapfill_events": RESAMPLE_GAPFILL_SQL,
    "cluster_balanced_docs": CLUSTER_BALANCED_SQL,
    "funnel_events": FUNNEL_SQL,
    "curation_pipeline_v2_docs": CURATION_PIPELINE_V2_SQL,
    "minhash_dedup_docs": MINHASH_DEDUP_SQL,
    "q4_order_priority": Q4_SQL,
    "q12_shipping_priority_class": Q12_SQL,
    "q14_promo_effect": Q14_SQL,
    "q19_discounted_revenue": Q19_SQL,
    "q22_global_sales_opportunity": Q22_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
    "q21_suppliers_kept_waiting": Q21_SQL,
    "q7_volume_shipping": Q7_SQL,
    "q8_market_share": Q8_SQL,
    "q9_product_type_profit": Q9_SQL,
    "q11_important_stock": Q11_SQL,
    "q13_customer_distribution": Q13_SQL,
    "q15_top_supplier": Q15_SQL,
    "q16_parts_supplier_relationship": Q16_SQL,
    "jsonata_transform_update": JSONATA_TRANSFORM_UPDATE_SQL,
    "q2_minimum_cost_supplier": Q2_SQL,
    "q20_potential_promotion_suppliers": Q20_SQL,
    # boiler gate: replicas provably change nothing, so the PLAIN-corpus
    # closure is the exact oracle (see the gate docstring's argument)
    "minhash_dedup_boiler_docs": MINHASH_DEDUP_SQL,
    "minhash_dedup_best_docs": MINHASH_DEDUP_BEST_SQL,
    "minhash_dedup_incr_docs": MINHASH_DEDUP_INCR_SQL,
    "curation_pipeline_v3_docs": CURATION_PIPELINE_V3_SQL,
    "simhash_dup_pairs_docs": SIMHASH_PAIRS_SQL,
}
