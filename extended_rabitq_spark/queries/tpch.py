"""Classic relational analytics over the driver's TPC-H-style tables
(orders/lineitem/customer/supplier/nation/region) — the general-OLAP
face of the engine, adapted to the slimmed fixture schemas.

Cross-engine determinism note: SUM over DOUBLE is partial-agg
order-dependent (low bits differ between engines and even between
runs), so every money aggregate here sums ``DECIMAL(38,6)`` — exact
and order-independent on both engines, and the semantically right type
for money.  Single-row double arithmetic (the discount product) IS
deterministic, so it happens before the cast.

Output-type contract (VERDICT r4): DECIMAL stays INTERNAL (sums,
HAVING cuts, ORDER BY keys — where exactness matters) but every FINAL
projection casts to DOUBLE on both sides.  DECIMAL finals are
driver-hash-hostile: the harness's pandas canonicalization coerces
DECIMAL(38,6) to float64 on one engine but not the other, so
bit-identical decimal answers hash-mismatch (r4's tpch_q1).  One
correctly-rounded conversion each from identical decimals is
deterministic; tests/test_oracle_types.py forbids DECIMAL finals.

Plans: Q1 is one partial-agg groupBy (map-side combine); Q3/Q5 are
star joins — Catalyst broadcasts every dimension side automatically at
these sizes (asserted in tests/test_sources_plans.py); the fact table
never shuffles except for the final aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..tables import read_parquet

_DEC = "decimal(38,6)"


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("tpch_q1", _Q1_ORACLE)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary (adapted): one partial-agg groupBy over
    the fact table — the canonical map-side-combine aggregation."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp")
    )
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("sum_qty"),
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double").alias("sum_base_price"),
            F.sum(disc.cast(_DEC)).cast("double").alias("sum_disc_price"),
            F.sum((disc * (1 + F.col("l_tax"))).cast(_DEC)).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


_Q3_ORACLE = """
SELECT l_orderkey, CAST(revenue AS DOUBLE) AS revenue, o_orderdate
FROM (
    SELECT l_orderkey,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
) t
"""


@register("tpch_q3", _Q3_ORACLE)
def tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping priority (adapted: fixture has no
    o_shippriority; date window shifted to the fixture's 1995+ range): star join — the customer dim broadcasts, the fact
    table shuffles once for the aggregation; top-10 with a (revenue,
    orderkey) tie-break so both engines cut identically."""
    cust = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
            ).alias("revenue")
        )
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
        .select(
            "l_orderkey",
            F.col("revenue").cast("double").alias("revenue"),
            "o_orderdate",
        )
    )


_Q5_ORACLE = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
GROUP BY n_name
"""


@register("tpch_q5", _Q5_ORACLE)
def tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: the full star — region/nation/
    supplier/customer dims broadcast; the local-supplier condition
    (c_nationkey = s_nationkey) rides the supplier join."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    j = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(nat, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(reg, F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return j.groupBy("n_name").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
        .cast("double")
        .alias("revenue")
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name, CAST(revenue AS DOUBLE) AS revenue, n_name
FROM (
    SELECT c_custkey, c_name,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS revenue,
           n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1995-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
) t
"""


@register("tpch_q10", _Q10_ORACLE)
def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting (adapted dates): top-20 lossy
    customers by returned revenue; nation dim broadcasts."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-07-01 00:00:00").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nat = _t(spark, sf_dir, "nation")
    rev = (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(nat, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
            ).alias("revenue")
        )
    )
    return (
        rev.orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("revenue").cast("double").alias("revenue"),
            "n_name",
        )
    )


Q18_QTY = 250  # ~p98 of per-order quantity at fixture scale

_Q18_ORACLE = f"""
WITH big AS (
    SELECT l_orderkey
    FROM lineitem GROUP BY l_orderkey
    HAVING sum(CAST(l_quantity AS DECIMAL(38,6))) > {Q18_QTY}
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice,
       CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN big      ON big.l_orderkey = o_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
"""


@register("tpch_q18", _Q18_ORACLE)
def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers (threshold adapted to fixture
    scale): the HAVING subquery becomes a broadcast semi-ish join of
    the big-order keys — partial-agg groupBy feeds a tiny key list."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("q"))
        .where(F.col("q") > Q18_QTY)
        .select("l_orderkey")
    )
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(big.withColumnRenamed("l_orderkey", "bk")),
              F.col("bk") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).cast("double").alias("total_qty"))
    )


_Q7_ORACLE = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS BIGINT) AS l_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM supplier
JOIN lineitem ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


@register("tpch_q7", _Q7_ORACLE)
def tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping (adapted): two-nation trade flows (fixture nation names) —
    both nation dims broadcast twice under different aliases."""
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    j = (
        supp.join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").cast("long").alias("l_year"),
    ).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
        .cast("double")
        .alias("revenue")
    )


_Q14_ORACLE = """
SELECT round(100.00 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                 ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
           / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE), 6)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
"""


@register("tpch_q14", _Q14_ORACLE)
def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect (adapted dates): conditional decimal
    aggregate over the part-join; ratio computed in DOUBLE from exact
    decimal sums, rounded for cross-engine hash parity."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    part = _t(spark, sf_dir, "part")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)
    zero = F.lit(0).cast(_DEC)
    j = li.join(part, F.col("l_partkey") == F.col("p_partkey"))
    return j.agg(
        F.round(
            100.0
            * F.sum(
                F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(zero)
            ).cast("double")
            / F.sum(disc).cast("double"),
            6,
        ).alias("promo_revenue_pct")
    )


_Q6_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("tpch_q6", _Q6_ORACLE)
def tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast revenue change (adapted dates): pure
    filter-aggregate — every predicate pushes to the parquet scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum((F.col("l_extendedprice") * F.col("l_discount")).cast(_DEC))
        .cast("double")
        .alias("revenue")
    )


_Q19_ORACLE = """
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)
"""


@register("tpch_q19", _Q19_ORACLE)
def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue (adapted to fixture brands): a
    disjunctive join predicate — Catalyst keeps the equi-join on
    partkey and evaluates the OR-of-ANDs as a post-join filter."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    j = li.join(part, F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11)
         & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20)
           & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30)
           & F.col("p_size").between(1, 15))
    )
    return j.where(cond).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC))
        .cast("double")
        .alias("revenue")
    )


_Q8_ORACLE = """
WITH flow AS (
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6)) AS volume,
           n2.n_name AS supp_nation
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
SELECT o_year,
       round(CAST(sum(CASE WHEN supp_nation = 'NATION_2' THEN volume
                           ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
           / CAST(sum(volume) AS DOUBLE), 6) AS mkt_share
FROM flow GROUP BY o_year
"""


@register("tpch_q8", _Q8_ORACLE)
def tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share (adapted names): 8-table star,
    nation dim joined twice; share ratio from exact decimal sums."""
    part = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = nat.select(F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_rk"))
    n2 = nat.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation"))
    flow = (
        part.join(li, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(reg, F.col("n1_rk") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC).alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(_DEC)
    return flow.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_2", F.col("volume")).otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share")
    )


_Q13_ORACLE = """
WITH co AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
)
SELECT c_count, count(*) AS custdist
FROM co GROUP BY c_count
"""


@register("tpch_q13", _Q13_ORACLE)
def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution: LEFT join (keeps
    zero-order customers) + two-level aggregation."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    co = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return co.groupBy("c_count").agg(F.count("*").cast("long").alias("custdist"))


_Q15_ORACLE = """
WITH rev AS (
    SELECT l_suppkey AS supplier_no,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-04-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


@register("tpch_q15", _Q15_ORACLE)
def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier (adapted dates): the revenue 'view' as a
    CTE; max-revenue supplier(s) via a scalar-subquery-style broadcast
    join on the exact decimal max."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-01 00:00:00").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC)).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("m"))
    supp = _t(spark, sf_dir, "supplier")
    return (
        supp.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .join(F.broadcast(mx), F.col("total_revenue") == F.col("m"))
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


_Q17_ORACLE = """
WITH pa AS (
    SELECT l_partkey AS pk, 0.5 * avg(l_quantity) AS half_avg_qty
    FROM lineitem GROUP BY l_partkey
)
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / 7.0, 6)
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa   ON pk = l_partkey
WHERE p_brand = 'Brand#1' AND l_quantity < half_avg_qty
"""


@register("tpch_q17", _Q17_ORACLE)
def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue (adapted: no container
    column): the correlated AVG subquery decorrelates into a per-part
    aggregate joined back — one extra partial-agg pass over the fact
    table instead of a per-row subquery.

    Cross-engine note: avg(l_quantity) is a double whose low bits are
    partial-agg-order dependent, but the filter compares it against
    quantities on a coarse integer-ish grid — a row flips between
    engines only if a quantity sits within ~1e-13 of 0.5·avg, which the
    fixture's value grid cannot produce; the revenue SUM itself uses
    exact DECIMAL."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#1")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.5 * F.avg("l_quantity")).alias("half_avg_qty")
    )
    j = (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("pk") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
    )
    return j.agg(
        F.round(
            F.sum(F.col("l_extendedprice").cast(_DEC)).cast("double") / 7.0, 6
        ).alias("avg_yearly")
    )


_Q22_ORACLE = """
WITH pos AS (
    SELECT avg(c_acctbal) AS avg_bal FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey AS cntry, count(*) AS numcust,
       CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS totacctbal
FROM customer, pos
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
GROUP BY c_nationkey
"""


@register("tpch_q22", _Q22_ORACLE)
def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global-sales-opportunity shape (adapted: nationkey for
    the missing phone prefix): scalar aggregate subquery (broadcast
    1-row cross join) + NOT EXISTS as a broadcast left-anti join —
    wealthy customers with no HIGH-VALUE order (the fixture's order
    coverage is dense, so plain no-orders is empty — the > 400k
    predicate keeps the anti-join exercising real rows), by nation.

    Cross-engine note: avg(c_acctbal) is an order-dependent double, but
    it filters a 2-decimal-grid column — same coarse-grid argument as
    tpch_q17; the reported sum is exact DECIMAL."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders.where(F.col("o_totalprice") > 400000.0),
            cust.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(_DEC)).cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Round 3: the remaining 8 canonical TPC-H shapes, adapted to the fixture
# (no partsupp table, no commit/receipt dates, no comment columns).  The
# part-supplier relation is derived from lineitem where partsupp is needed:
# ps = distinct (l_partkey, l_suppkey) [+ min unit price as the cost proxy].
# Every output aggregate keeps the module's determinism contract: DECIMAL
# sums, integer-exact counts, per-row double arithmetic only.

_Q2_ORACLE = """
WITH ps AS (
    SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS cost
    FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
    SELECT s_suppkey, s_name, s_acctbal, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
                  JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
),
best AS (
    SELECT l_partkey AS bp, min(cost) AS min_cost
    FROM ps JOIN eu ON ps.l_suppkey = eu.s_suppkey
    GROUP BY l_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name, cost AS min_cost
FROM part
JOIN ps   ON p_partkey = ps.l_partkey
JOIN eu   ON ps.l_suppkey = eu.s_suppkey
JOIN best ON bp = p_partkey AND cost = best.min_cost
WHERE p_size = 15 AND p_type = 'SMALL'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


@register("tpch_q2", _Q2_ORACLE)
def tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (adapted: the part-supplier cost
    relation is derived from lineitem — min unit price per (part,
    supplier) — since the fixture has no partsupp).  The correlated MIN
    subquery decorrelates into a per-part aggregate joined back on cost
    equality; region dims broadcast.

    Cross-engine note: cost is a per-row double division (deterministic
    IEEE in both engines) reduced by MIN (order-independent), so the
    equality join and the output column are bit-stable."""
    li = _t(spark, sf_dir, "lineitem")
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost")
    )
    eu = (
        _t(spark, sf_dir, "supplier")
        .join(
            _t(spark, sf_dir, "nation"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps_eu = ps.join(F.broadcast(eu), ps.l_suppkey == eu.s_suppkey)
    best = ps_eu.groupBy(F.col("l_partkey").alias("bp")).agg(
        F.min("cost").alias("min_cost")
    )
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    return (
        part.join(ps_eu, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            best,
            (F.col("bp") == F.col("p_partkey")) & (F.col("cost") == F.col("min_cost")),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name",
                F.col("cost").alias("min_cost"))
    )


_Q4_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1995-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


@register("tpch_q4", _Q4_ORACLE)
def tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking (adapted: EXISTS tests a returned
    lineitem — the fixture has no commit/receipt dates to express
    lateness).  The correlated EXISTS is a left-semi join; the lineitem
    side is pre-filtered before the semi so the shuffle carries only
    matching keys."""
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1995-10-01 00:00:00").cast("timestamp"))
    )
    late = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        orders.join(late, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
    )


_Q9_ORACLE = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                - 0.1 * p_retailprice * l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, o_year
"""


@register("tpch_q9", _Q9_ORACLE)
def tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit (adapted: supply cost proxied as 10%
    of p_retailprice per unit — no partsupp).  Star join over the fact
    table with part/supplier/nation broadcast; profit is per-row double
    arithmetic cast to exact DECIMAL before the order-independent SUM."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(_DEC)
    return (
        li.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(_t(spark, sf_dir, "supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(_t(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(_t(spark, sf_dir, "nation"), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


_Q11_ORACLE = """
WITH v AS (
    SELECT l_partkey, sum(CAST(l_extendedprice * l_quantity AS DECIMAL(38,6))) AS value
    FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
                  JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
    GROUP BY l_partkey
)
SELECT l_partkey, CAST(value AS DOUBLE) AS value
FROM v, (SELECT sum(value) AS total, count(*) AS np FROM v)
WHERE CAST(value AS DOUBLE) * np > 2.0 * CAST(total AS DOUBLE)
"""


@register("tpch_q11", _Q11_ORACLE)
def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock (adapted: per-part traded value —
    extendedprice × quantity — of one nation's suppliers stands in for
    partsupp stock value).  Group-by + HAVING-fraction-of-total: the
    global total is a 1-row broadcast cross join, the same decorrelation
    as the spec's scalar subquery.

    The threshold is MEAN-relative (value > 2× the per-part mean, i.e.
    value·n_parts > 2·total) rather than the spec's fixed
    fraction-of-total: a fixed fraction silently empties as the part
    catalogue grows (the spec itself scales its fraction by 1/SF), while
    the mean-relative form selects a proportional heavy tail at every
    scale.

    Cross-engine note: both compared values are DOUBLE casts of exact
    DECIMAL sums (identical in both engines), so the threshold
    comparison is deterministic."""
    li = _t(spark, sf_dir, "lineitem")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1"),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    v = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast(_DEC)).alias(
                "value"
            )
        )
    )
    total = v.agg(F.sum("value").alias("total"), F.count("*").alias("np"))
    return (
        v.crossJoin(F.broadcast(total))
        .where(
            F.col("value").cast("double") * F.col("np")
            > 2.0 * F.col("total").cast("double")
        )
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


_Q12_ORACLE = """
SELECT l_returnflag AS return_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_returnflag IN ('R', 'A')
  AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
GROUP BY l_returnflag
"""


@register("tpch_q12", _Q12_ORACLE)
def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-mode priority (adapted: l_returnflag classes
    stand in for ship modes — the fixture has none).  Fact-side filter
    pushes to the scan; the conditional counts are one partial-agg
    groupBy after the key join."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("R", "A")
        & (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    orders = _t(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(F.col("l_returnflag").alias("return_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
    )


_Q16_ORACLE = """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
"""


@register("tpch_q16", _Q16_ORACLE)
def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (adapted: the part-supplier
    relation is lineitem's distinct pairs; the complaint-supplier
    exclusion keys on negative account balance — no comment column).
    NOT IN is a broadcast anti-join; supplier_cnt is an exact distinct
    count (two-level agg)."""
    ps = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    part = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#3")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0.0).select(
        "s_suppkey"
    )
    return (
        ps.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


_Q20_ORACLE = """
WITH sq AS (
    SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS BIGINT)) AS qty
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_name LIKE 'small%'
      AND l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_partkey, l_suppkey
),
pt AS (
    SELECT l_partkey AS pk, sum(qty) AS total_qty,
           count(*) AS n_supp
    FROM sq GROUP BY l_partkey
)
SELECT s_suppkey, s_name, s_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_2'
  AND EXISTS (SELECT 1 FROM sq JOIN pt ON pk = sq.l_partkey
              WHERE sq.l_suppkey = s_suppkey
                AND 2 * qty * n_supp > total_qty)
"""


@register("tpch_q20", _Q20_ORACLE)
def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 excess-stock suppliers (adapted: a supplier 'holds
    excess stock' of a part if it shipped more than half the
    per-supplier average quantity — availqty has no fixture analogue).
    The nested IN-subquery chain is two aggregations + a semi-join;
    every quantity is summed as exact BIGINT so the threshold
    comparison is integer-exact in both engines."""
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("small%"))
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp"))
    )
    sq = (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty"))
    )
    pt = sq.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum("qty").alias("total_qty"), F.count("*").alias("n_supp")
    )
    excess = (
        sq.join(pt, F.col("pk") == F.col("l_partkey"))
        .where(2 * F.col("qty") * F.col("n_supp") > F.col("total_qty"))
        .select("l_suppkey")
    )
    supp = _t(spark, sf_dir, "supplier").join(
        _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2"),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    return (
        supp.join(excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
    )


_Q21_ORACLE = """
SELECT s_name, count(*) AS numwait
FROM supplier
JOIN nation   ON s_nationkey = n_nationkey
JOIN lineitem l1 ON l1.l_suppkey = s_suppkey
JOIN orders   ON o_orderkey = l1.l_orderkey
WHERE n_name = 'NATION_3' AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@register("tpch_q21", _Q21_ORACLE)
def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting (adapted: 'the only
    supplier whose lineitem was returned' on finished orders — the
    fixture has no receipt/commit dates).  The double-correlated
    EXISTS / NOT EXISTS pair becomes a semi- then anti-join on
    (orderkey, other-supplier) — both with a non-equi conjunct the
    planner evaluates inside the join."""
    supp = _t(spark, sf_dir, "supplier").join(
        _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3"),
        F.col("s_nationkey") == F.col("n_nationkey"),
    )
    li = _t(spark, sf_dir, "lineitem")
    orders_f = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    l1 = (
        li.where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk"))
        .join(orders_f.select("o_orderkey"), F.col("ok") == F.col("o_orderkey"))
        .select("ok", "sk")
    )
    l2 = li.select(F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2"))
    l3 = li.where(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    waiting = (
        l1.join(
            l2,
            (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
            "left_anti",
        )
    )
    return (
        supp.join(waiting, F.col("s_suppkey") == F.col("sk"))
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
