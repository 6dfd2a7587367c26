"""Canonical TPC-H query shapes (Q3, Q6, Q10, Q14, Q18), adapted to the
fixture's TPC-H-ish schema (FIXTURES.md; e.g. no o_shippriority column —
o_orderpriority stands in; p_type carries bare category words).

Together with the flagship Q1 (``agg_group_basic``) these pin the classic
analytic plan shapes end-to-end: selective-dim join + top-k (Q3), pure
scan-agg with tight pushdown (Q6), multi-way join + group + top-k (Q10),
conditional-aggregation ratio (Q14), and HAVING-subquery semi join
(Q18). All follow the exact-decimal determinism discipline from core.py,
and all are DuckDB-oracle checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import d2d, dec, sql_d2d
from ..io import load_table
from ..registry import query

_ONE = "CAST(1 AS DECIMAL(18,4))"
_REV = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,4)))"


def _rev_col() -> F.Column:
    return dec("l_extendedprice", 2) * (
        F.lit(1).cast("decimal(18,4)") - dec("l_discount", 4)
    )


@query(
    "tpch_q3",
    oracle=f"""
    SELECT l_orderkey,
           {sql_d2d(f"SUM({_REV})")} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1996-03-15'
      AND l_shipdate > TIMESTAMP '1996-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def tpch_q3(spark, sf_dir):
    """Q3 shipping-priority: unshipped orders of one segment, top 10 by
    revenue. Plan: both dim filters push to their scans; customer
    broadcasts into orders, the orders side broadcasts into lineitem at
    fixture scale (and shuffles on the orderkey at 100 TB — the group key
    equals the join key, so the agg reuses that exchange);
    TakeOrderedAndProject caps the result without a global sort."""
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1996-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(d2d(F.sum(_rev_col())).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "tpch_q6",
    oracle=f"""
    SELECT {sql_d2d("SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4)))")}
             AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def tpch_q6(spark, sf_dir):
    """Q6 forecasting-revenue: the purest scan-aggregate — every predicate
    reaches the parquet scan as a pushed filter, the agg is a single
    partial+final sum with no grouping shuffle beyond the final gather.
    The plan to beat at 100 TB is 'read only matching row groups, one
    pass'; anything with a join or window here is wrong."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        d2d(F.sum(dec("l_extendedprice", 2) * dec("l_discount", 4))).alias("revenue"),
        F.count("*").alias("n_lines"),
    )


@query(
    "tpch_q10",
    oracle=f"""
    SELECT c_custkey, c_name,
           {sql_d2d(f"SUM({_REV})")} AS revenue,
           round(c_acctbal, 2) AS c_acctbal, n_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10(spark, sf_dir):
    """Q10 returned-items: who returned the most revenue last quarter.
    nation (25 rows) and the filtered customer side broadcast; the only
    big shuffle at 100 TB is lineitem⋈orders on the orderkey; the final
    per-customer agg is top-20 via TakeOrderedAndProject."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(d2d(F.sum(_rev_col())).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q14",
    oracle=f"""
    SELECT round(100.0 * {sql_d2d(f"SUM(CASE WHEN p_type LIKE 'PROMO%' THEN {_REV} ELSE CAST(0 AS DECIMAL(18,2)) END)")}
                 / {sql_d2d(f"SUM({_REV})")}, 6) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1996-02-01'
    """,
)
def tpch_q14(spark, sf_dir):
    """Q14 promotion-effect: conditional-aggregation ratio. part is a dim
    → broadcast; numerator and denominator are exact decimal sums in ONE
    aggregation pass (no second scan, no self-join), divided in double."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    rev = _rev_col()
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0) * d2d(F.sum(promo)) / d2d(F.sum(rev)), 6
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q18",
    oracle="""
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey HAVING SUM(l_quantity) > 200
    )
    SELECT c_name, c_custkey, o_orderkey, o_orderdate,
           round(o_totalprice, 2) AS o_totalprice,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (SELECT l_orderkey FROM big)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    LIMIT 100
    """,
)
def tpch_q18(spark, sf_dir):
    """Q18 large-volume customers: orders whose line quantities sum past a
    threshold, with their customers. The qualifying set comes from a
    groupBy-HAVING on lineitem joined back as a LEFT SEMI join — at
    100 TB both the qualifier agg and the semi join key on l_orderkey,
    so one exchange serves both; the final top-100 is
    TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity", 2)).alias("s"))
        .filter(F.col("s") > 200)
        .select("l_orderkey")
    )
    o = load_table(spark, sf_dir, "orders").join(
        big.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey", "left_semi"
    )
    c = load_table(spark, sf_dir, "customer")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(d2d(F.sum(dec("l_quantity", 2))).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderdate", "o_orderkey")
        .limit(100)
    )
