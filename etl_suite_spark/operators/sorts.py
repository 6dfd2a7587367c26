"""Sort / limit / top-k operators (SURVEY.md §2.6).

Scale notes: global ORDER BY is a range-partitioned sort (sampling pass +
shuffle) — fine as a final presentation step, never mid-pipeline.
``orderBy().limit(k)`` is planned by Spark as TakeOrderedAndProject: each
partition keeps only its top-k, so no full sort materializes at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query


@query(
    "sort_multikey",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, c_acctbal,
           NULLIF(c_acctbal, 0.0) AS bal_nullable
    FROM customer
    ORDER BY c_mktsegment ASC, bal_nullable DESC NULLS LAST, c_custkey ASC
    """,
)
def sort_multikey(spark, sf_dir):
    # hash compare is order-insensitive, but the sort keys ride along in the
    # output so the ordering semantics are still exercised + visible.
    c = load_table(spark, sf_dir, "customer")
    return (
        c.withColumn("bal_nullable", F.nullif(F.col("c_acctbal"), F.lit(0.0)))
        .orderBy(
            F.col("c_mktsegment").asc(),
            F.col("bal_nullable").desc_nulls_last(),
            F.col("c_custkey").asc(),
        )
        .select("c_custkey", "c_name", "c_mktsegment", "c_acctbal", "bal_nullable")
    )


@query(
    "limit_n",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_orderdate ASC, o_orderkey ASC
    LIMIT 100
    """,
)
def limit_n(spark, sf_dir):
    # only the totally-ordered variant is declared (unordered LIMIT is not
    # hashable); o_orderkey breaks o_orderdate ties → deterministic rows.
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .limit(100)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def topk_global(spark, sf_dir):
    # planned as TakeOrderedAndProject: per-partition heap + driver merge,
    # no global sort (verified via explain in tests).
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@query(
    "limit_offset_page",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 50 OFFSET 100
    """,
)
def limit_offset_page(spark, sf_dir):
    """Keyset-stable pagination: page 3 of a total order (deterministic
    tiebreak mandatory). Spark plans offset+limit as a single
    GlobalLimit/CollectLimit — fine for UI-page offsets; deep offsets at
    100 TB should switch to keyset predicates (WHERE (price, key) < last)
    which this same sort order supports."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .offset(100)
        .limit(50)
    )
