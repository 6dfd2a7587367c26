"""Aggregation operators (SURVEY.md §2.4).

Reference analog: the per-period/per-entity aggregations at the heart of the
ETL-suite's warehouse tables (daily miner/account activity rollups — SURVEY
§0.1 [K]). Re-expressed as declarative groupBy/agg so Catalyst plans
two-phase (partial + final) hash aggregation automatically — the map-side
combine is what makes these shuffles cheap at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import davg, dec, dsum, sql_davg, sql_dsum
from ..io import load_table
from ..registry import query

# --- flagship: TPC-H Q1-shaped pricing summary ---------------------------
# Exact-decimal arithmetic end-to-end (core.py rationale): scales chosen so
# intermediate precision stays ≤38 on BOTH engines (Spark mul: p1+p2+1;
# DuckDB mul: p1+p2).


def _one():
    # Column objects need an active session → build lazily, not at import.
    return F.lit(1).cast("decimal(5,4)")


@query(
    "agg_group_basic",
    oracle="""
    SELECT
      l_returnflag, l_linestatus,
      CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE)
        AS sum_disc_price,
      CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))
               * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(6,4)))) AS DOUBLE)
        AS sum_charge,
      CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS DOUBLE)
        AS avg_qty,
      CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS DOUBLE)
        AS avg_price,
      CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS DOUBLE)
        AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_group_basic(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    ep = dec("l_extendedprice", 2, 12)
    disc = dec("l_discount", 4, 6)
    tax = dec("l_tax", 4, 6)
    _ONE = _one()
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(ep * (_ONE - disc)).cast("double").alias("sum_disc_price"),
            F.sum(ep * (_ONE - disc) * (_ONE + tax)).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
