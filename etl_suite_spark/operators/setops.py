"""Set operations (SURVEY.md §2.7).

``unionByName`` everywhere — positional union silently mismatches columns
(SURVEY §2.7 note). Distinct variants shuffle on the full row; bag variants
(`UNION ALL`) are free (no shuffle), which is why pipelines prefer them and
dedup explicitly at the end.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query


def _slices(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_totalprice") > 300000).select("o_custkey", "o_orderpriority")
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey", "o_orderpriority")
    return a, b


_A = "SELECT o_custkey, o_orderpriority FROM orders WHERE o_totalprice > 300000"
_B = "SELECT o_custkey, o_orderpriority FROM orders WHERE o_orderstatus = 'F'"


@query("set_union_all", oracle=f"{_A} UNION ALL {_B}")
def set_union_all(spark, sf_dir):
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b)


@query("set_union_distinct", oracle=f"{_A} UNION {_B}")
def set_union_distinct(spark, sf_dir):
    a, b = _slices(spark, sf_dir)
    return a.unionByName(b).distinct()


@query("set_intersect", oracle=f"{_A} INTERSECT {_B}")
def set_intersect(spark, sf_dir):
    a, b = _slices(spark, sf_dir)
    return a.intersect(b)


@query("set_except", oracle=f"{_A} EXCEPT {_B}")
def set_except(spark, sf_dir):
    a, b = _slices(spark, sf_dir)
    return a.subtract(b)  # EXCEPT DISTINCT semantics


@query("set_intersect_all", oracle=f"{_A} INTERSECT ALL {_B}")
def set_intersect_all(spark, sf_dir):
    a, b = _slices(spark, sf_dir)
    return a.intersectAll(b)


@query("set_except_all", oracle=f"{_A} EXCEPT ALL {_B}")
def set_except_all(spark, sf_dir):
    a, b = _slices(spark, sf_dir)
    return a.exceptAll(b)
