"""Physical-plan assertions (SURVEY.md §4.2): the 100 TB guarantees.

Correct results are not enough — these tests pin the plan shapes that make
the operators viable at scale: parquet filter pushdown, column pruning,
broadcast joins for dims, TakeOrderedAndProject for top-k (no global sort).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_suite_spark.io import load_table
from etl_suite_spark.registry import QUERIES
from tests.conftest import SF_DIR


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def test_filter_pushdown_reaches_scan(spark):
    df = load_table(spark, SF_DIR, "lineitem").filter(F.col("l_quantity") > 30).select(
        "l_orderkey"
    )
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]" in plan


def test_column_pruning_reaches_scan(spark):
    df = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    plan = plan_of(df)
    # ReadSchema must carry only the two projected columns
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read and "l_quantity" in read
    assert "l_extendedprice" not in read


def test_broadcast_join_planned(spark):
    plan = plan_of(QUERIES["join_broadcast"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_topk_no_global_sort(spark):
    plan = plan_of(QUERIES["topk_global"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan


def test_multiway_join_broadcasts_dims(spark):
    # customer/nation/region are under the broadcast threshold → at most the
    # lineitem⋈orders join may shuffle.
    plan = plan_of(QUERIES["join_multiway"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3


def test_asof_join_is_single_sort_not_range_join(spark):
    # union+window formulation: no BroadcastNestedLoopJoin / cartesian.
    plan = plan_of(QUERIES["join_asof"](spark, SF_DIR))
    assert "NestedLoop" not in plan
    assert "CartesianProduct" not in plan
