"""PageRank fixed-point semantics (operators/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_suite_spark.operators.graph import _SCALE
from etl_suite_spark.registry import QUERIES
from tests.conftest import SF_DIR


def test_pagerank_deterministic_and_mass_conserving(spark):
    a = QUERIES["graph_pagerank"](spark, SF_DIR).collect()
    b = QUERIES["graph_pagerank"](spark, SF_DIR).collect()
    assert a == b
    assert len(a) == 20
    assert all(r.rank > 0 for r in a)
    # descending, and both node kinds present in the trade graph's top-20
    assert all(a[i].rank >= a[i + 1].rank for i in range(19))
    kinds = {r.kind for r in a}
    assert "supplier" in kinds  # suppliers aggregate many customers' mass
    # top-20 can't exceed total mass (floor division only ever loses mass)
    assert sum(r.rank for r in a) <= _SCALE
