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


def test_triangle_count_matches_bruteforce(spark):
    """Recount triangles in Python from the same capped edge set — the
    degree-ordered join must agree with the naive closed-triple count."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from etl_suite_spark.io import load_table
    from etl_suite_spark.registry import QUERIES

    ps = (
        load_table(spark, SF_DIR, "lineitem")
        .select(F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s"))
        .distinct()
    )
    deg_p = ps.groupBy("p").agg(F.count("*").alias("n"))
    ok = ps.join(deg_p.filter(F.col("n") <= 50), "p").collect()
    by_part = {}
    for r in ok:
        by_part.setdefault(r.p, []).append(r.s)
    edges = set()
    for supps in by_part.values():
        for x, y in combinations(sorted(supps), 2):
            edges.add((x, y))
    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    expected = sum(
        1
        for u, v in edges
        for w in adj[u] & adj[v]
        if w > v  # count each triangle once (u < v < w)
    )
    (row,) = QUERIES["graph_triangle_count"](spark, SF_DIR).collect()
    assert row.n_edges == len(edges)
    assert row.n_triangles == expected
    assert row.n_nodes == len(adj)
