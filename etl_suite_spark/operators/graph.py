"""Iterative graph algorithms as unrolled DataFrame plans (SURVEY.md §2 —
iterative-algorithm family; companion to the connected-components clustering
in llm/dedup.py).

PageRank here demonstrates the Spark-native pattern for fixed-iteration
graph algorithms: the loop unrolls into a DAG of joins+aggregations (one
shuffle per iteration, keyed on the node id), never a driver-side loop over
collected data. Ranks use FIXED-POINT INTEGER arithmetic (scale 1e12,
floor division) — float PageRank sums contributions in engine-dependent
order and can never be hash-compared across engines; integer fixed-point
is bit-exact everywhere, which is also what you want for resumable
checkpointed runs at 100 TB.

Literature (public): Page, Brin, Motwani & Winograd 1999 (PageRank);
Malewicz et al. 2010 (Pregel) for the per-iteration message/aggregate
shape this mirrors.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

_SCALE = 1_000_000_000_000
_ITERS = 3


def _oracle_pagerank() -> str:
    """Unrolled-CTE DuckDB twin of the Spark loop (same 3 iterations,
    same floor-division fixed-point updates)."""
    head = f"""
    WITH e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
      SELECT src, dst FROM e0
      UNION ALL
      SELECT dst AS src, src AS dst FROM e0
    ),
    deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    r0 AS (SELECT node, {_SCALE} // n AS rank FROM nodes CROSS JOIN nn)"""
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(f"""
    c{i} AS (
      SELECT e.dst AS node, CAST(SUM(r.rank // d.outdeg) AS BIGINT) AS contrib
      FROM edges e
      JOIN r{i - 1} r ON e.src = r.node
      JOIN deg d ON e.src = d.src
      GROUP BY e.dst
    ),
    r{i} AS (
      SELECT nodes.node,
             CAST((15 * {_SCALE}) // (100 * n)
                  + (85 * COALESCE(contrib, 0)) // 100 AS BIGINT) AS rank
      FROM nodes CROSS JOIN nn LEFT JOIN c{i} ON nodes.node = c{i}.node
    )""")
    tail = f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           node // 2 AS entity_key, rank
    FROM r{_ITERS}
    ORDER BY rank DESC, kind, entity_key
    LIMIT 20
    """
    return head + "," + ",".join(steps) + tail


def _trade_edges(spark, sf_dir, edges_path=None):
    """Symmetrized customer↔supplier trade edge list, materialized ONCE as
    a src-partitioned parquet artifact shared by every iterative graph op
    (pagerank, label propagation) — the bucket-write-then-reuse pattern
    prescribed for 100 TB, and the measured winner at bench scale (see
    graph_pagerank's docstring for the persist()/localCheckpoint numbers).

    Cache scope (r14 optimization round): the edge artifact now goes
    through core.materialize_once — per-PROCESS write-once (the "v1"
    token versions the derivation), so every fresh invocation rebuilds
    from parquet and only within-run consumers share the materialized,
    src-partitioned layout. The old sf_dir-keyed /tmp dir persisted
    across runs, which this round's rules class as result caching."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges_lazy = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if edges_path is None:
        from ..core import materialize_once

        return materialize_once(
            spark,
            edges_lazy,
            token="pr_edges:v1:" + sf_dir,
            partition_col="src",
            n_partitions=32,
        )
    edges_lazy.repartition(32, "src").write.mode("overwrite").parquet(edges_path)
    return spark.read.parquet(edges_path)


@query("graph_pagerank", oracle=_oracle_pagerank())
def graph_pagerank(
    spark,
    sf_dir,
    broadcast_threshold_rows=1_000_000,
    edges_path=None,
):
    """PageRank (damping 0.85, 3 iterations) over the customer↔supplier
    trade graph (who-bought-from-whom via orders⋈lineitem, symmetrized).
    Node ids namespace the bipartite sides (2k / 2k+1). Per iteration:
    one join of ranks onto edges (both pre-partitionable on the node key —
    at 100 TB you'd bucket edges by src so every iteration reuses the
    layout) and one dst-keyed aggregation; the 15%/N teleport and the
    85% damping are floor-division fixed-point updates, so results are
    bit-identical across engines, partitionings, and retries.

    ``share``/``contrib`` are NODE-cardinality tables, so the broadcast
    hint that wins at bench scale would OOM the driver on a billion-node
    graph — it is therefore gated on the measured node count:
    n < ``broadcast_threshold_rows`` → hint; otherwise no hint, and AQE
    picks the join strategy from runtime sizes (shuffle-hash on the node
    key once the rank side outgrows the broadcast budget).  Pass
    ``broadcast_threshold_rows=None`` to never hint.  ``edges_path``
    overrides where the symmetrized edge list is materialized (a warehouse
    path at scale); default is a deterministic per-sf_dir temp dir that is
    reused across invocations instead of leaking a fresh mkdtemp each run.
    """
    # Edge materialization choices measured at bench scale (sf0.1,
    # local[32]): ~4.5 s incl. the write vs ~6.8 s recomputing the
    # distinct edge build per iteration and ~8-16 s with .persist()
    # (cache materialization blocks, and its InMemoryRelation boundary
    # stops AQE re-optimization). Also measured and REJECTED (round 3):
    # per-iteration rank.localCheckpoint(eager) to truncate lineage —
    # 11.3 s vs 8.3 s first-run in fresh sessions (each eager
    # materialization pays its own codegen; the unrolled DAG compiles
    # once). At 100 TB with many more iterations the tradeoff flips and
    # checkpointing every ~5 iterations is the standard move.
    edges = _trade_edges(spark, sf_dir, edges_path)

    # r14 (optimization round; fixed point bit-identical): the edge list
    # is symmetrized, so every node appears as a src — ``deg`` IS the
    # node table. Checkpointing it (node-cardinality, tiny) and carrying
    # ``outdeg`` as a column of the rank table removes the per-iteration
    # rank⋈deg join AND the per-iteration nodes-distinct exchange: each
    # iteration is now exactly one edges⋈share join + one dst-keyed
    # aggregation + one node-cardinality reattach join (was 3 joins + a
    # distinct). Plan: 10 parquet scans / 10 shuffle exchanges -> 3
    # scans / 3 shuffle exchanges (plans/r14/graph_pagerank_*.txt);
    # guide §2.4.
    deg = (
        edges.groupBy("src")
        .agg(F.count("*").alias("outdeg"))
        .select(F.col("src").alias("node"), "outdeg")
        .localCheckpoint(eager=True)
    )
    n = deg.count()  # one scalar job; every other step stays distributed
    base = (15 * _SCALE) // (100 * n)

    hint = (
        F.broadcast
        if broadcast_threshold_rows is not None and n < broadcast_threshold_rows
        else (lambda df: df)
    )

    rank = deg.select(
        "node", F.lit(_SCALE // n).cast("long").alias("rank"), "outdeg"
    )
    for _ in range(_ITERS):
        # outdeg rides on the rank row, so share is a map-only select;
        # each iteration touches edges exactly once, followed by one
        # dst-keyed aggregation. `hint` broadcasts only under the
        # node-count gate.
        share = rank.select(
            F.col("node").alias("snode"),
            F.expr("rank div outdeg").alias("share"),
        )
        contrib = (
            edges.join(hint(share), edges["src"] == F.col("snode"))
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        rank = deg.join(
            hint(contrib), deg["node"] == contrib["dst"], "left"
        ).select(
            "node",
            F.expr(
                f"CAST({base} + (85 * coalesce(contrib, 0)) div 100 AS BIGINT)"
            ).alias("rank"),
            "outdeg",
        )
    return (
        rank.select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("kind"),
            F.expr("node div 2").alias("entity_key"),
            "rank",
        )
        .orderBy(F.col("rank").desc(), "kind", "entity_key")
        .limit(20)
    )


@query(
    "graph_triangle_count",
    oracle="""
    WITH ps AS (
      SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem
    ), deg_p AS (
      SELECT p, COUNT(*) AS nsupp FROM ps GROUP BY p
    ), ok AS (
      SELECT ps.p, ps.s FROM ps JOIN deg_p USING (p) WHERE nsupp <= 50
    ), e AS (
      SELECT DISTINCT a.s AS u, b.s AS v
      FROM ok a JOIN ok b ON a.p = b.p AND a.s < b.s
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY node
    ), oe AS (
      SELECT CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.u ELSE e.v END AS src,
             CASE WHEN (du.d, e.u) < (dv.d, e.v) THEN e.v ELSE e.u END AS dst
      FROM e JOIN deg du ON du.node = e.u JOIN deg dv ON dv.node = e.v
    ), tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM oe e1
      JOIN oe e2 ON e2.src = e1.src AND e1.dst < e2.dst
      JOIN oe e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ), wed AS (
      SELECT SUM(d * (d - 1) / 2) AS n_wedges FROM deg
    )
    SELECT CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST(n_triangles AS BIGINT) AS n_triangles,
           round(3.0 * n_triangles / n_wedges, 6) AS clustering_coeff
    FROM tri, wed
    """,
)
def graph_triangle_count(spark, sf_dir, closing_shuffle_hash=True):
    """Triangle counting + global clustering coefficient over the
    supplier co-supply graph (edge = two suppliers share a part), via the
    DEGREE-ORDERED edge orientation (the classic MapReduce-era trick:
    Suri & Vassilvitskii 2011; Cohen 2009): direct every edge from its
    lower-(degree, id) endpoint to the higher one, enumerate wedges only
    FROM each source's out-neighbors, and close them with one more
    equi-join. Each triangle is counted exactly once, and — the scale
    property — out-degrees are bounded by O(√m) under this orientation,
    so the wedge join cannot blow up on hub nodes the way a naive
    neighbors-of-neighbors join does. Everything is distinct/groupBy/
    equi-join; no cross join.

    Same hot-key discipline as the dedup family: parts supplied by > 50
    suppliers are excluded from edge generation (a ubiquitous part is a
    clique factory — quadratic pairs, zero signal), mirrored exactly in
    the oracle's HAVING-style cap. Cap headroom is measured, not guessed:
    the fixture's per-part supplier fanout is bounded ~30 by its
    lineitem/part row ratio at EVERY sf (max 10 at sf0.001, 41 at
    sf0.01, 52 at sf0.1 — the round-5 raise from 10 to 50 exists because
    the old cap sat BELOW the sf0.01 minimum fanout and silently emptied
    the graph at exactly the scale the driver checks), and C(50,2)=1225
    pairs bounds the per-part work regardless of corpus size."""
    ps = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    deg_p = ps.groupBy("p").agg(F.count("*").alias("nsupp"))
    ok = ps.join(deg_p.filter(F.col("nsupp") <= 50), "p")
    a, b = ok.alias("a"), ok.alias("b")
    # Materialize the (small, degree-capped) edge list once: three aliases
    # of it join below, and without the barrier each alias re-expands the
    # whole lineitem→pairs lineage into the plan (measured 158 exchanges
    # in the single-plan audit). Same materialize-once pattern as the
    # pagerank edge list — at 100 TB this is a persisted edge table.
    e = (
        a.join(b, (F.col("a.p") == F.col("b.p")) & (F.col("a.s") < F.col("b.s")))
        .select(F.col("a.s").alias("u"), F.col("b.s").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    oe = (
        e.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
    )
    oe = oe.localCheckpoint(eager=True)  # oriented edges: reused 3×
    # r15 (optimization round; VERDICT r14 item 3): the closing join
    # used to run as a SORT-MERGE join, which SORTS the wedge stream —
    # Σ C(outdeg, 2) rows, 166 M at sf0.1 where the co-supply graph is
    # literally complete (C(1000,2) edges, every wedge closes) — before
    # merging it with the 0.5 M-row edge list. A SHUFFLED-HASH hint on
    # the edge side skips that sort: the wedge stream is still
    # partitioned by (dst₁, dst₂) but streams straight into a probe of
    # the per-partition edge hash map (edges/partitions rows — the
    # build side is smaller than the wedge side by ~avg-outdeg, i.e.
    # O(√m) under this orientation, which is exactly guide §3.1's
    # "moderately small per partition" case). Measured same-session
    # interleaved at sf0.1 (3 passes each): SMJ [38.7, 18.0, 25.2] vs
    # SHJ-on-closing [13.0, 14.6, 14.7] — ~1.7× on the wedge stage.
    # Broadcasting BOTH wedge joins was also measured and REJECTED
    # (medians 48.0 vs 40.7 full-query: 330 M random probes into a
    # 0.5 M-entry broadcast map lose to the streaming shapes). Join
    # strategy does not change the joined rows — n_triangles is
    # bit-identical (pinned in tests/test_round15_opt.py).
    e1, e2 = oe.alias("e1"), oe.alias("e2")
    e3 = (oe.hint("shuffle_hash") if closing_shuffle_hash else oe).alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e2.src") == F.col("e1.src")) & (F.col("e1.dst") < F.col("e2.dst")),
        )
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.dst")) & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    wedges = deg.agg((F.sum(F.col("d") * (F.col("d") - 1) / 2)).alias("n_wedges"))
    nn = deg.agg(F.count("*").alias("n_nodes"))
    ne = e.agg(F.count("*").alias("n_edges"))
    return (
        nn.join(ne)
        .join(tri)
        .join(wedges)
        .select(
            "n_nodes",
            "n_edges",
            "n_triangles",
            F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6).alias(
                "clustering_coeff"
            ),
        )
    )


# --- part co-purchase graph ops ---------------------------------------------
#
# Node set: PARTS (the largest key domain the fixtures offer — 2k at
# sf0.01, 20k at sf0.1); edge: two parts bought together in the SAME order
# in >= 2 distinct orders (the market-basket support threshold, which is
# what keeps the graph sparse and the edge semantics meaningful — a single
# co-occurrence in a big basket is noise). The supplier co-supply graph
# used by graph_triangle_count is near-COMPLETE on these fixtures (every
# pair of its ~10-1000 suppliers shares some part), so component /
# degree-distribution queries over it would be degenerate; the co-purchase
# graph has real structure at every sf (measured sf0.01: 1,880 nodes,
# 3,445 support-2 edges, avg degree 3.7).
#
# Hot-key discipline: baskets with > 50 distinct parts are excluded from
# pair generation (same cap + rationale as agg_market_basket — a
# pathological mega-basket is a quadratic clique factory; fixture max
# basket is 13, measured ~4x headroom), mirrored in every oracle below.

_COPURCHASE_EDGE_SQL = """
    li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), bsz AS (
      SELECT o, COUNT(*) AS nitems FROM li GROUP BY o
    ), okli AS (
      SELECT li.o, li.p FROM li JOIN bsz USING (o) WHERE nitems <= 50
    ), e AS (
      SELECT a.p AS u, b.p AS v, COUNT(*) AS support
      FROM okli a JOIN okli b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= 2
    )"""


def _copurchase_edges(spark, sf_dir):
    """Support->=2 part co-purchase edge list: distinct (u, v, support)
    with u < v; see the module comment above for the graph's rationale
    and the mega-basket cap.

    Restructured r14 (optimization round; identical edge set): one
    basket-keyed collect_set aggregation + in-row sorted-array pair
    expansion replaces the old distinct-(o,p) table (recomputed by
    Catalyst for the basket-size filter and BOTH self-join sides) and
    the o-keyed self-join — the basket_pair_metrics shape, see its
    docstring for the shuffle accounting. Cap semantics unchanged:
    baskets with > 50 DISTINCT items are dropped before pair expansion
    (collect_set dedups, so size(items) == the old COUNT over distinct
    (o, p))."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("items"))
        .filter(F.size("items") <= 50)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) ->"
                    " transform(slice(items, i + 2, size(items)),"
                    " y -> struct(x AS u, y AS v))))"
                )
            ).alias("pr")
        )
        .groupBy(F.col("pr.u").alias("u"), F.col("pr.v").alias("v"))
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= 2)
    )


@query(
    "graph_connected_components",
    oracle=f"""
    WITH RECURSIVE {_COPURCHASE_EDGE_SQL}, edges AS (
      SELECT u AS src, v AS dst FROM e
      UNION ALL SELECT v, u FROM e
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
    ), reach(node, lab) AS (
      SELECT node, node FROM nodes
      UNION
      SELECT ed.dst, r.lab FROM reach r JOIN edges ed ON ed.src = r.node
    ), labels AS (
      SELECT node, MIN(lab) AS label FROM reach GROUP BY node
    )
    SELECT CAST(label AS BIGINT) AS component_id,
           CAST(COUNT(*) AS BIGINT) AS n_parts
    FROM labels GROUP BY label ORDER BY n_parts DESC, component_id
    """,
)
def graph_connected_components(spark, sf_dir):
    """Connected components of the part co-purchase graph — product
    neighborhoods: parts that transitively sell together (the graph
    generalization of agg_market_basket's pairwise lift, and the
    graph-native sibling of llm_dedup_clusters' duplicate grouping; both
    share :func:`etl_suite_spark.llm.dedup.connected_components`,
    min-label propagation with pointer jumping — O(log n) rounds of join+min-agg,
    one shuffle each on uniformly hashed node ids, lineage truncated per
    round). Component id = smallest part key in the component:
    deterministic, rerun-stable labels. The DuckDB twin is a recursive
    reachability CTE — fine at oracle scale, deliberately not the
    distributed plan shape."""
    from ..llm.dedup import connected_components

    e = _copurchase_edges(spark, sf_dir).select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    )
    labels = connected_components(e)
    return (
        labels.groupBy("label")
        .agg(F.count("*").cast("long").alias("n_parts"))
        .select(F.col("label").cast("long").alias("component_id"), "n_parts")
        .orderBy(F.col("n_parts").desc(), "component_id")
    )


@query(
    "graph_degree_histogram",
    oracle=f"""
    WITH {_COPURCHASE_EDGE_SQL}, deg AS (
      SELECT node, COUNT(*) AS degree FROM (
        SELECT u AS node FROM e UNION ALL SELECT v FROM e
      ) GROUP BY node
    )
    SELECT CAST(degree AS BIGINT) AS degree,
           CAST(COUNT(*) AS BIGINT) AS n_nodes
    FROM deg GROUP BY degree ORDER BY degree
    """,
)
def graph_degree_histogram(spark, sf_dir):
    """Degree distribution of the part co-purchase graph — the first
    diagnostic anyone runs on a graph (is it heavy-tailed? where must
    hub caps bite?), and the measured input behind every skew decision
    the graph family documents. Two hash aggs over the edge list; the
    output domain is at most the max degree — broadcast-tiny at any
    corpus size."""
    e = _copurchase_edges(spark, sf_dir)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    return (
        deg.groupBy("degree")
        .agg(F.count("*").cast("long").alias("n_nodes"))
        .select(F.col("degree").cast("long").alias("degree"), "n_nodes")
        .orderBy("degree")
    )


@query(
    "graph_jaccard_neighbors",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), bsz AS (
      SELECT o, COUNT(*) AS nitems FROM li GROUP BY o
    ), okli AS (
      SELECT li.o, li.p FROM li JOIN bsz USING (o) WHERE nitems <= 50
    ), sizes AS (
      SELECT p, COUNT(*) AS n FROM li GROUP BY p
    ), shared AS (
      SELECT a.p AS u, b.p AS v, COUNT(*) AS shared
      FROM okli a JOIN okli b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= 2
    )
    SELECT u, v, CAST(shared AS BIGINT) AS shared_orders,
           CAST(su.n AS BIGINT) AS nu, CAST(sv.n AS BIGINT) AS nv,
           round(CAST(shared AS DOUBLE) / (su.n + sv.n - shared), 6)
             AS jaccard
    FROM shared JOIN sizes su ON su.p = u JOIN sizes sv ON sv.p = v
    ORDER BY jaccard DESC, u, v LIMIT 20
    """,
)
def graph_jaccard_neighbors(spark, sf_dir):
    """Node similarity by neighborhood Jaccard over the co-purchase
    graph: two parts are similar when the ORDER sets they appear in
    overlap — "customers who bought X also bought Y" as structural
    equivalence, the graph cousin of the document n-gram Jaccard in
    llm/dedup.py.

    Scale shape: candidate pairs come only from the order-keyed
    equi-join (parts sharing >= 1 order — never part x part), with the
    mega-basket cap bounding per-order fanout and the support >= 2 gate
    pruning noise pairs before the size join. Intersection sizes fall
    out of the join's groupBy; neighborhood sizes join on from the
    per-part aggregate over the UNCAPPED order sets (true denominator —
    the cap only limits candidate generation). Global top-20 via
    TakeOrderedAndProject."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    sizes = li.groupBy("p").agg(F.count("*").alias("n"))
    shared = _copurchase_edges(spark, sf_dir)
    su = sizes.select(F.col("p").alias("u"), F.col("n").alias("nu"))
    sv = sizes.select(F.col("p").alias("v"), F.col("n").alias("nv"))
    return (
        shared.join(su, "u")
        .join(sv, "v")
        .select(
            "u",
            "v",
            F.col("support").cast("long").alias("shared_orders"),
            F.col("nu").cast("long").alias("nu"),
            F.col("nv").cast("long").alias("nv"),
            F.round(
                F.col("support").cast("double")
                / (F.col("nu") + F.col("nv") - F.col("support")),
                6,
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "u", "v")
        .limit(20)
    )


@query(
    "graph_bfs_distance",
    oracle=f"""
    WITH RECURSIVE {_COPURCHASE_EDGE_SQL}, edges AS (
      SELECT u AS src, v AS dst FROM e
      UNION ALL SELECT v, u FROM e
    ), deg AS (
      SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src
    ), seed AS (
      SELECT node FROM deg ORDER BY d DESC, node LIMIT 1
    ), bfs(node, dist) AS (
      SELECT node, 0 FROM seed
      UNION
      SELECT ed.dst, b.dist + 1
      FROM bfs b JOIN edges ed ON ed.src = b.node
      WHERE b.dist < 3
    ), md AS (
      SELECT node, MIN(dist) AS dist FROM bfs GROUP BY node
    )
    SELECT CAST(dist AS INTEGER) AS dist,
           CAST(COUNT(*) AS BIGINT) AS n_nodes,
           CAST(MIN(node) AS BIGINT) AS min_part,
           CAST(MAX(node) AS BIGINT) AS max_part
    FROM md GROUP BY dist ORDER BY dist
    """,
)
def graph_bfs_distance(spark, sf_dir):
    """Bounded-hop BFS: shortest-path distance (≤3 hops) from the
    highest-degree part — the 'blast radius' query behind related-item
    widgets and recall-set expansion ('everything within k hops of X').
    Seed selection is data-derived and deterministic (max degree, ties
    to the smallest part key).

    Spark side unrolls the 3 levels as frontier joins with an anti-join
    against the visited set — level k's frontier is exactly the nodes
    first reached at distance k, so no MIN(dist) pass is needed. The
    symmetric edge list is localCheckpointed once and reused by all
    levels (the triangle-count barrier pattern). Per level: one
    equi-join on node id + one anti-join against the (small) visited
    set; hop count is a hard constant, so the plan is 3 fixed stages —
    no iterate-to-convergence. The DuckDB twin is a recursive
    reachability CTE with MIN(dist) — correct at oracle scale,
    deliberately not the distributed shape (its path enumeration is
    exponential in dense graphs)."""
    und = _copurchase_edges(spark, sf_dir)
    edges = (
        und.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionAll(und.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        .localCheckpoint(eager=True)
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    seed = (
        deg.orderBy(F.col("d").desc(), F.col("src").asc())
        .limit(1)
        .select(F.col("src").alias("node"), F.lit(0).alias("dist"))
    )
    reached = seed.localCheckpoint(eager=True)
    frontier = reached.select("node")
    for k in (1, 2, 3):
        nxt = (
            frontier.join(edges, F.col("node") == F.col("src"))
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(reached.select("node"), "node", "left_anti")
            .withColumn("dist", F.lit(k))
        )
        reached = reached.unionAll(nxt).localCheckpoint(eager=True)
        frontier = nxt.select("node")
    return (
        reached.groupBy("dist")
        .agg(
            F.count("*").cast("long").alias("n_nodes"),
            F.min("node").cast("long").alias("min_part"),
            F.max("node").cast("long").alias("max_part"),
        )
        .select(F.col("dist").cast("int").alias("dist"), "n_nodes", "min_part", "max_part")
        .orderBy("dist")
    )


@query(
    "graph_assortativity",
    oracle=f"""
    WITH {_COPURCHASE_EDGE_SQL}, edges AS (
      SELECT u AS src, v AS dst FROM e
      UNION ALL SELECT v, u FROM e
    ), deg AS (
      SELECT src AS node, COUNT(*) AS d FROM edges GROUP BY src
    ), ends AS (
      SELECT du.d AS x, dv.d AS y
      FROM edges
      JOIN deg du ON du.node = edges.src
      JOIN deg dv ON dv.node = edges.dst
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
             CAST(SUM(x * y) AS DOUBLE) AS sxy,
             CAST(SUM(x * x) AS DOUBLE) AS sxx,
             CAST(SUM(y * y) AS DOUBLE) AS syy
      FROM ends
    )
    SELECT CAST(m / 2 AS BIGINT) AS n_edges,
           round((m * sxy - sx * sy)
                 / sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)), 6)
             AS assortativity
    FROM s
    """,
)
def graph_assortativity(spark, sf_dir):
    """Degree assortativity (Newman 2002): the Pearson correlation of
    endpoint degrees across edges of the part co-purchase graph.
    Positive ⇒ hubs sell with hubs (catalog core); negative ⇒
    hub-and-spoke (anchors pulling long-tail parts) — it determines
    whether hub caps and skew salting even matter for this graph, so it
    belongs next to graph_degree_histogram in the pre-flight kit.
    Computed over the SYMMETRIZED edge list (each undirected edge
    contributes both orientations — the standard estimator, which also
    makes Σx = Σy by construction).

    Exactness: degrees are integers, so all five power sums are exact
    (< 2^53) before one scalar Pearson. Plan: degree agg + two
    equi-joins of the degree table onto the edge list + one single-row
    aggregate — no windows, no pairs beyond the edges themselves."""
    und = _copurchase_edges(spark, sf_dir)
    edges = und.select(F.col("u").alias("src"), F.col("v").alias("dst")).unionAll(
        und.select(F.col("v").alias("src"), F.col("u").alias("dst"))
    ).localCheckpoint(eager=True)
    deg = edges.groupBy("src").agg(F.count("*").alias("d"))
    du = deg.select(F.col("src").alias("u_node"), F.col("d").alias("x"))
    dv = deg.select(F.col("src").alias("v_node"), F.col("d").alias("y"))
    ends = edges.join(du, F.col("src") == F.col("u_node")).join(
        dv, F.col("dst") == F.col("v_node")
    )
    s = ends.agg(
        F.count("*").cast("long").alias("m"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
    )
    m, sx, sy = F.col("m"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        (m / 2).cast("long").alias("n_edges"),
        F.round(
            (m * sxy - sx * sy)
            / F.sqrt((m * sxx - sx * sx) * (m * syy - sy * sy)),
            6,
        ).alias("assortativity"),
    )


@query(
    "graph_clustering_local",
    oracle=f"""
    WITH {_COPURCHASE_EDGE_SQL}, ue AS (
      SELECT u, v FROM e
    ), deg AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
        SELECT u AS node FROM ue UNION ALL SELECT v FROM ue
      ) GROUP BY node
    ), oe AS (
      SELECT CASE WHEN (du.d, ue.u) < (dv.d, ue.v) THEN ue.u ELSE ue.v END AS src,
             CASE WHEN (du.d, ue.u) < (dv.d, ue.v) THEN ue.v ELSE ue.u END AS dst
      FROM ue JOIN deg du ON du.node = ue.u JOIN deg dv ON dv.node = ue.v
    ), tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM oe e1
      JOIN oe e2 ON e2.src = e1.src AND e1.dst < e2.dst
      JOIN oe e3 ON e3.src = e1.dst AND e3.dst = e2.dst
    ), tcnt AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS t FROM (
        SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
      ) GROUP BY node
    )
    SELECT CAST(deg.node AS BIGINT) AS node, deg.d AS degree,
           CAST(COALESCE(tcnt.t, 0) AS BIGINT) AS n_triangles,
           CASE WHEN deg.d >= 2
                THEN round(2.0 * COALESCE(tcnt.t, 0)
                           / (deg.d * (deg.d - 1)), 6) END AS local_cc
    FROM deg LEFT JOIN tcnt ON tcnt.node = deg.node
    ORDER BY node
    """,
)
def graph_clustering_local(spark, sf_dir):
    """Per-node LOCAL clustering coefficient over the co-purchase graph
    (Watts & Strogatz 1998): C(v) = 2·T(v) / (d(v)·(d(v)−1)), the
    "how clique-like is this node's neighborhood" score that separates
    hub-of-unrelated-parts from bundle-member — the node-level
    companion to graph_triangle_count's single global coefficient, and
    the standard feature in link-prediction / anomaly pipelines.
    Degree-1 nodes emit NULL (the coefficient is undefined, not zero).

    Triangles are enumerated ONCE via the same degree-ordered
    orientation as graph_triangle_count (Suri & Vassilvitskii 2011 —
    out-degrees bounded ~O(√m), so the wedge join survives hubs), then
    each triangle credits its three corners through one explode +
    count — no per-node neighborhood materialization, no second wedge
    pass. Plan: edge list (support-capped, materialized once) → two
    broadcast-joined degree lookups → oriented wedge close → explode(3)
    → hash agg → left join back onto degrees. All shuffles are on node
    ids; the triangle stream is the only super-linear term and it is
    exactly the triangle count."""
    und = _copurchase_edges(spark, sf_dir).select("u", "v")
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    du = deg.select(F.col("node").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("node").alias("v"), F.col("d").alias("dv"))
    fwd = F.struct("du", "u") < F.struct("dv", "v")
    oe = (
        und.join(du, "u")
        .join(dv, "v")
        .select(
            F.when(fwd, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(fwd, F.col("v")).otherwise(F.col("u")).alias("dst"),
        )
        .localCheckpoint(eager=True)  # oriented edges: reused 3x
    )
    e1, e2, e3 = oe.alias("e1"), oe.alias("e2"), oe.alias("e3")
    tri = (
        e1.join(
            e2,
            (F.col("e2.src") == F.col("e1.src"))
            & (F.col("e1.dst") < F.col("e2.dst")),
        )
        .join(
            e3,
            (F.col("e3.src") == F.col("e1.dst"))
            & (F.col("e3.dst") == F.col("e2.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    tcnt = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("t"))
    )
    return (
        deg.join(tcnt, "node", "left")
        .select(
            F.col("node").cast("long").alias("node"),
            F.col("d").cast("long").alias("degree"),
            F.coalesce(F.col("t"), F.lit(0)).cast("long").alias("n_triangles"),
            F.when(
                F.col("d") >= 2,
                F.round(
                    2.0 * F.coalesce(F.col("t"), F.lit(0))
                    / (F.col("d") * (F.col("d") - 1)),
                    6,
                ),
            ).alias("local_cc"),
        )
        .orderBy("node")
    )


def _oracle_label_propagation() -> str:
    """Unrolled-CTE DuckDB twin of the Spark LPA loop (same 3 synchronous
    rounds, same mode-label update with the (count DESC, label ASC)
    tie-break)."""
    head = """
    WITH e0 AS (
      SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    ),
    edges AS (
      SELECT src, dst FROM e0
      UNION ALL
      SELECT dst AS src, src AS dst FROM e0
    ),
    l0 AS (SELECT DISTINCT src AS node, src AS label FROM edges)"""
    steps = []
    for i in range(1, _ITERS + 1):
        steps.append(f"""
    l{i} AS (
      SELECT node, label FROM (
        SELECT e.src AS node, l.label, COUNT(*) AS cnt,
               row_number() OVER (
                 PARTITION BY e.src
                 ORDER BY COUNT(*) DESC, l.label ASC) AS rn
        FROM edges e JOIN l{i - 1} l ON e.dst = l.node
        GROUP BY e.src, l.label
      ) WHERE rn = 1
    )""")
    tail = f"""
    SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           node // 2 AS entity_key,
           CASE WHEN label % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS community_kind,
           label // 2 AS community_key
    FROM l{_ITERS}
    ORDER BY kind, entity_key
    """
    return head + "," + ",".join(steps) + tail


@query("graph_label_propagation", oracle=_oracle_label_propagation())
def graph_label_propagation(spark, sf_dir, edges_path=None):
    """Community detection by synchronous label propagation (Raghavan,
    Albert & Kumara 2007) over the customer↔supplier trade graph: every
    node starts as its own community, then for 3 rounds simultaneously
    adopts the MOST FREQUENT label among its neighbors, ties broken by
    the smallest label. The mode update is what distinguishes this from
    connected components (min-label propagation, graph.py/llm/dedup.py):
    CC answers "which nodes are reachable", LPA answers "which nodes are
    DENSELY connected" — bridges between communities don't merge them
    just because a path exists.

    Determinism: classic LPA is notoriously run-order-dependent
    (asynchronous updates + random tie-breaks). This is the deterministic
    variant — synchronous rounds (all updates read the previous round's
    labels) and a total (count DESC, label ASC) tie order — so both
    engines land on identical labels and the result is hash-comparable
    and resumable at 100 TB.

    Scale shape: per round, ONE equi-join of the label table onto the
    persisted src-partitioned edge artifact (shared with graph_pagerank —
    built once, reused by every iterative graph op) and one (node, label)
    aggregation with a per-node top-1 window. Label tables are
    node-cardinality, edges dominate — identical join geometry to
    pagerank, whose bucketing/broadcast notes apply verbatim. Fixed 3
    rounds keeps the plan an unrolled DAG (no driver loop on collected
    data); production convergence looping would reuse
    graph_connected_components' budget-guarded pattern."""
    from pyspark.sql import Window

    edges = _trade_edges(spark, sf_dir, edges_path)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    w = Window.partitionBy("node").orderBy(
        F.col("cnt").desc(), F.col("label").asc()
    )
    for _ in range(_ITERS):
        nbr_labels = edges.join(
            labels.select(F.col("node").alias("dst"), "label"), "dst"
        ).select(F.col("src").alias("node"), "label")
        labels = (
            nbr_labels.groupBy("node", "label")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("node", "label")
        )
    return labels.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("kind"),
        F.expr("node div 2").alias("entity_key"),
        F.when(F.col("label") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("community_kind"),
        F.expr("label div 2").alias("community_key"),
    ).orderBy("kind", "entity_key")


def _oracle_kcore(k: int = 3, rounds: int = 4) -> str:
    """Unrolled peeling CTEs (same fixed-iteration oracle style as
    pagerank): d_i = degrees of E_i, s_{i+1} = survivors, E_{i+1} =
    surviving edges."""
    # AS MATERIALIZED: each e_i is referenced three times by round i+1
    # (degree build + two semi-joins) plus the report subqueries; without
    # the hint DuckDB inlines CTEs and re-evaluates the co-purchase
    # self-join exponentially in the round count (measured: >120 s at
    # sf0.01 inlined vs <1 s materialized).
    parts = [
        f"WITH {_COPURCHASE_EDGE_SQL}, e0 AS MATERIALIZED (SELECT u, v FROM e)"
    ]
    for i in range(rounds):
        parts.append(f""",
    d{i} AS MATERIALIZED (
      SELECT node, COUNT(*) AS d FROM (
        SELECT u AS node FROM e{i} UNION ALL SELECT v FROM e{i}
      ) GROUP BY node
    ), s{i + 1} AS MATERIALIZED (SELECT node FROM d{i} WHERE d >= {k}),
    e{i + 1} AS MATERIALIZED (
      SELECT e{i}.u, e{i}.v FROM e{i}
      JOIN s{i + 1} a ON e{i}.u = a.node
      JOIN s{i + 1} b ON e{i}.v = b.node
    )""")
    selects = [
        f"""SELECT {i + 1} AS round,
             (SELECT COUNT(*) FROM s{i + 1}) AS n_nodes,
             (SELECT COUNT(*) FROM e{i + 1}) AS n_edges"""
        for i in range(rounds)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY round"


@query("graph_kcore", oracle=_oracle_kcore())
def graph_kcore(spark, sf_dir, k=3, rounds=4):
    """K-core peeling over the co-purchase graph (Seidman 1983; the
    Matula–Beck peel): repeatedly drop nodes of degree < k, reporting
    (survivor nodes, surviving edges) after each of 4 fixed rounds — the
    densest-cohesion filter community pipelines run before anything
    expensive (a node outside the 3-core cannot sit in any triangle-rich
    community), and the convergence trace (deltas shrinking to 0) is the
    op's own audit. Fixed-round unrolling keeps it oracle-checkable, the
    same determinism trade pagerank makes; a production run loops until
    |E_i| stops changing.

    Per round: one degree aggregation (node-keyed, map-side combine) and
    one double semi-join of edges onto survivors — all shuffles on node
    ids, nothing super-linear in edges. Each round's edge set is
    localCheckpoint-ed: the 4 report rows each read their round's edges
    without re-deriving the whole peel prefix (the same unrolled-DAG vs
    rematerialization trade measured in graph_pagerank's docstring; at
    100 TB these become persisted per-round edge tables)."""
    cur = _copurchase_edges(spark, sf_dir).select("u", "v").localCheckpoint(
        eager=True
    )
    rows = None
    for i in range(rounds):
        deg = (
            cur.select(F.col("u").alias("node"))
            .unionAll(cur.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("d"))
        )
        surv = deg.filter(F.col("d") >= k).select("node").localCheckpoint(
            eager=True
        )
        cur = (
            cur.join(surv.withColumnRenamed("node", "u"), "u")
            .join(surv.withColumnRenamed("node", "v"), "v")
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        row = surv.agg(F.count("*").alias("n_nodes")).crossJoin(
            cur.agg(F.count("*").alias("n_edges"))
        ).select(
            F.lit(i + 1).cast("int").alias("round"), "n_nodes", "n_edges"
        )
        rows = row if rows is None else rows.unionAll(row)
    return rows.orderBy("round")
