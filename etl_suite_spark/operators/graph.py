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
    # Materialize the symmetrized edge list ONCE (distributed src-
    # partitioned write), then iterate over the clean parquet scan — the
    # bucket-write-then-reuse pattern prescribed for 100 TB, and also the
    # measured winner at bench scale (sf0.1, local[32]): ~4.5 s incl. the
    # write vs ~6.8 s recomputing the distinct edge build per iteration
    # and ~8-16 s with .persist() (cache materialization blocks, and its
    # InMemoryRelation boundary stops AQE re-optimization). Also measured
    # and REJECTED (round 3): per-iteration rank.localCheckpoint(eager)
    # to truncate lineage — 11.3 s vs 8.3 s first-run in fresh sessions
    # (each eager materialization pays its own codegen; the unrolled DAG
    # compiles once). At 100 TB with many more iterations the tradeoff
    # flips and checkpointing every ~5 iterations is the standard move.
    import hashlib
    import os
    import tempfile

    edges_lazy = e0.union(
        e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    if edges_path is None:
        # Shared deterministic dir, made concurrency-safe (ADVICE r3): each
        # process writes to its own PID-suffixed temp dir, then atomically
        # renames it into place.  The loser of a rename race discards its
        # copy and reads the winner's (content is deterministic per sf_dir —
        # the "v1" token versions the derivation so a future edge-logic
        # change can't silently reuse stale data).  A complete dir carries
        # Spark's _SUCCESS marker; rename makes it appear atomically, so a
        # reader never sees a half-written edge list.
        final = os.path.join(
            tempfile.gettempdir(),
            "etl_pr_edges_"
            + hashlib.sha1(("v1:" + sf_dir).encode()).hexdigest()[:12],
            "edges",
        )
        if not os.path.isfile(os.path.join(final, "_SUCCESS")):
            tmp = f"{final}.tmp.{os.getpid()}"
            edges_lazy.repartition(32, "src").write.mode("overwrite").parquet(tmp)
            try:
                os.rename(tmp, final)
            except OSError:  # concurrent builder won the rename; use theirs
                import shutil

                shutil.rmtree(tmp, ignore_errors=True)
        edges_path = final
    else:
        edges_lazy.repartition(32, "src").write.mode("overwrite").parquet(edges_path)
    edges = spark.read.parquet(edges_path)

    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    n = nodes.count()  # one scalar job; every other step stays distributed
    base = (15 * _SCALE) // (100 * n)

    hint = (
        F.broadcast
        if broadcast_threshold_rows is not None and n < broadcast_threshold_rows
        else (lambda df: df)
    )

    rank = nodes.select("node", F.lit(_SCALE // n).cast("long").alias("rank"))
    for _ in range(_ITERS):
        # outdeg folds into the RANK side (node-cardinality join), so each
        # iteration touches edges exactly once, followed by one dst-keyed
        # aggregation.  `hint` broadcasts only under the node-count gate.
        share = rank.join(deg, rank["node"] == deg["src"]).select(
            F.col("node").alias("snode"),
            F.expr("rank div outdeg").alias("share"),
        )
        contrib = (
            edges.join(hint(share), edges["src"] == F.col("snode"))
            .groupBy("dst")
            .agg(F.sum("share").alias("contrib"))
        )
        rank = nodes.join(
            hint(contrib), nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            F.expr(
                f"CAST({base} + (85 * coalesce(contrib, 0)) div 100 AS BIGINT)"
            ).alias("rank"),
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
      SELECT ps.p, ps.s FROM ps JOIN deg_p USING (p) WHERE nsupp <= 10
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
def graph_triangle_count(spark, sf_dir):
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

    Same hot-key discipline as the dedup family: parts supplied by > 10
    suppliers are excluded from edge generation (a ubiquitous part is a
    clique factory — quadratic pairs, zero signal), mirrored exactly in
    the oracle's HAVING-style cap."""
    ps = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("p"), F.col("l_suppkey").alias("s")
    ).distinct()
    deg_p = ps.groupBy("p").agg(F.count("*").alias("nsupp"))
    ok = ps.join(deg_p.filter(F.col("nsupp") <= 10), "p")
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
    e1, e2, e3 = oe.alias("e1"), oe.alias("e2"), oe.alias("e3")
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
