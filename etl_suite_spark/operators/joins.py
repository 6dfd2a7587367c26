"""Join operators (SURVEY.md §2.3).

Reference analog: the blocks⋈transactions warehouse join is the ETL-suite's
centerpiece transform (SURVEY §0.1 [K]). We declare *logical* join semantics
and let Catalyst pick hash/SMJ/broadcast physically; AQE re-plans at runtime
(skew split, broadcast downgrade). Scale notes per operator below.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import davg, dsum, sql_davg, sql_dsum
from ..io import load_table
from ..registry import query


@query(
    "join_inner_equi",
    oracle="""
    SELECT o_orderkey, o_totalprice, c_custkey, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    """,
)
def join_inner_equi(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_multiway",
    oracle=f"""
    SELECT n_name,
           {sql_dsum("l_extendedprice * (1 - l_discount)", 6)} AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def join_multiway(spark, sf_dir):
    """TPC-H Q5 shape: 5-way join → per-nation revenue.

    Scale: lineitem⋈orders is the only big-big join (shuffle on orderkey);
    customer/nation/region are dims Catalyst auto-broadcasts. The revenue
    expression is exact (scale-6 decimal: double product of 2dp×(1±4dp)
    values has ≤6 decimal places, so the cast is lossless).
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(rev, scale=6).alias("revenue"), F.count("*").alias("n_lines"))
        .orderBy("n_name")
    )


@query(
    "join_left",
    oracle="""
    SELECT c_custkey, c_name, o_orderkey, o_totalprice
    FROM customer LEFT JOIN orders
      ON c_custkey = o_custkey AND o_totalprice > 400000
    """,
)
def join_left(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(
        o, (c.c_custkey == o.o_custkey) & (o.o_totalprice > 400000), "left"
    ).select("c_custkey", "c_name", "o_orderkey", "o_totalprice")


@query(
    "join_right",
    oracle="""
    SELECT o_orderkey, o_custkey, c_name, c_acctbal
    FROM orders RIGHT JOIN customer ON o_custkey = c_custkey AND o_orderstatus = 'P'
    """,
)
def join_right(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return o.join(
        c, (o.o_custkey == c.c_custkey) & (o.o_orderstatus == "P"), "right"
    ).select("o_orderkey", "o_custkey", "c_name", "c_acctbal")


@query(
    "join_full",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
    FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def join_full(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
    """,
)
def join_semi(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_totalprice > 350000)
    """,
)
def join_anti(spark, sf_dir):
    # customers with no large order (threshold keeps the result non-empty —
    # every customer has *some* order in the fixtures)
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "join_broadcast",
    oracle=f"""
    SELECT p_brand,
           {sql_dsum("l_quantity")} AS sum_qty,
           COUNT(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def join_broadcast(spark, sf_dir):
    """Fact⋈dim with an explicit broadcast hint — the 100 TB pattern for
    dimension joins: no shuffle of the fact side at all (hint is physical-
    only, so the oracle is the plain inner join).

    The hint here is UNCONDITIONAL because demonstrating the hint IS this
    op's declared §2 semantics (its plan test pins BroadcastHashJoin).
    Size bound: part grows ~200k rows/sf (~a few MB/sf parquet), so the
    hint is safe through sf≈100 but NOT at the 100 TB tier — production
    dim joins route through the byte-gated form (operators/tpch._dim_hint,
    gated on measured parquet bytes), which every TPC-H op and
    agg_hhi_concentration use."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_lines"))
        .orderBy("p_brand")
    )


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark, sf_dir):
    # capped to dim×dim (125 rows); never cross-join facts at scale.
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@query(
    "join_theta_range",
    oracle="""
    SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id
    FROM events a JOIN events b
      ON a.user_id = b.user_id
     AND b.ts > a.ts
     AND b.ts <= a.ts + INTERVAL 5 MINUTE
    """,
)
def join_theta_range(spark, sf_dir):
    """Non-equi range self-join (sessionizing idiom). The equi part
    (user_id) keys the shuffle; the range predicate filters inside each
    hash bucket, so this stays a hash join, not a BNLJ — the pattern that
    survives 100 TB (bounded pairs per key)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    return a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 5 MINUTES")),
    ).select(
        F.col("a.event_id").alias("a_id"),
        F.col("b.event_id").alias("b_id"),
        F.col("a.user_id").alias("user_id"),
    )


@query(
    "join_asof",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           c.event_id AS click_id, c.value AS click_value
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof(spark, sf_dir):
    """As-of join: latest click at-or-before each purchase, per user.

    Spark has no native ASOF JOIN. A range join would explode pairs, so we
    use the union+window formulation: tag both sides, sort once per user by
    (ts, side), and carry the last click forward with
    ``last(..., ignorenulls=True)``. One shuffle + one sort — linear at
    100 TB, versus quadratic for the naive range join. Clicks sort before
    purchases at equal ts (side 0 < 1) to realize the inclusive ``>=``.
    """
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.struct(
            F.col("event_id").alias("click_id"), F.col("value").alias("click_value")
        ).alias("click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None)
        .cast("struct<click_id:bigint,click_value:double>")
        .alias("click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.col("click.click_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = clicks.unionByName(purchases).withColumn(
        "last_click", F.last("click", ignorenulls=True).over(w)
    )
    return (
        filled.filter((F.col("side") == 1) & F.col("last_click").isNotNull())
        .select(
            F.col("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("last_click.click_id").alias("click_id"),
            F.col("last_click.click_value").alias("click_value"),
        )
    )


@query(
    "join_self_agg",
    oracle=f"""
    SELECT l.l_orderkey, l.l_linenumber, l.l_quantity, a.avg_qty
    FROM lineitem l
    JOIN (SELECT l_orderkey, {sql_davg("l_quantity")} AS avg_qty
          FROM lineitem GROUP BY l_orderkey) a
      ON l.l_orderkey = a.l_orderkey
    WHERE l.l_quantity > a.avg_qty
    """,
)
def join_self_agg(spark, sf_dir):
    # correlated-subquery shape: lines above their order's average quantity
    li = load_table(spark, sf_dir, "lineitem")
    avg_q = li.groupBy("l_orderkey").agg(davg("l_quantity").alias("avg_qty"))
    l = li.alias("l")
    a = avg_q.alias("a")
    return (
        l.join(a, F.col("l.l_orderkey") == F.col("a.l_orderkey"))
        .filter(F.col("l.l_quantity") > F.col("a.avg_qty"))
        .select(
            F.col("l.l_orderkey").alias("l_orderkey"),
            F.col("l.l_linenumber").alias("l_linenumber"),
            F.col("l.l_quantity").alias("l_quantity"),
            F.col("a.avg_qty").alias("avg_qty"),
        )
    )


@query(
    "join_exists_correlated",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
    )
    """,
)
def join_exists_correlated(spark, sf_dir):
    """Correlated EXISTS through the SQL entry point: Catalyst decorrelates
    the subquery into a left-semi join (same physical shape as join_semi —
    asserted implicitly by the shared oracle result). Declared separately
    because the *SQL surface* (correlated subqueries) is its own user-facing
    capability."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000
        )
        """
    )


@query(
    "join_asof_nearest",
    # tiebreaks, mirrored exactly by the Spark windows: smaller |Δt|
    # first; on equal |Δt| the BACKWARD match (earlier c.ts) wins; among
    # same-timestamp clicks backward resolves to the max event_id (it is
    # the last row in the window order) and forward to the min.
    oracle="""
    SELECT purchase_id, user_id, purchase_ts, click_id, delta_us
    FROM (
      SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
             c.event_id AS click_id,
             CAST(epoch_us(c.ts) - epoch_us(p.ts) AS BIGINT) AS delta_us,
             row_number() OVER (
               PARTITION BY p.event_id
               ORDER BY abs(epoch_us(c.ts) - epoch_us(p.ts)), c.ts,
                        CASE WHEN c.ts <= p.ts THEN -c.event_id
                             ELSE c.event_id END
             ) AS rn
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      JOIN (SELECT * FROM events WHERE event_type = 'click') c
        ON p.user_id = c.user_id
    ) WHERE rn = 1
    """,
)
def join_asof_nearest(spark, sf_dir):
    """Nearest-event as-of join: for each purchase, the click closest in
    time in EITHER direction (the sensor-alignment/nearest-tick variant;
    plain as-of only looks backward). Still the linear union+window
    formulation — one sort per user carries the last click forward AND
    the first click backward (two frames over the same exchange), then a
    map-only pick of the nearer side. No pair join anywhere; the oracle's
    per-user pair join is DuckDB-scale only. Ties: equal |Δt| resolves to
    the backward match, same-timestamp clicks resolve by event_id — the
    window order and the oracle's ORDER BY encode the identical rule, so
    the result is a pure function of the data."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.struct(
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        ).alias("click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("struct<c_ts:timestamp,click_id:bigint>").alias("click"),
    )
    base = Window.partitionBy("user_id").orderBy(
        "ts", "side", F.col("click.click_id").asc_nulls_first()
    )
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    filled = (
        clicks.unionByName(purchases)
        .withColumn("back", F.last("click", ignorenulls=True).over(wb))
        .withColumn("fwd", F.first("click", ignorenulls=True).over(wf))
    )
    d_back = F.unix_micros("ts") - F.unix_micros("back.c_ts")
    d_fwd = F.unix_micros("fwd.c_ts") - F.unix_micros("ts")
    pick_back = F.col("fwd").isNull() | (
        F.col("back").isNotNull() & (d_back <= d_fwd)
    )
    chosen = F.when(pick_back, F.col("back")).otherwise(F.col("fwd"))
    return (
        filled.filter(F.col("side") == 1)
        .filter(F.col("back").isNotNull() | F.col("fwd").isNotNull())
        .select(
            "purchase_id",
            "user_id",
            F.col("ts").alias("purchase_ts"),
            chosen["click_id"].alias("click_id"),
            (F.unix_micros(chosen["c_ts"]) - F.unix_micros("ts")).alias("delta_us"),
        )
    )


@query(
    "join_interval_overlap",
    oracle="""
    WITH act AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             MIN(epoch_us(ts)) AS a_start, MAX(epoch_us(ts)) AS a_end
      FROM events WHERE event_type <> 'error'
      GROUP BY user_id, CAST(ts AS DATE)
    ), inc AS (
      SELECT CAST(ts AS DATE) AS day,
             MIN(epoch_us(ts)) AS i_start, MAX(epoch_us(ts)) AS i_end,
             CAST(COUNT(*) AS BIGINT) AS n_errors
      FROM events WHERE event_type = 'error'
      GROUP BY CAST(ts AS DATE)
    )
    SELECT act.day, act.user_id, inc.n_errors,
           CAST(least(a_end, i_end) - greatest(a_start, i_start) AS BIGINT)
             AS overlap_us
    FROM act JOIN inc ON act.day = inc.day
     AND a_start <= i_end AND i_start <= a_end
     AND least(a_end, i_end) > greatest(a_start, i_start)
    """,
)
def join_interval_overlap(spark, sf_dir):
    """General interval-OVERLAP join between two derived interval sets:
    each user's daily activity span [first event, last event] against
    each day's error-incident window [first error, last error] — "which
    users were active during the incident", the temporal-join shape
    behind blast-radius and exposure analysis. Overlap length comes out
    in exact integer microseconds (epoch_us both engines — no float
    time arithmetic).

    Scale shape: the day equi-key carries the join — Spark executes a
    hash join on `day` with the range predicates applied as residual
    filters, NEVER a BNLJ over raw intervals (this is the
    bucketed-interval-join move of join_range_bucketed, with the bucket
    = calendar day the intervals are already derived per). Both interval
    relations are aggregates that collapse the fact table first (map-side
    combine onto (user, day) / day); at 100 TB intervals spanning
    multiple buckets would be exploded per overlapped day first —
    bounded fanout, identical downstream plan."""
    ev = load_table(spark, sf_dir, "events")
    act = (
        ev.filter(F.col("event_type") != "error")
        .groupBy("user_id", F.to_date("ts").alias("day"))
        .agg(
            F.min(F.unix_micros("ts")).alias("a_start"),
            F.max(F.unix_micros("ts")).alias("a_end"),
        )
    )
    inc = (
        ev.filter(F.col("event_type") == "error")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(
            F.min(F.unix_micros("ts")).alias("i_start"),
            F.max(F.unix_micros("ts")).alias("i_end"),
            F.count("*").cast("long").alias("n_errors"),
        )
    )
    ovl = F.least("a_end", "i_end") - F.greatest("a_start", "i_start")
    return (
        act.join(
            inc,
            (act["day"] == inc["day"])
            & (F.col("a_start") <= F.col("i_end"))
            & (F.col("i_start") <= F.col("a_end"))
            & (ovl > 0),
        )
        .select(
            act["day"].alias("day"),
            "user_id",
            "n_errors",
            ovl.cast("long").alias("overlap_us"),
        )
    )


@query(
    "join_asof_tolerance",
    oracle="""
    SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
           CASE WHEN c.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(c.ts) <= 900000000
                THEN c.event_id END AS click_id,
           CASE WHEN c.ts IS NOT NULL
                 AND epoch_us(p.ts) - epoch_us(c.ts) <= 900000000
                THEN round((epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0, 6)
           END AS staleness_sec,
           c.ts IS NOT NULL
             AND epoch_us(p.ts) - epoch_us(c.ts) <= 900000000 AS fresh
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def join_asof_tolerance(spark, sf_dir):
    """As-of join with a staleness tolerance — join_asof's missing knob:
    the latest click at-or-before each purchase counts ONLY if it is at
    most 15 minutes old; older matches are nulled out (a quote from
    yesterday must not price today's trade — the pandas merge_asof
    ``tolerance`` semantic). Every purchase row survives (left
    semantics) with a ``fresh`` verdict and the match's measured
    staleness, so the downstream can distinguish 'no click ever' from
    'click too old' (both null, same verdict column).

    Same linear union+window plan as join_asof — one shuffle + one sort
    per user — with the tolerance applied AFTER the carry-forward as a
    map-local gate on exact epoch-microsecond ages; the window cost is
    identical, no extra pass. DuckDB's native ASOF LEFT JOIN is the
    twin."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("purchase_id"),
        F.struct(
            F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
        ).alias("click"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("event_id").alias("purchase_id"),
        F.lit(None)
        .cast("struct<click_id:bigint,click_ts:timestamp>")
        .alias("click"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side", F.col("click.click_id").asc_nulls_first())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = clicks.unionByName(purchases).withColumn(
        "last_click", F.last("click", ignorenulls=True).over(w)
    )
    age_us = F.unix_micros("ts") - F.unix_micros("last_click.click_ts")
    fresh = F.col("last_click").isNotNull() & (age_us <= 900_000_000)
    return filled.filter(F.col("side") == 1).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.when(fresh, F.col("last_click.click_id")).alias("click_id"),
        F.when(fresh, F.round(age_us / 1_000_000.0, 6)).alias("staleness_sec"),
        fresh.alias("fresh"),
    )
