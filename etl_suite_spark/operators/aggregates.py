"""Aggregation operators (SURVEY.md §2.4).

Reference analog: the per-period/per-entity aggregations at the heart of the
ETL-suite's warehouse tables (daily miner/account activity rollups — SURVEY
§0.1 [K]). Re-expressed as declarative groupBy/agg so Catalyst plans
two-phase (partial + final) hash aggregation automatically — the map-side
combine is what makes these shuffles cheap at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import d2d, davg, dec, dsum, sql_d2d, sql_davg, sql_dsum
from ..io import load_table
from ..registry import query

# --- flagship: TPC-H Q1-shaped pricing summary ---------------------------
# Exact-decimal arithmetic end-to-end (core.py rationale): scales chosen so
# intermediate precision stays ≤38 on BOTH engines (Spark mul: p1+p2+1;
# DuckDB mul: p1+p2).


def _one():
    # Column objects need an active session → build lazily, not at import.
    return F.lit(1).cast("decimal(5,4)")


_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2))"
    " * (CAST(1 AS DECIMAL(5,4)) - CAST(l_discount AS DECIMAL(6,4)))"
)
_CHARGE = _DISC_PRICE + " * (CAST(1 AS DECIMAL(5,4)) + CAST(l_tax AS DECIMAL(6,4)))"


@query(
    "agg_group_basic",
    oracle=f"""
    SELECT
      l_returnflag, l_linestatus,
      {sql_dsum("l_quantity")} AS sum_qty,
      {sql_dsum("l_extendedprice")} AS sum_base_price,
      {sql_d2d(f"SUM({_DISC_PRICE})")} AS sum_disc_price,
      {sql_d2d(f"SUM({_CHARGE})")} AS sum_charge,
      {sql_davg("l_quantity")} AS avg_qty,
      {sql_davg("l_extendedprice")} AS avg_price,
      {sql_davg("l_discount", 4)} AS avg_disc,
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
            d2d(F.sum(ep * (_ONE - disc))).alias("sum_disc_price"),
            d2d(F.sum(ep * (_ONE - disc) * (_ONE + tax))).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount", scale=4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- distinct counting ------------------------------------------------------


@query(
    "agg_count_distinct",
    oracle="""
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_count_distinct(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


@query(
    "agg_approx_count_distinct",
    # HLL sketch values are implementation-specific and can never
    # hash-match another engine; what IS oracle-checkable is the honesty
    # metric: the exact distinct count (DuckDB-verified) plus a genuinely
    # computed bounded-relative-error flag of the sketch against it —
    # the same pattern as llm_sim_ann_recall.
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS approx_within_3sigma
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_approx_count_distinct(spark, sf_dir):
    # 100 TB path: HLL sketch instead of exact distinct — no giant shuffle
    # of distinct keys. approx_within_3sigma is computed, not constant: it
    # compares the sketch against the exact per-group count. Threshold
    # discipline (ADVICE r3): rsd=0.05 is a STANDARD DEVIATION, not a
    # bound — a 5% flag legitimately fails for ~1/3 of groups; measured
    # max relative error is 0.0% at sf0.001, 0.67% at sf0.01 (the driver's
    # correctness sf), 6.67% at sf0.1. The 3σ=15% threshold holds with
    # 2.2× headroom at every fixture scale while still being a real claim
    # (P(>3σ) ≈ 0.3% per group).
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.count_distinct("user_id").alias("exact_users"),
            F.count("*").alias("n_events"),
        )
        .select(
            "event_type",
            "exact_users",
            "n_events",
            (
                F.abs(F.col("approx_users") - F.col("exact_users"))
                <= 0.15 * F.col("exact_users")
            ).alias("approx_within_3sigma"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_having",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 55
    """,
)
def agg_having(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey")
        .agg(F.count("*").alias("n_customers"))
        .filter(F.col("n_customers") > 55)
    )


# --- grouping-sets family ---------------------------------------------------


@query(
    "agg_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows")
    )


@query(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity")} AS sum_qty, COUNT(*) AS n_rows
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def agg_cube(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n_rows")
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_extendedprice")} AS sum_price
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    # via the SQL entry point (SURVEY §3.2-2)
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS STRING) AS DOUBLE) AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


# --- statistical aggregates -------------------------------------------------
# Computed from exact decimal power sums (core.py rule 3) so the doubles are
# bit-identical across engines; the engines' own streaming stddev/corr merge
# partials in nondeterministic order.


@query(
    "agg_stats",
    oracle="""
    WITH s AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS syy,
             CAST(CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(24,4))) AS VARCHAR) AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag,
           (sxx - sx * sx / n) / (n - 1) AS var_qty,
           sqrt((sxx - sx * sx / n) / (n - 1)) AS stddev_qty,
           (sxy - sx * sy / n) / (n - 1) AS covar_qty_price,
           (sxy - sx * sy / n)
             / (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n)) AS corr_qty_price
    FROM s
    """,
)
def agg_stats(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    q, ep = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sx"),
        d2d(F.sum((q * q).cast("decimal(24,4)"))).alias("sxx"),
        dsum("l_extendedprice").alias("sy"),
        d2d(F.sum((ep * ep).cast("decimal(24,4)"))).alias("syy"),
        d2d(F.sum((q * ep).cast("decimal(24,4)"))).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    return s.select(
        "l_returnflag",
        ((sxx - sx * sx / n) / (n - 1)).alias("var_qty"),
        F.sqrt((sxx - sx * sx / n) / (n - 1)).alias("stddev_qty"),
        ((sxy - sx * sy / n) / (n - 1)).alias("covar_qty_price"),
        (
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n))
        ).alias("corr_qty_price"),
    )


@query(
    "agg_percentile",
    oracle="""
    SELECT c_mktsegment,
           ROUND(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 6) AS p50_price,
           ROUND(CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 6) AS p90_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_percentile(spark, sf_dir):
    # exact percentiles with linear interpolation on both engines; round 6dp
    # to absorb last-bit interpolation differences.
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.round(F.percentile("o_totalprice", F.lit(0.5)), 6).alias("p50_price"),
            F.round(F.percentile("o_totalprice", F.lit(0.9)), 6).alias("p90_price"),
        )
    )


@query(
    "agg_approx_percentile",
    # GK-sketch outputs are implementation-specific; the oracle-checkable
    # honesty metric is the exact percentile (DuckDB-verified) plus a
    # genuinely computed flag that the sketch lands within 1% of it.
    oracle="""
    SELECT o_orderpriority,
           CAST(CAST(quantile_disc(o_totalprice, 0.5) AS VARCHAR) AS DOUBLE)
             AS exact_p50,
           CAST(CAST(quantile_disc(o_totalprice, 0.95) AS VARCHAR) AS DOUBLE)
             AS exact_p95,
           TRUE AS approx_within_1pct
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_approx_percentile(spark, sf_dir):
    # 100 TB path: GK-style sketch, single pass, no global sort. The exact
    # discrete percentiles are emitted for the oracle; the flag holds the
    # sketch (accuracy 10000 → tight) to within 1% of exact. Margin
    # (ADVICE r3): GK's guarantee is a deterministic RANK error of
    # 1/accuracy=0.01%, which maps to value error through the local
    # density; measured max relative VALUE error is 0.085% at sf0.01 and
    # 0.088% at sf0.1 — the 1% threshold carries ~11× headroom and is
    # deterministic (no per-run flapping), unlike the probabilistic HLL
    # flag above.
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.approx_percentile(
                "o_totalprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(10000)
            ).alias("ap"),
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)")
            .alias("exact_p50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY o_totalprice)")
            .alias("exact_p95"),
        )
        .select(
            "o_orderpriority",
            F.round("exact_p50", 6).alias("exact_p50"),
            F.round("exact_p95", 6).alias("exact_p95"),
            (
                (F.abs(F.col("ap")[0] - F.col("exact_p50")) <= 0.01 * F.col("exact_p50"))
                & (F.abs(F.col("ap")[1] - F.col("exact_p95")) <= 0.01 * F.col("exact_p95"))
            ).alias("approx_within_1pct"),
        )
        .orderBy("o_orderpriority")
    )


# --- collection / positional aggregates -------------------------------------


@query(
    "agg_collect",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list(DISTINCT c_nationkey)), ',') AS nations,
           array_to_string(list_sort(list(c_nationkey)), ',') AS nations_all
    FROM customer GROUP BY c_mktsegment
    """,
)
def agg_collect(spark, sf_dir):
    # arrays sorted on both sides — collection order is nondeterministic —
    # then string-joined (raw arrays are unhashable in the driver's pandas
    # canonicalizer).
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.array_join(F.sort_array(F.collect_set("c_nationkey")), ",").alias("nations"),
        F.array_join(F.sort_array(F.collect_list("c_nationkey")), ",").alias("nations_all"),
    )


@query(
    "agg_first_last",
    oracle="""
    SELECT user_id,
           arg_max(value, event_id) AS last_value,
           arg_min(value, event_id) AS first_value,
           arg_max(event_type, ts) AS last_type
    FROM events GROUP BY user_id
    """,
)
def agg_first_last(spark, sf_dir):
    # max_by/min_by (order-insensitive) instead of first/last-over-sort:
    # no sort needed, deterministic because the order keys are unique.
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("value", "event_id").alias("last_value"),
        F.min_by("value", "event_id").alias("first_value"),
        F.max_by("event_type", "ts").alias("last_type"),
    )


_EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]


@query(
    "agg_pivot",
    oracle="""
    SELECT user_id,
           COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
           COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
           COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
           COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
    FROM events GROUP BY user_id
    """,
)
def agg_pivot(spark, sf_dir):
    # explicit pivot value list → single-pass agg, no extra distinct scan
    # to discover values (matters at 100 TB).
    ev = load_table(spark, sf_dir, "events")
    piv = ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count()
    return piv.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t) for t in _EVENT_TYPES],
    )


@query(
    "agg_time_rollup_multi",
    oracle="""
    SELECT CASE WHEN GROUPING(d) = 0 AND GROUPING(h) = 1 THEN 'day'
                WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'total' END AS grain,
           COALESCE(h, d) AS bucket,
           event_type, COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             AS sum_value
    FROM (
      SELECT event_type, value,
             CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
      FROM events
    )
    GROUP BY GROUPING SETS ((h, event_type), (d, event_type), ())
    """,
)
def agg_time_rollup_multi(spark, sf_dir):
    """Hypertable-style multi-granularity rollup: hourly, daily, and grand
    totals per event_type in ONE pass over the fact table (grouping sets →
    a single Expand + one shuffle), instead of three scans. This is the
    continuous-aggregate maintenance shape for a 100 TB event warehouse —
    at scale you'd sink each grain to its own partitioned table from the
    same job."""
    from ..io import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CASE WHEN GROUPING(d) = 0 AND GROUPING(h) = 1 THEN 'day'
                    WHEN GROUPING(h) = 0 THEN 'hour' ELSE 'total' END AS grain,
               COALESCE(h, d) AS bucket,
               event_type, COUNT(*) AS n,
               CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS STRING) AS DOUBLE)
                 AS sum_value
        FROM (
          SELECT event_type, value, date_trunc('hour', ts) AS h,
                 date_trunc('day', ts) AS d
          FROM events
        )
        GROUP BY GROUPING SETS ((h, event_type), (d, event_type), ())
        """
    )


@query(
    "agg_mode_per_group",
    oracle="""
    SELECT c_nationkey, c_mktsegment AS mode_segment, n
    FROM (
      SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY COUNT(*) DESC, c_mktsegment ASC) AS rn
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ) WHERE rn = 1
    """,
)
def agg_mode_per_group(spark, sf_dir):
    """Most-frequent value per group (count + ranked pick, alphabetical
    tiebreak). Two shuffles: the (group, value) count and the per-group
    window — never a collect of value lists."""
    c = load_table(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey", "c_mktsegment").agg(F.count("*").alias("n"))
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("n").desc(), F.col("c_mktsegment").asc()
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_mktsegment").alias("mode_segment"), "n")
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT least(CAST(floor(o_totalprice / 50000) AS BIGINT), 11) AS bucket,
           CAST(least(CAST(floor(o_totalprice / 50000) AS BIGINT), 11) * 50000
                AS DOUBLE) AS bucket_lo,
           COUNT(*) AS n
    FROM orders
    GROUP BY bucket
    """,
)
def agg_histogram(spark, sf_dir):
    """Equi-width histogram of order values: arithmetic binning (floor of
    x/width, top-capped) + count — a single map-side-combinable shuffle.
    The portable form of width_bucket, and the distribution profile every
    data-quality dashboard starts from."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000).cast("long"), F.lit(11))
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * 50000).cast("double").alias("bucket_lo"),
            "n",
        )
    )


@query(
    "agg_string_concat_group",
    oracle="""
    SELECT c_mktsegment,
           array_to_string(list_sort(list_distinct(list(o_orderpriority))), ',')
             AS priorities,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_string_concat_group(spark, sf_dir):
    """Group string concatenation (LISTAGG/STRING_AGG): sorted-distinct
    values joined per group — sorting before joining is what makes the
    output deterministic regardless of partial-aggregate merge order."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("o_orderpriority")), ","
            ).alias("priorities"),
            F.count("*").alias("n_orders"),
        )
    )


@query(
    "agg_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS st FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS ct
      FROM events e JOIN s ON e.user_id = s.user_id AND e.ts >= s.st
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS pt
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts >= c.ct
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT 'signup' AS stage, 1 AS stage_ord, count(*) AS n_users FROM s
    UNION ALL SELECT 'click', 2, count(*) FROM c
    UNION ALL SELECT 'purchase', 3, count(*) FROM p
    ORDER BY stage_ord
    """,
)
def agg_funnel(spark, sf_dir):
    """Ordered funnel: users who signed up, then clicked AT OR AFTER their
    first signup, then purchased at or after that click. Each stage is a
    filter + groupBy(user) + join back on user_id — every shuffle keys on
    user_id, so at 100 TB the three stages reuse one co-partitioning (and
    each stage's input shrinks monotonically). The event-order predicate
    lives in the join condition, not a window over all events — no
    per-user full event sort."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("st"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") >= F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )

    def stage(df, name, ord_):
        return df.agg(
            F.lit(name).alias("stage"),
            F.lit(ord_).alias("stage_ord"),
            F.count("*").alias("n_users"),
        )

    return (
        stage(s, "signup", 1)
        .unionByName(stage(c, "click", 2))
        .unionByName(stage(p, "purchase", 3))
        .orderBy("stage_ord")
    )


@query(
    "agg_retention_cohort",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ), a AS (
      SELECT DISTINCT e.user_id, f.cohort,
             CAST(date_diff('day', f.cohort,
                  CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS INT) AS wk
      FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT cohort, wk, count(*) AS n_active
    FROM a GROUP BY cohort, wk ORDER BY cohort, wk
    """,
)
def agg_retention_cohort(spark, sf_dir):
    """Weekly retention cohorts: users grouped by first-seen week; for
    each (cohort, week offset), how many are still active. Both the
    first-seen agg and the activity join shuffle on user_id (shared
    co-partitioning); the final agg keys on (cohort, wk) — tiny.
    Week offsets divide an exact day difference of two Monday-truncated
    dates by 7, avoiding engine-specific 'week' datediff boundary rules."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    f = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort")
    )
    a = (
        ev.join(f, "user_id")
        .select(
            "user_id",
            "cohort",
            (
                F.datediff(F.to_date(F.date_trunc("week", F.col("ts"))), F.col("cohort"))
                / 7
            )
            .cast("int")
            .alias("wk"),
        )
        .distinct()
    )
    return (
        a.groupBy("cohort", "wk")
        .agg(F.count("*").alias("n_active"))
        .orderBy("cohort", "wk")
    )


# rows-only PERMANENTLY: hll_sketch_agg binaries are Spark-internal (no
# DuckDB twin can produce mergeable bytes); accuracy is instead pinned ±5%
# vs exact in tests/test_aggregates.py::test_sketch_rollup_estimates_near_exact.
@query("agg_sketch_rollup")
def agg_sketch_rollup(spark, sf_dir):
    """Mergeable-sketch rollup: daily HyperLogLog sketches of distinct
    users, merged into weekly estimates WITHOUT rescanning the events.

    THE pre-aggregation pattern for distinct counts at 100 TB: the
    expensive pass builds one small sketch per day (stored alongside the
    daily rollup); any coarser granularity — week, month, arbitrary date
    range — is a cheap union of sketch registers. HLL register-merge is
    max-based, hence commutative and associative: estimates are
    independent of partial-aggregation merge order, so the output is
    deterministic. Rows-only because the sketch encoding is
    datasketches/Spark-internal; pytest pins each weekly estimate within
    5% of the exact distinct count."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date(F.date_trunc("day", "ts")).alias("day")).agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    return (
        daily.groupBy(F.to_date(F.date_trunc("week", "day")).alias("week"))
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.count("*").alias("n_days_merged"),
        )
        .orderBy("week")
    )


@query(
    "agg_heavy_hitters",
    oracle="""
    SELECT l_partkey, COUNT(*) AS cnt
    FROM lineitem
    GROUP BY l_partkey
    HAVING COUNT(*) >= 45
    ORDER BY cnt DESC, l_partkey
    LIMIT 20
    """,
)
def agg_heavy_hitters(spark, sf_dir):
    """Heavy hitters via a count-min sketch prefilter + exact confirmation
    (Cormode & Muthukrishnan 2005). The CMS (d=4 rows × w=1024 buckets) is
    a mergeable 4096-row aggregate — at 100 TB it's built with one
    map-side-combined shuffle and broadcasts everywhere; per-shard/per-day
    sketches add cell-wise. Candidates are keys whose min-over-rows
    estimate clears the threshold — CMS only over-counts, so no true heavy
    hitter is pruned — and only those few keys pay the exact count.
    The final output is EXACT (sketch prunes, exact confirms), so the
    oracle is plain GROUP BY/HAVING."""
    w, seeds, threshold = 1024, [0, 1, 2, 3], 45
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")

    def bucket(seed):
        return F.pmod(F.xxhash64(F.col("l_partkey"), F.lit(seed)), F.lit(w))

    hashed = li.select(
        "l_partkey",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(s).alias("seed"), bucket(s).alias("bkt"))
                    for s in seeds
                ]
            )
        ).alias("h"),
    ).select("l_partkey", "h.seed", "h.bkt")
    sketch = hashed.groupBy("seed", "bkt").agg(F.count("*").alias("cell"))

    candidates = (
        hashed.select("l_partkey", "seed", "bkt")
        .distinct()
        .join(F.broadcast(sketch), ["seed", "bkt"])
        .groupBy("l_partkey")
        .agg(F.min("cell").alias("est"))
        .filter(F.col("est") >= threshold)
        .select("l_partkey")
    )
    return (
        li.join(F.broadcast(candidates), "l_partkey", "left_semi")
        .groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
        .orderBy(F.col("cnt").desc(), "l_partkey")
        .limit(20)
    )


@query(
    "agg_multi_distinct",
    oracle="""
    SELECT c_nationkey,
           COUNT(*) AS n_rows,
           COUNT(DISTINCT c_mktsegment) AS n_segments,
           COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS n_bal_buckets,
           COUNT(DISTINCT c_mktsegment || '|' ||
                 CAST(CAST(floor(c_acctbal / 1000) AS BIGINT) AS VARCHAR))
             AS n_seg_bucket_pairs
    FROM customer
    GROUP BY c_nationkey
    """,
)
def agg_multi_distinct(spark, sf_dir):
    """Several exact COUNT(DISTINCT ...) over different columns in ONE
    aggregation. Catalyst plans this with an Expand node (one row replica
    per distinct-aggregate), then a single two-phase agg — not N separate
    scans stitched by joins, which is what a naive engine does. The plan
    costs (#distincts × rows) in the map stage but still only one shuffle;
    at 100 TB prefer `agg_approx_count_distinct` when ±2% error is
    acceptable (documented trade-off).
    """
    c = load_table(spark, sf_dir, "customer")
    bucket = F.floor(F.col("c_acctbal") / 1000).cast("long")
    return c.groupBy("c_nationkey").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.countDistinct(bucket).alias("n_bal_buckets"),
        F.countDistinct(
            F.concat(F.col("c_mktsegment"), F.lit("|"), bucket.cast("string"))
        ).alias("n_seg_bucket_pairs"),
    )


@query(
    "agg_quantile_sketch_rollup",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS day,
             CAST(floor(o_totalprice / 10000) AS BIGINT) AS bin,
             COUNT(*) AS cnt
      FROM orders GROUP BY 1, 2
    ),
    weekly AS (
      SELECT CAST(date_trunc('week', day) AS DATE) AS week, bin,
             CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM daily GROUP BY 1, 2
    ),
    cum AS (
      SELECT week, bin, cnt,
             SUM(cnt) OVER (PARTITION BY week ORDER BY bin) AS cum,
             SUM(cnt) OVER (PARTITION BY week) AS total
      FROM weekly
    )
    SELECT week,
           CAST(MAX(total) AS BIGINT) AS n_orders,
           MIN(CASE WHEN cum * 2 >= total THEN bin END) * 10000 AS p50_est,
           MIN(CASE WHEN cum * 20 >= total * 19 THEN bin END) * 10000 AS p95_est
    FROM cum
    GROUP BY week
    """,
)
def agg_quantile_sketch_rollup(spark, sf_dir):
    """Mergeable quantile sketch: equi-width histogram rollup daily→weekly,
    then approximate p50/p95 read off the merged bins (companion to the
    HLL rollup `agg_sketch_rollup` — count-distinct there, quantiles
    here). The sketch is (period, bin, cnt) rows: merging IS a group-sum,
    so a 100 TB pipeline materializes cheap daily sketches once and serves
    any coarser period without rescanning facts. Bin edges are fixed
    (width 10000), arithmetic all-integer → bit-exact on both engines,
    unlike t-digest/KLL whose merge order perturbs centroids. Error is
    bounded by bin width; tighten by narrowing hot bins (two-level
    histogram) — documented trade-off, same plan shape.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.date_trunc("day", "o_orderdate").cast("date").alias("day"),
            F.floor(F.col("o_totalprice") / 10000).cast("long").alias("bin"),
        )
        .groupBy("day", "bin")
        .agg(F.count("*").alias("cnt"))
    )
    weekly = (
        daily.select(
            F.date_trunc("week", "day").cast("date").alias("week"), "bin", "cnt"
        )
        .groupBy("week", "bin")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    wc = Window.partitionBy("week").orderBy("bin")
    wt = Window.partitionBy("week")
    cum = weekly.select(
        "week",
        "bin",
        "cnt",
        F.sum("cnt").over(wc).alias("cum"),
        F.sum("cnt").over(wt).alias("total"),
    )
    return cum.groupBy("week").agg(
        F.max("total").cast("long").alias("n_orders"),
        (F.min(F.when(F.col("cum") * 2 >= F.col("total"), F.col("bin"))) * 10000).alias(
            "p50_est"
        ),
        (
            F.min(F.when(F.col("cum") * 20 >= F.col("total") * 19, F.col("bin"))) * 10000
        ).alias("p95_est"),
    )


@query(
    "agg_higher_moments",
    oracle="""
    WITH q AS (
      SELECT o_orderstatus,
             CAST(round(o_totalprice) AS BIGINT) AS d
      FROM orders
    ),
    sums AS (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             CAST(CAST(SUM(CAST(d AS DECIMAL(38,0))) AS VARCHAR) AS DOUBLE) AS s1,
             CAST(CAST(SUM(CAST(d AS DECIMAL(15,0)) * CAST(d AS DECIMAL(15,0)))
                  AS VARCHAR) AS DOUBLE) AS s2,
             CAST(CAST(SUM(CAST(d AS DECIMAL(12,0)) * CAST(d AS DECIMAL(12,0))
                           * CAST(d AS DECIMAL(12,0))) AS VARCHAR) AS DOUBLE) AS s3,
             CAST(CAST(SUM(CAST(CAST(d AS DECIMAL(15,0)) * CAST(d AS DECIMAL(15,0))
                                AS DECIMAL(19,0))
                           * CAST(CAST(d AS DECIMAL(15,0)) * CAST(d AS DECIMAL(15,0))
                                  AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE) AS s4
      FROM q GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           round(s1 / n, 6) AS mean_d,
           round((s2 / n - (s1/n) * (s1/n)) / 1e6, 6) AS m2_k,
           round((s3/n - 3*(s1/n)*(s2/n) + 2*(s1/n)*(s1/n)*(s1/n))
                 / pow(s2/n - (s1/n)*(s1/n), 1.5), 6) AS skewness,
           round((s4/n - 4*(s1/n)*(s3/n) + 6*(s1/n)*(s1/n)*(s2/n)
                  - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                 / pow(s2/n - (s1/n)*(s1/n), 2) - 3, 6) AS excess_kurtosis
    FROM sums
    """,
)
def agg_higher_moments(spark, sf_dir):
    """Skewness and excess kurtosis per group, computed from EXACT integer
    power sums (S1..S4 in decimal, then closed-form population moments in
    double). Neither engine's built-in skewness/kurtosis is usable for
    cross-engine hashing: they stream with different update orders AND
    disagree on sample-vs-population definitions; power sums sidestep
    both (same trick as `agg_stats`, one order higher). Decimal widths
    are chosen so every product stays under the 38-digit cap: d ≤ ~6e5
    (dollars), d² ≤ 3.6e11, d³ via (12,0)³, d⁴ via (19,0)×(19,0) products
    of the capped d². One shuffle."""
    o = load_table(spark, sf_dir, "orders")
    d_raw = F.round("o_totalprice").cast("long")
    q = o.select("o_orderstatus", d_raw.alias("d"))
    d38 = F.col("d").cast("decimal(38,0)")
    d15 = F.col("d").cast("decimal(15,0)")
    d12 = F.col("d").cast("decimal(12,0)")
    # (19,0) factors force the int128 multiply path on DuckDB (its ≤18-digit
    # decimal products run in int64 and overflow); Spark caps the formal
    # (39,0) result at 38 digits — the actual values (≤ 1.3e23) fit exactly.
    d2 = (d15 * d15).cast("decimal(19,0)")
    sums = q.groupBy("o_orderstatus").agg(
        F.count("*").alias("n"),
        d2d(F.sum(d38)).alias("s1"),
        d2d(F.sum(d15 * d15)).alias("s2"),
        d2d(F.sum(d12 * d12 * d12)).alias("s3"),
        d2d(F.sum(d2 * d2)).alias("s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3 * mu * (F.col("s2") / n) + 2 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4 * mu * (F.col("s3") / n)
        + 6 * mu * mu * (F.col("s2") / n)
        - 3 * mu * mu * mu * mu
    )
    return sums.select(
        "o_orderstatus",
        "n",
        F.round(mu, 6).alias("mean_d"),
        # variance reported in (thousands)^2: at raw scale (~2e10) a 6dp
        # round sits at double-ulp resolution and engines disagree in repr
        F.round(m2 / 1e6, 6).alias("m2_k"),
        F.round(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        F.round(m4 / F.pow(m2, 2) - 3, 6).alias("excess_kurtosis"),
    )


@query(
    "agg_unpivot",
    oracle=f"""
    WITH long AS (
      SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
      UNION ALL
      SELECT 'l_extendedprice', l_extendedprice FROM lineitem
      UNION ALL
      SELECT 'l_discount', l_discount FROM lineitem
      UNION ALL
      SELECT 'l_tax', l_tax FROM lineitem
    )
    SELECT measure,
           CAST(COUNT(*) AS BIGINT) AS n,
           {sql_dsum('value')} AS sum_value,
           {sql_davg('value')} AS avg_value,
           {sql_d2d('MIN(value)')} AS min_value,
           {sql_d2d('MAX(value)')} AS max_value
    FROM long
    GROUP BY measure
    ORDER BY measure
    """,
)
def agg_unpivot(spark, sf_dir):
    """UNPIVOT / melt — the wide→long pivot inverse (reference's
    stack-measures reshaping; the dual of agg_pivot). Four measure
    columns of lineitem melt into (measure, value) rows, then one
    hash aggregate profiles each measure.

    Plan shape: Spark's native ``unpivot`` plans an Expand node — each
    input row emits its 4 measure rows IN THE SCAN STAGE (map-side), so
    the only shuffle is the final 4-group aggregate, which map-side
    partial aggregation collapses to ~partitions×4 rows. No union of 4
    separate scans (DuckDB's oracle formulation reads the table 4×; the
    Spark plan reads it ONCE — at 100 TB that's the difference that
    matters). Sums use the exact-decimal discipline so the hash can't
    flap on merge order."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="value",
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count("*").alias("n"),
            dsum("value").alias("sum_value"),
            davg("value").alias("avg_value"),
            d2d(F.min("value")).alias("min_value"),
            d2d(F.max("value")).alias("max_value"),
        )
        .orderBy("measure")
    )


@query(
    "agg_aqp_estimate",
    oracle=f"""
    WITH s AS (
      SELECT * FROM lineitem
      WHERE (((l_orderkey * 100003 + l_linenumber) % 1000003)
             * 2654435761) % 50 = 0
    ),
    est AS (
      SELECT CAST(COUNT(*) * 50 AS BIGINT) AS est_rows,
             round(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS VARCHAR) AS DOUBLE) * 50, 2) AS est_revenue
      FROM s
    ),
    exact AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS exact_rows,
             {sql_dsum("l_extendedprice")} AS exact_revenue
      FROM lineitem
    )
    SELECT est_rows, exact_rows, est_revenue, exact_revenue,
           round(abs(est_revenue - exact_revenue) / exact_revenue, 6)
             AS rel_error,
           abs(est_revenue - exact_revenue) / exact_revenue < 0.05
             AS within_5pct
    FROM est, exact
    """,
)
def agg_aqp_estimate(spark, sf_dir):
    """Approximate query processing via a deterministic 2% uniform sample
    (BlinkDB-style AQP, minus the RNG): estimate the row count and total
    revenue from rows selected by a Knuth multiplicative hash of the
    primary key, scale by 1/rate, and report the measured relative error
    against the exact answer plus a within-5% verdict.

    The hash-sample (not ``TABLESAMPLE``/rand()) is the load-bearing
    choice: the sample is a pure function of the data, so it is identical
    across engines, runs, AND partitionings — which is what makes an AQP
    estimate auditable (and this oracle checkable at all). The inner key
    mix is reduced mod 1000003 (prime) BEFORE the Knuth multiply so every
    intermediate stays under 2⁶³: the unreduced form overflowed INT64 at
    sf0.1, where Spark (non-ANSI) wraps silently but DuckDB raises — the
    engines would otherwise sample DIFFERENT rows the moment keys grow
    past ~3.5e9 (caught by the full sf0.1 sweep). Plan shape:
    the sample predicate pushes into the scan (a 2% scan at 100 TB when
    the layout buckets by the hash), and both branches are single
    hash aggregates; the exact branch exists here to measure honesty —
    production serves the estimate alone. Measured rel_error against the
    5% gate: 2.1% at sf0.01 (sample n≈1200, expected 1/sqrt(n) ≈ 3%
    scale), 0.6% at sf0.1 (n≈12k) — error shrinking ~1/sqrt(n) as the
    sample grows, exactly the AQP contract."""
    li = load_table(spark, sf_dir, "lineitem")
    h = (
        ((F.col("l_orderkey") * 100003 + F.col("l_linenumber")) % 1000003)
        * 2654435761
    ) % 50
    est = li.filter(h == 0).agg(
        (F.count("*") * 50).alias("est_rows"),
        F.round(d2d(F.sum(dec("l_extendedprice"))) * 50, 2).alias("est_revenue"),
    )
    exact = li.agg(
        F.count("*").alias("exact_rows"),
        dsum("l_extendedprice").alias("exact_revenue"),
    )
    rel = F.abs(F.col("est_revenue") - F.col("exact_revenue")) / F.col("exact_revenue")
    return est.join(exact).select(
        "est_rows",
        "exact_rows",
        "est_revenue",
        F.col("exact_revenue"),
        F.round(rel, 6).alias("rel_error"),
        (rel < 0.05).alias("within_5pct"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark, sf_dir):
    """EXACT distinct counts via Spark 4's bitmap aggregate family
    (bitmap_bucket_number / bitmap_bit_position / bitmap_construct_agg /
    bitmap_count) — the mergeable-but-exact middle ground between
    COUNT(DISTINCT) (exact, but its final merge must see every value)
    and HLL sketches (mergeable, approximate — agg_sketch_rollup). Each
    (group, bucket-of-32768-ids) gets a fixed 4 KB bitmap built
    map-side; bitmaps OR together associatively, so partial aggregation
    does real work and the final shuffle carries O(groups × id-range /
    32768) bounded state instead of raw values. This is the layout a
    100 TB daily→weekly distinct rollup persists when the count must be
    EXACT (billing, dedup audits) — the bitmap tables union and re-OR
    without rescanning facts; the oracle is plain COUNT(DISTINCT),
    because the bitmap path must reproduce it bit-for-bit.

    Two-level plan: groupBy(flag, bucket) builds bitmaps (map-side
    combine), groupBy(flag) sums their popcounts — both shuffles carry
    only compact bitmap bytes."""
    li = load_table(spark, sf_dir, "lineitem")

    def bitmap_distinct(key: str, out: str):
        # one bitmap per (group, 32768-id bucket), then sum of popcounts;
        # each key gets its OWN bucket grouping — bucketing two keys
        # jointly would split one key's bucket across the other's buckets
        # and double-count bits on the popcount sum.
        per_bucket = li.groupBy(
            "l_returnflag",
            F.expr(f"bitmap_bucket_number({key})").alias("bkt"),
        ).agg(F.expr(f"bitmap_construct_agg(bitmap_bit_position({key}))").alias("bm"))
        return (
            per_bucket.groupBy("l_returnflag")
            .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias(out))
        )

    return bitmap_distinct("l_partkey", "n_parts").join(
        bitmap_distinct("l_suppkey", "n_suppliers"), "l_returnflag"
    )


@query(
    "agg_bitmap_rollup",
    oracle="""
    SELECT date_trunc('week', CAST(ts AS DATE)) AS week_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1 ORDER BY 1
    """,
)
def agg_bitmap_rollup(spark, sf_dir):
    """Daily→weekly EXACT distinct-user rollup via mergeable bitmaps —
    the exact counterpart of agg_sketch_rollup's HLL pipeline: persist
    per-(day, bucket) bitmaps once, then ANY coarser period (week here,
    month, all-time) is bitmap_or_agg + popcount over the daily state,
    never a rescan of facts, and the answer is exact, not ±2%. This is
    the 100 TB pattern for billing-grade distinct counts: the daily
    bitmap table is O(days × id-range/32768) fixed-size rows, each
    merge is an associative OR, and late-arriving data only rewrites
    its own day. The oracle is the direct COUNT(DISTINCT) over facts —
    the rollup must reproduce it bit-for-bit (the inc_scd2_apply
    "incremental == rebuild" equivalence discipline).

    Plan: one groupBy(day, bucket) builds daily bitmaps map-side; one
    groupBy(week, bucket) ORs them; one groupBy(week) sums popcounts.
    Event counts ride the same daily state (exact longs). Three
    shuffles carrying only bitmap bytes + counters."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date("ts").alias("day"),
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm"),
        F.count("*").alias("n_events"),
    )
    weekly = daily.groupBy(
        F.date_trunc("week", "day").cast("date").alias("week_start"),
        "bkt",
    ).agg(
        F.expr("bitmap_or_agg(bm)").alias("bm"),
        F.sum("n_events").alias("n_events"),
    )
    return (
        weekly.groupBy("week_start")
        .agg(
            F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_users"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .orderBy("week_start")
    )


@query(
    "agg_funnel_timebound",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS st FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS ct
      FROM events e JOIN s ON e.user_id = s.user_id
       AND e.ts >= s.st AND e.ts <= s.st + INTERVAL 24 HOUR
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS pt
      FROM events e JOIN c ON e.user_id = c.user_id
       AND e.ts >= c.ct AND e.ts <= c.ct + INTERVAL 24 HOUR
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    ), n AS (
      SELECT (SELECT CAST(count(*) AS BIGINT) FROM s) AS n_signup,
             (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_24h,
             (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_purchase_24h
    )
    SELECT n_signup, n_click_24h, n_purchase_24h,
           round(CAST(n_click_24h AS DOUBLE) / n_signup, 6) AS click_rate,
           round(CAST(n_purchase_24h AS DOUBLE)
                 / nullif(n_click_24h, 0), 6) AS purchase_rate
    FROM n
    """,
)
def agg_funnel_timebound(spark, sf_dir):
    """Time-BOUND conversion funnel: signup → first click within 24 h →
    first purchase within 24 h of that click, with per-step conversion
    rates. The conversion-window constraint is what separates a funnel
    metric from mere event ordering (agg_funnel): a purchase six months
    after the click is retention, not conversion, and every growth
    dashboard windows its steps. The window predicate lives in the JOIN
    CONDITION (`ts BETWEEN prev AND prev + 24h`), not a post-filter, so
    each stage's probe input shrinks before aggregation.

    Scale shape: identical to agg_funnel — three user-keyed stages
    reusing one co-partitioning, each stage's input monotonically
    smaller; the final rate row is a join of three one-row counts."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("st"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(
            (F.col("ts") >= F.col("st"))
            & (F.col("ts") <= F.col("st") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") >= F.col("ct"))
            & (F.col("ts") <= F.col("ct") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    n = (
        s.agg(F.count("*").cast("long").alias("n_signup"))
        .crossJoin(c.agg(F.count("*").cast("long").alias("n_click_24h")))
        .crossJoin(p.agg(F.count("*").cast("long").alias("n_purchase_24h")))
    )
    return n.select(
        "n_signup",
        "n_click_24h",
        "n_purchase_24h",
        F.round(F.col("n_click_24h").cast("double") / F.col("n_signup"), 6).alias(
            "click_rate"
        ),
        F.round(
            F.col("n_purchase_24h").cast("double")
            / F.nullif(F.col("n_click_24h"), F.lit(0)),
            6,
        ).alias("purchase_rate"),
    )


@query(
    "agg_partial_final",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR)
                AS DOUBLE) AS sum_qty,
           round(CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                           AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
           CAST(MAX(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS max_qty
    FROM lineitem GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def agg_partial_final(spark, sf_dir):
    """EXPLICIT two-phase (partial → final) aggregation — §2's one
    formerly documentation-only row, implemented as a demonstration that
    the mergeable-state contract Spark's physical planner applies
    automatically (HashAggregate partial → Exchange → HashAggregate
    final) can be expressed, audited, and oracle-checked at the API
    level too. Phase 1 folds each INPUT partition's rows into one
    (count, decimal-sum, max) state tuple per (group, partition) —
    exactly the shape a map-side combiner emits; phase 2 merges the
    states with the associative-commutative merge (sum of counts, sum of
    decimal sums, max of maxes) and only then derives avg = sum/count.

    The partial states themselves depend on the physical partitioning
    (spark_partition_id is not stable across runs) — which is precisely
    the point: the MERGED result provably does not, because every state
    component is a commutative monoid fold over exact values (decimal
    sums, longs, max). The oracle computes the same groups single-phase;
    a pytest additionally pins repartition-invariance. AVG is the
    canonical non-trivially-mergeable example: you cannot merge
    averages, you merge (sum, count) pairs and divide once — the mistake
    this op exists to teach against. At 100 TB this is the contract
    behind every map-side combine and every inc_state_merge_stats-style
    incremental rollup: partials computed per file/partition/day merge
    into exact global aggregates without a second scan."""
    li = load_table(spark, sf_dir, "lineitem")
    partial = (
        li.select(
            "l_returnflag",
            "l_linestatus",
            F.spark_partition_id().alias("pid"),
            dec("l_quantity", 2).alias("qty"),
        )
        .groupBy("l_returnflag", "l_linestatus", "pid")
        .agg(
            F.count("*").alias("p_n"),
            F.sum("qty").alias("p_sum"),
            F.max("qty").alias("p_max"),
        )
    )
    final = partial.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum("p_n").cast("long").alias("n_rows"),
        F.sum("p_sum").alias("m_sum"),
        F.max("p_max").alias("m_max"),
    )
    return final.select(
        "l_returnflag",
        "l_linestatus",
        "n_rows",
        d2d(F.col("m_sum")).alias("sum_qty"),
        F.round(d2d(F.col("m_sum")) / F.col("n_rows"), 6).alias("avg_qty"),
        F.col("m_max").cast("double").alias("max_qty"),
    ).orderBy("l_returnflag", "l_linestatus")


@query(
    "agg_sketch_overlap",
    # Exact pairwise overlaps are engine-checkable; the HLL
    # inclusion-exclusion estimate is Spark-internal (same reason
    # agg_sketch_rollup is rows-only) so it surfaces only through a
    # genuinely computed within-tolerance flag — the ml_kmeans_quality
    # honesty pattern. Audience sets are per-type (user, day) activity
    # pairs: per-type USER sets are fixture-degenerate (every type sees
    # all users), user-days vary (~1600 per type, overlaps 555-599 at
    # sf0.01).
    oracle="""
    WITH s AS (
      SELECT DISTINCT event_type,
             user_id * 100000 + datediff('day', DATE '2024-01-01', ts) AS ud
      FROM events
    ), sizes AS (
      SELECT event_type, COUNT(*) AS n FROM s GROUP BY 1
    ), pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS exact_overlap
      FROM s a JOIN s b ON a.ud = b.ud AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b,
           CAST(na.n AS BIGINT) AS n_a,
           CAST(nb.n AS BIGINT) AS n_b,
           CAST(exact_overlap AS BIGINT) AS exact_overlap,
           TRUE AS approx_within_15pct
    FROM pairs
    JOIN sizes na ON na.event_type = type_a
    JOIN sizes nb ON nb.event_type = type_b
    ORDER BY type_a, type_b
    """,
)
def agg_sketch_overlap(spark, sf_dir):
    """Sketch-based audience-overlap estimation: |A∩B| via HLL
    inclusion-exclusion (|A| + |B| − |A∪B|, each term a mergeable
    Datasketches HLL estimate) for every unordered pair of event-type
    activity sets — the overlap analysis that at 100 TB runs on persisted
    per-segment sketches (KBs each) instead of re-shuffling raw id sets
    per pair. The union of two sketches is F.hll_union on the
    type-count-sized sketch table; nothing corpus-sized moves after the
    one distinct-set aggregation pass.

    Honesty: inclusion-exclusion AMPLIFIES HLL error (three ±1.6%-σ
    estimates of ~1600-2600-element sets land on an overlap of ~570), so
    the flag asserts |approx − exact| ≤ 15% of exact — MEASURED worst
    pair error with the epoch-day key: 0.0% at sf0.001 (sets small
    enough that the sketch is exact), 8.18% at sf0.01, 10.98% at sf0.1;
    deterministic (HLL sketches of fixed input are reproducible), so the
    flag cannot flap, and the 1.37× margin over the worst measured point
    is real headroom, not a guess. The exact overlaps ride along as the
    driver-hash-checked columns, so the oracle certifies the exact side
    AND the flag certifies the sketch side."""
    ev = load_table(spark, sf_dir, "events")
    # unambiguous epoch-day key: user_id * 100000 + days-since-2024-01-01
    # (a day-of-month key would alias Jan 5 and Feb 5 once a fixture
    # spans months; ADVICE r8 item 3 — |day offset| stays ≪ 50000 for
    # any realistic timestamp so the key never crosses user blocks)
    s = ev.select(
        "event_type",
        (
            F.col("user_id") * 100000
            + F.datediff(F.col("ts"), F.lit("2024-01-01").cast("date"))
        ).alias("ud"),
    ).distinct()
    sizes = s.groupBy("event_type").agg(F.count("*").alias("n"))
    sketches = s.groupBy("event_type").agg(F.hll_sketch_agg("ud").alias("sk"))
    a = sketches.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = sketches.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    est = (
        a.join(b, F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.hll_sketch_estimate("sk_a").alias("est_a"),
            F.hll_sketch_estimate("sk_b").alias("est_b"),
            F.hll_sketch_estimate(
                F.hll_union("sk_a", "sk_b")
            ).alias("est_union"),
        )
        .select(
            "type_a",
            "type_b",
            (F.col("est_a") + F.col("est_b") - F.col("est_union")).alias(
                "approx_overlap"
            ),
        )
    )
    sa, sb = s.alias("sa"), s.alias("sb")
    exact = (
        sa.join(
            sb,
            (F.col("sa.ud") == F.col("sb.ud"))
            & (F.col("sa.event_type") < F.col("sb.event_type")),
        )
        .groupBy(
            F.col("sa.event_type").alias("type_a"),
            F.col("sb.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("exact_overlap"))
    )
    na = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        exact.join(est, ["type_a", "type_b"])
        .join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("exact_overlap").cast("long").alias("exact_overlap"),
            (
                F.abs(F.col("approx_overlap") - F.col("exact_overlap"))
                <= 0.15 * F.col("exact_overlap")
            ).alias("approx_within_15pct"),
        )
        .orderBy("type_a", "type_b")
    )
