"""Window-function operators (SURVEY.md §2.5).

Reference analog: delta-vs-previous-period metrics and per-period rankings
in the ETL-suite's aggregation jobs (SURVEY §0.1 [K]).

Determinism discipline (SURVEY §5.2): every ORDER BY carries a unique
tiebreaker; running sums use exact decimals because engines disagree on
float association order inside window frames (DuckDB uses segment trees,
Spark accumulates) — decimal makes the frame aggregation exact on both.

Scale: one shuffle per distinct partitionBy key-set; consecutive windows
over the same keys reuse the exchange. Partition-local sort spills via
Tungsten — no driver materialization.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import d2d, dec
from ..io import load_table
from ..registry import query


@query(
    "win_row_number",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           row_number() OVER (PARTITION BY c_mktsegment
                              ORDER BY c_acctbal DESC, c_custkey ASC) AS rn
    FROM customer
    """,
)
def win_row_number(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return c.select("c_custkey", "c_mktsegment", "c_acctbal", F.row_number().over(w).alias("rn"))


@query(
    "win_rank_dense",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
           dense_rank() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
    FROM customer
    """,
)
def win_rank_dense(spark, sf_dir):
    # rank/dense_rank are tie-stable: equal keys get equal ranks, so no
    # tiebreaker needed for deterministic *values* (row order is hashed
    # order-insensitively).
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@query(
    "win_ntile",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           ntile(4) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS quartile
    FROM orders
    """,
)
def win_ntile(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
    return o.select("o_orderkey", "o_totalprice", F.ntile(4).over(w).alias("quartile"))


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts, value,
           lag(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           lead(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def win_lag_lead(spark, sf_dir):
    # ref analog: delta-vs-previous-period metrics [K]
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lag_v = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        lag_v.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - lag_v).alias("delta"),
    )


@query(
    "win_running_sum",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE)
             AS running_spend
    FROM orders
    """,
)
def win_running_sum(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        d2d(F.sum(dec("o_totalprice")).over(w)).alias("running_spend"),
    )


@query(
    "win_moving_avg",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS VARCHAR) AS DOUBLE)
             / COUNT(value) OVER w AS moving_avg_7d
    FROM (SELECT *, CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec FROM events)
    WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
                 RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW)
    """,
)
def win_moving_avg(spark, sf_dir):
    # range frame on epoch seconds — identical convention both engines
    # (SURVEY §2.5 dialect note: range-on-timestamp differs, epoch doesn't).
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.unix_timestamp("ts")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-604800, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        (d2d(F.sum(dec("value")).over(w)) / F.count("value").over(w)).alias(
            "moving_avg_7d"
        ),
    )


@query(
    "win_first_last_value",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           first_value(o_orderkey) OVER w AS cheapest_order,
           last_value(o_orderkey) OVER w AS priciest_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_totalprice ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def win_first_last_value(spark, sf_dir):
    # explicit full frame on both sides — default frames differ for
    # last_value (SURVEY §2.5 note)
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_orderkey").over(w).alias("cheapest_order"),
        F.last("o_orderkey").over(w).alias("priciest_order"),
    )


@query(
    "win_percent_rank_cume",
    oracle="""
    SELECT o_orderkey, o_orderpriority, o_totalprice,
           percent_rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS pct_rank,
           cume_dist() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS cume
    FROM orders
    """,
)
def win_percent_rank_cume(spark, sf_dir):
    # (rank-1)/(n-1) and n_le/n on identical integers → identical doubles.
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@query(
    "win_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_name, p_retailprice
    FROM part
    QUALIFY row_number() OVER (PARTITION BY p_brand
                               ORDER BY p_retailprice DESC, p_partkey ASC) <= 3
    """,
)
def win_topk_per_group(spark, sf_dir):
    # the per-group top-k idiom; at 100 TB prefer pre-aggregated pruning
    # (groupBy max) before the window when k is small vs group size.
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        p.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


@query(
    "win_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id, ts, event_id, value,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
      FROM g
    )
    SELECT user_id, sess_id, COUNT(*) AS n_events,
           min(ts) AS sess_start, max(ts) AS sess_end,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE)
             AS sum_value
    FROM s GROUP BY user_id, sess_id
    """,
)
def win_sessionize(spark, sf_dir):
    """Batch sessionization: the lag + cumulative-sum idiom. A session
    breaks after a 30-minute gap; session ids are the running count of
    breaks. Gap comparison runs on epoch MICROseconds (unix_micros /
    epoch_us) — exact integers on both engines, no sub-second truncation
    drift. One shuffle on user_id serves both windows and the final agg.
    Streaming twin: stream_session_window (same semantics, watermarked)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    sess = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn(
            "sess_id",
            F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    return sess.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("sess_start"),
        F.max("ts").alias("sess_end"),
        d2d(F.sum(dec("value", 4))).alias("sum_value"),
    )


@query(
    "win_pattern_adjacent",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lead(event_type) OVER w AS next_type,
             lead(ts) OVER w AS next_ts
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id, COUNT(*) AS n_click_then_error,
           min(ts) AS first_at
    FROM o
    WHERE event_type = 'click' AND next_type = 'error'
      AND epoch_us(next_ts) - epoch_us(ts) <= 600000000
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def win_pattern_adjacent(spark, sf_dir):
    """Sequence-pattern detection (MATCH_RECOGNIZE-lite): per user, count
    'click immediately followed by error within 10 minutes' — the
    rage-click / error-funnel idiom. One lead() window per user partition
    (single shuffle on user_id, reused by the final agg); the adjacency
    test compares epoch MICROseconds, exact on both engines. Longer
    patterns chain lead(type, k) columns on the same window — same
    one-shuffle shape."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
        F.lead(F.unix_micros("ts")).over(w).alias("next_us"),
    )
    return (
        o.filter(
            (F.col("event_type") == "click")
            & (F.col("next_type") == "error")
            & (F.col("next_us") - F.unix_micros("ts") <= 600_000_000)
        )
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_click_then_error"),
            F.min("ts").alias("first_at"),
        )
        .orderBy("user_id")
    )


@query(
    "win_running_median",
    oracle="""
    SELECT event_id, user_id, ts,
           round(median(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS running_median_7
    FROM events
    """,
)
def win_running_median(spark, sf_dir):
    """Trailing 7-event median per user — the robust-statistics window
    (median absorbs the outliers a moving average is dragged by; the
    baseline behind spike detectors). Spark's exact ``percentile``
    aggregate runs AS a window function over the bounded ROWS frame, so
    the plan is the standard single exchange-and-sort on the user
    partitioning — no self-join, no collect_list gymnastics. Both
    engines interpolate the even-count midpoint identically; the frame
    is bounded (7 rows), so per-row state is O(frame), not O(history).
    ORDER BY carries event_id as the unique tiebreaker — without it two
    same-timestamp events make the frame contents engine-dependent."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias(
            "running_median_7"
        ),
    )
