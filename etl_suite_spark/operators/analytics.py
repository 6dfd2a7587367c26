"""Event/behavioral analytics operators (extends SURVEY.md §2's inventory).

Reference analog: per-period account/miner activity metrics of the
ETL-suite's aggregation jobs (SURVEY §0.1 [K]) — streaks, navigation paths,
conditional KPI rollups, share-of-total contribution.

Scale notes (100 TB discipline):
- Streak detection (gaps & islands) is two window passes over the SAME
  ``user_id`` partitioning — one exchange, reused by both sorts.
- Path transitions are a single lag/lead pass + hash agg on a tiny key
  domain (|event_type|² groups) → map-side partial aggregation collapses
  almost everything before the shuffle.
- Percent-of-total uses a two-level aggregation: the exact per-key decimal
  sums shuffle once; the grand total is a single-row broadcastable window
  over the already-aggregated (small) result, never over the fact table.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..core import d2d, dec, dsum, sql_dsum
from ..io import load_table
from ..registry import query

_EPOCH = "1970-01-01"


@query(
    "win_gaps_islands",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS epoch_day
      FROM events
    ),
    grp AS (
      SELECT user_id, epoch_day,
             epoch_day - row_number() OVER (PARTITION BY user_id
                                            ORDER BY epoch_day) AS island
      FROM days
    )
    SELECT user_id,
           CAST(DATE '1970-01-01' + INTERVAL (MIN(epoch_day)) DAY AS DATE) AS streak_start,
           CAST(DATE '1970-01-01' + INTERVAL (MAX(epoch_day)) DAY AS DATE) AS streak_end,
           COUNT(*) AS streak_days
    FROM grp
    GROUP BY user_id, island
    """,
)
def win_gaps_islands(spark, sf_dir):
    """Consecutive-active-day streaks per user (gaps-and-islands idiom).

    A streak is a maximal run of consecutive calendar days with ≥1 event.
    Classic sessionization-adjacent ETL op (ref: daily account activity
    rollups [K]). Implemented on integer epoch days so the island key
    (``epoch_day - row_number``) is pure int arithmetic — identical on both
    engines, no date-interval dialect drift.
    """
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit(_EPOCH).cast("date")).alias("epoch_day"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("epoch_day")
    grp = days.withColumn("island", F.col("epoch_day") - F.row_number().over(w))
    return (
        grp.groupBy("user_id", "island")
        .agg(
            F.date_add(F.lit(_EPOCH).cast("date"), F.min("epoch_day").cast("int")).alias(
                "streak_start"
            ),
            F.date_add(F.lit(_EPOCH).cast("date"), F.max("epoch_day").cast("int")).alias(
                "streak_end"
            ),
            F.count("*").alias("streak_days"),
        )
        .drop("island")
        .select("user_id", "streak_start", "streak_end", "streak_days")
    )


@query(
    "agg_path_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           COUNT(*) AS n,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY event_type) AS share
    FROM seq
    WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def agg_path_transitions(spark, sf_dir):
    """Event-type transition matrix (first-order Markov counts + shares).

    Ref analog: navigation/behavior path analysis over the event log [K].
    ``share`` divides two identical ints-as-doubles → bit-deterministic.
    One window pass (user partitioning) then a hash agg on ≤|types|² keys;
    at 100 TB the map-side combine reduces the shuffle to a few rows per
    task.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id", "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count("*").alias("n"))
    wt = Window.partitionBy("from_type")
    return counts.withColumn(
        "share", F.col("n").cast("double") / F.sum("n").over(wt)
    )


@query(
    "agg_conditional",
    oracle=f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_large,
           {sql_dsum("o_totalprice")} AS sum_all,
           CAST(CAST(COALESCE(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                 FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS VARCHAR)
               AS DOUBLE) AS sum_urgent,
           bool_or(o_totalprice > 400000)  AS any_jumbo,
           bool_and(o_totalprice > 1000)   AS all_above_1k
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_conditional(spark, sf_dir):
    """Conditional-aggregate family: FILTER-style counts/sums, bool_or/and.

    Ref analog: KPI rollups with embedded business conditions (tier
    labeling thresholds [K]). The filtered sum stays exact-decimal
    (core.py discipline) so partial-aggregate merge order can't perturb it.
    """
    o = load_table(spark, sf_dir, "orders")
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", dec("o_totalprice"))
    return o.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.count_if(F.col("o_totalprice") > 150000).alias("n_large"),
        dsum("o_totalprice").alias("sum_all"),
        d2d(F.coalesce(F.sum(urgent), F.lit(0).cast("decimal(18,2)"))).alias("sum_urgent"),
        F.bool_or(F.col("o_totalprice") > 400000).alias("any_jumbo"),
        F.bool_and(F.col("o_totalprice") > 1000).alias("all_above_1k"),
    )


@query(
    "win_pct_of_total",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      FROM orders
      GROUP BY o_custkey
    )
    SELECT o_custkey,
           CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(CAST(rev_dec AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(rev_dec) OVER () AS VARCHAR) AS DOUBLE) AS pct_of_total
    FROM per_cust
    """,
)
def win_pct_of_total(spark, sf_dir):
    """Share-of-total revenue per customer (contribution analysis).

    Two-level plan: exact decimal sums per key (one shuffle over the fact
    table), then an unpartitioned window over the ALREADY-AGGREGATED rows
    — the grand total never rescans the fact table. The final ratio
    divides two doubles that are bit-identical on both engines (d2d), so
    the quotient is too.
    """
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.sum(dec("o_totalprice")).alias("rev_dec"))
    w = Window.partitionBy()
    return per_cust.select(
        "o_custkey",
        d2d(F.col("rev_dec")).alias("revenue"),
        (d2d(F.col("rev_dec")) / d2d(F.sum("rev_dec").over(w))).alias("pct_of_total"),
    )


@query(
    "agg_time_to_convert",
    oracle="""
    WITH su AS (
      SELECT user_id, MIN(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT e.user_id, su.signup_ts, MIN(e.ts) AS conv_ts
      FROM events e JOIN su ON e.user_id = su.user_id
      WHERE e.event_type = 'purchase' AND e.ts > su.signup_ts
      GROUP BY e.user_id, su.signup_ts
    )
    SELECT user_id, signup_ts, conv_ts,
           CAST(floor(epoch(conv_ts)) - floor(epoch(signup_ts)) AS BIGINT)
             AS delay_sec,
           CASE
             WHEN floor(epoch(conv_ts)) - floor(epoch(signup_ts)) < 3600 THEN '<1h'
             WHEN floor(epoch(conv_ts)) - floor(epoch(signup_ts)) < 86400 THEN '<1d'
             WHEN floor(epoch(conv_ts)) - floor(epoch(signup_ts)) < 604800 THEN '<1w'
             ELSE '1w+'
           END AS delay_bucket
    FROM conv
    """,
)
def agg_time_to_convert(spark, sf_dir):
    """Time-to-convert: first purchase strictly after each user's first
    signup, with the delay bucketed for funnel-latency reporting (the
    distribution marketing actually reads). Two aggregations + one join,
    all keyed on user_id, so one exchange is reused throughout. The
    signup side carries NO broadcast hint (round-7 scale audit: it is
    USER-cardinality — it only looks "small" at fixture scale, the same
    Heaps-trap class as the bigram count tables): the join key equals
    both sides' aggregation key, so the unhinted form co-partitions on
    user_id, and AQE still picks a broadcast at runtime when the signup
    side actually fits. Delay arithmetic uses the bridged epoch forms
    (Spark unix_timestamp ≡ DuckDB floor(epoch)) so second-level
    truncation matches."""
    ev = load_table(spark, sf_dir, "events")
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(su, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("conv_ts"))
    )
    delay = F.unix_timestamp("conv_ts") - F.unix_timestamp("signup_ts")
    return conv.select(
        "user_id",
        "signup_ts",
        "conv_ts",
        delay.cast("long").alias("delay_sec"),
        F.when(delay < 3600, "<1h")
        .when(delay < 86400, "<1d")
        .when(delay < 604800, "<1w")
        .otherwise("1w+")
        .alias("delay_bucket"),
    )


@query(
    "win_interval_coalesce",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id, ts AS s, ts + INTERVAL 5 MINUTE AS e
      FROM events
    ),
    marked AS (
      SELECT user_id, s, e,
             CASE WHEN s > MAX(e) OVER (
                      PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                  OR MAX(e) OVER (
                      PARTITION BY user_id ORDER BY s, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
             THEN 1 ELSE 0 END AS is_new
      FROM iv
    ),
    grouped AS (
      SELECT user_id, s, e,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY s, e
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS grp
      FROM marked
    )
    SELECT user_id, MIN(s) AS span_start, MAX(e) AS span_end,
           COUNT(*) AS n_intervals,
           CAST(floor(epoch(MAX(e))) - floor(epoch(MIN(s))) AS BIGINT)
             AS span_sec
    FROM grouped
    GROUP BY user_id, grp
    """,
)
def win_interval_coalesce(spark, sf_dir):
    """Merge overlapping intervals per user (each event opens a 5-minute
    activity window; touching/overlapping windows coalesce into spans).
    The running-max-end idiom: an interval starts a new span iff its
    start exceeds the max end seen so far; a running sum of those flags
    numbers the spans. Companion to `win_gaps_islands` (day granularity)
    and `win_sessionize` (gap-based): this one is the general
    interval-algebra form — works for any [s, e) intervals, not just
    points. Two window passes + one agg over the SAME user partitioning:
    one exchange total."""
    ev = load_table(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTES")).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.select(
        "user_id",
        "s",
        "e",
        F.when(
            F.col("s") > F.max("e").over(w_prev), 1
        )
        .when(F.max("e").over(w_prev).isNull(), 1)
        .otherwise(0)
        .alias("is_new"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    grouped = marked.withColumn("grp", F.sum("is_new").over(w_run))
    return grouped.groupBy("user_id", "grp").agg(
        F.min("s").alias("span_start"),
        F.max("e").alias("span_end"),
        F.count("*").alias("n_intervals"),
        (F.unix_timestamp(F.max("e")) - F.unix_timestamp(F.min("s")))
        .cast("long")
        .alias("span_sec"),
    ).drop("grp")


@query(
    "ml_churn_label",
    oracle="""
    WITH m AS (SELECT max(ts) AS now_ts FROM events)
    SELECT user_id,
           max(ts) AS last_seen,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           (max(ts) < now_ts - INTERVAL 14 DAY) AS churned
    FROM events, m
    GROUP BY user_id, now_ts
    ORDER BY user_id
    """,
)
def ml_churn_label(spark, sf_dir):
    """Churn-style labeling (the reference's account/miner activity labels,
    SURVEY §0.1 [K]): a user is churned if their last event is more than 14
    days before the corpus end. Plan: one keyed aggregation on user_id; the
    global 'now' is a single-row broadcast joined back — at 100 TB the
    label pass is one shuffle of (user, max_ts, count), nothing else."""
    ev = load_table(spark, sf_dir, "events")
    now = ev.agg(F.max("ts").alias("now_ts"))
    return (
        ev.groupBy("user_id")
        .agg(F.max("ts").alias("last_seen"), F.count("*").alias("n_events"))
        .join(F.broadcast(now))
        .select(
            "user_id",
            "last_seen",
            "n_events",
            (F.col("last_seen") < F.col("now_ts") - F.expr("INTERVAL 14 DAY")).alias(
                "churned"
            ),
        )
        .orderBy("user_id")
    )


@query(
    "win_cumulative_distinct",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(CAST(ts AS DATE)) AS first_day FROM events GROUP BY 1
    ), days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ), per_day AS (
      SELECT day, CAST(COUNT(user_id) AS BIGINT) AS new_users
      FROM days LEFT JOIN firsts ON first_day = day
      GROUP BY day
    )
    SELECT day, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_distinct_users
    FROM per_day ORDER BY day
    """,
)
def win_cumulative_distinct(spark, sf_dir):
    """Cumulative distinct users per day (uniques-to-date — the metric a
    naive COUNT(DISTINCT) OVER cannot express in either engine). Rewritten
    as first-occurrence counting: distinct-to-date == count of users whose
    FIRST day is <= the day, so one per-user min, one per-day count, and a
    tiny running sum over days. At 100 TB this is one shuffle on user_id
    and one on day — the window runs over per-day rows (thousands), never
    per-event rows."""
    ev = load_table(spark, sf_dir, "events")
    # user-cardinality state collapses to DAY cardinality before any join:
    # new_per_day is tiny (one row per day), so the left join that fills
    # zero-new-user days broadcasts day-sized tables only — never the
    # per-user firsts (a user-cardinality broadcast is the pagerank-class
    # OOM at 100 TB).
    firsts = ev.groupBy("user_id").agg(
        F.min(F.col("ts").cast("date")).alias("first_day")
    )
    new_per_day = firsts.groupBy("first_day").agg(
        F.count("*").alias("new_users_nz")
    )
    days = ev.select(F.col("ts").cast("date").alias("day")).distinct()
    per_day = (
        days.join(
            F.broadcast(new_per_day), days["day"] == F.col("first_day"), "left"
        )
        .select("day", F.coalesce("new_users_nz", F.lit(0)).alias("new_users"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per_day.withColumn("cum_distinct_users", F.sum("new_users").over(w))
        .orderBy("day")
    )


@query(
    "ts_gapfill_locf",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             {sql_dsum("value")} AS day_value
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily
      GROUP BY user_id
    ),
    calendar AS (
      SELECT s.user_id, CAST(u.g AS DATE) AS day
      FROM spans s, unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS u(g)
    )
    SELECT c.user_id, c.day,
           COALESCE(d.n_events, 0) AS n_events,
           d.day_value IS NOT NULL AS observed,
           last_value(d.day_value IGNORE NULLS) OVER (
             PARTITION BY c.user_id ORDER BY c.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_locf
    FROM calendar c
    LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
    """,
)
def ts_gapfill_locf(spark, sf_dir):
    """Time-series gap filling — resample each user's event stream onto a
    dense daily calendar and carry the last observation forward (LOCF)
    across the gaps. The hypertable/metrics-rollup primitive: downstream
    joins and window math need a dense grid, raw events are sparse.

    Plan shape for 100 TB:
    - the daily pre-aggregate comes FIRST (one hash agg with map-side
      combine), so the calendar explode runs over per-(user, day) rows,
      never raw events;
    - each user's calendar is generated with ``sequence()`` from its own
      [min, max] span — row growth is bounded by span length, and the
      explode is map-only on the already-aggregated span table;
    - the LOCF is one ``last(value, ignoreNulls)`` window over the SAME
      user partitioning the join just shuffled on, so the sort reuses the
      exchange. Nothing in the plan touches the raw fact table twice."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("n_events"),
        dsum("value").alias("day_value"),
    )
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        calendar.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce("n_events", F.lit(0)).cast("long").alias("n_events"),
            F.col("day_value").isNotNull().alias("observed"),
            F.last("day_value", ignorenulls=True).over(w).alias("value_locf"),
        )
    )


@query(
    "ts_ewma",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             {sql_dsum("value")} AS v
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    s AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             MAX(day) AS last_day,
             list(CAST(v AS DECIMAL(18,6)) ORDER BY day) AS vs
      FROM daily GROUP BY user_id
    )
    SELECT user_id, n_days, last_day,
           CAST(CAST(list_reduce(vs,
                 (acc, x) -> CAST(round(0.3 * x + 0.7 * acc, 6)
                                  AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
             AS ewma
    FROM s
    """,
)
def ts_ewma(spark, sf_dir):
    """Exponentially weighted moving average of each user's daily value
    series (α=0.3, y₁=x₁, yₙ=α·xₙ+(1−α)·yₙ₋₁) — the smoothing
    primitive behind anomaly baselines and trend dashboards. EWMA is a
    RECURSION, not a window sum: no frame-based window function can
    express it, so both engines run the same left fold over each user's
    day-ordered series (Spark ``aggregate``, DuckDB ``list_reduce``),
    with every step rounded to 6 dp so the two engines' double
    arithmetic cannot drift — and the fold itself runs in EXACT DECIMAL
    (α·x is 3 dp, (1−α)·acc is 7 dp, both exact), because a double fold
    measurably diverged: each rounded step lands on a 7-dp value whose
    7th digit is often exactly 5, and binary doubles break that tie
    differently per engine (3 of ~500 users off by 1e-6).

    Plan shape: the daily pre-aggregate (map-side combine) collapses the
    event stream first; the fold then runs over per-user arrays whose
    length is bounded by the DATE SPAN, not the event count — a year of
    data folds ≤365 elements per user regardless of corpus size, all
    inside one groupBy. The closed-form window alternative
    (Σ(1−α)^(n−i)xᵢ via cumulative sums of (1−α)^(−i)xᵢ) was REJECTED:
    (1−α)^(−i) overflows double precision past ~90 elements."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("v")
    )
    s = daily.groupBy("user_id").agg(
        F.count("*").alias("n_days"),
        F.max("day").alias("last_day"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, v))),"
            " p -> CAST(p.v AS DECIMAL(18,6)))"
        ).alias("vs"),
    )
    return s.select(
        "user_id",
        "n_days",
        "last_day",
        d2d(
            F.expr(
                "aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1),"
                " (acc, x) -> CAST(round(0.3 * x + 0.7 * acc, 6)"
                " AS DECIMAL(18,6)))"
            )
        ).alias("ewma"),
    )


_BASKET_CAP = 200  # max distinct items per basket entering pair generation


@query(
    "agg_market_basket",
    oracle=f"""
    WITH bp AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ),
    n AS (SELECT COUNT(DISTINCT o) AS n_orders FROM bp),
    deg AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM bp GROUP BY p),
    capped AS (
      SELECT o FROM bp GROUP BY o HAVING COUNT(*) <= {_BASKET_CAP}
    ),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM bp a JOIN capped k ON a.o = k.o
                JOIN bp b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p HAVING COUNT(*) >= 2
    )
    SELECT part_a, part_b, c_ab,
           round(c_ab * 1.0 / n_orders, 6) AS support,
           round(c_ab * 1.0 / da.c, 6) AS confidence,
           round(c_ab * 1.0 * n_orders / (da.c * db.c), 6) AS lift
    FROM pairs
    JOIN deg da ON da.p = part_a
    JOIN deg db ON db.p = part_b
    CROSS JOIN n
    ORDER BY c_ab DESC, part_a, part_b
    LIMIT 50
    """,
)
def agg_market_basket(spark, sf_dir):
    """Market-basket association mining: pairwise item co-occurrence with
    support / confidence / lift (the Apriori first rung, as one
    declarative plan). The pair join is keyed on the BASKET id, so pair
    generation is Σ k_b·(k_b−1)/2 over baskets — bounded by basket
    width, never corpus-quadratic (the same bounded-fanout argument as
    the gram and co-supply joins). A pathological mega-basket gets the
    standard hot-key cap, IMPLEMENTED (the gram-cap pattern, mirrored in
    the oracle's HAVING): baskets with > 200 distinct items are dropped
    from pair generation, bounding any one basket's fanout at ~19.9 k
    pairs. Measured fixture headroom: max basket width is 17 at sf0.1
    (13 at sf0.01) — ~12× under the cap, so the cap is dead code on
    real fixtures and only fires on adversarial input (planted
    mega-basket pytest). Degrees and the order count stay on the FULL
    basket table, so support/confidence/lift denominators are exact
    regardless of the cap. Metrics are exact integer ratios rounded
    at 6 dp, so the hash is stable; ORDER BY carries (count, a, b) as a
    total tiebreak under LIMIT."""
    bp = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    # no .distinct(): basket_pair_metrics collapses to per-basket DISTINCT
    # item sets via collect_set, so the corpus-wide (o, p) dedup shuffle
    # the oracle's bp CTE describes is subsumed by the basket aggregation
    return basket_pair_metrics(bp)


def basket_pair_metrics(bp: DataFrame) -> DataFrame:
    """support/confidence/lift over (o, p) basket rows; see
    :func:`agg_market_basket` for semantics and the mega-basket cap.

    Restructured r14 (optimization round; results bit-identical): ONE
    basket-keyed aggregation — groupBy(o).collect_set(p), partial-agg
    map-side — replaces the old distinct-(o,p) table that Catalyst
    recomputed in all five consuming branches (n_orders, degrees,
    cap filter, both self-join sides: 5 lineitem scans + 5 distinct
    shuffles, 69-operator plan). The basket table is localCheckpoint-ed
    (tiny: one row per order) and every downstream — order count,
    per-part degrees (explode + count over the already-distinct item
    sets), and pair counts (in-row sorted-array pair expansion, bounded
    by the mega-basket cap, replacing the o-keyed self-join's two
    exchanges) — reads it. Plan (measured, plans/r14/
    agg_market_basket_*.txt): 6 lineitem scans / 11 shuffle exchanges
    -> 1 scan (inside the checkpoint job) / 4 shuffles.
    At 100 TB this is guide §2.4 (share one exchange) + §2.3 (aggregate
    before shuffling: per-basket item sets, never raw line items).

    The order-count denominator rides along as a broadcast single-row
    join (the agg_gini pattern) so query construction stays lazy beyond
    the one checkpoint job.

    Skew bound this shape assumes (ADVICE r14 item 1, documented as the
    accepted trade): collect_set builds the FULL distinct item set per
    basket before the width cap filters it, so a pathological basket
    holds an unbounded in-row array during the aggregation — unlike the
    old count-then-filter shape, which never materialized per-basket
    sets. The bound is the per-KEY distinct-item fanout of one basket
    (order), which the domain caps at basket width (fixture max 17 at
    sf0.1; a retail order with a million distinct SKUs is corrupt
    input, not skew). Spark's ObjectHashAggregate spills per-GROUP sets
    to disk under memory pressure, so the failure mode of a corrupt
    mega-basket is a slow task, not an OOM; a pre-aggregation count
    cap would re-introduce the extra corpus-wide distinct shuffle this
    rewrite removed (measured r14: the 5-branch recompute it replaced)
    to defend against input the cap then drops anyway."""
    baskets = (
        bp.groupBy("o")
        .agg(F.array_sort(F.collect_set("p")).alias("items"))
        .localCheckpoint(eager=True)
    )
    n1 = F.broadcast(baskets.agg(F.count("*").alias("n_orders")))
    deg = (
        baskets.select(F.explode("items").alias("p"))
        .groupBy("p")
        .agg(F.count("*").alias("c"))
    )
    pairs = (
        baskets.filter(F.size("items") <= _BASKET_CAP)
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (x, i) ->"
                    " transform(slice(items, i + 2, size(items)),"
                    " y -> struct(x AS part_a, y AS part_b))))"
                )
            ).alias("pr")
        )
        .groupBy(
            F.col("pr.part_a").alias("part_a"),
            F.col("pr.part_b").alias("part_b"),
        )
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    da = deg.select(F.col("p").alias("part_a"), F.col("c").alias("ca"))
    db = deg.select(F.col("p").alias("part_b"), F.col("c").alias("cb"))
    return (
        pairs.join(da, "part_a")
        .join(db, "part_b")
        .crossJoin(n1)
        .select(
            "part_a",
            "part_b",
            "c_ab",
            F.round(F.col("c_ab") / F.col("n_orders"), 6).alias("support"),
            F.round(F.col("c_ab") / F.col("ca"), 6).alias("confidence"),
            F.round(
                F.col("c_ab") * F.col("n_orders") / (F.col("ca") * F.col("cb")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("c_ab").desc(), "part_a", "part_b")
        .limit(50)
    )


@query(
    "agg_gini",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, {sql_dsum("o_totalprice")} AS rev
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT rev,
             row_number() OVER (ORDER BY rev, o_custkey) AS i,
             COUNT(*) OVER () AS n,
             CAST(CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER () AS VARCHAR)
                  AS DOUBLE) AS total
      FROM per_cust
    )
    SELECT CAST(MAX(n) AS BIGINT) AS n_customers,
           round(MAX(total), 2) AS total_revenue,
           round(2.0 * SUM(i * rev) / (MAX(n) * MAX(total))
                 - (MAX(n) + 1.0) / MAX(n), 6) AS gini
    FROM ranked
    """,
)
def agg_gini(spark, sf_dir):
    """Gini coefficient of per-customer revenue — the standard
    concentration/inequality metric (whale-dependence in revenue terms),
    via the rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over the sorted
    series. One keyed aggregate collapses the fact table to per-customer
    rows FIRST; the global sort that the rank needs then runs over the
    customer-cardinality relation, not the fact table — a global
    row_number is exactly the thing you never do on raw 100 TB facts and
    exactly fine on the aggregated key domain. Ties are broken by
    customer id so ranks (and hence the sum) are total-order stable."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("rev"))
    w = Window.orderBy("rev", "o_custkey")
    ranked = per_cust.select(
        "rev",
        F.row_number().over(w).alias("i"),
        F.count("*").over(Window.partitionBy()).alias("n"),
        d2d(F.sum(dec("rev", 2)).over(Window.partitionBy())).alias("total"),
    )
    return ranked.agg(
        F.max("n").cast("long").alias("n_customers"),
        F.round(F.max("total"), 2).alias("total_revenue"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("rev")) / (F.max("n") * F.max("total"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


@query(
    "win_ohlc",
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           round(arg_min(value, CAST(epoch_us(ts) AS HUGEINT) * 1000000000
                                 + event_id), 6) AS open,
           round(MAX(value), 6) AS high,
           round(MIN(value), 6) AS low,
           round(arg_max(value, CAST(epoch_us(ts) AS HUGEINT) * 1000000000
                                 + event_id), 6) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
)
def win_ohlc(spark, sf_dir):
    """Per-day OHLC (open/high/low/close) bars over the event stream —
    the canonical financial/metrics downsample. Open and close are
    argmin/argmax over the (ts, event_id) total order, expressed as MIN/
    MAX over a struct whose leading fields are the order key (DuckDB's
    arg_min can't key on a struct, so its twin uses the equivalent
    HUGEINT composite key epoch_us·10⁹ + event_id) — a single
    hash aggregate with map-side partial combine (min of struct merges
    associatively), NOT a window: no per-day sort, no row_number, one
    shuffle on the day key. The event_id tiebreaker makes same-timestamp
    opens/closes deterministic on both engines."""
    ev = load_table(spark, sf_dir, "events")
    first = F.min(F.struct("ts", "event_id", "value"))["value"]
    last = F.max(F.struct("ts", "event_id", "value"))["value"]
    return ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.round(first, 6).alias("open"),
        F.round(F.max("value"), 6).alias("high"),
        F.round(F.min("value"), 6).alias("low"),
        F.round(last, 6).alias("close"),
        F.count("*").alias("n_events"),
    )


@query(
    "win_pareto_abc",
    oracle=f"""
    WITH per_cust AS (
      SELECT o_custkey, {sql_dsum("o_totalprice")} AS rev
      FROM orders GROUP BY o_custkey
    ), ranked AS (
      SELECT o_custkey, rev,
             CAST(CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER (
               ORDER BY rev DESC, o_custkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS VARCHAR) AS DOUBLE) AS cum_rev,
             CAST(CAST(SUM(CAST(rev AS DECIMAL(18,2))) OVER ()
               AS VARCHAR) AS DOUBLE) AS total
      FROM per_cust
    )
    SELECT CASE WHEN cum_rev / total <= 0.8 THEN 'A'
                WHEN cum_rev / total <= 0.95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           round(SUM(rev), 2) AS class_revenue,
           round(SUM(rev) / MAX(total), 6) AS revenue_share
    FROM ranked
    GROUP BY 1 ORDER BY 1
    """,
)
def win_pareto_abc(spark, sf_dir):
    """ABC / Pareto classification — bucket customers by cumulative
    revenue share (A: first 80%, B: next 15%, C: tail), the standard
    80/20 concentration cut. Like agg_gini, the global cumulative window
    runs over the ALREADY-AGGREGATED customer relation, never raw facts;
    the running sum uses exact decimals so the class boundary (a
    comparison on the cumulative value) cannot flap with merge order —
    a float running sum here would make boundary customers flip class
    between runs. Ties broken by customer id: total order, stable cut."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(dsum("o_totalprice").alias("rev"))
    w = (
        Window.orderBy(F.col("rev").desc(), "o_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy()
    ranked = per_cust.select(
        "rev",
        d2d(F.sum(dec("rev", 2)).over(w)).alias("cum_rev"),
        d2d(F.sum(dec("rev", 2)).over(wt)).alias("total"),
    )
    share = F.col("cum_rev") / F.col("total")
    abc = (
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C")
    )
    return (
        ranked.groupBy(abc.alias("abc_class"))
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("rev"), 2).alias("class_revenue"),
            F.round(F.sum("rev") / F.max("total"), 6).alias("revenue_share"),
        )
        .orderBy("abc_class")
    )


@query(
    "win_anomaly_mad",
    oracle="""
    WITH med AS (
      SELECT user_id, median(value) AS med FROM events GROUP BY user_id
    ), mad AS (
      SELECT e.user_id, med,
             median(abs(e.value - med)) AS mad
      FROM events e JOIN med ON e.user_id = med.user_id
      GROUP BY e.user_id, med
    )
    SELECT e.event_id, e.user_id, round(e.value, 6) AS value,
           round(m.med, 6) AS user_median,
           round(m.mad, 6) AS user_mad,
           abs(e.value - m.med) > 3 * 1.4826 * m.mad AS is_anomaly
    FROM events e JOIN mad m ON e.user_id = m.user_id
    """,
)
def win_anomaly_mad(spark, sf_dir):
    """Robust anomaly flags via Median Absolute Deviation: an event is
    anomalous when it sits more than 3 robust standard deviations
    (1.4826·MAD ≈ σ for a normal) from its user's median. The robust
    pair (median, MAD) is immune to the very outliers it hunts — the
    reason ops teams use it over mean/stddev z-scores.

    MAD is a median OF residuals AGAINST a median, so it is inherently
    two passes: per-user exact percentile aggregate, broadcast-join the
    medians back, second percentile over the residuals, then a map-only
    flag join. All three joins are keyed on user_id — at 100 TB that's
    one shuffle reused (AQE co-partitions the chain), and the per-user
    aggregates are tiny against the fact table. Both engines compute the
    exact interpolated median, rounded at 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    mad = (
        ev.join(med, "user_id")
        .groupBy("user_id", "med")
        .agg(F.expr("percentile(abs(value - med), 0.5)").alias("mad"))
    )
    return ev.join(mad, "user_id").select(
        "event_id",
        "user_id",
        F.round("value", 6).alias("value"),
        F.round("med", 6).alias("user_median"),
        F.round("mad", 6).alias("user_mad"),
        (F.abs(F.col("value") - F.col("med")) > 3 * 1.4826 * F.col("mad")).alias(
            "is_anomaly"
        ),
    )


@query(
    "agg_trend_corr",
    oracle="""
    WITH s AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(floor(epoch(ts)) AS BIGINT) - 1704067200) AS sx,
             SUM(CAST(round(value * 10000) AS BIGINT)) AS sy,
             SUM((CAST(floor(epoch(ts)) AS BIGINT) - 1704067200)
                 * CAST(round(value * 10000) AS BIGINT)) AS sxy,
             SUM((CAST(floor(epoch(ts)) AS BIGINT) - 1704067200)
                 * (CAST(floor(epoch(ts)) AS BIGINT) - 1704067200)) AS sxx,
             SUM(CAST(round(value * 10000) AS BIGINT)
                 * CAST(round(value * 10000) AS BIGINT)) AS syy
      FROM events GROUP BY user_id
    )
    SELECT user_id, n,
           round((n * sxy - sx * sy) /
                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6) AS trend_corr,
           round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE)
                 / 10000 * 86400, 6) AS slope_per_day
    FROM s
    WHERE n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def agg_trend_corr(spark, sf_dir):
    """Per-user activity trend: Pearson correlation of (time, value) and
    the least-squares slope (value units per day) — the 'is this account
    trending up' metric. All five power sums accumulate as EXACT 64-bit
    integers (x = epoch seconds re-based to 2024-01-01 so x·y products
    stay ≤ ~2⁵⁰ · count; y = value at 4 dp fixed point), so the per-user
    sums are merge-order-independent and the final corr/slope — computed
    in double FROM exact integers — is bit-identical on both engines.
    A naive float corr aggregate would drift in the last ulp with
    partitioning (same rationale as agg_higher_moments). One hash
    aggregate with map-side combine; nothing else."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.floor(F.unix_timestamp("ts"))).cast("long") - 1704067200
    y = F.round(F.col("value") * 10000, 0).cast("long")
    s = ev.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return (
        s.filter((F.col("n") >= 3) & (var_x > 0) & (var_y > 0))
        .select(
            "user_id",
            "n",
            F.round(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 6).alias("trend_corr"),
            F.round(cov_n / var_x / 10000 * 86400, 6).alias("slope_per_day"),
        )
    )


@query(
    "ts_gapfill_interpolate",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             {sql_dsum("value")} AS day_value
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ),
    spans AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily
      GROUP BY user_id
    ),
    calendar AS (
      SELECT s.user_id, CAST(u.g AS DATE) AS day
      FROM spans s, unnest(generate_series(s.d0, s.d1, INTERVAL 1 DAY)) AS u(g)
    ),
    g AS (
      SELECT c.user_id, c.day, d.day_value,
             last_value(d.day IGNORE NULLS) OVER wb AS prev_day,
             last_value(d.day_value IGNORE NULLS) OVER wb AS prev_val,
             first_value(d.day IGNORE NULLS) OVER wf AS next_day,
             first_value(d.day_value IGNORE NULLS) OVER wf AS next_val
      FROM calendar c
      LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
      WINDOW wb AS (PARTITION BY c.user_id ORDER BY c.day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             wf AS (PARTITION BY c.user_id ORDER BY c.day
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, day,
           day_value IS NOT NULL AS observed,
           round(CASE
             WHEN day_value IS NOT NULL THEN CAST(day_value AS DOUBLE)
             ELSE CAST(prev_val AS DOUBLE)
                  + (CAST(next_val AS DOUBLE) - CAST(prev_val AS DOUBLE))
                    * date_diff('day', prev_day, day)
                    / date_diff('day', prev_day, next_day)
           END, 6) AS value_interp
    FROM g
    """,
)
def ts_gapfill_interpolate(spark, sf_dir):
    """Linear-interpolation gap fill — the other resample policy next to
    LOCF (ts_gapfill_locf): a missing day takes the value on the straight
    line between its nearest observed neighbors, prev + (next−prev)·
    (d−prev_day)/(next_day−prev_day). The first/last grid days are
    observed by construction (the calendar spans [min, max]), so every
    gap is interior and both neighbors exist — no extrapolation branch.

    Plan: identical skeleton to LOCF (pre-aggregate → bounded calendar
    explode → one left join), plus ONE extra window direction: the
    backward fill and forward fill are two frames over the SAME user
    partitioning and sort, so Catalyst plans one exchange + one sort for
    both. The interpolation weights are exact integer day differences;
    arithmetic is double over exact-decimal endpoints, rounded at 6 dp."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(dsum("value").alias("day_value"))
    spans = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    calendar = spans.select(
        "user_id",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    base = Window.partitionBy("user_id").orderBy("day")
    wb = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_day = F.when(F.col("day_value").isNotNull(), F.col("day"))
    g = (
        calendar.join(daily, ["user_id", "day"], "left")
        .withColumn("prev_day", F.last(obs_day, ignorenulls=True).over(wb))
        .withColumn("prev_val", F.last("day_value", ignorenulls=True).over(wb))
        .withColumn("next_day", F.first(obs_day, ignorenulls=True).over(wf))
        .withColumn("next_val", F.first("day_value", ignorenulls=True).over(wf))
    )
    interp = F.col("prev_val").cast("double") + (
        F.col("next_val").cast("double") - F.col("prev_val").cast("double")
    ) * F.datediff("day", "prev_day") / F.datediff("next_day", "prev_day")
    return g.select(
        "user_id",
        "day",
        F.col("day_value").isNotNull().alias("observed"),
        F.round(
            F.when(
                F.col("day_value").isNotNull(), F.col("day_value").cast("double")
            ).otherwise(interp),
            6,
        ).alias("value_interp"),
    )


@query(
    "agg_cohort_ltv",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
      FROM events GROUP BY user_id
    ), wk AS (
      SELECT f.cohort,
             CAST(date_diff('day', f.cohort,
                  CAST(date_trunc('week', e.ts) AS DATE)) / 7 AS BIGINT) AS wk,
             SUM(CAST(round(e.value, 2) AS DECIMAL(18,2))) AS rev
      FROM events e JOIN f ON e.user_id = f.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2
    )
    SELECT cohort, wk,
           CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS week_revenue,
           CAST(CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY wk)
                AS VARCHAR) AS DOUBLE) AS cumulative_ltv
    FROM wk
    """,
)
def agg_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value curves — the revenue sibling of the
    retention matrix: purchase revenue per (first-seen-week cohort, week
    offset), plus the running cumulative LTV along each cohort's row.
    The week offset divides an exact day difference of Monday-truncated
    dates (engine-proof, same bridge as agg_retention_cohort); revenue
    accumulates as exact decimals end-to-end INCLUDING the cumulative
    window, so the curve is merge-order-independent. Plan: one user_id
    co-partitioned join (first-seen ⋈ purchases), a tiny (cohort, wk)
    aggregate, and the cumulative window over that already-small grid."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort")
    )
    wk = (
        ev.filter(F.col("event_type") == "purchase")
        .join(f, "user_id")
        .groupBy(
            "cohort",
            (
                F.datediff(
                    F.to_date(F.date_trunc("week", F.col("ts"))), F.col("cohort")
                )
                / 7
            )
            .cast("long")
            .alias("wk"),
        )
        .agg(F.sum(dec("value", 2)).alias("rev"))
    )
    w = Window.partitionBy("cohort").orderBy("wk")
    return wk.select(
        "cohort",
        "wk",
        d2d(F.col("rev")).alias("week_revenue"),
        d2d(F.sum("rev").over(w)).alias("cumulative_ltv"),
    )


@query(
    "win_zscore_rolling",
    oracle="""
    WITH q AS (
      SELECT event_id, user_id, ts,
             CAST(round(value * 10000) AS BIGINT) AS y
      FROM events
    ), s AS (
      SELECT event_id, user_id, ts, y,
             COUNT(*) OVER w AS n,
             SUM(y) OVER w AS sy,
             SUM(y * y) OVER w AS syy
      FROM q
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, ts,
           CAST(n AS BIGINT) AS n_window,
           round(CASE WHEN n >= 5 AND n * syy - sy * sy > 0
                 THEN (n * y - sy)
                      / sqrt(CAST(n AS DOUBLE) * (n * syy - sy * sy) / (n - 1))
                 END, 6) AS zscore,
           CASE WHEN n >= 5 AND n * syy - sy * sy > 0
                THEN abs((n * y - sy)
                     / sqrt(CAST(n AS DOUBLE) * (n * syy - sy * sy) / (n - 1)))
                     > 2 END AS is_outlier
    FROM s
    """,
)
def win_zscore_rolling(spark, sf_dir):
    """Rolling z-score over each user's trailing 30 events — the
    streaming-friendly outlier detector (MAD's cheap cousin: one pass,
    associative state). The frame statistics are EXACT integer power
    sums (value at 4 dp fixed point; Σy and Σy² as BIGINT window sums),
    and z = (n·y − Σy)/√(n·(nΣy²−(Σy)²)/(n−1)) is computed in double
    FROM those exact integers — so, like agg_trend_corr and
    agg_higher_moments, the result cannot drift with partitioning or
    engine. Windows shorter than 5 or with zero variance emit NULL
    rather than a garbage z. One exchange + sort on user_id; the frame
    is ROWS-bounded so state is O(30) per partition cursor."""
    ev = load_table(spark, sf_dir, "events")
    y = F.round(F.col("value") * 10000, 0).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-29, Window.currentRow)
    )
    q = ev.select("event_id", "user_id", "ts", y.alias("y"))
    s = q.select(
        "event_id",
        "user_id",
        "ts",
        "y",
        F.count("*").over(w).alias("n"),
        F.sum("y").over(w).alias("sy"),
        F.sum(F.col("y") * F.col("y")).over(w).alias("syy"),
    )
    var_num = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    ok = (F.col("n") >= 5) & (var_num > 0)
    z = (F.col("n") * F.col("y") - F.col("sy")) / F.sqrt(
        F.col("n").cast("double") * var_num / (F.col("n") - 1)
    )
    return s.select(
        "event_id",
        "user_id",
        "ts",
        F.col("n").alias("n_window"),
        F.round(F.when(ok, z), 6).alias("zscore"),
        F.when(ok, F.abs(z) > 2).alias("is_outlier"),
    )


@query(
    "agg_autocorr_lag1",
    oracle="""
    WITH q AS (
      SELECT user_id, ts, event_id,
             CAST(round(value * 10000) AS BIGINT) AS y,
             lead(CAST(round(value * 10000) AS BIGINT)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS y1
      FROM events
    ), s AS (
      SELECT user_id,
             CAST(COUNT(y1) AS BIGINT) AS n,
             SUM(y) FILTER (WHERE y1 IS NOT NULL) AS sx,
             SUM(y1) AS sy,
             SUM(y * y1) AS sxy,
             SUM(y * y) FILTER (WHERE y1 IS NOT NULL) AS sxx,
             SUM(y1 * y1) AS syy
      FROM q GROUP BY user_id
    )
    SELECT user_id, n,
           round((n * sxy - sx * sy) /
                 (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
             AS autocorr_lag1
    FROM s
    WHERE n >= 3 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
    """,
)
def agg_autocorr_lag1(spark, sf_dir):
    """Lag-1 autocorrelation of each user's value sequence — the
    stickiness/seasonality signal (near 0 ⇒ independent draws, positive
    ⇒ momentum, negative ⇒ alternation). Pearson over the (yᵢ, yᵢ₊₁)
    pairs built with one lead() window, then the SAME exact-integer
    power-sum discipline as agg_trend_corr: all six sums accumulate as
    BIGINT over 4-dp fixed-point values, correlation finishes in double
    from exact integers — merge-order-proof on both engines. One window
    pass + one hash aggregate, both keyed on user_id, one exchange."""
    ev = load_table(spark, sf_dir, "events")
    y = F.round(F.col("value") * 10000, 0).cast("long")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    q = ev.select(
        "user_id", "ts", "event_id", y.alias("y")
    ).withColumn("y1", F.lead("y").over(w))
    has = F.col("y1").isNotNull()
    s = q.groupBy("user_id").agg(
        F.count("y1").alias("n"),
        F.sum(F.when(has, F.col("y"))).alias("sx"),
        F.sum("y1").alias("sy"),
        F.sum(F.col("y") * F.col("y1")).alias("sxy"),
        F.sum(F.when(has, F.col("y") * F.col("y"))).alias("sxx"),
        F.sum(F.col("y1") * F.col("y1")).alias("syy"),
    )
    var_x = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    var_y = (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    cov_n = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    return (
        s.filter((F.col("n") >= 3) & (var_x > 0) & (var_y > 0))
        .select(
            "user_id",
            "n",
            F.round(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 6).alias(
                "autocorr_lag1"
            ),
        )
    )


@query(
    "win_rank_change",
    oracle="""
    WITH wk AS (
      SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
             o_orderpriority AS item,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1, 2
    ), r AS (
      SELECT week, item,
             CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
             CAST(rank() OVER (PARTITION BY week
                               ORDER BY rev DESC, item) AS BIGINT) AS rnk
      FROM wk
    )
    SELECT week, item, revenue, rnk,
           CAST(lag(rnk) OVER (PARTITION BY item ORDER BY week) - rnk
                AS BIGINT) AS rank_change
    FROM r
    """,
)
def win_rank_change(spark, sf_dir):
    """Week-over-week leaderboard movement: rank items (order priority
    classes) by weekly revenue, then each item's rank delta vs its
    previous week (positive = climbed). Two window families over two
    DIFFERENT partitionings — rank within week, lag within item — which
    is the canonical two-exchange window chain: Catalyst sorts once per
    partitioning and the tiny (week × item) grid between them makes both
    exchanges negligible next to the one real aggregation over orders.
    Revenue ranks on the exact decimal (a float rank can swap adjacent
    items between engines); ties break by item for a total order."""
    o = load_table(spark, sf_dir, "orders")
    wk = o.groupBy(
        F.to_date(F.date_trunc("week", "o_orderdate")).alias("week"),
        F.col("o_orderpriority").alias("item"),
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    wr = Window.partitionBy("week").orderBy(F.col("rev").desc(), "item")
    r = wk.select(
        "week",
        "item",
        d2d(F.col("rev")).alias("revenue"),
        F.rank().over(wr).cast("long").alias("rnk"),
    )
    wl = Window.partitionBy("item").orderBy("week")
    return r.select(
        "week",
        "item",
        "revenue",
        "rnk",
        (F.lag("rnk").over(wl) - F.col("rnk")).cast("long").alias("rank_change"),
    )


@query(
    "agg_new_vs_returning",
    oracle="""
    WITH f AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS first_week
      FROM events GROUP BY user_id
    ), act AS (
      SELECT DISTINCT e.user_id,
             CAST(date_trunc('week', e.ts) AS DATE) AS week, f.first_week
      FROM events e JOIN f ON e.user_id = f.user_id
    )
    SELECT week,
           CAST(COUNT(*) FILTER (WHERE week = first_week) AS BIGINT) AS new_users,
           CAST(COUNT(*) FILTER (WHERE week > first_week) AS BIGINT)
             AS returning_users,
           round(COUNT(*) FILTER (WHERE week > first_week) * 1.0
                 / COUNT(*), 6) AS returning_share
    FROM act GROUP BY week
    """,
)
def agg_new_vs_returning(spark, sf_dir):
    """Weekly new-vs-returning actives — the growth-accounting split on
    every product dashboard (and the aggregate view of the retention
    matrix: a week's returning count is its column sum). One first-seen
    aggregate, one user_id co-partitioned join, one distinct per
    (user, week), and conditional counts on a week-sized grid. The week
    comparison is between two Monday-truncated dates — no datediff
    boundary rules to bridge."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("first_week")
    )
    act = (
        ev.join(f, "user_id")
        .select(
            "user_id",
            F.to_date(F.date_trunc("week", "ts")).alias("week"),
            "first_week",
        )
        .distinct()
    )
    new_c = F.count(F.when(F.col("week") == F.col("first_week"), 1))
    ret_c = F.count(F.when(F.col("week") > F.col("first_week"), 1))
    return act.groupBy("week").agg(
        new_c.cast("long").alias("new_users"),
        ret_c.cast("long").alias("returning_users"),
        F.round(ret_c / F.count("*"), 6).alias("returning_share"),
    )


@query(
    "agg_interevent_gaps",
    oracle="""
    WITH g AS (
      SELECT event_type,
             CAST(epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id, event_type
               ORDER BY ts, event_id)) AS BIGINT) AS gap_us
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(gap_us) AS BIGINT) AS n_gaps,
           CAST(SUM(gap_us) // COUNT(gap_us) AS BIGINT) AS mean_gap_us,
           CAST(floor(median(gap_us)) AS BIGINT) AS median_gap_us,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type ORDER BY event_type
    """,
)
def agg_interevent_gaps(spark, sf_dir):
    """Inter-event time distribution per event type — the cadence profile
    behind session-timeout tuning (win_sessionize's 30-minute gap) and
    watermark sizing (the streaming ops' 10-minute bound): you pick those
    constants FROM this distribution. Gaps are exact integer microsecond
    differences via one lag() per (user, type) partition; mean is exact
    integer division, median is the exact interpolated percentile
    EXPLICITLY floored to a BIGINT on both engines — the floor matters:
    Spark's double→long cast truncates while DuckDB's rounds half-even,
    and with an even gap count the interpolated median lands on .5 (the
    sf0.1 sweep caught the two engines one microsecond apart on two
    event types; gaps are positive so truncate == floor). Every output
    is an integer, so nothing else can drift. One window exchange + one
    small hash aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    g = ev.select(
        "event_type",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    return (
        g.groupBy("event_type")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.expr("sum(gap_us) div count(gap_us)").alias("mean_gap_us"),
            F.expr("CAST(floor(percentile(gap_us, 0.5)) AS LONG)").alias(
                "median_gap_us"
            ),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("event_type")
    )


@query(
    "agg_dau_wau_stickiness",
    oracle="""
    WITH du AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), days AS (SELECT DISTINCT day FROM du),
    dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM du GROUP BY day),
    wau AS (
      SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
      FROM days d JOIN du u
        ON u.day BETWEEN d.day - INTERVAL 6 DAY AND d.day
      GROUP BY d.day
    )
    SELECT dau.day, dau.dau, wau.wau,
           round(dau.dau * 1.0 / wau.wau, 6) AS stickiness
    FROM dau JOIN wau ON dau.day = wau.day
    """,
)
def agg_dau_wau_stickiness(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    ratio on every product dashboard, and the canonical "distinct count
    over a sliding window" problem (a plain window function can't do
    COUNT(DISTINCT) over a frame).

    Scale shape: one distinct on (day, user) collapses the fact table
    first; the trailing window is then a θ-join of that slim relation
    against the BROADCAST day grid (days are bounded — a year is 365
    rows), fanning each (day, user) row out at most 7× — bounded fanout,
    never row×row. The per-day COUNT(DISTINCT user) shuffles on day with
    Spark's two-phase distinct aggregation (partial dedup map-side), so
    a hot day never ships duplicate users. At 100 TB this exact plan
    holds: the only growing side stays keyed and the grid stays
    broadcast-tiny."""
    ev = load_table(spark, sf_dir, "events")
    du = ev.select(F.to_date("ts").alias("day"), "user_id").distinct()
    return dau_wau_stickiness(du)


def dau_wau_stickiness(du: DataFrame) -> DataFrame:
    """(day, user_id) distinct-active rows → per-day DAU/WAU/stickiness;
    see :func:`agg_dau_wau_stickiness` for the plan-shape notes."""
    days = du.select("day").distinct()
    dau = du.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    wau = (
        du.alias("u")
        .join(
            F.broadcast(days.alias("d")),
            (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(F.countDistinct("user_id").cast("long").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
    )


@query(
    "agg_activity_heatmap",
    oracle="""
    SELECT isodow(ts) AS dow, CAST(hour(ts) AS BIGINT) AS hour,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE)
             / COUNT(value) AS avg_value
    FROM events GROUP BY 1, 2
    """,
)
def agg_activity_heatmap(spark, sf_dir):
    """Day-of-week × hour activity heatmap — the traffic-shape dashboard
    every events pipeline renders (capacity planning, anomaly context,
    send-time optimization). ISO day numbering (1 = Monday) on BOTH
    engines, made explicit because the default dayofweek() conventions
    differ (Spark 1 = Sunday, DuckDB 0 = Sunday — exactly the silent
    cross-engine drift the oracle discipline exists to catch). The mean
    uses the exact-decimal discipline (decimal sum → string → double ÷
    count) so partial-aggregate merge order can't flap the hash. One
    168-key groupBy with map-side combine: scale-trivial, skew-free."""
    from ..core import davg

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select(
            F.expr("extract(DAYOFWEEK_ISO FROM ts)").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
            "user_id",
            "value",
        )
        .groupBy("dow", "hour")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            davg("value", scale=6).alias("avg_value"),
        )
    )


@query(
    "agg_rfm_segmentation",
    oracle="""
    WITH mx AS (SELECT MAX(o_orderdate) AS corpus_max FROM orders),
    per AS (
      SELECT o_custkey,
             CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
                            CAST(corpus_max AS DATE)) AS BIGINT) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS monetary
      FROM orders CROSS JOIN mx GROUP BY o_custkey, corpus_max
    ), scored AS (
      SELECT o_custkey, recency_days, frequency, monetary,
             CAST(ntile(5) OVER (ORDER BY recency_days ASC, o_custkey ASC)
                  AS BIGINT) AS r_score,
             CAST(ntile(5) OVER (ORDER BY frequency DESC, o_custkey ASC)
                  AS BIGINT) AS f_score,
             CAST(ntile(5) OVER (ORDER BY monetary DESC, o_custkey ASC)
                  AS BIGINT) AS m_score
      FROM per
    )
    SELECT o_custkey, recency_days, frequency, monetary,
           r_score, f_score, m_score,
           r_score || '-' || f_score || '-' || m_score AS segment
    FROM scored
    """,
)
def agg_rfm_segmentation(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation — the
    marketing-analytics staple: per customer, days since last order
    (vs the corpus max date so the result is data-determined, not
    wall-clock), order count, and exact-decimal total spend, each scored
    into quintiles (ntile(5) with an explicit custkey tiebreak so equal
    values can't flap across engines; score 1 = best by convention:
    most recent / most frequent / highest spend first).

    Scale shape: one groupBy(custkey) collapses the fact table; the
    three ntiles are global sorts over the CUSTOMER domain — the
    agg_gini precedent (never sort raw facts; sorting the aggregated
    key domain is exactly fine). The corpus max date rides along as a
    broadcast single-row join."""
    o = load_table(spark, sf_dir, "orders")
    mx = F.broadcast(o.agg(F.max("o_orderdate").alias("corpus_max")))
    per = (
        o.crossJoin(mx)
        .groupBy("o_custkey")
        .agg(
            F.datediff(
                F.to_date(F.max("corpus_max")), F.to_date(F.max("o_orderdate"))
            )
            .cast("long")
            .alias("recency_days"),
            F.count("*").alias("frequency"),
            d2d(F.sum(dec("o_totalprice", 2))).alias("monetary"),
        )
    )
    r_w = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())
    f_w = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc())
    m_w = Window.orderBy(F.col("monetary").desc(), F.col("o_custkey").asc())
    scored = per.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(5).over(r_w).cast("long").alias("r_score"),
        F.ntile(5).over(f_w).cast("long").alias("f_score"),
        F.ntile(5).over(m_w).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat_ws("-", "r_score", "f_score", "m_score"),
    )


@query(
    "agg_ab_test",
    oracle="""
    WITH u AS (
      SELECT user_id,
             CASE WHEN (user_id * 2654435761) % 1000000 < 500000
                  THEN 'A' ELSE 'B' END AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      FROM events GROUP BY user_id
    ), per AS (
      SELECT
        CAST(SUM(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS users_a,
        CAST(SUM(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS users_b,
        CAST(SUM(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS BIGINT) AS conv_a,
        CAST(SUM(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS BIGINT) AS conv_b
      FROM u
    )
    SELECT users_a, users_b, conv_a, conv_b,
           round(CAST(conv_a AS DOUBLE) / users_a, 6) AS rate_a,
           round(CAST(conv_b AS DOUBLE) / users_b, 6) AS rate_b,
           round(CAST(conv_a AS DOUBLE) / users_a
                 - CAST(conv_b AS DOUBLE) / users_b, 6) AS abs_lift,
           round((CAST(conv_a AS DOUBLE) / users_a
                  - CAST(conv_b AS DOUBLE) / users_b)
                 / sqrt((CAST(conv_a + conv_b AS DOUBLE) / (users_a + users_b))
                        * (1 - CAST(conv_a + conv_b AS DOUBLE) / (users_a + users_b))
                        * (1.0 / users_a + 1.0 / users_b)), 6) AS z_score
    FROM per
    """,
)
def agg_ab_test(spark, sf_dir):
    """Two-variant experiment readout — the product-analytics staple:
    deterministic 50/50 user split (Knuth multiplicative hash on user_id,
    the repo's standard reproducible-uniform: a rerun or a backfill
    re-derives the SAME assignment, which a random() split cannot),
    conversion = user ever fired a purchase event, and the two-proportion
    pooled z-score for significance.

    Scale shape: one groupBy(user_id) collapses the fact table (map-side
    partial MAX), then a single conditional aggregate over the user table
    folds both variants in ONE pass — no per-variant rescans, no join.
    The z-score is scalar double math over four exact integers, rounded
    to 6 dp on both engines. At 100 TB nothing here exceeds one shuffle
    on user_id."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "conv"
        )
    )
    u = u.withColumn(
        "variant",
        F.when((F.col("user_id") * 2654435761) % 1000000 < 500000, "A").otherwise(
            "B"
        ),
    )
    per = u.agg(
        F.sum(F.when(F.col("variant") == "A", 1).otherwise(0))
        .cast("long")
        .alias("users_a"),
        F.sum(F.when(F.col("variant") == "B", 1).otherwise(0))
        .cast("long")
        .alias("users_b"),
        F.sum(F.when(F.col("variant") == "A", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_a"),
        F.sum(F.when(F.col("variant") == "B", F.col("conv")).otherwise(0))
        .cast("long")
        .alias("conv_b"),
    )
    rate_a = F.col("conv_a").cast("double") / F.col("users_a")
    rate_b = F.col("conv_b").cast("double") / F.col("users_b")
    pooled = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("users_a") + F.col("users_b")
    )
    z = (rate_a - rate_b) / F.sqrt(
        pooled
        * (1 - pooled)
        * (1.0 / F.col("users_a") + 1.0 / F.col("users_b"))
    )
    return per.select(
        "users_a",
        "users_b",
        "conv_a",
        "conv_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(rate_a - rate_b, 6).alias("abs_lift"),
        F.round(z, 6).alias("z_score"),
    )


@query(
    "agg_survival_km",
    oracle="""
    WITH per0 AS (
      SELECT user_id,
             MIN(CAST(ts AS DATE)) AS first_day,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS DATE) END) AS purchase_day,
             MAX(CAST(ts AS DATE)) AS last_day
      FROM events GROUP BY user_id
    ), per AS (
      SELECT CASE WHEN purchase_day IS NOT NULL
                  THEN date_diff('day', first_day, purchase_day)
                  ELSE date_diff('day', first_day, last_day)
             END AS duration_days,
             CASE WHEN purchase_day IS NOT NULL THEN 1 ELSE 0 END AS observed
      FROM per0
    ), grp AS (
      SELECT duration_days,
             COUNT(*) AS n_all,
             SUM(observed) AS d
      FROM per GROUP BY duration_days
    ), risk AS (
      SELECT duration_days, n_all, d,
             (SELECT COUNT(*) FROM per)
               - COALESCE(SUM(n_all) OVER (ORDER BY duration_days
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM grp
    ), curve AS (
      SELECT duration_days, n_risk, d,
             CASE WHEN d = n_risk THEN 0.0
                  ELSE exp(SUM(CASE WHEN d < n_risk
                               THEN ln(1 - CAST(d AS DOUBLE) / n_risk)
                               ELSE 0.0 END)
                           OVER (ORDER BY duration_days
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW))
             END AS surv
      FROM risk
    )
    SELECT CAST(duration_days AS BIGINT) AS duration_days,
           CAST(n_risk AS BIGINT) AS n_risk,
           CAST(d AS BIGINT) AS n_events,
           round(surv, 6) AS survival
    FROM curve WHERE d > 0
    """,
)
def agg_survival_km(spark, sf_dir):
    """Kaplan–Meier time-to-event curve (Kaplan & Meier 1958) for
    time-to-first-purchase: duration = a user's first event day → first
    purchase day (observed event); users who never purchase are
    right-censored at their last activity day — the standard KM setup
    where the observation window truncates outcomes. (On these fixtures
    every user eventually purchases, so the censor branch contributes 0
    rows — the estimator still applies it, and a corpus slice where it
    bites hash-checks identically because the oracle carries the same
    branch.)

    Determinism: at each event time the hazard (1 − d/n) divides two
    exact integers (correctly-rounded IEEE division), and the survival
    product is exp(Σ ln ·) over a SORTED running frame — sequential
    identical order on both engines, then round 6 (ulp-level libm drift
    over tens of terms is ~1e-15, far inside the rounding guard).

    Scale shape: one groupBy(user_id) collapses the fact table, then the
    whole curve lives on the DURATION domain (≤ observation-window days —
    hundreds of rows at any corpus size): the cumulative windows run on a
    broadcast-scale relation. The corpus max date and the user total ride
    along as broadcast single-row joins; nothing re-scans facts."""
    ev = load_table(spark, sf_dir, "events")
    per = (
        ev.groupBy("user_id")
        .agg(
            F.min(F.to_date("ts")).alias("first_day"),
            F.min(
                F.when(
                    F.col("event_type") == "purchase", F.to_date("ts")
                )
            ).alias("purchase_day"),
            F.max(F.to_date("ts")).alias("last_day"),
        )
        .select(
            F.when(
                F.col("purchase_day").isNotNull(),
                F.datediff("purchase_day", "first_day"),
            )
            .otherwise(F.datediff("last_day", "first_day"))
            .alias("duration_days"),
            F.when(F.col("purchase_day").isNotNull(), 1)
            .otherwise(0)
            .alias("observed"),
        )
    )
    grp = per.groupBy("duration_days").agg(
        F.count("*").alias("n_all"), F.sum("observed").alias("d")
    )
    total = F.broadcast(per.agg(F.count("*").alias("n_users")))
    before = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    upto = Window.orderBy("duration_days").rowsBetween(
        Window.unboundedPreceding, 0
    )
    risk = grp.crossJoin(total).withColumn(
        "n_risk",
        F.col("n_users") - F.coalesce(F.sum("n_all").over(before), F.lit(0)),
    )
    # A step where every remaining at-risk user converts (d == n_risk —
    # necessarily the last event time) sends survival to exactly 0; it is
    # branch-guarded because ln(0) errors in DuckDB and nulls in Spark.
    term = F.when(
        F.col("d") < F.col("n_risk"),
        F.log(1 - F.col("d").cast("double") / F.col("n_risk")),
    ).otherwise(F.lit(0.0))
    curve = risk.withColumn(
        "surv",
        F.when(F.col("d") == F.col("n_risk"), F.lit(0.0)).otherwise(
            F.exp(F.sum(term).over(upto))
        ),
    )
    return curve.filter(F.col("d") > 0).select(
        F.col("duration_days").cast("long").alias("duration_days"),
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").cast("long").alias("n_events"),
        F.round("surv", 6).alias("survival"),
    )


@query(
    "agg_attribution_last_touch",
    oracle="""
    WITH t AS (
      SELECT user_id, ts, event_id, event_type, value,
             last_value(CASE WHEN event_type IN ('click', 'view')
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS channel0
      FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ), conv AS (
      SELECT COALESCE(channel0, 'direct') AS channel, value
      FROM t WHERE event_type = 'purchase'
    ), agg AS (
      SELECT channel,
             CAST(COUNT(*) AS BIGINT) AS n_conversions,
             SUM(CAST(value AS DECIMAL(18,6))) AS rev
      FROM conv GROUP BY channel
    )
    SELECT channel, n_conversions,
           CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
           round(CAST(CAST(rev AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(SUM(rev) OVER () AS VARCHAR) AS DOUBLE), 6)
             AS revenue_share
    FROM agg
    """,
)
def agg_attribution_last_touch(spark, sf_dir):
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent preceding touch (click or view); purchases with no
    prior touch are 'direct'. The canonical sessionless attribution model
    every growth team starts from.

    The carry-forward is ``last(touch, ignorenulls=True)`` over a
    (user, ts, event_id)-ordered running frame — the LOCF idiom
    (ts_gapfill_locf precedent) with the event_id tiebreak pinning
    equal-timestamp order on both engines. Purchase rows contribute NULL
    to the carried column, so a purchase can never attribute to itself
    or to a later touch.

    Scale shape: one filter prunes to 3 of 5 event types at the scan
    (pushed predicate), one user-keyed window pass (single exchange),
    then a hash agg onto the tiny channel domain; the share divides
    exact decimal sums inside a window over the ≤3-row aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    t = ev.filter(F.col("event_type").isin("click", "view", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        "value",
        F.last(
            F.when(
                F.col("event_type").isin("click", "view"), F.col("event_type")
            ),
            ignorenulls=True,
        )
        .over(w)
        .alias("channel0"),
    )
    conv = t.filter(F.col("event_type") == "purchase").select(
        F.coalesce("channel0", F.lit("direct")).alias("channel"), "value"
    )
    agg = conv.groupBy("channel").agg(
        F.count("*").cast("long").alias("n_conversions"),
        F.sum(dec("value", 6)).alias("rev"),
    )
    return agg.select(
        "channel",
        "n_conversions",
        d2d(F.col("rev")).alias("revenue"),
        F.round(
            d2d(F.col("rev")) / d2d(F.sum("rev").over(Window.partitionBy())),
            6,
        ).alias("revenue_share"),
    )


@query(
    "win_drawdown",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY 1
    ), dd AS (
      SELECT day, revenue,
             MAX(revenue) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
      FROM daily
    )
    SELECT day,
           CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue,
           CAST(CAST(peak AS VARCHAR) AS DOUBLE) AS peak,
           round(CAST(CAST(peak - revenue AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(peak AS VARCHAR) AS DOUBLE), 6) AS drawdown_pct
    FROM dd
    """,
)
def win_drawdown(spark, sf_dir):
    """Decline-from-peak (drawdown) over the daily revenue series — the
    monitoring view behind "revenue is X% off its all-time high" alerts,
    and the financial max-drawdown idiom applied to an operational KPI.
    Running peak via MAX over an ordered running frame; drawdown is the
    exact-decimal gap to that peak as a fraction of it.

    Scale shape: the fact table collapses to the DAY domain first (one
    hash agg with map-side combine over exact decimals); the running-max
    window then runs over hundreds-to-thousands of rows regardless of
    corpus size — the agg_gini/agg_rfm precedent (window the aggregated
    key domain, never raw facts)."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(dec("o_totalprice", 2)).alias("revenue"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    dd = daily.withColumn("peak", F.max("revenue").over(w))
    return dd.select(
        "day",
        d2d(F.col("revenue")).alias("revenue"),
        d2d(F.col("peak")).alias("peak"),
        F.round(
            d2d(F.col("peak") - F.col("revenue")) / d2d(F.col("peak")), 6
        ).alias("drawdown_pct"),
    )


@query(
    "win_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT SUM(revenue) AS total, COUNT(*) AS n FROM daily
    ), cur AS (
      SELECT day, revenue, total, n,
             SUM(revenue) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run,
             row_number() OVER (ORDER BY day) AS t
      FROM daily, tot
    ), cusum AS (
      SELECT day, revenue,
             CAST(CAST(n * run - t * total AS VARCHAR) AS DOUBLE) / n
               AS cusum
      FROM cur
    )
    SELECT day,
           CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue,
           cusum,
           row_number() OVER (ORDER BY abs(cusum) DESC, day) = 1
             AS is_changepoint
    FROM cusum ORDER BY day
    """,
)
def win_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint detection over the daily revenue series (Page
    1954): cusum_t = Σ_{i≤t} (x_i − x̄); the day of maximum |cusum| is
    the single most likely mean-shift changepoint (the statistic behind
    binary-segmentation changepoint search). Exactness: the mean is
    never materialized as a float — cusum_t = (n·run_t − t·total)/n is
    computed from EXACT decimal running sums and integer t/n, with one
    correctly-rounded division at the end (the agg_trend_corr
    exact-power-sum discipline applied to a window statistic). The
    quotient is emitted UNROUNDED: the double itself is bit-identical on
    both engines (exact decimal render + one IEEE division), whereas a
    cosmetic round(double, 6) is NOT portable — Spark rounds the
    shortest decimal representation via BigDecimal.valueOf, DuckDB the
    binary value, and the sf0.1 sweep caught them disagreeing on one
    boundary-adjacent day (1998-04-01: …35704 vs …357039).

    Scale shape: facts collapse to the day domain first; the running
    sum, the rank and the argmax all window the tiny aggregated series.
    The grand total rides along as a broadcast single-row join."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice", 2)).alias("revenue")
    )
    tot = F.broadcast(
        daily.agg(F.sum("revenue").alias("total"), F.count("*").alias("n"))
    )
    upto = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    cur = (
        daily.crossJoin(tot)
        .withColumn("run", F.sum("revenue").over(upto))
        .withColumn("t", F.row_number().over(Window.orderBy("day")))
    )
    cusum = cur.select(
        "day",
        "revenue",
        (d2d(F.col("n") * F.col("run") - F.col("t") * F.col("total")) / F.col("n")).alias(
            "cusum"
        ),
    )
    pick = Window.orderBy(F.abs("cusum").desc(), F.col("day"))
    return cusum.select(
        "day",
        d2d(F.col("revenue")).alias("revenue"),
        F.col("cusum").alias("cusum"),
        (F.row_number().over(pick) == 1).alias("is_changepoint"),
    ).orderBy("day")


@query(
    "ts_seasonal_index_dow",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY 1
    ), tot AS (
      SELECT SUM(revenue) AS total, COUNT(*) AS n_days FROM daily
    )
    SELECT isodow(day) AS dow,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(CAST(SUM(revenue) AS VARCHAR) AS DOUBLE) / COUNT(*)
             AS avg_revenue,
           round((CAST(CAST(SUM(revenue) AS VARCHAR) AS DOUBLE) / COUNT(*))
                 / (CAST(CAST(MAX(total) AS VARCHAR) AS DOUBLE) / MAX(n_days)),
                 6) AS seasonal_index
    FROM daily, tot
    GROUP BY isodow(day)
    """,
)
def ts_seasonal_index_dow(spark, sf_dir):
    """Day-of-week seasonal index of daily revenue — the
    ratio-to-overall-average decomposition step (index > 1 ⇒ that
    weekday runs hot; the multiplicative-seasonality primitive that
    deseasonalizes a series before trend/anomaly analysis pairs with
    win_anomaly_mad/win_cusum_changepoint). ISO day numbering pinned on
    both engines (the agg_activity_heatmap lesson). Both numerator and
    denominator averages divide EXACT decimal sums by exact counts;
    round 6 guards the final ratio.

    Scale shape: facts → day domain (one map-combined agg), then a
    7-row aggregation with the grand total broadcast alongside."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice", 2)).alias("revenue")
    )
    tot = F.broadcast(
        daily.agg(F.sum("revenue").alias("total"), F.count("*").alias("n_days_all"))
    )
    avg_rev = d2d(F.sum("revenue")) / F.count("*")
    overall = d2d(F.max("total")) / F.max("n_days_all")
    return (
        daily.crossJoin(tot)
        .groupBy(
            F.expr("extract(DAYOFWEEK_ISO FROM day)").cast("long").alias("dow")
        )
        .agg(
            F.count("*").cast("long").alias("n_days"),
            avg_rev.cast("double").alias("avg_revenue"),
            F.round(avg_rev / overall, 6).alias("seasonal_index"),
        )
    )


@query(
    "win_rolling_corr7",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ), s AS (
      SELECT day, rev, n_orders,
             COUNT(*) OVER w AS k,
             SUM(rev) OVER w AS sx,
             SUM(n_orders) OVER w AS sy,
             SUM(rev * rev) OVER w AS sxx,
             SUM(n_orders * n_orders) OVER w AS syy,
             SUM(rev * n_orders) OVER w AS sxy
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT day,
           CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
           n_orders,
           CAST(k AS BIGINT) AS k,
           CASE WHEN k >= 2
                 AND (k * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                      - CAST(CAST(sx AS VARCHAR) AS DOUBLE) ^ 2) > 0
                 AND (k * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                      - CAST(CAST(sy AS VARCHAR) AS DOUBLE) ^ 2) > 0
                THEN round(
                  (k * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                   - CAST(CAST(sx AS VARCHAR) AS DOUBLE)
                     * CAST(CAST(sy AS VARCHAR) AS DOUBLE))
                  / sqrt((k * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                          - CAST(CAST(sx AS VARCHAR) AS DOUBLE) ^ 2)
                         * (k * CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                            - CAST(CAST(sy AS VARCHAR) AS DOUBLE) ^ 2)), 6)
           END AS corr7
    FROM s ORDER BY day
    """,
)
def win_rolling_corr7(spark, sf_dir):
    """Trailing-7-day rolling Pearson correlation between daily revenue
    and daily order count — the co-movement monitor ("is average order
    value shifting?") and the rolling sibling agg_trend_corr's docstring
    promises: every moment (Σx, Σy, Σx², Σy², Σxy, k) is an EXACT
    decimal/integer window sum over the bounded frame, so partial-
    aggregation merge order cannot flap the hash; the correlation
    formula is one scalar double expression over those exact sums
    (round 6), NULL-guarded for short frames and zero variance.

    Scale shape: facts collapse to the day domain; six same-frame window
    aggregates share ONE sort/exchange over the tiny daily series."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice", 2)).alias("rev"),
        F.count("*").cast("long").alias("n_orders"),
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    s = daily.select(
        "day",
        "rev",
        "n_orders",
        F.count("*").over(w).alias("k"),
        F.sum("rev").over(w).alias("sx"),
        F.sum("n_orders").over(w).alias("sy"),
        F.sum(F.col("rev") * F.col("rev")).over(w).alias("sxx"),
        F.sum(F.col("n_orders") * F.col("n_orders")).over(w).alias("syy"),
        F.sum(F.col("rev") * F.col("n_orders")).over(w).alias("sxy"),
    )
    vx = F.col("k") * d2d(F.col("sxx")) - d2d(F.col("sx")) ** 2
    vy = F.col("k") * d2d(F.col("syy")) - d2d(F.col("sy")) ** 2
    cov = F.col("k") * d2d(F.col("sxy")) - d2d(F.col("sx")) * d2d(F.col("sy"))
    return s.select(
        "day",
        d2d(F.col("rev")).alias("revenue"),
        "n_orders",
        F.col("k").cast("long").alias("k"),
        F.when(
            (F.col("k") >= 2) & (vx > 0) & (vy > 0),
            F.round(cov / F.sqrt(vx * vy), 6),
        ).alias("corr7"),
    ).orderBy("day")


@query(
    "agg_forecast_snaive",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue
      FROM orders GROUP BY 1
    ), f AS (
      SELECT day, revenue,
             lag(revenue, 7) OVER (ORDER BY day) AS forecast
      FROM daily
    )
    SELECT day,
           CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS actual,
           CAST(CAST(forecast AS VARCHAR) AS DOUBLE) AS forecast,
           CAST(CAST(abs(revenue - forecast) AS VARCHAR) AS DOUBLE)
             AS abs_err,
           round(CAST(CAST(abs(revenue - forecast) AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(revenue AS VARCHAR) AS DOUBLE), 6) AS ape
    FROM f WHERE forecast IS NOT NULL ORDER BY day
    """,
)
def agg_forecast_snaive(spark, sf_dir):
    """Seasonal-naive forecast backtest: forecast(day) = revenue(day−7),
    the standard baseline every forecasting system must beat (and the
    shape of a rolling backtest harness — per-day actual vs forecast,
    absolute error, and absolute percentage error). All levels and
    errors are exact decimals; only the final APE ratio is a rounded
    double. Position-based lag(7) is the calendar assumption made
    EXPLICIT: the fixture's daily series is gap-free (2,399 consecutive
    days at sf0.01); on gappy data compose with ts_gapfill_locf first —
    which is why gap-fill is a separate operator.

    Scale shape: facts collapse to the day domain; one lag window over
    the tiny daily series. A 100 TB deployment backtests thousands of
    (store, sku) series — same plan with the window partitioned by
    series key, embarrassingly parallel."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice", 2)).alias("revenue")
    )
    f = daily.withColumn(
        "forecast", F.lag("revenue", 7).over(Window.orderBy("day"))
    ).filter(F.col("forecast").isNotNull())
    return f.select(
        "day",
        d2d(F.col("revenue")).alias("actual"),
        d2d(F.col("forecast")).alias("forecast"),
        d2d(F.abs(F.col("revenue") - F.col("forecast"))).alias("abs_err"),
        F.round(
            d2d(F.abs(F.col("revenue") - F.col("forecast")))
            / d2d(F.col("revenue")),
            6,
        ).alias("ape"),
    ).orderBy("day")


@query(
    "agg_entropy_mix",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, COUNT(*) AS c FROM events
      GROUP BY user_id, event_type
    ), n AS (
      SELECT user_id, SUM(c) AS n FROM c GROUP BY user_id
    ), terms AS (
      SELECT c.user_id,
             CAST(round(-(CAST(c.c AS DOUBLE) / n.n)
                        * log2(CAST(c.c AS DOUBLE) / n.n), 9)
                  AS DECIMAL(18,9)) AS term
      FROM c JOIN n USING (user_id)
    ), ent AS (
      SELECT user_id,
             round(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE), 6) AS entropy
      FROM terms GROUP BY user_id
    )
    SELECT ent.user_id, CAST(n.n AS BIGINT) AS n_events, entropy,
           CAST(floor(entropy * 4) / 4 AS DOUBLE) AS entropy_bin
    FROM ent JOIN n ON ent.user_id = n.user_id
    """,
)
def agg_entropy_mix(spark, sf_dir):
    """Behavioral-diversity profile: Shannon entropy (bits) of each
    user's event-type mix, with a quarter-bit bin label for fleet-level
    histogramming — H ≈ 0 flags single-action accounts (bots,
    scrapers), H ≈ log2(5) flags uniformly-mixed ones. Float
    discipline: each −p·log2(p) term is rounded to
    9 dp THEN cast to exact decimal so the per-user sum is
    merge-order-independent (the llm_unigram_logprob discipline —
    entropy is a float sum over an unordered group, exactly the class
    the core.py rules exist for); the binning floor runs on the rounded
    double identically on both engines.

    Scale shape: one (user, type) hash agg with map-side combine, a
    user-keyed rollup, and a ≤9-bin histogram. Nothing exceeds one
    shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("c"))
    n = c.groupBy("user_id").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    terms = c.join(n, "user_id").select(
        "user_id",
        F.round(-p * F.log2(p), 9).cast("decimal(18,9)").alias("term"),
    )
    ent = terms.groupBy("user_id").agg(
        F.round(d2d(F.sum("term")), 6).alias("entropy")
    )
    return ent.join(n, "user_id").select(
        "user_id",
        F.col("n").cast("long").alias("n_events"),
        "entropy",
        (F.floor(F.col("entropy") * 4) / 4).cast("double").alias("entropy_bin"),
    )


@query(
    "ts_holt_linear",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             {sql_dsum("value")} AS v
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), s AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             list([CAST(v AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))]
                  ORDER BY day) AS vs
      FROM daily GROUP BY user_id
    ), folded AS (
      SELECT user_id, n_days,
             list_reduce(vs, (acc, p) ->
               [CAST(round(0.5 * p[1] + 0.5 * (acc[1] + acc[2]), 6)
                     AS DECIMAL(18,6)),
                CAST(round(0.3 * (round(0.5 * p[1] + 0.5 * (acc[1] + acc[2]), 6)
                           - acc[1]) + 0.7 * acc[2], 6)
                     AS DECIMAL(18,6))]) AS st
      FROM s
    )
    SELECT user_id, n_days,
           CAST(CAST(st[1] AS VARCHAR) AS DOUBLE) AS level,
           CAST(CAST(st[2] AS VARCHAR) AS DOUBLE) AS trend,
           round(CAST(CAST(st[1] AS VARCHAR) AS DOUBLE)
                 + 7 * CAST(CAST(st[2] AS VARCHAR) AS DOUBLE), 6)
             AS forecast_7d
    FROM folded
    """,
)
def ts_holt_linear(spark, sf_dir):
    """Holt's linear (double-exponential) smoothing per user series
    (Holt 1957): level ℓₜ = α·xₜ + (1−α)(ℓ+b), trend bₜ = β(ℓₜ−ℓ) +
    (1−β)b, α=0.5, β=0.3, init ℓ₁=x₁, b₁=0 — the trend-aware step up
    from ts_ewma, closing the forecasting family (agg_forecast_snaive
    is the baseline to beat, this is the first model that can beat it);
    forecast_7d = ℓ + 7b. Like EWMA it is a RECURSION no frame window
    expresses, so both engines run the same left fold — here with a
    TWO-variable state threaded as a [level, trend] decimal pair
    (elements enter as [x, 0] so the accumulator and element types
    match, which is what DuckDB's list_reduce requires), every step
    rounded to 6 dp in exact decimal (the ts_ewma divergence lesson;
    ℓₜ is inlined twice in the bₜ expression because the lambda can't
    bind intermediates).

    Plan shape: identical to ts_ewma — daily pre-aggregate collapses
    the stream, then one fold per user over a date-span-bounded array,
    all inside a single groupBy."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("v")
    )
    s = daily.groupBy("user_id").agg(
        F.count("*").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, v))),"
            " p -> array(CAST(p.v AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))))"
        ).alias("vs"),
    )
    # NB: Spark SQL array subscripts are 0-based; DuckDB lists are 1-based
    # (the oracle's p[1]/acc[1]/acc[2] are this x[0]/acc[0]/acc[1]).
    lnew = "round(0.5 * x[0] + 0.5 * (acc[0] + acc[1]), 6)"
    folded = s.select(
        "user_id",
        "n_days",
        F.expr(
            "aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1),"
            f" (acc, x) -> array(CAST({lnew} AS DECIMAL(18,6)),"
            f" CAST(round(0.3 * ({lnew} - acc[0]) + 0.7 * acc[1], 6)"
            " AS DECIMAL(18,6))))"
        ).alias("st"),
    )
    return folded.select(
        "user_id",
        "n_days",
        d2d(F.expr("st[0]")).alias("level"),
        d2d(F.expr("st[1]")).alias("trend"),
        F.round(d2d(F.expr("st[0]")) + 7 * d2d(F.expr("st[1]")), 6).alias(
            "forecast_7d"
        ),
    )


@query(
    "agg_welch_ttest",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sx,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))
                 * CAST(o_totalprice AS DECIMAL(18,2))) AS sxx
      FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      GROUP BY o_orderpriority
    ), m AS (
      SELECT grp, n,
             CAST(CAST(sx AS VARCHAR) AS DOUBLE) / n AS mean,
             (CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
              - CAST(CAST(sx AS VARCHAR) AS DOUBLE) ^ 2 / n) / (n - 1)
               AS var
      FROM s
    ), w AS (
      SELECT a.n AS n1, b.n AS n2,
             round(a.mean, 6) AS mean_urgent, round(b.mean, 6) AS mean_low,
             a.var / a.n + b.var / b.n AS se2,
             a.var AS v1, b.var AS v2
      FROM m a, m b WHERE a.grp = '1-URGENT' AND b.grp = '5-LOW'
    )
    SELECT n1, n2, mean_urgent, mean_low,
           round((mean_urgent - mean_low) / sqrt(se2), 6) AS t_stat,
           round(se2 ^ 2 / ((v1 / n1) ^ 2 / (n1 - 1)
                            + (v2 / n2) ^ 2 / (n2 - 1)), 6) AS welch_df
    FROM w
    """,
)
def agg_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance two-sample t-test (Welch 1947) — does
    urgent-priority spending differ from low-priority? — the
    continuous-outcome hypothesis test beside agg_ab_test's two-
    proportion z. Means and variances come from EXACT decimal power
    sums (Σx, Σx² — the agg_higher_moments discipline), so the only
    float work is the final scalar t and Welch–Satterthwaite df
    formulas, rounded to 6 dp on both engines. NOTE the rounding
    discipline: the means are rounded BEFORE the t numerator on both
    sides so the reported statistic is a pure function of the reported
    means.

    Scale shape: one conditional-filtered scan → two-group power-sum
    aggregate (map-side combine) → a 2×2 scalar join. Nothing scales
    with data size past the first aggregate."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    x = dec("o_totalprice", 2)
    s = o.groupBy(F.col("o_orderpriority").alias("grp")).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(x * x).alias("sxx"),
    )
    m = s.select(
        "grp",
        "n",
        (d2d(F.col("sx")) / F.col("n")).alias("mean"),
        (
            (d2d(F.col("sxx")) - d2d(F.col("sx")) ** 2 / F.col("n"))
            / (F.col("n") - 1)
        ).alias("var"),
    )
    a = m.filter(F.col("grp") == "1-URGENT").alias("a")
    b = m.filter(F.col("grp") == "5-LOW").alias("b")
    w = a.crossJoin(b).select(
        F.col("a.n").alias("n1"),
        F.col("b.n").alias("n2"),
        F.round("a.mean", 6).alias("mean_urgent"),
        F.round("b.mean", 6).alias("mean_low"),
        (F.col("a.var") / F.col("a.n") + F.col("b.var") / F.col("b.n")).alias(
            "se2"
        ),
        F.col("a.var").alias("v1"),
        F.col("b.var").alias("v2"),
    )
    return w.select(
        "n1",
        "n2",
        "mean_urgent",
        "mean_low",
        F.round(
            (F.col("mean_urgent") - F.col("mean_low")) / F.sqrt("se2"), 6
        ).alias("t_stat"),
        F.round(
            F.col("se2") ** 2
            / (
                (F.col("v1") / F.col("n1")) ** 2 / (F.col("n1") - 1)
                + (F.col("v2") / F.col("n2")) ** 2 / (F.col("n2") - 1)
            ),
            6,
        ).alias("welch_df"),
    )


@query(
    "agg_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS t,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS y
      FROM orders GROUP BY 1
    ), mx AS (SELECT MAX(t) AS tmax FROM daily),
    win AS (
      SELECT t, y FROM daily, mx WHERE t > tmax - 90
    ), slopes AS (
      SELECT (b.y - a.y) / (b.t - a.t) AS slope
      FROM win a JOIN win b ON a.t < b.t
    )
    SELECT CAST((SELECT COUNT(*) FROM win) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           round(CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY slope)
                      AS DOUBLE), 6) AS theil_sen_slope
    FROM slopes
    """,
)
def agg_theil_sen(spark, sf_dir):
    """Theil–Sen robust trend estimator (Theil 1950; Sen 1968) over the
    trailing 90 days of daily revenue: the median of all pairwise
    slopes — up to 29% of the points can be arbitrary outliers without
    moving it, where the least-squares slope of agg_trend_corr follows
    a single corrupted day. The pairwise join is quadratic BY DESIGN
    and therefore runs on the BOUNDED day domain only (90 days →
    ≤4,005 pairs regardless of corpus size; the window cap is the same
    discipline as every other quadratic guard in this repo — the raw
    fact table never self-joins). Slopes divide exact-decimal daily
    sums rendered to double; the median is the interpolated percentile
    both engines share (agg_percentile discipline, round 6).

    Scale shape: facts → day domain (map-combined agg), broadcast
    single-row max-date, one tiny self-join, one percentile over ≤4k
    rows."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "t"
        )
    ).agg(d2d(F.sum(dec("o_totalprice", 2))).alias("y"))
    mx = F.broadcast(daily.agg(F.max("t").alias("tmax")))
    win = daily.crossJoin(mx).filter(F.col("t") > F.col("tmax") - 90).select("t", "y")
    a, b = win.alias("a"), win.alias("b")
    slopes = a.join(b, F.col("a.t") < F.col("b.t")).select(
        ((F.col("b.y") - F.col("a.y")) / (F.col("b.t") - F.col("a.t"))).alias(
            "slope"
        )
    )
    n_days = F.broadcast(win.agg(F.count("*").cast("long").alias("n_days")))
    return slopes.crossJoin(n_days).groupBy("n_days").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.percentile("slope", F.lit(0.5)), 6).alias("theil_sen_slope"),
    ).select("n_days", "n_pairs", "theil_sen_slope")


@query(
    "agg_wow_growth",
    oracle="""
    WITH weekly AS (
      SELECT date_trunc('week', CAST(o_orderdate AS DATE)) AS week_start,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ), g AS (
      SELECT week_start, revenue, n_orders,
             lag(revenue) OVER (ORDER BY week_start) AS prev_rev,
             lag(n_orders) OVER (ORDER BY week_start) AS prev_orders
      FROM weekly
    )
    SELECT week_start,
           CAST(CAST(revenue AS VARCHAR) AS DOUBLE) AS revenue,
           n_orders,
           round(CAST(CAST(revenue - prev_rev AS VARCHAR) AS DOUBLE)
                 / CAST(CAST(prev_rev AS VARCHAR) AS DOUBLE), 6)
             AS revenue_wow,
           round(CAST(n_orders - prev_orders AS DOUBLE) / prev_orders, 6)
             AS orders_wow
    FROM g WHERE prev_rev IS NOT NULL ORDER BY week_start
    """,
)
def agg_wow_growth(spark, sf_dir):
    """Week-over-week growth of revenue and order volume — THE topline
    growth metric. Weekly exact-decimal sums, one lag window over the
    week domain, growth = (this − prev)/prev with the subtraction done
    in exact decimal before the one rounded double division. ISO week
    boundaries (date_trunc 'week' = Monday on both engines — verified
    by the shared week_trunc dialect bridge in test_differential).

    Scale shape: facts → week domain (map-combined agg), then a lag
    over dozens-to-hundreds of rows. The win_rank_change cousin for
    levels instead of ranks."""
    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(
        F.date_trunc("week", F.to_date("o_orderdate")).cast("date").alias(
            "week_start"
        )
    ).agg(
        F.sum(dec("o_totalprice", 2)).alias("revenue"),
        F.count("*").cast("long").alias("n_orders"),
    )
    w = Window.orderBy("week_start")
    g = weekly.select(
        "week_start",
        "revenue",
        "n_orders",
        F.lag("revenue").over(w).alias("prev_rev"),
        F.lag("n_orders").over(w).alias("prev_orders"),
    ).filter(F.col("prev_rev").isNotNull())
    return g.select(
        "week_start",
        d2d(F.col("revenue")).alias("revenue"),
        "n_orders",
        F.round(
            d2d(F.col("revenue") - F.col("prev_rev")) / d2d(F.col("prev_rev")), 6
        ).alias("revenue_wow"),
        F.round(
            (F.col("n_orders") - F.col("prev_orders")).cast("double")
            / F.col("prev_orders"),
            6,
        ).alias("orders_wow"),
    ).orderBy("week_start")


@query(
    "agg_path_trigrams",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS e3
      FROM events
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """,
)
def agg_path_trigrams(spark, sf_dir):
    """Top-10 three-step user flows (event-type trigrams in timestamp
    order) — the "user paths" / Sankey view one order above
    agg_path_transitions' first-order Markov matrix: transitions say
    click→purchase is common, trigrams say WHICH two-step context
    precedes it. (event_id tiebreak pins equal timestamps on both
    engines — the agg_attribution discipline.)

    Scale shape: two lead() windows share ONE (user_id, ts, event_id)
    sort; the trigram domain is ≤|event_type|³ = 125 groups, so the
    count agg collapses map-side; top-10 via TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.groupBy(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(10)
    )


@query(
    "agg_chisq_independence",
    oracle="""
    WITH obs AS (
      SELECT o_orderpriority AS pri, o_orderstatus AS st,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM orders GROUP BY 1, 2
    ), rm AS (SELECT pri, SUM(o) AS rn FROM obs GROUP BY pri),
    cm AS (SELECT st, SUM(o) AS cn FROM obs GROUP BY st),
    tot AS (SELECT SUM(o) AS n, CAST(COUNT(DISTINCT pri) AS BIGINT) AS r,
                   CAST(COUNT(DISTINCT st) AS BIGINT) AS c
            FROM obs),
    terms AS (
      SELECT CAST(round(CAST(o AS DOUBLE) * o * n / (rn * cn), 9)
                  AS DECIMAL(28,9)) AS term
      FROM obs JOIN rm USING (pri) JOIN cm USING (st), tot
    )
    SELECT CAST(n AS BIGINT) AS n, r AS n_rows, c AS n_cols,
           (r - 1) * (c - 1) AS dof,
           round(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE) - n, 6) AS chi2,
           round(sqrt(greatest(CAST(CAST(SUM(term) AS VARCHAR) AS DOUBLE) - n,
                               0)
                      / (n * least(r - 1, c - 1))), 6) AS cramers_v
    FROM terms, tot GROUP BY n, r, c
    """,
)
def agg_chisq_independence(spark, sf_dir):
    """Pearson's chi-squared test of independence (+ Cramér's V effect
    size) over the order-priority × order-status contingency table — the
    categorical-association test beside agg_welch_ttest (continuous
    means) and agg_ab_test (two proportions). Uses the algebraic
    identity chi2 = n·Σ O²/(rₘ·cₘ) − n, under which UNOBSERVED cells
    contribute exactly zero (O=0), so no dense r×c grid is ever
    materialized — only observed cells flow. Every input to the per-cell
    term (O, row margin, column margin, n) is an exact integer; the one
    double division per cell is rounded to 9 dp then summed in exact
    decimal (the agg_entropy_mix discipline) so chi2 is
    merge-order-independent on both engines.

    Scale shape: one (pri, st) hash agg with map-side combine over the
    fact table, then margins/total as aggregates of the ≤|pri|·|st|
    observed-cell table — everything after the first aggregate is
    O(categories), not O(rows)."""
    o = load_table(spark, sf_dir, "orders")
    obs = o.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderstatus").alias("st"),
    ).agg(F.count("*").cast("long").alias("o"))
    return chisq_from_counts(obs)


def chisq_from_counts(obs):
    """(pri, st, o) observed-cell counts → one-row chi2/Cramér's V report;
    see :func:`agg_chisq_independence` for the float discipline."""
    rm = obs.groupBy("pri").agg(F.sum("o").alias("rn"))
    cm = obs.groupBy("st").agg(F.sum("o").alias("cn"))
    tot = F.broadcast(
        obs.agg(
            F.sum("o").alias("n"),
            F.countDistinct("pri").alias("r"),
            F.countDistinct("st").alias("c"),
        )
    )
    terms = (
        obs.join(rm, "pri")
        .join(cm, "st")
        .crossJoin(tot)
        .select(
            "n",
            "r",
            "c",
            F.round(
                F.col("o").cast("double") * F.col("o") * F.col("n")
                / (F.col("rn") * F.col("cn")),
                9,
            )
            .cast("decimal(28,9)")
            .alias("term"),
        )
    )
    chi2 = d2d(F.sum("term")) - F.col("n")
    return terms.groupBy("n", "r", "c").agg(
        F.round(chi2, 6).alias("chi2"),
        F.round(
            F.sqrt(
                F.greatest(chi2, F.lit(0))
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1))
            ),
            6,
        ).alias("cramers_v"),
    ).select(
        F.col("n").cast("long").alias("n"),
        F.col("r").cast("long").alias("n_rows"),
        F.col("c").cast("long").alias("n_cols"),
        ((F.col("r") - 1) * (F.col("c") - 1)).cast("long").alias("dof"),
        "chi2",
        "cramers_v",
    )


@query(
    "agg_mann_whitney",
    oracle="""
    WITH f AS (
      SELECT CAST(FLOOR(value) AS BIGINT) AS score,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1
      FROM events WHERE event_type IN ('click', 'purchase')
    ), s AS (
      SELECT score, CAST(SUM(g1) AS BIGINT) AS n1s,
             CAST(COUNT(*) AS BIGINT) AS t
      FROM f GROUP BY score
    ), c AS (
      SELECT score, n1s, t,
             COALESCE(SUM(t) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
      FROM s
    ), sums AS (
      SELECT CAST(SUM(n1s) AS BIGINT) AS n1,
             CAST(SUM(t - n1s) AS BIGINT) AS n2,
             CAST(SUM(n1s * (2 * cumb + t + 1)) AS BIGINT) AS r2x1,
             CAST(SUM(t * t * t - t) AS BIGINT) AS tie_t
      FROM c
    )
    SELECT n1, n2,
           CAST((r2x1 - n1 * (n1 + 1)) AS DOUBLE) / 2 AS u1,
           round((CAST((r2x1 - n1 * (n1 + 1)) AS DOUBLE) / 2
                  - CAST(n1 AS DOUBLE) * n2 / 2)
                 / sqrt(CAST(n1 AS DOUBLE) * n2 / 12
                        * ((n1 + n2 + 1)
                           - CAST(tie_t AS DOUBLE)
                             / ((n1 + n2) * (n1 + n2 - 1.0)))), 6) AS z_stat
    FROM sums
    """,
)
def agg_mann_whitney(spark, sf_dir):
    """Mann–Whitney U rank-sum test (Mann & Whitney 1947) with the
    standard tie-corrected normal approximation: do 'click' and
    'purchase' event values come from the same distribution? — the
    NONPARAMETRIC member of the hypothesis-test family (agg_welch_ttest
    assumes near-normal means; rank tests don't). Scores are integer
    dollar buckets (floor(value) — exact on both engines, and coarse
    enough that ties actually occur, exercising the tie-correction
    term Σ(t³−t)).

    The scale-critical formulation: ranks are NEVER assigned per row.
    The per-score tied-average rank is cumb + (t+1)/2 — a function of
    the (bounded) SCORE DOMAIN only — so the rank-sum R₁ doubles to the
    pure-integer Σ n1ₛ·(2·cumb + t + 1), computed from one hash agg on
    score (map-side combine over the fact table) plus one cumulative
    window over the ≤|score-domain| rows. Integer sums are
    merge-order-exact; the only float work is the final scalar z,
    rounded to 6 dp. No continuity correction (documented choice,
    matching the large-sample form on both engines).

    Scale shape: fact scan → score-domain agg → tiny window → scalar.
    A per-row rank() window would globally sort the fact table on ONE
    unpartitioned ordering — this form never does."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    f = ev.select(
        F.floor("value").cast("long").alias("score"),
        F.when(F.col("event_type") == "click", 1).otherwise(0).alias("g1"),
    )
    return mann_whitney_from_scores(f)


def mann_whitney_from_scores(f):
    """(score, g1) scored observations → one-row U/z report; see
    :func:`agg_mann_whitney` for the rank-domain formulation."""
    s = f.groupBy("score").agg(
        F.sum("g1").cast("long").alias("n1s"),
        F.count("*").cast("long").alias("t"),
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    c = s.select(
        "score",
        "n1s",
        "t",
        F.coalesce(F.sum("t").over(w), F.lit(0)).alias("cumb"),
    )
    sums = c.agg(
        F.sum("n1s").cast("long").alias("n1"),
        F.sum(F.col("t") - F.col("n1s")).cast("long").alias("n2"),
        F.sum(F.col("n1s") * (2 * F.col("cumb") + F.col("t") + 1))
        .cast("long")
        .alias("r2x1"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t"))
        .cast("long")
        .alias("tie_t"),
    )
    u1 = (F.col("r2x1") - F.col("n1") * (F.col("n1") + 1)).cast("double") / 2
    n = F.col("n1") + F.col("n2")
    sigma = F.sqrt(
        F.col("n1").cast("double") * F.col("n2") / 12
        * (
            (n + 1)
            - F.col("tie_t").cast("double") / (n * (n - F.lit(1.0)))
        )
    )
    return sums.select(
        "n1",
        "n2",
        u1.alias("u1"),
        F.round(
            (u1 - F.col("n1").cast("double") * F.col("n2") / 2) / sigma, 6
        ).alias("z_stat"),
    )


@query(
    "agg_ks_test",
    oracle="""
    WITH s AS (
      SELECT value,
             COUNT(*) FILTER (WHERE event_type = 'purchase') AS c1,
             COUNT(*) FILTER (WHERE event_type = 'click') AS c2
      FROM events WHERE event_type IN ('purchase', 'click')
      GROUP BY value
    ), c AS (
      SELECT SUM(c1) OVER (ORDER BY value) AS cum1,
             SUM(c2) OVER (ORDER BY value) AS cum2
      FROM s
    ), tot AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      FROM s
    )
    SELECT n1, n2,
           round(MAX(abs(cum1 * 1.0 / n1 - cum2 * 1.0 / n2)), 6) AS ks_stat,
           round(1.358 * sqrt((n1 + n2) * 1.0 / (n1 * n2)), 6) AS ks_crit_95,
           MAX(abs(cum1 * 1.0 / n1 - cum2 * 1.0 / n2))
             > 1.358 * sqrt((n1 + n2) * 1.0 / (n1 * n2)) AS significant
    FROM c, tot GROUP BY n1, n2
    """,
)
def agg_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov test: the largest ECDF gap between
    purchase-event and click-event value distributions, against the 95%
    critical value 1.358·√((n1+n2)/(n1·n2)). The distribution-shift
    check behind drift monitoring — unlike agg_welch_ttest (means) or
    agg_mann_whitney (ranks), KS sees ANY shape difference.

    Exactness: ECDF steps are integer cumulative counts over the
    distinct-value domain; the gap and threshold are scalar double math
    on those integers — deterministic on both engines.

    Plan shape: one map-combined agg collapses the fact stream to the
    distinct-value domain BEFORE the ordered prefix-sum window, so the
    global-order window runs over |distinct values| rows, not |events|.
    At 100 TB the same plan holds with a range-partitioned two-level
    prefix sum (partial sums + broadcast offsets) replacing the single
    window — the aggregate-first step is what makes that viable."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "click")
    )
    s = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c2"),
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    c = s.select(
        F.sum("c1").over(w).alias("cum1"), F.sum("c2").over(w).alias("cum2")
    )
    tot = F.broadcast(
        s.agg(
            F.sum("c1").cast("long").alias("n1"),
            F.sum("c2").cast("long").alias("n2"),
        )
    )
    gap = F.abs(F.col("cum1") / F.col("n1") - F.col("cum2") / F.col("n2"))
    crit = 1.358 * F.sqrt((F.col("n1") + F.col("n2")) / (F.col("n1") * F.col("n2")))
    return (
        c.crossJoin(tot)
        .groupBy("n1", "n2")
        .agg(
            F.round(F.max(gap), 6).alias("ks_stat"),
            F.round(F.any_value(crit), 6).alias("ks_crit_95"),
            (F.max(gap) > F.any_value(crit)).alias("significant"),
        )
    )


# Poisson(1) CDF at k = 0..5, written once so the Spark expression and the
# DuckDB oracle share bit-identical double literals (weight = #thresholds
# below the row's hash-uniform, i.e. the inverse-CDF sample, capped at 6;
# P(X > 5) ~ 6e-4 so the cap's bias is negligible and deterministic).
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238463",
    "0.9963401531726563",
    "0.9994058151824183",
)
_POIS_W = "(" + " + ".join(
    f"CASE WHEN {{u}} >= {c} THEN 1 ELSE 0 END" for c in _POIS_CDF
) + ")"
# portable 60-bit hash-uniform in [0, 1) keyed by (replicate, order key)
_BOOT_U_DUCK = (
    "(CAST(('0x' || substring(sha256(CAST(b AS VARCHAR) || '|' ||"
    " CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)"
    " / 1152921504606846976.0)"
)
_BOOT_U_SPARK = (
    "(conv(substring(sha2(concat(CAST(b AS STRING), '|',"
    " CAST(o_orderkey AS STRING)), 256), 1, 15), 16, 10)"
    " / 1152921504606846976.0)"
)


@query(
    "agg_bootstrap_ci",
    oracle=f"""
    WITH w AS (
      SELECT b, {_POIS_W.format(u=_BOOT_U_DUCK)} AS w, o_totalprice
      FROM orders, unnest(range(0, 50)) AS r(b)
    ), reps AS (
      SELECT b,
             CAST(CAST(SUM(w * CAST(o_totalprice AS DECIMAL(18,2)))
                       AS VARCHAR) AS DOUBLE) / SUM(w) AS rep_mean
      FROM w GROUP BY b
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_replicates,
           round(CAST(percentile_cont(0.025) WITHIN GROUP (ORDER BY rep_mean)
                      AS DOUBLE), 6) AS ci_lo,
           round(CAST(percentile_cont(0.975) WITHIN GROUP (ORDER BY rep_mean)
                      AS DOUBLE), 6) AS ci_hi,
           round((SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                                   AS VARCHAR) AS DOUBLE) / COUNT(*)
                  FROM orders), 6) AS mean_full
    FROM reps
    """,
)
def agg_bootstrap_ci(spark, sf_dir):
    """95% bootstrap confidence interval for mean order value via the
    POISSON bootstrap (Chamandy et al. 2012; Kleiner et al.'s BLB is
    the heavier cousin) — the resampling scheme that actually works
    distributed: classic with-replacement resampling needs global
    coordination, but Poisson(1) per-row replicate weights are iid and
    map-local, so all 50 replicates ride one scan. Weights come from a
    portable 60-bit content-hash uniform through the shared inverse-CDF
    constants above — the same replicate is bit-reproducible on any
    cluster, any partitioning, either engine (the sample_weighted
    determinism discipline).

    Plan shape: explode ×50 (map-side), then ONE map-combined agg to 50
    replicate rows (weighted exact-decimal sums), then a 50-row
    percentile. No shuffle sees the fact table; at 100 TB the explode
    factor is the only cost knob (B replicates ⇒ B× map work, constant
    reduce size)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        o.select("o_orderkey", "o_totalprice", F.explode(F.sequence(F.lit(0), F.lit(49))).alias("b"))
        .withColumn("u", F.expr(_BOOT_U_SPARK))
        .withColumn("w", F.expr(_POIS_W.format(u="u")))
    )
    reps = w.groupBy("b").agg(
        (d2d(F.sum(F.col("w") * dec("o_totalprice", 2))) / F.sum("w")).alias(
            "rep_mean"
        )
    )
    full = F.broadcast(
        o.agg(
            F.round(d2d(F.sum(dec("o_totalprice", 2))) / F.count("*"), 6).alias(
                "mean_full"
            )
        )
    )
    return (
        reps.crossJoin(full)
        .groupBy("mean_full")
        .agg(
            F.count("*").cast("long").alias("n_replicates"),
            F.round(F.percentile("rep_mean", F.lit(0.025)), 6).alias("ci_lo"),
            F.round(F.percentile("rep_mean", F.lit(0.975)), 6).alias("ci_hi"),
        )
        .select("n_replicates", "ci_lo", "ci_hi", "mean_full")
    )


@query(
    "ts_stl_decompose",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ), t AS (
      SELECT day, rev,
             SUM(rev) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
             COUNT(*) OVER (ORDER BY day
                            ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
      FROM daily
    ), tr AS (
      SELECT day, rev, CAST(CAST(s7 AS VARCHAR) AS DOUBLE) / 7 AS trend
      FROM t WHERE c7 = 7
    ), de AS (
      SELECT *, CAST(round(CAST(CAST(rev AS VARCHAR) AS DOUBLE) - trend, 6)
                     AS DECIMAL(18,6)) AS detr
      FROM tr
    ), sea AS (
      SELECT isodow(day) AS dow,
             CAST(CAST(SUM(detr) AS VARCHAR) AS DOUBLE) / COUNT(*) AS sea
      FROM de GROUP BY 1
    )
    SELECT day,
           CAST(CAST(rev AS VARCHAR) AS DOUBLE) AS revenue,
           round(trend, 6) AS trend,
           round(sea, 6) AS seasonal,
           round(CAST(CAST(detr AS VARCHAR) AS DOUBLE) - sea, 6) AS residual
    FROM de JOIN sea ON sea.dow = isodow(de.day)
    ORDER BY day
    """,
)
def ts_stl_decompose(spark, sf_dir):
    """Additive seasonal-trend decomposition of daily revenue (the
    classical decomposition STL descends from — Cleveland et al. 1990):
    trend = centered 7-row moving mean over the day domain, weekly
    seasonal = day-of-week mean of the detrended series, residual = the
    rest. The residual is what anomaly screens SHOULD run on — raw
    daily revenue mixes weekday rhythm into every threshold
    (win_anomaly_mad / dq_volume_anomaly are this op's consumers).

    Exactness: the moving sum runs on exact decimals (no running-
    accumulator drift), means become doubles via the d2d render, and
    the detrended series re-enters group aggregation as a 6-dp decimal
    so the per-dow means are merge-order-exact. Edge days (incomplete
    7-row frame) are excluded, not padded.

    Plan shape: facts → day domain (map-combined agg); one ordered
    window over ~|days| rows; a 7-row seasonal join. The fact table
    never sees a window."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.sum(dec("o_totalprice", 2)).alias("rev")
    )
    w7 = Window.orderBy("day").rowsBetween(-3, 3)
    t = daily.select(
        "day",
        "rev",
        F.sum("rev").over(w7).alias("s7"),
        F.count("*").over(w7).alias("c7"),
    ).filter(F.col("c7") == 7)
    tr = t.withColumn("trend", d2d(F.col("s7")) / 7)
    de = tr.withColumn(
        "detr", F.round(d2d(F.col("rev")) - F.col("trend"), 6).cast("decimal(18,6)")
    )
    dow = F.expr("extract(DAYOFWEEK_ISO FROM day)").cast("long")
    sea = de.groupBy(dow.alias("dow")).agg(
        (d2d(F.sum("detr")) / F.count("*")).alias("sea")
    )
    return (
        de.withColumn("dow", dow)
        .join(F.broadcast(sea), "dow")
        .select(
            "day",
            d2d(F.col("rev")).alias("revenue"),
            F.round("trend", 6).alias("trend"),
            F.round("sea", 6).alias("seasonal"),
            F.round(d2d(F.col("detr")) - F.col("sea"), 6).alias("residual"),
        )
        .orderBy("day")
    )


@query(
    "agg_decay_score",
    oracle="""
    WITH mx AS (SELECT MAX(epoch_us(ts)) AS mxus FROM events),
    w AS (
      SELECT user_id,
             CAST(round(value * round(exp(-((mxus - epoch_us(ts))
                                            / 86400000000.0) / 30.0), 12), 8)
                  AS DECIMAL(18,8)) AS wv,
             (mxus - epoch_us(ts)) / 86400000000.0 AS age_days
      FROM events, mx
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           round(CAST(CAST(SUM(wv) AS VARCHAR) AS DOUBLE), 6) AS decay_score,
           round(MIN(age_days), 6) AS last_seen_days
    FROM w GROUP BY user_id
    """,
)
def agg_decay_score(spark, sf_dir):
    """Exponential time-decay engagement score per user:
    Σ value·e^(−age/30d) — the recency-weighted feature that ranks a
    user active-yesterday above one equally-busy-last-quarter (30-day
    half-life-ish kernel; the continuous upgrade of
    agg_rfm_segmentation's discrete recency quintile).

    Determinism: age comes from exact epoch-microsecond integers; the
    decay weight is rounded to 12 dp straight out of exp() and the
    weighted value to 8 dp into an exact decimal accumulator, so the
    per-user sum is merge-order-proof (the quantize-then-sum rule for
    any libm-sourced factor).

    Plan shape: one broadcast corpus-max row, map-local weighting, one
    map-combined agg on user_id. Nothing else."""
    ev = load_table(spark, sf_dir, "events")
    mx = F.broadcast(ev.agg(F.max(F.unix_micros("ts")).alias("mxus")))
    age = (F.col("mxus") - F.unix_micros("ts")) / 86400000000.0
    w = ev.crossJoin(mx).select(
        "user_id",
        F.round(
            F.col("value") * F.round(F.exp(-age / 30.0), 12), 8
        ).cast("decimal(18,8)").alias("wv"),
        age.alias("age_days"),
    )
    return w.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_events"),
        F.round(d2d(F.sum("wv")), 6).alias("decay_score"),
        F.round(F.min("age_days"), 6).alias("last_seen_days"),
    )


@query(
    "agg_trimmed_mean",
    oracle="""
    WITH th AS (
      SELECT o_orderpriority,
             CAST(percentile_cont(0.1) WITHIN GROUP (ORDER BY o_totalprice)
                  AS DOUBLE) AS p10,
             CAST(percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)
                  AS DOUBLE) AS p90
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           round(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                           AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS trimmed_mean,
           round(MIN(p10), 6) AS p10,
           round(MIN(p90), 6) AS p90
    FROM orders o JOIN th ON th.o_orderpriority = o.o_orderpriority
    WHERE o_totalprice >= p10 AND o_totalprice <= p90
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
)
def agg_trimmed_mean(spark, sf_dir):
    """10%-trimmed mean of order value per priority — the robust KPI for
    dashboards a single whale order shouldn't move (the estimator
    between the mean agg_stats reports and the median agg_percentile
    reports; win_anomaly_mad is the screening-side sibling). Per-group
    p10/p90 fences use the shared interpolated percentile; the kept
    rows' mean is an exact decimal sum. Fence comparisons happen on
    identical doubles on both engines, so boundary rows land the same
    side everywhere.

    Plan shape: percentile pass → |groups|-row fence table broadcast
    back onto the facts → one map-combined agg. Two scans of the fact
    table, no window over it."""
    o = load_table(spark, sf_dir, "orders")
    th = o.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.1)).alias("p10"),
        F.percentile("o_totalprice", F.lit(0.9)).alias("p90"),
    )
    return (
        o.join(F.broadcast(th), "o_orderpriority")
        .filter(
            (F.col("o_totalprice") >= F.col("p10"))
            & (F.col("o_totalprice") <= F.col("p90"))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.round(d2d(F.sum(dec("o_totalprice", 2))) / F.count("*"), 6).alias(
                "trimmed_mean"
            ),
            F.round(F.min("p10"), 6).alias("p10"),
            F.round(F.min("p90"), 6).alias("p90"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "ts_acf",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS t,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      FROM orders GROUP BY 1
    ), pairs AS (
      SELECT l.lag, a.rev AS x, b.rev AS y
      FROM daily a
      JOIN (SELECT unnest(range(1, 15)) AS lag) l ON true
      JOIN daily b ON b.t = a.t - l.lag
    ), s AS (
      SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
             CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
             CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy,
             CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
             CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy
      FROM pairs GROUP BY lag
    )
    SELECT CAST(lag AS INTEGER) AS lag, n AS n_pairs,
           round((n * sxy - sx * sy)
                 / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
             AS acf
    FROM s ORDER BY lag
    """,
)
def ts_acf(spark, sf_dir):
    """Sample autocorrelation function of daily revenue at lags 1–14 —
    the diagnostic that DECIDES the seasonality period before anyone
    runs ts_seasonal_index_dow / ts_stl_decompose (a weekly rhythm
    shows as a spike at lag 7 and 14; agg_autocorr_lag1 is this op's
    single-lag special case on the per-user event series). Per lag:
    Pearson over (y_t, y_{t−lag}) day pairs from exact decimal power
    sums rendered once to double.

    Plan shape: facts → day domain once (map-combined agg), a 14-row
    lag grid joined against the day table (14× a ~|days|-row table,
    not 14 scans of the facts), one hash agg to 14 rows. The pair join
    is an equi-join on (t − lag) — no windows, no self-cross."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit(_EPOCH).cast("date")).alias("t")
    ).agg(F.sum(dec("o_totalprice", 2)).alias("rev"))
    lags = spark.range(1, 15).select(F.col("id").cast("int").alias("lag"))
    a = daily.select("t", F.col("rev").alias("x"))
    b = daily.select(F.col("t").alias("tprev"), F.col("rev").alias("y"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .withColumn("tprev", F.col("t") - F.col("lag"))
        .join(b, "tprev")
    )
    s = pairs.groupBy("lag").agg(
        F.count("*").cast("long").alias("n"),
        d2d(F.sum("x")).alias("sx"),
        d2d(F.sum("y")).alias("sy"),
        d2d(F.sum(F.col("x") * F.col("y"))).alias("sxy"),
        d2d(F.sum(F.col("x") * F.col("x"))).alias("sxx"),
        d2d(F.sum(F.col("y") * F.col("y"))).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return s.select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_pairs"),
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("acf"),
    ).orderBy("lag")


def _hw_fold(x, l, b, s0, seasonals):
    """Holt–Winters step as an engine-parametric expression template.

    ``x``/``l``/``b``/``s0`` are the engine's subscript spellings for the
    incoming value, level, trend, and the 7-steps-ago seasonal;
    ``seasonals`` the rotated tail (positions 2..7 of the seasonal ring).
    α=0.5, β=0.3, γ=0.2; every component rounds to 6 dp into decimal so
    the fold is bit-identical on both engines (the ts_holt_linear
    discipline; ℓₜ is inlined where bₜ/sₜ need it because fold lambdas
    can't bind intermediates).
    """
    lt = f"round(0.5 * ({x} - {s0}) + 0.5 * ({l} + {b}), 6)"
    bt = f"round(0.3 * ({lt} - {l}) + 0.7 * {b}, 6)"
    st = f"round(0.2 * ({x} - {lt}) + 0.8 * {s0}, 6)"
    parts = [lt, bt] + seasonals + [st]
    return ", ".join(f"CAST({p} AS DECIMAL(18,6))" for p in parts)


_HW_SPARK = _hw_fold(
    "x[0]", "acc[0]", "acc[1]", "acc[2]", [f"acc[{i}]" for i in range(3, 9)]
)
_HW_DUCK = _hw_fold(
    "p[1]", "acc[1]", "acc[2]", "acc[3]", [f"acc[{i}]" for i in range(4, 10)]
)


@query(
    "ts_holt_winters",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS v
      FROM orders GROUP BY 1
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             list([CAST(v AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)),
                   CAST(0 AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)),
                   CAST(0 AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)),
                   CAST(0 AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)),
                   CAST(0 AS DECIMAL(18,6))] ORDER BY day) AS vs
      FROM daily
    ), folded AS (
      SELECT n_days, list_reduce(vs, (acc, p) -> [{_HW_DUCK}]) AS st FROM s
    )
    SELECT CAST(h AS INTEGER) AS h,
           CAST(CAST(st[1] AS VARCHAR) AS DOUBLE) AS level,
           CAST(CAST(st[2] AS VARCHAR) AS DOUBLE) AS trend,
           round(CAST(CAST(st[1] AS VARCHAR) AS DOUBLE)
                 + h * CAST(CAST(st[2] AS VARCHAR) AS DOUBLE)
                 + CAST(CAST(st[2 + h] AS VARCHAR) AS DOUBLE), 6)
             AS forecast
    FROM folded, unnest(range(1, 8)) AS r(h)
    ORDER BY h
    """,
)
def ts_holt_winters(spark, sf_dir):
    """Additive Holt–Winters (triple-exponential) smoothing of the daily
    revenue series, period 7 — level + trend + a weekly seasonal ring
    (Winters 1960), emitting the 1–7-day-ahead forecast fan:
    ŷ(t+h) = ℓ + h·b + s_{t+h−7}. Completes the forecasting ladder
    (snaive baseline → ts_ewma → ts_holt_linear → this, the first
    member that models the dow rhythm ts_acf/ts_seasonal_index_dow
    diagnose). Zero-init seasonals (the level absorbs week one — the
    standard simplified init). The bias is MEASURED, not assumed:
    ts_forecast_backtest holds out the final week and scores this fold
    against seasonal-naive — MAE 1,873,370 vs snaive 2,772,912 at sf0.1
    (HW wins) but 1,767,947 vs 978,671 at sf0.01 (snaive wins on the
    smaller series). Run the backtest per-series before preferring this
    model; on short or highly-stationary series the baseline is better.

    The recursion threads a 9-element [ℓ, b, s₁..s₇] decimal state
    through the same left fold as ts_holt_linear, every component
    rounded to 6 dp so both engines' folds are bit-identical; the
    seasonal ring rotates by list slicing inside the lambda. Built on
    the GLOBAL day domain (dense), not per-user series, because
    row-indexed seasonality under per-user day gaps would desync from
    the calendar.

    Plan shape: facts → day domain (map-combined), ONE single-row fold
    over the date-span-bounded array, 7 output rows. The fold is
    inherently sequential — but over |days| elements, not |facts|."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        d2d(F.sum(dec("o_totalprice", 2))).alias("v")
    )
    zeros = ", ".join(["CAST(0 AS DECIMAL(18,6))"] * 8)
    s = daily.agg(
        F.count("*").cast("long").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, v))),"
            f" p -> array(CAST(p.v AS DECIMAL(18,6)), {zeros}))"
        ).alias("vs"),
    )
    folded = s.select(
        "n_days",
        F.expr(
            "aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1),"
            f" (acc, x) -> array({_HW_SPARK}))"
        ).alias("st"),
    )
    hs = spark.range(1, 8).select(F.col("id").cast("int").alias("h"))
    return (
        folded.crossJoin(F.broadcast(hs))
        .select(
            "h",
            d2d(F.expr("st[0]")).alias("level"),
            d2d(F.expr("st[1]")).alias("trend"),
            F.round(
                d2d(F.expr("st[0]"))
                + F.col("h") * d2d(F.expr("st[1]"))
                + d2d(F.expr("st[1 + h]")),
                6,
            ).alias("forecast"),
        )
        .orderBy("h")
    )


@query(
    "ts_forecast_backtest",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS v
      FROM orders GROUP BY 1
    ), s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             list(CAST(v AS DECIMAL(18,6)) ORDER BY day) AS xs,
             list([CAST(v AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)),
                   CAST(0 AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)),
                   CAST(0 AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)),
                   CAST(0 AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)),
                   CAST(0 AS DECIMAL(18,6))] ORDER BY day) AS vs
      FROM daily
    ), folded AS (
      SELECT n_days, xs,
             list_reduce(vs[1 : n_days - 7], (acc, p) -> [{_HW_DUCK}]) AS st
      FROM s
    ), errs AS (
      SELECT n_days, xs, st,
             list_transform(range(1, 8), h ->
               abs(xs[n_days - 7 + h]
                   - CAST(st[1] + h * st[2] + st[2 + h] AS DECIMAL(18,6))))
               AS e_hw,
             list_transform(range(1, 8), h ->
               abs(xs[n_days - 7 + h] - xs[n_days - 14 + h])) AS e_sn
      FROM folded
    )
    SELECT n_days,
           CAST(7 AS INTEGER) AS horizon,
           round(CAST(CAST(list_reduce(list_prepend(CAST(0 AS DECIMAL(18,6)),
                     e_hw), (a, b) -> CAST(a + b AS DECIMAL(18,6)))
                 AS VARCHAR) AS DOUBLE) / 7, 6) AS mae_hw,
           round(CAST(CAST(list_reduce(list_prepend(CAST(0 AS DECIMAL(18,6)),
                     e_sn), (a, b) -> CAST(a + b AS DECIMAL(18,6)))
                 AS VARCHAR) AS DOUBLE) / 7, 6) AS mae_snaive
    FROM errs
    """,
)
def ts_forecast_backtest(spark, sf_dir):
    """Holdout backtest of ts_holt_winters against the seasonal-naive
    baseline it must beat to justify existing (VERDICT r5 item 8): hold
    out the LAST 7 days of the daily revenue series, fit the identical
    zero-init decimal Holt-Winters fold on the prefix, forecast
    h=1..7 as ℓ + h·b + s_h, and score both methods by MAE over the
    holdout (snaive: ŷ(t+h) = y(t+h−7), the agg_forecast_snaive rule).
    One row: the honest answer to "did the extra model earn its keep" —
    and the measured cost of the zero-init seasonal bias the
    ts_holt_winters docstring declares (week one absorbs into the
    level, so early seasonals under-rotate).

    All errors stay exact DECIMAL(18,6) through the sums (6-dp values
    sum losslessly); only the final /7 MAE is a rounded double. Plan
    shape identical to ts_holt_winters: facts → day domain, one
    single-row fold over the prefix array, array-world error math — no
    explode, no extra shuffle beyond the day agg."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        d2d(F.sum(dec("o_totalprice", 2))).alias("v")
    )
    zeros = ", ".join(["CAST(0 AS DECIMAL(18,6))"] * 8)
    s = daily.agg(
        F.count("*").cast("long").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, v))),"
            " p -> CAST(p.v AS DECIMAL(18,6)))"
        ).alias("xs"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, v))),"
            f" p -> array(CAST(p.v AS DECIMAL(18,6)), {zeros}))"
        ).alias("vs"),
    )
    folded = s.select(
        "n_days",
        "xs",
        F.expr(
            "aggregate(slice(vs, 2, size(vs) - 8), element_at(vs, 1),"
            f" (acc, x) -> array({_HW_SPARK}))"
        ).alias("st"),
    )
    dsum6 = (
        "aggregate({arr}, CAST(0 AS DECIMAL(18,6)),"
        " (a, b) -> CAST(a + b AS DECIMAL(18,6)))"
    )
    errs = folded.select(
        "n_days",
        F.expr(
            "transform(sequence(1, 7), h ->"
            " abs(element_at(xs, CAST(n_days - 7 + h AS INT))"
            "     - CAST(st[0] + h * st[1] + st[1 + h] AS DECIMAL(18,6))))"
        ).alias("e_hw"),
        F.expr(
            "transform(sequence(1, 7), h ->"
            " abs(element_at(xs, CAST(n_days - 7 + h AS INT))"
            "     - element_at(xs, CAST(n_days - 14 + h AS INT))))"
        ).alias("e_sn"),
    )
    return errs.select(
        "n_days",
        F.lit(7).cast("int").alias("horizon"),
        F.round(d2d(F.expr(dsum6.format(arr="e_hw"))) / 7, 6).alias("mae_hw"),
        F.round(d2d(F.expr(dsum6.format(arr="e_sn"))) / 7, 6).alias("mae_snaive"),
    )


@query(
    "ts_holt_damped",
    oracle=f"""
    WITH daily AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             {sql_dsum("value")} AS v
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), s AS (
      SELECT user_id,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             list([CAST(v AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))]
                  ORDER BY day) AS vs
      FROM daily GROUP BY user_id
    ), folded AS (
      SELECT user_id, n_days,
             list_reduce(vs, (acc, p) ->
               [CAST(round(0.5 * p[1] + 0.5 * (acc[1] + 0.9 * acc[2]), 6)
                     AS DECIMAL(18,6)),
                CAST(round(0.3 * (round(0.5 * p[1]
                             + 0.5 * (acc[1] + 0.9 * acc[2]), 6)
                           - acc[1]) + 0.63 * acc[2], 6)
                     AS DECIMAL(18,6))]) AS st
      FROM s
    )
    SELECT user_id, n_days,
           CAST(CAST(st[1] AS VARCHAR) AS DOUBLE) AS level,
           CAST(CAST(st[2] AS VARCHAR) AS DOUBLE) AS trend,
           round(CAST(CAST(st[1] AS VARCHAR) AS DOUBLE)
                 + 4.6953279 * CAST(CAST(st[2] AS VARCHAR) AS DOUBLE), 6)
             AS forecast_7d
    FROM folded
    """,
)
def ts_holt_damped(spark, sf_dir):
    """Damped-trend Holt smoothing per user series (Gardner & McKenzie
    1985) — the variant that fixed linear Holt's overshoot on long
    horizons and is the robust default in the M-competition lineage:
    ℓₜ = α·xₜ + (1−α)(ℓ + φ·b), bₜ = β(ℓₜ−ℓ) + (1−β)·φ·b with α=0.5,
    β=0.3, φ=0.9; the h-step forecast flattens toward a finite asymptote
    via the damped sum ŷ(t+7) = ℓ + (φ+φ²+…+φ⁷)·b = ℓ + 4.6953279·b
    (constant folded exactly — Σφⁱ of 0.9 over 7 steps). (1−β)·φ is
    pre-folded to the single exact literal 0.63 so both engines see one
    decimal multiply.

    Same two-variable decimal fold discipline as ts_holt_linear (every
    component rounded to 6 dp into DECIMAL(18,6) so the folds are
    bit-identical across engines; ℓₜ inlined where bₜ needs it), same
    plan shape: daily pre-aggregate collapses the stream, one fold per
    user over a date-span-bounded array inside a single groupBy —
    embarrassingly parallel across series at any corpus size."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("user_id", F.col("ts").cast("date").alias("day")).agg(
        dsum("value").alias("v")
    )
    s = daily.groupBy("user_id").agg(
        F.count("*").alias("n_days"),
        F.expr(
            "transform(array_sort(collect_list(struct(day, v))),"
            " p -> array(CAST(p.v AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))))"
        ).alias("vs"),
    )
    lnew = "round(0.5 * x[0] + 0.5 * (acc[0] + 0.9 * acc[1]), 6)"
    folded = s.select(
        "user_id",
        "n_days",
        F.expr(
            "aggregate(slice(vs, 2, size(vs) - 1), element_at(vs, 1),"
            f" (acc, x) -> array(CAST({lnew} AS DECIMAL(18,6)),"
            f" CAST(round(0.3 * ({lnew} - acc[0]) + 0.63 * acc[1], 6)"
            " AS DECIMAL(18,6))))"
        ).alias("st"),
    )
    return folded.select(
        "user_id",
        "n_days",
        d2d(F.expr("st[0]")).alias("level"),
        d2d(F.expr("st[1]")).alias("trend"),
        F.round(
            d2d(F.expr("st[0]")) + 4.6953279 * d2d(F.expr("st[1]")), 6
        ).alias("forecast_7d"),
    )


@query(
    "ts_rolling_slope",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             SUM(CAST(value AS DECIMAL(18,2))) AS v
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), d AS (
      SELECT event_type, day,
             CAST(day - DATE '2024-01-01' AS BIGINT) AS x, v
      FROM daily
    ), f AS (
      SELECT event_type, day,
             COUNT(*) OVER w AS n,
             SUM(x) OVER w AS sx,
             SUM(x * x) OVER w AS sxx,
             CAST(SUM(v) OVER w AS DECIMAL(18,2)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(8,0)) * v) OVER w
                  AS DECIMAL(18,2)) AS sxy
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ), g AS (
      SELECT event_type, day, n, sx, sy,
             CAST(CAST(CAST(n AS DECIMAL(4,0)) * sxy
                       - CAST(sx AS DECIMAL(8,0)) * sy AS VARCHAR) AS DOUBLE)
               / CAST(n * sxx - sx * sx AS DOUBLE) AS slope
      FROM f WHERE n = 14
    )
    SELECT event_type, day, slope,
           (CAST(CAST(sy AS VARCHAR) AS DOUBLE)
              - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
    FROM g
    ORDER BY event_type, day
    """,
)
def ts_rolling_slope(spark, sf_dir):
    """Rolling 14-day OLS regression (slope + intercept) of each event
    type's daily value series — the trend-estimation window behind
    "is this metric accelerating" dashboards and linear drift alarms,
    strictly stronger than a moving average (which can't distinguish a
    level shift from a trend). x is the TRUE epoch-day index, so calendar
    gaps in the series are handled by the regression itself rather than
    silently treated as adjacent points.

    Numeric discipline: the classic closed form needs only frame sums —
    n, Σx, Σx², Σy, Σxy. Σx/Σx² stay in BIGINT; Σy/Σxy fold in exact
    DECIMAL (value quantized to 2dp first), so every frame statistic is
    bit-identical across engines regardless of accumulation order; only
    the final slope/intercept divisions run in double, with identical
    operand trees on both engines (decimal→double goes through the
    string cast — see core.d2d). covar_pop/var_pop window aggregates
    would be the obvious alternative but their streaming co-moment
    accumulation order is engine-specific, which is exactly the
    portability trap the sum form avoids.

    Scale shape: one map-side-combinable shuffle reduces the fact table
    to (event_type × day) — bounded by the calendar times the type
    cardinality, NOT the fact-table row count — and the window runs on
    that tiny domain partitioned by event_type. At 100 TB the heavy
    stage is the partial agg on the scan, which is embarrassingly
    parallel; the window stage is invariant-sized."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(dec("value", 2)).alias("v"))
    d = daily.withColumn(
        "x", F.datediff(F.col("day"), F.lit("2024-01-01").cast("date")).cast("bigint")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-13, Window.currentRow)
    )
    f = d.select(
        "event_type",
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("sxx"),
        F.sum("v").over(w).cast("decimal(18,2)").alias("sy"),
        F.sum(F.col("x").cast("decimal(8,0)") * F.col("v"))
        .over(w)
        .cast("decimal(18,2)")
        .alias("sxy"),
    )
    g = f.filter(F.col("n") == 14).select(
        "event_type",
        "day",
        "n",
        "sx",
        "sy",
        (
            d2d(
                F.col("n").cast("decimal(4,0)") * F.col("sxy")
                - F.col("sx").cast("decimal(8,0)") * F.col("sy")
            )
            / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        ).alias("slope"),
    )
    return g.select(
        "event_type",
        "day",
        "slope",
        (
            (d2d(F.col("sy")) - F.col("slope") * F.col("sx").cast("double"))
            / F.col("n").cast("double")
        ).alias("intercept"),
    ).orderBy("event_type", "day")


@query(
    "agg_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * (1 - CAST(l_discount AS DECIMAL(18,4))))
                  AS DECIMAL(18,6)) AS r
      FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ), per_nation AS (
      SELECT s_nationkey,
             COUNT(*) AS n_suppliers,
             SUM(r) AS tot,
             SUM(CAST(r AS DECIMAL(19,6)) * r) AS sumsq
      FROM rev GROUP BY s_nationkey
    )
    SELECT n.n_name,
           CAST(n_suppliers AS BIGINT) AS n_suppliers,
           round(CAST(CAST(tot AS VARCHAR) AS DOUBLE), 2) AS total_revenue,
           round(CAST(CAST(sumsq AS VARCHAR) AS DOUBLE)
                 / (CAST(CAST(tot AS VARCHAR) AS DOUBLE)
                    * CAST(CAST(tot AS VARCHAR) AS DOUBLE)), 6) AS hhi
    FROM per_nation p JOIN nation n ON p.s_nationkey = n.n_nationkey
    ORDER BY n.n_name
    """,
)
def agg_hhi_concentration(spark, sf_dir):
    """Herfindahl–Hirschman market-concentration index of supplier revenue
    within each nation — the standard antitrust/marketplace-health metric
    (HHI = Σ share_i², 1/n for perfect competition, 1.0 for monopoly).
    Computed as Σr_i² / (Σr_i)² so the whole pipeline stays in exact
    decimals: per-supplier revenue sums are DECIMAL(18,6) — NOT 19,6,
    because the square of a p=19 decimal needs precision 39, which Spark
    silently rounds to decimal(38,11) while DuckDB keeps the exact
    38,12 product (ADVICE r7: last digit diverged cross-engine, masked
    only by the final 6-dp round). At 18,6 the square is decimal(37,12)
    exact on BOTH engines, and only the final ratio goes through the
    exact-string double render. (Oracle detail: DuckDB stores
    DECIMAL(18) in int64 and overflows the raw 18×18 multiply, so the
    oracle widens ONE operand to 19,6 — same exact 37,12 product, but
    computed in int128.) At 100 TB: one
    lineitem shuffle on l_suppkey with map-side combine (supplier's
    broadcast hint is byte-gated via operators/tpch._dim_hint — the dim
    is sf-proportional at ~10k rows/sf), then a 25-key nation rollup —
    the fact table is
    touched once."""
    from .tpch import _dim_hint

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(_dim_hint(spark, sf_dir, "supplier")(s), li["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.sum(
                dec("l_extendedprice", 2)
                * (F.lit(1).cast("decimal(18,4)") - dec("l_discount", 4))
            )
            .cast("decimal(18,6)")
            .alias("r")
        )
    )
    per_nation = rev.groupBy("s_nationkey").agg(
        F.count("*").alias("n_suppliers"),
        F.sum("r").alias("tot"),
        F.sum(F.col("r") * F.col("r")).alias("sumsq"),
    )
    return (
        per_nation.join(
            F.broadcast(n), per_nation["s_nationkey"] == n["n_nationkey"]
        )
        .select(
            "n_name",
            F.col("n_suppliers").cast("long").alias("n_suppliers"),
            F.round(d2d(F.col("tot")), 2).alias("total_revenue"),
            F.round(
                d2d(F.col("sumsq")) / (d2d(F.col("tot")) * d2d(F.col("tot"))), 6
            ).alias("hhi"),
        )
        .orderBy("n_name")
    )


@query(
    "ts_cross_correlation",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ), x AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events
      WHERE event_type = 'view' GROUP BY 1
    ), y AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS c FROM events
      WHERE event_type = 'purchase' GROUP BY 1
    ), series AS (
      SELECT d.day, COALESCE(x.c, 0) AS xv, COALESCE(y.c, 0) AS yv
      FROM days d LEFT JOIN x ON d.day = x.day LEFT JOIN y ON d.day = y.day
    ), pairs AS (
      SELECT l.lag, a.xv AS xv, b.yv AS yv
      FROM series a
      JOIN (SELECT unnest(range(0, 8)) AS lag) l ON TRUE
      JOIN series b ON b.day = a.day + CAST(l.lag AS INTEGER)
    ), sums AS (
      SELECT lag, COUNT(*) AS n,
             CAST(SUM(xv) AS HUGEINT) AS sx, CAST(SUM(yv) AS HUGEINT) AS sy,
             CAST(SUM(CAST(xv AS HUGEINT) * yv) AS HUGEINT) AS sxy,
             CAST(SUM(CAST(xv AS HUGEINT) * xv) AS HUGEINT) AS sxx,
             CAST(SUM(CAST(yv AS HUGEINT) * yv) AS HUGEINT) AS syy
      FROM pairs GROUP BY lag
    ), terms AS (
      SELECT lag, n,
             CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DECIMAL(38,0)) AS num,
             CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DECIMAL(38,0)) AS dx,
             CAST(CAST(n AS HUGEINT) * syy - sy * sy AS DECIMAL(38,0)) AS dy
      FROM sums
    )
    SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_days,
           CAST(CAST(num AS VARCHAR) AS DOUBLE)
             / sqrt(CAST(CAST(dx AS VARCHAR) AS DOUBLE))
             / sqrt(CAST(CAST(dy AS VARCHAR) AS DOUBLE)) AS xcorr_raw
    FROM terms ORDER BY lag
    """,
)
def ts_cross_correlation(spark, sf_dir):
    """Lead–lag cross-correlation between two behavioral series — daily
    'view' counts vs daily 'purchase' counts shifted 0..7 days later (the
    classic does-browsing-predict-buying question; the peak lag is the
    conversion latency a marketing team reads off this table).

    Pearson r at each lag from exact INTEGER power sums (n, Σx, Σy, Σxy,
    Σx², Σy²), with the n·Σxy − Σx·Σy products computed in DECIMAL(38,0)
    / HUGEINT (daily counts at 100 TB reach 1e9+, so the cross products
    pass the int64 ceiling — the agg_aqp_estimate overflow lesson). The
    raw correlation is left unrounded double (xcorr_raw): every input is
    an identical exact double on both engines and /, sqrt are correctly
    rounded IEEE ops, so the full expression is bit-deterministic.

    Plan: ONE events shuffle builds the (day, x, y) series (two
    conditional counts in the same agg); the series is day-domain-sized,
    so the lag fan-out (8-row broadcast grid) and the self-join are
    dim-table work. Zero-count days come from the distinct-day grid, not
    gap-filling, so a quiet day correctly contributes 0, not a gap."""
    ev = load_table(spark, sf_dir, "events")
    series = (
        ev.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day")
        .agg(
            F.count(F.when(F.col("event_type") == "view", 1)).alias("xv"),
            F.count(F.when(F.col("event_type") == "purchase", 1)).alias("yv"),
        )
    )
    lags = spark.range(0, 8).select(F.col("id").cast("int").alias("lag"))
    a, b = series.alias("a"), series.alias("b")
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(
            b,
            F.col("b.day") == F.date_add(F.col("a.day"), F.col("lag")),
        )
        .select("lag", F.col("a.xv").alias("xv"), F.col("b.yv").alias("yv"))
    )
    d38 = "decimal(38,0)"
    sums = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("xv").cast(d38).alias("sx"),
        F.sum("yv").cast(d38).alias("sy"),
        F.sum(F.col("xv").cast(d38) * F.col("yv")).alias("sxy"),
        F.sum(F.col("xv").cast(d38) * F.col("xv")).alias("sxx"),
        F.sum(F.col("yv").cast(d38) * F.col("yv")).alias("syy"),
    )
    num = (F.col("n").cast(d38) * F.col("sxy") - F.col("sx") * F.col("sy")).cast(d38)
    dx = (F.col("n").cast(d38) * F.col("sxx") - F.col("sx") * F.col("sx")).cast(d38)
    dy = (F.col("n").cast(d38) * F.col("syy") - F.col("sy") * F.col("sy")).cast(d38)
    return sums.select(
        F.col("lag").cast("long").alias("lag"),
        F.col("n").cast("long").alias("n_days"),
        (d2d(num) / F.sqrt(d2d(dx)) / F.sqrt(d2d(dy))).alias("xcorr_raw"),
    ).orderBy("lag")


# Count–min sketch hash rows: pairwise-independent (a·x + b) mod p mod w
# with p = 2^31 − 1 (Mersenne prime) and w = 1024. Fixed constants so the
# sketch — and therefore the oracle comparison — is fully deterministic.
_CMS_P = 2147483647
_CMS_W = 1024
_CMS_ROWS = [(0, 31, 7), (1, 137, 41), (2, 1009, 97), (3, 65537, 19)]


@query(
    "agg_cms_heavy_hitters",
    oracle=f"""
    WITH params AS (
      SELECT * FROM (VALUES {", ".join(f"({j}, {a}, {b})" for j, a, b in _CMS_ROWS)})
        AS t(j, a, b)
    ), counters AS (
      SELECT j, ((a * (user_id % {_CMS_P}) + b) % {_CMS_P}) % {_CMS_W} AS bucket,
             COUNT(*) AS c
      FROM events, params
      GROUP BY 1, 2
    ), exact AS (
      SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id
    ), est AS (
      SELECT e.user_id, e.exact_count, MIN(c.c) AS est_count
      FROM exact e
      JOIN params p ON TRUE
      JOIN counters c
        ON c.j = p.j
       AND c.bucket = ((p.a * (e.user_id % {_CMS_P}) + p.b) % {_CMS_P}) % {_CMS_W}
      GROUP BY e.user_id, e.exact_count
    )
    SELECT user_id, CAST(est_count AS BIGINT) AS est_count,
           CAST(exact_count AS BIGINT) AS exact_count,
           CAST(est_count - exact_count AS BIGINT) AS overcount
    FROM est
    ORDER BY est_count DESC, user_id
    LIMIT 20
    """,
)
def agg_cms_heavy_hitters(spark, sf_dir):
    """Count–min-sketch heavy hitters over the event stream (Cormode &
    Muthukrishnan 2005): d=4 hash rows × w=1024 counters, explicit
    (a·x+b) mod p mod w universal hashing with pinned constants so both
    engines build the IDENTICAL sketch (keys reduce mod p BEFORE the
    multiply, so a·x stays under p² ≈ 4.6e18 < 2^63 for ANY 64-bit key —
    snowflake-scale ids cannot overflow the hash) — and the one-sided error
    guarantee (estimate ≥ exact, overcount bounded by collisions) is
    verified IN the output by joining the estimates back to exact counts.

    The 100 TB shape this demonstrates: the sketch state is 4×1024
    counters REGARDLESS of stream size — the counter build is one
    map-side-combinable aggregation (events × 4 hash rows), and the
    readout joins the 4096-row counter table back by BROADCAST, so no
    corpus-sized shuffle happens after the count. In production the
    counter table is the mergeable per-partition state (sum across
    partitions = sketch of the union), which is exactly why CMS beats
    exact counting when the key domain is too big to hold; the exact
    side here exists as the honesty check at fixture scale."""
    ev = load_table(spark, sf_dir, "events")
    params = spark.createDataFrame(_CMS_ROWS, "j INT, a LONG, b LONG")
    counters = (
        ev.crossJoin(F.broadcast(params))
        .select(
            "j",
            (
                (F.col("a") * (F.col("user_id") % _CMS_P) + F.col("b")) % _CMS_P % _CMS_W
            ).alias("bucket"),
        )
        .groupBy("j", "bucket")
        .agg(F.count("*").alias("c"))
    )
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    est = (
        exact.crossJoin(F.broadcast(params))
        .select(
            "user_id",
            "exact_count",
            "j",
            (
                (F.col("a") * (F.col("user_id") % _CMS_P) + F.col("b")) % _CMS_P % _CMS_W
            ).alias("bucket"),
        )
        .join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("user_id", "exact_count")
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.select(
            "user_id",
            F.col("est_count").cast("long").alias("est_count"),
            F.col("exact_count").cast("long").alias("exact_count"),
            (F.col("est_count") - F.col("exact_count"))
            .cast("long")
            .alias("overcount"),
        )
        .orderBy(F.col("est_count").desc(), "user_id")
        .limit(20)
    )


@query(
    "agg_session_stats",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
      SELECT user_id,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id,
             ts
      FROM g
    ), sess AS (
      SELECT user_id, sess_id, COUNT(*) AS n_events,
             (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS dur_sec
      FROM s GROUP BY user_id, sess_id
    ), bucketed AS (
      SELECT CASE WHEN dur_sec = 0 THEN '0_single_instant'
                  WHEN dur_sec < 600 THEN '1_under_10min'
                  WHEN dur_sec < 3600 THEN '2_under_1h'
                  ELSE '3_over_1h' END AS bucket,
             n_events, dur_sec
      FROM sess
    ), tot AS (SELECT COUNT(*) AS t FROM bucketed)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_sessions,
           round(COUNT(*) * 1.0 / MAX(t), 6) AS pct_sessions,
           round(SUM(n_events) * 1.0 / COUNT(*), 6) AS mean_events,
           round(SUM(dur_sec) * 1.0 / COUNT(*), 6) AS mean_dur_sec
    FROM bucketed JOIN tot ON TRUE
    GROUP BY bucket ORDER BY bucket
    """,
)
def agg_session_stats(spark, sf_dir):
    """Session-duration distribution — the product-analytics companion to
    win_sessionize (same 30-minute-gap, epoch-microsecond session
    definition): sessions bucketed by duration with count, share, mean
    events, and mean duration per bucket. The shape of this table is the
    first thing an engagement dashboard shows; its drift is a
    bot/instrumentation alarm (a spike in single-instant sessions is
    double-firing, a fat over-1h bucket is a missing logout event).

    All arithmetic on exact integers (epoch-µs diffs floor-divided to
    whole seconds; counts), ratios rendered once at 6 dp. Plan: ONE
    user-keyed exchange serves both window passes (lag then running sum,
    identical partitioning), the session rollup groups on (user, sess) —
    a refinement of the same partitioning, no new shuffle — and the
    bucket rollup is a 4-key agg with a one-row total crossJoined for
    the share."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            (
                F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
                > 1_800_000_000
            )
            | F.lag("ts").over(w).isNull(),
            1,
        )
        .otherwise(0)
        .alias("new_sess"),
    )
    s = g.select(
        "user_id",
        "ts",
        F.sum("new_sess")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("sess_id"),
    )
    sess = s.groupBy("user_id", "sess_id").agg(
        F.count("*").alias("n_events"),
        F.expr(
            "(unix_micros(MAX(ts)) - unix_micros(MIN(ts))) div 1000000"
        ).alias("dur_sec"),
    )
    bucketed = sess.select(
        F.when(F.col("dur_sec") == 0, "0_single_instant")
        .when(F.col("dur_sec") < 600, "1_under_10min")
        .when(F.col("dur_sec") < 3600, "2_under_1h")
        .otherwise("3_over_1h")
        .alias("bucket"),
        "n_events",
        "dur_sec",
    )
    tot = bucketed.agg(F.count("*").alias("t"))
    return (
        bucketed.crossJoin(F.broadcast(tot))
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.round(F.count("*") / F.max("t"), 6).alias("pct_sessions"),
            F.round(F.sum("n_events") / F.count("*"), 6).alias("mean_events"),
            F.round(F.sum("dur_sec") / F.count("*"), 6).alias("mean_dur_sec"),
        )
        .orderBy("bucket")
    )


@query(
    "agg_ship_latency",
    oracle="""
    WITH j AS (
      SELECT o.o_orderpriority AS priority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS lat
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    )
    SELECT priority,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           round(SUM(lat) * 1.0 / COUNT(*), 6) AS mean_days,
           CAST(MIN(lat) AS BIGINT) AS min_days,
           CAST(MAX(lat) AS BIGINT) AS max_days,
           CAST(SUM(CASE WHEN lat > 90 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_over_90d,
           round(SUM(CASE WHEN lat > 90 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS pct_over_90d
    FROM j GROUP BY priority ORDER BY priority
    """,
)
def agg_ship_latency(spark, sf_dir):
    """Order-to-ship latency SLA report per order priority — the
    fulfillment dashboard every ops team runs (and the check that
    priority actually BUYS latency: URGENT should dominate LOW here, or
    the priority field is decorative). Mean/min/max whole-day latencies
    from exact DATE diffs plus a 90-day SLA-breach rate.

    Plan: one orders⋈lineitem equi-join on the orderkey (at 100 TB both
    sides bucket by orderkey — the canonical co-located fact-fact join,
    same layout sink_bucketed_colocated_join demonstrates), then a
    5-key priority rollup with map-side combine. Latency stays in exact
    integer days; only the final rates render to doubles."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderpriority").alias("priority"), "o_orderdate"
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    j = o.join(li, o["o_orderkey"] == li["l_orderkey"]).select(
        "priority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("lat"),
    )
    over = F.when(F.col("lat") > 90, 1).otherwise(0)
    return (
        j.groupBy("priority")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.round(F.sum("lat") / F.count("*"), 6).alias("mean_days"),
            F.min("lat").cast("long").alias("min_days"),
            F.max("lat").cast("long").alias("max_days"),
            F.sum(over).cast("long").alias("n_over_90d"),
            F.round(F.sum(over) / F.count("*"), 6).alias("pct_over_90d"),
        )
        .orderBy("priority")
    )


@query(
    "ts_sma_crossover",
    oracle="""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS rev
      FROM orders GROUP BY 1
    ), sma AS (
      SELECT day,
             COUNT(*) OVER w7 AS n7, COUNT(*) OVER w28 AS n28,
             SUM(rev) OVER w7 AS s7, SUM(rev) OVER w28 AS s28
      FROM daily
      WINDOW w7 AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW),
             w28 AS (ORDER BY day ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)
    ), full_sma AS (
      -- exact rational comparison: sma7 > sma28 <=> s7*n28 > s28*n7
      SELECT day,
             CASE WHEN s7 * n28 > s28 * n7 THEN 1 ELSE 0 END AS fast_above
      FROM sma WHERE n28 = 28
    ), flags AS (
      SELECT day, fast_above,
             lag(fast_above) OVER (ORDER BY day) AS prev
      FROM full_sma
    )
    SELECT day,
           CASE WHEN fast_above = 1 THEN 'golden_cross'
                ELSE 'death_cross' END AS signal
    FROM flags WHERE prev IS NOT NULL AND fast_above <> prev
    ORDER BY day
    """,
)
def ts_sma_crossover(spark, sf_dir):
    """Moving-average crossover signals on daily order revenue — SMA(7)
    crossing SMA(28) up (golden cross) or down (death cross), the
    classic momentum-regime detector, emitted only on CHANGE days. The
    comparison is the exact rational s7·n28 > s28·n7 on decimal window
    sums — no division ever happens, so the signal day set is
    bit-deterministic on both engines (a double SMA comparison could
    flip a knife-edge day per engine).

    Plan: one orders shuffle to the day domain, then two frame sums over
    the SAME ordered window (one sort serves both frames) on the
    day-domain table — the bounded-domain single-sort trade every ts_*
    op documents; the crossover lag is a third pass over the same
    ordering. Emits only regime changes, so output is sparse."""
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.sum(dec("o_totalprice", 2)).cast("decimal(18,2)").alias("rev"))
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    w28 = Window.orderBy("day").rowsBetween(-27, 0)
    sma = daily.select(
        "day",
        F.count("*").over(w7).alias("n7"),
        F.count("*").over(w28).alias("n28"),
        F.sum("rev").over(w7).alias("s7"),
        F.sum("rev").over(w28).alias("s28"),
    )
    full = sma.filter(F.col("n28") == 28).select(
        "day",
        F.when(
            F.col("s7") * F.col("n28") > F.col("s28") * F.col("n7"), 1
        )
        .otherwise(0)
        .alias("fast_above"),
    )
    flags = full.select(
        "day",
        "fast_above",
        F.lag("fast_above").over(Window.orderBy("day")).alias("prev"),
    )
    return (
        flags.filter(F.col("prev").isNotNull() & (F.col("fast_above") != F.col("prev")))
        .select(
            "day",
            F.when(F.col("fast_above") == 1, "golden_cross")
            .otherwise("death_cross")
            .alias("signal"),
        )
        .orderBy("day")
    )
