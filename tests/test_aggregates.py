"""Semantic checks for the rows-only aggregates (no SQL oracle possible)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_suite_spark.io import load_table
from etl_suite_spark.registry import QUERIES
from tests.conftest import SF_DIR


def test_approx_count_distinct_within_3sigma(spark):
    """The query now emits its own honesty metric: exact_users is
    oracle-verified, approx_within_3sigma must hold the sketch to it
    (3*rsd = 15%; measured max rel err 0.67% @ sf0.01, 6.67% @ sf0.1)."""
    rows = QUERIES["agg_approx_count_distinct"](spark, SF_DIR).collect()
    assert rows and all(r["approx_within_3sigma"] for r in rows)
    exact = {
        r["event_type"]: r["exact"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    for r in rows:
        assert r["exact_users"] == exact[r["event_type"]]


def test_approx_percentile_brackets_exact(spark):
    rows = QUERIES["agg_approx_percentile"](spark, SF_DIR).collect()
    assert rows and all(r["approx_within_1pct"] for r in rows)
    o = load_table(spark, SF_DIR, "orders")
    exact = {
        r["o_orderpriority"]: (r["p50"], r["p95"])
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("p50"),
            F.percentile("o_totalprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    for r in rows:
        p50, p95 = exact[r["o_orderpriority"]]
        # discrete percentile sits within the interpolated-percentile band
        assert abs(r["exact_p50"] - p50) / p50 < 0.10
        assert abs(r["exact_p95"] - p95) / p95 < 0.10


def test_sample_fraction_rate_and_determinism(spark):
    df = QUERIES["sample_fraction"](spark, SF_DIR)
    n1, n2 = df.count(), QUERIES["sample_fraction"](spark, SF_DIR).count()
    assert n1 == n2  # seeded → stable across runs in one layout
    total = load_table(spark, SF_DIR, "lineitem").count()
    assert 0.05 * total < n1 < 0.15 * total


def test_sketch_rollup_estimates_near_exact(spark):
    """Weekly HLL estimates (merged from daily sketches) within 5% of the
    exact weekly distinct-user counts, and deterministic across runs."""
    a = QUERIES["agg_sketch_rollup"](spark, SF_DIR).collect()
    b = QUERIES["agg_sketch_rollup"](spark, SF_DIR).collect()
    assert a == b
    ev = load_table(spark, SF_DIR, "events")
    exact = {
        r.week: r.n
        for r in ev.groupBy(
            F.to_date(F.date_trunc("week", "ts")).alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.week for r in a} == set(exact)
    for r in a:
        assert abs(r.approx_users - exact[r.week]) <= max(1, 0.05 * exact[r.week])


def test_heavy_hitters_exact_and_cms_never_prunes(spark):
    """Output equals the plain exact top-k (CMS is a pure prefilter: it
    over-estimates, never under-estimates, so no true hitter is lost)."""
    got = [(r.l_partkey, r.cnt) for r in QUERIES["agg_heavy_hitters"](spark, SF_DIR).collect()]
    li = load_table(spark, SF_DIR, "lineitem")
    exact = [
        (r.l_partkey, r.cnt)
        for r in li.groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= 45)
        .orderBy(F.col("cnt").desc(), "l_partkey")
        .limit(20)
        .collect()
    ]
    assert got == exact
    assert got, "threshold should catch >=1 hitter at this sf"


def test_bm25_rare_term_doc_outranks(spark):
    """Docs containing the rare query term ('dup') must outrank docs with
    only common terms — the idf weighting at work."""
    rows = QUERIES["llm_bm25_search"](spark, SF_DIR).collect()
    assert len(rows) == 15
    assert all(rows[i].bm25 >= rows[i + 1].bm25 for i in range(len(rows) - 1))
    docs = {r.doc_id: r.text for r in load_table(spark, SF_DIR, "documents").collect()}
    top = rows[0]
    assert " dup" in docs[top.doc_id] or docs[top.doc_id].endswith("dup")


def test_unpivot_conserves_rows_and_reads_once(spark):
    """4 measures × N rows melt to exactly 4N values (n per measure = N),
    and the Spark plan contains an Expand over ONE scan, not a 4-way
    union of scans."""
    from etl_suite_spark.io import load_table
    from etl_suite_spark.registry import QUERIES

    out = QUERIES["agg_unpivot"](spark, SF_DIR)
    n = load_table(spark, SF_DIR, "lineitem").count()
    rows = out.collect()
    assert len(rows) == 4
    assert all(r.n == n for r in rows)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Expand" in plan
    assert "Union" not in plan  # one Expand over one scan, not 4 scans


def test_snapshot_diff_reconciles_with_predicates(spark):
    """The diff report's counts must equal direct counts of the synthesis
    predicates: added = keys%103, removed = keys%101, changed ⊇ repriced
    keys that survived the drop."""
    from etl_suite_spark.io import load_table
    from etl_suite_spark.registry import QUERIES

    o = load_table(spark, SF_DIR, "orders")
    n_added = o.filter("o_orderkey % 103 = 0").count()
    n_removed = o.filter("o_orderkey % 101 = 0").count()
    n_changed = o.filter(
        "o_orderkey % 97 = 0 AND o_orderkey % 101 <> 0"
        # a repriced row only counts as changed if the price actually moves
        " AND round(o_totalprice * 1.1, 2) <> o_totalprice"
    ).count()
    rows = {r.change_kind: r.n_rows for r in QUERIES["dq_snapshot_diff"](spark, SF_DIR).collect()}
    assert rows.get("added", 0) == n_added
    assert rows.get("removed", 0) == n_removed
    assert rows.get("changed", 0) == n_changed
    assert rows.get("unchanged", 0) == o.count() - n_removed - n_changed


def test_pareto_classes_partition_and_order(spark):
    """A/B/C partition all customers; A holds ≤80%+one-customer of
    revenue and more revenue-per-customer than C (the Pareto property)."""
    from etl_suite_spark.io import load_table
    from etl_suite_spark.registry import QUERIES

    rows = {r.abc_class: r for r in QUERIES["win_pareto_abc"](spark, SF_DIR).collect()}
    n_cust = (
        load_table(spark, SF_DIR, "orders").select("o_custkey").distinct().count()
    )
    assert sum(r.n_customers for r in rows.values()) == n_cust
    assert abs(sum(r.revenue_share for r in rows.values()) - 1.0) < 1e-5
    if "A" in rows and "C" in rows:
        a, c = rows["A"], rows["C"]
        assert a.class_revenue / a.n_customers > c.class_revenue / c.n_customers


def test_market_basket_mega_basket_cap(spark):
    """Planted mega-basket (250 distinct items > the 200 cap): its rows
    must not enter pair generation — a pair that only reaches the
    c_ab >= 2 bar via the mega-basket disappears, while pairs supported
    by normal baskets alone survive. This bounds the basket self-join at
    ~19.9k pairs per basket on adversarial input (the gram-cap pattern)."""
    from etl_suite_spark.operators.analytics import basket_pair_metrics

    rows = [(1, 10), (1, 20), (1, 30), (1, 40), (2, 30), (2, 40)]
    # mega-basket 99: items 10, 20 plus 248 fillers -> 250 distinct items
    rows += [(99, 10), (99, 20)] + [(99, 1000 + i) for i in range(248)]
    bp = spark.createDataFrame(rows, "o long, p long")
    out = {(r.part_a, r.part_b): r for r in basket_pair_metrics(bp).collect()}
    # (30, 40) co-occurs in baskets 1 and 2 -> kept, c_ab = 2
    assert out[(30, 40)].c_ab == 2
    # (10, 20) co-occurs in basket 1 and the MEGA-basket only -> capped
    # pair generation sees just basket 1, so c_ab = 1 < 2 -> dropped.
    assert (10, 20) not in out
    # degrees/denominators still count the mega-basket: confidence of
    # (30, 40) is c_ab / deg(30) = 2 / 2 = 1.0 (mega-basket lacks 30).
    assert out[(30, 40)].confidence == 1.0


def test_dau_wau_trailing_window_edges(spark):
    """Planted actives: the WAU window is exactly [day-6, day] — a user
    active 6 days before counts, 7 days before does not; WAU dedups a
    user active on multiple days of the window."""
    import datetime as dt

    from etl_suite_spark.operators.analytics import dau_wau_stickiness

    d = dt.date(2024, 3, 1)

    def day(offset):
        return d + dt.timedelta(days=offset)

    rows = [
        (day(0), 1),          # u1 active day 0
        (day(6), 2),          # u2 active 6 days later -> inside day(6) window
        (day(6), 1),          # u1 again on day 6 (was also day 0: dedup to 1)
        (day(7), 3),          # u3 on day 7 -> day(0) user now OUTSIDE
    ]
    du = spark.createDataFrame(rows, "day date, user_id long").distinct()
    out = {r.day: r for r in dau_wau_stickiness(du).collect()}
    assert (out[day(0)].dau, out[day(0)].wau) == (1, 1)
    # day 6 window covers day 0..6: users {1, 2}; u1's two active days dedup
    assert (out[day(6)].dau, out[day(6)].wau) == (2, 2)
    # day 7 window covers day 1..7: day-0 activity of u1 aged out, but u1
    # was also active day 6 -> still in; users {1, 2, 3}
    assert (out[day(7)].dau, out[day(7)].wau) == (1, 3)
    assert out[day(7)].stickiness == round(1 / 3, 6)


def test_survival_km_curve_invariants(spark):
    """KM invariants the oracle can't certify (both engines share the
    formula): survival is in (0, 1], non-increasing in duration, and
    n_risk strictly decreases across successive event times."""
    from etl_suite_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    rows = (
        QUERIES["agg_survival_km"](spark, SF_DIR)
        .orderBy("duration_days")
        .collect()
    )
    assert rows, "fixture must produce at least one churn event"
    prev_s, prev_r = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r.survival <= prev_s + 1e-9
        assert r.n_events >= 1
        if prev_r is not None:
            assert r.n_risk < prev_r
        prev_s, prev_r = r.survival, r.n_risk


def test_ab_test_split_covers_all_users(spark):
    """Variant user counts must partition the distinct-user universe, and
    the deterministic hash split must be re-derivable (rerun-stable)."""
    from etl_suite_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    row = QUERIES["agg_ab_test"](spark, SF_DIR).collect()[0]
    n_users = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id")
        .distinct()
        .count()
    )
    assert row.users_a + row.users_b == n_users
    assert row.conv_a <= row.users_a and row.conv_b <= row.users_b
    again = QUERIES["agg_ab_test"](spark, SF_DIR).collect()[0]
    assert row == again


def test_attribution_conserves_purchases(spark):
    """Attributed conversions across channels (incl. 'direct') must equal
    the total purchase count — attribution reassigns credit, never drops
    or double-counts a conversion."""
    from pyspark.sql import functions as F

    from etl_suite_spark.registry import QUERIES
    from tests.conftest import SF_DIR

    out = QUERIES["agg_attribution_last_touch"](spark, SF_DIR)
    attributed = out.agg(F.sum("n_conversions")).collect()[0][0]
    purchases = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert attributed == purchases
    shares = [r.revenue_share for r in out.collect()]
    assert abs(sum(shares) - 1.0) < 1e-4

def test_chisq_planted_tables(spark):
    """Planted 2x2 tables: an exactly-proportional table gives chi2 = 0
    (and Cramér's V = 0); a hand-computed dependent table matches the
    textbook value chi2 = n(ad-bc)^2 / (r1 r2 c1 c2)."""
    from etl_suite_spark.operators.analytics import chisq_from_counts

    indep = spark.createDataFrame(
        [("a", "x", 10), ("a", "y", 30), ("b", "x", 20), ("b", "y", 60)],
        "pri string, st string, o long",
    )
    r = chisq_from_counts(indep).collect()[0]
    assert (r.chi2, r.cramers_v, r.dof) == (0.0, 0.0, 1)

    dep = spark.createDataFrame(
        [("a", "x", 30), ("a", "y", 10), ("b", "x", 10), ("b", "y", 30)],
        "pri string, st string, o long",
    )
    r = chisq_from_counts(dep).collect()[0]
    # n(ad-bc)^2/(r1*r2*c1*c2) = 80*(900-100)^2/40^4 = 20
    assert r.chi2 == 20.0
    assert r.cramers_v == 0.5  # sqrt(20 / (80 * 1))
    assert (r.n, r.n_rows, r.n_cols) == (80, 2, 2)


def test_chisq_zero_cell_contributes_expected(spark):
    """A structurally-empty cell must still push chi2 up via the O^2/E
    identity (the empty cell's O=0 term vanishes but the mass it SHOULD
    have had inflates other cells' terms): a diagonal-only table is
    perfectly dependent -> Cramér's V = 1."""
    from etl_suite_spark.operators.analytics import chisq_from_counts

    diag = spark.createDataFrame(
        [("a", "x", 25), ("b", "y", 25)], "pri string, st string, o long"
    )
    r = chisq_from_counts(diag).collect()[0]
    assert r.chi2 == 50.0  # = n for a perfect 2x2 association
    assert r.cramers_v == 1.0


def test_mann_whitney_hand_example(spark):
    """Hand-checked U on a tiny tied sample. Group1 scores {1,2,2},
    group2 {2,3}: ranks 1, 3 (tied avg of 2,3,4), 3, 3, 5 ->
    R1 = 7, U1 = 7 - 3*4/2 = 1; tie term for the triple 2: 3^3-3 = 24."""
    from etl_suite_spark.operators.analytics import mann_whitney_from_scores

    f = spark.createDataFrame(
        [(1, 1), (2, 1), (2, 1), (2, 0), (3, 0)], "score long, g1 int"
    )
    r = mann_whitney_from_scores(f).collect()[0]
    assert (r.n1, r.n2, r.u1) == (3, 2, 1.0)
    # sigma = sqrt(6/12 * (6 - 24/20)) = sqrt(2.4); z = (1-3)/sigma
    assert r.z_stat == round(-2 / (2.4 ** 0.5), 6)


def test_mann_whitney_symmetry(spark):
    """Swapping group labels negates z and reflects U (U1 + U1' = n1*n2)
    — the internal consistency check no single run exposes."""
    from etl_suite_spark.operators.analytics import mann_whitney_from_scores

    rows = [(s, 1) for s in (1, 4, 4, 7)] + [(s, 0) for s in (2, 4, 9)]
    f = spark.createDataFrame(rows, "score long, g1 int")
    fswap = spark.createDataFrame(
        [(s, 1 - g) for s, g in rows], "score long, g1 int"
    )
    a = mann_whitney_from_scores(f).collect()[0]
    b = mann_whitney_from_scores(fswap).collect()[0]
    assert a.u1 + b.u1 == a.n1 * a.n2
    assert a.z_stat == -b.z_stat


def test_volume_anomaly_planted_spike(spark):
    """Planted stream: 8 flat days (count 100 with one 99/101 wiggle so
    the baseline std is nonzero) then a 10x spike day -> the spike is
    flagged, the flat days are not, and the first 4 days (baseline < 4
    prior rows) emit NULL scores."""
    import datetime as dt

    from etl_suite_spark.operators.quality import volume_anomaly_from_daily

    d0 = dt.date(2024, 5, 1)
    counts = [100, 99, 101, 100, 100, 99, 101, 100, 1000]
    rows = [("s", d0 + dt.timedelta(days=i), c) for i, c in enumerate(counts)]
    daily = spark.createDataFrame(
        rows, "event_type string, day date, n_events long"
    )
    out = {r.day: r for r in volume_anomaly_from_daily(daily).collect()}
    spike = out[d0 + dt.timedelta(days=8)]
    assert spike.is_anomaly and spike.z_score > 3
    assert spike.baseline_days == 7  # frame excludes the spike day itself
    for i in range(4):  # cold start: fewer than 4 prior observed days
        r = out[d0 + dt.timedelta(days=i)]
        assert r.z_score is None and not r.is_anomaly
    for i in range(4, 8):  # flat tail: well inside 3 sigma
        assert not out[d0 + dt.timedelta(days=i)].is_anomaly


def test_volume_anomaly_zero_variance_baseline(spark):
    """A perfectly-flat baseline (variance 0) must yield NULL z, not a
    division blowup — even when the current day deviates."""
    import datetime as dt

    from etl_suite_spark.operators.quality import volume_anomaly_from_daily

    d0 = dt.date(2024, 5, 1)
    rows = [("s", d0 + dt.timedelta(days=i), 50) for i in range(6)]
    rows.append(("s", d0 + dt.timedelta(days=6), 500))
    daily = spark.createDataFrame(
        rows, "event_type string, day date, n_events long"
    )
    out = {r.day: r for r in volume_anomaly_from_daily(daily).collect()}
    r = out[d0 + dt.timedelta(days=6)]
    assert r.z_score is None and not r.is_anomaly
    assert r.baseline_mean == 50.0  # mean still reported


def test_golden_record_survivorship_rules(spark):
    """Planted entity: latest_value must skip the newest row's NULL
    value (attribute-level survivorship), modal ties break toward the
    lexicographically larger type, and equal timestamps resolve by
    event_id."""
    import datetime as dt

    from etl_suite_spark.operators.quality import golden_record

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1: newest row (m=3) has NULL value -> latest_value = 2.5
        (1, ts(0), 10, "view", 1.0, "{}"),
        (1, ts(1), 11, "click", 2.5, "{}"),
        (1, ts(3), 12, "view", None, "{}"),
        # user 2: modal tie view=1 click=1 -> 'view' (lexicographically larger);
        # equal ts at m=5 -> event_id 21 wins latest
        (2, ts(5), 20, "view", 7.0, "{}"),
        (2, ts(5), 21, "click", 9.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "user_id long, ts timestamp, event_id long, event_type string,"
        " value double, props string",
    )
    out = {r.user_id: r for r in golden_record(ev).collect()}
    u1 = out[1]
    assert u1.latest_event_type == "view"  # newest ROW still wins recency
    assert u1.latest_value == 2.5  # ...but the null value is skipped
    assert u1.modal_event_type == "view" and u1.modal_n == 2
    assert u1.n_events == 3 and u1.first_seen == ts(0) and u1.last_seen == ts(3)
    u2 = out[2]
    assert u2.modal_event_type == "view"  # 1-1 tie -> lexicographically larger
    assert u2.latest_event_type == "click"  # same ts -> higher event_id (21)
    assert u2.latest_value == 9.0
