"""Invariant tests for the closing round-5 operator batch (session 3).

Oracle parity hash-checks these against DuckDB; here we pin the semantic
properties a matching hash can't express.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()


def test_hard_negatives_are_negative_and_ranked(spark):
    rows = QUERIES["llm_hard_negatives"](spark, SF_DIR).collect()
    assert rows
    by_q = {}
    for r in rows:
        assert r["neg_label"] != r["query_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = [r["rank"] for r in rs]
        assert ranks == sorted(ranks) == list(range(1, len(rs) + 1))
        cosines = [r["cosine"] for r in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_target_encoding_shrinks_toward_prior(spark, duck):
    """Each segment's encoding must lie between its raw mean and the
    global prior (convex combination with m=100)."""
    rows = QUERIES["ml_target_encoding"](spark, SF_DIR).collect()
    (prior,) = duck.sql(
        """SELECT SUM(o_totalprice) / COUNT(*)
           FROM orders JOIN customer ON o_custkey = c_custkey"""
    ).fetchone()
    for r in rows:
        lo, hi = sorted((r["raw_mean"], prior))
        assert lo - 1e-3 <= r["encoded"] <= hi + 1e-3


def test_feature_scale_ranges(spark):
    rows = QUERIES["ml_feature_scale"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert -6 < r["zscore"] < 6
        assert -1e-9 <= r["minmax"] <= 1 + 1e-9


def test_schema_contract_exercises_all_branches(spark):
    rows = QUERIES["dq_schema_contract"](spark, SF_DIR).collect()
    by_col = {r["column_name"]: r["status"] for r in rows}
    assert by_col["o_custkey"] == "mismatch"  # planted int32 drift
    assert by_col["o_comment"] == "missing"  # planted absent column
    assert by_col["o_orderkey"] == "ok"
    assert by_col["o_orderdate"] == "ok"


def test_trimmed_mean_within_fences(spark):
    rows = QUERIES["agg_trimmed_mean"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["p10"] <= r["trimmed_mean"] <= r["p90"]
        assert r["n_kept"] > 0


def test_assortativity_is_a_correlation(spark):
    r = QUERIES["graph_assortativity"](spark, SF_DIR).collect()[0]
    assert -1.0 <= r["assortativity"] <= 1.0
    assert r["n_edges"] > 0


def test_psi_terms_nonnegative_and_total_consistent(spark):
    rows = QUERIES["dq_psi_drift"](spark, SF_DIR).collect()
    assert len(rows) == 10
    total = rows[0]["psi_total"]
    assert all(abs(r["psi_total"] - total) < 1e-9 for r in rows)
    for r in rows:
        # (q-p)·ln(q/p) >= 0 always (both factors share sign)
        assert r["psi_term"] >= -1e-9
    assert abs(sum(r["psi_term"] for r in rows) - total) < 1e-4


def test_acf_bounds(spark, duck):
    rows = QUERIES["ts_acf"](spark, SF_DIR).collect()
    assert [r["lag"] for r in rows] == list(range(1, 15))
    (n_days,) = duck.sql(
        "SELECT COUNT(DISTINCT CAST(o_orderdate AS DATE)) FROM orders"
    ).fetchone()
    for r in rows:
        # a pair needs BOTH t and t-lag present; gaps make counts
        # non-monotone in lag, but never more than |days| - lag
        assert 0 < r["n_pairs"] <= n_days - r["lag"]
        assert -1.0 <= r["acf"] <= 1.0


def test_packing_efficiency_utilization(spark):
    rows = QUERIES["llm_packing_efficiency"](spark, SF_DIR).collect()
    assert rows
    util = rows[0]["overall_utilization"]
    assert 0 < util <= 1 + 1e-9
    assert all(abs(r["overall_utilization"] - util) < 1e-9 for r in rows)
    for r in rows:
        assert 0 <= r["fill_bucket"] <= 10


def test_snapshot_expire_partitions_all_versions(spark, duck):
    rows = QUERIES["inc_snapshot_expire"](spark, SF_DIR).collect()
    statuses = {r["status"] for r in rows}
    assert statuses <= {"current", "kept", "expired"}
    assert "current" in statuses
    (n_versions,) = duck.sql(
        """
        WITH hist AS (
          SELECT user_id, event_type AS attr,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
          FROM events)
        SELECT COUNT(*) FROM hist WHERE prev IS NULL OR attr <> prev
        """
    ).fetchone()
    assert sum(r["n_versions"] for r in rows) == n_versions


def test_asof_tolerance_gate(spark):
    rows = QUERIES["join_asof_tolerance"](spark, SF_DIR).collect()
    assert rows
    n_fresh = 0
    for r in rows:
        if r["fresh"]:
            n_fresh += 1
            assert r["click_id"] is not None
            assert 0 <= r["staleness_sec"] <= 900.0
        else:
            assert r["click_id"] is None and r["staleness_sec"] is None
    assert 0 < n_fresh  # tolerance must not degenerate to all-stale


def test_charset_shares_sum_to_one(spark):
    rows = QUERIES["llm_charset_report"](spark, SF_DIR).collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    assert all(r["is_ascii"] for r in rows)  # fixture corpus is ASCII


def test_quality_composite_is_the_conjunction(spark):
    rows = QUERIES["llm_quality_composite"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["keep"] == (r["c4_keep"] and r["gopher_keep"])
        expected = ",".join(
            name
            for name, ok in (("c4", r["c4_keep"]), ("gopher", r["gopher_keep"]))
            if not ok
        )
        assert r["reasons"] == expected


def test_holt_winters_matches_python_reference(spark, duck):
    """The decimal fold must reproduce a plain-Python Holt-Winters
    recursion with the SAME rounding schedule the engines use: every
    component quantized to 6 dp in decimal with ROUND_HALF_UP (Spark and
    DuckDB both fold in DECIMAL(18,6); Python float round() is half-even
    on binary doubles and drifts ~1.6e-5 over ~90 fold steps)."""
    import decimal
    from decimal import Decimal

    rows = duck.sql(
        """SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                    AS DECIMAL(18,6)) AS v
           FROM orders GROUP BY CAST(o_orderdate AS DATE)
           ORDER BY CAST(o_orderdate AS DATE)"""
    ).fetchall()
    grid = Decimal("0.000001")
    with decimal.localcontext() as ctx:
        ctx.prec = 50
        ctx.rounding = decimal.ROUND_HALF_UP

        def q6(d):
            return d.quantize(grid, rounding=decimal.ROUND_HALF_UP)

        a, bb, g, ca, cb, cg = (
            Decimal("0.5"), Decimal("0.3"), Decimal("0.2"),
            Decimal("0.5"), Decimal("0.7"), Decimal("0.8"),
        )
        xs = [Decimal(r[0]) for r in rows]
        l, b, s = xs[0], Decimal(0), [Decimal(0)] * 7
        for x in xs[1:]:
            s0 = s[0]
            lt = q6(a * (x - s0) + ca * (l + b))
            bt = q6(bb * (lt - l) + cb * b)
            st = q6(g * (x - lt) + cg * s0)
            l, b, s = lt, bt, s[1:] + [st]
    got = QUERIES["ts_holt_winters"](spark, SF_DIR).collect()
    assert len(got) == 7
    for r in got:
        assert abs(r["level"] - float(l)) < 1e-9
        assert abs(r["trend"] - float(b)) < 1e-9
        # l, b, s all carry exactly 6 dp, so the forecast sum is already
        # on the 6-dp grid — the engines' round(double, 6) lands on it.
        assert abs(r["forecast"] - float(l + r["h"] * b + s[r["h"] - 1])) < 1e-9
