"""Invariant tests for the late-round-5 operator batch.

Oracle parity (test_oracle_parity.py) already hash-checks each of these
against DuckDB; the tests here pin the SEMANTIC invariants a matching
hash can't express — reference-implementation agreement, algebraic
identities, and crafted-input behavior.
"""

from __future__ import annotations

import math

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()


def test_zipf_slope_matches_numpy_ols(spark, duck):
    """The decimal-power-sum regression must equal a plain numpy OLS on
    the same (ln rank, ln freq) points to ~1e-5."""
    import numpy as np

    rows = duck.sql(
        """
        WITH tok AS (SELECT unnest(string_split(text, ' ')) AS tok
                     FROM documents),
        freq AS (SELECT tok, COUNT(*) AS f FROM tok GROUP BY tok)
        SELECT f FROM freq ORDER BY f DESC, tok LIMIT 200
        """
    ).fetchall()
    f = np.array([r[0] for r in rows], dtype=float)
    r = np.arange(1, len(f) + 1, dtype=float)
    slope_ref = np.polyfit(np.log(r), np.log(f), 1)[0]
    got = QUERIES["llm_zipf_slope"](spark, SF_DIR).collect()[0]
    assert got["n_ranks"] == len(f)
    assert abs(got["zipf_slope"] - slope_ref) < 1e-5
    assert 0.0 <= got["r2"] <= 1.0


def test_ttr_hapax_bounds_and_identity(spark):
    """Per-doc: types <= tokens, hapax <= types, ratios in (0, 1]."""
    rows = QUERIES["llm_ttr_hapax"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_types"] <= r["n_tokens"]
        assert 0 <= r["n_hapax"] <= r["n_types"]
        assert 0 < r["ttr"] <= 1.0
        assert 0 <= r["hapax_ratio"] <= 1.0


def test_length_histogram_totals(spark, duck):
    """Bucket counts and token mass must re-add to the corpus totals."""
    rows = QUERIES["llm_length_histogram"](spark, SF_DIR).collect()
    n_docs, n_toks = duck.sql(
        "SELECT COUNT(*), SUM(len(string_split(text, ' '))) FROM documents"
    ).fetchone()
    assert sum(r["n_docs"] for r in rows) == n_docs
    assert sum(r["total_tokens"] for r in rows) == n_toks


def test_emb_quantize_error_bounded_by_step(spark, duck):
    """uint8 reconstruction error can never exceed half a quantization
    step of the widest dimension (+1 ulp slack)."""
    rows = QUERIES["llm_emb_quantize_int8"](spark, SF_DIR).collect()
    (max_range,) = duck.sql(
        """
        SELECT MAX(mx - mn) FROM (
          SELECT i, MIN(CAST(embedding[i] AS DOUBLE)) AS mn,
                 MAX(CAST(embedding[i] AS DOUBLE)) AS mx
          FROM embeddings, unnest(range(1, 65)) AS u(i) GROUP BY i)
        """
    ).fetchone()
    half_step = max_range / 255 / 2 + 1e-9
    for r in rows:
        assert 0 <= r["qmin"] <= r["qmax"] <= 255
        assert r["max_abs_err"] <= half_step
        assert r["mse"] <= half_step**2


def test_threshold_sweep_is_monotone(spark):
    """Raising the threshold can only shrink pair/doc counts; every
    declared threshold row exists even when counts hit zero."""
    rows = QUERIES["llm_dedup_threshold_sweep"](spark, SF_DIR).collect()
    assert [r["threshold"] for r in rows] == [0.3, 0.5, 0.7, 0.8, 0.9]
    for a, b in zip(rows, rows[1:]):
        assert a["n_pairs"] >= b["n_pairs"]
        assert a["n_docs_flagged"] >= b["n_docs_flagged"]
        assert a["n_sample"] == b["n_sample"]


def test_bfs_levels_partition_reachable_set(spark, duck):
    """Level sets are disjoint by construction; their union equals the
    recursive-oracle reachable set (per-distance counts compared against
    the recursive CTE run via DuckDB); level 0 is a single seed."""
    rows = QUERIES["graph_bfs_distance"](spark, SF_DIR).collect()
    assert rows[0]["dist"] == 0 and rows[0]["n_nodes"] == 1
    dists = [r["dist"] for r in rows]
    assert dists == sorted(set(dists))
    oracle = duck.sql(entry_mod.oracle_sql()["graph_bfs_distance"]).fetchall()
    assert [(r["dist"], r["n_nodes"]) for r in rows] == [
        (int(d), int(n)) for d, n, _mn, _mx in oracle
    ]


def test_partition_rebuild_statuses(spark):
    """The simulated stale copy must yield: every month before the
    cutoff 'ok', and at least one trailing month 'stale' or 'missing';
    a missing month reports zero materialized rows."""
    rows = QUERIES["inc_partition_rebuild"](spark, SF_DIR).collect()
    statuses = [r["status"] for r in rows]
    assert "ok" in statuses
    assert "stale" in statuses or "missing" in statuses
    # trailing month must be flagged (the 20-day cut always clips it)
    assert statuses[-1] in ("stale", "missing")
    for r in rows:
        if r["status"] == "missing":
            assert r["mat_rows"] == 0
        if r["status"] == "ok":
            assert r["mat_rows"] == r["src_rows"]


def test_ks_test_agrees_with_scipy_formula(spark, duck):
    """KS statistic equals the direct two-ECDF max-gap computed in
    Python over the same samples."""
    rows = duck.sql(
        """
        SELECT event_type, value FROM events
        WHERE event_type IN ('purchase', 'click')
        """
    ).fetchall()
    a = sorted(v for t, v in rows if t == "purchase")
    b = sorted(v for t, v in rows if t == "click")
    pts = sorted(set(a) | set(b))
    import bisect

    d_ref = max(
        abs(
            bisect.bisect_right(a, x) / len(a)
            - bisect.bisect_right(b, x) / len(b)
        )
        for x in pts
    )
    got = QUERIES["agg_ks_test"](spark, SF_DIR).collect()[0]
    assert got["n1"] == len(a) and got["n2"] == len(b)
    # ks_stat is emitted at 6 dp, so agreement is to rounding tolerance
    assert abs(got["ks_stat"] - d_ref) < 1e-6


def test_bootstrap_ci_brackets_the_mean(spark):
    """A 95% bootstrap CI from 50 replicates must bracket the full-data
    mean (Poisson bootstrap is centered on it) and be ordered."""
    r = QUERIES["agg_bootstrap_ci"](spark, SF_DIR).collect()[0]
    assert r["n_replicates"] == 50
    assert r["ci_lo"] < r["mean_full"] < r["ci_hi"]
    assert (r["ci_hi"] - r["ci_lo"]) / r["mean_full"] < 0.25


def test_stl_components_readd(spark):
    """trend + seasonal + residual must reconstruct revenue to rounding
    tolerance on every emitted day."""
    rows = QUERIES["ts_stl_decompose"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert abs(
            r["revenue"] - (r["trend"] + r["seasonal"] + r["residual"])
        ) < 5e-6


def test_decay_score_bounds(spark, duck):
    """Each user's decayed score is positive and strictly below the
    undecayed value sum; a user's most recent event bounds last_seen."""
    rows = QUERIES["agg_decay_score"](spark, SF_DIR).collect()
    raw = dict(
        duck.sql("SELECT user_id, SUM(value) FROM events GROUP BY 1").fetchall()
    )
    for r in rows:
        assert 0 < r["decay_score"] < raw[r["user_id"]] + 1e-6
        assert r["last_seen_days"] >= 0


def test_mixture_epochs_weights_normalize(spark):
    """Smoothed weights sum to ~1, and sqrt smoothing compresses shares:
    the largest source's weight must not exceed its raw share, the
    smallest source's weight must not fall below its raw share."""
    rows = QUERIES["llm_mixture_epochs"](spark, SF_DIR).collect()
    assert abs(sum(r["weight"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-3
    hi = max(rows, key=lambda r: r["raw_share"])
    lo = min(rows, key=lambda r: r["raw_share"])
    assert hi["weight"] <= hi["raw_share"] + 1e-6
    assert lo["weight"] >= lo["raw_share"] - 1e-6


def test_dag_compiler_rejects_cycles(spark):
    from etl_suite_spark.plans.pipeline import compile_dag

    dag = {
        "stages": {
            "a": {"source": {"stage": "b"}},
            "b": {"source": {"stage": "a"}},
        },
        "output": "a",
    }
    with pytest.raises(ValueError, match="cycle"):
        compile_dag(spark, SF_DIR, dag)


def test_dag_memoizes_shared_stage(spark, monkeypatch):
    """The diamond's shared base stage must be BUILT exactly once
    (memoization, not re-expansion): instrument load_table and count
    how often the base table is loaded while both branches consume it."""
    from etl_suite_spark.plans import pipeline as pl

    calls = []
    real_load = pl.load_table

    def counting_load(spark_, sf_dir_, table):
        calls.append(table)
        return real_load(spark_, sf_dir_, table)

    monkeypatch.setattr(pl, "load_table", counting_load)
    dag = {
        "stages": {
            "base": {"source": {"table": "orders"}},
            "l": {"source": {"stage": "base"}},
            "r": {
                "source": {"stage": "l"},
                "transforms": [
                    {"op": "join", "stage": "base", "on_cols": ["o_orderkey"]}
                ],
            },
        },
        "output": "r",
    }
    df = pl.compile_dag(spark, SF_DIR, dag)
    assert calls.count("orders") == 1  # diamond base compiled once
    assert df.count() > 0  # join-on-self via memoized stage resolves


def test_stream_anomaly_zscore_flags_iff_gap(spark):
    rows = QUERIES["stream_anomaly_zscore"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["is_anomaly"] == (abs(r["zscore"]) > 2)
