"""Invariant tests for the round-6 operator batch.

Oracle parity hash-checks these against DuckDB; here we pin the semantic
properties a matching hash can't express. Every reference recursion uses
decimal.Decimal with ROUND_HALF_UP at the engines' rounding points — the
Holt-Winters lesson (VERDICT r5 item 1): Python float round() is
half-even on binary doubles and drifts over long folds.
"""

from __future__ import annotations

import decimal
from decimal import Decimal

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()


def test_forecast_backtest_scores_are_consistent(spark, duck):
    """MAE columns are non-negative; the snaive MAE must equal a direct
    Python recomputation over the same holdout (snaive needs no model —
    its MAE is pure arithmetic on the daily series)."""
    row = QUERIES["ts_forecast_backtest"](spark, SF_DIR).collect()[0]
    assert row["horizon"] == 7
    assert row["mae_hw"] >= 0 and row["mae_snaive"] >= 0
    xs = [
        Decimal(r[0])
        for r in duck.sql(
            """SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                        AS DECIMAL(18,6)) AS v
               FROM orders GROUP BY CAST(o_orderdate AS DATE)
               ORDER BY CAST(o_orderdate AS DATE)"""
        ).fetchall()
    ]
    n = len(xs)
    assert row["n_days"] == n
    errs = [abs(xs[n - 7 + h - 1] - xs[n - 14 + h - 1]) for h in range(1, 8)]
    mae = round(float(sum(errs)) / 7, 6)
    assert abs(row["mae_snaive"] - mae) < 1e-6


def test_holt_damped_matches_decimal_reference(spark, duck):
    """The damped fold must reproduce a plain-Python Gardner recursion
    quantized ROUND_HALF_UP to 6 dp at each step (the engines' decimal
    schedule), for the heaviest user series; the forecast must equal
    level + 4.6953279 * trend."""
    uid, *_ = duck.sql(
        """SELECT user_id FROM events GROUP BY user_id
           ORDER BY COUNT(DISTINCT CAST(ts AS DATE)) DESC, user_id LIMIT 1"""
    ).fetchone()
    xs = [
        Decimal(r[0])
        for r in duck.sql(
            f"""SELECT CAST(CAST(SUM(CAST(value AS DECIMAL(18,6)))
                         AS VARCHAR) AS DECIMAL(18,6)) AS v
                FROM events WHERE user_id = {uid}
                GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)"""
        ).fetchall()
    ]
    grid = Decimal("0.000001")
    with decimal.localcontext() as ctx:
        ctx.prec = 50

        def q6(d):
            return d.quantize(grid, rounding=decimal.ROUND_HALF_UP)

        a, hb, phi, cb = (
            Decimal("0.5"), Decimal("0.3"), Decimal("0.9"), Decimal("0.63"),
        )
        l, b = xs[0], Decimal(0)
        for x in xs[1:]:
            lt = q6(a * x + a * (l + phi * b))
            bt = q6(hb * (lt - l) + cb * b)
            l, b = lt, bt
    rows = {r["user_id"]: r for r in QUERIES["ts_holt_damped"](spark, SF_DIR).collect()}
    r = rows[uid]
    assert abs(r["level"] - float(l)) < 1e-9
    assert abs(r["trend"] - float(b)) < 1e-9
    assert abs(r["forecast_7d"] - round(r["level"] + 4.6953279 * r["trend"], 6)) < 1e-9


def test_holt_damped_reference_sanity(duck):
    """The damped-sum constant is exactly Σ 0.9^i for i=1..7."""
    assert abs(sum(0.9**i for i in range(1, 8)) - 4.6953279) < 1e-12


def test_kneser_ney_probability_mass(spark, duck):
    """For the 5 highest-count contexts w1, the KN probability mass over
    the OBSERVED followers must stay ≤ 1 (the held-out discount mass
    d·N1+/c1 times continuation covers unseen followers, so observed
    mass is strictly below 1 when any follower type exists), and every
    per-doc average log-prob is negative."""
    rows = QUERIES["llm_ngram_kneser_ney"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["avg_kn_prob"] <= 1
        assert r["n_bigrams"] >= 1
    masses = duck.sql(
        r"""
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS w FROM documents
        ), bg AS (
          SELECT w[i] AS w1, w[i+1] AS w2
          FROM t, unnest(range(1, len(w))) AS u(i) WHERE len(w) >= 2
        ),
        c12 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
        c1t AS (SELECT w1, SUM(c2) AS c1, COUNT(*) AS n1f FROM c12 GROUP BY w1),
        cont AS (SELECT w2, COUNT(*) AS n1p FROM c12 GROUP BY w2),
        nt AS (SELECT COUNT(*) AS ntypes FROM c12),
        top5 AS (SELECT w1 FROM c1t ORDER BY c1 DESC, w1 LIMIT 5)
        SELECT c12.w1, SUM(
            greatest(CAST(c12.c2 AS DOUBLE) - 0.75e0, 0e0) / CAST(c1t.c1 AS DOUBLE)
            + (0.75e0 * CAST(c1t.n1f AS DOUBLE) / CAST(c1t.c1 AS DOUBLE))
              * (CAST(cont.n1p AS DOUBLE) / CAST((SELECT ntypes FROM nt) AS DOUBLE))
          ) AS observed_mass
        FROM c12
        JOIN c1t ON c12.w1 = c1t.w1
        JOIN cont ON c12.w2 = cont.w2
        WHERE c12.w1 IN (SELECT w1 FROM top5)
        GROUP BY c12.w1
        """
    ).fetchall()
    assert len(masses) == 5
    for w1, mass in masses:
        assert 0 < mass <= 1.0 + 1e-9, (w1, mass)


def test_tokenizer_fertility_totals_match_token_count(spark):
    """Corpus totals must reconcile exactly with the per-doc
    llm_token_count table (same tokenizers, different grain)."""
    fert = QUERIES["llm_tokenizer_fertility"](spark, SF_DIR).collect()
    per_doc = QUERIES["llm_token_count"](spark, SF_DIR).collect()
    assert sum(r["n_words"] for r in fert) == sum(r["ws_tokens"] for r in per_doc)
    assert sum(r["n_tokens"] for r in fert) == sum(r["re_tokens"] for r in per_doc)
    assert sum(r["n_docs"] for r in fert) == len(per_doc)
    for r in fert:
        assert abs(r["fertility"] - round(r["n_tokens"] / r["n_words"], 6)) < 1e-9


def test_local_clustering_bounds_and_null_rule(spark):
    """0 ≤ local_cc ≤ 1; NULL exactly when degree < 2; total triangle
    incidences divisible by 3 (each triangle credits 3 corners)."""
    rows = QUERIES["graph_clustering_local"](spark, SF_DIR).collect()
    assert rows
    total_inc = 0
    seen_positive = False
    for r in rows:
        total_inc += r["n_triangles"]
        if r["degree"] < 2:
            assert r["local_cc"] is None
            assert r["n_triangles"] == 0
        else:
            assert r["local_cc"] is not None
            assert 0.0 <= r["local_cc"] <= 1.0
            if r["local_cc"] > 0:
                seen_positive = True
            # exact formula
            want = round(2.0 * r["n_triangles"] / (r["degree"] * (r["degree"] - 1)), 6)
            assert abs(r["local_cc"] - want) < 1e-9
    assert total_inc % 3 == 0
    assert seen_positive  # the co-purchase graph has real triangles


def test_sft_pairs_budget_and_splice(spark, duck):
    """Prompt+completion must splice back to a prefix of the source text;
    completion token budget (64) is enforced exactly; truncated flags
    exactly the docs whose tail was clipped."""
    rows = QUERIES["llm_sft_pairs"](spark, SF_DIR).collect()
    assert rows
    texts = dict(duck.sql("SELECT doc_id, text FROM documents").fetchall())
    for r in rows:
        assert r["prompt"].startswith("Summarize:\n")
        assert 1 <= r["n_completion_tokens"] <= 64
        body = r["prompt"][len("Summarize:\n"):]
        spliced = body + " " + r["completion"]
        assert texts[r["doc_id"]].startswith(spliced)
        words = texts[r["doc_id"]].split(" ")
        assert len(words) >= 24
        assert r["truncated"] == (len(words) - 16 > 64)
        if not r["truncated"]:
            assert spliced == texts[r["doc_id"]]


def test_vocab_coverage_reconciles_with_corpus(spark, duck):
    """Coverage totals must reconcile with the corpus: n_tokens sums to
    the corpus token count; every covered count <= n_tokens; the top-1000
    vocab covers MORE mass than a same-size random-looking vocab would
    miss (oov_rate strictly < 0.5 on this zipfian corpus)."""
    rows = QUERIES["llm_vocab_coverage"](spark, SF_DIR).collect()
    (total,) = duck.sql(
        "SELECT COUNT(*) FROM (SELECT unnest(string_split(text, ' ')) FROM documents)"
    ).fetchone()
    assert sum(r["n_tokens"] for r in rows) == total
    for r in rows:
        assert 0 <= r["n_covered"] <= r["n_tokens"]
        assert abs(r["oov_rate"] - round(1 - r["n_covered"] / r["n_tokens"], 6)) < 1e-9
        assert r["oov_rate"] < 0.5


def test_simhash_recall_twin_flag_holds(spark):
    """The measured recall gate must genuinely hold at fixture scale
    (0.75 at sf0.001; precision is reported in the docstring, not gated
    — it is corpus-size-dependent, measured 0.36 at sf0.1)."""
    row = QUERIES["llm_dedup_simhash_recall"](spark, SF_DIR).collect()[0]
    assert row["n_true_pairs"] > 0
    assert row["recall_ge_50"] is True


def test_kmeans_quality_gate_holds(spark):
    """The kmeans-beats-arbitrary-partition flag must genuinely hold and
    the per-cell baselines must be positive with all 5 cells present."""
    rows = QUERIES["ml_kmeans_quality"](spark, SF_DIR).collect()
    assert [r["cell"] for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        assert r["baseline_sse"] > 0
        assert r["n_vectors"] > 0
        assert r["kmeans_beats_baseline"] is True
