"""Pin the driver-facing query window.

The external correctness harness checks the FIRST 50 entries of
``queries()`` each round.  The window is load-bearing: accidental
reordering (a new module import, a renamed query) would silently rotate
driver evidence away from the families this round is meant to prove.
This test pins the exact first-50 list and basic contract invariants.

Round-7 window composition (VERDICT r6 "Next round" item 1): the 50
queries that queued in the R7 overflow plan across rounds 5-6 — the r5
analytics/time-series/data-quality tail plus all 10 round-6 operators.
Every entry is oracle-checked; there are NO rows-only slots this round.
After R7 executes, only R8_PLANNED (2 queries + round-7 additions)
remains without driver evidence, and the evidence-ledger test below
enforces exactly that from the committed CORRECTNESS files.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry_mod

EXPECTED_R7_WINDOW = [
    "ts_holt_linear",
    "agg_welch_ttest",
    "agg_theil_sen",
    "dq_freshness",
    "agg_funnel_timebound",
    "agg_wow_growth",
    "agg_path_trigrams",
    "agg_chisq_independence",
    "agg_mann_whitney",
    "dq_volume_anomaly",
    "er_golden_record",
    "llm_ttr_hapax",
    "llm_zipf_slope",
    "llm_length_histogram",
    "llm_emb_quantize_int8",
    "llm_dedup_threshold_sweep",
    "graph_bfs_distance",
    "inc_partition_rebuild",
    "agg_ks_test",
    "agg_bootstrap_ci",
    "stream_anomaly_zscore",
    "llm_mixture_epochs",
    "ts_stl_decompose",
    "agg_decay_score",
    "udf_arrow_map",
    "pipeline_dag_run",
    "llm_hard_negatives",
    "ml_target_encoding",
    "ml_feature_scale",
    "dq_schema_contract",
    "agg_trimmed_mean",
    "graph_assortativity",
    "dq_psi_drift",
    "ts_acf",
    "llm_packing_efficiency",
    "inc_snapshot_expire",
    "join_asof_tolerance",
    "llm_charset_report",
    "llm_quality_composite",
    "ts_holt_winters",
    # added in round 6 (oracle-checked locally on introduction):
    "ts_forecast_backtest",
    "ts_holt_damped",
    "llm_ngram_kneser_ney",
    "llm_tokenizer_fertility",
    "graph_clustering_local",
    "llm_sft_pairs",
    "llm_vocab_coverage",
    "llm_dedup_simhash_recall",
    "ml_kmeans_quality",
    "llm_retrieval_ndcg",
]

_DRIVER_ROUNDS = (1, 2, 3, 4, 5, 6, 7)


def _driver_history() -> dict[str, dict]:
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, dict] = {}
    for n in _DRIVER_ROUNDS:
        path = root / f"CORRECTNESS_r0{n}.json"
        if path.exists():
            latest.update(json.loads(path.read_text()))
    return latest


def test_window_is_exactly_50():
    assert len(EXPECTED_R7_WINDOW) == 50
    assert len(set(EXPECTED_R7_WINDOW)) == 50


def test_first_50_match_pinned_window():
    qs = list(entry_mod.queries())
    assert qs[:50] == EXPECTED_R7_WINDOW
    assert entry_mod.R7_WINDOW == EXPECTED_R7_WINDOW


def test_every_window_query_is_registered():
    qs = entry_mod.queries()
    missing = [n for n in EXPECTED_R7_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_window_is_fully_oracle_checked():
    # The R7 window has NO rows-only slots: all 50 entries carry DuckDB
    # oracles, so CORRECTNESS_r07 should be 50/50 full hash checks.
    oracles = entry_mod.oracle_sql()
    missing = [n for n in EXPECTED_R7_WINDOW if n not in oracles]
    assert not missing, f"window names without oracles: {missing}"


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracles without queries: {extra}"


def test_no_stale_red_left_outside_window():
    """Any query whose LATEST driver record is red (oracle-able but not
    fully green) must sit inside the active window for a re-check.
    Recomputed from the committed CORRECTNESS_r0*.json files; r1-r6 ended
    50/50 green so this is expected vacuous — it exists to catch a
    regression being planned around rather than re-checked."""
    latest = _driver_history()
    oracles = entry_mod.oracle_sql()
    red = [
        name
        for name, rec in latest.items()
        if name in oracles
        and not (
            rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match")
        )
    ]
    outside = sorted(set(red) - set(EXPECTED_R7_WINDOW))
    assert not outside, f"stale-red oracle-able queries not in window: {outside}"


def _is_green_or_rows_only(rec: dict) -> bool:
    if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
        return True
    # rows-only record: driver ran the Spark side, got rows, no oracle
    return rec.get("err") == "no_oracle" and (rec.get("spark_rows") or 0) > 0


def test_evidence_ledger_covers_every_query():
    """Every registered query must have a green-or-rows-only driver
    record in the committed CORRECTNESS files, OR a pinned slot in the
    active window / R8_PLANNED.  Once R7 executes, the planned backlog
    shrinks to R8's 2 entries + round-7 additions; a future query added
    with no driver-evidence plan fails here immediately."""
    latest = _driver_history()
    evidenced = {n for n, rec in latest.items() if _is_green_or_rows_only(rec)}
    planned = set(EXPECTED_R7_WINDOW) | set(entry_mod.R8_PLANNED)
    uncovered = sorted(set(entry_mod.queries()) - evidenced - planned)
    assert not uncovered, f"queries with no driver-evidence plan: {uncovered}"


def test_pre_r7_backlog_is_exactly_the_known_two():
    """VERDICT r6 item 7 (tightened ledger): of everything registered
    BEFORE round 7, only the R7 window itself and the two R8 carryovers
    (ts_rolling_slope, graph_label_propagation) may lack a driver record.
    This is the strict form of the ledger — no plan-list escape for any
    other pre-r7 query."""
    latest = _driver_history()
    evidenced = {n for n, rec in latest.items() if _is_green_or_rows_only(rec)}
    pre_r7 = set(entry_mod.queries()) - set(entry_mod.R8_PLANNED[2:])
    allowed_gap = set(EXPECTED_R7_WINDOW) | {
        "ts_rolling_slope",
        "graph_label_propagation",
    }
    uncovered = sorted(pre_r7 - evidenced - allowed_gap)
    assert not uncovered, f"pre-r7 queries with no driver record: {uncovered}"


def test_r8_overflow_plan_is_well_formed():
    assert len(entry_mod.R8_PLANNED) <= 50
    assert len(set(entry_mod.R8_PLANNED)) == len(entry_mod.R8_PLANNED)
    overlap = set(entry_mod.R8_PLANNED) & set(EXPECTED_R7_WINDOW)
    assert not overlap, f"R8 entries already in the R7 window: {overlap}"
    # the two round-6 carryovers must keep their queue position so the
    # tightened-ledger test above stays meaningful
    assert entry_mod.R8_PLANNED[:2] == [
        "ts_rolling_slope",
        "graph_label_propagation",
    ]


def test_bench_headline_queries_registered():
    """Every bench row must resolve to a registered query — a rename that
    silently drops a row from the bench (it degrades gracefully by design)
    would otherwise go unnoticed until the driver's BENCH_r{N} shrinks."""
    import bench

    qs = entry_mod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench rows not registered: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_bench_compact_line_fits_driver_tail():
    """BENCH_r05 came back "parsed": null because the single JSON line
    outgrew the driver's 2000-char stdout tail.  Pin that the compact
    final line stays well under the window for the CURRENT headline set
    (worst-case 4-digit-seconds timings), and that the degradation
    ladder works at 60+ rows."""
    import bench

    fake = {
        "metric": "headline_wall_sec",
        "value": 9999.999,
        "unit": "sec",
        "sf": 0.1,
        "repeats": 3,
        "calibration_sec": 99.999,
        "sched_1k_tasks_sec": 99.999,
        "subtotal_r1_20q": 9999.999,
        "subtotal_per_sched": 9999.99,
        "queries": {n: 9999.999 for n in bench.HEADLINE},
    }
    line = bench.compact_record(fake)
    assert len(line) < 1900, f"compact line {len(line)} chars"
    assert '"value": 9999.999'.replace(" ", "") in line.replace(" ", "")
    # 70-row stress: must still emit a parseable line under the limit
    fake["queries"] = {f"some_quite_long_query_name_{i:03d}": 9999.999 for i in range(70)}
    import json as _json

    stress = bench.compact_record(fake)
    assert len(stress) < 1900
    assert _json.loads(stress)["value"] == 9999.999


try:
    from hypothesis import given
    from hypothesis import strategies as st

    _QNAME = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=4, max_size=48
    )

    @given(
        st.dictionaries(
            _QNAME, st.floats(0, 99999, allow_nan=False), max_size=150
        )
    )
    def test_compact_record_property(qmap):
        """For ANY query map up to 150 rows the compact line stays under
        the driver tail limit, parses as JSON, and preserves the headline
        value (hypothesis sweep over sizes/name lengths)."""
        import json as _json

        import bench

        detail = {
            "metric": "headline_wall_sec",
            "value": 1234.567,
            "unit": "sec",
            "sf": 0.1,
            "repeats": 3,
            "calibration_sec": 1.0,
            "sched_1k_tasks_sec": 1.0,
            "subtotal_r1_20q": 1234.567,
            "subtotal_per_sched": 1234.57,
            "queries": {k: round(v, 3) for k, v in qmap.items()},
        }
        line = bench.compact_record(detail)
        assert len(line) <= 1900
        parsed = _json.loads(line)
        assert parsed["value"] == 1234.567
        assert parsed["metric"] == "headline_wall_sec"
except ImportError:  # pragma: no cover — hypothesis is baked in
    pass
