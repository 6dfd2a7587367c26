"""Pin the driver-facing query window.

The external correctness harness checks the FIRST 50 entries of
``queries()`` each round.  The window is load-bearing: accidental
reordering (a new module import, a renamed query) would silently rotate
driver evidence away from the families this round is meant to prove.
This test pins the exact first-50 list and basic contract invariants.

Round-6 window composition (VERDICT r5 "Next round" item 2): the
closeout rotation — 14 r3/r4-era oracle-checkable queries, the 31 added
during round 5, and 4 rows-only ops taking (weaker) rows-only driver
slots whose honesty twins are already driver-green.  R7_PLANNED holds
the remaining 40 never-driver-checked queries; after R7 executes, every
registered query will have a driver record, and the evidence-ledger test
below enforces exactly that from the committed CORRECTNESS files.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry_mod

EXPECTED_R6_WINDOW = [
    "join_asof_nearest",
    "agg_trend_corr",
    "llm_curriculum_order",
    "inc_late_dim_resolve",
    "ts_gapfill_interpolate",
    "agg_cohort_ltv",
    "win_zscore_rolling",
    "scan_rowgroup_stats",
    "llm_corpus_stats",
    "agg_autocorr_lag1",
    "llm_ngram_novelty",
    "win_rank_change",
    "agg_new_vs_returning",
    "agg_interevent_gaps",
    "llm_dedup_embedding_recall",
    "llm_sim_range_search",
    "llm_dedup_crossset",
    "agg_dau_wau_stickiness",
    "dq_benford",
    "llm_vocab_growth",
    "agg_activity_heatmap",
    "mm_byte_framing",
    "agg_rfm_segmentation",
    "agg_bitmap_rollup",
    "agg_forecast_snaive",
    "agg_entropy_mix",
    "win_rolling_corr7",
    "dq_cross_table_rule",
    "llm_bpe_merge_candidates",
    "llm_perplexity_bucket",
    "stream_topk_per_window",
    "agg_bitmap_distinct",
    "win_cusum_changepoint",
    "ts_seasonal_index_dow",
    "dq_outlier_iqr",
    "join_interval_overlap",
    "llm_dedup_containment",
    "llm_span_corruption",
    "llm_readability",
    "graph_connected_components",
    "graph_degree_histogram",
    "graph_jaccard_neighbors",
    "agg_ab_test",
    "agg_survival_km",
    "agg_attribution_last_touch",
    "win_drawdown",
    # rows-only driver slots (no oracle BY DESIGN — see __spark_entry__):
    "agg_sketch_rollup",
    "llm_sim_mmr_rerank",
    "llm_sim_ann_pq",
    "llm_sim_ann_ivfpq",
]

ROWS_ONLY_SLOTS = {
    "agg_sketch_rollup",
    "llm_sim_mmr_rerank",
    "llm_sim_ann_pq",
    "llm_sim_ann_ivfpq",
}

_DRIVER_ROUNDS = (1, 2, 3, 4, 5, 6)


def _driver_history() -> dict[str, dict]:
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, dict] = {}
    for n in _DRIVER_ROUNDS:
        path = root / f"CORRECTNESS_r0{n}.json"
        if path.exists():
            latest.update(json.loads(path.read_text()))
    return latest


def test_window_is_exactly_50():
    assert len(EXPECTED_R6_WINDOW) == 50
    assert len(set(EXPECTED_R6_WINDOW)) == 50


def test_first_50_match_pinned_window():
    qs = list(entry_mod.queries())
    assert qs[:50] == EXPECTED_R6_WINDOW
    assert entry_mod.R6_WINDOW == EXPECTED_R6_WINDOW


def test_every_window_query_is_registered():
    qs = entry_mod.queries()
    missing = [n for n in EXPECTED_R6_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_window_oracle_coverage_is_exactly_as_declared():
    # 46 oracle-checked + the 4 declared rows-only slots; any other
    # oracle-less entry burns a driver slot on an unplanned weak record.
    oracles = entry_mod.oracle_sql()
    missing = [
        n
        for n in EXPECTED_R6_WINDOW
        if n not in oracles and n not in ROWS_ONLY_SLOTS
    ]
    assert not missing, f"window names without oracles: {missing}"
    oracled_rows_only = sorted(n for n in ROWS_ONLY_SLOTS if n in oracles)
    assert not oracled_rows_only, (
        f"declared rows-only but oracle exists: {oracled_rows_only}"
    )


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracles without queries: {extra}"


def test_no_stale_red_left_outside_window():
    """Any query whose LATEST driver record is red (oracle-able but not
    fully green) must sit inside the active window for a re-check.
    Recomputed from the committed CORRECTNESS_r0*.json files; r1-r5 ended
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
    outside = sorted(set(red) - set(EXPECTED_R6_WINDOW))
    assert not outside, f"stale-red oracle-able queries not in window: {outside}"


def _is_green_or_rows_only(rec: dict) -> bool:
    if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
        return True
    # rows-only record: driver ran the Spark side, got rows, no oracle
    return rec.get("err") == "no_oracle" and (rec.get("spark_rows") or 0) > 0


def test_evidence_ledger_covers_every_query():
    """VERDICT r5 item 6: every registered query must have a
    green-or-rows-only driver record in the committed CORRECTNESS files,
    OR a pinned slot in the active window / R7_PLANNED.  Once R7
    executes, the planned sets shrink to empty and this becomes the pure
    ledger invariant — a future query addition with no driver-evidence
    plan fails here immediately."""
    latest = _driver_history()
    evidenced = {n for n, rec in latest.items() if _is_green_or_rows_only(rec)}
    planned = (
        set(EXPECTED_R6_WINDOW)
        | set(entry_mod.R7_PLANNED)
        | set(entry_mod.R8_PLANNED)
    )
    uncovered = sorted(set(entry_mod.queries()) - evidenced - planned)
    assert not uncovered, f"queries with no driver-evidence plan: {uncovered}"


def test_r7_overflow_plan_is_well_formed():
    assert len(entry_mod.R7_PLANNED) <= 50
    assert len(set(entry_mod.R7_PLANNED)) == len(entry_mod.R7_PLANNED)
    overlap = set(entry_mod.R7_PLANNED) & set(EXPECTED_R6_WINDOW)
    assert not overlap, f"R7 entries already in the R6 window: {overlap}"


def test_r8_overflow_plan_is_well_formed():
    assert len(entry_mod.R8_PLANNED) <= 50
    assert len(set(entry_mod.R8_PLANNED)) == len(entry_mod.R8_PLANNED)
    earlier = set(EXPECTED_R6_WINDOW) | set(entry_mod.R7_PLANNED)
    overlap = set(entry_mod.R8_PLANNED) & earlier
    assert not overlap, f"R8 entries already planned earlier: {overlap}"


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
            "queries": {k: round(v, 3) for k, v in qmap.items()},
        }
        line = bench.compact_record(detail)
        assert len(line) <= 1900
        parsed = _json.loads(line)
        assert parsed["value"] == 1234.567
        assert parsed["metric"] == "headline_wall_sec"
except ImportError:  # pragma: no cover — hypothesis is baked in
    pass
