"""Pin the driver-facing query window.

The external correctness harness checks the FIRST 50 entries of
``queries()`` each round.  The window is load-bearing: accidental
reordering (a new module import, a renamed query) would silently rotate
driver evidence away from the families this round is meant to prove.
This test pins the exact first-50 list and basic contract invariants.

Round-14 window composition (executing VERDICT r13 item 1): the 11
queries queued in R14_PLANNED during round 13 (multi-band SemDeDup pair,
corpus-prune pipeline pair, index retrain pair, nprobe sweep pair,
capped quality selection, D4 prototype pair — clearing the
never-checked backlog to zero) + 39 re-checks: the 3 pinned r5-era
leftovers FIRST (win_pareto_abc, win_pct_of_total, win_running_median —
the r13-generation pin demanded they lead this block), then the first
36 r6-era queries alphabetically.  The 14 remaining r6-era queries
(llm_sim_mmr_rerank .. win_zscore_rolling) stay the oldest evidence and
lead the R15 re-check block.  The strict-ledger endgame test enforces:
NO registered query may lack a committed driver record unless it sits
in the active window or is a round-14 addition in R15_PLANNED.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry_mod

EXPECTED_R14_WINDOW = [
    # --- R14_PLANNED: round-13 additions (oracle-checked locally on intro) ---
    "llm_semdedup_bands",
    "llm_semdedup_bands_recall",
    "llm_corpus_prune_pipeline",
    "llm_corpus_prune_pipeline_audit",
    "llm_index_retrain",  # rows-only by design (k-means cells)
    "llm_index_retrain_recall",
    "llm_sim_ann_nprobe_sweep",  # rows-only by design (k-means cells)
    "llm_sim_ann_nprobe_sweep_recall",
    "llm_quality_select_capped",
    "llm_semdedup_prototypes",
    "llm_corpus_prune_d4",
    # --- re-checks: the 3 pinned r5-era leftovers lead the block ---
    "win_pareto_abc",
    "win_pct_of_total",
    "win_running_median",
    # --- re-checks: first 36 r6-era queries (alphabetical) ---
    "agg_ab_test",
    "agg_activity_heatmap",
    "agg_attribution_last_touch",
    "agg_autocorr_lag1",
    "agg_bitmap_distinct",
    "agg_bitmap_rollup",
    "agg_cohort_ltv",
    "agg_dau_wau_stickiness",
    "agg_entropy_mix",
    "agg_forecast_snaive",
    "agg_interevent_gaps",
    "agg_new_vs_returning",
    "agg_rfm_segmentation",
    "agg_sketch_rollup",
    "agg_survival_km",
    "agg_trend_corr",
    "dq_benford",
    "dq_cross_table_rule",
    "dq_outlier_iqr",
    "graph_connected_components",
    "graph_degree_histogram",
    "graph_jaccard_neighbors",
    "inc_late_dim_resolve",
    "join_asof_nearest",
    "join_interval_overlap",
    "llm_bpe_merge_candidates",
    "llm_corpus_stats",
    "llm_curriculum_order",
    "llm_dedup_containment",
    "llm_dedup_crossset",
    "llm_dedup_embedding_recall",
    "llm_ngram_novelty",
    "llm_perplexity_bucket",
    "llm_readability",
    "llm_sim_ann_ivfpq",
    "llm_sim_ann_pq",
]

# The 14 r6-era queries that did NOT fit the 50-slot window; they are
# the oldest evidence after this window executes and must lead the R15
# re-check block (pinned so the overflow is a plan, not an accident).
R6_LEFTOVER = [
    "llm_sim_mmr_rerank",
    "llm_sim_range_search",
    "llm_span_corruption",
    "llm_vocab_growth",
    "mm_byte_framing",
    "scan_rowgroup_stats",
    "stream_topk_per_window",
    "ts_gapfill_interpolate",
    "ts_seasonal_index_dow",
    "win_cusum_changepoint",
    "win_drawdown",
    "win_rank_change",
    "win_rolling_corr7",
    "win_zscore_rolling",
]

# Window slots without an oracle, each rows-only BY DESIGN with an
# oracle-checked honesty twin: the `_recall` twins of the retrain and
# nprobe-sweep ops sit adjacent in this window; the r6-era re-checks
# `llm_sim_ann_pq` / `llm_sim_ann_ivfpq` (k-means/PQ codebooks) carry
# the hash-green `_recall` twins re-driven in r13, and
# `agg_sketch_rollup` (HLL-sketch-internal buckets) carries the oracled
# `agg_sketch_overlap` contract (driver-green r9).
ROWS_ONLY_IN_WINDOW = {
    "llm_index_retrain",
    "llm_sim_ann_nprobe_sweep",
    "llm_sim_ann_pq",
    "llm_sim_ann_ivfpq",
    "agg_sketch_rollup",
}

_DRIVER_ROUNDS = tuple(range(1, 15))


def _driver_history() -> dict[str, dict]:
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, dict] = {}
    for n in _DRIVER_ROUNDS:
        path = root / f"CORRECTNESS_r{n:02d}.json"
        if path.exists():
            latest.update(json.loads(path.read_text()))
    return latest


def _latest_round(before: int = 14) -> dict[str, int]:
    """Latest driver-record round per query over rounds STRICTLY BEFORE
    ``before`` — the window-composition tests must read the evidence
    state the R14 window was PLANNED against, not the state after the
    driver executes it (code-review r10 finding #1: including the active
    round would break these pins the moment CORRECTNESS_r14.json lands)."""
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, int] = {}
    for n in range(1, before):
        path = root / f"CORRECTNESS_r{n:02d}.json"
        if path.exists():
            for name in json.loads(path.read_text()):
                latest[name] = n
    return latest


def test_window_is_exactly_50():
    assert len(EXPECTED_R14_WINDOW) == 50
    assert len(set(EXPECTED_R14_WINDOW)) == 50


def test_first_50_match_pinned_window():
    qs = list(entry_mod.queries())
    assert qs[:50] == EXPECTED_R14_WINDOW
    assert entry_mod.R14_WINDOW == EXPECTED_R14_WINDOW


def test_window_composition():
    """The window is exactly R14_PLANNED followed by the re-check block;
    the planned block is exactly the never-driver-checked queries, the
    re-check block leads with the 3 r5-era leftovers then r6-era
    evidence, and nothing outside the window carries older-than-r6
    evidence (recomputed from the committed CORRECTNESS files)."""
    assert entry_mod.R14_WINDOW == entry_mod.R14_PLANNED + entry_mod.R14_RECHECKS
    latest_round = _latest_round()
    already = {n for n in entry_mod.R14_PLANNED if n in latest_round}
    assert not already, f"R14_PLANNED slots already evidenced: {already}"
    # re-check block: 3 r5-era leftovers first, then 36 r6-era queries
    lead, tail = entry_mod.R14_RECHECKS[:3], entry_mod.R14_RECHECKS[3:]
    assert lead == ["win_pareto_abc", "win_pct_of_total", "win_running_median"]
    bad_r5 = {n: latest_round.get(n) for n in lead if latest_round.get(n) != 5}
    assert not bad_r5, f"r5-leftover slots with other evidence: {bad_r5}"
    bad_r6 = {n: latest_round.get(n) for n in tail if latest_round.get(n) != 6}
    assert not bad_r6, f"r6-era re-check slots with other evidence: {bad_r6}"
    # oldest-first completeness: after this window executes, the only
    # registered queries still carrying r6-or-older evidence are the 14
    # pinned R6_LEFTOVER rows (no unplanned stale query hides outside).
    stale_outside = {
        n for n, r in latest_round.items()
        if r <= 6 and n in entry_mod.queries() and n not in entry_mod.R14_WINDOW
    }
    assert stale_outside == set(R6_LEFTOVER), (
        f"unplanned stale queries outside window: {stale_outside ^ set(R6_LEFTOVER)}"
    )


def test_every_window_query_is_registered():
    qs = entry_mod.queries()
    missing = [n for n in EXPECTED_R14_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_window_oracle_coverage():
    # Exactly five rows-only slots this round (each by design, with an
    # oracled honesty twin); every other window entry carries a DuckDB
    # oracle.
    oracles = entry_mod.oracle_sql()
    missing = {n for n in EXPECTED_R14_WINDOW if n not in oracles}
    assert missing == ROWS_ONLY_IN_WINDOW, (
        f"unexpected rows-only window slots: {missing ^ ROWS_ONLY_IN_WINDOW}"
    )


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracles without queries: {extra}"


def test_no_stale_red_left_outside_window():
    """Any query whose LATEST driver record is not fully green must sit
    inside the active window for a re-check.  Recomputed from the
    committed CORRECTNESS files — this is the test that forces a red
    record to be re-checked rather than planned around.  As of the r13
    evidence the cumulative ledger holds zero red records; the
    in-window invariant is permanent either way."""
    latest = _driver_history()
    red = [
        name
        for name, rec in latest.items()
        if name in entry_mod.queries() and not _is_green_or_rows_only(rec)
    ]
    outside = sorted(set(red) - set(EXPECTED_R14_WINDOW))
    assert not outside, f"stale-red queries not in window: {outside}"


def _is_green_or_rows_only(rec: dict) -> bool:
    if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
        return True
    # rows-only record: driver ran the Spark side, got rows, no oracle
    return rec.get("err") == "no_oracle" and (rec.get("spark_rows") or 0) > 0


def test_strict_ledger_endgame():
    """The endgame invariant (VERDICT r8 item 4, kept since): EVERY
    registered query must have a committed green/rows-only driver record,
    or sit in the active R14 window, or be a round-14 addition pinned in
    R15_PLANNED.  There is no other escape — a query added with no
    driver-evidence plan fails here immediately."""
    latest = _driver_history()
    evidenced = {n for n, rec in latest.items() if _is_green_or_rows_only(rec)}
    planned = set(EXPECTED_R14_WINDOW) | set(entry_mod.R15_PLANNED)
    uncovered = sorted(set(entry_mod.queries()) - evidenced - planned)
    assert not uncovered, f"queries with no driver-evidence plan: {uncovered}"


def test_r15_overflow_plan_is_well_formed():
    assert len(entry_mod.R15_PLANNED) <= 50
    assert len(set(entry_mod.R15_PLANNED)) == len(entry_mod.R15_PLANNED)
    overlap = set(entry_mod.R15_PLANNED) & set(EXPECTED_R14_WINDOW)
    assert not overlap, f"R15 entries already in the R14 window: {overlap}"
    registered = set(entry_mod.queries())
    ghosts = sorted(set(entry_mod.R15_PLANNED) - registered)
    assert not ghosts, f"R15-planned names not registered: {ghosts}"
    # R15_PLANNED is only for NEW (round-14) queries: none may already
    # hold driver evidence.
    latest = _driver_history()
    stale = sorted(set(entry_mod.R15_PLANNED) & set(latest))
    assert not stale, f"R15-planned names already evidenced: {stale}"
    # The 14 r6-era leftovers are re-checks, NOT round-14 additions —
    # they must not be parked in R15_PLANNED (that slot's strict-ledger
    # escape is for never-evidenced queries), must still be registered,
    # and must still carry exactly r6 evidence so the r15 rotation's
    # oldest-first rule (which the next round's pinned window test
    # re-derives from the CORRECTNESS ledger) cannot skip them
    # (code-review r13: the first form of this pin only asserted
    # registration, which any registered name satisfies).
    latest_round = _latest_round()
    assert not set(R6_LEFTOVER) & set(entry_mod.R15_PLANNED)
    for name in R6_LEFTOVER:
        assert name in registered
        assert latest_round.get(name) == 6, (
            f"{name}: expected r6-era evidence, got {latest_round.get(name)}"
        )


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
