"""Pin the driver-facing query window.

The external correctness harness checks the FIRST 50 entries of
``queries()`` each round.  The window is load-bearing: accidental
reordering (a new module import, a renamed query) would silently rotate
driver evidence away from the families this round is meant to prove.
This test pins the exact first-50 list and basic contract invariants.

Round-15 window composition (executing VERDICT r14 item 7): the 5
queries queued in R15_PLANNED during round 14 (cross-set SemDeDup pair,
index maintenance-policy pair, quality threshold sweep — clearing the
never-checked backlog to zero) + 45 re-checks: the 14 pinned r6-era
leftovers FIRST (llm_sim_mmr_rerank .. win_zscore_rolling — the
r14-generation R6_LEFTOVER pin demanded they lead this block), then the
first 31 r7-era queries alphabetically.  The 19 remaining r7-era
queries (llm_quality_composite .. udf_arrow_map) stay the oldest
evidence and lead the R16 re-check block.  The strict-ledger endgame
test enforces: NO registered query may lack a committed driver record
unless it sits in the active window or is queued in R16_PLANNED (empty
— round 15 is an optimization round and added no queries).
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry_mod

EXPECTED_R15_WINDOW = [
    # --- R15_PLANNED: round-14 additions (oracle-checked locally on intro) ---
    "llm_semdedup_crossset",
    "llm_semdedup_crossset_recall",
    "llm_index_maintenance_policy",  # rows-only by design (k-means metrics)
    "llm_index_maintenance_policy_contract",
    "llm_quality_threshold_sweep",
    # --- re-checks: the 14 pinned r6-era leftovers lead the block ---
    "llm_sim_mmr_rerank",  # rows-only by design (greedy MMR selection)
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
    # --- re-checks: first 31 r7-era queries (alphabetical) ---
    "agg_bootstrap_ci",
    "agg_chisq_independence",
    "agg_decay_score",
    "agg_funnel_timebound",
    "agg_ks_test",
    "agg_mann_whitney",
    "agg_path_trigrams",
    "agg_theil_sen",
    "agg_trimmed_mean",
    "agg_welch_ttest",
    "agg_wow_growth",
    "dq_freshness",
    "dq_psi_drift",
    "dq_schema_contract",
    "dq_volume_anomaly",
    "er_golden_record",
    "graph_assortativity",
    "graph_bfs_distance",
    "graph_clustering_local",
    "inc_partition_rebuild",
    "inc_snapshot_expire",
    "join_asof_tolerance",
    "llm_charset_report",
    "llm_dedup_simhash_recall",
    "llm_dedup_threshold_sweep",
    "llm_emb_quantize_int8",
    "llm_hard_negatives",
    "llm_length_histogram",
    "llm_mixture_epochs",
    "llm_ngram_kneser_ney",
    "llm_packing_efficiency",
]

# The 19 r7-era queries that did NOT fit the 50-slot window; they are
# the oldest evidence after this window executes and must lead the R16
# re-check block (pinned so the overflow is a plan, not an accident).
R7_LEFTOVER = [
    "llm_quality_composite",
    "llm_retrieval_ndcg",
    "llm_sft_pairs",
    "llm_tokenizer_fertility",
    "llm_ttr_hapax",
    "llm_vocab_coverage",
    "llm_zipf_slope",
    "ml_feature_scale",
    "ml_kmeans_quality",
    "ml_target_encoding",
    "pipeline_dag_run",
    "stream_anomaly_zscore",
    "ts_acf",
    "ts_forecast_backtest",
    "ts_holt_damped",
    "ts_holt_linear",
    "ts_holt_winters",
    "ts_stl_decompose",
    "udf_arrow_map",
]

# Window slots without an oracle, each rows-only BY DESIGN with an
# oracle-checked honesty twin: `llm_index_maintenance_policy` (k-means
# internal metrics) sits adjacent to its oracled `_contract` twin in
# this window, and `llm_sim_mmr_rerank` (greedy MMR selection order is
# tie-broken by float dot products DuckDB cannot reproduce exactly) was
# rows-only in its r6 driver record by the same design.
ROWS_ONLY_IN_WINDOW = {
    "llm_index_maintenance_policy",
    "llm_sim_mmr_rerank",
}

_DRIVER_ROUNDS = tuple(range(1, 16))


def _driver_history() -> dict[str, dict]:
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, dict] = {}
    for n in _DRIVER_ROUNDS:
        path = root / f"CORRECTNESS_r{n:02d}.json"
        if path.exists():
            latest.update(json.loads(path.read_text()))
    return latest


def _latest_round(before: int = 15) -> dict[str, int]:
    """Latest driver-record round per query over rounds STRICTLY BEFORE
    ``before`` — the window-composition tests must read the evidence
    state the R15 window was PLANNED against, not the state after the
    driver executes it (code-review r10 finding #1: including the active
    round would break these pins the moment CORRECTNESS_r15.json lands)."""
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, int] = {}
    for n in range(1, before):
        path = root / f"CORRECTNESS_r{n:02d}.json"
        if path.exists():
            for name in json.loads(path.read_text()):
                latest[name] = n
    return latest


def test_window_is_exactly_50():
    assert len(EXPECTED_R15_WINDOW) == 50
    assert len(set(EXPECTED_R15_WINDOW)) == 50


def test_first_50_match_pinned_window():
    qs = list(entry_mod.queries())
    assert qs[:50] == EXPECTED_R15_WINDOW
    assert entry_mod.R15_WINDOW == EXPECTED_R15_WINDOW


def test_window_composition():
    """The window is exactly R15_PLANNED followed by the re-check block;
    the planned block is exactly the never-driver-checked queries, the
    re-check block leads with the 14 r6-era leftovers then r7-era
    evidence, and nothing outside the window carries older-than-r7
    evidence (recomputed from the committed CORRECTNESS files)."""
    assert entry_mod.R15_WINDOW == entry_mod.R15_PLANNED + entry_mod.R15_RECHECKS
    latest_round = _latest_round()
    already = {n for n in entry_mod.R15_PLANNED if n in latest_round}
    assert not already, f"R15_PLANNED slots already evidenced: {already}"
    # re-check block: 14 r6-era leftovers first, then 31 r7-era queries
    lead, tail = entry_mod.R15_RECHECKS[:14], entry_mod.R15_RECHECKS[14:]
    assert lead == [
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
    bad_r6 = {n: latest_round.get(n) for n in lead if latest_round.get(n) != 6}
    assert not bad_r6, f"r6-leftover slots with other evidence: {bad_r6}"
    bad_r7 = {n: latest_round.get(n) for n in tail if latest_round.get(n) != 7}
    assert not bad_r7, f"r7-era re-check slots with other evidence: {bad_r7}"
    # oldest-first completeness: after this window executes, the only
    # registered queries still carrying r7-or-older evidence are the 19
    # pinned R7_LEFTOVER rows (no unplanned stale query hides outside).
    stale_outside = {
        n for n, r in latest_round.items()
        if r <= 7 and n in entry_mod.queries() and n not in entry_mod.R15_WINDOW
    }
    assert stale_outside == set(R7_LEFTOVER), (
        f"unplanned stale queries outside window: {stale_outside ^ set(R7_LEFTOVER)}"
    )


def test_every_window_query_is_registered():
    qs = entry_mod.queries()
    missing = [n for n in EXPECTED_R15_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_window_oracle_coverage():
    # Exactly two rows-only slots this round (each by design, with an
    # oracled honesty twin); every other window entry carries a DuckDB
    # oracle.
    oracles = entry_mod.oracle_sql()
    missing = {n for n in EXPECTED_R15_WINDOW if n not in oracles}
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
    record to be re-checked rather than planned around.  As of the r14
    evidence the cumulative ledger holds zero red records; the
    in-window invariant is permanent either way."""
    latest = _driver_history()
    red = [
        name
        for name, rec in latest.items()
        if name in entry_mod.queries() and not _is_green_or_rows_only(rec)
    ]
    outside = sorted(set(red) - set(EXPECTED_R15_WINDOW))
    assert not outside, f"stale-red queries not in window: {outside}"


def _is_green_or_rows_only(rec: dict) -> bool:
    if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
        return True
    # rows-only record: driver ran the Spark side, got rows, no oracle
    return rec.get("err") == "no_oracle" and (rec.get("spark_rows") or 0) > 0


def test_strict_ledger_endgame():
    """The endgame invariant (VERDICT r8 item 4, kept since): EVERY
    registered query must have a committed green/rows-only driver record,
    or sit in the active R15 window, or be queued in R16_PLANNED.  There
    is no other escape — a query added with no driver-evidence plan
    fails here immediately."""
    latest = _driver_history()
    evidenced = {n for n, rec in latest.items() if _is_green_or_rows_only(rec)}
    planned = set(EXPECTED_R15_WINDOW) | set(entry_mod.R16_PLANNED)
    uncovered = sorted(set(entry_mod.queries()) - evidenced - planned)
    assert not uncovered, f"queries with no driver-evidence plan: {uncovered}"


def test_r16_overflow_plan_is_well_formed():
    """Round 15 is an optimization round: no queries were added, so
    R16_PLANNED must be empty — any entry would mean a new query snuck
    into an optimization round (VERDICT r14 process note)."""
    assert entry_mod.R16_PLANNED == []
    # The 19 r7-era leftovers are re-checks for R16, NOT additions —
    # they must still be registered and must still carry exactly r7
    # evidence so the r16 rotation's oldest-first rule (which the next
    # round's pinned window test re-derives from the CORRECTNESS
    # ledger) cannot skip them.
    registered = set(entry_mod.queries())
    latest_round = _latest_round()
    for name in R7_LEFTOVER:
        assert name in registered
        assert latest_round.get(name) == 7, (
            f"{name}: expected r7-era evidence, got {latest_round.get(name)}"
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
