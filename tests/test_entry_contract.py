"""Pin the driver-facing query window.

The external correctness harness checks the FIRST 50 entries of
``queries()`` each round.  The window is load-bearing: accidental
reordering (a new module import, a renamed query) would silently rotate
driver evidence away from the families this round is meant to prove.
This test pins the exact first-50 list and basic contract invariants.

Round-8 window composition (VERDICT r7 "Next round" item 1): the 25
queries queued in R8_PLANNED across rounds 6-7 + the 25 oldest-evidence
re-checks (all 13 core SURVEY §2 IDs whose latest driver record dates to
r1, including the rows-only-by-design llm_dedup_minhash, plus the 12
r2-era core joins).  After R8 executes, every pre-r8 registered query
has driver evidence no older than r2 and the never-checked backlog is
exactly R9_PLANNED — the strict-ledger test below enforces that from the
committed CORRECTNESS files.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry_mod

EXPECTED_R8_WINDOW = [
    # --- R8_PLANNED: the two round-6 carryovers... ---
    "ts_rolling_slope",
    "graph_label_propagation",
    # --- ...plus the round-7 additions (oracle-checked locally then) ---
    "agg_hhi_concentration",
    "ts_cross_correlation",
    "agg_cms_heavy_hitters",
    "llm_cross_entropy_heldout",
    "llm_bigram_pmi_top20",
    "llm_dup_cluster_histogram",
    "llm_emb_dim_stats",
    "dq_duplicate_key_report",
    "ml_gradient_step_linear",
    "graph_kcore",
    "ml_auc_roc",
    "ml_calibration_bins",
    "ml_confusion_metrics",
    "llm_ngram_coverage_curve",
    "agg_session_stats",
    "llm_emb_gram_matrix",
    "llm_lang_id_confusion",
    "llm_sft_lint",
    "stream_content_dedup",
    "agg_ship_latency",
    "ts_sma_crossover",
    "agg_partial_final",
    "dim_calendar_build",
    # --- re-checks: r1-era core §2 IDs ---
    "fn_regexp",
    "fn_math",
    "fn_array",
    "fn_explode",
    "fn_hash",
    "fn_conditional",
    "llm_dedup_exact",
    "llm_dedup_minhash",  # rows-only by design (engine-specific seeds)
    "llm_sim_cosine_topk",
    "llm_sim_centroid",
    "llm_text_stats",
    "llm_text_tfidf",  # byte-gated dfreq broadcast this round
    "llm_multimodal_join",
    # --- re-checks: r2-era core joins ---
    "join_inner_equi",
    "join_multiway",
    "join_semi",
    "join_anti",
    "join_broadcast",
    "join_cross",
    "join_theta_range",
    "join_asof",
    "join_self_agg",
    "join_left",
    "join_right",
    "join_full",
]

# The single window slot without an oracle: llm_dedup_minhash's sketch
# buckets depend on engine-specific xxhash64 seeds; its `_recall` /
# `_precision` honesty twins ARE oracle-checked (driver-green r4/r5).
ROWS_ONLY_IN_WINDOW = {"llm_dedup_minhash"}

_DRIVER_ROUNDS = tuple(range(1, 9))


def _driver_history() -> dict[str, dict]:
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, dict] = {}
    for n in _DRIVER_ROUNDS:
        path = root / f"CORRECTNESS_r{n:02d}.json"
        if path.exists():
            latest.update(json.loads(path.read_text()))
    return latest


def test_window_is_exactly_50():
    assert len(EXPECTED_R8_WINDOW) == 50
    assert len(set(EXPECTED_R8_WINDOW)) == 50


def test_first_50_match_pinned_window():
    qs = list(entry_mod.queries())
    assert qs[:50] == EXPECTED_R8_WINDOW
    assert entry_mod.R8_WINDOW == EXPECTED_R8_WINDOW


def test_window_composition():
    """The window is exactly R8_PLANNED followed by the re-check block,
    and the re-checks only contain queries whose latest driver record is
    r1/r2 (recomputed from the committed CORRECTNESS files)."""
    assert entry_mod.R8_WINDOW == entry_mod.R8_PLANNED + entry_mod.R8_RECHECKS
    root = pathlib.Path(__file__).resolve().parent.parent
    latest_round: dict[str, int] = {}
    for n in (1, 2, 3, 4, 5, 6, 7):
        path = root / f"CORRECTNESS_r0{n}.json"
        if path.exists():
            for name in json.loads(path.read_text()):
                latest_round[name] = n
    stale = {n: latest_round.get(n) for n in entry_mod.R8_RECHECKS}
    too_fresh = {n: r for n, r in stale.items() if r is None or r > 2}
    assert not too_fresh, f"re-check slots with fresh evidence: {too_fresh}"


def test_every_window_query_is_registered():
    qs = entry_mod.queries()
    missing = [n for n in EXPECTED_R8_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_window_oracle_coverage():
    # Exactly one rows-only slot this round (llm_dedup_minhash); every
    # other window entry carries a DuckDB oracle.
    oracles = entry_mod.oracle_sql()
    missing = {n for n in EXPECTED_R8_WINDOW if n not in oracles}
    assert missing == ROWS_ONLY_IN_WINDOW, (
        f"unexpected rows-only window slots: {missing ^ ROWS_ONLY_IN_WINDOW}"
    )


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracles without queries: {extra}"


def test_no_stale_red_left_outside_window():
    """Any query whose LATEST driver record is red (oracle-able but not
    fully green) must sit inside the active window for a re-check.
    Recomputed from the committed CORRECTNESS files; r1-r7 ended 50/50
    green so this is expected vacuous — it exists to catch a regression
    being planned around rather than re-checked."""
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
    outside = sorted(set(red) - set(EXPECTED_R8_WINDOW))
    assert not outside, f"stale-red oracle-able queries not in window: {outside}"


def _is_green_or_rows_only(rec: dict) -> bool:
    if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
        return True
    # rows-only record: driver ran the Spark side, got rows, no oracle
    return rec.get("err") == "no_oracle" and (rec.get("spark_rows") or 0) > 0


def test_evidence_ledger_covers_every_query():
    """Every registered query must have a green-or-rows-only driver
    record in the committed CORRECTNESS files, OR a pinned slot in the
    active window / R9_PLANNED.  A future query added with no
    driver-evidence plan fails here immediately."""
    latest = _driver_history()
    evidenced = {n for n, rec in latest.items() if _is_green_or_rows_only(rec)}
    planned = set(EXPECTED_R8_WINDOW) | set(entry_mod.R9_PLANNED)
    uncovered = sorted(set(entry_mod.queries()) - evidenced - planned)
    assert not uncovered, f"queries with no driver-evidence plan: {uncovered}"


def test_strict_ledger_pre_r8_backlog_is_empty():
    """VERDICT r7 item 6 (tightened ledger, endgame form): every query
    registered BEFORE round 8 must either have a committed driver record
    or sit in the active R8 window — there is NO plan-list escape for
    pre-r8 queries.  Only round-8 additions (R9_PLANNED) may wait."""
    latest = _driver_history()
    evidenced = {n for n, rec in latest.items() if _is_green_or_rows_only(rec)}
    pre_r8 = set(entry_mod.queries()) - set(entry_mod.R9_PLANNED)
    uncovered = sorted(pre_r8 - evidenced - set(EXPECTED_R8_WINDOW))
    assert not uncovered, f"pre-r8 queries with no driver record: {uncovered}"


def test_r9_overflow_plan_is_well_formed():
    assert len(entry_mod.R9_PLANNED) <= 50
    assert len(set(entry_mod.R9_PLANNED)) == len(entry_mod.R9_PLANNED)
    overlap = set(entry_mod.R9_PLANNED) & set(EXPECTED_R8_WINDOW)
    assert not overlap, f"R9 entries already in the R8 window: {overlap}"
    registered = set(entry_mod.queries())
    ghosts = sorted(set(entry_mod.R9_PLANNED) - registered)
    assert not ghosts, f"R9-planned names not registered: {ghosts}"


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
