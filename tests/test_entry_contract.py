"""Pin the driver-facing query window.

The external correctness harness checks the FIRST 50 entries of
``queries()`` each round.  The window is load-bearing: accidental
reordering (a new module import, a renamed query) would silently rotate
driver evidence away from the families this round is meant to prove.
This test pins the exact first-50 list and basic contract invariants.

Round-9 window composition (VERDICT r8 "Next round" item 1): the 14
queries queued in R9_PLANNED during round 8 (clearing the never-checked
backlog to zero) + the 36 oldest-evidence re-checks (27 r1-era
extended-inventory stragglers and the 9 oldest r2-era core aggs).
CORRECTNESS_r08 landed 50/50 green so there are no red re-checks.
After R9 executes, every registered query has driver evidence no older
than r2 — the strict-ledger test below enforces the endgame form
(VERDICT r8 item 4): NO registered query may lack a committed driver
record unless it sits in the active window or is a round-9 addition in
R10_PLANNED.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry_mod

EXPECTED_R9_WINDOW = [
    # --- R9_PLANNED: round-8 additions (oracle-checked locally on intro) ---
    "llm_bpe_train",
    "llm_bpe_encode",
    "mm_shard_manifest",
    "llm_split_leakage",
    "llm_dsir_weights",
    "pipeline_dag_resume",
    "llm_emb_pca",  # rows-only by design (LAPACK floats; variance twin oracled)
    "llm_emb_pca_variance",
    "llm_dsir_resample",
    "stream_checkpoint_resume",
    "inc_subject_erasure",
    "llm_dedup_softweight",
    "pipeline_run_report",
    "agg_sketch_overlap",
    # --- re-checks: r1-era extended-inventory stragglers ---
    "fn_array_setops",
    "fn_bitwise",
    "fn_encode",
    "fn_format",
    "fn_interval_arith",
    "fn_struct_nested",
    "fn_surrogate_key",
    "fn_trig",
    "fn_url",
    "fn_xml",
    "llm_dedup_editdist",
    "llm_dedup_embcos",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_simhash",  # rows-only by design; `_recall` twin oracled
    "llm_dedup_url",
    "llm_lang_id",
    "llm_quality_score",
    "llm_sim_ann_ivf",  # rows-only by design; `_recall` twin oracled
    "llm_sim_ann_lsh",
    "llm_sim_ann_multiprobe",
    "llm_sim_ann_recall",
    "llm_sim_knn_classify",
    "ml_kmeans_tiers",  # rows-only by design; ml_kmeans_quality oracled
    "ml_kmeanspp_tiers",  # rows-only by design; quality twin oracled
    "ml_linear_scoring",
    "mm_binary_features",
    "mm_frame_sample",
    # --- re-checks: oldest r2-era core aggs ---
    "agg_collect",
    "agg_count_distinct",
    "agg_cube",
    "agg_first_last",
    "agg_group_basic",
    "agg_grouping_sets",
    "agg_having",
    "agg_histogram",
    "agg_mode_per_group",
]

# Window slots without an oracle, each rows-only BY DESIGN with an
# oracle-checked honesty twin (see the per-slot comments above).
ROWS_ONLY_IN_WINDOW = {
    "llm_emb_pca",
    "llm_dedup_simhash",
    "llm_sim_ann_ivf",
    "ml_kmeans_tiers",
    "ml_kmeanspp_tiers",
}

_DRIVER_ROUNDS = tuple(range(1, 10))


def _driver_history() -> dict[str, dict]:
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, dict] = {}
    for n in _DRIVER_ROUNDS:
        path = root / f"CORRECTNESS_r{n:02d}.json"
        if path.exists():
            latest.update(json.loads(path.read_text()))
    return latest


def test_window_is_exactly_50():
    assert len(EXPECTED_R9_WINDOW) == 50
    assert len(set(EXPECTED_R9_WINDOW)) == 50


def test_first_50_match_pinned_window():
    qs = list(entry_mod.queries())
    assert qs[:50] == EXPECTED_R9_WINDOW
    assert entry_mod.R9_WINDOW == EXPECTED_R9_WINDOW


def test_window_composition():
    """The window is exactly R9_PLANNED followed by the re-check block;
    the planned block is exactly the never-driver-checked queries and the
    re-checks only contain queries whose latest driver record is r1/r2
    (recomputed from the committed CORRECTNESS files)."""
    assert entry_mod.R9_WINDOW == entry_mod.R9_PLANNED + entry_mod.R9_RECHECKS
    root = pathlib.Path(__file__).resolve().parent.parent
    latest_round: dict[str, int] = {}
    for n in range(1, 9):
        path = root / f"CORRECTNESS_r{n:02d}.json"
        if path.exists():
            for name in json.loads(path.read_text()):
                latest_round[name] = n
    never_checked = {n for n in entry_mod.R9_PLANNED if n in latest_round}
    assert not never_checked, f"R9_PLANNED slots already evidenced: {never_checked}"
    stale = {n: latest_round.get(n) for n in entry_mod.R9_RECHECKS}
    too_fresh = {n: r for n, r in stale.items() if r is None or r > 2}
    assert not too_fresh, f"re-check slots with fresh evidence: {too_fresh}"


def test_every_window_query_is_registered():
    qs = entry_mod.queries()
    missing = [n for n in EXPECTED_R9_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_window_oracle_coverage():
    # Exactly five rows-only slots this round (each by design, with an
    # oracled honesty twin); every other window entry carries a DuckDB
    # oracle.
    oracles = entry_mod.oracle_sql()
    missing = {n for n in EXPECTED_R9_WINDOW if n not in oracles}
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
    Recomputed from the committed CORRECTNESS files; r1-r8 ended 50/50
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
    outside = sorted(set(red) - set(EXPECTED_R9_WINDOW))
    assert not outside, f"stale-red oracle-able queries not in window: {outside}"


def _is_green_or_rows_only(rec: dict) -> bool:
    if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
        return True
    # rows-only record: driver ran the Spark side, got rows, no oracle
    return rec.get("err") == "no_oracle" and (rec.get("spark_rows") or 0) > 0


def test_strict_ledger_endgame():
    """VERDICT r8 item 4 (the endgame flip): EVERY registered query must
    have a committed green/rows-only driver record, or sit in the active
    R9 window, or be a round-9 addition pinned in R10_PLANNED.  There is
    no other escape — a query added with no driver-evidence plan fails
    here immediately."""
    latest = _driver_history()
    evidenced = {n for n, rec in latest.items() if _is_green_or_rows_only(rec)}
    planned = set(EXPECTED_R9_WINDOW) | set(entry_mod.R10_PLANNED)
    uncovered = sorted(set(entry_mod.queries()) - evidenced - planned)
    assert not uncovered, f"queries with no driver-evidence plan: {uncovered}"


def test_r10_overflow_plan_is_well_formed():
    assert len(entry_mod.R10_PLANNED) <= 50
    assert len(set(entry_mod.R10_PLANNED)) == len(entry_mod.R10_PLANNED)
    overlap = set(entry_mod.R10_PLANNED) & set(EXPECTED_R9_WINDOW)
    assert not overlap, f"R10 entries already in the R9 window: {overlap}"
    registered = set(entry_mod.queries())
    ghosts = sorted(set(entry_mod.R10_PLANNED) - registered)
    assert not ghosts, f"R10-planned names not registered: {ghosts}"
    # R10_PLANNED is only for NEW (round-9) queries: none may already
    # hold driver evidence.
    latest = _driver_history()
    stale = sorted(set(entry_mod.R10_PLANNED) & set(latest))
    assert not stale, f"R10-planned names already evidenced: {stale}"


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
