"""Pin the driver-facing query window.

The external correctness harness checks the FIRST 50 entries of
``queries()`` each round.  The window is load-bearing: accidental
reordering (a new module import, a renamed query) would silently rotate
driver evidence away from the families this round is meant to prove.
This test pins the exact first-50 list and basic contract invariants.

Round-13 window composition (executing VERDICT r12 item 1): the 7
queries queued in R13_PLANNED during round 12 (the semdedup family, the
payload-filtered ANN search pair, and the cell-rebalance pair — clearing
the never-checked backlog to zero) + 43 re-checks: the first 43 r5-era
queries alphabetically.  The r12-staged comment said "all 46 r5-era"
but 7 + 46 = 53 overflows the 50-slot window, so the last 3 r5-era
queries (win_pareto_abc, win_pct_of_total, win_running_median) stay the
oldest evidence and lead the R14 re-check block.  The strict-ledger
endgame test enforces: NO registered query may lack a committed driver
record unless it sits in the active window or is a round-13 addition in
R14_PLANNED.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry_mod

EXPECTED_R13_WINDOW = [
    # --- R13_PLANNED: round-12 additions (oracle-checked locally on intro) ---
    "llm_semdedup",
    "llm_semdedup_recall",
    "llm_sim_ann_filtered",  # rows-only by design (k-means cells)
    "llm_sim_ann_filtered_recall",
    "llm_index_cell_rebalance",  # rows-only by design (k-means cells)
    "llm_index_cell_rebalance_recall",
    "llm_semdedup_sweep",
    # --- re-checks: first 43 r5-era queries (alphabetical) ---
    "agg_market_basket",
    "agg_multi_distinct",
    "agg_path_transitions",
    "agg_quantile_sketch_rollup",
    "agg_string_concat_group",
    "agg_time_to_convert",
    "agg_unpivot",
    "dim_scd2_lookup",
    "dq_checks",
    "dq_key_skew_report",
    "dq_profile",
    "dq_snapshot_diff",
    "er_blocking_match",
    "graph_triangle_count",
    "inc_dedup_ingest",
    "inc_scd2_apply",
    "join_bloom_pruned",
    "join_null_skew_rewrite",
    "join_range_bucketed",
    "join_salted_skew",
    "llm_bigram_logprob",
    "llm_dedup_embedding",
    "llm_dedup_keeplist",
    "llm_dedup_minhash_precision",
    "llm_dedup_paragraph",
    "llm_quality_c4",
    "llm_seq_packing_greedy",
    "llm_sim_ann_ivfpq_recall",
    "llm_sim_ann_pq_recall",
    "sample_group_fixed",
    "sample_stratified",
    "sample_weighted",
    "sink_bucketed_colocated_join",
    "sink_merge_upsert",
    "sink_overwrite_partition",
    "sink_zorder_layout",
    "stream_ohlc",
    "ts_ewma",
    "ts_gapfill_locf",
    "win_anomaly_mad",
    "win_gaps_islands",
    "win_interval_coalesce",
    "win_ohlc",
]

# The 3 r5-era queries that did NOT fit the 50-slot window; they must
# lead the R14 re-check block (pinned so the overflow is a plan, not an
# accident).
R5_LEFTOVER = ["win_pareto_abc", "win_pct_of_total", "win_running_median"]

# Window slots without an oracle, each rows-only BY DESIGN with an
# oracle-checked honesty twin adjacent in the same window (the `_recall`
# twins of the filtered-search and rebalance ops are oracled and
# hash-checked).
ROWS_ONLY_IN_WINDOW = {
    "llm_sim_ann_filtered",
    "llm_index_cell_rebalance",
}

_DRIVER_ROUNDS = tuple(range(1, 14))


def _driver_history() -> dict[str, dict]:
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, dict] = {}
    for n in _DRIVER_ROUNDS:
        path = root / f"CORRECTNESS_r{n:02d}.json"
        if path.exists():
            latest.update(json.loads(path.read_text()))
    return latest


def _latest_round(before: int = 13) -> dict[str, int]:
    """Latest driver-record round per query over rounds STRICTLY BEFORE
    ``before`` — the window-composition tests must read the evidence
    state the R13 window was PLANNED against, not the state after the
    driver executes it (code-review r10 finding #1: including the active
    round would break these pins the moment CORRECTNESS_r13.json lands)."""
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, int] = {}
    for n in range(1, before):
        path = root / f"CORRECTNESS_r{n:02d}.json"
        if path.exists():
            for name in json.loads(path.read_text()):
                latest[name] = n
    return latest


def test_window_is_exactly_50():
    assert len(EXPECTED_R13_WINDOW) == 50
    assert len(set(EXPECTED_R13_WINDOW)) == 50


def test_first_50_match_pinned_window():
    qs = list(entry_mod.queries())
    assert qs[:50] == EXPECTED_R13_WINDOW
    assert entry_mod.R13_WINDOW == EXPECTED_R13_WINDOW


def test_window_composition():
    """The window is exactly R13_PLANNED followed by the re-check block;
    the planned block is exactly the never-driver-checked queries, every
    re-check's latest driver record is r5, and the r5 block is complete
    except for the 3 pinned leftovers (recomputed from the committed
    CORRECTNESS files)."""
    assert entry_mod.R13_WINDOW == entry_mod.R13_PLANNED + entry_mod.R13_RECHECKS
    latest_round = _latest_round()
    already = {n for n in entry_mod.R13_PLANNED if n in latest_round}
    assert not already, f"R13_PLANNED slots already evidenced: {already}"
    bad_r5 = {
        n: latest_round.get(n)
        for n in entry_mod.R13_RECHECKS
        if latest_round.get(n) != 5
    }
    assert not bad_r5, f"r5-era re-check slots with other evidence: {bad_r5}"
    # the r5 block is complete up to the 3 pinned leftovers: no OTHER
    # registered query outside the window may still carry r5-or-older
    # evidence once this window executes.
    stale_outside = {
        n for n, r in latest_round.items()
        if r <= 5 and n in entry_mod.queries() and n not in entry_mod.R13_WINDOW
    }
    assert stale_outside == set(R5_LEFTOVER), (
        f"unplanned stale queries outside window: {stale_outside ^ set(R5_LEFTOVER)}"
    )


def test_every_window_query_is_registered():
    qs = entry_mod.queries()
    missing = [n for n in EXPECTED_R13_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_window_oracle_coverage():
    # Exactly two rows-only slots this round (each by design, with an
    # oracled honesty twin); every other window entry carries a DuckDB
    # oracle.
    oracles = entry_mod.oracle_sql()
    missing = {n for n in EXPECTED_R13_WINDOW if n not in oracles}
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
    record to be re-checked rather than planned around.  As of the r12
    evidence the cumulative ledger holds zero red records; the
    in-window invariant is permanent either way."""
    latest = _driver_history()
    red = [
        name
        for name, rec in latest.items()
        if name in entry_mod.queries() and not _is_green_or_rows_only(rec)
    ]
    outside = sorted(set(red) - set(EXPECTED_R13_WINDOW))
    assert not outside, f"stale-red queries not in window: {outside}"


def _is_green_or_rows_only(rec: dict) -> bool:
    if rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match"):
        return True
    # rows-only record: driver ran the Spark side, got rows, no oracle
    return rec.get("err") == "no_oracle" and (rec.get("spark_rows") or 0) > 0


def test_strict_ledger_endgame():
    """The endgame invariant (VERDICT r8 item 4, kept since): EVERY
    registered query must have a committed green/rows-only driver record,
    or sit in the active R13 window, or be a round-13 addition pinned in
    R14_PLANNED.  There is no other escape — a query added with no
    driver-evidence plan fails here immediately."""
    latest = _driver_history()
    evidenced = {n for n, rec in latest.items() if _is_green_or_rows_only(rec)}
    planned = set(EXPECTED_R13_WINDOW) | set(entry_mod.R14_PLANNED)
    uncovered = sorted(set(entry_mod.queries()) - evidenced - planned)
    assert not uncovered, f"queries with no driver-evidence plan: {uncovered}"


def test_r14_overflow_plan_is_well_formed():
    assert len(entry_mod.R14_PLANNED) <= 50
    assert len(set(entry_mod.R14_PLANNED)) == len(entry_mod.R14_PLANNED)
    overlap = set(entry_mod.R14_PLANNED) & set(EXPECTED_R13_WINDOW)
    assert not overlap, f"R14 entries already in the R13 window: {overlap}"
    registered = set(entry_mod.queries())
    ghosts = sorted(set(entry_mod.R14_PLANNED) - registered)
    assert not ghosts, f"R14-planned names not registered: {ghosts}"
    # R14_PLANNED is only for NEW (round-13) queries: none may already
    # hold driver evidence.
    latest = _driver_history()
    stale = sorted(set(entry_mod.R14_PLANNED) & set(latest))
    assert not stale, f"R14-planned names already evidenced: {stale}"
    # The 3 r5-era leftovers are re-checks, NOT round-13 additions —
    # they must not be parked in R14_PLANNED (that slot's strict-ledger
    # escape is for never-evidenced queries), must still be registered,
    # and must still carry exactly r5 evidence so the r14 rotation's
    # oldest-first rule (which the next round's pinned window test
    # re-derives from the CORRECTNESS ledger) cannot skip them
    # (code-review r13: the first form of this pin only asserted
    # registration, which any registered name satisfies).
    latest_round = _latest_round()
    assert not set(R5_LEFTOVER) & set(entry_mod.R14_PLANNED)
    for name in R5_LEFTOVER:
        assert name in registered
        assert latest_round.get(name) == 5, (
            f"{name}: expected r5-era evidence, got {latest_round.get(name)}"
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
