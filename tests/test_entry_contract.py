"""Pin the driver-facing query window.

The external correctness harness checks the FIRST 50 entries of
``queries()`` each round.  The window is load-bearing: accidental
reordering (a new module import, a renamed query) would silently rotate
driver evidence away from the families this round is meant to prove.
This test pins the exact first-50 list and basic contract invariants.

Round-5 window composition (VERDICT r4 "Next round" item 1): the first 50
oracle-checkable entries of the round-4 R5_PLANNED rotation list — the
r3-era scale/analytics/dq ops plus everything added in round 4.
CORRECTNESS_r04 was 50/50 green so there are no red re-checks.
R6_PLANNED pins the closeout: the 14 remaining r3/r4-era oracled
queries, every query added during round 5 (31), and 4 rows-only ops
taking (weaker) rows-only driver slots — 49 of the 50-slot window.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry_mod

EXPECTED_R5_WINDOW = [
    "agg_string_concat_group",
    "agg_multi_distinct",
    "agg_quantile_sketch_rollup",
    "agg_higher_moments",
    "agg_conditional",
    "agg_path_transitions",
    "agg_time_to_convert",
    "win_gaps_islands",
    "win_pct_of_total",
    "win_interval_coalesce",
    "dq_checks",
    "dq_key_skew_report",
    "er_blocking_match",
    "join_salted_skew",
    "join_bloom_pruned",
    "join_range_bucketed",
    "join_null_skew_rewrite",
    "sink_bucketed_colocated_join",
    "sink_overwrite_partition",
    "sink_merge_upsert",
    "llm_seq_packing_greedy",
    "sample_group_fixed",
    "sample_stratified",
    "inc_dedup_ingest",
    "llm_dedup_embedding",
    "llm_dedup_paragraph",
    "llm_quality_c4",
    "llm_sim_ann_pq_recall",
    "dim_scd2_lookup",
    "agg_unpivot",
    "ts_gapfill_locf",
    "llm_dedup_keeplist",
    "llm_bigram_logprob",
    "llm_sim_ann_ivfpq_recall",
    "ts_ewma",
    "dq_profile",
    "sink_zorder_layout",
    "agg_aqp_estimate",
    "graph_triangle_count",
    "win_running_median",
    "inc_scd2_apply",
    "agg_market_basket",
    "agg_gini",
    "win_ohlc",
    "win_pareto_abc",
    "dq_snapshot_diff",
    "llm_dedup_minhash_precision",
    "stream_ohlc",
    "sample_weighted",
    "win_anomaly_mad",
]

_DRIVER_ROUNDS = (1, 2, 3, 4)


def _driver_history() -> dict[str, dict]:
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, dict] = {}
    for n in _DRIVER_ROUNDS:
        path = root / f"CORRECTNESS_r0{n}.json"
        if path.exists():
            latest.update(json.loads(path.read_text()))
    return latest


def test_window_is_exactly_50():
    assert len(EXPECTED_R5_WINDOW) == 50
    assert len(set(EXPECTED_R5_WINDOW)) == 50


def test_first_50_match_pinned_window():
    qs = list(entry_mod.queries())
    assert qs[:50] == EXPECTED_R5_WINDOW
    assert entry_mod.R5_WINDOW == EXPECTED_R5_WINDOW


def test_every_window_query_is_registered():
    qs = entry_mod.queries()
    missing = [n for n in EXPECTED_R5_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_every_window_query_has_an_oracle():
    # A windowed query without an oracle burns a driver slot on a
    # rows-only record; the window must be 50 oracle-checkable queries.
    oracles = entry_mod.oracle_sql()
    missing = [n for n in EXPECTED_R5_WINDOW if n not in oracles]
    assert not missing, f"window names without oracles: {missing}"


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracles without queries: {extra}"


def test_r5_targets_stale_red_and_never_checked():
    """The window must clear every stale-red oracle-able driver record.

    Recomputes "latest driver record is red" from the committed
    CORRECTNESS_r0{1..4}.json files; every such query with an oracle must
    be inside R5_WINDOW.  (CORRECTNESS_r04 was 50/50 green, so this is
    expected to be vacuous — the test exists to catch a regression being
    planned around rather than re-checked.)
    """
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
    outside = sorted(set(red) - set(EXPECTED_R5_WINDOW))
    assert not outside, f"stale-red oracle-able queries not in window: {outside}"


def test_r6_plan_covers_every_remaining_query():
    """R5_WINDOW ∪ R6_PLANNED ∪ driver history must cover EVERY registered
    query — including rows-only ops, which take weaker rows-only driver
    slots in R6.  A query added in round 5+ without an R6_PLANNED entry
    fails here."""
    seen = set(_driver_history())
    qs = set(entry_mod.queries())
    covered = (
        seen
        | set(EXPECTED_R5_WINDOW)
        | set(entry_mod.R6_PLANNED)
        | set(entry_mod.R7_PLANNED)
    )
    uncovered = sorted(qs - covered)
    assert not uncovered, f"queries with no driver-evidence plan: {uncovered}"


def test_r6_plan_fits_one_window():
    assert len(entry_mod.R6_PLANNED) <= 50
    assert len(set(entry_mod.R6_PLANNED)) == len(entry_mod.R6_PLANNED)
    overlap = set(entry_mod.R6_PLANNED) & set(EXPECTED_R5_WINDOW)
    assert not overlap, f"R6 entries already in R5 window: {overlap}"


def test_r7_overflow_plan_is_well_formed():
    assert len(entry_mod.R7_PLANNED) <= 50
    assert len(set(entry_mod.R7_PLANNED)) == len(entry_mod.R7_PLANNED)
    overlap = set(entry_mod.R7_PLANNED) & (
        set(entry_mod.R6_PLANNED) | set(EXPECTED_R5_WINDOW)
    )
    assert not overlap, f"R7 entries already planned earlier: {overlap}"


def test_bench_headline_queries_registered():
    """Every bench row must resolve to a registered query — a rename that
    silently drops a row from the bench (it degrades gracefully by design)
    would otherwise go unnoticed until the driver's BENCH_r{N} shrinks."""
    import bench

    qs = entry_mod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench rows not registered: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
