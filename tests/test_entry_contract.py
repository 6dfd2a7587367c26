"""Pin the driver-facing query window.

The external correctness harness checks the FIRST 50 entries of
``queries()`` each round.  The window is load-bearing: accidental
reordering (a new module import, a renamed query) would silently rotate
driver evidence away from the families this round is meant to prove.
This test pins the exact first-50 list and basic contract invariants.

Round-4 window composition (VERDICT r3 "Next round" item 1): the 12
stale-red driver records first, then llm_lang_partition, then 37
never-driver-checked queries (TPC-H q2..q22, graph/analytics, r3 recall
ops, llm text ops).  R5_PLANNED pins the rotation plan for the remaining
never-checked queries so none ends round 5 without driver evidence.
"""

from __future__ import annotations

import json
import pathlib

import __spark_entry__ as entry_mod

EXPECTED_R4_WINDOW = [
    "fn_string",
    "fn_date",
    "fn_map",
    "fn_json",
    "fn_datetime_tz",
    "fn_variant",
    "llm_emb_normalize",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "llm_dedup_clusters",
    "llm_corpus_pipeline",
    "mm_binaryfile_scan",
    "llm_lang_partition",
    "tpch_q2",
    "tpch_q3",
    "tpch_q4",
    "tpch_q5",
    "tpch_q6",
    "tpch_q7",
    "tpch_q8",
    "tpch_q9",
    "tpch_q10",
    "tpch_q11",
    "tpch_q12",
    "tpch_q13",
    "tpch_q14",
    "tpch_q15",
    "tpch_q16",
    "tpch_q17",
    "tpch_q18",
    "tpch_q19",
    "tpch_q20",
    "tpch_q21",
    "tpch_q22",
    "graph_pagerank",
    "agg_funnel",
    "agg_retention_cohort",
    "agg_heavy_hitters",
    "llm_dedup_minhash_recall",
    "llm_sim_ann_ivf_recall",
    "llm_dedup_substring",
    "ml_churn_label",
    "win_cumulative_distinct",
    "llm_decontaminate",
    "llm_token_count",
    "llm_fingerprint",
    "llm_pii_scrub",
    "llm_bm25_search",
    "llm_doc_chunking",
    "llm_unigram_logprob",
]


def test_window_is_exactly_50():
    assert len(EXPECTED_R4_WINDOW) == 50
    assert len(set(EXPECTED_R4_WINDOW)) == 50


def test_first_50_match_pinned_window():
    qs = list(entry_mod.queries())
    assert qs[:50] == EXPECTED_R4_WINDOW
    assert entry_mod.R4_WINDOW == EXPECTED_R4_WINDOW


def test_every_window_query_is_registered():
    qs = entry_mod.queries()
    missing = [n for n in EXPECTED_R4_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_every_window_query_has_an_oracle():
    # A windowed query without an oracle burns a driver slot on a
    # rows-only record; the window must be 50 oracle-checkable queries.
    oracles = entry_mod.oracle_sql()
    missing = [n for n in EXPECTED_R4_WINDOW if n not in oracles]
    assert not missing, f"window names without oracles: {missing}"


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracles without queries: {extra}"


def test_r4_targets_stale_red_and_never_checked():
    """The window must clear every stale-red oracle-able driver record.

    Recomputes "latest driver record is red" from the committed
    CORRECTNESS_r0{1,2,3}.json files; every such query with an oracle must
    be inside R4_WINDOW (this is the exact planning bug VERDICT r3 called
    out: the saved round-4 plan omitted the seven r1-ERR entries).
    """
    root = pathlib.Path(__file__).resolve().parent.parent
    latest: dict[str, dict] = {}
    for n in (1, 2, 3):
        path = root / f"CORRECTNESS_r0{n}.json"
        if path.exists():
            latest.update(json.loads(path.read_text()))
    oracles = entry_mod.oracle_sql()
    red = [
        name
        for name, rec in latest.items()
        if name in oracles
        and not (
            rec.get("rows_match") and rec.get("schema_match") and rec.get("hash_match")
        )
    ]
    outside = sorted(set(red) - set(EXPECTED_R4_WINDOW))
    assert not outside, f"stale-red oracle-able queries not in window: {outside}"


def test_r5_plan_covers_remaining_never_checked():
    """R4_WINDOW ∪ R5_PLANNED ∪ driver history must cover every oracled query."""
    root = pathlib.Path(__file__).resolve().parent.parent
    seen: set[str] = set()
    for n in (1, 2, 3):
        path = root / f"CORRECTNESS_r0{n}.json"
        if path.exists():
            seen.update(json.loads(path.read_text()))
    oracles = set(entry_mod.oracle_sql())
    covered = seen | set(EXPECTED_R4_WINDOW) | set(entry_mod.R5_PLANNED)
    uncovered = sorted(oracles - covered)
    assert not uncovered, f"oracled queries with no driver plan: {uncovered}"


def test_bench_headline_queries_registered():
    """Every bench row must resolve to a registered query — a rename that
    silently drops a row from the bench (it degrades gracefully by design)
    would otherwise go unnoticed until the driver's BENCH_r{N} shrinks."""
    import bench

    qs = entry_mod.queries()
    missing = [n for n in bench.HEADLINE if n not in qs]
    assert not missing, f"bench rows not registered: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))
