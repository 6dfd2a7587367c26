"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementations live in :mod:`etl_suite_spark`; importing it populates
the registry (etl_suite_spark/registry.py) from every operator module.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import etl_suite_spark  # noqa: F401  (registration side effects)
from etl_suite_spark.registry import ORACLES, QUERIES

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return QUERIES["agg_group_basic"](spark, _SMOKE_SF_DIR)


# The driver's correctness harness checks the FIRST 50 entries of queries()
# each round; this explicit window rotates driver evidence across rounds
# (r1: scalars+llm, r2: sorts/setops/joins/windows/aggregates, r3:
# scans/filters/streaming/udf/incremental/pipeline — see
# CORRECTNESS_r01/r02/r03.json).  Round-4 window, per VERDICT.md r3 §"Next
# round" item 1: FIRST the 12 queries whose latest driver record is
# ERR/no-oracle but which now pass the DuckDB oracle locally (7 broken by
# the r1 events.ts loader bug and fixed in r2; 5 that ran before their
# oracles were added), then llm_lang_partition (the only SURVEY §2 row with
# zero driver evidence ever), then 37 never-driver-checked queries:
# the full TPC-H tail q2..q22, graph_pagerank, the analytics family, the r3
# recall/honesty ops, and the high-value llm text ops.
# tests/test_entry_contract.py pins this list so an accidental edit can't
# silently shift the window.
R4_WINDOW = [
    # stale-red re-checks: r1 events.ts loader ERRs, fixed in r2 (7)
    "fn_string",
    "fn_date",
    "fn_map",
    "fn_json",
    "fn_datetime_tz",
    "fn_variant",
    "llm_emb_normalize",
    # stale-red re-checks: ran as no-oracle, oracles added r2/r3 (5)
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "llm_dedup_clusters",
    "llm_corpus_pipeline",
    "mm_binaryfile_scan",
    # only SURVEY §2 row never driver-windowed (1)
    "llm_lang_partition",
    # never-checked: TPC-H q2..q22 (21)
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
    # never-checked: graph + analytics (4)
    "graph_pagerank",
    "agg_funnel",
    "agg_retention_cohort",
    "agg_heavy_hitters",
    # never-checked: r3 honesty/recall + new ops (5)
    "llm_dedup_minhash_recall",
    "llm_sim_ann_ivf_recall",
    "llm_dedup_substring",
    "ml_churn_label",
    "win_cumulative_distinct",
    # never-checked: llm text/training-data ops (7)
    "llm_decontaminate",
    "llm_token_count",
    "llm_fingerprint",
    "llm_pii_scrub",
    "llm_bm25_search",
    "llm_doc_chunking",
    "llm_unigram_logprob",
]

# Round-5 rotation plan (VERDICT r3 item 4): after R4 executes, the
# remaining never-driver-checked queries are the list below (24 from the
# r3 era + every op added during round 4). The list has outgrown one
# 50-slot window, so R5_WINDOW = the FIRST 50 of this list (+ re-checks of
# anything left red after CORRECTNESS_r04), and the remainder plus the 8
# rows-only ops rotate into R6. Keeping the list here (and pinned in
# tests) so no registered query is left without a driver-evidence plan.
R5_PLANNED = [
    "agg_string_concat_group",
    "agg_sketch_rollup",
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
    # added in round 4 (never driver-checked yet):
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
    "join_asof_nearest",
    "agg_trend_corr",
    "llm_curriculum_order",
    "inc_late_dim_resolve",
    "ts_gapfill_interpolate",
    # rows-only (greedy MMR is sequential; pytest reference-checked):
    "llm_sim_mmr_rerank",
    "agg_cohort_ltv",
    "win_zscore_rolling",
    "scan_rowgroup_stats",
    "llm_corpus_stats",
    "agg_autocorr_lag1",
    "llm_ngram_novelty",
    "win_rank_change",
    "agg_new_vs_returning",
    "agg_interevent_gaps",
]


def _windowed(mapping: dict) -> dict:
    ordered = {k: mapping[k] for k in R4_WINDOW if k in mapping}
    ordered.update((k, v) for k, v in mapping.items() if k not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _windowed(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query id (rows-only ops omitted)."""
    return _windowed(dict(ORACLES))
