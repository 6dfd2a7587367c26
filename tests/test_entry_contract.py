"""Pin the driver-facing query window.

The external correctness harness checks the FIRST 50 entries of
``queries()`` each round.  The window is load-bearing: accidental
reordering (a new module import, a renamed query) would silently rotate
driver evidence away from the families this round is meant to prove.
This test pins the exact first-50 list and basic contract invariants.
"""

from __future__ import annotations

import __spark_entry__ as entry_mod

EXPECTED_R3_WINDOW = [
    "win_sessionize",
    "llm_seq_packing",
    "llm_quality_gopher",
    "llm_data_mixture",
    "scan_parquet",
    "scan_projected",
    "scan_csv_roundtrip",
    "scan_json_roundtrip",
    "sink_parquet_partitioned",
    "scan_orc_roundtrip",
    "scan_jdbc",
    "scan_csv_badrecords",
    "scan_parquet_schema_evolution",
    "scan_text_roundtrip",
    "sink_sorted_layout",
    "join_dpp_partition_pruned",
    "sink_compact_small_files",
    "project_compute",
    "project_alias_cast",
    "project_case_when",
    "filter_pred",
    "filter_between_dates",
    "filter_null_handling",
    "filter_like_regex",
    "dedup_distinct",
    "dedup_by_key_latest",
    "sample_fraction",
    "filter_null_safe_eq",
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup",
    "stream_stateful_custom",
    "stream_foreachbatch_upsert",
    "stream_late_data",
    "stream_static_join",
    "stream_stream_join",
    "udf_python_scalar",
    "udf_pandas_scalar",
    "udaf_pandas_grouped_agg",
    "udtf_grouped_map",
    "udtf_python",
    "inc_batch_watermark",
    "inc_cdc_apply",
    "dim_scd2_build",
    "inc_backfill_window",
    "inc_state_merge_stats",
    "pipeline_spec_run",
    "pipeline_sink_jdbc",
    "pipeline_spec_stream",
]


def test_window_is_exactly_50():
    assert len(EXPECTED_R3_WINDOW) == 50
    assert len(set(EXPECTED_R3_WINDOW)) == 50


def test_first_50_match_pinned_window():
    qs = list(entry_mod.queries())
    assert qs[:50] == EXPECTED_R3_WINDOW
    assert entry_mod.R3_WINDOW == EXPECTED_R3_WINDOW


def test_every_window_query_is_registered():
    qs = entry_mod.queries()
    missing = [n for n in EXPECTED_R3_WINDOW if n not in qs]
    assert not missing, f"window names not registered: {missing}"


def test_oracle_keys_subset_of_queries():
    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    extra = set(oracles) - set(qs)
    assert not extra, f"oracles without queries: {extra}"
