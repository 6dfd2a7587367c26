"""Batch-incremental processing with durable watermarks (SURVEY.md §2.9,
§3.2(3)).

Reference analog: the ETL-suite scheduler's checkpoint documents — each job
stores the last-processed timestamp, extracts only ``[watermark, now)`` on
the next tick, and reloads idempotently (SURVEY §0.1 [K]). Re-expressed
Spark-first:

- the watermark is a tiny JSON state file next to the sink (on a cluster:
  object storage), read driver-side before planning;
- the extract injects ``ts > watermark`` *before* the scan, so Catalyst
  pushes it into the parquet reader and row-group min/max statistics skip
  everything already processed — the whole point at 100 TB;
- idempotency comes from delete-or-overwrite of the affected window plus
  the ``dedup_by_key_latest`` idiom, not from fragile exactly-once sinks.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..core import dsum, sql_dsum
from ..io import load_table
from ..registry import query


def read_watermark(state_path: str, default: str) -> str:
    """Read the saved watermark (ISO timestamp string) or ``default``."""
    if os.path.exists(state_path):
        with open(state_path) as f:
            return json.load(f)["watermark"]
    return default


def advance_watermark(state_path: str, new_watermark: str) -> None:
    """Persist the new watermark atomically (write-then-rename)."""
    tmp = state_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"watermark": new_watermark}, f)
    os.replace(tmp, state_path)


def incremental_extract(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    state_path: str,
    watermark_col: str = "ts",
    default: str = "1970-01-01 00:00:00",
) -> DataFrame:
    """Extract only rows newer than the saved watermark.

    The filter is attached directly above the scan so it reaches the
    parquet reader as a pushed predicate (verified in test_plans.py) —
    an incremental tick over a 100 TB event log reads only the new
    row groups.
    """
    wm = read_watermark(state_path, default)
    df = load_table(spark, sf_dir, table)
    return df.filter(F.col(watermark_col) > F.to_timestamp(F.lit(wm)))


def run_incremental_tick(
    spark: SparkSession,
    sf_dir: str,
    state_path: str,
    transform,
    watermark_col: str = "ts",
    default: str = "1970-01-01 00:00:00",
) -> DataFrame:
    """One scheduler tick: extract past the watermark, transform, advance.

    Returns the transformed frame; the caller sinks it. The watermark only
    advances to the max extracted timestamp AFTER the extract plan is
    built, mirroring the reference's read-checkpoint → process → persist
    cycle. Re-running a tick with no new data yields an empty frame and
    leaves the watermark unchanged.
    """
    inc = incremental_extract(
        spark, sf_dir, "events", state_path, watermark_col, default
    )
    hi = inc.agg(F.max(watermark_col).alias("hi")).collect()[0]["hi"]
    out = transform(inc)
    if hi is not None:
        advance_watermark(state_path, hi.strftime("%Y-%m-%d %H:%M:%S.%f"))
    return out


# The declared incremental query runs one tick from a FIXED initial
# watermark so the DuckDB oracle can replay the identical extract window.
_FIXED_WM = "2024-01-15 00:00:00"


@query(
    "inc_batch_watermark",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value', 4)} AS sum_value
    FROM events
    WHERE ts > TIMESTAMP '{_FIXED_WM}'
    GROUP BY day, event_type
    """,
)
def inc_batch_watermark(spark, sf_dir):
    """One incremental tick over events: extract ``ts > watermark``, roll
    up per (day, event_type), advance the watermark. The state file cycle
    (read → filter → advance) is exercised for real in a temp dir; the
    fixed initial watermark keeps the oracle replayable."""
    state = os.path.join(tempfile.mkdtemp(prefix="etl_wm_"), "state.json")
    advance_watermark(state, _FIXED_WM)

    def rollup(inc: DataFrame) -> DataFrame:
        return inc.groupBy(
            F.date_trunc("day", "ts").alias("day"), "event_type"
        ).agg(
            F.count("*").alias("n_events"),
            dsum("value", 4).alias("sum_value"),
        )

    out = run_incremental_tick(spark, sf_dir, state, rollup)
    # the tick advanced the durable watermark to max(ts) — a second tick
    # would extract nothing (asserted in tests).
    return out
