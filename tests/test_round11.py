"""Round-11 additions.

1. stream_restart_backlog_drain — per-run batch ledger: run 1 is the
   pre-outage slice alone, run 2 drains the 6-file backlog one
   micro-batch per file with no re-delivery of run 1's offsets
   (VERDICT r10 item 2).
2. Zero-subject discipline across the compliance pair (VERDICT r10
   item 6): a corpus where NO user is in the subject set must give the
   export its empty shape and the erasure its all-buckets-untouched
   audit, and both must still reclaim their temp warehouses.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from pyspark.sql import functions as F

from etl_suite_spark.registry import QUERIES
from tests.conftest import SF_DIR


def test_backlog_drain_ledger_and_warehouse(spark):
    """Run 1 processes only the pre-outage file; run 2 drains exactly
    len(backlog) micro-batches (throttled: one file per batch) whose
    rows sum to the backlog; the warehouse equals the full table."""
    from etl_suite_spark.io import load_table
    from etl_suite_spark.streaming import ops as so

    out = {
        r["event_type"]: r["n"]
        for r in QUERIES["stream_restart_backlog_drain"](spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    n_pre = ev.filter(F.col("ts") < so._CUTS[0]).count()
    n_total = ev.count()
    n_backlog = n_total - n_pre

    run1 = [(b, n) for run, b, n in so._BACKLOG_LEDGER if run == 1]
    run2 = [(b, n) for run, b, n in so._BACKLOG_LEDGER if run == 2]
    assert sum(n for _, n in run1) == n_pre
    # throttled drain: exactly one micro-batch per backlog file, none
    # empty, no re-delivery of run 1's rows
    n_files = len(so._BACKLOG_CUTS) + 1
    assert len(run2) == n_files
    assert all(n > 0 for _, n in run2)
    assert sum(n for _, n in run2) == n_backlog
    # offsets continued from the checkpoint: batch ids strictly increase
    # across the restart (no batch id reuse, no gap backwards)
    ids = [b for b, _ in run1] + [b for b, _ in run2]
    assert ids == sorted(ids) and len(set(ids)) == len(ids)
    assert sum(out.values()) == n_total


@pytest.fixture(scope="module")
def zero_subject_sf(tmp_path_factory):
    """An events fixture where NO user_id is in the subject set
    (user_id % 97 == 0 rows removed)."""
    d = tmp_path_factory.mktemp("zero_subject_sf")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (SELECT * FROM read_parquet('{SF_DIR}/events.parquet')
              WHERE user_id % 97 <> 0)
        TO '{d}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(d)


def test_subject_export_zero_subject_corpus(spark, zero_subject_sf):
    """Zero subjects → empty export with the contract schema, zero files
    scanned, and the temp warehouse reclaimed (ADVICE r9 regression,
    made explicit per VERDICT r10 item 6)."""
    from etl_suite_spark.plans import incremental as inc

    out = QUERIES["inc_subject_export"](spark, zero_subject_sf)
    assert out.columns == [
        "user_id",
        "n_events",
        "n_event_types",
        "first_ts",
        "last_ts",
        "total_value",
    ]
    assert out.count() == 0
    wh, scanned = inc._LAST_EXPORT_WH
    assert scanned == []  # nothing listed, let alone read
    assert not os.path.exists(os.path.dirname(wh))  # warehouse reclaimed


def test_subject_erasure_zero_subject_corpus(spark, zero_subject_sf):
    """Zero subjects → every bucket audits rows_deleted=0, rewritten=
    False, rows_after == rows_before (the zero-AFFECTED-bucket path:
    the dynamic overwrite must touch nothing and no partition may be
    dropped), and the warehouse is reclaimed."""
    from etl_suite_spark.plans import incremental as inc

    rows = QUERIES["inc_subject_erasure"](spark, zero_subject_sf).collect()
    n_buckets = (
        duckdb.sql(
            f"SELECT COUNT(DISTINCT user_id % 16) FROM "
            f"read_parquet('{zero_subject_sf}/events.parquet')"
        ).fetchone()[0]
    )
    assert len(rows) == n_buckets  # every occupied bucket in the audit
    for r in rows:
        assert r["rows_deleted"] == 0
        assert r["rewritten"] is False
        assert r["rows_after"] == r["rows_before"] > 0
    wh = inc._LAST_ERASURE_WH[0]
    assert not os.path.exists(os.path.dirname(wh))  # warehouse reclaimed
