"""Round-7 regression tests: the VERDICT/ADVICE r6 fixes.

1. The bigram-LM broadcast gate (plan shape pinned in test_plans.py; here
   the value-parity side for Kneser-Ney).
2. ml_kmeans_quality's SSE terms must survive int64-overflow magnitudes
   (computed in DECIMAL(38,0) / HUGEINT, never a bare BIGINT product).
3. llm_tokenizer_fertility's tokenizer class must compile to the same
   character set in Java regex (Spark) and RE2 (DuckDB) — \\x0B was in
   Java's \\s but not RE2's.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from etl_suite_spark.registry import QUERIES
from tests.conftest import SF_DIR

_FERTILITY_CLASS = "[a-z0-9]+|[^a-z0-9 \t\n\r\x0b\f]"


def test_fertility_tokenizer_agrees_on_vertical_tab(spark):
    """A document containing \\x0B must tokenize identically on both
    engines. Under the old '\\s' spelling Java treated \\x0B as
    whitespace (punctuation class excluded it) while RE2 did not (the
    class matched it as a token) — one token of drift per vertical tab."""
    probe = "ab\x0bcd ef\tgh \x0b\x0b ij!"
    n_spark = (
        spark.range(1)
        .select(F.regexp_count(F.lit(probe), F.lit(_FERTILITY_CLASS)).alias("n"))
        .collect()[0][0]
    )
    n_duck = duckdb.sql(
        "SELECT len(regexp_extract_all(?, '[a-z0-9]+|[^a-z0-9 \t\n\r\x0B\f]'))",
        params=[probe],
    ).fetchone()[0]
    assert n_spark == n_duck
    # the explicit class treats \x0B as whitespace on BOTH engines:
    # tokens are ab cd ef gh ij ! -> 6
    assert n_spark == 6


def test_kmeans_quality_term_survives_int64_overflow(spark):
    """ADVICE r6: n*sqq - sq*sq wraps int64 near sf≈1 if computed in
    BIGINT. Reproduce the exact term expression the query uses on
    magnitudes past the int64 ceiling and check it against Python's
    arbitrary-precision integers."""
    n, sq, sqq = 2_000_000, 1_500_000_000_000, 1_200_000_000_000_000_000
    # n * sqq = 2.4e24 — far past the 9.2e18 int64 ceiling
    expected = n * sqq - sq * sq
    row = (
        spark.range(1)
        .select(
            (
                F.lit(n).cast("decimal(38,0)") * F.lit(sqq).cast("decimal(38,0)")
                - F.lit(sq).cast("decimal(38,0)") * F.lit(sq).cast("decimal(38,0)")
            )
            .cast("decimal(38,0)")
            .alias("term")
        )
        .collect()[0]
    )
    assert int(row.term) == expected
    # and DuckDB's HUGEINT form (the oracle's) agrees
    got = duckdb.sql(
        f"SELECT CAST(CAST({n} AS HUGEINT) * CAST({sqq} AS HUGEINT)"
        f" - CAST({sq} AS HUGEINT) * CAST({sq} AS HUGEINT) AS DECIMAL(38,0))"
    ).fetchone()[0]
    assert int(got) == expected


def test_kneser_ney_gated_plan_is_still_correct(spark):
    """Value parity across the broadcast gate for the KN scorer: the
    no-hint (over-threshold) plan must produce byte-identical rows to
    the broadcast plan — the gate changes join strategy only."""
    from etl_suite_spark.llm import textstats

    q = QUERIES["llm_ngram_kneser_ney"]
    base = sorted(map(tuple, q(spark, SF_DIR).collect()))
    orig = textstats._LM_BROADCAST_GATE_BYTES
    try:
        textstats._LM_BROADCAST_GATE_BYTES = 0
        gated = sorted(map(tuple, q(spark, SF_DIR).collect()))
    finally:
        textstats._LM_BROADCAST_GATE_BYTES = orig
    assert gated == base
    assert len(base) > 0


def test_lm_gate_reads_bytes_without_an_aggregation_job(spark):
    """The gate must not launch an aggregation job at plan-construction
    time (ADVICE r6: the former c12.count() ran explode+groupBy+count on
    every plan build). Parquet footer/schema reads do submit trivial
    single-task jobs — those are inherent to spark.read.parquet — so the
    invariant is: every job submitted while BUILDING the plan is a
    1-task read, never a multi-task aggregation (the old count() ran
    shuffle_partitions-wide)."""
    tracker = spark.sparkContext.statusTracker()
    before = set(tracker.getJobIdsForGroup(None))
    _ = QUERIES["llm_ngram_kneser_ney"](spark, SF_DIR)  # plan only
    new_jobs = set(tracker.getJobIdsForGroup(None)) - before
    for jid in new_jobs:
        info = tracker.getJobInfo(jid)
        tasks = sum(
            tracker.getStageInfo(s).numTasks
            for s in info.stageIds
            if tracker.getStageInfo(s) is not None
        )
        assert tasks <= 1, f"plan build ran a {tasks}-task job (id {jid})"
