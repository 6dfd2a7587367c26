"""Every declared oracle-checked query must match DuckDB exactly at sf0.001.

This is the same check the driver runs at sf0.01 (tools/verify_local.py is
the shared implementation) — running it at the smallest sf keeps the suite
fast while catching dialect drift per-operator.
"""

from __future__ import annotations

import pytest

from verify_local import canon_duck, canon_spark

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name, spark, duck):
    sc, sr, st = canon_spark(QUERIES[name](spark, SF_DIR), with_types=True)
    oc, orr, ot = canon_duck(duck, ORACLES[name], with_types=True)
    assert sc == oc, f"columns: spark={sc} oracle={oc}"
    drift = {
        c: (st.get(c), ot.get(c))
        for c in sc
        if st.get(c) != ot.get(c) and "all-null" not in (st.get(c), ot.get(c))
    }
    assert not drift, f"value-object type drift (spark vs oracle): {drift}"
    assert len(sr) == len(orr), f"rowcount: spark={len(sr)} oracle={len(orr)}"
    mismatches = [i for i, (a, b) in enumerate(zip(sr, orr)) if a != b]
    assert not mismatches, f"{len(mismatches)} rows differ; first: {sr[mismatches[0]]} vs {orr[mismatches[0]]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_runs(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0  # runs without error, stable schema
    assert df.columns


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
