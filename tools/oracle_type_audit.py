"""Arrow-level type audit of every DuckDB oracle.

The driver hashes oracle results at the *value-object* level, so a DuckDB
column that surfaces through Arrow as decimal128(38,0) (DuckDB HUGEINT —
e.g. SUM over INTEGER) hashes differently from Spark's int64 even when the
values are numerically identical. The string-canonicalizing local verifier
cannot see that drift (round-2 `win_sessionize` driver-red was exactly this),
so this audit runs every oracle through DuckDB -> Arrow (LIMIT 0, schema
only) and flags decimal128 / decimal256 columns (HUGEINT / un-cast DECIMAL
arithmetic).  Value-object type-class drift between the two engines is
caught separately by verify_local's always-on ``with_types`` comparison
path — together the two checks cover both the schema- and value-level
versions of the round-2 ``win_sessionize`` driver-red bug.

Usage:
    python tools/oracle_type_audit.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys

import duckdb
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Arrow types DuckDB may emit that hash differently from the Spark twin even
# when values are numerically equal.
_FORBIDDEN = (pa.types.is_decimal,)


def duck_arrow_schema(con: "duckdb.DuckDBPyConnection", sql: str) -> pa.Schema:
    # LIMIT 0 wrapper keeps the audit cheap: types only, no data transfer.
    return con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema


def audit_oracle(con, sql: str) -> list[str]:
    """Return list of 'col: arrow_type' strings for forbidden-typed columns."""
    schema = duck_arrow_schema(con, sql)
    bad = []
    for field in schema:
        if any(pred(field.type) for pred in _FORBIDDEN):
            bad.append(f"{field.name}: {field.type}")
    return bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.001"))
    args = ap.parse_args()

    from etl_suite_spark.io import TABLES

    import __spark_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    oracles = mod.oracle_sql()
    flagged = {}
    for name, sql in sorted(oracles.items()):
        try:
            bad = audit_oracle(con, sql)
        except Exception as e:  # noqa: BLE001 - report, don't mask, per-oracle
            flagged[name] = [f"AUDIT ERROR: {type(e).__name__}: {e}"]
            continue
        if bad:
            flagged[name] = bad
    for name, bad in flagged.items():
        print(f"FLAG {name}: {', '.join(bad)}")
    print(f"== {len(flagged)} flagged of {len(oracles)} oracles ==")
    if flagged:
        sys.exit(1)


if __name__ == "__main__":
    main()
