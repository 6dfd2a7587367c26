"""Local replica of the driver's DuckDB-oracle correctness check.

Runs every registered query at a given sf_dir on Spark AND its oracle SQL on
DuckDB, then compares row count, column names, and values *exactly* (after
canonicalization). Exact equality here implies any order-insensitive value
hash matches. Usage:

    python tools/verify_local.py [--sf /root/testdata/sf0.01] [--only q1,q2]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_suite_spark.io import TABLES  # noqa: E402
from etl_suite_spark.session import get_spark  # noqa: E402


def canon_cell(v):
    import datetime

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NULL"
    try:
        if pd.isna(v) and not isinstance(v, (list, tuple, np.ndarray, dict)):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        # ADVICE r10 item 2: integer-valued floats render as plain ints so
        # pandas NULL-coercion (toPandas turns nullable BIGINT with NULLs
        # into float64: 5 → 5.0 → '5.0') canonicalizes the same as the raw
        # DuckDB int '5'.  Monotone: only numerically-equal-integer pairs
        # change, and both sides change identically.  2**53 bound keeps
        # the int() round-trip exact.
        if f.is_integer() and abs(f) < 2**53:
            return repr(int(f))
        return repr(f)
    if isinstance(v, (np.integer, int)) and not isinstance(v, bool):
        return repr(int(v))
    if isinstance(v, (np.bool_, bool)):
        return repr(bool(v))
    if isinstance(v, pd.Timestamp):
        if v.tzinfo is not None:
            v = v.tz_convert("UTC").tz_localize(None)
        return v.isoformat()
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{canon_cell(x)}" for k, x in sorted(v.items())) + "}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    import decimal

    if isinstance(v, decimal.Decimal):
        # Mirror of the integral-float rule above: Decimal('5.0') must
        # render like float 5.0 and int 5 ('5'), else the float fix would
        # break today's float-vs-DECIMAL '5.0'=='5.0' matches.
        if v.is_finite() and v == v.to_integral_value():
            return repr(int(v))
        return str(v)
    return str(v)


def _type_class(v):
    """Equivalence class of a result cell's Python object type.

    The driver hashes value objects, not strings — a DuckDB Decimal('5')
    (HUGEINT via Arrow) vs Spark int 5 is a hash mismatch even though both
    canonicalize to '5'.  Grouping into coarse classes (int-like, float-like,
    ...) makes that drift visible locally.
    """
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None:
        return None
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return None if math.isnan(float(v)) else "float"
    if isinstance(v, decimal.Decimal):
        return "decimal"
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return "datetime"
    if isinstance(v, datetime.date):
        return "date"
    if isinstance(v, (list, tuple, np.ndarray)):
        return "list"
    if isinstance(v, dict):
        return "dict"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    return type(v).__name__


def type_sig(cols, raw_rows):
    """Per-column type class from the first non-null cell (column order must
    already be the sorted-cols order used by canon_*)."""
    sig = {}
    for i, c in enumerate(sorted(cols)):
        for row in raw_rows:
            tc = _type_class(row[i])
            if tc is not None:
                sig[c] = tc
                break
        else:
            sig[c] = "all-null"
    return sig


def canon_frame(pdf):
    cols = sorted(pdf.columns)
    rows = [tuple(canon_cell(v) for v in row) for row in pdf[cols].itertuples(index=False, name=None)]
    rows.sort()
    return cols, rows


def canon_spark(df, with_types=False):
    """Canonicalize straight from collect() — no pandas smoothing, so type
    asymmetries (DATE vs TIMESTAMP) surface exactly as the driver sees them."""
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    raw = [tuple(r[i] for i in order) for r in df.collect()]
    rows = sorted(tuple(canon_cell(v) for v in row) for row in raw)
    if with_types:
        return sorted(cols), rows, type_sig(cols, raw)
    return sorted(cols), rows


def canon_duck(con, sql, with_types=False):
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    raw = [tuple(r[i] for i in order) for r in cur.fetchall()]
    rows = sorted(tuple(canon_cell(v) for v in row) for row in raw)
    if with_types:
        return sorted(cols), rows, type_sig(cols, raw)
    return sorted(cols), rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("VERIFY_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--only", default=None, help="comma-separated query ids")
    ap.add_argument("--show-diff", type=int, default=5)
    args = ap.parse_args()

    import __spark_entry__ as mod

    # driver-shape gate (VERDICT r9 item 2) — checked here too because
    # plan_audit SKIPs stream_* queries (plan construction executes jobs)
    # while this tool runs them; the gate must cover every registered query.
    from tools.plan_audit import shape_violations

    qs, oracles = mod.queries(), mod.oracle_sql()
    names = list(qs) if not args.only else [n.strip() for n in args.only.split(",")]

    spark = get_spark("verify-local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf}/{t}.parquet')"
        )

    passed, failed, rows_only = [], [], []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf)
            bad_cols = shape_violations(name, sdf.schema)
            if bad_cols:
                failed.append((name, f"NON-ATOMIC OUTPUT (driver-shape gate): {bad_cols}"))
                print(f"FAIL {name}: non-atomic output columns {bad_cols}")
                continue
            sc, sr, st = canon_spark(sdf, with_types=True)
        except Exception as e:
            failed.append((name, f"SPARK ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            rows_only.append((name, len(sr)))
            print(f"rows-only {name}: {len(sr)} rows  ({time.time()-t0:.1f}s)")
            continue
        try:
            oc, orr, ot = canon_duck(con, oracles[name], with_types=True)
        except Exception as e:
            failed.append((name, f"DUCKDB ERROR: {type(e).__name__}: {e}"))
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        if sc != oc:
            failed.append((name, f"columns differ: spark={sc} oracle={oc}"))
            print(f"FAIL {name}: columns spark={sc} vs oracle={oc}")
            continue
        type_drift = {
            c: (st.get(c), ot.get(c))
            for c in sc
            if st.get(c) != ot.get(c)
            and "all-null" not in (st.get(c), ot.get(c))
        }
        if type_drift:
            failed.append((name, f"type drift (spark vs oracle): {type_drift}"))
            print(f"FAIL {name}: value-object type drift: {type_drift}")
            continue
        if len(sr) != len(orr):
            failed.append((name, f"rowcount spark={len(sr)} oracle={len(orr)}"))
            print(f"FAIL {name}: rowcount spark={len(sr)} vs oracle={len(orr)}")
            continue
        diffs = [(a, b) for a, b in zip(sr, orr) if a != b]
        if diffs:
            failed.append((name, f"{len(diffs)} differing rows"))
            print(f"FAIL {name}: {len(diffs)}/{len(sr)} rows differ; cols={sc}")
            for a, b in diffs[: args.show_diff]:
                print(f"  spark : {a}")
                print(f"  oracle: {b}")
        else:
            passed.append(name)
            print(f"PASS {name}: {len(sr)} rows  ({time.time()-t0:.1f}s)")

    print(
        f"\n== {len(passed)} passed, {len(failed)} failed, "
        f"{len(rows_only)} rows-only, of {len(names)} =="
    )
    if failed:
        print("failures:")
        for n, msg in failed:
            print(f"  {n}: {msg.splitlines()[0][:200]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
