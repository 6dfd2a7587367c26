"""Capture ``explain("formatted")`` for bench headline queries into
``plans/r15/<query>_<tag>.txt`` — the optimization round's before/after
plan evidence (OPTIMIZATION_r15.md cites these files; r14's captures
stay under plans/r14/).

Usage: python tools/capture_plans.py --tag before [--only q1,q2] [--sf DIR]

stream_* rows are skipped (plan construction executes streaming jobs;
same exclusion as tools/plan_audit.py).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import etl_suite_spark  # noqa: E402,F401
from etl_suite_spark.registry import QUERIES  # noqa: E402
from etl_suite_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--tag", required=True, help="file suffix: before/after")
    ap.add_argument("--only", default=None, help="comma-separated query ids")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import bench

    out_dir = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
    )
    os.makedirs(out_dir, exist_ok=True)

    names = (
        [n.strip() for n in args.only.split(",")]
        if args.only
        else [n for n in bench.HEADLINE if n in QUERIES]
    )

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")

    for name in names:
        path = os.path.join(out_dir, f"{name}_{args.tag}.txt")
        if name.startswith("stream_"):
            with open(path, "w") as f:
                f.write(
                    f"# {name}: streaming op — plan construction executes "
                    "checkpointed streaming jobs; excluded from formatted-plan "
                    "capture (same exclusion as tools/plan_audit.py SKIP set).\n"
                )
            print(f"skip  {name} (streaming)")
            continue
        try:
            df = QUERIES[name](spark, args.sf)
            # public capture route (ADVICE r14 item 4: the old
            # PythonSQLUtils/_jdf reach-in is not a stable API):
            # DataFrame.explain prints from the Python side, so
            # redirecting stdout captures it without private internals.
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # pragma: no cover
            plan = f"# PLAN ERROR {type(e).__name__}: {e}\n"
        with open(path, "w") as f:
            f.write(f"# {name} @ {args.sf} — explain('formatted'), tag={args.tag}\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
