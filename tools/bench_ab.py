"""Same-session A/B of the scheduler-normalized bench metric.

VERDICT r8 "What's wrong" #3: `subtotal_per_sched` rose 2.35 → 2.69
(r7→r8) while the raw subtotal FELL 15.6 → 14.5 s — if the normalized
metric can drift ~14% with no code change, per-sched trends are machine
noise, not signal. This tool answers that with data: ONE Spark session,
TWO complete interleaved passes of the exact bench protocol over the
r1-comparable 20-query set (sched calibration re-measured per pass,
immediately before its query pass). If pass-to-pass drift within one
session is a small fraction of the cross-round drift, the r7→r8 movement
is attributable to the VM window (dispatch-rate mix), not to code.

Usage: python tools/bench_ab.py   # prints one JSON line
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from etl_suite_spark.registry import QUERIES  # noqa: E402
from etl_suite_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("etl-bench-ab")
    spark.sparkContext.setLogLevel("ERROR")
    names = [n for n in bench.HEADLINE[: bench.R1_BASELINE_ROWS] if n in QUERIES]

    bench._checksum(QUERIES[names[0]](spark, sf_dir))  # warmup

    passes = []
    for p in range(2):
        # the EXACT bench protocol, via bench.py's own shared helpers
        sched, _sched_runs = bench.measure_sched(spark)
        runs = bench.time_queries(spark, names, sf_dir, repeats=3)
        timings = {n: round(statistics.median(r), 3) for n, r in runs.items()}
        subtotal = round(sum(timings.values()), 3)
        passes.append(
            {
                "pass": p,
                "sched_1k_tasks_sec": sched,
                "subtotal_r1_20q": subtotal,
                "subtotal_per_sched": round(subtotal / sched, 2),
            }
        )
    a, b = passes
    drift = (
        round(
            abs(b["subtotal_per_sched"] - a["subtotal_per_sched"])
            / a["subtotal_per_sched"]
            * 100,
            2,
        )
        if a["subtotal_per_sched"]
        else None
    )
    print(
        json.dumps(
            {
                "metric": "bench_ab_per_sched_drift",
                "sf_dir": sf_dir,
                "passes": passes,
                "within_session_drift_pct": drift,
                "r7_to_r8_drift_pct": 14.47,  # 2.35 -> 2.69, the question
            }
        )
    )


if __name__ == "__main__":
    main()
