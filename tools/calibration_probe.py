"""Quick host-health probe: the bench's two calibration workloads only.

Prints one JSON line {"calibration_sec": C, "sched_1k_tasks_sec": S, "runs": ...}.
Clean window on this VM: calibration <= ~0.25 s, sched <= ~9 s (BASELINE.md).
"""
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from etl_suite_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark("calibration-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    # warmup
    spark.range(10_000_000).select(F.sum(F.xxhash64("id"))).collect()
    cal_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(150_000_000).select(F.sum(F.xxhash64("id")).alias("h")).collect()
        cal_runs.append(round(time.perf_counter() - t0, 3))
    sched_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        spark.sparkContext.parallelize(range(1000), 1000).count()
        sched_runs.append(round(time.perf_counter() - t0, 3))
    print(json.dumps({
        "calibration_sec": round(statistics.median(cal_runs), 3),
        "sched_1k_tasks_sec": round(statistics.median(sched_runs), 3),
        "calibration_runs": cal_runs,
        "sched_runs": sched_runs,
    }))


if __name__ == "__main__":
    main()
