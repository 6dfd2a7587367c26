"""Benchmark harness — the driver's per-round performance probe.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "headline_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1": sec, ...}, "sf": 0.1}

Headline set (SURVEY.md §6): the flagship group-agg, the 5-way join, the
per-group top-k window, and the LLM-data ops (dedup + similarity) — the
shapes that dominate a 100 TB run. Queries not yet registered are skipped so
the bench degrades gracefully mid-build.

Each query is timed over a full action (count of the result), after a JVM/
codegen warmup pass of the flagship query. Timings are end-to-end wall
seconds including Catalyst planning — the number that actually matters.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import etl_suite_spark  # noqa: F401  (registry side effects)
from etl_suite_spark.registry import QUERIES
from etl_suite_spark.session import get_spark

HEADLINE = [
    "agg_group_basic",
    "join_multiway",
    "win_topk_per_group",
    "dedup_by_key_latest",
    "agg_approx_count_distinct",
    "llm_dedup_exact",
    "llm_dedup_minhash",
    "llm_sim_cosine_topk",
    "llm_text_stats",
    "llm_doc_chunking",
    "win_sessionize",
    "llm_decontaminate",
    "llm_seq_packing",
    "tpch_q3",
    "tpch_q6",
    # appended after the round-1 baseline was recorded (BASELINE.md keeps
    # dated sections; earlier numbers are never overwritten):
    "join_range_bucketed",
    "inc_cdc_apply",
    "llm_unigram_logprob",
    "llm_sim_ann_lsh",
    "graph_pagerank",
    # appended in round 3 (VERDICT r2 #7): one stateful-streaming row so the
    # applyInPandasWithState path has a tracked perf number before scaling.
    "stream_stateful_custom",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else None

    spark = get_spark("etl-suite-bench")
    spark.sparkContext.setLogLevel("ERROR")

    names = [n for n in HEADLINE if n in QUERIES]

    # Warmup: JVM JIT + codegen + parquet footer caches.
    QUERIES[names[0]](spark, sf_dir).count()

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_wall_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
