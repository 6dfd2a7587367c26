"""10× scale smoke — the reproducible version of the round-4 scale check.

Builds a corpus ~10× the bench fixture in a temp dir (10 perturbed copies
of sf0.1 documents/embeddings; other tables copied as-is), runs the ops
whose scaling behavior matters most, and prints one JSON line of wall
seconds. This is how the two single-file parallelism traps were found
(PQ checkpoint width, cosine candidate width — BASELINE.md r4 addenda 3-4):
the bench fixture is too small to surface them, so this harness exists to
keep them surfaced.

Usage: python tools/scale_smoke.py [--base /root/testdata/sf0.1] [--copies 10]

Note: llm_dedup_substring is EXCLUDED by default — 10 near-identical
copies of every document is its adversarial input (every pair shares every
span; legitimately ~100× the work, measured 189 s) and the op's documented
100 TB route is via LSH candidate pairs. Include it with --all.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OPS = [
    "llm_dedup_exact",
    "llm_dedup_paragraph",
    "llm_quality_c4",
    "llm_dedup_minhash",
    "llm_sim_cosine_topk",
    "llm_sim_ann_pq",
    "llm_sim_ann_ivfpq",
    "llm_bigram_logprob",
    "ts_gapfill_locf",
    "dim_scd2_lookup",
    "graph_pagerank",
    "win_topk_per_group",
    "llm_decontaminate",
]


def build(base: str, copies: int, out: str) -> None:
    import duckdb

    os.makedirs(out, exist_ok=True)
    for t in [
        "region", "nation", "customer", "supplier",
        "part", "orders", "lineitem", "events",
    ]:
        shutil.copy(f"{base}/{t}.parquet", f"{out}/{t}.parquet")
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
          SELECT doc_id + 100000 * c AS doc_id,
                 CASE WHEN (doc_id + c) % 10 < 3 AND c > 0
                      THEN text || ' copytok' || c ELSE text END AS text,
                 lang, source,
                 CASE WHEN (doc_id + c) % 10 < 3 AND c > 0
                      THEN n_chars + 9 ELSE n_chars END AS n_chars
          FROM read_parquet('{base}/documents.parquet'),
               unnest(range(0, {copies})) AS u(c)
        ) TO '{out}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT vec_id + 100000 * c AS vec_id, embedding, label
          FROM read_parquet('{base}/embeddings.parquet'),
               unnest(range(0, {copies})) AS u(c)
        ) TO '{out}/embeddings.parquet' (FORMAT PARQUET)
        """
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--all", action="store_true", help="include llm_dedup_substring")
    args = ap.parse_args()

    import etl_suite_spark  # noqa: F401
    from etl_suite_spark.registry import QUERIES
    from etl_suite_spark.session import get_spark

    out = os.path.join(tempfile.mkdtemp(prefix="etl_scale_"), "sfx")
    build(args.base, args.copies, out)

    spark = get_spark("etl-scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    ops = OPS + (["llm_dedup_substring"] if args.all else [])
    QUERIES[ops[0]](spark, out).count()  # warmup

    timings = {}
    for name in ops:
        t0 = time.perf_counter()
        n = QUERIES[name](spark, out).count()
        timings[name] = {"sec": round(time.perf_counter() - t0, 3), "rows": n}
    print(
        json.dumps(
            {
                "metric": "scale_smoke_wall_sec",
                "copies": args.copies,
                "base": args.base,
                "value": round(sum(v["sec"] for v in timings.values()), 3),
                "queries": timings,
            }
        )
    )
    shutil.rmtree(os.path.dirname(out), ignore_errors=True)


if __name__ == "__main__":
    main()
