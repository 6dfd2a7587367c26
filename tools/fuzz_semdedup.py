"""Deep differential fuzz of the SemDeDup Spark↔DuckDB bridge.

The round-12 pytest gate (tests/test_round12.py::
test_semdedup_differential_random_corpus) runs ONE seeded random corpus
through all three semdedup queries against their DuckDB oracles via the
SHARED helpers below — one implementation, so this tool and the pytest
cannot drift to testing different contracts (the fuzz_differential
discipline, code-review r11). This is the LONG form: N seeded corpora
sweeping the shapes that could break cross-engine bit-parity — mixed
magnitudes (1e-3..10), negative components, zero vectors excluded by
construction AND — since round 13 (ADVICE r12 item 1) — rejected loudly
by the operator itself in both engines, planted exact and
near-duplicate pairs, and clustered corpora where many vectors share a
direction (dup-cluster cell pileups).

What parity rests on (and what a divergence would mean): the cells fold
exact int64 projections of the shared 6dp quantization; the tau
comparison is a RAW IEEE double built from an exact integer dot — JVM,
numpy (the GEMM kernel), and DuckDB must produce bit-identical values.
A divergent cell id implicates the projection bridge; a divergent drop
set implicates the GEMM kernel vs the SQL pair join; a divergent sweep
row implicates the max/threshold layer.

Usage::

    python tools/fuzz_semdedup.py [--iters 20] [--rows 300] [--seed 7]

Exits nonzero on the first divergence, printing the query id, seed, and
the differing canonical rows.
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

SEMDEDUP_QUERIES = (
    "llm_semdedup",
    "llm_semdedup_recall",
    "llm_semdedup_sweep",
    # round 13: the multi-band operating point and the composed
    # exact-collapse -> semantic-prune pipeline — all deterministic,
    # so the same full-hash differential applies
    "llm_semdedup_bands",
    "llm_semdedup_bands_recall",
    "llm_corpus_prune_pipeline",
    "llm_corpus_prune_pipeline_audit",
    # round 13 (late): the D4 prototypicality family — exact int64
    # centroid-sum cosines, deterministic in both engines
    "llm_semdedup_prototypes",
    "llm_corpus_prune_d4",
    # round 14: the incremental cross-set screen — same deterministic
    # cells, rectangular batch x standing GEMM kernel; the random
    # corpora's % 10 batch split exercises planted dups on both sides
    # of it (a planted pair fully inside the batch must NOT drop)
    "llm_semdedup_crossset",
    "llm_semdedup_crossset_recall",
)

# Band counts swept by compare_band_counts (VERDICT r12 item 6): the
# registered two- and four-band points plus the odd one between.
BAND_COUNTS = (2, 3, 4)


def build_random_corpus(path: str, seed: int, n_rows: int = 300) -> None:
    """Seeded random embeddings parquet at ``path`` (a directory):
    mixed magnitudes, negatives, one planted exact-dup pair, one planted
    near-dup pair, and (odd seeds) a 10-vector shared-direction cluster
    — the dup-cluster cell-pileup shape."""
    import pandas as pd

    rng = random.Random(seed)
    rows = []
    for vid in range(n_rows):
        scale = rng.choice([0.001, 0.1, 1.0, 10.0])
        rows.append(
            {
                "vec_id": vid,
                "embedding": [
                    round(rng.uniform(-scale, scale), 6) for _ in range(64)
                ],
                "label": vid % 7,
            }
        )
    src = rng.randrange(0, n_rows - 20)
    rows[n_rows - 2]["embedding"] = list(rows[src]["embedding"])
    rows[n_rows - 1]["embedding"] = [
        x + 1e-6 for x in rows[src]["embedding"]
    ]
    if seed % 2 == 1:
        base = rows[src]["embedding"]
        for k in range(10):
            vid = n_rows - 12 - k
            rows[vid]["embedding"] = [
                round(x * (1 + 0.001 * (k + 1)), 6) for x in base
            ]
    os.makedirs(path, exist_ok=True)
    pd.DataFrame(rows).to_parquet(f"{path}/embeddings.parquet", index=False)


def compare_semdedup(spark, sf_dir: str) -> None:
    """Run all three semdedup queries on ``sf_dir`` in Spark AND their
    registered DuckDB oracles, asserting identical canonical frames.
    Shared by tests/test_round12.py and this tool — one contract."""
    import duckdb

    from etl_suite_spark.registry import ORACLES, QUERIES
    from tools.verify_local import canon_duck, canon_spark

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        for name in SEMDEDUP_QUERIES:
            sc, sr = canon_spark(QUERIES[name](spark, sf_dir))
            oc, orows = canon_duck(con, ORACLES[name])
            assert sc == oc, f"{name}: column drift {sc} vs {oc}"
            assert sr == orows, (
                f"{name}: value drift\n spark[:3]={sr[:3]}\n duck[:3]={orows[:3]}"
            )
    finally:
        con.close()


def compare_band_counts(spark, sf_dir: str) -> None:
    """Differential + monotonicity sweep over band counts: for each
    b in BAND_COUNTS, the Spark banded drop set must equal the DuckDB
    drop set generated from the SAME SQL builders the registered
    oracles use, and the drop set must grow as a SUPERSET with band
    count (each band's candidate pairs are a fixed projection block —
    adding bands only adds candidates).  Shared by the round-13 pytest
    gate and this tool — one contract."""
    import duckdb

    from etl_suite_spark.llm.similarity import (
        _semdedup_cells_sql,
        _semdedup_corpus_banded,
        _semdedup_dropped,
        _semdedup_dropped_sql,
    )

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{sf_dir}/embeddings.parquet')"
        )
        # ONE corpus at the max band count serves every sweep point:
        # band i's cell column is a fixed projection block (j = i*bits
        # ..), identical at every band count, so smaller counts are
        # column-prefix views (code-review r13: the per-count rebuild
        # re-ran 2+3+4 bands of projection folds + three checkpoints)
        corpus = _semdedup_corpus_banded(
            spark, sf_dir, bands=max(BAND_COUNTS)
        )
        all_cols = tuple(f"cell_{i}" for i in range(max(BAND_COUNTS)))
        prev: set | None = None
        for bands in BAND_COUNTS:
            cols = all_cols[:bands]
            spark_drop = {
                r["vec_id"]
                for r in _semdedup_dropped(corpus, cell_cols=cols).collect()
            }
            duck_drop = {
                r[0]
                for r in con.execute(
                    f"WITH cells AS ({_semdedup_cells_sql(all_cols)}) "
                    + _semdedup_dropped_sql(cols)
                ).fetchall()
            }
            assert spark_drop == duck_drop, (
                f"bands={bands}: drop-set drift "
                f"spark-only={sorted(spark_drop - duck_drop)[:5]} "
                f"duck-only={sorted(duck_drop - spark_drop)[:5]}"
            )
            if prev is not None:
                assert spark_drop >= prev, (
                    f"bands={bands}: drop set not a superset of "
                    f"bands={bands - 1}: lost {sorted(prev - spark_drop)[:5]}"
                )
            prev = spark_drop
    finally:
        con.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--rows", type=int, default=300)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from etl_suite_spark.session import get_spark

    spark = get_spark("fuzz-semdedup")
    root = tempfile.mkdtemp(prefix="fuzz_semdedup_")
    try:
        for i in range(args.iters):
            seed = args.seed + i
            d = os.path.join(root, f"corpus_{seed}")
            build_random_corpus(d, seed, args.rows)
            try:
                compare_semdedup(spark, d)
                compare_band_counts(spark, d)
            except AssertionError as e:
                print(f"DIVERGENCE at seed {seed}: {e}")
                raise SystemExit(1)
            print(
                f"seed {seed}: {len(SEMDEDUP_QUERIES)} queries + "
                f"{len(BAND_COUNTS)} band counts parity-green"
            )
            shutil.rmtree(d, ignore_errors=True)
        print(
            f"== fuzz-semdedup: {args.iters} corpora x {len(SEMDEDUP_QUERIES)} "
            f"queries (+band sweep {BAND_COUNTS}), 0 divergences =="
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
