"""Extended differential fuzz of the scalar dialect bridges.

The pytest sweep (tests/test_differential.py) runs 5 hypothesis examples
per suite pass — enough to keep the persisted falsifying examples honest,
cheap enough for the round-close gate. This tool is the LONG version of
the same oracle: N seeded random batches through every PAIRS expression
on Spark AND DuckDB, canon-compared cell-for-cell. This family of sweep
is what found the grapheme-vs-codepoint `reverse` divergence (VERDICT r9
item 3), so keeping a deep version runnable on demand is standing value.

Usage::

    python tools/fuzz_differential.py [--iters 200] [--rows 40] [--seed 11]

Exits nonzero on the first divergent cell, printing the offending
expression and input row.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import random
import sys
import time
import unicodedata

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests")
)
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)


def _rand_string(rng: random.Random, char_ok, max_len: int = 24) -> str:
    # Bias toward the nasty regions: ASCII, Latin-1, combining marks,
    # astral plane, tag characters, zero-width — the same shapes the
    # hypothesis sweep draws, just more of them.
    pools = [
        lambda: chr(rng.randint(32, 126)),
        lambda: chr(rng.randint(0xA0, 0x2FF)),
        lambda: chr(rng.randint(0x300, 0x36F)),  # combining marks
        lambda: chr(rng.randint(0x4E00, 0x4EFF)),  # CJK
        lambda: chr(rng.randint(0x1F300, 0x1F5FF)),  # astral emoji block
        lambda: chr(rng.choice((0x200B, 0x200D, 0xFE0F))),  # zero-width/VS
        lambda: chr(rng.randint(0xE0020, 0xE007E)),  # tag characters
    ]
    n = rng.randint(0, max_len)
    out = []
    for _ in range(n):
        ch = rng.choice(pools)()
        if unicodedata.category(ch) == "Cs":  # no lone surrogates
            continue
        if char_ok(ch):
            out.append(ch)
    return "".join(out)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--rows", type=int, default=40)
    ap.add_argument("--seed", type=int, default=11)
    args = ap.parse_args()

    import duckdb
    import pandas as pd

    from etl_suite_spark.session import get_spark
    from tests.test_differential import PAIRS, _char_ok
    from tools.verify_local import canon_cell

    spark = get_spark("fuzz-differential", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    duck = duckdb.connect()
    rng = random.Random(args.seed)

    spark_sel = ", ".join(f"{e} AS {n}" for n, e, _ in PAIRS)
    duck_sel = ", ".join(f"{e} AS {n}" for n, _, e in PAIRS)

    t0 = time.time()
    checked = 0
    for it in range(args.iters):
        rows = []
        for _ in range(rng.randint(1, args.rows)):
            rows.append(
                (
                    _rand_string(rng, _char_ok),
                    "".join(chr(rng.randint(32, 126)) for _ in range(rng.randint(0, 24))),
                    0.0
                    if (x := rng.uniform(-1e12, 1e12)) == 0
                    else round(x, rng.randint(0, 6)),
                    datetime.datetime(
                        rng.randint(1990, 2035),
                        rng.randint(1, 12),
                        rng.randint(1, 28),
                        rng.randint(0, 23),
                        rng.randint(0, 59),
                        rng.randint(0, 59),
                        rng.randint(0, 999) * 1000,
                    ),
                    rng.randint(-10_000, 10_000),
                )
            )
        pdf = pd.DataFrame(rows, columns=["s", "sa", "x", "ts", "k"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        pdf["j"] = pdf["k"].map(lambda v: f'{{"k": {v}}}')
        pdf = pdf.drop(columns=["k"])
        sdf = spark.createDataFrame(pdf)
        sdf.createOrReplaceTempView("_fuzz_t")
        duck.register("_fuzz_t_duck", pdf)
        s_rows = spark.sql(f"SELECT {spark_sel} FROM _fuzz_t").collect()
        d_rows = duck.execute(f"SELECT {duck_sel} FROM _fuzz_t_duck").fetchall()
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            for (name, se, de), sv, dv in zip(PAIRS, sr, dr):
                if canon_cell(sv) != canon_cell(dv):
                    print(
                        json.dumps(
                            {
                                "divergence": name,
                                "spark_expr": se,
                                "duck_expr": de,
                                "spark_value": repr(sv),
                                "duck_value": repr(dv),
                                "input_row": repr(rows[i]),
                                "iter": it,
                                "seed": args.seed,
                            }
                        )
                    )
                    sys.exit(1)
                checked += 1
        duck.unregister("_fuzz_t_duck")
        if (it + 1) % 25 == 0:
            print(f"iter {it + 1}/{args.iters}: {checked} cells agree", flush=True)
    print(
        json.dumps(
            {
                "metric": "fuzz_differential",
                "iters": args.iters,
                "cells_checked": checked,
                "divergences": 0,
                "seed": args.seed,
                "wall_sec": round(time.time() - t0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
