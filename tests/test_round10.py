"""Round-10 operator + harness-gate tests.

The headline harness fix this round (VERDICT r9 items 1-2): the real
driver canonicalizes EVERY query's output via ``toPandas().sort_values``,
which cannot factorize ndarray cells — so an Array/Map/Struct output
column turns a locally-green query red in the round's CORRECTNESS record
(llm_emb_pca, CORRECTNESS_r09's only err row). The driver-shape gate in
``tools/plan_audit.shape_violations`` (run by plan_audit over all batch
plans and by verify_local over every query incl. streaming) pins the
atomic-output discipline; these tests pin the gate itself.
"""

from __future__ import annotations

import pytest

import __spark_entry__  # noqa: F401  (registration side effects)
from etl_suite_spark.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from etl_suite_spark.session import get_spark

    return get_spark("etl-tests-r10")


def _driver_canon_probe(df):
    """Literal replay of the real driver's canonicalization ingest step
    (toPandas + sort_values over all columns) — the step that raised
    ``TypeError: unhashable type: 'numpy.ndarray'`` in CORRECTNESS_r09."""
    pdf = df.toPandas()
    return pdf.sort_values(by=sorted(pdf.columns), kind="mergesort")


def test_shape_gate_flags_nested_outputs(spark):
    from tools.plan_audit import NESTED_OUTPUT_OK, shape_violations

    atomic = spark.sql("SELECT 1 AS a, 'x' AS b, CAST(2.5 AS DOUBLE) AS c")
    assert shape_violations("q_atomic", atomic.schema) == []

    nested = spark.sql(
        "SELECT 1 AS a, array(1.0D, 2.0D) AS pc,"
        " map('k', 1) AS m, named_struct('f', 1) AS st"
    )
    bad = shape_violations("q_nested", nested.schema)
    assert [b.split(":")[0] for b in bad] == ["pc", "m", "st"]

    # the whitelist is the ONLY escape, and it is intentionally empty today
    assert NESTED_OUTPUT_OK == set()
    try:
        NESTED_OUTPUT_OK.add("q_nested")
        assert shape_violations("q_nested", nested.schema) == []
    finally:
        NESTED_OUTPUT_OK.discard("q_nested")

    # and the gate models the real failure: pandas genuinely cannot
    # sort_values the nested frame the driver would build from it
    with pytest.raises(TypeError):
        _driver_canon_probe(nested)


def test_emb_pca_output_is_driver_ingestible(spark):
    """llm_emb_pca's r10 shape (scalar pc_0..pc_7 doubles) must pass both
    the static gate and the literal driver canonicalization replay; the
    r9 shape (a single pc array column) must fail both — i.e. the gate
    would have caught CORRECTNESS_r09's red record locally."""
    import pyspark.sql.functions as F

    from tools.plan_audit import shape_violations

    df = QUERIES["llm_emb_pca"](spark, SF_DIR)
    assert shape_violations("llm_emb_pca", df.schema) == []
    pc_cols = [c for c in df.columns if c.startswith("pc_")]
    assert pc_cols == [f"pc_{i}" for i in range(8)]
    pdf = _driver_canon_probe(df)  # must not raise
    assert len(pdf) == df.count()

    # reconstruct the pre-fix output shape and show the gate trips on it
    legacy = df.select("vec_id", F.array(*pc_cols).alias("pc"))
    bad = shape_violations("llm_emb_pca_legacy_shape", legacy.schema)
    assert bad and bad[0].startswith("pc:")
    with pytest.raises(TypeError):
        _driver_canon_probe(legacy)


def test_ivfpq_dedup_index_seeds_survive_lowid_duplicates(spark, tmp_path):
    """The r9 under-seed regression (code-review r9 finding #1) applied
    to the NEW dedup-IVF-PQ path: a corpus whose vec_ids 0..15 are
    near-duplicates of ONE vector keeps a single representative, so the
    residual-PQ codebook must seed from the ksub smallest REPRESENTATIVE
    ids — `vec_id < ksub` would degenerate the quantizer. Also pins the
    serving layout: the persisted code table carries the cell id."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from etl_suite_spark.llm.similarity import _ivfpq_dedup_index

    def vec(seed):
        return [round(math.sin(seed * 7.3 + i * 1.7), 6) for i in range(64)]

    rows = []
    base = vec(999)
    for vid in range(16):  # low ids: all the SAME vector (one signature)
        rows.append((vid, base))
    for vid in range(16, 128):  # the rest: distinct vectors
        rows.append((vid, vec(vid)))
    d = tmp_path / "lowdup_ivfpq"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "vec_id": [r[0] for r in rows],
                "embedding": pa.array(
                    [r[1] for r in rows], type=pa.list_(pa.float32())
                ),
            }
        ),
        str(d / "embeddings.parquet"),
    )
    coded, cent, coarse = _ivfpq_dedup_index(spark, str(d))
    widths = [
        r["w"]
        for r in cent.groupBy("subspace")
        .agg(F.count_distinct("cluster").alias("w"))
        .collect()
    ]
    assert widths and min(widths) >= 8, (
        f"codebook degenerated: per-subspace widths {sorted(widths)}"
    )
    # the dedup collapsed the low-id duplicate block to ONE representative
    assert coded.filter(F.col("vec_id") < 16).count() == 1
    assert coded.count() >= 16  # enough reps to fill the seed list
    assert "cell" in coded.columns  # cell-partitioned serving layout
    assert coarse.count() <= 8


def test_recall_sentinel_normalizes_nonbool_flags():
    """ADVICE r9 item 2 regression: a truthy non-bool flag value (e.g.
    numpy.bool_) must compare by VALUE, not identity — the old
    `got is not expect` would spuriously fail the sentinel on it."""
    import numpy as np

    from tools.scale_smoke import ANN_RECALL_SENTINEL, check_recall_sentinel

    coords = (100, 0.05)
    matrix = ANN_RECALL_SENTINEL[coords]
    timings = {
        name: {"sec": 1.0, "result": {flag: np.bool_(expect)}}
        for name, (flag, expect) in matrix.items()
    }
    applies, fails = check_recall_sentinel(*coords, False, None, timings)
    assert applies and fails == []
    # the new op's row is pinned at both coordinates
    for c in ((100, 0.05), (1500, 0.001)):
        assert (
            ANN_RECALL_SENTINEL[c]["llm_index_build_pipeline_ivfpq_recall"]
            == ("recall_ge_30", True)
        )


def test_subject_export_zero_subject_corpus(spark, tmp_path):
    """ADVICE r9 item 1 regression: a corpus with NO subject rows
    (no user_id % 97 == 0) must return the oracle's empty result — not
    raise on `.parquet(*[])` — and still reclaim the temp warehouse."""
    import datetime
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from etl_suite_spark.plans import incremental as inc

    n = 40
    pq.write_table(
        pa.table(
            {
                "event_id": list(range(n)),
                "ts": [
                    datetime.datetime(2024, 1, 1) + datetime.timedelta(minutes=i)
                    for i in range(n)
                ],
                # user_ids 1..40: none divisible by 97
                "user_id": [i + 1 for i in range(n)],
                "event_type": ["click", "view", "purchase", "signup"] * (n // 4),
                "value": [float(i) / 7 for i in range(n)],
                "props": ['{"k": 1}'] * n,
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    df = QUERIES["inc_subject_export"](spark, str(tmp_path))
    assert df.columns == [
        "user_id", "n_events", "n_event_types", "first_ts", "last_ts",
        "total_value",
    ]
    assert df.count() == 0
    wh, scanned = inc._LAST_EXPORT_WH
    assert scanned == []  # nothing listed, let alone read
    assert not os.path.exists(os.path.dirname(wh))  # reclaimed


def _quantize_matrix(X):
    """The engines' exact quantization of embedding components: float32
    multiply by 1e6 (both Spark and DuckDB coerce FLOAT * INT to a
    float32 product), then decimal HALF_UP on the shortest repr — the
    test_round8 PCA recipe."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    prod = (X.astype(np.float32) * np.float32(1e6)).astype(np.float64)
    return np.array(
        [
            [
                int(Decimal(repr(v)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))
                for v in row
            ]
            for row in prod
        ],
        dtype=object,  # exact int products below
    )


def test_matryoshka_recall_matches_numpy_reference(spark):
    """llm_emb_matryoshka_recall vs an independent numpy implementation
    of the same semantics (exact integer quantized dots, 6-dp cosine,
    neighbor-id tiebreak): per-dim n_found must match EXACTLY — the
    addendum-27 discipline of not trusting a mirrored representation.
    Also pins the self-test row: d=64 recall is 1.0 by construction."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    X = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    vec_ids = t["vec_id"].to_pylist()
    Q = _quantize_matrix(X)
    n = len(Q)
    qidx = [i for i, v in enumerate(vec_ids) if v < 10]

    def top3(d):
        out = {}
        for qi in qidx:
            scores = []
            for ci in range(n):
                if vec_ids[ci] == vec_ids[qi]:
                    continue
                dp = sum(int(a) * int(b) for a, b in zip(Q[qi][:d], Q[ci][:d]))
                nq = sum(int(a) * int(a) for a in Q[qi][:d])
                nc = sum(int(a) * int(a) for a in Q[ci][:d])
                cos = round(
                    (dp / 1e12) / ((nq / 1e12 * nc / 1e12) ** 0.5), 6
                )
                scores.append((-cos, vec_ids[ci]))
            scores.sort()
            out[vec_ids[qi]] = {vid for _, vid in scores[:3]}
        return out

    full = top3(64)
    rows = {
        r["dim"]: r
        for r in QUERIES["llm_emb_matryoshka_recall"](spark, SF_DIR).collect()
    }
    assert sorted(rows) == [8, 16, 32, 64]
    for d in (8, 16, 32, 64):
        trunc = top3(d)
        ref_found = sum(len(trunc[k] & full[k]) for k in full)
        r = rows[d]
        assert r["n_exact_pairs"] == 30
        assert r["n_found"] == ref_found, (d, r["n_found"], ref_found)
        assert abs(r["recall"] - round(ref_found / 30, 4)) < 1e-9
    assert rows[64]["n_found"] == 30 and rows[64]["recall"] == 1.0


def test_incremental_add_conservation_and_frozen_assignment(spark):
    """llm_index_incremental_add: per-cell counts conserve the corpus
    split exactly (base = vec_id>=100, delta = vec_id<100), and every
    delta vector's cell equals the argmin over the FROZEN persisted
    centroids recomputed independently in numpy — i.e. the delta path
    really is assignment-only, no retrain."""
    import numpy as np
    import pyarrow.parquet as pq

    from etl_suite_spark.llm.similarity import _ivf_incr_parts

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    vec_ids = t["vec_id"].to_pylist()
    n_delta = sum(1 for v in vec_ids if v < 100)
    n_base = len(vec_ids) - n_delta

    rows = QUERIES["llm_index_incremental_add"](spark, SF_DIR).collect()
    assert sum(r["n_base"] for r in rows) == n_base
    assert sum(r["n_added"] for r in rows) == n_delta
    for r in rows:
        assert r["n_total"] == r["n_base"] + r["n_added"]
        assert abs(r["delta_share"] - round(r["n_added"] / r["n_total"], 4)) < 1e-9

    base_cells, delta_cells, centroids = _ivf_incr_parts(spark, SF_DIR)
    cent = {
        r["cluster"]: np.array(r["centroid"], dtype=np.float64)
        for r in centroids.collect()
    }
    emb = {
        v: np.array(e, dtype=np.float64)
        for v, e in zip(vec_ids, t["embedding"].to_pylist())
        if v < 100
    }
    got = {r["vec_id"]: r["cell"] for r in delta_cells.collect()}
    assert set(got) == set(emb)
    from etl_suite_spark.llm.clustering import _DIST_SQ  # noqa: F401 — doc ref

    def q6(x):
        # _DIST_SQ quantizes components like the dot fold: round(x*1e6)
        from decimal import ROUND_HALF_UP, Decimal

        p = float(np.float32(x) * np.float32(1e6))
        return int(Decimal(repr(p)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))

    mism = 0
    for vid, e in emb.items():
        eq = np.array([q6(x) for x in e], dtype=np.float64)
        best = min(
            (
                (float(np.sum((eq - np.array([q6(c) for c in cv])) ** 2)), cl)
                for cl, cv in cent.items()
            )
        )[1]
        if got[vid] != best:
            mism += 1
    assert mism == 0, f"{mism} delta vectors not assigned to nearest frozen centroid"


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _vec = st.lists(
        st.floats(
            min_value=-1.0, max_value=1.0, allow_nan=False, width=32
        ),
        min_size=64,
        max_size=64,
    )

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(st.lists(st.tuples(_vec, _vec), min_size=1, max_size=12))
    def test_prefix_dot_bridge_agrees(spark, duck, rows):
        """The PREFIX-truncated quantized dot fold (_dot_d vs _sql_dot_d)
        — the dialect bridge llm_emb_matryoshka_recall's every ranking
        comparison rests on — must agree cell-for-cell across engines
        for every truncation length, on adversarial float32 inputs.
        Spark slices the array then folds; DuckDB folds over an
        end-exclusive range — an off-by-one in either direction changes
        d and breaks this for some random vector."""
        import pyarrow as pa

        from etl_suite_spark.llm.similarity import _dot_d, _sql_dot_d

        # BOTH sides must see FLOAT32 lists, like the parquet fixtures do:
        # a pandas registration would infer DOUBLE[] on the DuckDB side and
        # compute round(x*1e6) on the double grid, while Spark's FLOAT
        # column snaps the product to the float32 grid — a harness-made
        # ±1-quantum divergence, not a bridge defect (the test's first run
        # caught exactly that).
        atab = pa.table(
            {
                "a": pa.array([r[0] for r in rows], type=pa.list_(pa.float32())),
                "b": pa.array([r[1] for r in rows], type=pa.list_(pa.float32())),
            }
        )
        schema = "a array<float>, b array<float>"
        sdf = spark.createDataFrame(
            [(list(map(float, r[0])), list(map(float, r[1]))) for r in rows],
            schema=schema,
        )

        dims = (1, 8, 16, 33, 64)
        s_rows = sdf.select(
            *[_dot_d("a", "b", d).alias(f"d{d}") for d in dims]
        ).collect()
        duck.register("_mat_t_duck", atab)
        sel = ", ".join(f"{_sql_dot_d('a', 'b', d)} AS d{d}" for d in dims)
        d_rows = duck.execute(f"SELECT {sel} FROM _mat_t_duck").fetchall()
        duck.unregister("_mat_t_duck")
        assert len(s_rows) == len(d_rows)
        for i, (sr, dr) in enumerate(zip(s_rows, d_rows)):
            for j, d in enumerate(dims):
                assert sr[j] == dr[j], (
                    f"row {i} dim {d}: spark={sr[j]!r} duck={dr[j]!r}"
                )
except ImportError:  # pragma: no cover — hypothesis is baked in
    pass
