"""Round-6b semantic-invariant tests: llm_retrieval_ndcg and
ts_rolling_slope against independent plain-Python/Decimal references.

Both references replicate the engines' exact rounding schedule
(half-up DECIMAL quantization — see the verification-gates discipline):
float components quantize via Decimal ROUND_HALF_UP, sums fold exactly,
and only the final divisions run in binary double, so agreement is
expected to ~1e-12, not to a loose tolerance.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_DIR

from etl_suite_spark.llm.similarity import _NDCG_DISC
from etl_suite_spark.registry import QUERIES


def _half_up_int(x: float) -> int:
    return int(Decimal(x).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def _round6(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP))


def _load_embeddings():
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = t.column("vec_id").to_pylist()
    embs = t.column("embedding").to_pylist()
    return dict(zip(ids, [[float(v) for v in e] for e in embs]))


def _qvec(e):
    return [_half_up_int(v * 1000000) for v in e]


def _ref_retrieval_metrics():
    """Plain-Python replica of llm_retrieval_ndcg's semantics."""
    vecs = _load_embeddings()
    qv = {i: _qvec(e) for i, e in vecs.items()}
    nsq = {i: sum(c * c for c in q) / 1e12 for i, q in qv.items()}
    bucket = {
        i: sum((1 << b) for b in range(8) if e[b] >= 0) for i, e in vecs.items()
    }

    def cosine(qi, ei):
        d = sum(a * b for a, b in zip(qv[qi], qv[ei])) / 1e12
        return _round6(d / math.sqrt(nsq[qi] * nsq[ei]))

    disc = [Decimal(d) for d in _NDCG_DISC]
    out = {}
    queries = sorted(i for i in vecs if i < 10)
    for q in queries:
        scored = sorted(
            ((cosine(q, e), e) for e in vecs if e != q),
            key=lambda t: (-t[0], t[1]),
        )
        truth = [e for _, e in scored[:10]]
        truth_set = set(truth)
        cands = sorted(
            (
                (cosine(q, e), e)
                for e in vecs
                if e != q and bucket[e] == bucket[q]
            ),
            key=lambda t: (-t[0], t[1]),
        )
        retrieved = [e for _, e in cands[:10]]
        hits = sum(1 for e in retrieved if e in truth_set)
        first_rel = next(
            (p for p, e in enumerate(retrieved, 1) if e in truth_set), None
        )
        dcg = sum(
            (disc[p - 1] for p, e in enumerate(retrieved, 1) if e in truth_set),
            Decimal(0),
        )
        idcg = sum((disc[r] for r in range(len(truth))), Decimal(0))
        out[q] = {
            "n_retrieved": len(retrieved),
            "hits": hits,
            "recall_at_10": float(hits) / float(len(truth)),
            "mrr": 0.0 if first_rel is None else 1.0 / float(first_rel),
            "ndcg_at_10": float(str(dcg)) / float(str(idcg)),
        }
    return out


def test_retrieval_ndcg_matches_python_reference(spark):
    ref = _ref_retrieval_metrics()
    rows = {
        r["query_id"]: r.asDict()
        for r in QUERIES["llm_retrieval_ndcg"](spark, SF_DIR).collect()
    }
    assert set(rows) == set(ref)
    for q, want in ref.items():
        got = rows[q]
        assert got["n_retrieved"] == want["n_retrieved"], q
        assert got["hits"] == want["hits"], q
        for col in ("recall_at_10", "mrr", "ndcg_at_10"):
            assert got[col] == pytest.approx(want[col], abs=1e-12), (q, col)


def test_retrieval_ndcg_metric_ranges(spark):
    rows = QUERIES["llm_retrieval_ndcg"](spark, SF_DIR).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r["hits"] <= r["n_retrieved"] <= 10
        assert 0.0 <= r["recall_at_10"] <= 1.0
        assert 0.0 <= r["mrr"] <= 1.0
        assert 0.0 <= r["ndcg_at_10"] <= 1.0 + 1e-12
        # perfect retrieval must score perfect NDCG and MRR
        if r["hits"] == 10 and r["n_retrieved"] == 10:
            assert r["ndcg_at_10"] == pytest.approx(1.0, abs=1e-12)
            assert r["mrr"] == 1.0


def _ref_rolling_slope():
    """Exact-arithmetic replica of ts_rolling_slope (daily decimal sums,
    integer day index, 14-row frames, closed-form OLS from frame sums)."""
    t = pq.read_table(f"{SF_DIR}/events.parquet", columns=["event_type", "ts", "value"])
    daily = {}
    epoch = None
    import datetime

    base = datetime.date(2024, 1, 1)
    for et, ts, v in zip(
        t.column("event_type").to_pylist(),
        t.column("ts").to_pylist(),
        t.column("value").to_pylist(),
    ):
        day = ts.date()
        key = (et, day)
        daily[key] = daily.get(key, Decimal(0)) + Decimal(v).quantize(
            Decimal("0.01"), rounding=ROUND_HALF_UP
        )
    out = {}
    by_type = {}
    for (et, day), v in daily.items():
        by_type.setdefault(et, []).append((day, v))
    for et, series in by_type.items():
        series.sort()
        for i in range(13, len(series)):
            frame = series[i - 13 : i + 1]
            xs = [(d - base).days for d, _ in frame]
            ys = [v for _, v in frame]
            n = len(frame)
            sx = sum(xs)
            sxx = sum(x * x for x in xs)
            sy = sum(ys, Decimal(0))
            sxy = sum((Decimal(x) * y for x, y in zip(xs, ys)), Decimal(0))
            num = Decimal(n) * sxy - Decimal(sx) * sy
            den = n * sxx - sx * sx
            slope = float(str(num)) / float(den)
            intercept = (float(str(sy)) - slope * float(sx)) / float(n)
            out[(et, series[i][0])] = (slope, intercept)
    return out


def test_rolling_slope_matches_python_reference(spark):
    ref = _ref_rolling_slope()
    rows = QUERIES["ts_rolling_slope"](spark, SF_DIR).collect()
    assert len(rows) == len(ref)
    for r in rows:
        want = ref[(r["event_type"], r["day"])]
        assert r["slope"] == pytest.approx(want[0], abs=1e-9), r
        assert r["intercept"] == pytest.approx(want[1], abs=1e-9), r


def _ref_label_propagation():
    """Pure-Python replica of graph_label_propagation: synchronous
    3-round mode-label LPA with the (count DESC, label ASC) tie-break
    over the symmetrized customer↔supplier trade graph."""
    from collections import Counter

    orders = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_orderkey", "o_custkey"]
    )
    li = pq.read_table(
        f"{SF_DIR}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"]
    )
    cust = dict(
        zip(orders.column("o_orderkey").to_pylist(),
            orders.column("o_custkey").to_pylist())
    )
    e0 = set()
    for ok, sk in zip(
        li.column("l_orderkey").to_pylist(), li.column("l_suppkey").to_pylist()
    ):
        if ok in cust:
            e0.add((cust[ok] * 2, sk * 2 + 1))
    adj = {}
    for s, d in e0:
        adj.setdefault(s, []).append(d)
        adj.setdefault(d, []).append(s)
    labels = {n: n for n in adj}
    for _ in range(3):
        nxt = {}
        for n, nbrs in adj.items():
            counts = Counter(labels[m] for m in nbrs)
            nxt[n] = min(counts, key=lambda lb: (-counts[lb], lb))
        labels = nxt
    return labels


def test_label_propagation_matches_python_reference(spark):
    ref = _ref_label_propagation()
    rows = QUERIES["graph_label_propagation"](spark, SF_DIR).collect()
    assert len(rows) == len(ref)
    for r in rows:
        node = r["entity_key"] * 2 + (0 if r["kind"] == "customer" else 1)
        want = ref[node]
        got = r["community_key"] * 2 + (
            0 if r["community_kind"] == "customer" else 1
        )
        assert got == want, (node, got, want)


def test_label_propagation_communities_are_coarser_than_nodes(spark):
    """LPA must actually merge: the community count is strictly below the
    node count, and every community label is itself a node (labels only
    ever copy existing node ids — mode-of-neighbors can't invent one)."""
    rows = QUERIES["graph_label_propagation"](spark, SF_DIR).collect()
    nodes = {
        r["entity_key"] * 2 + (0 if r["kind"] == "customer" else 1)
        for r in rows
    }
    comms = {
        r["community_key"] * 2 + (0 if r["community_kind"] == "customer" else 1)
        for r in rows
    }
    assert comms <= nodes
    assert len(comms) < len(nodes)
