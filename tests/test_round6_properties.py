"""Property-based differential tests for the round-6 parity assumptions.

Random inputs (hypothesis) through BOTH engines plus a Python
decimal.Decimal reference — pins the two load-bearing cross-engine
assumptions that fixture-based tests only exercise at one data point:

1. the multi-step DECIMAL(18,6) ROUND_HALF_UP left fold (the ts_ewma /
   holt family) stays bit-identical between Spark's ``aggregate`` and
   DuckDB's ``list_reduce`` AND matches the quantized Decimal recursion;
2. the 6dp integer quantization ``CAST(round(x*1e6) AS BIGINT)`` that
   every similarity kernel builds on rounds identically on both engines
   for arbitrary doubles (half-up vs half-even drift would silently
   corrupt every dot product).
"""

from __future__ import annotations

import decimal
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_DEC = st.decimals(
    min_value=Decimal("-999999.99"),
    max_value=Decimal("999999.99"),
    places=2,
    allow_nan=False,
    allow_infinity=False,
)

# Damped-Holt fold step (the ts_holt_damped lambda, restated as spec).
_SPARK_LNEW = "round(0.5 * x[0] + 0.5 * (acc[0] + 0.9 * acc[1]), 6)"
_DUCK_LNEW = "round(0.5 * p[1] + 0.5 * (acc[1] + 0.9 * acc[2]), 6)"


@_SETTINGS
@given(st.lists(_DEC, min_size=2, max_size=40))
def test_decimal_fold_differential(spark, duck, xs):
    """Spark aggregate == DuckDB list_reduce == Decimal recursion for the
    damped two-state fold over ANY short 2dp series."""
    svals = ", ".join(
        f"array(CAST({x} AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6)))" for x in xs
    )
    s_l, s_b = spark.sql(
        "SELECT CAST(st[0] AS STRING), CAST(st[1] AS STRING) FROM (SELECT "
        f"aggregate(slice(array({svals}), 2, {len(xs) - 1}), "
        f"element_at(array({svals}), 1), (acc, x) -> array("
        f"CAST({_SPARK_LNEW} AS DECIMAL(18,6)), "
        f"CAST(round(0.3 * ({_SPARK_LNEW} - acc[0]) + 0.63 * acc[1], 6)"
        " AS DECIMAL(18,6)))) AS st)"
    ).collect()[0]
    dvals = ", ".join(
        f"[CAST({x} AS DECIMAL(18,6)), CAST(0 AS DECIMAL(18,6))]" for x in xs
    )
    d_l, d_b = duck.sql(
        f"SELECT CAST(st[1] AS VARCHAR), CAST(st[2] AS VARCHAR) FROM (SELECT "
        f"list_reduce([{dvals}], (acc, p) -> ["
        f"CAST({_DUCK_LNEW} AS DECIMAL(18,6)), "
        f"CAST(round(0.3 * ({_DUCK_LNEW} - acc[1]) + 0.63 * acc[2], 6)"
        " AS DECIMAL(18,6))]) AS st)"
    ).fetchone()
    with decimal.localcontext() as ctx:
        ctx.prec = 50
        grid = Decimal("0.000001")

        def q6(d):
            return d.quantize(grid, rounding=decimal.ROUND_HALF_UP)

        l, b = Decimal(str(xs[0])), Decimal(0)
        for x in xs[1:]:
            xd = Decimal(str(x))
            lt = q6(Decimal("0.5") * xd + Decimal("0.5") * (l + Decimal("0.9") * b))
            bt = q6(Decimal("0.3") * (lt - l) + Decimal("0.63") * b)
            l, b = lt, bt
    assert Decimal(s_l) == Decimal(d_l) == l, (s_l, d_l, str(l))
    assert Decimal(s_b) == Decimal(d_b) == b, (s_b, d_b, str(b))


@_SETTINGS
@given(
    st.lists(
        st.floats(
            min_value=-4.0,
            max_value=4.0,
            allow_nan=False,
            allow_infinity=False,
            width=32,
        ),
        min_size=1,
        max_size=64,
    )
)
def test_quantization_rounding_differential(spark, duck, vs):
    """CAST(round(x * 1e6) AS BIGINT) must agree between engines for
    FLOAT32-origin values — the exact input class of every quantized dot
    product (llm/similarity.py _DOT vs _SQL_DOT; the embedding columns
    are float32). Deliberately NOT arbitrary doubles: Spark's
    round(double) rounds the double's shortest decimal representation
    (BigDecimal.valueOf) while DuckDB rounds the binary value, and on
    boundary-adjacent arbitrary doubles they can disagree — measured in
    the llm_ngram_kneser_ney sf0.1 hunt (BASELINE.md 2026-08-15 entry).
    Money/measure columns avoid the hazard via the decimal discipline
    (round decimals, never doubles); the quantized kernels avoid it by
    construction (float32 in, integers out); remaining round(double, 6)
    sites on computed ratios carry a per-value risk of ~1e-10 that the
    per-round sf0.01 gate and the sf0.1 sweeps police empirically."""
    arr = ", ".join(f"CAST({repr(v)} AS DOUBLE)" for v in vs)
    s_rows = spark.sql(
        f"SELECT transform(array({arr}),"
        " v -> CAST(round(v * 1000000, 0) AS BIGINT)) AS q"
    ).collect()[0]["q"]
    d_rows = duck.sql(
        f"SELECT list_transform([{arr}],"
        " v -> CAST(round(v * 1000000) AS BIGINT)) AS q"
    ).fetchone()[0]
    assert list(s_rows) == list(d_rows), (vs, s_rows, d_rows)
