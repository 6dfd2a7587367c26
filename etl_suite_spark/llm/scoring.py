"""Batch ML-model scoring as pure relational expressions.

Reference analog: the ETL-suite applies trained sklearn models during its
transform stage (tier/churn labeling — SURVEY §0.1 [K]). At 100 TB you do
NOT ship rows to Python for a linear model: the score is a dot product, and
a dot product is a SQL expression. Scoring therefore runs entirely inside
whole-stage codegen — a map-only pass with zero shuffle and zero Python —
and the model "deploys" as literals in the plan. (Tree ensembles deploy the
same way as nested CASE WHEN; a pandas UDF is the fallback only for true
black-box models — see ``udf_pandas_scalar`` for that path.)

Determinism: features are quantized to exact decimals and the weights are
exact decimal literals, so the margin is exact fixed-point arithmetic —
bit-identical on Spark and DuckDB (core.py discipline), unlike a
float-accumulated dot product.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..core import d2d, dec
from ..io import load_table
from ..registry import query

# Frozen "trained" linear model (weights are part of the operator contract).
_W_QTY = "0.20"  # per unit quantity
_W_DISC = "-90.0"  # discount dampens the score
_W_PRICE = "0.0001"  # per currency unit of extended price
_BIAS = "-6.5"
_THRESHOLD = "2.0"


@query(
    "ml_linear_scoring",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(
             CAST({_W_QTY} AS DECIMAL(8,4))  * CAST(l_quantity      AS DECIMAL(18,2))
           + CAST({_W_DISC} AS DECIMAL(8,4)) * CAST(l_discount      AS DECIMAL(18,4))
           + CAST({_W_PRICE} AS DECIMAL(8,4))* CAST(l_extendedprice AS DECIMAL(18,2))
           + CAST({_BIAS} AS DECIMAL(8,4))
           AS VARCHAR) AS DOUBLE) AS score,
           (CAST({_W_QTY} AS DECIMAL(8,4))  * CAST(l_quantity      AS DECIMAL(18,2))
          + CAST({_W_DISC} AS DECIMAL(8,4)) * CAST(l_discount      AS DECIMAL(18,4))
          + CAST({_W_PRICE} AS DECIMAL(8,4))* CAST(l_extendedprice AS DECIMAL(18,2))
          + CAST({_BIAS} AS DECIMAL(8,4))) > CAST({_THRESHOLD} AS DECIMAL(8,4))
             AS predicted
    FROM lineitem
    WHERE l_orderkey < 1000
    """,
)
def ml_linear_scoring(spark, sf_dir):
    """Score a frozen linear model over lineitem rows, JVM-side only.

    ``score = w·x + b`` in exact fixed-point; ``predicted`` thresholds the
    margin. Filter bound keeps the declared output small; remove it and
    the same plan streams at scan bandwidth over any row count.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    w_qty = F.lit(_W_QTY).cast("decimal(8,4)")
    w_disc = F.lit(_W_DISC).cast("decimal(8,4)")
    w_price = F.lit(_W_PRICE).cast("decimal(8,4)")
    bias = F.lit(_BIAS).cast("decimal(8,4)")
    margin = (
        w_qty * dec("l_quantity", 2)
        + w_disc * dec("l_discount", 4)
        + w_price * dec("l_extendedprice", 2)
        + bias
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        d2d(margin).alias("score"),
        (margin > F.lit(_THRESHOLD).cast("decimal(8,4)")).alias("predicted"),
    )


@query(
    "ml_target_encoding",
    oracle="""
    WITH j AS (
      SELECT c_mktsegment AS segment,
             CAST(o_totalprice AS DECIMAL(18,2)) AS price
      FROM orders JOIN customer ON o_custkey = c_custkey
    ), g AS (
      SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(price) AS s
      FROM j GROUP BY segment
    ), prior AS (
      SELECT CAST(CAST(SUM(price) AS VARCHAR) AS DOUBLE) / COUNT(*) AS p
      FROM j
    )
    SELECT segment, n_orders,
           round(CAST(CAST(s AS VARCHAR) AS DOUBLE) / n_orders, 6) AS raw_mean,
           round((CAST(CAST(s AS VARCHAR) AS DOUBLE) + 100 * p)
                 / (n_orders + 100), 6) AS encoded
    FROM g, prior ORDER BY segment
    """,
)
def ml_target_encoding(spark, sf_dir):
    """Smoothed target (mean) encoding of a categorical feature —
    segment → E[order value | segment] shrunk toward the global mean
    with prior weight m=100 (Micci-Barreca 2001): enc = (Σy + m·ȳ) /
    (n + m). Rare categories collapse to the prior instead of
    memorizing noise. Production fits this out-of-fold to avoid target
    leakage; the encoding TABLE construction here is the per-fold
    building block (run it on the training fold, broadcast-join it
    onto any fold).

    Exactness: category sums and the prior are exact decimals rendered
    once to double; the shrinkage is scalar math.

    Plan shape: one broadcast dim join, one map-combined agg to
    |categories| rows, one single-row prior broadcast."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_mktsegment").alias("segment"), dec("o_totalprice", 2).alias("price")
    )
    g = j.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_orders"), F.sum("price").alias("s")
    )
    prior = F.broadcast(j.agg((d2d(F.sum("price")) / F.count("*")).alias("p")))
    return (
        g.crossJoin(prior)
        .select(
            "segment",
            "n_orders",
            F.round(d2d(F.col("s")) / F.col("n_orders"), 6).alias("raw_mean"),
            F.round(
                (d2d(F.col("s")) + 100 * F.col("p")) / (F.col("n_orders") + 100), 6
            ).alias("encoded"),
        )
        .orderBy("segment")
    )


@query(
    "ml_feature_scale",
    oracle="""
    WITH st AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS s,
             CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))
                           * CAST(c_acctbal AS DECIMAL(18,2))) AS VARCHAR)
                  AS DOUBLE) AS ss,
             MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx
      FROM customer
    )
    SELECT c_custkey, c_acctbal,
           round((c_acctbal - s / n)
                 / sqrt((ss - s * s / n) / (n - 1)), 6) AS zscore,
           round((c_acctbal - mn) / (mx - mn), 6) AS minmax
    FROM customer, st
    WHERE c_custkey < 500
    ORDER BY c_custkey
    """,
)
def ml_feature_scale(spark, sf_dir):
    """Feature standardization — the two canonical scalers emitted side
    by side per row: z-score ((x−μ)/σ, sample σ) and min-max
    ((x−min)/(max−min)). The fit statistics are ONE map-combined pass
    (exact decimal power sums + min/max) broadcast back over the rows —
    the fit/transform split every ML pipeline needs, with the fit
    artifact a single broadcastable row at any scale.

    Determinism: μ and σ come from exact decimal sums rendered to
    double; per-row scaling is scalar IEEE math."""
    c = load_table(spark, sf_dir, "customer")
    st = F.broadcast(
        c.agg(
            F.count("*").cast("long").alias("n"),
            d2d(F.sum(dec("c_acctbal", 2))).alias("s"),
            d2d(F.sum(dec("c_acctbal", 2) * dec("c_acctbal", 2))).alias("ss"),
            F.min("c_acctbal").alias("mn"),
            F.max("c_acctbal").alias("mx"),
        )
    )
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    return (
        c.filter(F.col("c_custkey") < 500)
        .crossJoin(st)
        .select(
            "c_custkey",
            "c_acctbal",
            F.round(
                (F.col("c_acctbal") - s / n)
                / F.sqrt((ss - s * s / n) / (n - 1)),
                6,
            ).alias("zscore"),
            F.round(
                (F.col("c_acctbal") - F.col("mn")) / (F.col("mx") - F.col("mn")), 6
            ).alias("minmax"),
        )
        .orderBy("c_custkey")
    )


# Fixed starting weights for the single audited gradient-descent step:
# price ~ w0 + w1*quantity + w2*discount + w3*tax, weights in exact 2-dp
# decimals so every partial product below stays an exact rational.
_GDS_W0 = [("intercept", "100.00"), ("quantity", "50.00"),
           ("discount", "-10.00"), ("tax", "5.00")]
_GDS_LR = "0.001"


@query(
    "ml_gradient_step_linear",
    oracle=f"""
    WITH x AS (
      SELECT CAST(1 AS DECIMAL(8,2)) AS x0,
             CAST(l_quantity AS DECIMAL(8,2)) AS x1,
             CAST(l_discount AS DECIMAL(8,2)) AS x2,
             CAST(l_tax AS DECIMAL(8,2)) AS x3,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS y
      FROM lineitem
    ), r AS (
      SELECT CAST(CAST({_GDS_W0[0][1]} AS DECIMAL(18,2)) * x0
                + CAST({_GDS_W0[1][1]} AS DECIMAL(18,2)) * x1
                + CAST({_GDS_W0[2][1]} AS DECIMAL(18,2)) * x2
                + CAST({_GDS_W0[3][1]} AS DECIMAL(18,2)) * x3
                - y AS DECIMAL(18,4)) AS resid,
             x0, x1, x2, x3
      FROM x
    ), g AS (
      SELECT COUNT(*) AS n,
             SUM(resid * x0) AS g0, SUM(resid * x1) AS g1,
             SUM(resid * x2) AS g2, SUM(resid * x3) AS g3
      FROM r
    )
    SELECT u.j AS dim, u.feature, u.w_old,
           round(2.0 * CAST(CAST(u.s AS VARCHAR) AS DOUBLE) / n, 6) AS grad,
           round(u.w_old - {_GDS_LR}e0
                 * (2.0 * CAST(CAST(u.s AS VARCHAR) AS DOUBLE) / n), 6)
             AS w_new
    FROM g, LATERAL (
      VALUES (0, 'intercept', CAST({_GDS_W0[0][1]} AS DOUBLE), g.g0),
             (1, 'quantity',  CAST({_GDS_W0[1][1]} AS DOUBLE), g.g1),
             (2, 'discount',  CAST({_GDS_W0[2][1]} AS DOUBLE), g.g2),
             (3, 'tax',       CAST({_GDS_W0[3][1]} AS DOUBLE), g.g3)
    ) AS u(j, feature, w_old, s)
    ORDER BY dim
    """,
)
def ml_gradient_step_linear(spark, sf_dir):
    """One audited batch-gradient-descent step for a linear model
    (price ~ intercept + quantity + discount + tax) — the distributed-ML
    primitive every parameter-server / allreduce trainer is built from:
    the gradient of the squared loss is (2/n)·Σ residual·x_j, and that
    per-feature sum is ONE map-side-combinable aggregation over the fact
    table. The output is the 4-row (w_old, grad, w_new) table after a
    single lr=0.001 step from pinned starting weights.

    Exactness: features and weights are exact 2-dp decimals, so every
    residual and every resid·x_j partial product is an exact rational in
    DECIMAL — the gradient sums are bit-identical regardless of
    partition merge order (the core.py rule-3 power-sum discipline
    applied to a training step rather than a statistic); doubles appear
    only in the final (2·S/n, lr-scaled) render, where both engines hold
    identical exact inputs. No transcendental anywhere — which is
    precisely why the audit uses the LINEAR model: a logistic step's
    sigmoid would reintroduce cross-engine libm drift into the sums.

    100 TB shape: epochs = repeated invocations; the gradient pass
    shuffles NOTHING but 4 partial sums per partition (allreduce in
    Spark clothing). Feature scaling (ml_feature_scale) composes in
    front; the fixed weights make it an oracle-checkable unit."""
    li = load_table(spark, sf_dir, "lineitem")
    w = [(name, F.lit(val).cast("decimal(18,2)")) for name, val in _GDS_W0]
    x = li.select(
        F.lit(1).cast("decimal(8,2)").alias("x0"),
        dec("l_quantity", 2, 8).alias("x1"),
        dec("l_discount", 2, 8).alias("x2"),
        dec("l_tax", 2, 8).alias("x3"),
        dec("l_extendedprice", 2).alias("y"),
    )
    resid = (
        w[0][1] * F.col("x0")
        + w[1][1] * F.col("x1")
        + w[2][1] * F.col("x2")
        + w[3][1] * F.col("x3")
        - F.col("y")
    ).cast("decimal(18,4)")
    r = x.select(resid.alias("resid"), "x0", "x1", "x2", "x3")
    g = r.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.col("resid") * F.col(f"x{j}")).alias(f"g{j}")
            for j in range(4)
        ],
    )
    rows = None
    for j, (name, val) in enumerate(_GDS_W0):
        grad = 2.0 * d2d(F.col(f"g{j}")) / F.col("n")
        row = g.select(
            F.lit(j).cast("int").alias("dim"),
            F.lit(name).alias("feature"),
            F.lit(val).cast("double").alias("w_old"),
            F.round(grad, 6).alias("grad"),
            F.round(F.lit(val).cast("double") - F.lit(float(_GDS_LR)) * grad, 6)
            .alias("w_new"),
        )
        rows = row if rows is None else rows.unionAll(row)
    return rows.orderBy("dim")
