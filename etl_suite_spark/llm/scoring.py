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
