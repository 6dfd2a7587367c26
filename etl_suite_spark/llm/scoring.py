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


@query(
    "ml_auc_roc",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS score,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS pos
      FROM events GROUP BY user_id
    ), grp AS (
      SELECT score, COUNT(*) AS n, SUM(pos) AS npos FROM per_user GROUP BY score
    ), ranked AS (
      SELECT n, npos,
             COALESCE(SUM(n) OVER (ORDER BY score
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
      FROM grp
    ), s AS (
      SELECT SUM(npos * (2 * below + n + 1)) AS trs,
             SUM(npos) AS p, SUM(n - npos) AS q
      FROM ranked
    )
    SELECT CAST(p AS BIGINT) AS n_pos, CAST(q AS BIGINT) AS n_neg,
           round(CAST(trs - p * (p + 1) AS DOUBLE)
                 / CAST(2 * p * q AS DOUBLE), 6) AS auc
    FROM s
    """,
)
def ml_auc_roc(spark, sf_dir):
    """ROC AUC of a behavioral score (per-user total event value)
    predicting a binary label (more purchases than errors — every fixture
    user purchases at least once, so the presence label would be
    degenerate) — the model-eval
    number every offline scoring pipeline reports, computed by the
    rank-sum identity AUC = (R_pos − n_pos(n_pos+1)/2) / (n_pos·n_neg)
    (Hanley & McNeil 1982; the Mann–Whitney U statistic in ML clothing —
    agg_mann_whitney is the hypothesis-test framing of the same sum).

    Tie handling is exact: ties share their average rank, and the whole
    computation carries 2×ranksum so the half-ranks stay INTEGER —
    2·R_pos = Σ_groups npos_g · (2·below_g + n_g + 1). The only doubles
    are the final division of two exact integers. The ordered cumulative
    window runs over the DISTINCT-SCORE table (already aggregated from
    users), the same bounded-domain single-sort trade agg_mann_whitney
    makes; the per-user aggregation underneath is the one corpus-sized
    shuffle."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    per_user = ev.groupBy("user_id").agg(
        F.sum(dec("value", 2)).cast("decimal(18,2)").alias("score"),
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        )
        .cast("int")
        .alias("pos"),
    )
    grp = per_user.groupBy("score").agg(
        F.count("*").alias("n"), F.sum("pos").alias("npos")
    )
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grp.select(
        "n", "npos", F.coalesce(F.sum("n").over(w), F.lit(0)).alias("below")
    )
    s = ranked.agg(
        F.sum(F.col("npos") * (2 * F.col("below") + F.col("n") + 1)).alias("trs"),
        F.sum("npos").alias("p"),
        F.sum(F.col("n") - F.col("npos")).alias("q"),
    )
    return s.select(
        F.col("p").cast("long").alias("n_pos"),
        F.col("q").cast("long").alias("n_neg"),
        F.round(
            (F.col("trs") - F.col("p") * (F.col("p") + 1)).cast("double")
            / (2 * F.col("p") * F.col("q")).cast("double"),
            6,
        ).alias("auc"),
    )


@query(
    "ml_calibration_bins",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS score,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                     > SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  THEN 1 ELSE 0 END AS pos
      FROM events GROUP BY user_id
    ), binned AS (
      SELECT ntile(10) OVER (ORDER BY score, user_id) AS decile, score, pos
      FROM per_user
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           COUNT(*) AS n_users,
           round(CAST(CAST(SUM(score) AS VARCHAR) AS DOUBLE) / COUNT(*), 6)
             AS mean_score,
           round(SUM(pos) * 1.0 / COUNT(*), 6) AS pos_rate
    FROM binned GROUP BY decile ORDER BY decile
    """,
)
def ml_calibration_bins(spark, sf_dir):
    """Reliability table (calibration curve) for the same behavioral
    score ml_auc_roc ranks: users cut into score deciles, each reporting
    mean score vs realized positive rate — monotone pos_rate across the
    deciles is what "the score is usable as a propensity" actually means,
    and the table is what calibration methods (Platt, isotonic) fit on.

    ntile ties break on the explicit (score, user_id) order so both
    engines cut identical deciles; mean score renders through the exact
    decimal sum. The decile window sorts the per-user table (already one
    aggregation smaller than events) — the same bounded single-sort trade
    as the AUC op; everything after is a 10-key rollup."""
    ev = load_table(spark, sf_dir, "events")
    from pyspark.sql import Window

    per_user = ev.groupBy("user_id").agg(
        F.sum(dec("value", 2)).cast("decimal(18,2)").alias("score"),
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            > F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        )
        .cast("int")
        .alias("pos"),
    )
    binned = per_user.select(
        F.ntile(10).over(Window.orderBy("score", "user_id")).alias("decile"),
        "score",
        "pos",
    )
    return (
        binned.groupBy("decile")
        .agg(
            F.count("*").alias("n_users"),
            F.round(d2d(F.sum("score")) / F.count("*"), 6).alias("mean_score"),
            F.round(F.sum("pos") / F.count("*"), 6).alias("pos_rate"),
        )
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_users",
            "mean_score",
            "pos_rate",
        )
        .orderBy("decile")
    )


# Shift quantized embedding values into the nonnegative range so the
# half-up centroid rounding below is a pure positive-integer expression —
# `div` truncates toward zero in Spark while DuckDB's // floors, and the
# two agree only on nonnegative operands. The uniform shift cancels out
# of every centroid distance.
_CENTROID_SHIFT = 4_000_000


@query(
    "ml_confusion_metrics",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label, u.i - 1 AS dim,
             CAST(round(embedding[u.i] * 1000000) AS BIGINT)
               + {_CENTROID_SHIFT} AS qs
      FROM embeddings, unnest(range(1, 65)) AS u(i)
    ), cent AS (
      SELECT label AS clabel, dim,
             (2 * SUM(qs) + COUNT(*)) // (2 * COUNT(*)) AS c
      FROM q WHERE vec_id % 5 <> 4 GROUP BY label, dim
    ), ev AS (
      SELECT vec_id, label, dim, qs FROM q WHERE vec_id % 5 = 4
    ), dist AS (
      SELECT ev.vec_id, ev.label, cent.clabel,
             SUM((ev.qs - cent.c) * (ev.qs - cent.c)) AS d
      FROM ev JOIN cent ON ev.dim = cent.dim
      GROUP BY ev.vec_id, ev.label, cent.clabel
    ), pred AS (
      SELECT vec_id, label AS true_label,
             MIN(struct_pack(d := d, clabel := clabel)).clabel AS pred_label
      FROM dist GROUP BY vec_id, label
    ), per_true AS (
      SELECT true_label AS label, COUNT(*) AS n_true,
             SUM(CASE WHEN pred_label = true_label THEN 1 ELSE 0 END) AS tp
      FROM pred GROUP BY true_label
    ), per_pred AS (
      SELECT pred_label AS label, COUNT(*) AS n_pred FROM pred GROUP BY pred_label
    )
    SELECT t.label, CAST(n_true AS BIGINT) AS n_true,
           CAST(COALESCE(n_pred, 0) AS BIGINT) AS n_pred,
           CAST(tp AS BIGINT) AS tp,
           round(tp * 1.0 / n_pred, 6) AS precision,
           round(tp * 1.0 / n_true, 6) AS recall,
           round(2.0 * tp / (n_true + COALESCE(n_pred, 0)), 6) AS f1
    FROM per_true t LEFT JOIN per_pred p ON t.label = p.label
    ORDER BY t.label
    """,
)
def ml_confusion_metrics(spark, sf_dir):
    """Per-class precision/recall/F1 of a nearest-centroid classifier on
    the held-out fifth of the embedding table (train = vec_id % 5 ≠ 4,
    the llm_cross_entropy_heldout split discipline) — the eval table
    every classification pipeline publishes, here with the classifier
    AND the metrics inside the engine so the whole loop is one audited
    query. Centroids are 6-dp-quantized integer means rounded half-up in
    pure integer arithmetic ((2·Σq+n) div (2n), on shifted nonnegative
    values — see _CENTROID_SHIFT), so prediction = argmin of an exact
    integer distance with (distance, label) tie order: bit-identical
    everywhere. F1 comes from exact counts (2tp/(n_true+n_pred)), not
    from the rounded P/R.

    Plan at 100 TB: the train pass is one (label, dim)-keyed agg with
    map-side combine → a 640-row centroid table that BROADCASTS into the
    eval stream's dim-join; the 10× label fan-out happens on the already-
    exploded dim rows and immediately folds back to (vec, label) — no
    corpus × corpus anything. The final tables are label-domain-sized."""
    e = load_table(spark, sf_dir, "embeddings")
    q = e.select(
        "vec_id",
        "label",
        F.posexplode(
            F.expr(
                "transform(embedding, v ->"
                f" CAST(round(v * 1000000, 0) AS BIGINT) + {_CENTROID_SHIFT})"
            )
        ).alias("dim", "qs"),
    )
    cent = (
        q.filter(F.col("vec_id") % 5 != 4)
        .groupBy(F.col("label").alias("clabel"), "dim")
        .agg(
            F.expr("(2 * SUM(qs) + COUNT(*)) div (2 * COUNT(*))").alias("c")
        )
    )
    ev = q.filter(F.col("vec_id") % 5 == 4)
    dist = (
        ev.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "label", "clabel")
        .agg(F.sum((F.col("qs") - F.col("c")) * (F.col("qs") - F.col("c"))).alias("d"))
    )
    pred = dist.groupBy("vec_id", F.col("label").alias("true_label")).agg(
        F.min(F.struct("d", "clabel")).getField("clabel").alias("pred_label")
    )
    per_true = pred.groupBy(F.col("true_label").alias("label")).agg(
        F.count("*").alias("n_true"),
        F.sum(
            F.when(F.col("pred_label") == F.col("true_label"), 1).otherwise(0)
        ).alias("tp"),
    )
    per_pred = pred.groupBy(F.col("pred_label").alias("label")).agg(
        F.count("*").alias("n_pred")
    )
    return (
        per_true.join(per_pred, "label", "left")
        .select(
            "label",
            F.col("n_true").cast("long").alias("n_true"),
            F.coalesce(F.col("n_pred"), F.lit(0)).cast("long").alias("n_pred"),
            F.col("tp").cast("long").alias("tp"),
            F.round(F.col("tp") / F.col("n_pred"), 6).alias("precision"),
            F.round(F.col("tp") / F.col("n_true"), 6).alias("recall"),
            F.round(
                2.0 * F.col("tp") / (F.col("n_true") + F.coalesce(F.col("n_pred"), F.lit(0))),
                6,
            ).alias("f1"),
        )
        .orderBy("label")
    )
