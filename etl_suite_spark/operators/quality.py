"""Data-quality checks — the validation layer every ETL suite ships
(reference analog: ad-hoc sanity checks in transform code, SURVEY §0.1 [K];
here formalized the way dbt/Great Expectations/Deequ shape them).

A check is a named rule over one table; ``run_checks`` evaluates a list of
them in ONE pass per table (all rules become conditional counts in a
single aggregation — no per-rule scans) and returns a violations report.
At 100 TB that one-pass property is the difference between a DQ gate you
run on every load and one you can't afford.

Rule kinds:
- not_null:        column must have no NULLs
- unique:          column must have no duplicate values
- accepted_values: column values ⊆ a declared set
- range:           numeric column within [lo, hi]
- ref_integrity:   every FK value exists in the referenced table (needs a
                   join, so it's evaluated separately from the one-pass
                   aggregate rules)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..core import d2d
from ..io import load_table
from ..registry import query


def run_checks(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate aggregate rules in one pass; returns
    (check, column, violations, total, passed)."""
    total = F.count(F.lit(1))
    exprs = []
    for r in rules:
        kind, col = r["kind"], r["column"]
        if kind == "not_null":
            bad = F.count(F.when(F.col(col).isNull(), 1))
        elif kind == "unique":
            bad = total - F.countDistinct(col) - F.count(F.when(F.col(col).isNull(), 1))
        elif kind == "accepted_values":
            bad = F.count(F.when(~F.col(col).isin(*r["values"]), 1))
        elif kind == "range":
            bad = F.count(
                F.when((F.col(col) < r["lo"]) | (F.col(col) > r["hi"]), 1)
            )
        else:
            raise ValueError(f"unknown aggregate rule kind: {kind}")
        exprs.append(bad.cast("long").alias(f"{kind}:{col}"))
    exprs.append(total.cast("long").alias("__total"))
    row = df.agg(*exprs).collect()[0]
    spark = df.sparkSession
    out = [
        (name.split(":", 1)[0], name.split(":", 1)[1], int(row[name]), int(row["__total"]))
        for name in row.asDict()
        if name != "__total"
    ]
    return spark.createDataFrame(
        [(k, c, v, t, v == 0) for k, c, v, t in out],
        "check STRING, column STRING, violations BIGINT, total BIGINT, passed BOOLEAN",
    )


def check_ref_integrity(
    child: DataFrame, fk: str, parent: DataFrame, pk: str
) -> tuple[int, int]:
    """(orphan_count, total): child rows whose FK has no parent. Anti-join
    on the key — one shuffle, or map-only when the parent broadcasts."""
    orphans = child.join(parent.select(F.col(pk).alias(fk)), fk, "left_anti").count()
    return orphans, child.count()


@query(
    "dq_checks",
    oracle="""
    SELECT 'not_null' AS check, 'o_orderkey' AS column,
           COUNT(*) FILTER (WHERE o_orderkey IS NULL) AS violations,
           COUNT(*) AS total FROM orders
    UNION ALL
    SELECT 'unique', 'o_orderkey',
           COUNT(*) - COUNT(DISTINCT o_orderkey)
             - COUNT(*) FILTER (WHERE o_orderkey IS NULL),
           COUNT(*) FROM orders
    UNION ALL
    SELECT 'accepted_values', 'o_orderstatus',
           COUNT(*) FILTER (WHERE o_orderstatus NOT IN ('O','F','P')),
           COUNT(*) FROM orders
    UNION ALL
    SELECT 'range', 'o_totalprice',
           COUNT(*) FILTER (WHERE o_totalprice < 0 OR o_totalprice > 1000000),
           COUNT(*) FROM orders
    UNION ALL
    SELECT 'ref_integrity', 'o_custkey',
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey)),
           COUNT(*) FROM orders
    """,
)
def dq_checks(spark, sf_dir):
    """The DQ gate over orders: four one-pass aggregate rules plus FK
    integrity against customer. All checks pass on the fixtures — the
    interesting output is the report shape and the one-scan plan."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    report = run_checks(
        o,
        [
            {"kind": "not_null", "column": "o_orderkey"},
            {"kind": "unique", "column": "o_orderkey"},
            {"kind": "accepted_values", "column": "o_orderstatus", "values": ["O", "F", "P"]},
            {"kind": "range", "column": "o_totalprice", "lo": 0, "hi": 1_000_000},
        ],
    )
    orphans, total = check_ref_integrity(o, "o_custkey", c, "c_custkey")
    ref_row = spark.createDataFrame(
        [("ref_integrity", "o_custkey", orphans, total, orphans == 0)],
        report.schema,
    )
    return report.unionByName(ref_row).select("check", "column", "violations", "total")


# --- entity resolution -------------------------------------------------------

_DIRTY_NAME_SPARK = (
    "CASE WHEN c_custkey % 7 = 0 THEN "
    " concat(substring(c_name, 1, length(c_name) - 2), "
    "        substring(c_name, length(c_name), 1), "
    "        substring(c_name, length(c_name) - 1, 1)) "
    "WHEN c_custkey % 7 = 1 THEN concat(c_name, 'x') "
    "ELSE c_name END"
)
_DIRTY_NAME_DUCK = (
    "CASE WHEN c_custkey % 7 = 0 THEN "
    " concat(substring(c_name, 1, length(c_name) - 2), "
    "        substring(c_name, length(c_name), 1), "
    "        substring(c_name, length(c_name) - 1, 1)) "
    "WHEN c_custkey % 7 = 1 THEN concat(c_name, 'x') "
    "ELSE c_name END"
)


@query(
    "er_blocking_match",
    oracle=f"""
    WITH dirty AS (
      SELECT c_custkey AS dirty_key, c_nationkey,
             {_DIRTY_NAME_DUCK} AS name
      FROM customer WHERE c_custkey % 2 = 0
    ),
    clean AS (
      SELECT c_custkey AS clean_key, c_nationkey, c_name AS name
      FROM customer WHERE c_custkey % 2 = 0
    )
    SELECT d.dirty_key, c.clean_key,
           CAST(levenshtein(d.name, c.name) AS BIGINT) AS dist
    FROM dirty d
    JOIN clean c
      ON d.c_nationkey = c.c_nationkey
     AND substring(d.name, 1, 12) = substring(c.name, 1, 12)
    WHERE levenshtein(d.name, c.name) <= 2
      AND d.dirty_key <> c.clean_key OR
          (d.dirty_key = c.clean_key AND levenshtein(d.name, c.name) = 0)
    """,
)
def er_blocking_match(spark, sf_dir):
    """Entity resolution: blocking + edit-distance verification.

    One record set carries deterministic typos (transposed tail chars /
    appended char on a key-derived subset); matching joins ONLY within a
    blocking key (nation × 12-char name prefix) and verifies candidates
    with levenshtein ≤ 2. The blocking join is the whole scale story: an
    all-pairs name comparison is O(n²) and impossible at 100 TB, while
    blocking bounds candidates per block — same shape as the LSH-band
    candidate join in `llm_dedup_minhash` (blocking keys ARE an LSH for
    edit distance). Self-match rows (dist=0) are kept as the sanity floor.
    """
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 2 == 0)
    dirty = c.select(
        F.col("c_custkey").alias("dirty_key"),
        "c_nationkey",
        F.expr(_DIRTY_NAME_SPARK).alias("name"),
    )
    clean = c.select(
        F.col("c_custkey").alias("clean_key"),
        "c_nationkey",
        F.col("c_name").alias("name"),
    )
    d, cl = dirty.alias("d"), clean.alias("cl")
    cand = d.join(
        cl,
        (F.col("d.c_nationkey") == F.col("cl.c_nationkey"))
        & (F.substring(F.col("d.name"), 1, 12) == F.substring(F.col("cl.name"), 1, 12)),
    )
    dist = F.levenshtein(F.col("d.name"), F.col("cl.name"))
    return cand.filter(
        ((dist <= 2) & (F.col("dirty_key") != F.col("clean_key")))
        | ((F.col("dirty_key") == F.col("clean_key")) & (dist == 0))
    ).select("dirty_key", "clean_key", dist.cast("long").alias("dist"))


@query(
    "dq_key_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT l_suppkey AS key, COUNT(*) AS n
      FROM lineitem GROUP BY l_suppkey
    ),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
             CAST(SUM(n) AS BIGINT) AS n_rows,
             CAST(MAX(n) AS BIGINT) AS max_key_rows,
             round(AVG(n), 6) AS avg_key_rows
      FROM per_key
    )
    SELECT n_keys, n_rows, max_key_rows, avg_key_rows,
           round(max_key_rows / avg_key_rows, 6) AS skew_factor,
           CAST((SELECT COUNT(*) FROM per_key, stats s2
                 WHERE n > 2 * s2.n_rows / s2.n_keys) AS BIGINT)
             AS n_hot_keys
    FROM stats
    """,
)
def dq_key_skew_report(spark, sf_dir):
    """Join-key skew diagnostic: per-key cardinality profile of a
    prospective shuffle key (max/avg ratio = skew factor; hot keys =
    >2× mean). This is the measurement you run BEFORE choosing between
    plain shuffle, AQE skew-join, and `join_salted_skew` — at 100 TB a
    skew factor in the hundreds means one straggler task runs for hours.
    One aggregation over the fact table + a scalar profile; cost is one
    shuffle on the candidate key (which you were about to pay anyway)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_key = li.groupBy(F.col("l_suppkey").alias("key")).agg(F.count("*").alias("n"))
    stats = per_key.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.sum("n").cast("long").alias("n_rows"),
        F.max("n").cast("long").alias("max_key_rows"),
        F.round(F.avg("n"), 6).alias("avg_key_rows"),
    )
    hot = (
        per_key.join(F.broadcast(stats), F.lit(True))
        .filter(F.col("n") > 2 * F.col("n_rows") / F.col("n_keys"))
        .agg(F.count("*").cast("long").alias("n_hot_keys"))
    )
    return stats.join(F.broadcast(hot), F.lit(True)).select(
        "n_keys",
        "n_rows",
        "max_key_rows",
        "avg_key_rows",
        F.round(F.col("max_key_rows") / F.col("avg_key_rows"), 6).alias("skew_factor"),
        "n_hot_keys",
    )


@query(
    "dq_profile",
    oracle="""
    SELECT 'o_orderkey' AS column_name,
           CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
           CAST(MAX(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*) - COUNT(o_custkey),
           COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*) - COUNT(o_orderstatus),
           COUNT(DISTINCT o_orderstatus),
           CAST(MIN(o_orderstatus) AS VARCHAR),
           CAST(MAX(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*) - COUNT(o_totalprice),
           COUNT(DISTINCT o_totalprice),
           CAST(CAST(MIN(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR),
           CAST(CAST(MAX(o_totalprice) AS DECIMAL(18,2)) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', COUNT(*) - COUNT(o_orderdate),
           COUNT(DISTINCT o_orderdate),
           CAST(CAST(MIN(o_orderdate) AS DATE) AS VARCHAR),
           CAST(CAST(MAX(o_orderdate) AS DATE) AS VARCHAR)
    FROM orders
    ORDER BY column_name
    """,
)
def dq_profile(spark, sf_dir):
    """One-pass column profiler — null counts, distinct cardinality, and
    min/max per column, emitted in long form. The first thing an ETL
    suite runs against an unknown feed (and the stats a cost-based
    optimizer or partition planner feeds on).

    Plan shape: ONE aggregate over ONE scan computes every column's
    stats simultaneously (count/min/max fold map-side; the multi-column
    COUNT(DISTINCT ...) set plans as Spark's Expand strategy — one extra
    pass over in-memory rows, not extra scans), then a tiny literal-array
    explode reshapes 1×N scalars into N rows. The DuckDB oracle's 5-way
    UNION ALL re-reads the view per column; the Spark plan deliberately
    does not. At 100 TB swap the exact COUNT(DISTINCT) for
    approx_count_distinct — same plan minus the Expand (documented, not
    silently substituted: the oracle pins exact semantics)."""
    o = load_table(spark, sf_dir, "orders")
    stats = o.agg(
        F.count("*").alias("n"),
        *[
            x
            for c in ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"]
            for x in (
                F.count(c).alias(f"nn_{c}"),
                F.count_distinct(c).alias(f"nd_{c}"),
                F.min(c).cast("string").alias(f"mn_{c}"),
                F.max(c).cast("string").alias(f"mx_{c}"),
            )
        ],
    )

    def col_struct(c, mn=None, mx=None):
        return F.struct(
            F.lit(c).alias("column_name"),
            (F.col("n") - F.col(f"nn_{c}")).alias("n_nulls"),
            F.col(f"nd_{c}").alias("n_distinct"),
            (mn if mn is not None else F.col(f"mn_{c}")).alias("min_value"),
            (mx if mx is not None else F.col(f"mx_{c}")).alias("max_value"),
        )

    price_mn = F.col("mn_o_totalprice").cast("decimal(18,2)").cast("string")
    price_mx = F.col("mx_o_totalprice").cast("decimal(18,2)").cast("string")
    # the loader reads o_orderdate as timestamp; profile it as the DATE it
    # semantically is (oracle casts likewise)
    date_mn = F.col("mn_o_orderdate").cast("timestamp").cast("date").cast("string")
    date_mx = F.col("mx_o_orderdate").cast("timestamp").cast("date").cast("string")
    return (
        stats.select(
            F.explode(
                F.array(
                    col_struct("o_orderkey"),
                    col_struct("o_custkey"),
                    col_struct("o_orderstatus"),
                    col_struct("o_totalprice", price_mn, price_mx),
                    col_struct("o_orderdate", date_mn, date_mx),
                )
            ).alias("p")
        )
        .select("p.*")
        .orderBy("column_name")
    )


# Two deterministic "snapshots" of orders derived from the fixture: the new
# snapshot drops keys ≡0 (mod 101), adds shifted keys, and reprices keys
# ≡0 (mod 97). Same expressions on both engines — the diff logic below is
# the production path, the snapshot synthesis is fixture plumbing.
_SNAP_PRED_DROP = "o_orderkey % 101 = 0"
_SNAP_PRED_REPRICE = "o_orderkey % 97 = 0"


@query(
    "dq_snapshot_diff",
    oracle=f"""
    WITH old AS (
      SELECT o_orderkey AS key, o_totalprice AS price, o_orderstatus AS status
      FROM orders
    ), new AS (
      SELECT o_orderkey AS key,
             CASE WHEN {_SNAP_PRED_REPRICE}
                  THEN round(o_totalprice * 1.1, 2) ELSE o_totalprice END AS price,
             o_orderstatus AS status
      FROM orders WHERE NOT ({_SNAP_PRED_DROP})
      UNION ALL
      SELECT o_orderkey + 20000000, o_totalprice, 'O'
      FROM orders WHERE o_orderkey % 103 = 0
    )
    SELECT CASE WHEN o.key IS NULL THEN 'added'
                WHEN n.key IS NULL THEN 'removed'
                WHEN o.price <> n.price OR o.status <> n.status THEN 'changed'
                ELSE 'unchanged' END AS change_kind,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(COALESCE(o.key, n.key)) AS BIGINT) AS min_key,
           CAST(MAX(COALESCE(o.key, n.key)) AS BIGINT) AS max_key
    FROM old o FULL OUTER JOIN new n ON o.key = n.key
    GROUP BY 1 ORDER BY 1
    """,
)
def dq_snapshot_diff(spark, sf_dir):
    """Snapshot diff — classify every key as added / removed / changed /
    unchanged between two table versions (the data-diff every warehouse
    migration, backfill audit, and CDC validation runs). ONE full outer
    equi-join on the key plus a column comparison; at 100 TB both sides
    shuffle once on the key (or zero times if both snapshots are
    bucketed by it), and the comparison can restrict to a hash of the
    compared columns to cut shuffle width. The report aggregates to one
    row per change kind; the keyed row-level diff is the same plan minus
    the final groupBy."""
    o = load_table(spark, sf_dir, "orders")
    old = o.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    new = (
        o.filter(f"NOT ({_SNAP_PRED_DROP})")
        .select(
            F.col("o_orderkey").alias("key"),
            F.expr(
                f"CASE WHEN {_SNAP_PRED_REPRICE}"
                " THEN round(o_totalprice * 1.1, 2) ELSE o_totalprice END"
            ).alias("price"),
            F.col("o_orderstatus").alias("status"),
        )
        .unionByName(
            o.filter("o_orderkey % 103 = 0").select(
                (F.col("o_orderkey") + 20000000).alias("key"),
                F.col("o_totalprice").alias("price"),
                F.lit("O").alias("status"),
            )
        )
    )
    on, nn = old.alias("o"), new.alias("n")
    j = on.join(nn, F.col("o.key") == F.col("n.key"), "full_outer")
    kind = (
        F.when(F.col("o.key").isNull(), "added")
        .when(F.col("n.key").isNull(), "removed")
        .when(
            (F.col("o.price") != F.col("n.price"))
            | (F.col("o.status") != F.col("n.status")),
            "changed",
        )
        .otherwise("unchanged")
    )
    return (
        j.groupBy(kind.alias("change_kind"))
        .agg(
            F.count("*").alias("n_rows"),
            F.min(F.coalesce("o.key", "n.key")).alias("min_key"),
            F.max(F.coalesce("o.key", "n.key")).alias("max_key"),
        )
        .orderBy("change_kind")
    )


@query(
    "dq_benford",
    oracle="""
    WITH pos AS (
      SELECT o_totalprice AS v FROM orders WHERE o_totalprice > 0
    ), d AS (
      SELECT CAST(floor(v / power(10, floor(log10(v)))) AS BIGINT) AS digit
      FROM pos
    ), obs AS (
      SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY digit
    ), tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs)
    SELECT digit, n,
           round(n * 1.0 / total, 6) AS observed_share,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_share,
           round(abs(n * 1.0 / total - log10(1.0 + 1.0 / digit)), 6)
             AS abs_deviation
    FROM obs CROSS JOIN tot
    """,
)
def dq_benford(spark, sf_dir):
    """Benford's-law first-digit profile of a monetary column — the
    classic data-quality / fraud screen: naturally occurring amounts
    follow P(d) = log10(1 + 1/d), and a synthetic or tampered feed
    deviates. Emits per-digit observed vs expected share and the
    absolute deviation (the fixture's uniform synthetic prices SHOULD
    deviate — the op measures, thresholds are the consumer's policy).

    Plan: leading digit via floor(v / 10^floor(log10 v)) — pure codegen
    math, no string casts; one 9-key groupBy with map-side combine; the
    total rides along as a broadcast single-row join. Scale-trivial."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    d = o.select(
        F.floor(
            F.col("o_totalprice")
            / F.pow(F.lit(10.0), F.floor(F.log10("o_totalprice")))
        )
        .cast("long")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count("*").alias("n"))
    tot = F.broadcast(obs.agg(F.sum("n").alias("total")))
    share = F.col("n") / F.col("total")
    benford = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    return obs.crossJoin(tot).select(
        "digit",
        "n",
        F.round(share, 6).alias("observed_share"),
        F.round(benford, 6).alias("benford_share"),
        F.round(F.abs(share - benford), 6).alias("abs_deviation"),
    )


@query(
    "dq_outlier_iqr",
    oracle="""
    WITH stats AS (
      SELECT o_orderpriority,
             round(CAST(percentile_cont(0.25)
                   WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 6) AS q1,
             round(CAST(percentile_cont(0.75)
                   WITHIN GROUP (ORDER BY o_totalprice) AS DOUBLE), 6) AS q3
      FROM orders GROUP BY o_orderpriority
    ), fenced AS (
      SELECT o_orderpriority, q1, q3,
             round(q1 - 1.5 * (q3 - q1), 6) AS lo_fence,
             round(q3 + 1.5 * (q3 - q1), 6) AS hi_fence
      FROM stats
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           f.q1, f.q3, f.lo_fence, f.hi_fence,
           CAST(SUM(CASE WHEN o.o_totalprice < f.lo_fence
                         OR o.o_totalprice > f.hi_fence
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           round(SUM(CASE WHEN o.o_totalprice < f.lo_fence
                          OR o.o_totalprice > f.hi_fence
                     THEN 1.0 ELSE 0.0 END) / COUNT(*), 6) AS outlier_frac
    FROM orders o JOIN fenced f USING (o_orderpriority)
    GROUP BY o.o_orderpriority, f.q1, f.q3, f.lo_fence, f.hi_fence
    """,
)
def dq_outlier_iqr(spark, sf_dir):
    """Tukey-fence (1.5 × IQR) outlier screen per group — the standard
    box-plot outlier rule, complementing win_anomaly_mad (MAD flags
    point anomalies on time-ordered data; IQR profiles a static column's
    tail mass per segment). Exact interpolated quartiles on both engines
    (the agg_percentile discipline); the fences are ROUNDED TO 6 DP
    BEFORE comparison on both sides so an ulp-level interpolation
    difference cannot flip a data point sitting exactly on a fence —
    the values compared against them are exact 2-dp money.

    Scale shape: two passes over orders — one percentile aggregation
    onto the tiny priority domain, then the 5-row fence table joins back
    BROADCAST for the outlier count (never a shuffle of the fact side);
    both aggregations combine map-side. The exact percentile is sort-
    based per group; at 100 TB swap stage one to approx_percentile
    (GK sketch — agg_approx_percentile documents the measured error) and
    keep stage two unchanged."""
    o = load_table(spark, sf_dir, "orders")
    stats = o.groupBy("o_orderpriority").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.25)), 6).alias("q1"),
        F.round(F.percentile("o_totalprice", F.lit(0.75)), 6).alias("q3"),
    )
    fenced = stats.select(
        "o_orderpriority",
        "q1",
        "q3",
        F.round(F.col("q1") - 1.5 * (F.col("q3") - F.col("q1")), 6).alias(
            "lo_fence"
        ),
        F.round(F.col("q3") + 1.5 * (F.col("q3") - F.col("q1")), 6).alias(
            "hi_fence"
        ),
    )
    out = F.when(
        (F.col("o_totalprice") < F.col("lo_fence"))
        | (F.col("o_totalprice") > F.col("hi_fence")),
        1,
    ).otherwise(0)
    return (
        o.join(F.broadcast(fenced), "o_orderpriority")
        .groupBy("o_orderpriority", "q1", "q3", "lo_fence", "hi_fence")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(out).cast("long").alias("n_outliers"),
            F.round(F.sum(out) / F.count("*"), 6).alias("outlier_frac"),
        )
        .select(
            "o_orderpriority",
            "n",
            "q1",
            "q3",
            "lo_fence",
            "hi_fence",
            "n_outliers",
            "outlier_frac",
        )
    )


@query(
    "dq_cross_table_rule",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations,
           round(SUM(CASE WHEN l_shipdate < o_orderdate THEN 1.0 ELSE 0.0 END)
                 / COUNT(*), 6) AS violation_frac,
           MIN(CASE WHEN l_shipdate < o_orderdate THEN l_orderkey END)
             AS first_bad_orderkey
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def dq_cross_table_rule(spark, sf_dir):
    """Cross-table consistency rule — "a line item cannot ship before
    its order was placed" — the referential TEMPORAL check that
    single-table dq_checks rules cannot express (dq_checks validates
    columns in isolation; real DQ suites pair those with cross-table
    invariants exactly like this). Reports per-segment violation counts,
    rate, and the smallest offending order key as the debugging anchor.

    Scale shape: one equi-join on the orderkey (the tables' natural
    co-partition key — at 100 TB both sides are bucketed on it and the
    join is shuffle-free), then a conditional aggregate onto the tiny
    returnflag domain with map-side combine. The violation rows
    themselves are never materialized — only counted — so a
    99%-violating table costs the same as a clean one."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    bad = F.col("l_shipdate") < F.col("o_orderdate")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").cast("long").alias("n_lines"),
            F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_violations"),
            F.round(
                F.sum(F.when(bad, 1.0).otherwise(0.0)) / F.count("*"), 6
            ).alias("violation_frac"),
            F.min(F.when(bad, F.col("l_orderkey"))).alias("first_bad_orderkey"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "dq_freshness",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS corpus_max FROM events)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MAX(ts) AS last_seen,
           CAST(date_diff('minute', MAX(ts), (SELECT corpus_max FROM mx))
                AS BIGINT) AS staleness_minutes,
           date_diff('minute', MAX(ts), (SELECT corpus_max FROM mx)) > 360
             AS is_stale
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def dq_freshness(spark, sf_dir):
    """Per-stream freshness report — the first page of every pipeline
    health dashboard: when did each event type last arrive, how stale
    is it against the newest data anywhere in the corpus, and does it
    breach the 6-hour SLA flag. Measured against the CORPUS max rather
    than wall-clock so the result is data-determined and reproducible
    (the agg_rfm/ml_churn_label discipline — a backfill re-derives the
    same report). Staleness is exact integer minutes counted as
    minute-BOUNDARY crossings — DuckDB's date_diff('minute') truncates
    both endpoints to the minute before differencing (it is not
    elapsed-60-second units), so the Spark side truncates identically;
    an elapsed-seconds floor disagreed on 3 of 5 fixture rows.

    Scale shape: one groupBy onto the tiny event-type domain with
    map-side MAX/COUNT combine; the corpus max rides along as a
    broadcast single-row join. At 100 TB this reads partition-pruned
    tail partitions only if you maintain an ingest-date layout —
    which sink_overwrite_partition demonstrates."""
    ev = load_table(spark, sf_dir, "events")
    mx = F.broadcast(ev.agg(F.max("ts").alias("corpus_max")))
    stale_min = (
        F.unix_timestamp(F.date_trunc("minute", "corpus_max"))
        - F.unix_timestamp(F.date_trunc("minute", F.col("last_seen")))
    ) / 60
    return (
        ev.groupBy("event_type")
        .agg(F.count("*").cast("long").alias("n_events"), F.max("ts").alias("last_seen"))
        .crossJoin(mx)
        .select(
            "event_type",
            "n_events",
            "last_seen",
            F.floor(stale_min).cast("long").alias("staleness_minutes"),
            (F.floor(stale_min) > 360).alias("is_stale"),
        )
        .orderBy("event_type")
    )


@query(
    "dq_volume_anomaly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1, 2
    ), w AS (
      SELECT event_type, day, n_events,
             CAST(COUNT(*) OVER tw AS BIGINT) AS baseline_days,
             CAST(SUM(n_events) OVER tw AS DOUBLE) AS s1,
             CAST(SUM(n_events * n_events) OVER tw AS DOUBLE) AS s2
      FROM daily
      WINDOW tw AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    ), z AS (
      SELECT event_type, day, n_events, baseline_days,
             CASE WHEN baseline_days >= 4
                  THEN round(s1 / baseline_days, 6) END AS baseline_mean,
             CASE WHEN baseline_days >= 4
                        AND s2 - s1 * s1 / baseline_days > 0
                  THEN round((n_events - s1 / baseline_days)
                             / sqrt((s2 - s1 * s1 / baseline_days)
                                    / (baseline_days - 1)), 6)
             END AS z_score
      FROM w
    )
    SELECT event_type, day, n_events, baseline_days, baseline_mean, z_score,
           COALESCE(ABS(z_score) > 3, FALSE) AS is_anomaly
    FROM z
    """,
)
def dq_volume_anomaly(spark, sf_dir):
    """Daily ingest-volume anomaly screen — the 'did the pipeline break
    today' check ops teams page on: each (event_type, day) row count is
    z-scored against that stream's TRAILING 7-observed-day baseline
    (rows-frame, excluding the current day so a broken day can't mask
    itself), flagged at |z| > 3. Complements dq_freshness (are rows
    arriving NOW) with did-the-right-AMOUNT-arrive; differs from
    win_anomaly_mad/win_zscore_rolling, which score individual event
    VALUES per user, not stream volumes. Rows with fewer than 4 prior
    observed days emit NULL scores (cold start — insufficient
    baseline), never a flag.

    Float discipline: the baseline mean/std come from integer power
    sums over the window (Σc, Σc² exact in both engines), so the only
    float work is the final per-row mean/z scalars, rounded to 6 dp.

    Scale shape: one (type, day) hash agg with map-side combine
    collapses the fact table to the tiny type×day domain; the trailing
    window runs per event_type over that domain (dozens of rows per
    stream), so the WindowExec input is O(days·streams), never O(rows).
    A calendar-gap day simply doesn't appear as a row — the frame is
    'trailing 7 OBSERVED days' by declaration."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count("*").cast("long").alias("n_events"))
    return volume_anomaly_from_daily(daily)


def volume_anomaly_from_daily(daily: DataFrame) -> DataFrame:
    """(event_type, day, n_events) daily counts -> per-row trailing-z
    report; see :func:`dq_volume_anomaly` for the frame semantics."""
    from pyspark.sql import Window

    tw = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    w = daily.select(
        "event_type",
        "day",
        "n_events",
        F.count("*").over(tw).cast("long").alias("baseline_days"),
        F.sum("n_events").over(tw).cast("double").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).over(tw)
        .cast("double")
        .alias("s2"),
    )
    k = F.col("baseline_days")
    mean = F.col("s1") / k
    var = (F.col("s2") - F.col("s1") * F.col("s1") / k) / (k - 1)
    z = F.when(
        (k >= 4) & (F.col("s2") - F.col("s1") * F.col("s1") / k > 0),
        F.round((F.col("n_events") - mean) / F.sqrt(var), 6),
    )
    return w.select(
        "event_type",
        "day",
        "n_events",
        "baseline_days",
        F.when(k >= 4, F.round(mean, 6)).alias("baseline_mean"),
        z.alias("z_score"),
        F.coalesce(F.abs(z) > 3, F.lit(False)).alias("is_anomaly"),
    )


@query(
    "er_golden_record",
    oracle="""
    WITH base AS (
      SELECT user_id, MIN(ts) AS first_seen, MAX(ts) AS last_seen,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             MAX(struct_pack(ts := ts, event_id := event_id,
                             event_type := event_type)) AS lat,
             MAX(CASE WHEN value IS NOT NULL
                      THEN struct_pack(ts := ts, event_id := event_id,
                                       value := value) END) AS latv
      FROM events GROUP BY user_id
    ), tc AS (
      SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), modal AS (
      SELECT user_id, MAX(struct_pack(c := c, event_type := event_type)) AS m
      FROM tc GROUP BY user_id
    )
    SELECT b.user_id, b.first_seen, b.last_seen, b.n_events,
           m.m.event_type AS modal_event_type,
           CAST(m.m.c AS BIGINT) AS modal_n,
           round(CAST(m.m.c AS DOUBLE) / b.n_events, 6) AS modal_share,
           b.lat.event_type AS latest_event_type,
           b.latv.value AS latest_value
    FROM base b JOIN modal m ON b.user_id = m.user_id
    """,
)
def er_golden_record(spark, sf_dir):
    """Survivorship / golden-record construction — the step AFTER
    er_blocking_match in every MDM pipeline: collapse each entity's
    records into ONE best row using per-ATTRIBUTE merge rules rather
    than keeping one whole row (that row-level cousin is
    dedup_by_key_latest). Rules demonstrated: recency (latest
    event_type via max(struct(ts, event_id, …)) — the unique event_id
    tiebreak pins equal timestamps), most-frequent (modal event_type,
    count ties broken deterministically toward the lexicographically
    larger value by the same struct-max idiom), latest-NON-NULL
    (latest_value merges over only the rows where the attribute is
    present — the conditional struct-max; this is what makes it
    attribute-level survivorship), and span/count provenance
    (first_seen, last_seen, n_events).

    Both engines compare structs field-by-field, so every merge rule is
    ONE deterministic aggregate — no window, no self-join, no
    row_number. Scale shape: two hash aggs keyed on user_id (one direct,
    one via the (user, type) count table) + one equi-join on user_id;
    everything map-side combines, hot users collapse before shuffle."""
    return golden_record(load_table(spark, sf_dir, "events"))


def golden_record(ev: DataFrame) -> DataFrame:
    """events-shaped (user_id, ts, event_id, event_type, value) →
    one golden row per user; see :func:`er_golden_record`."""
    base = ev.groupBy("user_id").agg(
        F.min("ts").alias("first_seen"),
        F.max("ts").alias("last_seen"),
        F.count("*").cast("long").alias("n_events"),
        F.max(F.struct("ts", "event_id", "event_type")).alias("lat"),
        F.max(
            F.when(
                F.col("value").isNotNull(),
                F.struct("ts", "event_id", "value"),
            )
        ).alias("latv"),
    )
    tc = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    modal = tc.groupBy("user_id").agg(
        F.max(F.struct("c", "event_type")).alias("m")
    )
    return base.join(modal, "user_id").select(
        "user_id",
        "first_seen",
        "last_seen",
        "n_events",
        F.col("m.event_type").alias("modal_event_type"),
        F.col("m.c").cast("long").alias("modal_n"),
        F.round(F.col("m.c").cast("double") / F.col("n_events"), 6).alias(
            "modal_share"
        ),
        F.col("lat.event_type").alias("latest_event_type"),
        F.col("latv.value").alias("latest_value"),
    )


# Declared schema contract for the orders table. Two entries deliberately
# violate reality so the check's mismatch/missing branches are exercised
# deterministically on the clean fixture: o_custkey is declared int32
# (actual int64) and o_comment is declared but absent.
_ORDERS_CONTRACT = [
    ("o_orderkey", "int64"),
    ("o_custkey", "int32"),
    ("o_orderstatus", "string"),
    ("o_totalprice", "double"),
    ("o_orderdate", "timestamp"),
    ("o_orderpriority", "string"),
    ("o_comment", "string"),
]

_CONTRACT_SQL = " UNION ALL ".join(
    f"SELECT '{c}' AS column_name, '{t}' AS expected_type"
    for c, t in _ORDERS_CONTRACT
)


@query(
    "dq_schema_contract",
    oracle=f"""
    WITH actual AS (
      SELECT column_name,
             CASE column_type
               WHEN 'BIGINT' THEN 'int64'
               WHEN 'INTEGER' THEN 'int32'
               WHEN 'DOUBLE' THEN 'double'
               WHEN 'VARCHAR' THEN 'string'
               WHEN 'TIMESTAMP' THEN 'timestamp'
               ELSE lower(column_type)
             END AS actual_type
      FROM (DESCRIBE orders)
    ), contract AS ({_CONTRACT_SQL})
    SELECT COALESCE(c.column_name, a.column_name) AS column_name,
           c.expected_type, a.actual_type,
           CASE WHEN a.column_name IS NULL THEN 'missing'
                WHEN c.column_name IS NULL THEN 'unexpected'
                WHEN c.expected_type <> a.actual_type THEN 'mismatch'
                ELSE 'ok' END AS status
    FROM contract c FULL JOIN actual a USING (column_name)
    ORDER BY column_name
    """,
)
def dq_schema_contract(spark, sf_dir):
    """Schema-contract enforcement — validate a dataset's ON-DISK schema
    against the declared contract BEFORE any job reads it: per column,
    ok / mismatch / missing / unexpected. This is the producer-consumer
    data-contract gate (the schema sibling of dq_checks' value rules);
    at 100 TB it runs against footer metadata only — no data pages are
    touched on either engine (Spark reads the merged parquet schema,
    the oracle describes the registered relation), so the check is
    milliseconds regardless of table size.

    Both engines canonicalize their native type names to one label set
    (int32/int64/double/string/timestamp) before comparing; the
    contract deliberately plants one type drift and one absent column
    so every verdict branch is exercised (see _ORDERS_CONTRACT)."""
    actual_schema = load_table(spark, sf_dir, "orders").dtypes
    canon = {"bigint": "int64", "int": "int32", "timestamp_ntz": "timestamp"}
    actual = spark.createDataFrame(
        [(c, canon.get(t, t)) for c, t in actual_schema],
        "column_name string, actual_type string",
    )
    contract = spark.createDataFrame(
        _ORDERS_CONTRACT, "column_name string, expected_type string"
    )
    return (
        contract.join(actual, "column_name", "full")
        .select(
            "column_name",
            "expected_type",
            "actual_type",
            F.when(F.col("actual_type").isNull(), "missing")
            .when(F.col("expected_type").isNull(), "unexpected")
            .when(F.col("expected_type") != F.col("actual_type"), "mismatch")
            .otherwise("ok")
            .alias("status"),
        )
        .orderBy("column_name")
    )


@query(
    "dq_psi_drift",
    oracle="""
    WITH d AS (
      SELECT o_totalprice AS price,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS t
      FROM orders
    ), split AS (
      SELECT CAST(percentile_cont(0.5) WITHIN GROUP (ORDER BY t) AS DOUBLE)
               AS tmid
      FROM d
    ), ref AS (SELECT price FROM d, split WHERE t <= tmid),
    cur AS (SELECT price FROM d, split WHERE t > tmid),
    edges AS (
      SELECT percentile_cont([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9])
               WITHIN GROUP (ORDER BY price) AS e
      FROM ref
    ), rb AS (
      SELECT len(list_filter(e, x -> price >= x)) AS bin,
             COUNT(*) AS n
      FROM ref, edges GROUP BY 1
    ), cb AS (
      SELECT len(list_filter(e, x -> price >= x)) AS bin,
             COUNT(*) AS n
      FROM cur, edges GROUP BY 1
    ), tot AS (
      SELECT (SELECT SUM(n) FROM rb) AS nr, (SELECT SUM(n) FROM cb) AS nc
    ), terms AS (
      SELECT CAST(COALESCE(rb.bin, cb.bin) AS BIGINT) AS bin,
             GREATEST(COALESCE(rb.n, 0) * 1.0 / nr, 1e-6) AS p_ref,
             GREATEST(COALESCE(cb.n, 0) * 1.0 / nc, 1e-6) AS q_cur
      FROM rb FULL JOIN cb USING (bin), tot
    )
    SELECT bin, round(p_ref, 6) AS p_ref, round(q_cur, 6) AS q_cur,
           round((q_cur - p_ref) * ln(q_cur / p_ref), 6) AS psi_term,
           round(CAST(CAST(SUM(CAST(round((q_cur - p_ref)
                                         * ln(q_cur / p_ref), 12)
                                    AS DECIMAL(18,12))) OVER ()
                      AS VARCHAR) AS DOUBLE), 6) AS psi_total
    FROM terms ORDER BY bin
    """,
)
def dq_psi_drift(spark, sf_dir):
    """Population Stability Index between the first and second half of
    the order history (split at the median order day): reference-period
    price deciles become the bins, and PSI = Σ (q−p)·ln(q/p) over them
    — THE model-monitoring drift metric (PSI < 0.1 stable, 0.1–0.25
    watch, > 0.25 shifted), complementing agg_ks_test (KS detects ANY
    gap; PSI localizes WHICH deciles moved and by how much). Empty bins
    clamp to 1e-6 share on both sides so the log stays finite — the
    standard PSI smoothing.

    Determinism: bin edges are the shared interpolated percentiles
    (identical doubles both engines), bin assignment is a count of
    exceeded edges, shares are integer-count ratios, and the total sums
    12-dp-rounded terms through a decimal accumulator.

    Plan shape: one percentile pass over the reference half, the 9-edge
    array broadcast onto both halves, two map-combined bin aggs over a
    10-row domain, and a 10-row window for the total."""
    o = load_table(spark, sf_dir, "orders")
    d = o.select(
        F.col("o_totalprice").alias("price"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")).alias(
            "t"
        ),
    )
    split = F.broadcast(d.agg(F.percentile("t", F.lit(0.5)).alias("tmid")))
    dd = d.crossJoin(split)
    ref = dd.filter(F.col("t") <= F.col("tmid")).select("price")
    cur = dd.filter(F.col("t") > F.col("tmid")).select("price")
    edges = F.broadcast(
        ref.agg(
            F.percentile(
                "price", F.array([F.lit(x / 10.0) for x in range(1, 10)])
            ).alias("e")
        )
    )
    def bins(df):
        return (
            df.crossJoin(edges)
            .select(
                F.size(F.filter("e", lambda x: F.col("price") >= x)).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count("*").alias("n"))
        )
    rb = bins(ref).select(F.col("bin"), F.col("n").alias("rn"))
    cb = bins(cur).select(F.col("bin").alias("cbin"), F.col("n").alias("cn"))
    tot = F.broadcast(
        rb.agg(F.sum("rn").alias("nr")).crossJoin(cb.agg(F.sum("cn").alias("nc")))
    )
    terms = (
        rb.join(cb, rb["bin"] == cb["cbin"], "full")
        .crossJoin(tot)
        .select(
            F.coalesce("bin", "cbin").cast("long").alias("bin"),
            F.greatest(
                F.coalesce("rn", F.lit(0)) / F.col("nr"), F.lit(1e-6)
            ).alias("p_ref"),
            F.greatest(
                F.coalesce("cn", F.lit(0)) / F.col("nc"), F.lit(1e-6)
            ).alias("q_cur"),
        )
    )
    term = (F.col("q_cur") - F.col("p_ref")) * F.log(F.col("q_cur") / F.col("p_ref"))
    return terms.select(
        "bin",
        F.round("p_ref", 6).alias("p_ref"),
        F.round("q_cur", 6).alias("q_cur"),
        F.round(term, 6).alias("psi_term"),
        F.round(
            d2d(
                F.sum(F.round(term, 12).cast("decimal(18,12)")).over(
                    Window.partitionBy()
                )
            ),
            6,
        ).alias("psi_total"),
    ).orderBy("bin")


# (table, primary-key column list) for the uniqueness audit below.
_PK_SPEC = [
    ("customer", ["c_custkey"]),
    ("documents", ["doc_id"]),
    ("embeddings", ["vec_id"]),
    ("events", ["event_id"]),
    ("lineitem", ["l_orderkey", "l_linenumber"]),
    ("nation", ["n_nationkey"]),
    ("orders", ["o_orderkey"]),
    ("part", ["p_partkey"]),
    ("region", ["r_regionkey"]),
    ("supplier", ["s_suppkey"]),
]


@query(
    "dq_duplicate_key_report",
    oracle="""
    """
    + "\nUNION ALL\n".join(
        f"""SELECT '{t}' AS table_name,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(DISTINCT ROW({", ".join(cols)})) AS BIGINT) AS n_keys,
               CAST(COUNT(*) - COUNT(DISTINCT ROW({", ".join(cols)})) AS BIGINT)
                 AS dup_rows
        FROM {t}"""
        for t, cols in _PK_SPEC
    )
    + "\nORDER BY table_name",
)
def dq_duplicate_key_report(spark, sf_dir):
    """Primary-key uniqueness audit across EVERY warehouse table in one
    report — the first page of any data-quality runbook (a nonzero
    dup_rows on an ingest table means the upstream exactly-once contract
    broke; dedup_by_key_latest / inc_dedup_ingest are the remediation
    ops this report routes to). Composite keys audited as composites
    (lineitem's (l_orderkey, l_linenumber)), not concatenations — string
    concatenation invents collisions ('1'||'11' = '11'||'1').

    NULL keys count as keys (ADVICE r7): Spark's multi-column
    count_distinct silently DROPS rows where any key column is NULL,
    while DuckDB's COUNT(DISTINCT (a, b)) counts NULL-bearing row
    structs — and a NULL primary key is exactly the defect this audit
    exists to surface, so dropping it would both diverge cross-engine
    and inflate dup_rows. Wrapping the key in struct() makes Spark
    count NULL-bearing tuples too (struct values are never NULL even
    when their fields are), matching DuckDB's row-struct semantics.

    Plan: one count + count-distinct aggregation per table (map-side
    partial on both), each a constant-size output row, unioned — the
    tables scan in parallel and nothing shuffles more than the distinct
    partials. At 100 TB this is the cheap always-on audit; per-key
    remediation is a different op."""
    parts = []
    for t, cols in _PK_SPEC:
        df = load_table(spark, sf_dir, t)
        parts.append(
            df.agg(
                F.count("*").alias("n_rows"),
                F.count_distinct(
                    F.struct(*[F.col(c) for c in cols])
                ).alias("n_keys"),
            ).select(
                F.lit(t).alias("table_name"),
                F.col("n_rows").cast("long").alias("n_rows"),
                F.col("n_keys").cast("long").alias("n_keys"),
                (F.col("n_rows") - F.col("n_keys")).cast("long").alias("dup_rows"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("table_name")
