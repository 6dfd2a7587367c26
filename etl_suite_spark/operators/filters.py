"""Projection / filter / dedup operators (SURVEY.md §2.2).

Reference analog: the type-coercion, column-derivation, and
checkpoint-window extraction passes of the ETL-suite transforms (SURVEY
§0.1 [K]). All pure narrow transformations — no shuffle except the dedup
idioms — so they pipeline inside one whole-stage-codegen span and filters
push down to the parquet scan (verified in tests via explain()).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query

# --- derived columns -------------------------------------------------------


@query(
    "project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * l_extendedprice AS qty_price
    FROM lineitem
    """,
)
def project_compute(spark, sf_dir):
    # Per-row IEEE double math is deterministic given identical operand
    # order — safe without the decimal discipline (no aggregation).
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rev.alias("revenue"),
        (rev * (F.lit(1) + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * F.col("l_extendedprice")).alias("qty_price"),
    )


@query(
    "project_alias_cast",
    oracle="""
    SELECT p_partkey AS partkey,
           CAST(p_size AS DOUBLE) AS size_dbl,
           CAST(p_size AS VARCHAR) AS size_str,
           CAST(p_partkey AS INTEGER) AS partkey_int,
           upper(p_brand) AS brand_uc
    FROM part
    """,
)
def project_alias_cast(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.col("p_size").cast("double").alias("size_dbl"),
        F.col("p_size").cast("string").alias("size_str"),
        F.col("p_partkey").cast("int").alias("partkey_int"),
        F.upper("p_brand").alias("brand_uc"),
    )


@query(
    "project_case_when",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'high' END AS price_band,
           CASE o_orderstatus WHEN 'F' THEN 'finished'
                              WHEN 'O' THEN 'open'
                              ELSE 'partial' END AS status_name
    FROM orders
    """,
)
def project_case_when(spark, sf_dir):
    # ref analog: tier labeling of accounts/miners (SURVEY §2.2 [K])
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 200000, "mid")
        .otherwise("high")
        .alias("price_band"),
        F.when(F.col("o_orderstatus") == "F", "finished")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("partial")
        .alias("status_name"),
    )


# --- filters ---------------------------------------------------------------


@query(
    "filter_pred",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
    FROM lineitem
    WHERE ((l_quantity > 30) AND (l_discount <= 0.05))
       OR ((l_returnflag = 'R') AND (l_quantity < 5))
    """,
)
def filter_pred(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") <= 0.05)) | (
        (F.col("l_returnflag") == "R") & (F.col("l_quantity") < 5)
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@query(
    "filter_between_dates",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1997-01-01' AND TIMESTAMP '1997-12-31'
    """,
)
def filter_between_dates(spark, sf_dir):
    # ref analog: checkpoint-window extraction `ts >= lo AND ts < hi` [K]
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_shipdate").between(
            F.lit("1997-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    ).select("l_orderkey", "l_linenumber", "l_shipdate")


@query(
    "filter_null_handling",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           NULLIF(l_discount, 0.0) AS disc_or_null,
           COALESCE(NULLIF(l_discount, 0.0), -1.0) AS disc_coalesced,
           (NULLIF(l_tax, 0.0) IS NULL) AS tax_is_zero,
           (NULLIF(l_tax, 0.0) IS NOT NULL) AS tax_nonzero
    FROM lineitem
    """,
)
def filter_null_handling(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    disc_null = F.nullif(F.col("l_discount"), F.lit(0.0))
    tax_null = F.nullif(F.col("l_tax"), F.lit(0.0))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_null.alias("disc_or_null"),
        F.coalesce(disc_null, F.lit(-1.0)).alias("disc_coalesced"),
        tax_null.isNull().alias("tax_is_zero"),
        tax_null.isNotNull().alias("tax_nonzero"),
    )


@query(
    "filter_like_regex",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE (p_type LIKE '%ECO%')
       OR (p_name LIKE 'red %')
       OR regexp_matches(p_name, '^(blue|hot) (bolt|gear)$')
    """,
)
def filter_like_regex(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    cond = (
        F.col("p_type").like("%ECO%")
        | F.col("p_name").like("red %")
        | F.col("p_name").rlike("^(blue|hot) (bolt|gear)$")
    )
    return p.filter(cond).select("p_partkey", "p_name", "p_type")


# --- dedup idioms ----------------------------------------------------------


@query(
    "dedup_distinct",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def dedup_distinct(spark, sf_dir):
    # full-row distinct = one hash-aggregate shuffle; partial agg makes it
    # cheap map-side first (same plan shape at 100 TB).
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "dedup_by_key_latest",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def dedup_by_key_latest(spark, sf_dir):
    """Upsert idiom: newest row per key (ref: idempotent window reload [K]).

    One shuffle on the key; at 100 TB this is the canonical merge step of
    every incremental pipeline, so the window ORDER BY carries a unique
    tiebreaker (event_id) to make output deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@query(
    "sample_fraction",
    oracle="""
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE substring(md5(concat(CAST(l_orderkey AS VARCHAR), '-',
                               CAST(l_linenumber AS VARCHAR))), 1, 2) < '1a'
    """,
)
def sample_fraction(spark, sf_dir):
    """Deterministic ~10% sample via content hashing (md5-prefix bucket,
    26/256 ≈ 10.2%): the reproducible-sampling discipline a training
    pipeline needs — the same rows are sampled on every engine, every
    rerun, every cluster size, and membership is decidable per-row with
    no RNG state. ``df.sample(fraction, seed)`` remains the statistical
    variant (Bernoulli per partition — seed-stable within Spark but not
    portable across engines; pinned in tests/test_sources.py)."""
    li = load_table(spark, sf_dir, "lineitem")
    key = F.concat_ws(
        "-", F.col("l_orderkey").cast("string"), F.col("l_linenumber").cast("string")
    )
    return li.filter(F.substring(F.md5(key), 1, 2) < "1a").select(
        "l_orderkey", "l_linenumber"
    )


@query(
    "filter_null_safe_eq",
    oracle="""
    SELECT a.o_orderkey,
           NULLIF(a.o_orderstatus, 'O') IS NOT DISTINCT FROM
             NULLIF(b.o_orderpriority, '1-URGENT') AS ns_eq
    FROM orders a JOIN orders b ON a.o_orderkey = b.o_orderkey
    """,
)
def filter_null_safe_eq(spark, sf_dir):
    """Null-safe equality (<=> / IS NOT DISTINCT FROM): NULL compares equal
    to NULL, the semantics every merge/upsert key comparison needs (a plain
    = would return NULL and silently drop NULL-keyed rows from a match).
    NULLIF manufactures NULLs on both sides so all four truth-table cells
    are exercised."""
    o = load_table(spark, sf_dir, "orders")
    a = o.select("o_orderkey", F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("ca"))
    b = o.select(
        "o_orderkey",
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("cb"),
    )
    return a.join(b, "o_orderkey").select(
        "o_orderkey", F.col("ca").eqNullSafe(F.col("cb")).alias("ns_eq")
    )
