"""Scalar function families (SURVEY.md §2.8) — one declared query per family.

All JVM-side built-ins (whole-stage codegen; no Python in the hot path).
Dialect bridges vs DuckDB, established empirically (see git history):

- DuckDB has no ``initcap`` → oracle emulates upper(first)||lower(rest).
- DuckDB ``regexp_replace`` is first-match unless the 'g' flag is given;
  Spark's replaces all → oracle always passes 'g'.
- DuckDB ``ceil/floor`` return DOUBLE (Spark: BIGINT) → both cast BIGINT.
- Spark ``dayofweek`` is 1=Sunday; DuckDB ``isodow`` is 1=Monday → we emit
  ISO weekday on both sides ((dow+5)%7+1 on Spark).
- map subscript in DuckDB yields a one-element list → oracle takes [1].
- DATE-typed outputs are avoided (pandas converts DuckDB DATE to
  midnight Timestamp but Spark DATE to datetime.date) → all date results
  are cast to TIMESTAMP on both sides.
- Transcendentals (exp/ln/log10/pow) may differ by 1 ulp across libm
  implementations → rounded to 6 dp on both sides. sqrt is IEEE-exact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..io import load_table
from ..registry import query


@query(
    "fn_string",
    oracle="""
    SELECT p_partkey,
           lower(p_name) AS lc, upper(p_name) AS uc,
           length(p_name) AS len,
           trim(concat(' ', p_name, ' ')) AS trimmed,
           ltrim(concat('  ', p_name)) AS ltrimmed,
           rtrim(concat(p_name, '  ')) AS rtrimmed,
           substring(p_name, 2, 3) AS sub23,
           concat_ws('-', p_brand, p_type) AS joined,
           array_to_string(string_split(p_name, ' '), '|') AS words,
           replace(p_name, 'a', 'X') AS replaced,
           lpad(p_brand, 12, '*') AS lpadded,
           rpad(p_brand, 12, '*') AS rpadded,
           concat(upper(left(p_type, 1)), lower(substring(p_type, 2))) AS type_initcap,
           strpos(p_name, 'e') AS pos_e,
           left(p_name, 3) AS first3,
           right(p_name, 3) AS last3,
           repeat(p_brand, 2) AS doubled,
           -- codepoint-true reverse: DuckDB reverse() works on grapheme
           -- clusters, Spark on codepoints; identical on this ASCII
           -- fixture column but the oracle is spelled to the bridge's
           -- verified codepoint domain (test_differential PAIRS)
           array_to_string(list_reverse(regexp_split_to_array(p_name, '')), '')
             AS reversed,
           translate(p_name, 'el', 'ip') AS translated
    FROM part
    """,
)
def fn_string(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    n = F.col("p_name")
    return p.select(
        "p_partkey",
        F.lower(n).alias("lc"),
        F.upper(n).alias("uc"),
        F.length(n).cast("long").alias("len"),
        F.trim(F.concat(F.lit(" "), n, F.lit(" "))).alias("trimmed"),
        F.ltrim(F.concat(F.lit("  "), n)).alias("ltrimmed"),
        F.rtrim(F.concat(n, F.lit("  "))).alias("rtrimmed"),
        F.substring(n, 2, 3).alias("sub23"),
        F.concat_ws("-", "p_brand", "p_type").alias("joined"),
        # joined back to a string: the driver canonicalizer hashes pandas
        # cells, and raw arrays arrive as unhashable numpy.ndarray
        F.array_join(F.split(n, " "), "|").alias("words"),
        F.expr("replace(p_name, 'a', 'X')").alias("replaced"),
        F.lpad("p_brand", 12, "*").alias("lpadded"),
        F.rpad("p_brand", 12, "*").alias("rpadded"),
        F.initcap("p_type").alias("type_initcap"),
        F.instr(n, "e").cast("long").alias("pos_e"),
        F.expr("left(p_name, 3)").alias("first3"),
        F.expr("right(p_name, 3)").alias("last3"),
        F.repeat("p_brand", 2).alias("doubled"),
        F.reverse(n).alias("reversed"),
        F.translate(n, "el", "ip").alias("translated"),
    )


@query(
    "fn_regexp",
    oracle="""
    SELECT p_partkey,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 1) AS word1,
           regexp_extract(p_name, '([a-z]+) ([a-z]+)', 2) AS word2,
           regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(p_name, '^[bh]') AS starts_bh
    FROM part
    """,
)
def fn_regexp(spark, sf_dir):
    # patterns restricted to the Java↔RE2 shared subset (no lookbehind)
    p = load_table(spark, sf_dir, "part")
    n = F.col("p_name")
    return p.select(
        "p_partkey",
        F.regexp_extract(n, r"([a-z]+) ([a-z]+)", 1).alias("word1"),
        F.regexp_extract(n, r"([a-z]+) ([a-z]+)", 2).alias("word2"),
        F.regexp_replace(n, r"[aeiou]", "_").alias("devoweled"),
        n.rlike(r"^[bh]").alias("starts_bh"),
    )


@query(
    "fn_date",
    oracle="""
    SELECT event_id,
           CAST(year(ts) AS BIGINT) AS yr,
           CAST(month(ts) AS BIGINT) AS mo,
           CAST(day(ts) AS BIGINT) AS dy,
           CAST(hour(ts) AS BIGINT) AS hr,
           CAST(minute(ts) AS BIGINT) AS mi,
           CAST(second(ts) AS BIGINT) AS sec,
           CAST(date_trunc('day', ts) AS TIMESTAMP) AS day_start,
           date_trunc('hour', ts) AS hour_start,
           CAST(date_trunc('week', ts) AS TIMESTAMP) AS week_start,
           CAST(CAST(ts AS DATE) + 30 AS TIMESTAMP) AS plus30,
           date_diff('day', CAST(ts AS DATE), DATE '2024-06-01') AS days_to_jun,
           CAST(last_day(ts) AS TIMESTAMP) AS month_end,
           CAST(isodow(ts) AS BIGINT) AS iso_weekday,
           CAST(weekofyear(ts) AS BIGINT) AS week_no,
           CAST(floor(epoch(ts)) AS BIGINT) AS epoch_sec,
           CAST(make_date(2030, CAST(month(ts) AS INTEGER), CAST(day(ts) AS INTEGER)) AS TIMESTAMP) AS same_day_2030
    FROM events
    """,
)
def fn_date(spark, sf_dir):
    # ref analog: per-day/period bucketing is the core of the reference's
    # aggregations (SURVEY §2.8 [K]).
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts")
    return ev.select(
        "event_id",
        F.year(ts).cast("long").alias("yr"),
        F.month(ts).cast("long").alias("mo"),
        F.dayofmonth(ts).cast("long").alias("dy"),
        F.hour(ts).cast("long").alias("hr"),
        F.minute(ts).cast("long").alias("mi"),
        F.second(ts).cast("long").alias("sec"),
        F.date_trunc("day", ts).alias("day_start"),
        F.date_trunc("hour", ts).alias("hour_start"),
        F.date_trunc("week", ts).alias("week_start"),
        F.date_add(F.to_date(ts), 30).cast("timestamp").alias("plus30"),
        F.datediff(F.lit("2024-06-01").cast("date"), F.to_date(ts))
        .cast("long")
        .alias("days_to_jun"),
        F.last_day(ts).cast("timestamp").alias("month_end"),
        (((F.dayofweek(ts) + 5) % 7) + 1).cast("long").alias("iso_weekday"),
        F.weekofyear(ts).cast("long").alias("week_no"),
        F.unix_timestamp(ts).alias("epoch_sec"),
        F.make_date(F.lit(2030), F.month(ts), F.dayofmonth(ts))
        .cast("timestamp")
        .alias("same_day_2030"),
    )


@query(
    "fn_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice / 7.0, 2) AS div_rounded,
           abs(l_discount - 0.05) AS abs_diff,
           CAST(ceil(l_extendedprice / 7.0) AS BIGINT) AS ceiled,
           CAST(floor(l_extendedprice / 7.0) AS BIGINT) AS floored,
           round(exp(l_discount), 6) AS exp6,
           round(ln(l_extendedprice), 6) AS ln6,
           round(log10(l_extendedprice), 6) AS log10_6,
           round(pow(l_discount + 1.0, 3), 6) AS pow6,
           sqrt(l_extendedprice) AS sqrt_exact,
           CAST(sign(l_discount - 0.05) AS BIGINT) AS sgn,
           greatest(l_quantity, l_discount * 100) AS biggest,
           least(l_quantity, l_discount * 100) AS smallest,
           l_orderkey % 7 AS mod7
    FROM lineitem
    """,
)
def fn_math(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    ep, disc, qty = F.col("l_extendedprice"), F.col("l_discount"), F.col("l_quantity")
    x = ep / 7.0
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(x, 2).alias("div_rounded"),
        F.abs(disc - 0.05).alias("abs_diff"),
        F.ceil(x).cast("long").alias("ceiled"),
        F.floor(x).cast("long").alias("floored"),
        F.round(F.exp(disc), 6).alias("exp6"),
        F.round(F.log(ep), 6).alias("ln6"),
        F.round(F.log10(ep), 6).alias("log10_6"),
        F.round(F.pow(disc + 1.0, 3), 6).alias("pow6"),
        F.sqrt(ep).alias("sqrt_exact"),
        F.signum(disc - 0.05).cast("long").alias("sgn"),
        F.greatest(qty, disc * 100).alias("biggest"),
        F.least(qty, disc * 100).alias("smallest"),
        (F.col("l_orderkey") % 7).alias("mod7"),
    )


@query(
    "fn_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS BIGINT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_el,
           CAST(list_aggregate(embedding, 'min') AS DOUBLE) AS el_min,
           CAST(list_aggregate(embedding, 'max') AS DOUBLE) AS el_max,
           round(list_aggregate(list_transform(embedding[1:8], x -> CAST(x AS DOUBLE)), 'sum'), 6) AS head_sum,
           CAST(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2)[2] AS DOUBLE) AS doubled_2nd,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_positive,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS sorted_first,
           CAST(len(list_distinct(embedding)) AS BIGINT) AS n_distinct
    FROM embeddings
    """,
)
def fn_array(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_el"),
        F.array_min(emb).cast("double").alias("el_min"),
        F.array_max(emb).cast("double").alias("el_max"),
        F.round(
            F.aggregate(
                F.slice(emb, 1, 8), F.lit(0.0), lambda acc, x: acc + x.cast("double")
            ),
            6,
        ).alias("head_sum"),
        F.element_at(F.transform(emb, lambda x: x.cast("double") * 2), 2)
        .cast("double")
        .alias("doubled_2nd"),
        F.size(F.filter(emb, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.element_at(F.array_sort(emb), 1).cast("double").alias("sorted_first"),
        F.size(F.array_distinct(emb)).cast("long").alias("n_distinct"),
    )


@query(
    "fn_explode",
    oracle="""
    SELECT vec_id, i AS idx, CAST(v AS DOUBLE) AS val
    FROM (SELECT vec_id, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS i
          FROM embeddings WHERE vec_id < 100)
    """,
)
def fn_explode(spark, sf_dir):
    # posexplode is 0-based; emit 1-based idx to match generate_subscripts
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    return e.select("vec_id", F.posexplode("embedding").alias("pos", "v")).select(
        "vec_id",
        (F.col("pos") + 1).cast("long").alias("idx"),
        F.col("v").cast("double").alias("val"),
    )


@query(
    "fn_map",
    oracle="""
    SELECT event_id,
           CAST(cardinality(m) AS BIGINT) AS n_keys,
           array_to_string(map_keys(m), ',') AS keys_csv,
           CAST((m['k'])[1] AS BIGINT) AS k_val
    FROM (SELECT event_id,
                 MAP {'k': CAST(props->>'$.k' AS INTEGER)} AS m
          FROM events)
    """,
)
def fn_map(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    m = F.from_json(F.col("props"), "map<string,int>")
    return ev.select(
        "event_id",
        F.size(m).cast("long").alias("n_keys"),
        F.array_join(F.map_keys(m), ",").alias("keys_csv"),
        F.element_at(m, "k").cast("long").alias("k_val"),
    )


@query(
    "fn_json",
    oracle="""
    SELECT event_id,
           props->>'$.k' AS k_str,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(to_json(struct_pack(k := CAST(json_extract(props, '$.k') AS INTEGER))) AS VARCHAR)
             AS roundtrip
    FROM events
    """,
)
def fn_json(spark, sf_dir):
    # events.props is a JSON string, e.g. {"k": 87} (FIXTURES.md)
    ev = load_table(spark, sf_dir, "events")
    k_int = F.from_json(F.col("props"), "struct<k:int>").getField("k")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").alias("k_str"),
        k_int.alias("k_int"),
        F.to_json(F.struct(k_int.alias("k"))).alias("roundtrip"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           sha256(text) AS sha,
           md5(text) AS md5_hex,
           sha256(concat(lang, ':', text)) AS salted_sha
    FROM documents
    """,
)
def fn_hash(spark, sf_dir):
    # content hashing — the foundation of llm_dedup_exact (§2.10).
    # xxhash64/crc32 are Spark-specific → covered in pytest, not declared.
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.sha2(F.col("text"), 256).alias("sha"),
        F.md5(F.col("text")).alias("md5_hex"),
        F.sha2(F.concat(F.col("lang"), F.lit(":"), F.col("text")), 256).alias(
            "salted_sha"
        ),
    )


@query(
    "fn_conditional",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'neg'
                WHEN c_acctbal < 5000 THEN 'mid'
                ELSE 'high' END AS bal_band,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 0.0) AS bal_cap0,
           (c_acctbal IS NOT NULL AND c_acctbal > 9990) AS is_vip
    FROM customer
    """,
)
def fn_conditional(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.when(bal < 0, "neg").when(bal < 5000, "mid").otherwise("high").alias("bal_band"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest(bal, F.lit(0.0)).alias("bal_floor0"),
        F.least(bal, F.lit(0.0)).alias("bal_cap0"),
        (bal.isNotNull() & (bal > 9990)).alias("is_vip"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255 AS band,
           o_orderkey | 1 AS orred,
           xor(o_orderkey, 12345) AS xored,
           o_orderkey << 2 AS shifted,
           CAST(bit_count(o_orderkey) AS BIGINT) AS popcount
    FROM orders
    """,
)
def fn_bitwise(spark, sf_dir):
    """Bitwise family — the substrate of the SimHash/banding operators,
    declared once as its own surface: and/or/xor/shift/popcount."""
    o = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(1)).alias("orred"),
        k.bitwiseXOR(F.lit(12345)).alias("xored"),
        F.expr("o_orderkey << 2").alias("shifted"),
        F.bit_count(k).cast("long").alias("popcount"),
    )


@query(
    "fn_struct_nested",
    oracle="""
    SELECT n_nationkey,
           to_json({'name': n_name, 'region': r_name}) AS nation_doc,
           {'name': n_name, 'region': r_name}.name AS extracted_name
    FROM nation JOIN region ON n_regionkey = r_regionkey
    """,
)
def fn_struct_nested(spark, sf_dir):
    """Nested struct surface: build a struct, extract a field, serialize
    to JSON — the document-shaped output path (API responses, feature
    stores). Field names sort-stably serialize the same on both engines."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    doc = F.struct(
        F.col("n_name").alias("name"), F.col("r_name").alias("region")
    )
    return (
        n.join(r, F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "n_nationkey",
            F.to_json(doc).alias("nation_doc"),
            doc.getField("name").alias("extracted_name"),
        )
    )


@query(
    "fn_interval_arith",
    oracle="""
    SELECT o_orderkey,
           o_orderdate + INTERVAL 3 DAY AS plus_days,
           o_orderdate - INTERVAL 12 HOUR AS minus_hours,
           o_orderdate + INTERVAL 2 MONTH AS plus_months
    FROM orders
    """,
)
def fn_interval_arith(spark, sf_dir):
    """Interval arithmetic on timestamps — day/hour/month offsets, the
    checkpoint-window math of every incremental job. Month addition uses
    calendar semantics (clamped day-of-month) identically on both engines."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        (d + F.expr("INTERVAL 3 DAY")).alias("plus_days"),
        (d - F.expr("INTERVAL 12 HOUR")).alias("minus_hours"),
        (d + F.expr("INTERVAL 2 MONTH")).alias("plus_months"),
    )


@query(
    "fn_array_setops",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    )
    SELECT doc_id,
           len(list_distinct(list_cat(w[1:8], w[-8:]))) AS union_size,
           len(list_intersect(list_distinct(w[1:8]), list_distinct(w[-8:])))
             AS intersect_size,
           len(list_distinct(list_filter(w[1:8],
               x -> NOT list_contains(w[-8:], x)))) AS except_size
    FROM t
    """,
)
def fn_array_setops(spark, sf_dir):
    """Array set algebra — union/intersect/except with set semantics, on
    each doc's first-8 vs last-8 word windows. Sizes compared (contents
    are order-unstable across engines; cardinalities are not)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("w"),
    ).select(
        "doc_id",
        F.size(F.expr("array_union(slice(w, 1, 8), slice(w, -8, 8))")).cast(
            "long"
        ).alias("union_size"),
        F.size(F.expr("array_intersect(slice(w, 1, 8), slice(w, -8, 8))")).cast(
            "long"
        ).alias("intersect_size"),
        F.size(F.expr("array_except(slice(w, 1, 8), slice(w, -8, 8))")).cast(
            "long"
        ).alias("except_size"),
    )


# --- URL functions (web-corpus pipelines) ----------------------------------
# The fixture tables carry no URL column, so the op synthesizes a
# deterministic URL per document from its own attributes (same expression
# both engines) and then exercises the parsing surface on it. In a real
# crawl pipeline the column arrives from the source; everything after the
# synthesis line is the production code path.

_URL_SPARK = (
    "concat('https://www.', source, '.Example.com/', lang, '/doc/', "
    "CAST(doc_id AS STRING), '?id=', CAST(doc_id AS STRING), "
    "'&utm_source=feed&ref=mail#sec', CAST(doc_id % 3 AS STRING))"
)
_URL_DUCK = (
    "concat('https://www.', source, '.Example.com/', lang, '/doc/', "
    "CAST(doc_id AS VARCHAR), '?id=', CAST(doc_id AS VARCHAR), "
    "'&utm_source=feed&ref=mail#sec', CAST(doc_id % 3 AS VARCHAR))"
)


@query(
    "fn_url",
    oracle=f"""
    WITH u AS (SELECT doc_id, {_URL_DUCK} AS url FROM documents)
    SELECT doc_id, url,
           regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*):', 1) AS proto,
           regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1) AS host,
           regexp_extract(url, '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
           regexp_extract(url, '\\?([^#]*)', 1) AS query,
           regexp_extract(url, '[?&]id=([^&#]*)', 1) AS id_param
    FROM u
    """,
)
def fn_url(spark, sf_dir):
    """URL decomposition: protocol/host/path/query plus one query param.

    Spark's ``parse_url`` is JVM-side (java.net.URI under the hood) and
    stays inside codegen; the DuckDB oracle re-derives the same parts with
    anchored regexes, which pins down the exact semantics we rely on
    (no scheme-relative URLs, no userinfo). Map-only — scan-bandwidth
    bound at any scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = docs.select("doc_id", F.expr(_URL_SPARK).alias("url"))
    return u.select(
        "doc_id",
        "url",
        F.parse_url("url", F.lit("PROTOCOL")).alias("proto"),
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY")).alias("query"),
        F.parse_url("url", F.lit("QUERY"), F.lit("id")).alias("id_param"),
    )


@query(
    "fn_trig",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_discount), 6)  AS sin_d,
           round(cos(l_discount), 6)  AS cos_d,
           round(tan(l_discount), 6)  AS tan_d,
           round(asin(l_discount), 6) AS asin_d,
           round(acos(l_discount), 6) AS acos_d,
           round(atan(l_discount), 6) AS atan_d,
           round(atan2(l_discount, l_tax + 0.01), 6) AS atan2_dt,
           round(degrees(l_discount), 6) AS deg_d,
           round(radians(l_quantity), 6) AS rad_q,
           round((exp(l_discount) - exp(-l_discount)) / 2, 6) AS sinh_d,
           round((exp(l_discount) + exp(-l_discount)) / 2, 6) AS cosh_d,
           round((exp(2 * l_discount) - 1) / (exp(2 * l_discount) + 1), 6) AS tanh_d
    FROM lineitem
    WHERE l_orderkey < 400
    """,
)
def fn_trig(spark, sf_dir):
    """Trigonometric/hyperbolic scalar family. All libm-backed on both
    engines; inputs are small (discount ∈ [0, 0.1]) and results rounded to
    6 dp, which absorbs any 1-ulp cross-libm drift (same containment rule
    as ln() in `llm_unigram_logprob`). DuckDB 1.0 has no sinh/cosh/tanh,
    so the oracle states them via exp() identities — rounding absorbs the
    re-association. Map-only, codegen'd."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    d = F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(d), 6).alias("sin_d"),
        F.round(F.cos(d), 6).alias("cos_d"),
        F.round(F.tan(d), 6).alias("tan_d"),
        F.round(F.asin(d), 6).alias("asin_d"),
        F.round(F.acos(d), 6).alias("acos_d"),
        F.round(F.atan(d), 6).alias("atan_d"),
        F.round(F.atan2(d, F.col("l_tax") + 0.01), 6).alias("atan2_dt"),
        F.round(F.degrees(d), 6).alias("deg_d"),
        F.round(F.radians("l_quantity"), 6).alias("rad_q"),
        F.round(F.sinh(d), 6).alias("sinh_d"),
        F.round(F.cosh(d), 6).alias("cosh_d"),
        F.round(F.tanh(d), 6).alias("tanh_d"),
    )


@query(
    "fn_encode",
    oracle="""
    SELECT p_partkey,
           base64(encode(p_name)) AS name_b64,
           decode(from_base64(base64(encode(p_name)))) AS name_roundtrip,
           to_hex(p_partkey) AS key_hex,
           to_hex(encode(left(p_name, 4))) AS prefix_hex
    FROM part
    WHERE p_partkey < 300
    """,
)
def fn_encode(spark, sf_dir):
    """Binary/text encoding family: base64 encode + decode roundtrip, hex
    of integers and of UTF-8 bytes. The wire-format toolkit for opaque
    payload columns (multimodal pipelines store binary + encodes for
    debugging/interchange). Spark's hex(bigint) and DuckDB's to_hex both
    emit uppercase, verified; string-byte hex goes through explicit UTF-8
    encode on both engines."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.base64(F.col("p_name").cast("binary")).alias("name_b64"),
        F.decode(F.unbase64(F.base64(F.col("p_name").cast("binary"))), "UTF-8").alias(
            "name_roundtrip"
        ),
        F.hex(F.col("p_partkey")).alias("key_hex"),
        F.hex(F.left(F.col("p_name"), F.lit(4)).cast("binary")).alias("prefix_hex"),
    )


@query(
    "fn_format",
    oracle="""
    SELECT o_orderkey,
           printf('ORD-%010d', o_orderkey) AS order_tag,
           printf('%-12s|%05d', o_orderpriority, o_custkey % 100000) AS padded,
           printf('%.2f', o_totalprice) AS price_2dp,
           printf('%x', o_orderkey) AS key_hex_lower,
           lpad(CAST(o_orderkey AS VARCHAR), 12, '0') AS key_lpad
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def fn_format(spark, sf_dir):
    """printf-style string formatting (report/export rendering, stable ID
    minting). Spark's ``format_string`` is Java String.format and DuckDB's
    ``printf`` is C-style — the declared specifiers (%d with zero/width
    pad, %-Ns left pad, %.2f, %x) are the overlapping subset, pinned here.
    %.2f on exact-2dp doubles renders identically on both engines."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.format_string("ORD-%010d", "o_orderkey").alias("order_tag"),
        F.format_string("%-12s|%05d", F.col("o_orderpriority"), F.col("o_custkey") % 100000).alias("padded"),
        F.format_string("%.2f", "o_totalprice").alias("price_2dp"),
        F.lower(F.hex("o_orderkey")).alias("key_hex_lower"),
        F.lpad(F.col("o_orderkey").cast("string"), 12, "0").alias("key_lpad"),
    )


@query(
    "fn_datetime_tz",
    oracle="""
    SELECT event_id, ts,
           timezone('America/New_York', CAST(ts AS TIMESTAMPTZ)) AS ny_wall,
           timezone('Asia/Tokyo',       CAST(ts AS TIMESTAMPTZ)) AS tokyo_wall,
           CAST(timezone('Europe/Berlin', ts) AS TIMESTAMP) AS berlin_as_utc,
           CAST(date_part('hour', timezone('America/New_York',
                CAST(ts AS TIMESTAMPTZ))) AS INTEGER) AS ny_hour
    FROM events
    WHERE event_id < 300
    """,
)
def fn_datetime_tz(spark, sf_dir):
    """Timezone conversion family — the classic ETL trap. Both engines run
    with session TZ pinned to UTC (FIXTURES.md rule 1), so the mapping is
    exact: Spark ``from_utc_timestamp(ts, z)`` ≡ DuckDB
    ``timezone(z, ts::TIMESTAMPTZ)`` (UTC instant → zone wall time) and
    ``to_utc_timestamp(ts, z)`` ≡ ``CAST(timezone(z, ts) AS TIMESTAMP)``
    (zone wall time → UTC instant). Covers a DST-observing, a non-DST,
    and a negative-offset zone; both directions; plus a local-hour
    extraction (the per-local-day bucketing primitive)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 300)
    return ev.select(
        "event_id",
        "ts",
        F.from_utc_timestamp("ts", "America/New_York").alias("ny_wall"),
        F.from_utc_timestamp("ts", "Asia/Tokyo").alias("tokyo_wall"),
        F.to_utc_timestamp("ts", "Europe/Berlin").alias("berlin_as_utc"),
        F.hour(F.from_utc_timestamp("ts", "America/New_York"))
        .cast("int")
        .alias("ny_hour"),
    )


@query(
    "fn_surrogate_key",
    oracle="""
    SELECT c_custkey,
           CAST(('0x' || substring(sha256('cust|' || CAST(c_custkey AS VARCHAR)), 1, 15))
                AS BIGINT) AS sk,
           substring(sha256('cust|' || CAST(c_custkey AS VARCHAR)), 1, 8) || '-' ||
           substring(sha256('cust|' || CAST(c_custkey AS VARCHAR)), 9, 4) || '-' ||
           substring(sha256('cust|' || CAST(c_custkey AS VARCHAR)), 13, 4) || '-' ||
           substring(sha256('cust|' || CAST(c_custkey AS VARCHAR)), 17, 4) || '-' ||
           substring(sha256('cust|' || CAST(c_custkey AS VARCHAR)), 21, 12) AS sk_uuid
    FROM customer
    WHERE c_custkey < 500
    """,
)
def fn_surrogate_key(spark, sf_dir):
    """Deterministic surrogate-key minting: 60-bit int key and UUID-shaped
    string key, both content-derived (sha256 of a namespaced business
    key). Content-derived keys are THE scalable pattern: no global
    row_number (a total-order bottleneck), no monotonically_increasing_id
    (partition-layout-dependent, unstable across re-runs) — the same row
    always mints the same key on any cluster, which is what makes
    backfills and cross-table FK stitching safe at 100 TB. Collision odds
    at 60 bits: ~n²/2⁶¹ (negligible below ~10⁸ keys; use the full hash
    string above that)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 500)
    h = F.sha2(F.concat(F.lit("cust|"), F.col("c_custkey").cast("string")), 256)
    return c.select(
        "c_custkey",
        F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint").alias("sk"),
        F.concat_ws(
            "-",
            F.substring(h, 1, 8),
            F.substring(h, 9, 4),
            F.substring(h, 13, 4),
            F.substring(h, 17, 4),
            F.substring(h, 21, 12),
        ).alias("sk_uuid"),
    )


@query(
    "fn_variant",
    oracle="""
    SELECT event_id,
           CAST(props->>'$.k' AS BIGINT) AS k,
           CAST(props->>'$.k' AS BIGINT) % 10 AS k_mod,
           CAST(props->>'$.k' AS VARCHAR) AS k_str
    FROM events
    WHERE event_id < 400
    """,
)
def fn_variant(spark, sf_dir):
    """Spark 4 VariantType: the semi-structured fast path. ``parse_json``
    builds a binary variant once; ``variant_get`` extracts typed fields
    without re-parsing the JSON string per access — the right engine-side
    representation when a props/payload column is touched by many
    expressions. (Storage note: at 100 TB keep hot keys shredded into
    real columns; variant is for the long tail.) Oracle uses DuckDB's
    JSON extraction over the same string column."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 400)
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("k"),
        (F.expr("variant_get(parse_json(props), '$.k', 'bigint')") % 10).alias("k_mod"),
        F.expr("cast(variant_get(parse_json(props), '$.k', 'bigint') as string)").alias(
            "k_str"
        ),
    )


_XML_SPARK = (
    "concat('<order><key>', CAST(o_orderkey AS STRING), '</key><status>', "
    "o_orderstatus, '</status><total>', CAST(o_totalprice AS STRING), "
    "'</total></order>')"
)
_XML_DUCK = (
    "concat('<order><key>', CAST(o_orderkey AS VARCHAR), '</key><status>', "
    "o_orderstatus, '</status><total>', CAST(o_totalprice AS VARCHAR), "
    "'</total></order>')"
)


@query(
    "fn_xml",
    oracle=f"""
    WITH x AS (SELECT o_orderkey, {_XML_DUCK} AS xml FROM orders
               WHERE o_orderkey < 400)
    SELECT o_orderkey, xml,
           CAST(regexp_extract(xml, '<key>([^<]*)</key>', 1) AS BIGINT) AS key_field,
           regexp_extract(xml, '<status>([^<]*)</status>', 1) AS status_field,
           CAST(regexp_extract(xml, '<total>([^<]*)</total>', 1) AS DOUBLE)
             AS total_field
    FROM x
    """,
)
def fn_xml(spark, sf_dir):
    """XML ingestion via Spark 4's native ``from_xml`` (schema-directed,
    JVM-side StAX parse — the legacy-feed interchange path). The XML is
    synthesized from row data (no XML fixture column); DuckDB has no XML
    type, so the oracle re-extracts fields with anchored regexes — which
    also pins the subset the op relies on: well-formed, no attributes/
    namespaces/CDATA. Number round-trip: 2dp doubles print identically
    on both engines (shortest-repr), so CAST-back matches exactly."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    x = o.select("o_orderkey", F.expr(_XML_SPARK).alias("xml"))
    parsed = x.select(
        "o_orderkey",
        "xml",
        F.from_xml("xml", "key BIGINT, status STRING, total DOUBLE").alias("r"),
    )
    return parsed.select(
        "o_orderkey",
        "xml",
        F.col("r.key").alias("key_field"),
        F.col("r.status").alias("status_field"),
        F.col("r.total").alias("total_field"),
    )
