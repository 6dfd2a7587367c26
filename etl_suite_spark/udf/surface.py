"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

The escape hatches, ranked by cost — and the rule that the hot path stays
JVM-side (every operator elsewhere in this engine uses built-ins only):

1. plain Python UDF — row-at-a-time pickling; ~10-100× slower than
   built-ins. Declared once here to prove the surface; never used in any
   other operator.
2. pandas UDFs (scalar / grouped-agg) — Arrow-batched, vectorized; the
   acceptable Python path when numpy/pandas expresses the kernel.
3. applyInPandas (grouped map) — whole-group frame→frame, for reshapes
   (resampling) that relational ops can't express row-wise.
4. Python UDTF (Spark 4) — table function exploding one row into many.

Each declared query keeps its logic SQL-expressible so the DuckDB oracle
checks the *plumbing* (Arrow transfer, schema mapping, grouping) with the
math held constant.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf, udf, udtf

from ..core import d2d, dec, sql_d2d
from ..io import load_table
from ..registry import query


def _slug_fn(name: str) -> str:
    """Kebab-slug a part name (row-at-a-time Python on purpose)."""
    return name.strip().lower().replace(" ", "-")


@query(
    "udf_python_scalar",
    oracle="""
    SELECT p_partkey, lower(replace(trim(p_name), ' ', '-')) AS slug
    FROM part
    """,
)
def udf_python_scalar(spark, sf_dir):
    p = load_table(spark, sf_dir, "part")
    slug = udf(_slug_fn, returnType=T.StringType())
    return p.select("p_partkey", slug("p_name").alias("slug"))


def _zscore_fn(x: pd.Series, mean: pd.Series, std: pd.Series) -> pd.Series:
    """Vectorized z-score: Arrow-batched, numpy arithmetic — identical
    IEEE ops to the SQL form, just computed 10k rows at a time."""
    return (x - mean) / std


@query(
    "udf_pandas_scalar",
    oracle=f"""
    WITH stats AS (
      SELECT COUNT(o_totalprice) AS n,
             {sql_d2d("SUM(CAST(o_totalprice AS DECIMAL(18,2)))")} AS sx,
             {sql_d2d("SUM(CAST(o_totalprice AS DECIMAL(18,2)) * CAST(o_totalprice AS DECIMAL(18,2)))")} AS sxx
      FROM orders
    )
    SELECT o_orderkey,
           round((o_totalprice - sx / n)
                 / sqrt((sxx - sx * sx / n) / (n - 1)), 6) AS price_z
    FROM orders CROSS JOIN stats
    """,
)
def udf_pandas_scalar(spark, sf_dir):
    """Z-score of o_totalprice via a pandas UDF. Global mean/std come from
    exact decimal power sums (the agg_stats discipline) broadcast-joined
    onto every row; the UDF does only the scalar arithmetic."""
    zscore = pandas_udf(_zscore_fn, "double")
    o = load_table(spark, sf_dir, "orders")
    q = dec("o_totalprice", 2)
    stats = o.agg(
        F.count("o_totalprice").alias("n"),
        d2d(F.sum(q)).alias("sx"),
        d2d(F.sum(q * q)).alias("sxx"),
    ).select(
        (F.col("sx") / F.col("n")).alias("mean"),
        F.sqrt((F.col("sxx") - F.col("sx") * F.col("sx") / F.col("n")) / (F.col("n") - 1)).alias("std"),
    )
    return o.crossJoin(F.broadcast(stats)).select(
        "o_orderkey",
        F.round(zscore(F.col("o_totalprice"), F.col("mean"), F.col("std")), 6).alias(
            "price_z"
        ),
    )


def _trimmed_mean_fn(v: pd.Series) -> float:
    """Grouped-agg pandas UDF: 10% two-sided trimmed mean. The whole
    group's column arrives as one Series (watch group size ⇒ executor
    memory at scale; fixture quantities are small ints so the float sum
    is exact and order-free)."""
    s = v.sort_values().reset_index(drop=True)
    k = int(len(s) * 0.1)
    trimmed = s.iloc[k : len(s) - k] if len(s) > 2 * k else s
    return float(trimmed.sum() / len(trimmed))


@query(
    "udaf_pandas_grouped_agg",
    oracle="""
    WITH ranked AS (
      SELECT l_returnflag, l_quantity,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
             COUNT(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    )
    SELECT l_returnflag,
           round(SUM(l_quantity) / COUNT(*), 6) AS trimmed_mean_qty
    FROM ranked
    WHERE rn > CAST(FLOOR(n * 0.1) AS BIGINT)
      AND rn <= n - CAST(FLOOR(n * 0.1) AS BIGINT)
    GROUP BY l_returnflag
    """,
)
def udaf_pandas_grouped_agg(spark, sf_dir):
    """Trimmed mean per returnflag. Trimming by sorted position drops the
    same value-multiset regardless of tie order, and quantities are exact
    small ints, so pandas and SQL agree bit-for-bit after round(6)."""
    trimmed_mean = pandas_udf(_trimmed_mean_fn, "double")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(trimmed_mean("l_quantity"), 6).alias("trimmed_mean_qty"))
        .select("l_returnflag", "trimmed_mean_qty")
    )


_RESAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("day", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _resample_daily(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: per-user daily counts with gap days filled as 0
    — the frame→frame reshape (reindex on a dense date range) that
    row-oriented relational ops can't express without a generated
    calendar table."""
    user = pdf["user_id"].iloc[0]
    days = pdf["ts"].dt.floor("D")
    counts = days.value_counts().sort_index()
    full = counts.reindex(
        pd.date_range(days.min().floor("D"), days.max().floor("D"), freq="D"),
        fill_value=0,
    )
    return pd.DataFrame(
        {"user_id": user, "day": full.index, "n_events": full.to_numpy("int64")}
    )


@query(
    "udtf_grouped_map",
    oracle="""
    WITH span AS (
      SELECT user_id, min(date_trunc('day', ts)) AS lo, max(date_trunc('day', ts)) AS hi
      FROM events GROUP BY user_id
    ), days AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day
      FROM span
    ), counts AS (
      SELECT user_id, date_trunc('day', ts) AS day, COUNT(*) AS n_events
      FROM events GROUP BY user_id, day
    )
    SELECT d.user_id, CAST(d.day AS TIMESTAMP) AS day,
           COALESCE(c.n_events, 0) AS n_events
    FROM days d LEFT JOIN counts c ON d.user_id = c.user_id AND d.day = c.day
    """,
)
def udtf_grouped_map(spark, sf_dir):
    """applyInPandas per-user resampling: each user's events arrive as one
    pandas frame (Arrow), leave as a dense daily series. One shuffle on
    user_id; group size bounds executor memory — at 100 TB, pre-aggregate
    per (user, day) first if single users can exceed a partition."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandas(_resample_daily, schema=_RESAMPLE_SCHEMA)
    )


class _ExplodeProps:
    """Spark 4 Python UDTF: one event row in, one row per JSON property
    out. The lateral-join shape for ragged document data."""

    def eval(self, event_id: int, props: str):
        import json

        for k, v in json.loads(props).items():
            yield event_id, k, int(v)


@query(
    "udtf_python",
    oracle="""
    SELECT event_id, 'k' AS prop_key,
           CAST(props->>'$.k' AS BIGINT) AS prop_value
    FROM events
    """,
)
def udtf_python(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    ev.select("event_id", "props").createOrReplaceTempView("_udtf_events")
    spark.udtf.register(
        "explode_props",
        udtf(_ExplodeProps, returnType="event_id: long, prop_key: string, prop_value: long"),
    )
    return spark.sql(
        "SELECT p.event_id, p.prop_key, p.prop_value"
        " FROM _udtf_events e, LATERAL explode_props(e.event_id, e.props) p"
    )


def _arrow_enrich(batches):
    """RecordBatch → RecordBatch transform: pure pyarrow.compute kernels,
    zero pandas materialization — the lowest-overhead Python escape
    hatch (no Series boxing, no index bookkeeping)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        value = batch.column("value")
        yield pa.RecordBatch.from_arrays(
            [
                batch.column("event_id"),
                pc.cast(pc.round(pc.multiply(value, pa.scalar(100.0))), pa.int64()),
                pc.utf8_upper(batch.column("event_type")),
                pc.cast(pc.utf8_length(batch.column("event_type")), pa.int64()),
            ],
            names=["event_id", "value_cents", "type_upper", "type_len"],
        )


@query(
    "udf_arrow_map",
    oracle="""
    SELECT event_id,
           CAST(round(value * 100.0) AS BIGINT) AS value_cents,
           upper(event_type) AS type_upper,
           CAST(length(event_type) AS BIGINT) AS type_len
    FROM events
    """,
)
def udf_arrow_map(spark, sf_dir):
    """mapInArrow — the Arrow-native batch map (Spark 3.3+), completing
    the escape-hatch ladder in this module's header between built-ins
    and pandas UDFs: RecordBatches stream through Python with NO
    pandas conversion, so the only overhead is the Arrow IPC hop. The
    kernel here is deliberately SQL-expressible (cents quantization +
    string casing/length via pyarrow.compute) so the oracle checks the
    plumbing — batch iteration, schema mapping, column order — with
    the math held constant. (pyarrow's round defaults to half-to-even
    vs SQL's half-up, but ×100 on these 2-dp-in-double inputs never
    lands within 1 ulp of a .5 boundary, so the mode difference is
    unexercised — the quantized-dot argument.)

    At 100 TB: mapInArrow is what a vectorized feature-extraction or
    tokenizer pass should use when it must be Python — per-batch
    amortized calls, zero-copy into numpy-backed kernels."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "value", "event_type"
    )
    return ev.mapInArrow(
        _arrow_enrich,
        schema="event_id long, value_cents long, type_upper string, type_len long",
    )
