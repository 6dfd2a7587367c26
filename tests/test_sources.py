"""Source-layer contracts: malformed-record modes and schema evolution."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import types as T

from conftest import SF_DIR

from etl_suite_spark.registry import QUERIES


@pytest.fixture(scope="module")
def bad_csv():
    root = tempfile.mkdtemp(prefix="badcsv_contract_")
    path = os.path.join(root, "mixed.csv")
    with open(path, "w") as f:
        f.write("k,price\n1,10.5\n2,oops\n3,30.25\n")
    return path


_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType()),
        T.StructField("price", T.DoubleType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)


def test_permissive_keeps_corrupt_rows(spark, bad_csv):
    df = (
        spark.read.schema(_SCHEMA)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(bad_csv)
    )
    rows = df.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r._corrupt_record is not None]
    assert len(corrupt) == 1 and corrupt[0]._corrupt_record == "2,oops"
    assert corrupt[0].price is None


def test_dropmalformed_drops_them(spark, bad_csv):
    df = (
        spark.read.schema(T.StructType(_SCHEMA.fields[:2]))
        .option("header", True)
        .option("mode", "DROPMALFORMED")
        .csv(bad_csv)
    )
    assert sorted(r.k for r in df.collect()) == [1, 3]


def test_failfast_raises(spark, bad_csv):
    df = (
        spark.read.schema(T.StructType(_SCHEMA.fields[:2]))
        .option("header", True)
        .option("mode", "FAILFAST")
        .csv(bad_csv)
    )
    with pytest.raises(Exception, match="(?i)malformed|FAILFAST"):
        df.collect()


def test_schema_evolution_nulls_old_files(spark):
    out = QUERIES["scan_parquet_schema_evolution"](spark, SF_DIR).collect()
    bands = {r.priority_band: r.n for r in out}
    assert None in bands  # v1 files have no priority_band → NULL group
    assert set(bands) - {None} <= {"high", "normal"}
    assert sum(bands.values()) == spark.read.parquet(
        os.path.join(SF_DIR, "orders.parquet")
    ).count()


def test_statistical_sample_seed_stable(spark):
    """df.sample(fraction, seed): Bernoulli sampling is seed-stable within
    Spark (same seed → same rows) and lands near the requested fraction.
    The registered sample_fraction query uses hash-sampling instead for
    cross-engine reproducibility; this pins the statistical variant."""
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    a = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber").collect()
    )
    b = sorted(
        (r.l_orderkey, r.l_linenumber)
        for r in li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber").collect()
    )
    assert a == b  # seed-stable
    n = li.count()
    assert 0.05 * n < len(a) < 0.15 * n  # near the requested fraction


def test_hash_sample_matches_fraction(spark):
    out = QUERIES["sample_fraction"](spark, SF_DIR)
    n_all = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    n = out.count()
    assert 0.06 * n_all < n < 0.15 * n_all  # 26/256 ≈ 10.2% expected


EXPECTED_DTYPES = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [("n_nationkey", "int"), ("n_name", "string"), ("n_regionkey", "int")],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", "timestamp_ntz"),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", "timestamp_ntz"),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "timestamp"),  # loader normalizes nanos/ntz to session-TZ ts
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


def test_loader_schema_pinned(spark):
    """Pin every table's POST-LOAD dtypes: the round-1 driver ERRs all
    traced to silent loader schema drift (events.ts surfacing as int64
    nanos). The loader now normalizes and this test freezes the result —
    any Spark-version or fixture change that shifts a dtype fails here
    before it can reach a driver window."""
    from etl_suite_spark.io import TABLES, load_table
    from tests.conftest import SF_DIR

    assert set(EXPECTED_DTYPES) == set(TABLES)
    for t in TABLES:
        assert load_table(spark, SF_DIR, t).dtypes == EXPECTED_DTYPES[t], t


def test_zorder_files_disjoint_in_z(spark, tmp_path):
    """Range partitioning on the Morton value must produce files whose
    z-ranges are pairwise disjoint — the property parquet min/max pruning
    exploits — and the interleave must be invertible on its 16-bit halves."""
    from pyspark.sql import functions as F

    from etl_suite_spark.io import load_table
    from etl_suite_spark.sources.scans import _Z_SPARK

    o = load_table(spark, SF_DIR, "orders")
    day = "datediff(o_orderdate, DATE '1970-01-01')"
    z = F.expr(_Z_SPARK.format(a="o_custkey % 65536", b=f"({day}) % 65536"))
    out = str(tmp_path / "orders_z")
    (
        o.withColumn("z", z)
        .repartitionByRange(8, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(out)
    )
    back = spark.read.parquet(out).select(
        "z", F.input_file_name().alias("f"), "o_custkey", "o_orderdate"
    )
    ranges = (
        back.groupBy("f").agg(F.min("z").alias("lo"), F.max("z").alias("hi")).collect()
    )
    spans = sorted((r.lo, r.hi) for r in ranges)
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping z-ranges: ({lo1},{hi1}) vs ({lo2},..)"
    # invertibility: de-interleaving even bits returns o_custkey % 65536
    sample = back.limit(200).withColumn(
        "a_back",
        F.expr(
            "aggregate(sequence(0, 15), 0L,"
            " (acc, i) -> acc + shiftleft((z >> (2 * i)) & 1, i))"
        ),
    ).collect()
    for r in sample:
        assert r.a_back == r.o_custkey % 65536
