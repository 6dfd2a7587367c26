"""Table loading: the extract side of the engine.

Canonical fixture tables (TESTDATA.md) are parquet; ``load_table`` is the
single scan entry point so every operator benefits from the same pushdown /
pruning behavior. At 100 TB these would be partitioned/ bucketed warehouse
tables — the API is path-based so the same code reads a 1000-file dataset.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import configure

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one canonical table. Column pruning + predicate pushdown are
    Catalyst's job — callers just ``.select``/``.filter`` declaratively."""
    configure(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS), read as raw int64 nanos
        # (nanosAsLong conf in session.py). Floor-divide to µs — identical
        # to DuckDB's read_parquet ns→TIMESTAMP truncation, so oracle
        # comparisons on ts agree to the microsecond.
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        df = df.select("event_id", "ts", "user_id", "event_type", "value", "props")
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all fixture tables as temp views for the SQL entry point."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
