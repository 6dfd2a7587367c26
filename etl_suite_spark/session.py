"""SparkSession factory + per-query runtime configuration.

The driver hands us an already-built session, so anything correctness-
critical must be a *runtime* conf applied inside each query (``configure``),
not a builder-time conf. ``get_spark`` exists for our own tests/bench.

Scale notes (100 TB design): AQE on for runtime shuffle coalescing and skew
splitting; shuffle partitions sized for local mode here but meant to be
overridden (``spark.sql.shuffle.partitions``) cluster-side; UTC session TZ
so timestamp semantics match across engines and clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied before every declared query runs.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for any pandas_udf / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Keep ANSI off: SURVEY §1.2 oracle-parity note (legacy null-on-error
    # semantics; declared queries avoid relying on div-by-zero anyway).
    "spark.sql.ansi.enabled": "false",
    # events.ts is parquet TIMESTAMP(NANOS) which Spark 4 rejects; read the
    # raw int64 and convert to µs ourselves (io.load_table) — floor division
    # matches DuckDB's ns→µs truncation exactly.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def configure(spark: SparkSession) -> SparkSession:
    """Apply runtime confs idempotently. Called by every registered query."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment → builder already set it
    return spark


def get_spark(app_name: str = "etl-suite-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Local session for tests/bench. Cluster deployments use spark-submit confs."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    spark = builder.getOrCreate()
    return configure(spark)
