"""Pluggable sink registry — the LOAD side of the engine (SURVEY.md §0.1:
the reference loads into ClickHouse + MongoDB [K]; here the warehouse
formats are file-based plus JDBC, with the ClickHouse/Mongo connector call
shapes documented on env-blocked stubs).

Design: one tiny `Sink` protocol (``write(df) -> None``) + a name registry,
so `run_pipeline` specs and `Engine.load` pick sinks declaratively:

    {"format": "jdbc", "table": "revenue", "url": "jdbc:derby:...", ...}
    {"format": "parquet", "path": "/warehouse/t", "partition_by": ["day"]}

Every file sink takes `partition_by` (directory pruning downstream — at
100 TB an unpartitioned warehouse sink is a bug, not a choice) and `mode`
(default overwrite; use "append" + `sink_overwrite_partition` dynamic
semantics for idempotent window reloads). All writes are executor-side
distributed writes — no sink collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

SINKS: dict[str, type] = {}


def sink(name: str):
    def deco(cls):
        cls.format_name = name
        SINKS[name] = cls
        return cls

    return deco


class _FileSink:
    """Shared shape for path-based columnar/interchange sinks."""

    format_name = ""

    def __init__(self, path: str, partition_by: list[str] | None = None, **options):
        self.path = path
        self.partition_by = partition_by or []
        self.options = options

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        writer = df.write.mode(mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        for k, v in self.options.items():
            writer = writer.option(k, v)
        getattr(writer, self.format_name)(self.path)


@sink("parquet")
class ParquetSink(_FileSink):
    """Columnar warehouse load (the ClickHouse-table analog at rest)."""


@sink("orc")
class OrcSink(_FileSink):
    """ORC warehouse load — same pruning properties as parquet."""


@sink("csv")
class CsvSink(_FileSink):
    """Interchange export; header on by default."""

    def __init__(self, path: str, partition_by=None, **options):
        options.setdefault("header", True)
        super().__init__(path, partition_by, **options)


@sink("json")
class JsonSink(_FileSink):
    """JSON-lines export (the MongoDB-ish document shape, file-at-rest)."""


@sink("jdbc")
class JdbcSink:
    """JDBC load — real and tested against embedded Derby (bundled with
    Spark); against MySQL/Postgres/ClickHouse-JDBC only url/driver change.
    ``numPartitions`` bounds concurrent connections: size it to what the
    target database tolerates, never to cluster size."""

    # File-sink spec keys that must fail loudly instead of silently
    # becoming JDBC connection properties via **properties.
    REJECTED_KEYS = frozenset(
        {"path", "partition_by", "header", "compression", "sep", "delimiter"}
    )

    def __init__(
        self,
        url: str,
        table: str,
        driver: str = "org.apache.derby.iapi.jdbc.AutoloadedDriver",
        num_partitions: int | None = None,
        **properties,
    ):
        self.url = url
        self.table = table
        self.properties = {"driver": driver, **properties}
        self.num_partitions = num_partitions

    def write(self, df: DataFrame, mode: str = "overwrite") -> None:
        if self.num_partitions:
            df = df.coalesce(self.num_partitions)
        df.write.mode(mode).jdbc(self.url, self.table, properties=self.properties)


@sink("clickhouse")
class ClickHouseSink:
    """ClickHouse warehouse load (the reference's analytics store [K]).
    NOT runnable here: no ClickHouse server or connector jar in this
    environment. With the official Spark connector
    (`com.clickhouse.spark:clickhouse-spark-runtime`) deployed, the call
    shape is catalog-based:

        spark.conf.set("spark.sql.catalog.ch",
                       "com.clickhouse.spark.ClickHouseCatalog")
        spark.conf.set("spark.sql.catalog.ch.host", host)
        df.writeTo("ch.db.table").append()

    or plain JDBC through `JdbcSink` with
    url="jdbc:clickhouse://host:8123/db" and the clickhouse-jdbc driver —
    which is exactly the tested code path above.
    """

    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "no ClickHouse server/connector in this environment; "
            "see docstring for both production call shapes"
        )


@sink("mongodb")
class MongoSink:
    """MongoDB document load (the reference's scraped-data + checkpoint
    store [K]). NOT runnable here: no Mongo server or
    `org.mongodb.spark:mongo-spark-connector` jar. Production call shape:

        (df.write.format("mongodb")
           .option("connection.uri", uri)
           .option("database", db).option("collection", coll)
           .mode("append").save())

    Checkpoint documents (the reference's watermark state) map to
    plans/incremental.py's watermark files instead — see
    `inc_batch_watermark`.
    """

    def __init__(self, *a, **kw):
        raise NotImplementedError(
            "no MongoDB server/connector in this environment; "
            "see docstring for the production call shape"
        )


def make_sink(spec: dict):
    """Build a sink from a declarative spec: {"format": name, ...params}.

    Specs are validated per sink family: keys a sink explicitly rejects
    (e.g. file-sink options on a JDBC spec, which **properties would
    otherwise swallow as bogus connection properties) raise TypeError."""
    spec = dict(spec)
    fmt = spec.pop("format", "parquet")
    spec.pop("mode", None)  # mode is a write() arg, not a constructor arg
    if fmt not in SINKS:
        raise KeyError(f"unknown sink format {fmt!r}; have {sorted(SINKS)}")
    cls = SINKS[fmt]
    bad = set(spec) & getattr(cls, "REJECTED_KEYS", frozenset())
    if bad:
        raise TypeError(
            f"{fmt!r} sink does not accept {sorted(bad)} "
            f"(misplaced file-sink option?)"
        )
    return cls(**spec)


def write_sink(df: DataFrame, spec: dict) -> None:
    """One-shot declarative write: dispatch on spec['format']."""
    make_sink(spec).write(df, mode=spec.get("mode", "overwrite"))
