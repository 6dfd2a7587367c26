"""User-facing engine facade — the one import a reference user needs
(SURVEY.md §3.2's three entry points behind one object).

    from etl_suite_spark.api import Engine

    eng = Engine(spark, sf_dir="/data/warehouse")
    eng.table("lineitem").filter(...)            # DataFrame-builder entry
    eng.sql("SELECT ... FROM lineitem")          # SQL entry (views ready)
    eng.run("agg_group_basic")                   # any registered operator
    eng.pipeline({...})                          # declarative job spec
    eng.incremental_tick(state, transform)       # checkpointed ETL tick
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .io import TABLES, load_table, register_views
from .plans.incremental import run_incremental_tick
from .plans.pipeline import compile_pipeline, run_pipeline
from .registry import ORACLES, QUERIES
from .session import configure


class Engine:
    """Thin, stateless-by-design facade over the operator registry and the
    three entry points. Holds no data — every method returns a lazy
    DataFrame plan; Spark executes on action."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = configure(spark)
        self.sf_dir = sf_dir
        self._views_registered = False

    # -- entry point 1: DataFrame builder ---------------------------------
    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; have {TABLES}")
        return load_table(self.spark, self.sf_dir, name)

    # -- entry point 2: SQL ----------------------------------------------
    def sql(self, query: str) -> DataFrame:
        if not self._views_registered:
            register_views(self.spark, self.sf_dir)
            self._views_registered = True
        return self.spark.sql(query)

    # -- entry point 3: pipeline specs -----------------------------------
    def pipeline(self, spec: dict) -> DataFrame:
        return compile_pipeline(self.spark, self.sf_dir, spec)

    def run_pipeline(self, spec: dict) -> DataFrame:
        return run_pipeline(self.spark, self.sf_dir, spec)

    def incremental_tick(self, state_path: str, transform: Callable, **kw) -> DataFrame:
        return run_incremental_tick(self.spark, self.sf_dir, state_path, transform, **kw)

    # -- load side: pluggable sinks ---------------------------------------
    def load(self, df: DataFrame, sink_spec: dict) -> None:
        """Write a frame through the pluggable sink registry
        (sources/sinks.py): ``{"format": "jdbc"|"parquet"|..., ...}``."""
        from .sources.sinks import write_sink

        write_sink(df, sink_spec)

    @staticmethod
    def sinks() -> list[str]:
        """Available sink formats (env-blocked ones raise on construction
        with the production call shape in the error)."""
        from .sources.sinks import SINKS

        return sorted(SINKS)

    # -- registry ---------------------------------------------------------
    def run(self, query_id: str) -> DataFrame:
        """Run any registered operator by its SURVEY §2 id."""
        return QUERIES[query_id](self.spark, self.sf_dir)

    @staticmethod
    def operators() -> dict[str, bool]:
        """All registered operator ids → whether each is oracle-checked."""
        return {name: name in ORACLES for name in sorted(QUERIES)}
