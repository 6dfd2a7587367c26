"""Central operator registry.

Every operator from SURVEY.md §2 registers here: a ``queries()`` callable
``(spark, sf_dir) -> DataFrame`` and (where SQL-expressible) the equivalent
DuckDB oracle SQL string. ``__spark_entry__.py`` exposes these dicts to the
driver's correctness harness.

Design: decorator-based registration so each operator module is
self-contained; importing :mod:`etl_suite_spark` pulls in every module and
populates the registry (see ``etl_suite_spark/__init__.py``).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a query callable under ``name`` with optional oracle SQL.

    ``oracle=None`` marks a rows-only operator (driver records the weaker
    rowcount/schema check — SURVEY.md §2 notes which rows are rows-only).
    """

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
