"""Query registry backing ``__spark_entry__.py``.

Each implemented operator from SURVEY.md §2 registers a Spark callable
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a textually
parallel DuckDB oracle string.  Column names/aliases match on both sides —
the driver sorts columns by name before hashing.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Importing the query modules populates the registry.
from .queries import ann, dedup, events, ivf, pipeline, rabitq, sampling, text, tpch  # noqa: E402,F401
