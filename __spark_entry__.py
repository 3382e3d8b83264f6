"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()[name]`` (spark, sf_dir) pairs with ``oracle_sql()[name]``
(DuckDB ANSI SQL over pre-registered views ``region nation customer
supplier part orders lineitem events documents embeddings``) for the
driver's t2 hash gate.  Registry lives in
``extended_rabitq_spark.registry`` so operators register next to their
implementation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from extended_rabitq_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: exact KNN ground truth (J1) at sf0.001."""
    return registry.QUERIES["knn_exact"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    return registry.ordered_oracles()
