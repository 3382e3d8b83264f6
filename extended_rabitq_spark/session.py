"""SparkSession factory tuned for the engine.

Local tests run ``local[N]``; the same conf scales to a real cluster —
AQE handles skew/coalescing at runtime, Arrow makes the pandas-UDF
quantization path batch-vectorized, and shuffle partitions are sized for
the local fixture (override ``spark.sql.shuffle.partitions`` upward on a
1000-executor deployment).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "extended-rabitq-spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    # Named vector-kernel SQL functions (l2sq, cosine_dist, ...): Catalyst
    # inlines these declarative SQL UDFs at plan time, so `spark.sql`
    # users get the same codegen expressions as the DataFrame API.
    from .functions.sqlfuncs import register_sql_functions

    register_sql_functions(spark)
    return spark
