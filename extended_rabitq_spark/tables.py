"""Fixture-table loading.

The driver's synthetic parquet lives at ``/root/testdata/sf*/``:
``region nation customer supplier part orders lineitem events documents
embeddings``.  ``embeddings`` is the reference's base-vector table
(``<ds>_base.fvecs``, ``src/test_search.cpp:35``) with schema
``(vec_id BIGINT, embedding ARRAY<FLOAT>, label INT)``.

The reference holds out a random slice of the base file as the query set
(``python/download_dataset.py:17-22``).  We mirror that deterministically:
``vec_id < NQ`` rows are the queries, the rest are the base — both engines
(Spark and the DuckDB oracle) apply the same split predicate so results
are comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
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
]

# Deterministic held-out query count (≡ NQ=1000 of download_dataset.py:17-22,
# scaled to the fixture).
NQ = 10


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture uses parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright ([PARQUET_TYPE_ILLEGAL]).  Read
    nanos as int64 and floor-convert to microseconds — bitwise the same
    truncation DuckDB applies natively, so oracle timestamps match."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ts div 1000, NOT floor(ts / 1000): `/` on BIGINT returns DOUBLE, and
    # at ~1.7e18 ns the 52-bit mantissa can no longer represent the
    # quotient to 1 µs — floor() of the rounded double is off by ±1 µs on
    # ~24% of fixture rows (measured).  Integer division is exact.
    return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def base_vectors(spark: SparkSession, sf_dir: str, nq: int = NQ) -> DataFrame:
    """Base side of the query/base split (reference base fvecs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.where(emb.vec_id >= nq)


def query_vectors(spark: SparkSession, sf_dir: str, nq: int = NQ) -> DataFrame:
    """Held-out query side (reference query fvecs)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.where(emb.vec_id < nq)
