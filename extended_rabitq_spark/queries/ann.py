"""ANN-core registered queries (SURVEY §2.2/§2.3/§2.5) with DuckDB oracles.

Query/base split: ``vec_id < NQ`` of ``embeddings`` are queries, the rest
base — the deterministic analog of the reference's random holdout
(``python/download_dataset.py:17-22``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import oracle as O
from ..functions import vector as V
from ..operators import knn
from ..registry import register
from ..tables import NQ, base_vectors, query_vectors

K = 10


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return query_vectors(spark, sf_dir).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )


def _base_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return base_vectors(spark, sf_dir).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )


_KNN_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {NQ}),
     b AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= {NQ}),
     d AS (SELECT q.qid, b.id, {O.l2sq('q.qvec', 'b.vec')} AS dist FROM b CROSS JOIN q),
     r AS (SELECT qid, id, dist,
                  CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS BIGINT) AS rank
           FROM d)
SELECT qid, rank, id, dist FROM r WHERE rank <= {K}
"""


@register("knn_exact", _KNN_ORACLE)
def knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 brute-force exact KNN: cross join + distance + top-k window
    (python/compute_gt.py:12-19 as a Spark query)."""
    return knn.exact_knn(_queries_df(spark, sf_dir), _base_df(spark, sf_dir), k=K)


@register("knn_exact_combined")
def knn_exact_combined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path exact KNN (map-side partial top-k; same output as
    knn_exact — oracle omitted because mapInPandas isn't SQL, but
    tests/test_knn.py proves equality to the declarative form)."""
    return knn.exact_knn_combined(_queries_df(spark, sf_dir), _base_df(spark, sf_dir), k=K)


_COSINE_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {NQ}),
     b AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= {NQ}),
     d AS (SELECT q.qid, b.id, 1.0 - ({O.cosine_sim('q.qvec', 'b.vec')}) AS dist FROM b CROSS JOIN q),
     r AS (SELECT qid, id, dist,
                  CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS BIGINT) AS rank
           FROM d)
SELECT qid, rank, id, round(dist, 6) AS dist_r FROM r WHERE rank <= {K}
"""


@register("knn_cosine", _COSINE_ORACLE)
def knn_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine-metric brute-force top-k (reference does cosine as L2 on
    normalized vectors, python/utils/preprocess.py:3-5; we expose the
    direct expression). dist rounded for cross-engine hash stability of
    the division."""
    df = knn.exact_knn(_queries_df(spark, sf_dir), _base_df(spark, sf_dir), k=K, metric="cosine")
    return df.select("qid", "rank", "id", F.round("dist", 6).alias("dist_r"))


_VEC_STATS_ORACLE = f"""
SELECT vec_id,
       round({O.norm('embedding')}, 6) AS norm_r,
       round({O.vec_sum('embedding')}, 6) AS vsum_r,
       {O.popcount('embedding')} AS positive_dims
FROM embeddings
"""


@register("vector_stats", _VEC_STATS_ORACLE)
def vector_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-local vector reductions: norm (P4 prereq), Σx (P9), sign
    popcount (P5+P9) — the per-vector factor aggregates' building blocks
    (inc/index/Quantizer.hpp:386-437)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    return emb.select(
        "vec_id",
        F.round(F.expr(V.norm("embedding")), 6).alias("norm_r"),
        F.round(F.expr(V.vec_sum("embedding")), 6).alias("vsum_r"),
        F.expr(V.popcount("embedding")).alias("positive_dims"),
    )
