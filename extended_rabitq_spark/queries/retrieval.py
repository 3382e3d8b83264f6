"""Registered sparse/hybrid retrieval queries (beyond-reference surface).

BM25 keyword retrieval, BM25+cosine reciprocal-rank-fusion hybrid search,
and Matryoshka prefix-dimension two-phase KNN — the retrieval shapes a
RAG / training-data pipeline runs next to the reference's pure vector
search.  All three are bitwise oracle-backed (fixed-point BM25, integer
RRF, fold-exact distances — see ``operators/retrieval.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import retrieval as R
from ..registry import register
from ..tables import NQ, base_vectors, query_vectors, read_parquet


@register("bm25_topk", R.d_bm25_topk(R.PINNED_QUERIES))
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 keyword retrieval at the pinned query set.  One
    tokenize pass; query-term semi-join before any shuffle; per-query
    rank windows; integer-typed end-to-end (fixed-point scores)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    qt = spark.createDataFrame(
        [(qid, t) for qid, ts in R.PINNED_QUERIES for t in ts],
        "query_id BIGINT, term STRING",
    )
    return R.bm25_topk(docs, qt)


@register("hybrid_search_rrf", R.d_hybrid_rrf_topk(nq=NQ))
def hybrid_search_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: the held-out queries (< NQ) search the base
    corpus by BM25 over their own text AND cosine over their embedding;
    rankings fuse by reciprocal-rank (integer ``1e6 div (60+rank)``).
    Both branches are rank-bounded before the fusion join."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    return R.hybrid_rrf_topk(docs, emb, nq=NQ)


@register("knn_mrl_prefix", R.d_mrl_prefix_knn(nq=NQ, prefix=16, coarse_k=100))
def knn_mrl_prefix_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka two-phase KNN: coarse L2 on the first 16 dims
    (top-100), exact full-dimension re-rank (top-10) — the
    truncation-serving pattern for MRL-trained embeddings.  Semantics
    pinned by the oracle (the same two-phase plan in SQL); recall vs
    plain KNN depends on the embedding being MRL-trained (see
    tests/test_retrieval.py)."""
    q = query_vectors(spark, sf_dir).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    b = base_vectors(spark, sf_dir).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    return R.mrl_prefix_knn(q, b, prefix=16, coarse_k=100)
