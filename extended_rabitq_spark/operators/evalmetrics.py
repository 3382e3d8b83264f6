"""Retrieval-quality evaluation metrics (beyond-reference surface).

The reference evaluates its searcher with recall and average distance
ratio (``src/test_search.cpp:137-159``; J4/J5).  A retrieval/RAG
pipeline additionally grades rankers by hit count, MRR and nDCG — this
module computes all three per query, cross-engine-exact:

- **Fixed-point integers**: MRR and nDCG are fractions; both are emitted
  in micro units (``1e6 div rank``; DCG uses a PRECOMPUTED integer
  discount table ``round(1e6/log2(i+1))`` embedded identically in the
  Spark plan and the DuckDB oracle), so every metric is a BIGINT — no
  float folds, hash-stable across engines.
- **Join shape**: one equi-join of results×relevants on (qid, id) — at
  scale both sides are rank-bounded (k rows/query), so the join input
  is O(nq·k) regardless of corpus size — then one partial-agg groupBy
  and a left join back to the query list so zero-hit queries emit 0s.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1_000_000


def dcg_discounts(k: int) -> list[int]:
    """Micro-unit DCG discount table: disc[i-1] = round(1e6/log2(i+1)).

    Computed ONCE in Python and embedded as a literal in both engines'
    plans — the only transcendental in the metric, frozen identically."""
    return [round(SCALE / math.log2(i + 1)) for i in range(1, k + 1)]


def retrieval_eval(results: DataFrame, gt: DataFrame, k: int) -> DataFrame:
    """Grade ``results`` against ``gt`` → (qid, hits, mrr_fix, ndcg_fix).

    Both inputs are (qid, rank, id) with rank ≤ k (the standard top-k
    output shape of every knn_* operator here).  ``hits`` = |results ∩
    gt| per query; ``mrr_fix`` = 1e6 div (rank of first relevant), 0 if
    none; ``ndcg_fix`` = 1e6·DCG div IDCG with binary relevance and the
    frozen discount table (IDCG = best-possible DCG given min(hits-
    possible, k) — gt supplies exactly k relevants, so IDCG is the
    constant prefix sum)."""
    disc = dcg_discounts(k)
    idcg = sum(disc)
    disc_arr = "array(" + ",".join(f"{d}L" for d in disc) + ")"
    hits = results.join(gt.select("qid", "id"), ["qid", "id"]).select(
        "qid", "rank", F.expr(f"element_at({disc_arr}, CAST(rank AS INT))").alias("d")
    )
    per_q = hits.groupBy("qid").agg(
        F.count("*").cast("long").alias("hits"),
        F.expr(f"CAST({SCALE} AS BIGINT) div min(rank)").alias("mrr_fix"),
        F.expr(f"(CAST({SCALE} AS BIGINT) * sum(d)) div {idcg}").alias("ndcg_fix"),
    )
    qids = results.select("qid").distinct()
    return qids.join(per_q, "qid", "left").select(
        "qid",
        F.coalesce("hits", F.lit(0).cast("long")).alias("hits"),
        F.coalesce("mrr_fix", F.lit(0).cast("long")).alias("mrr_fix"),
        F.coalesce("ndcg_fix", F.lit(0).cast("long")).alias("ndcg_fix"),
    )


def d_retrieval_eval(results_cte: str, gt_cte: str, k: int) -> str:
    """DuckDB twin: caller supplies CTE SQL bodies producing
    (qid, rank, id) for results and ground truth."""
    disc = dcg_discounts(k)
    idcg = sum(disc)
    disc_list = "[" + ",".join(str(d) for d in disc) + "]"
    return f"""
WITH res AS ({results_cte}),
gt AS ({gt_cte}),
h AS (SELECT res.qid, res.rank, CAST({disc_list}[CAST(res.rank AS INT)] AS BIGINT) AS d
      FROM res JOIN gt ON res.qid = gt.qid AND res.id = gt.id),
pq AS (SELECT qid, CAST(count(*) AS BIGINT) AS hits,
              CAST({SCALE} // min(rank) AS BIGINT) AS mrr_fix,
              CAST(({SCALE} * sum(d)) // {idcg} AS BIGINT) AS ndcg_fix
       FROM h GROUP BY qid),
qs AS (SELECT DISTINCT qid FROM res)
SELECT qs.qid,
       coalesce(pq.hits, 0) AS hits,
       coalesce(pq.mrr_fix, 0) AS mrr_fix,
       coalesce(pq.ndcg_fix, 0) AS ndcg_fix
FROM qs LEFT JOIN pq ON qs.qid = pq.qid
"""
