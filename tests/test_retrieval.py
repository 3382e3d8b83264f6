"""Sparse/hybrid retrieval operators (operators/retrieval.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from extended_rabitq_spark.operators import retrieval as R

from conftest import SF_SMOKE, SF_T2


def _docs(spark, sf=SF_SMOKE):
    return spark.read.parquet(f"{sf}/documents.parquet")


def _emb(spark, sf=SF_SMOKE):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def _qt(spark):
    return spark.createDataFrame(
        [(qid, t) for qid, ts in R.PINNED_QUERIES for t in ts],
        "query_id BIGINT, term STRING",
    )


class TestBM25:
    def test_rare_term_dominates(self, spark):
        """idf must rank 'dup'-bearing docs top for the query containing
        the one rare corpus term (df ≈ 5% vs ~80% for every other)."""
        docs = _docs(spark)
        top = (
            R.bm25_topk(docs, _qt(spark), k=5)
            .where(F.col("query_id") == 1)
            .orderBy("rnk")
            .collect()
        )
        assert len(top) == 5
        dup_docs = {
            r.doc_id
            for r in docs.where(F.lower("text").contains("dup")).collect()
        }
        # every top-5 hit for the 'dup' query contains the rare term
        assert all(r.doc_id in dup_docs for r in top)

    def test_deterministic_across_partitioning(self, spark):
        docs = _docs(spark)
        a = sorted(map(tuple, R.bm25_topk(docs, _qt(spark)).collect()))
        b = sorted(
            map(tuple, R.bm25_topk(docs.repartition(13), _qt(spark)).collect())
        )
        assert a == b

    def test_integer_schema(self, spark):
        """Bitwise cross-engine safety: every output column is integer."""
        out = R.bm25_topk(_docs(spark), _qt(spark))
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            "bigint"
        ] * 4

    def test_score_monotone_in_tf(self, spark):
        """More matching occurrences at equal dl/df → higher fixed-point
        score (sanity of the fixed-point transcription)."""
        docs = spark.createDataFrame(
            [(0, "dup alpha alpha alpha"), (1, "dup dup alpha alpha")],
            "doc_id BIGINT, text STRING",
        )
        qt = spark.createDataFrame([(1, "dup")], "query_id BIGINT, term STRING")
        rows = {r.doc_id: r.score_fp for r in R.bm25_scores(docs, qt).collect()}
        assert rows[1] > rows[0]

    def test_plan_no_python_and_broadcast(self, spark):
        """The scoring plan stays JVM-side and broadcasts the term set."""
        plan = R.bm25_topk(_docs(spark), _qt(spark))._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


class TestHybridRRF:
    def test_self_retrieval_not_required_but_fusion_exact(self, spark, duck):
        """Bitwise vs the DuckDB oracle at the gate scale (redundant with
        the parity replica, kept local so this module fails fast)."""
        from extended_rabitq_spark import registry

        s = sorted(
            tuple(map(repr, r))
            for r in registry.QUERIES["hybrid_search_rrf"](spark, SF_T2).collect()
        )
        d = sorted(
            tuple(map(repr, r))
            for r in duck.sql(registry.ORACLES["hybrid_search_rrf"]).fetchall()
        )
        assert s == d

    def test_rrf_values_are_exact_integers(self, spark):
        """Every fused score decomposes into ≤2 reciprocal-rank terms of
        the 1e6 div (60+rank) lattice (rank ≤ r_cut, missing side = 0)."""
        out = R.hybrid_rrf_topk(_docs(spark), _emb(spark), nq=5, r_cut=20, k=5)
        rows = out.collect()
        assert rows
        contrib = {0} | {1000000 // (60 + r) for r in range(1, 21)}
        valid = {a + b for a in contrib for b in contrib} - {0}
        assert all(r.rrf_fp in valid for r in rows)

    def test_fusion_matches_independent_recompute(self, spark):
        """Recompute RRF in plain Python from independently-collected
        branch rankings; the operator's fused top-k must agree exactly."""
        docs, emb = _docs(spark), _emb(spark)
        nq, r_cut, k = 5, 20, 10
        qterms = (
            docs.where(F.col("doc_id") < nq)
            .select(
                F.col("doc_id").alias("query_id"),
                F.explode(F.expr("split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')")).alias("term"),
            )
            .distinct()
        )
        sparse = R.bm25_scores(docs.where(F.col("doc_id") >= nq), qterms).collect()
        import numpy as np

        base = {r.vec_id: np.array(r.embedding, dtype=np.float64)
                for r in emb.where(F.col("vec_id") >= nq).collect()}
        qv = {r.vec_id: np.array(r.embedding, dtype=np.float64)
              for r in emb.where(F.col("vec_id") < nq).collect()}
        expected = {}
        for qid in qv:
            srt = sorted(
                [(r.doc_id, r.score_fp) for r in sparse if r.query_id == qid],
                key=lambda t: (-t[1], t[0]),
            )[:r_cut]
            rank_b = {d: i + 1 for i, (d, _) in enumerate(srt)}
            dists = sorted(
                (
                    (1.0 - float(qv[qid] @ v) / (np.linalg.norm(qv[qid]) * np.linalg.norm(v)), d)
                    for d, v in base.items()
                ),
            )[:r_cut]
            rank_c = {d: i + 1 for i, (_, d) in enumerate(dists)}
            fused = {
                d: (1000000 // (60 + rank_b[d]) if d in rank_b else 0)
                + (1000000 // (60 + rank_c[d]) if d in rank_c else 0)
                for d in set(rank_b) | set(rank_c)
            }
            top = sorted(fused.items(), key=lambda t: (-t[1], t[0]))[:k]
            for rnk, (d, s) in enumerate(top, 1):
                expected[(qid, rnk)] = (d, s)
        got = {
            (r.qid, r.rnk): (r.doc_id, r.rrf_fp)
            for r in R.hybrid_rrf_topk(docs, emb, nq=nq, r_cut=r_cut, k=k).collect()
        }
        assert got == expected


class TestMRLPrefix:
    def test_full_coarse_equals_exact_knn(self, spark):
        """With coarse_k = |base| the prefix phase filters nothing, so the
        two-phase result must equal brute-force exact KNN."""
        from extended_rabitq_spark.operators import knn

        q = _emb(spark).where(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        b = _emb(spark).where(F.col("vec_id") >= 5).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        )
        n_base = b.count()
        got = sorted(
            map(tuple, R.mrl_prefix_knn(q, b, prefix=4, coarse_k=n_base, k=7).collect())
        )
        want = sorted(map(tuple, knn.exact_knn(q, b, k=7).collect()))
        assert got == want

    def test_prefix_recall_on_mrl_like_embeddings(self, spark):
        """On Matryoshka-LIKE vectors (information concentrated in the
        early dims — here dim j scaled by 0.75^j) the 8-dim coarse phase
        with 5× overfetch keeps nearly all true neighbors.  (On the
        uniform synthetic corpus the same setting recalls only ~0.3 —
        the operator targets MRL-trained embeddings, measured in-repo.)"""
        import numpy as np

        from extended_rabitq_spark.operators import knn

        rng = np.random.default_rng(7)
        vecs = rng.standard_normal((300, 64)) * (0.75 ** np.arange(64))
        rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
        emb = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
        q = emb.where(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        b = emb.where(F.col("vec_id") >= 10).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        )
        approx = {
            (r.qid, r.id)
            for r in R.mrl_prefix_knn(q, b, prefix=8, coarse_k=50, k=10).collect()
        }
        exact = {(r.qid, r.id) for r in knn.exact_knn(q, b, k=10).collect()}
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.9

    def test_coarse_phase_cuts_candidates(self, spark):
        """coarse_k strictly smaller than base ⇒ at most nq·coarse_k rows
        reach the exact phase — asserted via the rank bound itself."""
        q = _emb(spark).where(F.col("vec_id") < 3).select(
            F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
        )
        b = _emb(spark).where(F.col("vec_id") >= 3).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
        )
        out = R.mrl_prefix_knn(q, b, prefix=8, coarse_k=12, k=12)
        per_q = out.groupBy("qid").count().collect()
        assert all(r["count"] <= 12 for r in per_q)
