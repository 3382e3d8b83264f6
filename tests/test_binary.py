"""Binary sign-code Hamming search (operators/binary.py) + IVF-PQ
(operators/pq.ivfpq_knn)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from extended_rabitq_spark.operators import binary, ivf as ivf_ops, knn, pq

from conftest import SF_SMOKE

K = 10


def _frames(spark, nq=10):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    b = emb.where(F.col("vec_id") >= nq).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    return q, b


class TestHamming:
    def test_matches_numpy(self, spark):
        q, b = _frames(spark)
        got = {
            (r.qid, r.rank): (r.id, r.hamming)
            for r in binary.hamming_knn(q, b, k=K).collect()
        }
        qs = {r.qid: np.array(r.qvec) for r in q.collect()}
        bs = sorted((r.id, np.array(r.vec)) for r in b.collect())
        for qid, qv in qs.items():
            qb = qv > 0
            hams = sorted(
                (int((qb != (bv > 0)).sum()), bid) for bid, bv in bs
            )
            for rank, (h, bid) in enumerate(hams[:K], start=1):
                assert got[(qid, rank)] == (bid, h), (qid, rank)

    def test_packed_twin_value_equal(self, spark):
        q, b = _frames(spark)
        a = sorted(map(tuple, binary.hamming_knn(q, b, k=K).collect()))
        p = sorted(map(tuple, binary.hamming_knn_packed(q, b, k=K).collect()))
        assert a == p

    def test_packed_words_shape(self, spark):
        _, b = _frames(spark)
        row = binary.pack_sign_bits(b.limit(5)).first()
        d = len(b.select("vec").first()[0])
        assert len(row.words) == -(-d // 32)

    def test_rerank_improves_over_raw_hamming(self, spark):
        """Exact-rerank top-k recall vs GT must be ≥ raw Hamming's: the
        rerank re-scores a superset of raw Hamming's top-k with the true
        metric, so it can only recover neighbors Hamming misranked."""
        q, b = _frames(spark)
        gt = {
            (r.qid, r.id) for r in knn.exact_knn(q, b, k=K).collect()
        }
        raw = {(r.qid, r.id) for r in binary.hamming_knn(q, b, k=K).collect()}
        rr = {
            (r.qid, r.id)
            for r in binary.hamming_rerank_knn(q, b, coarse_k=50, k=K).collect()
        }
        assert len(rr & gt) >= len(raw & gt)

    def test_no_python_in_plan(self, spark):
        q, b = _frames(spark)
        plan = binary.hamming_knn_packed(q, b, k=K)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestIVFPQ:
    def test_deterministic_across_partitioning(self, spark):
        q, b = _frames(spark)
        cents = ivf_ops.label_centroids(
            spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").where(F.col("vec_id") >= 10)
        ).select("cluster_id", "centroid")
        a = sorted(map(tuple, pq.ivfpq_knn(q, b, cents, m=4, dsub=16, k=K).collect()))
        c = sorted(
            map(tuple, pq.ivfpq_knn(q, b.repartition(13), cents, m=4, dsub=16, k=K).collect())
        )
        assert a == c

    def test_recall_reasonable_and_dists_exact(self, spark):
        """Rerank outputs true L2² (every returned dist matches a direct
        recompute) and full-probe IVF-PQ recall beats random."""
        q, b = _frames(spark)
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        cents = ivf_ops.label_centroids(emb.where(F.col("vec_id") >= 10)).select(
            "cluster_id", "centroid"
        )
        nclusters = cents.count()
        res = pq.ivfpq_knn(
            q, b, cents, m=4, dsub=16, nprobe=nclusters, coarse_k=200, k=K
        ).collect()
        qs = {r.qid: np.array(r.qvec, dtype=np.float64) for r in q.collect()}
        bs = {r.id: np.array(r.vec, dtype=np.float64) for r in b.collect()}
        for r in res:
            want = float(((qs[r.qid] - bs[r.id]) ** 2).sum())
            assert abs(r.dist - want) < 1e-6
        gt = {(r.qid, r.id) for r in knn.exact_knn(q, b, k=K).collect()}
        got = {(r.qid, r.id) for r in res}
        assert len(got & gt) / len(gt) > 0.5

    def test_octant_codebooks_cover_nonempty_octants(self, spark):
        q, b = _frames(spark)
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        cents = ivf_ops.label_centroids(emb.where(F.col("vec_id") >= 10)).select(
            "cluster_id", "centroid"
        )
        assigned = ivf_ops.assign_clusters(b, cents)
        from extended_rabitq_spark.functions import vector as V

        res = assigned.join(F.broadcast(cents), "cluster_id").select(
            "id", F.expr(V.sub("vec", "centroid")).alias("rvec")
        )
        subs = pq._sub_explode(res, "rvec", 4, 16, "sv").select("id", "sub_id", "sv")
        cb = pq.residual_octant_codebooks(subs)
        rows = cb.collect()
        assert all(0 <= r.code < 8 and len(r.cw) == 16 for r in rows)
        assert {r.sub_id for r in rows} == {0, 1, 2, 3}


class TestRetrievalEval:
    def test_perfect_ranker_gets_full_marks(self, spark):
        from extended_rabitq_spark.operators import evalmetrics

        q, b = _frames(spark)
        gt = knn.exact_knn(q, b, k=K)
        rows = evalmetrics.retrieval_eval(gt, gt, k=K).collect()
        assert all(r.hits == K and r.mrr_fix == 1_000_000 and r.ndcg_fix == 1_000_000 for r in rows)

    def test_zero_hit_query_emits_zeros(self, spark):
        from extended_rabitq_spark.operators import evalmetrics

        res = spark.createDataFrame([(1, 1, 100), (1, 2, 101)], "qid BIGINT, rank BIGINT, id BIGINT")
        gt = spark.createDataFrame([(1, 1, 900), (1, 2, 901)], "qid BIGINT, rank BIGINT, id BIGINT")
        rows = evalmetrics.retrieval_eval(res, gt, k=2).collect()
        assert [tuple(r) for r in rows] == [(1, 0, 0, 0)]

    def test_known_partial_credit(self, spark):
        """Result with exactly the 2nd-ranked relevant at position 1:
        hits=1, MRR=1e6, DCG=disc[0], IDCG=disc[0]+disc[1]."""
        from extended_rabitq_spark.operators import evalmetrics

        disc = evalmetrics.dcg_discounts(2)
        res = spark.createDataFrame([(7, 1, 42), (7, 2, 99)], "qid BIGINT, rank BIGINT, id BIGINT")
        gt = spark.createDataFrame([(7, 1, 41), (7, 2, 42)], "qid BIGINT, rank BIGINT, id BIGINT")
        r = evalmetrics.retrieval_eval(res, gt, k=2).first()
        assert r.hits == 1 and r.mrr_fix == 1_000_000
        assert r.ndcg_fix == (1_000_000 * disc[0]) // (disc[0] + disc[1])


class TestIVFPQIndex:
    def test_saved_index_search_equals_inline(self, spark, tmp_path):
        """search over the persisted index (with exact rerank) must equal
        the inline ivfpq_knn plan at the same (nprobe, coarse_k, k)."""
        q, b = _frames(spark)
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        cents = ivf_ops.label_centroids(emb.where(F.col("vec_id") >= 10)).select(
            "cluster_id", "centroid"
        )
        path = str(tmp_path / "ivfpq")
        pq.save_ivfpq_index(b, cents, path, m=4, dsub=16)
        got = sorted(
            map(
                tuple,
                pq.search_ivfpq_index(
                    spark, path, q, nprobe=3, coarse_k=50, k=K, rerank_base=b
                ).collect(),
            )
        )
        want = sorted(
            map(tuple, pq.ivfpq_knn(q, b, cents, m=4, dsub=16, nprobe=3, coarse_k=50, k=K).collect())
        )
        assert got == want

    def test_probe_partition_pruning(self, spark, tmp_path):
        q, b = _frames(spark)
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        cents = ivf_ops.label_centroids(emb.where(F.col("vec_id") >= 10)).select(
            "cluster_id", "centroid"
        )
        path = str(tmp_path / "ivfpq2")
        pq.save_ivfpq_index(b, cents, path, m=4, dsub=16)
        df = pq.search_ivfpq_index(spark, path, q.limit(1), nprobe=1, coarse_k=20, k=5)
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the codes scan must carry the cluster_id filter (dynamic or
        # static pruning), not read every partition
        assert "cluster_id" in plan
        assert len(df.collect()) == 5

    def test_adc_only_mode_returns_estimates(self, spark, tmp_path):
        q, b = _frames(spark)
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        cents = ivf_ops.label_centroids(emb.where(F.col("vec_id") >= 10)).select(
            "cluster_id", "centroid"
        )
        path = str(tmp_path / "ivfpq3")
        pq.save_ivfpq_index(b, cents, path, m=4, dsub=16)
        rows = pq.search_ivfpq_index(spark, path, q, nprobe=2, coarse_k=50, k=K).collect()
        assert len(rows) == K * q.count()
        assert all(r.dist >= 0 for r in rows)


class TestSearchIndexDispatch:
    def test_search_index_routes_ivfpq_kind(self, spark, tmp_path):
        """The one-call serving API must dispatch on meta.json kind and
        return the same rows as calling search_ivfpq_index directly."""
        from extended_rabitq_spark.operators import rabitq

        q, b = _frames(spark)
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        cents = ivf_ops.label_centroids(emb.where(F.col("vec_id") >= 10)).select(
            "cluster_id", "centroid"
        )
        path = str(tmp_path / "ivfpq_disp")
        pq.save_ivfpq_index(b, cents, path, m=4, dsub=16)
        via_api = sorted(
            map(
                tuple,
                rabitq.search_index(
                    spark, path, q, k=K, nprobe=3, rerank_base=b
                ).collect(),
            )
        )
        direct = sorted(
            map(
                tuple,
                pq.search_ivfpq_index(
                    spark, path, q, nprobe=3, coarse_k=50, k=K, rerank_base=b
                ).collect(),
            )
        )
        assert via_api == direct


class TestReviewRegressions:
    def test_pack_sign_bits_non_multiple_of_32_dims(self, spark):
        """ANSI element_at threw on the short final word (review r6):
        D=33 must pack into 2 words with the tail zero-padded."""
        df = spark.createDataFrame(
            [(1, [1.0] * 33), (2, [-1.0] * 33)], "id BIGINT, vec ARRAY<DOUBLE>"
        )
        rows = {r.id: r.words for r in binary.pack_sign_bits(df).collect()}
        assert len(rows[1]) == 2
        assert rows[1][0] == (1 << 32) - 1  # 32 positive signs
        assert rows[1][1] == 1 << 31        # bit 33 MSB-first, tail zeros
        assert rows[2] == [0, 0]

    def test_packed_twin_equal_at_odd_dims(self, spark):
        import numpy as np

        rng = np.random.default_rng(3)
        data = [(i, [float(x) for x in rng.standard_normal(33)]) for i in range(40)]
        df = spark.createDataFrame(data, "id BIGINT, vec ARRAY<DOUBLE>")
        q = df.where(F.col("id") < 3).select(
            F.col("id").alias("qid"), F.col("vec").alias("qvec")
        )
        b = df.where(F.col("id") >= 3)
        a = sorted(map(tuple, binary.hamming_knn(q, b, k=5).collect()))
        p = sorted(map(tuple, binary.hamming_knn_packed(q, b, k=5).collect()))
        assert a == p

    def test_search_index_ivfpq_rejects_rabitq_knobs(self, spark, tmp_path):
        import pytest

        from extended_rabitq_spark.operators import rabitq

        q, b = _frames(spark)
        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
        cents = ivf_ops.label_centroids(emb.where(F.col("vec_id") >= 10)).select(
            "cluster_id", "centroid"
        )
        path = str(tmp_path / "ivfpq_knobs")
        pq.save_ivfpq_index(b, cents, path, m=4, dsub=16)
        with pytest.raises(TypeError, match="RaBitQ-only"):
            rabitq.search_index(spark, path, q, k=5, nprobe=2, estimator="high_acc")
        with pytest.raises(ValueError, match="use_graph"):
            rabitq.search_index(spark, path, q, k=5, nprobe=2, use_graph=True)
