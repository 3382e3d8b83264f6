"""Product quantization codec + ADC search (operators/pq.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from extended_rabitq_spark.operators import ivf as ivf_ops
from extended_rabitq_spark.operators import knn, pq

from conftest import SF_SMOKE

M, DSUB = 4, 16


def _frames(spark, nq=10):
    emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < nq).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    b = emb.where(F.col("vec_id") >= nq).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    cents = ivf_ops.label_centroids(emb.where(F.col("vec_id") >= nq))
    return q, b, pq.subspace_codebooks(cents, M, DSUB)


class TestPQCodec:
    def test_encode_deterministic_across_partitioning(self, spark):
        _, b, cb = _frames(spark)
        a = sorted(map(tuple, pq.pq_encode(b, cb, M, DSUB).collect()))
        c = sorted(map(tuple, pq.pq_encode(b.repartition(17), cb, M, DSUB).collect()))
        assert a == c

    def test_encode_matches_numpy_argmin(self, spark):
        _, b, cb = _frames(spark)
        cw = {(r.sub_id, r.code): np.array(r.cw) for r in cb.collect()}
        codes = {(r.id, r.sub_id): r.code for r in pq.pq_encode(b, cb, M, DSUB).collect()}
        base = {r.id: np.array(r.vec, dtype=np.float64) for r in b.collect()}
        ncodes = max(c for (_, c) in cw) + 1
        for vid, v in list(base.items())[:50]:
            for j in range(M):
                sv = v[j * DSUB : (j + 1) * DSUB]
                dists = [float(((sv - cw[(j, c)]) ** 2).sum()) for c in range(ncodes)]
                best = min(range(ncodes), key=lambda c: (dists[c], c))
                assert codes[(vid, j)] == best, (vid, j)

    def test_decode_is_codeword_concat(self, spark):
        _, b, cb = _frames(spark)
        cw = {(r.sub_id, r.code): list(r.cw) for r in cb.collect()}
        codes = pq.pq_encode(b, cb, M, DSUB)
        dec = {r.id: list(r.dvec) for r in pq.pq_decode(codes, cb).collect()}
        cd = {}
        for r in codes.collect():
            cd.setdefault(r.id, {})[r.sub_id] = r.code
        for vid, by_sub in list(cd.items())[:50]:
            want = []
            for j in range(M):
                want.extend(cw[(j, by_sub[j])])
            assert dec[vid] == want


class TestPQSearch:
    def test_full_coarse_is_exact(self, spark):
        """coarse_k = |base| ⇒ the ADC phase filters nothing; exact
        rerank must reproduce brute-force KNN bitwise."""
        q, b, cb = _frames(spark, nq=5)
        n = b.count()
        got = sorted(map(tuple, pq.pq_adc_knn(q, b, cb, M, DSUB, coarse_k=n, k=10).collect()))
        want = sorted(map(tuple, knn.exact_knn(q, b, k=10).collect()))
        assert got == want

    def test_overfetch_recall_floor(self, spark):
        """ADC with 5× overfetch keeps a reasonable share of true
        neighbors even with the coarse 10-codeword label codebooks."""
        from extended_rabitq_spark import metrics

        q, b, cb = _frames(spark)
        gt = knn.exact_knn(q, b, k=10)
        out = pq.pq_adc_knn(q, b, cb, M, DSUB, coarse_k=50, k=10)
        rec = metrics.recall_per_query(out, gt, 10).agg(F.avg("recall")).first()[0]
        assert rec >= 0.3, rec


class TestPQTrainer:
    def test_trained_beats_label_means_on_distortion(self, spark):
        """Per-subspace Lloyd's with ksub=32 must reconstruct with lower
        mean squared error than the 10-codeword label-mean codebooks."""
        _, b, cb_label = _frames(spark)
        cb_trained = pq.train_pq_codebooks(b, m=M, ksub=32, seed=7)

        def mse(cb):
            dec = pq.pq_decode(pq.pq_encode(b, cb, M, DSUB), cb)
            j = b.join(dec, "id")
            from extended_rabitq_spark.functions import vector as V

            return (
                j.select(F.expr(V.l2sq("vec", "dvec")).alias("e"))
                .agg(F.avg("e"))
                .first()[0]
            )

        assert mse(cb_trained) < mse(cb_label)

    def test_trainer_deterministic(self, spark):
        _, b, _ = _frames(spark)
        a = sorted(map(repr, pq.train_pq_codebooks(b, m=M, ksub=8, seed=3).collect()))
        c = sorted(map(repr, pq.train_pq_codebooks(b, m=M, ksub=8, seed=3).collect()))
        assert a == c

    def test_dim_not_divisible_raises(self, spark):
        _, b, _ = _frames(spark)
        with pytest.raises(ValueError, match="not divisible"):
            pq.train_pq_codebooks(b, m=7, ksub=8)
