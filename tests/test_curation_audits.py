"""Invariant tests for the round-9 curation-audit operators:
ivf.cell_stats, cluster-balanced sampling (quota_sample over J2
assignments), dedup.minhash_estimate_pairs, dedup.shingle_novelty.

Value parity vs DuckDB is covered by tests/test_oracle_parity.py (the
queries are registered); these tests pin the operator-level laws the
oracle comparison can't express: conservation, determinism under
repartitioning, and estimator/exact consistency.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_T2

from extended_rabitq_spark.operators import dedup as dedup_ops
from extended_rabitq_spark.operators import ivf as ivf_ops
from extended_rabitq_spark.operators import sampling as sampling_ops


def _base(spark):
    emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
    return emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))


class TestCellStats:
    def test_population_conserved_and_consistent_with_assign(self, spark):
        base = _base(spark)
        emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
        cents = ivf_ops.label_centroids(emb)
        stats = ivf_ops.cell_stats(base, cents).collect()
        n_total = base.count()
        assert sum(r["n_vectors"] for r in stats) == n_total
        # per-cell counts equal a groupBy over the assignment operator
        asn = (
            ivf_ops.assign_clusters(base, cents)
            .groupBy("cluster_id")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        assert {r["cluster_id"]: r["n"] for r in asn} == {
            r["cluster_id"]: r["n_vectors"] for r in stats
        }
        # distances are sums of non-negative rounded values
        assert all(r["sum_dist"] >= 0.0 for r in stats)

    def test_sum_dist_partitioning_invariant(self, spark):
        # exact-decimal accumulation: any partitioning yields the SAME
        # double, bit-for-bit (the law the DECIMAL detour buys)
        base = _base(spark)
        emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
        cents = ivf_ops.label_centroids(emb)
        a = {
            r["cluster_id"]: r["sum_dist"]
            for r in ivf_ops.cell_stats(base.repartition(1), cents).collect()
        }
        b = {
            r["cluster_id"]: r["sum_dist"]
            for r in ivf_ops.cell_stats(base.repartition(13, "id"), cents).collect()
        }
        assert a == b


class TestClusterBalancedSample:
    def test_quota_and_determinism(self, spark):
        base = _base(spark)
        emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
        cents = ivf_ops.label_centroids(emb)
        asn = ivf_ops.assign_clusters(base, cents).select("id", "cluster_id")
        n = 5
        pick = sampling_ops.quota_sample(
            asn, n, group="cluster_id", salt="cbal", id_="id"
        )
        rows = pick.collect()
        per = {}
        for r in rows:
            per.setdefault(r["cluster_id"], []).append(r["id"])
        assert all(len(v) <= n for v in per.values())
        # membership is a pure function of (id, salt): repartitioned input
        # picks the identical set
        rows2 = sampling_ops.quota_sample(
            asn.repartition(17, "id"), n, group="cluster_id", salt="cbal", id_="id"
        ).collect()
        assert sorted((r["id"], r["cluster_id"], r["pick_rank"]) for r in rows) == sorted(
            (r["id"], r["cluster_id"], r["pick_rank"]) for r in rows2
        )


class TestMinhashEstimate:
    def test_bounds_and_consistency_with_lsh_verify(self, spark):
        docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
        est = dedup_ops.minhash_estimate_pairs(docs).collect()
        assert est, "fixture corpus has LSH candidates"
        n = dedup_ops.N_MINHASH
        for r in est:
            assert 0 <= r["sig_matches"] <= n
            assert 0 <= r["inter"] <= min(r["nsh_a"], r["nsh_b"])
            assert r["doc_a"] < r["doc_b"]
        # every pair minhash_lsh_pairs verifies above threshold appears
        # here with the SAME exact Jaccard (inter / union)
        verified = {
            (r["doc_a"], r["doc_b"]): r["jaccard_r"]
            for r in dedup_ops.minhash_lsh_pairs(docs, threshold=0.4).collect()
        }
        by_pair = {(r["doc_a"], r["doc_b"]): r for r in est}
        assert set(verified) <= set(by_pair)
        for pair, jac in verified.items():
            r = by_pair[pair]
            j = r["inter"] / (r["nsh_a"] + r["nsh_b"] - r["inter"])
            assert round(j, 6) == jac


class TestShingleNovelty:
    def test_conservation_and_bounds(self, spark):
        docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
        nov = dedup_ops.shingle_novelty(docs).collect()
        sh = dedup_ops.shingle_table(docs)
        assert all(0 <= r["n_novel"] <= r["n_shingles"] for r in nov)
        # every distinct shingle is novel in exactly one doc
        assert sum(r["n_novel"] for r in nov) == sh.select("shingle").distinct().count()
        # per-doc shingle counts match the shingle table
        per_doc = {
            r["doc_id"]: r["n"]
            for r in sh.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
        }
        assert {r["doc_id"]: r["n_shingles"] for r in nov} == per_doc

    def test_first_doc_gets_full_novelty(self, spark):
        # a corpus where doc 0 contains everything: doc 0 fully novel,
        # exact-duplicate doc 1 fully recycled
        docs = spark.createDataFrame(
            [
                (0, "alpha beta gamma delta epsilon zeta"),
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "alpha beta gamma brand new tail here"),
            ],
            "doc_id long, text string",
        )
        nov = {r["doc_id"]: r for r in dedup_ops.shingle_novelty(docs).collect()}
        assert nov[0]["n_novel"] == nov[0]["n_shingles"]
        assert nov[1]["n_novel"] == 0
        assert 0 < nov[2]["n_novel"] < nov[2]["n_shingles"]


class TestPlanShapes:
    """The audits must stay equi-join/broadcast-shaped and JVM-only —
    no cartesian blowup, no Python eval in any of their hot paths."""

    def test_novelty_and_estimate_plans_jvm_equi_only(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        for df in (
            dedup_ops.shingle_novelty(docs),
            dedup_ops.minhash_estimate_pairs(docs),
        ):
            plan = df._jdf.queryExecution().executedPlan().toString()
            assert "CartesianProduct" not in plan
            assert "BroadcastNestedLoopJoin" not in plan
            assert "EvalPython" not in plan

    def test_cell_stats_broadcasts_centroids(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        base = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        cents = ivf_ops.label_centroids(emb)
        plan = (
            ivf_ops.cell_stats(base, cents)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # centroid side broadcasts (tiny by construction: K rows); the
        # argmin cross join is the documented broadcast nested loop of
        # assign_clusters — what must NOT appear is a shuffled cartesian
        assert "CartesianProduct" not in plan
        assert "EvalPython" not in plan
