"""Registered Extended-RaBitQ queries (SURVEY §2.7, §2.2 P6/P7).

``knn_rabitq*`` are rows-only for the driver (quantization runs in
mapInPandas → not ANSI-SQL-expressible; Q2's optimal-scale search is
property-tested in tests/test_rabitq.py instead, per SURVEY §5.2).
The scalar query-quantization operators (P6/P7) ARE SQL-expressible and
oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import metrics
from ..operators import ivf, knn, rabitq
from ..registry import register
from ..tables import NQ, read_parquet, embedding_dim
from .ann import K, _base_df, _queries_df
from .ivf import NPROBE

TOTAL_BITS = 4


def _build(spark: SparkSession, sf_dir: str):
    base = _base_df(spark, sf_dir)
    cents = ivf.label_centroids(
        read_parquet(spark, f"{sf_dir}/embeddings.parquet").where(F.col("vec_id") >= NQ)
    )
    index_df, meta = rabitq.build_index(base, cents, total_bits=TOTAL_BITS)
    # rotated centroids (what save_index persists), computed in memory
    # because queries() builds the fixture-sized index on the fly
    cents_full = rabitq.centroids_with_rotation(spark, cents, meta)
    return base, index_df, cents_full, meta


@register("knn_rabitq")
def knn_rabitq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Extended-RaBitQ ANN (build + two-phase search), B=4,
    nprobe=3 — the flagship accelerated pipeline
    (src/test_search.cpp:23-153 as one Spark job)."""
    base, index_df, cents, meta = _build(spark, sf_dir)
    res = rabitq.rabitq_search(
        _queries_df(spark, sf_dir), index_df, cents, meta, nprobe=NPROBE, k=K
    )
    return res.select("qid", "rank", "id", F.round("est_dist", 4).alias("est_dist_r"))


@register("knn_rabitq_ha")
def knn_rabitq_ha_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The published exhaf4 configuration: Extended-RaBitQ search with
    the HIGH_ACC phase-1 bound (estimator='high_acc'; HIGH_ACC compiled
    in for the committed baseline, src/test_search.cpp:1,
    inc/index/HASearcher.hpp:224-236).  Rows-only like knn_rabitq
    (mapInPandas build)."""
    base, index_df, cents, meta = _build(spark, sf_dir)
    res = rabitq.rabitq_search(
        _queries_df(spark, sf_dir), index_df, cents, meta, nprobe=NPROBE, k=K,
        estimator="high_acc",
    )
    return res.select("qid", "rank", "id", F.round("est_dist", 4).alias("est_dist_r"))


@register("rabitq_recall")
def rabitq_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the quantized pipeline vs exact GT (J4 over the
    accelerated results) — the reference's primary quality metric."""
    base, index_df, cents, meta = _build(spark, sf_dir)
    qs = _queries_df(spark, sf_dir)
    res = rabitq.rabitq_search(qs, index_df, cents, meta, nprobe=NPROBE, k=K)
    gt = knn.exact_knn(qs, base, k=K, dim=embedding_dim(spark, sf_dir))
    return metrics.recall_per_query(res, gt, K)


_P6_BITS = 8

_P6_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {NQ}),
     rng AS (SELECT qid, qvec,
                    CAST(list_min(qvec) AS DOUBLE) AS vl,
                    CAST(list_max(qvec) AS DOUBLE) AS vr FROM q),
     qq AS (SELECT qid,
                   CASE WHEN vr = vl THEN CAST(0 AS BIGINT)
                        ELSE CAST(list_reduce(list_transform(qvec, v ->
                             floor((CAST(v AS DOUBLE) - vl) / ((vr - vl) / {(1 << _P6_BITS) - 1}.0) + 0.5)),
                             (x, y) -> x + y) AS BIGINT) END AS code_sum
            FROM rng)
SELECT qid, code_sum FROM qq
"""


@register("query_quantize_uniform", _P6_ORACLE)
def query_quantize_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: uniform B-bit scalar quantization of each query over its own
    [min,max] range — code = ⌊(v−vl)/width + 0.5⌋
    (inc/utils/space.hpp:608-694).  Emitted as Σcodes per query (integer,
    hash-exact)."""
    qs = _queries_df(spark, sf_dir)
    steps = (1 << _P6_BITS) - 1
    vl = "CAST(array_min(qvec) AS DOUBLE)"
    vr = "CAST(array_max(qvec) AS DOUBLE)"
    code_sum = (
        f"CASE WHEN {vr} = {vl} THEN CAST(0 AS BIGINT) ELSE CAST(aggregate(transform(qvec, v -> "
        f"floor((CAST(v AS DOUBLE) - {vl}) / (({vr} - {vl}) / {steps}.0) + 0.5)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS BIGINT) END"
    )
    return qs.select("qid", F.expr(code_sum).alias("code_sum"))


_P7_BITS = 14

_P7_ORACLE = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {NQ}),
     d AS (SELECT qid, qvec,
                  CAST(list_max(list_transform(qvec, v -> abs(CAST(v AS DOUBLE)))) AS DOUBLE)
                    / {(1 << (_P7_BITS - 1)) - 1}.0 AS delta
           FROM q)
SELECT qid,
       CASE WHEN delta = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(list_reduce(list_transform(qvec, v ->
                 floor(CAST(v AS DOUBLE) / delta + 0.5)), (x, y) -> x + y) AS BIGINT) END
         AS code_sum
FROM d
"""


@register("query_quantize_symmetric", _P7_ORACLE)
def query_quantize_symmetric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: symmetric signed 14-bit quantization — Δ = max|q|/(2^13−1),
    code = ⌊q/Δ + 0.5⌋ (inc/utils/space.hpp:695-711), as Σcodes."""
    qs = _queries_df(spark, sf_dir)
    delta = (
        f"CAST(array_max(transform(qvec, v -> abs(CAST(v AS DOUBLE)))) AS DOUBLE)"
        f" / {(1 << (_P7_BITS - 1)) - 1}.0"
    )
    code_sum = (
        f"CASE WHEN ({delta}) = 0 THEN CAST(0 AS BIGINT) ELSE CAST(aggregate(transform(qvec, v -> "
        f"floor(CAST(v AS DOUBLE) / ({delta}) + 0.5)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v) AS BIGINT) END"
    )
    return qs.select("qid", F.expr(code_sum).alias("code_sum"))


# ---------------------------------------------------------------------------
# rabitq_recall_counts: the approximate flagship's first HASHABLE driver row
# (VERDICT r5 item 6).  knn_rabitq itself is rows-only (quantized distances
# aren't SQL-expressible), but the HIT COUNTS of its results against exact
# GT are small integers and fully deterministic: the quantized estimate of
# each (query, candidate) pair is a fixed float expression of the pinned-
# seed index build (row-order-independent — every distance is an
# independent dot product; no cross-row float reduction), ranks break ties
# by id, and GT is the exact-KNN oracle shape.  The oracle is a pinned
# expected table for the driver's gate scale (sf0.01), generated by the
# committed tools/gen_recall_counts_expected.py and re-verified on every
# parity run; at any other sf the oracle intentionally mismatches rather
# than silently passing.
_RECALL_COUNTS_EXPECTED = [
    (0, 6), (1, 3), (2, 7), (3, 5), (4, 4),
    (5, 5), (6, 7), (7, 1), (8, 5), (9, 5),
]

_RECALL_COUNTS_ORACLE = (
    "SELECT CAST(qid AS BIGINT) AS qid, CAST(hits AS BIGINT) AS hits FROM (VALUES "
    + ", ".join(f"({q}, {h})" for q, h in _RECALL_COUNTS_EXPECTED)
    + ") AS t(qid, hits)"
)


def _recall_counts(spark: SparkSession, sf_dir: str, **search_kw) -> DataFrame:
    base, index_df, cents, meta = _build(spark, sf_dir)
    qs = _queries_df(spark, sf_dir)
    res = rabitq.rabitq_search(
        qs, index_df, cents, meta, nprobe=NPROBE, k=K, **search_kw
    )
    gt = knn.exact_knn(qs, base, k=K, dim=embedding_dim(spark, sf_dir))
    hits = (
        res.where(F.col("rank") <= K).select("qid", "id")
        .join(gt.where(F.col("rank") <= K).select("qid", "id"),
              on=["qid", "id"], how="inner")
        .groupBy("qid").agg(F.count("*").alias("hits"))
    )
    return (
        qs.select("qid").join(hits, on="qid", how="left")
        .select("qid", F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"))
    )


@register("rabitq_recall_counts", _RECALL_COUNTS_ORACLE)
def rabitq_recall_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-query GT hit counts of the quantized two-phase search at the
    pinned operating point (B=4, nprobe=NPROBE, k=K, DEFAULT_SEED) —
    integer-exact, hash-stable attestation of the approximate path."""
    return _recall_counts(spark, sf_dir)


# Same attestation mechanism for the HIGH_ACC estimator (VERDICT r8
# item 6): the published exhaf4 configuration's phase-1 bound
# (inc/index/fastscan/FastScan.hpp:214-357, HASearcher.hpp:224-236) was
# previously rows-only via knn_rabitq_ha — this pins its hit counts at
# the same operating point.  The table DIFFERS from the default
# searcher's on qids 6 (7→5) and 9 (5→3), so a hash match attests the
# high-accuracy estimator path specifically, not the shared plumbing.
# Pinned for sf0.01 by tools/gen_recall_counts_expected.py.
_RECALL_COUNTS_HA_EXPECTED = [
    (0, 6), (1, 3), (2, 7), (3, 5), (4, 4),
    (5, 5), (6, 5), (7, 1), (8, 5), (9, 3),
]

_RECALL_COUNTS_HA_ORACLE = (
    "SELECT CAST(qid AS BIGINT) AS qid, CAST(hits AS BIGINT) AS hits FROM (VALUES "
    + ", ".join(f"({q}, {h})" for q, h in _RECALL_COUNTS_HA_EXPECTED)
    + ") AS t(qid, hits)"
)


@register("rabitq_recall_counts_ha", _RECALL_COUNTS_HA_ORACLE)
def rabitq_recall_counts_ha(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hit counts of the HIGH_ACC-estimator search (estimator=
    'high_acc', the reference's published exhaf4 operating point) —
    the HA family's first hashable driver row."""
    return _recall_counts(spark, sf_dir, estimator="high_acc")


# Same attestation mechanism for the adaptive distk prune
# (refine_mode='threshold', inc/index/Searcher.hpp:217-233 analog) —
# extended in r9 (VERDICT r8 item 3) so the driver row pins an ACTIVE
# cut, not just the no-rerank equivalence theorem's (always-true)
# conclusion that hits match the single phase: alongside ``hits`` the
# row records ``n_pool`` (scored candidates per query, pre-cut) and
# ``n_kept`` (survivors of the est_lb ≤ distk filter).  At the pinned
# operating point the cut keeps 10-13 of 128-172 candidates per query
# (~8% — the prune is doing real work), so a hash match certifies BOTH
# the theorem (hits equal the uncut search) and its non-trivial
# premise (the cut genuinely discarded ~92% of the pool).  All values
# are integer-exact for the reasons documented above; pinned for
# sf0.01 by tools/gen_recall_counts_expected.py.
_RECALL_COUNTS_ADAPTIVE_EXPECTED = [
    (0, 6, 141, 11), (1, 3, 128, 11), (2, 7, 150, 13), (3, 5, 140, 10),
    (4, 4, 130, 12), (5, 5, 131, 13), (6, 7, 159, 13), (7, 1, 135, 13),
    (8, 5, 172, 12), (9, 5, 143, 12),
]

_RECALL_COUNTS_ADAPTIVE_ORACLE = (
    "SELECT CAST(qid AS BIGINT) AS qid, CAST(hits AS BIGINT) AS hits, "
    "CAST(n_pool AS BIGINT) AS n_pool, CAST(n_kept AS BIGINT) AS n_kept "
    "FROM (VALUES "
    + ", ".join(f"({q}, {h}, {p}, {kp})" for q, h, p, kp in _RECALL_COUNTS_ADAPTIVE_EXPECTED)
    + ") AS t(qid, hits, n_pool, n_kept)"
)


@register("rabitq_recall_counts_adaptive", _RECALL_COUNTS_ADAPTIVE_ORACLE)
def rabitq_recall_counts_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hit counts + prune-activity counts of the ADAPTIVE-prune search
    (refine_mode='threshold') at the pinned operating point → (qid,
    hits, n_pool, n_kept) — driver attestation that the distk-analog
    cut is ACTIVE (n_kept ≪ n_pool) and correct (hits match the uncut
    single-phase search, the tested no-rerank equivalence theorem)."""
    base, index_df, cents, meta = _build(spark, sf_dir)
    qs = _queries_df(spark, sf_dir)
    res = rabitq.rabitq_search(
        qs, index_df, cents, meta, nprobe=NPROBE, k=K, refine_mode="threshold"
    )
    gt = knn.exact_knn(qs, base, k=K, dim=embedding_dim(spark, sf_dir))
    hits = (
        res.where(F.col("rank") <= K).select("qid", "id")
        .join(gt.where(F.col("rank") <= K).select("qid", "id"),
              on=["qid", "id"], how="inner")
        .groupBy("qid").agg(F.count("*").alias("hits"))
    )
    stats = rabitq.rabitq_threshold_stats(
        qs, index_df, cents, meta, nprobe=NPROBE, k=K
    )
    return (
        qs.select("qid")
        .join(hits, on="qid", how="left")
        .join(stats, on="qid", how="left")
        .select(
            "qid",
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.coalesce(F.col("n_pool"), F.lit(0)).cast("long").alias("n_pool"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
        )
    )
