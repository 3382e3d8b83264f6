"""IVF registered queries + DuckDB oracles (SURVEY §2.3 J2/J3/J4/J5,
§2.4 A1, §2.5 W1).

One shared WITH-block builder keeps the oracle pipeline textually parallel
to the Spark operators: label-mean centroids (rounded → cross-engine
bitwise determinism) → argmin assignment → top-nprobe probes → probe join
→ top-k → recall/ratio metrics vs the exact-KNN ground truth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import oracle as O
from .. import metrics
from ..operators import ivf, knn
from ..registry import register
from ..tables import NQ
from .ann import K, _base_df, _queries_df

NPROBE = 3


def _ivf_ctes(nprobe: int = NPROBE, k: int = K) -> str:
    """Shared DuckDB CTE pipeline mirroring the Spark operator chain."""
    return f"""
q AS (SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id < {NQ}),
b AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= {NQ}),
ex AS (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos, unnest(embedding) AS val
       FROM embeddings WHERE vec_id >= {NQ}),
pd AS (SELECT label, pos, round(avg(CAST(val AS DOUBLE)), 6) AS c FROM ex GROUP BY label, pos),
cent AS (SELECT CAST(label AS INT) AS cluster_id, list(c ORDER BY pos) AS centroid
         FROM pd GROUP BY label),
ad AS (SELECT b.id, b.vec, c.cluster_id, {O.l2sq('b.vec', 'c.centroid')} AS adist
       FROM b CROSS JOIN cent c),
asn AS (SELECT id, vec, cluster_id FROM
        (SELECT *, row_number() OVER (PARTITION BY id ORDER BY adist, cluster_id) AS rn FROM ad)
        WHERE rn = 1),
pb AS (SELECT qid, cluster_id, cdist,
              CAST(row_number() OVER (PARTITION BY qid ORDER BY cdist, cluster_id) AS BIGINT)
                AS probe_rank
       FROM (SELECT q.qid, c.cluster_id, {O.l2sq('q.qvec', 'c.centroid')} AS cdist
             FROM q CROSS JOIN cent c)),
probes AS (SELECT * FROM pb WHERE probe_rank <= {nprobe}),
cand AS (SELECT p.qid, a.id, {O.l2sq('q2.qvec', 'a.vec')} AS dist
         FROM asn a JOIN probes p ON a.cluster_id = p.cluster_id
                    JOIN q q2 ON q2.qid = p.qid),
ivf AS (SELECT qid, id, dist,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS BIGINT) AS rank
        FROM cand),
gtd AS (SELECT q.qid, b.id, {O.l2sq('q.qvec', 'b.vec')} AS dist FROM b CROSS JOIN q),
gt AS (SELECT qid, id, dist,
              CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS BIGINT) AS rank
       FROM gtd)"""


def _centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..tables import base_vectors

    return ivf.label_centroids(base_vectors(spark, sf_dir))


_CENTROID_ORACLE = f"""
WITH {_ivf_ctes()}
SELECT CAST(label AS INT) AS cluster_id, CAST(pos AS INT) AS pos, c FROM pd
"""


@register("ivf_centroids", _CENTROID_ORACLE)
def ivf_centroids_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/A2 stand-in: deterministic per-label mean centroids, exploded to
    (cluster_id, pos, c) scalars for hash-stable comparison."""
    cents = _centroids(spark, sf_dir)
    return cents.select(
        "cluster_id", F.posexplode("centroid").alias("pos", "c")
    ).select("cluster_id", F.col("pos").cast("int").alias("pos"), "c")


_ASSIGN_ORACLE = f"""
WITH {_ivf_ctes()}
SELECT id, cluster_id FROM asn
"""


@register("ivf_assign", _ASSIGN_ORACLE)
def ivf_assign_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 argmin cluster assignment (python/ivf.py:30-34)."""
    asn = ivf.assign_clusters(_base_df(spark, sf_dir), _centroids(spark, sf_dir))
    return asn.select("id", "cluster_id")


_PROBES_ORACLE = f"""
WITH {_ivf_ctes()}
SELECT qid, probe_rank, cluster_id, round(cdist, 6) AS cdist_r FROM probes
"""


@register("ivf_probes", _PROBES_ORACLE)
def ivf_probes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 top-nprobe centroid selection (inc/index/Initializer.hpp:55-68)."""
    pr = ivf.select_probes(_queries_df(spark, sf_dir), _centroids(spark, sf_dir), NPROBE)
    return pr.select("qid", "probe_rank", "cluster_id", F.round("cdist", 6).alias("cdist_r"))


@register("ivf_probes_graph", _PROBES_ORACLE)
def ivf_probes_graph_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 real: beam search over the centroid M-NN graph — the Spark
    analog of the reference's HNSW-over-centroids probe path
    (inc/index/Initializer.hpp:80-115; engaged when K ≥ 20000,
    inc/index/IVF.hpp:157-161).

    Shares the exact-W1 oracle: at fixture K (< default ef = 768,
    Initializer.hpp:106) the beam explores the whole connected graph, so
    the selected probe set equals exact top-nprobe.  The graph pass only
    SELECTS candidates (with a 2× margin); distances and ranks are then
    recomputed declaratively — the same numpy-selects/Spark-scores split
    as exact_knn_combined — so the output is bit-identical to the oracle.
    """
    from pyspark.sql import Window

    qs = _queries_df(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    graph = ivf.build_centroid_graph(cents, M=8)
    sel = ivf.graph_probes(qs, graph, nprobe=2 * NPROBE).select("qid", "cluster_id")
    cand = sel.join(F.broadcast(cents), on="cluster_id").join(qs, on="qid")
    w = Window.partitionBy("qid").orderBy(
        F.col("cdist").asc(), F.col("cluster_id").asc()
    )
    return (
        cand.select(
            "qid", "cluster_id",
            knn.distance_col("l2", "qvec", "centroid").alias("cdist"),
        )
        .withColumn("probe_rank", F.row_number().over(w).cast("long"))
        .where(F.col("probe_rank") <= NPROBE)
        .select("qid", "probe_rank", "cluster_id", F.round("cdist", 6).alias("cdist_r"))
    )


N_COARSE = 4
COARSE_PROBE = 2

_PROBES_HIER_ORACLE = f"""
WITH {_ivf_ctes()},
mem AS (SELECT cluster_id, CAST(cluster_id % {N_COARSE} AS INT) AS coarse_id FROM cent),
cex AS (SELECT m.coarse_id, generate_subscripts(c.centroid, 1) - 1 AS pos, unnest(c.centroid) AS val
        FROM cent c JOIN mem m USING (cluster_id)),
cpd AS (SELECT coarse_id, pos, round(avg(CAST(val AS DOUBLE)), 6) AS c FROM cex GROUP BY coarse_id, pos),
ccent AS (SELECT coarse_id, list(c ORDER BY pos) AS centroid FROM cpd GROUP BY coarse_id),
csel AS (SELECT qid, coarse_id FROM
         (SELECT q.qid, cc.coarse_id,
                 row_number() OVER (PARTITION BY q.qid
                                    ORDER BY {O.l2sq('q.qvec', 'cc.centroid')}, cc.coarse_id) AS rn
          FROM q CROSS JOIN ccent cc)
         WHERE rn <= {COARSE_PROBE}),
hc AS (SELECT s.qid, c.cluster_id, {O.l2sq('q2.qvec', 'c.centroid')} AS cdist
       FROM csel s JOIN mem m ON m.coarse_id = s.coarse_id
                   JOIN cent c ON c.cluster_id = m.cluster_id
                   JOIN q q2 ON q2.qid = s.qid),
hp AS (SELECT qid, cluster_id, cdist,
              CAST(row_number() OVER (PARTITION BY qid ORDER BY cdist, cluster_id) AS BIGINT)
                AS probe_rank
       FROM hc)
SELECT qid, probe_rank, cluster_id, round(cdist, 6) AS cdist_r FROM hp WHERE probe_rank <= {NPROBE}
"""


@register("ivf_probes_hier", _PROBES_HIER_ORACLE)
def ivf_probes_hier_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 analog: two-level probe selection (coarse groups → member
    centroids).  Registered with the deterministic 'mod' grouping so the
    oracle reproduces it exactly; the kmeans grouping is the production
    path (behavioral tests)."""
    pr = ivf.select_probes_hier(
        _queries_df(spark, sf_dir),
        _centroids(spark, sf_dir),
        NPROBE,
        n_coarse=N_COARSE,
        coarse_probe=COARSE_PROBE,
        mode="mod",
    )
    return pr.select("qid", "probe_rank", "cluster_id", F.round("cdist", 6).alias("cdist_r"))


_KNN_IVF_ORACLE = f"""
WITH {_ivf_ctes()}
SELECT qid, rank, id, dist FROM ivf WHERE rank <= {K}
"""


@register("knn_ivf", _KNN_IVF_ORACLE)
def knn_ivf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 full IVF search: probe join (partition-prunable equi-join) +
    exact distance + top-k (inc/index/IVF.hpp:295-325 without
    quantization)."""
    base = _base_df(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    indexed = ivf.assign_clusters(base, cents)
    return ivf.ivf_search(_queries_df(spark, sf_dir), indexed, cents, NPROBE, K)


_RECALL_ORACLE = f"""
WITH {_ivf_ctes()}
SELECT g.qid,
       round(CAST(count(i.id) AS DOUBLE) / {K}, 6) AS recall
FROM (SELECT qid, id FROM gt WHERE rank <= {K}) g
LEFT JOIN (SELECT qid, id FROM ivf WHERE rank <= {K}) i
  ON g.qid = i.qid AND g.id = i.id
GROUP BY g.qid
"""


@register("ivf_recall", _RECALL_ORACLE)
def ivf_recall_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 recall@k of IVF vs exact ground truth (src/test_search.cpp:113-120)."""
    base, qs = _base_df(spark, sf_dir), _queries_df(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    indexed = ivf.assign_clusters(base, cents)
    res = ivf.ivf_search(qs, indexed, cents, NPROBE, K)
    gt = knn.exact_knn(qs, base, k=K)
    return metrics.recall_per_query(res, gt, K)


_RATIO_ORACLE = f"""
WITH {_ivf_ctes()}
SELECT qid, round(avg(sqrt(ann_d2 / gt_d2)), 6) AS ratio
FROM (SELECT i.qid, i.dist AS ann_d2, g.dist AS gt_d2
      FROM (SELECT * FROM ivf WHERE rank <= {K}) i
      JOIN (SELECT * FROM gt WHERE rank <= {K}) g USING (qid, rank)
      WHERE g.dist > 1e-5)
GROUP BY qid
"""


@register("ivf_ratio", _RATIO_ORACLE)
def ivf_ratio_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 average distance ratio (inc/utils/tools.hpp:16-51, incl. the
    gt>1e-5 guard at :39)."""
    base, qs = _base_df(spark, sf_dir), _queries_df(spark, sf_dir)
    cents = _centroids(spark, sf_dir)
    indexed = ivf.assign_clusters(base, cents)
    res = ivf.ivf_search(qs, indexed, cents, NPROBE, K)
    gt = knn.exact_knn(qs, base, k=K)
    return metrics.ratio_per_query(res, gt, K)


@register("ivf_assign_combined", _ASSIGN_ORACLE)
def ivf_assign_combined_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 scale path under the same oracle: the Arrow BLAS argmin
    assignment is value-identical to the declarative form (same
    lowest-cid tie-break; equality also asserted in tests) — numpy only
    computes the argmin, every emitted value is input data."""
    asn = ivf.assign_clusters_combined(
        _base_df(spark, sf_dir), _centroids(spark, sf_dir)
    )
    return asn.select("id", "cluster_id")


# --- IVF index-health + cluster-balanced curation (beyond-reference) -------

from ..operators import sampling as sampling_ops  # noqa: E402

_CELL_STATS_ORACLE = f"""
WITH {_ivf_ctes()}
SELECT cluster_id, count(*) AS n_vectors,
       CAST(sum(CAST(round(adist, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sum_dist
FROM (SELECT id, cluster_id, adist,
             row_number() OVER (PARTITION BY id ORDER BY adist, cluster_id) AS rn
      FROM ad)
WHERE rn = 1
GROUP BY cluster_id
"""


@register("ivf_cell_stats", _CELL_STATS_ORACLE)
def ivf_cell_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF cell-health audit: per-cluster population + exact-decimal
    total assignment distance (the imbalance/distortion report read
    before serving; cell skew = probe-latency skew).  DECIMAL stays
    internal per the output-type contract — one double conversion at
    the end on both engines."""
    return ivf.cell_stats(_base_df(spark, sf_dir), _centroids(spark, sf_dir))


_CBAL_N = 5

_CBAL_ORACLE = f"""
WITH {_ivf_ctes()},
ranked AS (SELECT id, cluster_id,
                  CAST(row_number() OVER (PARTITION BY cluster_id
                       ORDER BY {sampling_ops.d_bucket_expr('id', 'cbal')} ASC, id ASC)
                       AS BIGINT) AS pick_rank
           FROM asn)
SELECT id, cluster_id, pick_rank FROM ranked WHERE pick_rank <= {_CBAL_N}
"""


@register("cluster_balanced_sample", _CBAL_ORACLE)
def cluster_balanced_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-balanced curation subsample: at most N vectors per
    EMBEDDING cluster (argmin assignment to the deterministic centroids),
    picked by the portable hash order — equal representation across
    semantic regions (the balanced variant of cluster-scoped curation,
    cf. SemDeDup's cluster partitioning), reproducible under any
    partitioning because membership is a pure function of (id, salt).
    Composition of two checked primitives: J2 assignment +
    quota_sample's hash-rank window."""
    asn = ivf.assign_clusters(_base_df(spark, sf_dir), _centroids(spark, sf_dir))
    picked = sampling_ops.quota_sample(
        asn.select("id", "cluster_id"), _CBAL_N,
        group="cluster_id", salt="cbal", id_="id",
    )
    return picked.select("id", "cluster_id", "pick_rank")
