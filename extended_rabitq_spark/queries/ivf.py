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
from ..tables import NQ, read_parquet, embedding_dim
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
    asn = ivf.assign_clusters(
        _base_df(spark, sf_dir), _centroids(spark, sf_dir),
        dim=embedding_dim(spark, sf_dir),
    )
    return asn.select("id", "cluster_id")


_PROBES_ORACLE = f"""
WITH {_ivf_ctes()}
SELECT qid, probe_rank, cluster_id, round(cdist, 6) AS cdist_r FROM probes
"""


@register("ivf_probes", _PROBES_ORACLE)
def ivf_probes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 top-nprobe centroid selection (inc/index/Initializer.hpp:55-68)."""
    pr = ivf.select_probes(
        _queries_df(spark, sf_dir), _centroids(spark, sf_dir), NPROBE,
        dim=embedding_dim(spark, sf_dir),
    )
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
    d = embedding_dim(spark, sf_dir)
    indexed = ivf.assign_clusters(base, cents, dim=d)
    return ivf.ivf_search(_queries_df(spark, sf_dir), indexed, cents, NPROBE, K, dim=d)


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
    d = embedding_dim(spark, sf_dir)
    indexed = ivf.assign_clusters(base, cents, dim=d)
    res = ivf.ivf_search(qs, indexed, cents, NPROBE, K, dim=d)
    gt = knn.exact_knn(qs, base, k=K, dim=embedding_dim(spark, sf_dir))
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
    d = embedding_dim(spark, sf_dir)
    indexed = ivf.assign_clusters(base, cents, dim=d)
    res = ivf.ivf_search(qs, indexed, cents, NPROBE, K, dim=d)
    gt = knn.exact_knn(qs, base, k=K, dim=embedding_dim(spark, sf_dir))
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
from ..operators import adaptive as adaptive_ops  # noqa: E402

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
    return ivf.cell_stats(
        _base_df(spark, sf_dir), _centroids(spark, sf_dir),
        dim=embedding_dim(spark, sf_dir),
    )


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
    asn = ivf.assign_clusters(
        _base_df(spark, sf_dir), _centroids(spark, sf_dir),
        dim=embedding_dim(spark, sf_dir),
    )
    picked = sampling_ops.quota_sample(
        asn.select("id", "cluster_id"), _CBAL_N,
        group="cluster_id", salt="cbal", id_="id",
    )
    return picked.select("id", "cluster_id", "pick_rank")


NPROBE_LO, NPROBE_HI = 2, 6
_ADA_SEP = "0.6"   # textual literal shared by both engines (bitwise)
_ADA_DIMS = 7

# Derived attestation geometry: vec = [label·SEP] ⊕ first-7 embedding
# dims.  The natural sf embeddings are weakly clustered (per-cell max
# radius ≈ centroid spacing), so the triangle-inequality certificate is
# vacuous there — every query escalates and a driver row would pin the
# trivial all-escalate case (the same critique VERDICT r8 item 3 made
# of the first adaptive-prune attestation).  Prepending one label-
# proportional coordinate at SEP=0.6 puts the geometry at the
# certificate's decision boundary: 6-8 of the 10 driver queries
# escalate and the rest converge (verified at sf0.001/0.01/0.1), so the
# hash pins BOTH verdict branches and both result-routing paths.  Every
# construct is a shared IEEE-exact expression (int→double cast, one
# double multiply, float→double casts), so Spark and DuckDB build
# bitwise-identical vectors.
_ADA_VEC_DUCK = (
    f"list_prepend(CAST(label AS DOUBLE) * {_ADA_SEP}, "
    f"list_transform(embedding[1:{_ADA_DIMS}], v -> CAST(v AS DOUBLE)))"
)
_ADA_VEC_SPARK = (
    f"concat(array(CAST(label AS DOUBLE) * {_ADA_SEP}), "
    f"transform(slice(embedding, 1, {_ADA_DIMS}), v -> CAST(v AS DOUBLE)))"
)


def _ada_ctes() -> str:
    """The _ivf_ctes pipeline over the derived attestation vectors, plus
    the adaptive-rule CTEs (cheap-pass k-th distance, per-cell radii,
    tail triangle bounds, verdict)."""
    return f"""
q AS (SELECT vec_id AS qid, {_ADA_VEC_DUCK} AS qvec FROM embeddings WHERE vec_id < {NQ}),
b AS (SELECT vec_id AS id, {_ADA_VEC_DUCK} AS vec, label FROM embeddings WHERE vec_id >= {NQ}),
ex AS (SELECT label, generate_subscripts(vec, 1) - 1 AS pos, unnest(vec) AS val FROM b),
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
probes AS (SELECT * FROM pb WHERE probe_rank <= {NPROBE_HI}),
cand AS (SELECT p.qid, a.id, {O.l2sq('q2.qvec', 'a.vec')} AS dist
         FROM asn a JOIN probes p ON a.cluster_id = p.cluster_id
                    JOIN q q2 ON q2.qid = p.qid),
ivf AS (SELECT qid, id, dist,
               CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS BIGINT) AS rank
        FROM cand),
lo_cand AS (SELECT p.qid, a.id, {O.l2sq('q2.qvec', 'a.vec')} AS dist
            FROM asn a JOIN probes p ON a.cluster_id = p.cluster_id
                                    AND p.probe_rank <= {NPROBE_LO}
                       JOIN q q2 ON q2.qid = p.qid),
lo AS (SELECT qid, id, dist,
              CAST(row_number() OVER (PARTITION BY qid ORDER BY dist, id) AS BIGINT) AS rank
       FROM lo_cand),
agg AS (SELECT qid, count(*) AS n_lo, max(dist) AS distk
        FROM lo WHERE rank <= {K} GROUP BY qid),
radii AS (SELECT a.cluster_id, sqrt(max({O.l2sq('a.vec', 'c.centroid')})) AS radius
          FROM asn a JOIN cent c USING (cluster_id) GROUP BY a.cluster_id),
tails AS (SELECT p.qid,
                 min(greatest(sqrt(p.cdist) - r.radius, 0) *
                     greatest(sqrt(p.cdist) - r.radius, 0)) AS min_bound
          FROM probes p JOIN radii r USING (cluster_id)
          WHERE p.probe_rank > {NPROBE_LO} GROUP BY p.qid),
verd AS (SELECT q.qid,
                CAST(coalesce(g.n_lo, 0) AS BIGINT) AS n_lo,
                CASE WHEN coalesce(g.n_lo, 0) < {K} THEN true
                     WHEN t.min_bound IS NULL THEN false
                     ELSE t.min_bound <= g.distk END AS escalate
         FROM q LEFT JOIN agg g USING (qid) LEFT JOIN tails t USING (qid))"""


def _ada_frames(spark: SparkSession, sf_dir: str):
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    vec = F.expr(_ADA_VEC_SPARK)
    base = emb.where(F.col("vec_id") >= NQ).select(
        F.col("vec_id").alias("id"), vec.alias("vec"), "label"
    )
    qs = emb.where(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("qid"), vec.alias("qvec")
    )
    cents = ivf.label_centroids(base, vec="vec")
    indexed = ivf.assign_clusters(base.select("id", "vec"), cents)
    return qs, indexed, cents


_KNN_IVF_ADAPTIVE_ORACLE = f"""
WITH {_ada_ctes()}
SELECT qid, rank, id, dist FROM ivf WHERE rank <= {K}
"""


@register("knn_ivf_adaptive", _KNN_IVF_ADAPTIVE_ORACLE)
def knn_ivf_adaptive_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive probe escalation over exact IVF (operators/adaptive.py):
    every query searches nprobe_lo cells, and only queries whose k-th
    result the triangle-inequality cell bound cannot certify re-search
    at nprobe_hi — the cross-probe analog of the reference's sequential
    distk prune (inc/index/Searcher.hpp:217-233; the reference itself
    fixes one global nprobe per sweep point, src/test_search.cpp:97-134).

    The oracle is the FIXED nprobe_hi search: at margin=0 the
    certificate is a theorem for exact distances, so the driver hash
    checks the optimization is LOSSLESS — and on the mixed attestation
    geometry (module note above) both routing branches contribute rows,
    so the equality is non-trivial on each."""
    qs, indexed, cents = _ada_frames(spark, sf_dir)
    return adaptive_ops.ivf_search_adaptive(
        qs, indexed, cents, k=K, nprobe_lo=NPROBE_LO, nprobe_hi=NPROBE_HI,
    )


_IVF_ADAPTIVE_VERDICTS_ORACLE = f"""
WITH {_ada_ctes()}
SELECT qid, n_lo,
       CAST(CASE WHEN escalate THEN 1 ELSE 0 END AS BIGINT) AS escalated,
       CAST(CASE WHEN escalate THEN {NPROBE_HI} ELSE {NPROBE_LO} END AS BIGINT)
         AS nprobe_eff
FROM verd
"""


@register("ivf_adaptive_verdicts", _IVF_ADAPTIVE_VERDICTS_ORACLE)
def ivf_adaptive_verdicts_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The escalation DECISION itself, value-checked end-to-end: per
    query the cheap-pass row count, the escalate verdict, and the
    effective probe budget — a MIX of verdicts by construction (6-8 of
    10 escalate at the gate scales).  The oracle replays the full rule
    in SQL — cheap-pass k-th distance, per-cell radii, tail-cell
    triangle bounds — bitwise-reproducible because every float on both
    sides is a left-to-right l2 fold, an IEEE sqrt, or an exact
    self-multiply (no pow, no cross-row float accumulation)."""
    qs, indexed, cents = _ada_frames(spark, sf_dir)
    _, stats = adaptive_ops.ivf_search_adaptive(
        qs, indexed, cents,
        k=K, nprobe_lo=NPROBE_LO, nprobe_hi=NPROBE_HI, return_stats=True,
    )
    return stats.select(
        "qid", "n_lo",
        F.col("escalate").cast("long").alias("escalated"),
        F.col("nprobe_eff"),
    )
