"""SemDeDup — cluster-scoped semantic deduplication (Abbas et al. 2023).

The production embedding-dedup recipe for web-scale corpora: k-means the
embeddings into K clusters, then compare pairs ONLY within a cluster and
drop every member of a near-duplicate pair except one representative.
The clustering is what makes 100 TB feasible — the quadratic pair
comparison shrinks from N² to Σ|cluster|² ≈ N²/K, and each cluster's
pair join is an equi-join on cluster_id (co-partitioned, no broadcast of
the full corpus anywhere).

Relation to the existing dedup family: ``dedup_embedding_cosine`` is the
all-pairs oracle twin; ``dedup_embedding_ann`` prunes pairs by IVF
probes.  SemDeDup is the third point in that design space — the one the
LLM-data literature actually ships — and its keep/drop semantics (keep
the smallest id of each near-dup group, transitively within a cluster)
differ from pair emission, so it earns its own operator.

Determinism: centroids come from ``ivf.label_centroids`` in the
registered query (the deterministic k-means stand-in every IVF oracle
uses — production passes ``kmeans_centroids`` output); cosine folds are
bitwise cross-engine, so the τ comparison is too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..staging import stage_eager as _stage_eager, stage_lazy as _stage_lazy

from ..functions import vector as V


def semdedup(
    vectors: DataFrame,
    centroids: DataFrame,
    tau: float = 0.99,
    id_: str = "id",
    vec: str = "vec",
    dim: int | None = None,
) -> DataFrame:
    """→ (id, cluster_id, is_dup): ``is_dup`` marks rows having a
    SMALLER-id neighbor in the same cluster with cosine ≥ τ (so the
    minimum id of every near-dup group survives; SemDeDup §3 keeps one
    representative per group — min-id is the deterministic choice).

    vectors: (id, vec); centroids: (cluster_id, centroid).
    ``dim``: known vector width → unrolled argmin distance kernel
    (bitwise-identical; operators.knn.distance_col).
    """
    from .ivf import assign_clusters

    # materialize the assignment ONCE (r10): it feeds BOTH pair-join
    # sides and the final left join — without a barrier the argmin
    # cross-join + window appears three times in the plan (exchange
    # reuse recovers most of it: interleaved A/B measured a modest −5%
    # warm at sf0.1, kept for the explicit "cluster, stage, then dedup
    # per cluster" layout the SemDeDup recipe prescribes at scale).
    # The per-row norm ‖x‖ is staged here too (r10): cosine_sim per
    # pair folds the array THREE times (dot + both self-dots); the
    # quadratic Σ|cluster|² stage should pay only the dot.  Bitwise
    # identical: sqrt(l2sq_self(x)) is a deterministic function of the
    # row, and dot/(na*nb) is the same expression tree cosine_sim emits
    # — na/nb are the same doubles wherever they are computed.
    assigned = assign_clusters(
        vectors, centroids, id_=id_, vec=vec, dim=dim
    ).withColumn("_nrm", F.expr(f"sqrt({V.l2sq_self(vec)})")).transform(_stage_eager)
    a = assigned.select(
        F.col("cluster_id"), F.col(id_).alias("a_id"),
        F.col(vec).alias("a_vec"), F.col("_nrm").alias("a_nrm"),
    )
    b = assigned.select(
        F.col("cluster_id"), F.col(id_).alias("b_id"),
        F.col(vec).alias("b_vec"), F.col("_nrm").alias("b_nrm"),
    )
    dup_ids = (
        a.join(b, "cluster_id")  # co-partitioned equi-join: Σ|cluster|² pairs
        .where(F.col("a_id") < F.col("b_id"))
        .where(
            F.expr(V.cosine_sim_staged("a_vec", "b_vec", "a_nrm", "b_nrm"))
            >= F.lit(tau)
        )
        .select(F.col("b_id").alias("dup_id"))
        .distinct()
    )
    # No broadcast hint: on a heavily duplicated corpus dup_ids is
    # corpus-scale (SemDeDup removes up to ~50%), so force-broadcasting
    # it would OOM at exactly the scale this operator targets.  Left to
    # Catalyst/AQE, the join broadcasts only when dup_ids is small.
    return assigned.join(
        dup_ids, assigned[id_] == dup_ids["dup_id"], "left"
    ).select(
        F.col(id_).alias("id"),
        "cluster_id",
        F.col("dup_id").isNotNull().alias("is_dup"),
    )


def d_semdedup(nq: int, tau: float) -> str:
    """DuckDB oracle twin over the ``embeddings`` view (label-mean
    centroids, same argmin assignment, same min-id-survives rule)."""
    from .. import oracle as O

    return f"""
WITH b AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id >= {nq}),
ex AS (SELECT label, generate_subscripts(embedding, 1) - 1 AS pos, unnest(embedding) AS val
       FROM embeddings WHERE vec_id >= {nq}),
pd AS (SELECT label, pos, round(avg(CAST(val AS DOUBLE)), 6) AS c FROM ex GROUP BY label, pos),
cent AS (SELECT CAST(label AS INT) AS cluster_id, list(c ORDER BY pos) AS centroid
         FROM pd GROUP BY label),
asg AS (SELECT id, vec, cluster_id FROM (
    SELECT b.id, b.vec, c.cluster_id,
           row_number() OVER (PARTITION BY b.id
                ORDER BY {O.l2sq('b.vec', 'c.centroid')} ASC, c.cluster_id ASC) AS rn
    FROM b CROSS JOIN cent c) WHERE rn = 1),
dup AS (SELECT DISTINCT y.id AS dup_id
        FROM asg x JOIN asg y ON x.cluster_id = y.cluster_id AND x.id < y.id
        WHERE {O.cosine_sim('x.vec', 'y.vec')} >= {tau})
SELECT a.id, a.cluster_id, (d.dup_id IS NOT NULL) AS is_dup
FROM asg a LEFT JOIN dup d ON a.id = d.dup_id
"""
