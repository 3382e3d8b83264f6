"""Composed training-data pipeline query (north-star surface): the
operators of this engine chained the way a 100 TB corpus-cleaning job
chains them, in ONE declarative plan with a full DuckDB oracle.

Stages (all SQL-expressible, so the driver's t2 gate checks the whole
composition end-to-end):

1. exact dedup     — md5(normalized text) groupBy, min-doc_id survivor;
2. quality filter  — token count + type/token distinct ratio thresholds;
3. near-dup prune  — embedding-cosine pairs ≥ τ among survivors, drop
                     the higher doc_id (keep-lowest policy, same as
                     stage 1);
4. output          — the cleaned corpus with per-doc quality columns.

Scale notes: stage 1 is one hash shuffle with map-side partial agg;
stage 2 is a map-only projection; stage 3 here is the exact all-pairs
form (fixture-sized, oracle-checkable) — at corpus scale swap in
``dedup.embedding_ann_pairs`` (distributed ANN self-join) or
``dedup.simhash_banded_pairs``, both value-tested against their exact
twins; stage 4 is a broadcast anti-join on the (small) drop list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from ..staging import stage_eager as _stage_eager, stage_lazy as _stage_lazy

from .. import oracle as O
from ..functions import text as T
from ..operators import dedup as dedup_ops
from ..operators import textops
from ..registry import register
from ..tables import read_parquet

MIN_TOKENS = 8
MIN_DISTINCT_RATIO = 0.3
COS_TAU = 0.45

_D_NORM = T.d_norm_text("text")
_D_TOKS = T.d_tokens("text")

_PIPELINE_ORACLE = f"""
WITH surv AS (
    SELECT min(doc_id) AS doc_id
    FROM documents
    GROUP BY md5({_D_NORM})
),
q AS (
    SELECT d.doc_id, d.lang,
           CAST(len({_D_TOKS}) AS BIGINT) AS n_tokens,
           round(CAST(len(list_distinct({_D_TOKS})) AS DOUBLE) / len({_D_TOKS}), 6)
             AS distinct_ratio_r
    FROM documents d JOIN surv USING (doc_id)
),
kept AS (
    SELECT q.doc_id, q.lang, q.n_tokens, q.distinct_ratio_r, e.embedding
    FROM q JOIN embeddings e ON e.vec_id = q.doc_id
    WHERE q.n_tokens >= {MIN_TOKENS} AND q.distinct_ratio_r >= {MIN_DISTINCT_RATIO}
),
drops AS (
    SELECT DISTINCT b.doc_id
    FROM kept a JOIN kept b ON a.doc_id < b.doc_id
    WHERE {O.cosine_sim('a.embedding', 'b.embedding')} >= {COS_TAU}
)
SELECT k.doc_id, k.lang, k.n_tokens, k.distinct_ratio_r
FROM kept k LEFT JOIN drops USING (doc_id)
WHERE drops.doc_id IS NULL
"""


@register("pipeline_clean_corpus", _PIPELINE_ORACLE)
def pipeline_clean_corpus_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup → quality filter → embedding near-dup prune, composed
    as one plan.  This registered form uses the exact all-pairs stage 3
    (the oracle twin); :func:`pipeline_clean_corpus` exposes the
    ``scale=True`` knob that swaps in the ANN near-dup prune."""
    return pipeline_clean_corpus(spark, sf_dir, scale=False)


def pipeline_clean_corpus(
    spark: SparkSession, sf_dir: str, scale: bool = False
) -> DataFrame:
    """The composed cleaning pipeline with a documented scale knob.

    ``scale=False``: stage 3 near-dup prune is the exact all-pairs
    cosine join — O(N²), fixture-sized, oracle-checkable.

    ``scale=True``: stage 3 runs
    :func:`...operators.dedup.embedding_threshold_pairs_ann` — the
    distributed ANN self-join (equi-joins only, query side never
    collects) — so the whole composition is runnable at corpus scale.
    Value-tested equal to the exact form on fixtures
    (tests/test_dedup_text.py)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")

    surv = dedup_ops.exact_dedup(docs).select(F.col("keep_doc_id").alias("doc_id"))
    # r10 (guide §2.4): quality is a pure per-row projection of docs —
    # carry `lang` through it instead of re-joining the projection
    # against docs on doc_id (that self-join was a full two-exchange
    # SortMergeJoin of the corpus).  The quality filter now also runs
    # BEFORE the survivor semi-join, shrinking its probe side; the
    # survivor set stays the skew-safe partial-agg groupBy (a window
    # survivor would put every exact-dup clone of a hot document into
    # one partition).  Row set unchanged: semi-join ∩ filter commute.
    quality = textops.text_quality(docs, keep=("lang",)).select(
        "doc_id", "lang", "n_tokens", "distinct_ratio_r"
    )
    kept = (
        quality.where(
            (F.col("n_tokens") >= MIN_TOKENS)
            & (F.col("distinct_ratio_r") >= MIN_DISTINCT_RATIO)
        )
        .join(surv, on="doc_id", how="left_semi")
        .join(emb.select(F.col("vec_id").alias("doc_id"), "embedding"), on="doc_id")
        # stage barrier: `kept` feeds stage 3 from several angles (pair
        # finder sides + the final anti-join); without materialization
        # each reference re-runs dedup+quality upstream (~5×).  Any real
        # pipeline persists the filtered corpus between stages — at
        # 100 TB this is the parquet handoff between jobs.
        .transform(_stage_eager)
    )
    if scale:
        pairs = dedup_ops.embedding_threshold_pairs_ann(
            kept.select(F.col("doc_id").alias("vec_id"), "embedding"),
            threshold=COS_TAU,
        )
        drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    else:
        # exact all-pairs semantics, BLAS-selected + declaratively
        # re-scored (value-identical to the SQL cross join the oracle
        # runs; see embedding_cosine_pairs_combined)
        pairs = dedup_ops.embedding_cosine_pairs_combined(
            kept.select(F.col("doc_id").alias("vec_id"), "embedding"),
            threshold=COS_TAU,
        )
        drops = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return kept.join(F.broadcast(drops), on="doc_id", how="left_anti").select(
        "doc_id", "lang", "n_tokens", "distinct_ratio_r"
    )
