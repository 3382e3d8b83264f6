"""Registered corpus-cleaning / export queries + DuckDB oracles.

Beyond-reference pipeline stages (SURVEY §2.8 north star): CCNet-style
segment dedup, overlapping chunking, deterministic shard export, a
Gopher-style quality gate, and per-source tf·idf salient terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import cleanops
from ..registry import register
from ..tables import read_parquet


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_parquet(spark, f"{sf_dir}/documents.parquet")


@register("dedup_lines", cleanops.d_segment_dedup())
def dedup_lines_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style duplicated-segment removal (10-token segments; a
    segment occurring in ≥ 2 distinct docs is dropped everywhere)."""
    from ..tables import spread_small_scan

    return cleanops.segment_dedup(spread_small_scan(_docs(spark, sf_dir), spark))


@register("doc_chunks", cleanops.d_doc_chunks())
def doc_chunks_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 120-char / 80-stride chunking (map-only explode)."""
    return cleanops.doc_chunks(_docs(spark, sf_dir))


@register("training_shard_export", cleanops.d_shard_export())
def shard_export_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic salted-hash shuffle into 8 training shards with a
    stable intra-shard position."""
    return cleanops.shard_export(_docs(spark, sf_dir))


@register("gopher_quality_filter", cleanops.d_gopher_filter())
def gopher_filter_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule gate; every rule an integer-exact comparison."""
    return cleanops.gopher_filter(_docs(spark, sf_dir))


@register("tfidf_top_terms", cleanops.d_tfidf_terms())
def tfidf_terms_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 tf·idf terms per source (ratio-form idf, cross-engine
    exact)."""
    return cleanops.tfidf_terms(_docs(spark, sf_dir))


@register("corpus_integrity_audit", cleanops.d_integrity_audit())
def integrity_audit_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset-quality audit: doc↔embedding referential
    integrity, metadata drift, vector-payload health."""
    return cleanops.integrity_audit(
        _docs(spark, sf_dir),
        read_parquet(spark, f"{sf_dir}/embeddings.parquet"),
    )


@register("dedup_spans", cleanops.d_span_dedup())
def dedup_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-span dedup: maximal cross-doc duplicated
    10-token spans at any alignment (stride-1 windows)."""
    return cleanops.span_dedup(_docs(spark, sf_dir))


@register("source_divergence", cleanops.d_source_divergence())
def source_divergence_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source total-variation drift vs the corpus token
    distribution (integer-exact; the data-mixing QA diagnostic)."""
    return cleanops.source_divergence(_docs(spark, sf_dir))


@register("quality_classifier_score")  # rows-only: learned weights are
# not SQL-expressible (see tests/test_quality_model.py for the planted-
# corpus accuracy + JVM-only-scoring plan assertions)
def quality_classifier_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learned quality filter (r5, beyond the reference): the
    fastText/LR classifier stage of LLM curation, self-trained here
    with the Gopher rule gate as the weak positive label (the standard
    bootstrap when no hand-labeled seed set ships with the corpus) and
    scored back over every document — (doc_id, quality_score,
    quality_pred).  Features are one codegen projection; training is
    MLlib L-BFGS (only d+1 coefficients reach the driver); scoring is
    a JVM transform — no Python anywhere."""
    from ..operators import quality_model

    scored, _model = quality_model.self_train_and_score(_docs(spark, sf_dir))
    return scored


N_BENCH_DECON = 20  # same fixture benchmark set as contamination_check


@register(
    "decontaminate_ngrams",
    cleanops.d_decontaminate_ngrams(f"doc_id < {N_BENCH_DECON}"),
)
def decontaminate_ngrams_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-3/PaLM n-gram decontamination with span REMOVAL (n=13,
    margin=20): contamination_check FLAGS eval overlap; this op CLEANS
    it — tokens covered by any benchmark 13-gram collision (± margin)
    are removed and the surviving text re-joined, so one quoted eval
    sentence no longer costs the whole document.  → (doc_id, n_tokens,
    n_removed, clean_text) for every non-benchmark doc."""
    from pyspark.sql import functions as F

    docs = _docs(spark, sf_dir)
    bench_ids = docs.select("doc_id").where(F.col("doc_id") < N_BENCH_DECON)
    return cleanops.decontaminate_ngrams(docs, bench_ids)
