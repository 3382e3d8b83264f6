"""Trainable corpus-quality classifier (beyond the reference).

Large-scale LLM data curation gates web text with a LEARNED quality
classifier, not just hand rules: a small high-quality seed set is
labeled positive, random crawl text negative, and a linear model over
cheap text statistics scores every document (the GPT-3 appendix-A /
LLaMA / RedPajama "fastText or logistic-regression quality filter"
stage).  The rule-based gates here (``cleanops.gopher_filter``,
``textops.text_quality``) supply the features; this module adds the
learned combination.

Spark-first design:

- **Features are pure column expressions** (one projection, no Python,
  no shuffle): token counts, length, average token length, stopword /
  distinct-token ratios, digit and punctuation shares.  The same
  expressions run identically at training and serving time —
  train/serve skew is structurally impossible.
- **Training is MLlib** (``LogisticRegression``, JVM L-BFGS over
  ``treeAggregate`` — distributed, deterministic): only the d+1 model
  coefficients ever reach the driver.
- **Scoring is a JVM ``model.transform``** — whole-stage-codegen'd
  vector algebra, no Python in the hot path (plan-asserted in tests),
  so scoring 100 TB is a map-only pass.

The classifier is intentionally linear: auditable coefficients
(``explain_model``), cheap enough to score every document, and the
shape every published pipeline actually shipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..staging import stage_eager as _stage_eager, stage_lazy as _stage_lazy

from ..functions import text as T

# feature column order is part of the model contract (assembler input)
FEATURE_COLS = [
    "f_log_tokens",
    "f_avg_token_len",
    "f_stopword_ratio",
    "f_distinct_ratio",
    "f_digit_ratio",
    "f_punct_ratio",
    "f_max_token_share",
]


def quality_features(
    docs: DataFrame, id_: str = "doc_id", text: str = "text"
) -> DataFrame:
    """(doc_id, f_*) — one map-only projection of quality statistics.

    All expressions stay in whole-stage codegen; NULL-safe for empty
    text (ratios default 0, log1p(0) = 0).
    """
    from ..operators.textops import STOPWORDS, _arr_lit

    en = _arr_lit(STOPWORDS["en"])
    base = docs.select(
        F.col(id_).alias("doc_id"),
        F.expr(T.norm_text(text)).alias("_nrm"),
        F.expr(T.tokens(text)).alias("_toks"),
    ).select(
        "doc_id",
        "_nrm",
        "_toks",
        F.expr("size(_toks)").alias("_nt"),
        F.expr("CAST(length(_nrm) AS DOUBLE)").alias("_nc"),
    )
    nt = F.col("_nt")
    safe_nt = F.greatest(nt, F.lit(1)).cast("double")
    safe_nc = F.greatest(F.col("_nc"), F.lit(1.0))
    return base.select(
        "doc_id",
        F.log1p(nt.cast("double")).alias("f_log_tokens"),
        (
            F.expr(
                "aggregate(_toks, CAST(0.0 AS DOUBLE), (acc, t) -> acc + length(t))"
            )
            / safe_nt
        ).alias("f_avg_token_len"),
        (
            F.expr(f"CAST(size(filter(_toks, t -> array_contains({en}, t))) AS DOUBLE)")
            / safe_nt
        ).alias("f_stopword_ratio"),
        (F.expr("CAST(size(array_distinct(_toks)) AS DOUBLE)") / safe_nt).alias(
            "f_distinct_ratio"
        ),
        (F.expr("CAST(regexp_count(_nrm, '[0-9]') AS DOUBLE)") / safe_nc).alias(
            "f_digit_ratio"
        ),
        (
            F.expr("CAST(regexp_count(_nrm, '[^a-z0-9 ]') AS DOUBLE)") / safe_nc
        ).alias("f_punct_ratio"),
        # share of the single most-repeated token — the cheapest
        # repetition detector (Gopher's top-word share, as a feature).
        # Sort + run-length fold: O(n log n) per doc and still map-only
        # (the distinct×filter form is O(n²) on long documents, and an
        # explode→groupBy would add the shuffle this projection exists
        # to avoid).
        (
            F.expr(
                "CAST(aggregate(array_sort(_toks), "
                "named_struct('p', CAST(NULL AS STRING), 'r', 0, 'b', 0), "
                "(s, t) -> named_struct("
                "  'p', t, "
                "  'r', CASE WHEN s.p <=> t THEN s.r + 1 ELSE 1 END, "
                "  'b', greatest(s.b, CASE WHEN s.p <=> t THEN s.r + 1 ELSE 1 END)), "
                "s -> s.b) AS DOUBLE)"
            )
            / safe_nt
        ).alias("f_max_token_share"),
    ).fillna(0.0, subset=[c for c in FEATURE_COLS])


def train_quality_classifier(
    labeled_docs: DataFrame,
    label: str = "label",
    id_: str = "doc_id",
    text: str = "text",
    reg_param: float = 0.01,
    max_iter: int = 50,
):
    """Fit the quality LR on (doc_id, text, label∈{0,1}) → PipelineModel.

    The pipeline embeds the scaler + LR only; features are re-derived by
    :func:`score_quality` from the same column expressions (the model
    never sees raw text, so it serializes small and serves anywhere).
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    # Staged (lazy localCheckpoint, r10): Pipeline.fit consumes this
    # frame at least twice (the StandardScaler fit pass, then the LR's
    # own instance-persist pass), and each pass re-ran the tokenize +
    # run-length feature projection AND the weak-label join upstream.
    # Storing the blocks at first use runs the featurization once.
    # The fitted coefficients are bitwise-unchanged: same input values,
    # same partitioning, same treeAggregate order.
    feats = quality_features(labeled_docs, id_=id_, text=text).join(
        labeled_docs.select(F.col(id_).alias("doc_id"), F.col(label).alias("label")),
        on="doc_id",
    ).transform(_stage_lazy)
    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURE_COLS, outputCol="_fvec"),
            StandardScaler(
                inputCol="_fvec", outputCol="_fscaled", withMean=True, withStd=True
            ),
            LogisticRegression(
                featuresCol="_fscaled",
                labelCol="label",
                regParam=reg_param,
                maxIter=max_iter,
            ),
        ]
    )
    return pipe.fit(feats)


def score_quality(
    model,
    docs: DataFrame,
    id_: str = "doc_id",
    text: str = "text",
    threshold: float | None = None,
) -> DataFrame:
    """(doc_id, quality_score, quality_pred) for every document.

    ``quality_score`` is P(label=1); ``threshold`` overrides the model's
    0.5 decision cut (curation pipelines typically keep the top-scoring
    fraction instead — filter on ``quality_score`` directly for that).
    """
    from pyspark.ml.functions import vector_to_array

    feats = quality_features(docs, id_=id_, text=text)
    scored = model.transform(feats).select(
        "doc_id",
        vector_to_array("probability")[1].alias("quality_score"),
        F.col("prediction").cast("int").alias("quality_pred"),
    )
    if threshold is not None:
        scored = scored.withColumn(
            "quality_pred", (F.col("quality_score") >= threshold).cast("int")
        )
    return scored


def self_train_and_score(
    docs: DataFrame,
    id_: str = "doc_id",
    text: str = "text",
    threshold: float | None = None,
):
    """The no-labels bootstrap used by both the registered query and the
    CLI (one definition so they can't diverge): weak-label every doc
    with the Gopher rule gate (the standard move when no hand-labeled
    seed set ships with a corpus), fit the LR, score everything back.
    Returns (scored DataFrame, fitted model)."""
    from .cleanops import gopher_filter

    d = docs if id_ == "doc_id" else docs.withColumnRenamed(id_, "doc_id")
    weak = gopher_filter(d, text=text).select(
        "doc_id", F.col("keep").cast("int").alias("label")
    )
    model = train_quality_classifier(d.join(weak, on="doc_id"), text=text)
    return score_quality(model, d, text=text, threshold=threshold), model


def save_model(model, path: str) -> None:
    """Persist the fitted pipeline (MLlib parquet metadata — tiny: the
    scaler stats + d+1 coefficients).  Train once at curation time,
    load on any cluster and score with no retrain."""
    model.write().overwrite().save(path)


def load_model(path: str):
    from pyspark.ml import PipelineModel

    return PipelineModel.load(path)


def explain_model(model) -> dict:
    """Auditable coefficients: {feature: standardized weight} + intercept.
    Linear-model transparency is the point — a curation decision can be
    traced to 'too few stopwords, one token dominates'."""
    lr = model.stages[-1]
    coefs = list(map(float, lr.coefficients))
    return {
        "intercept": float(lr.intercept),
        "weights": dict(zip(FEATURE_COLS, coefs)),
    }
