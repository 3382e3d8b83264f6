"""Learned quality classifier: planted-corpus separability, JVM-only
scoring plan, coefficient transparency, and the registered self-trained
query's contract."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

CLEAN_WORDS = (
    "the and for with this that from have will where table query index "
    "system window stream batch merge result value order group".split()
)
JUNK_TOKENS = ["zxqv", "777", "rrrr", "@@##"]


def _corpus(spark, n_clean=60, n_junk=60, seed=3):
    """Half natural-ish English (stopwords, varied vocab), half junk
    (one dominating token, digit/punct spam, no stopwords)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_clean):
        words = list(rng.choice(CLEAN_WORDS, size=40))
        rows.append((i, " ".join(words), 1))
    for i in range(n_junk):
        tok = JUNK_TOKENS[i % len(JUNK_TOKENS)]
        n = int(rng.integers(20, 60))
        rows.append((n_clean + i, " ".join([tok] * n), 0))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


class TestQualityModel:
    def test_planted_corpus_separates(self, spark):
        from extended_rabitq_spark.operators import quality_model as qm

        corpus = _corpus(spark)
        train = corpus.where(F.col("doc_id") % 2 == 0)
        test = corpus.where(F.col("doc_id") % 2 == 1)
        model = qm.train_quality_classifier(train)
        scored = qm.score_quality(model, test).join(
            test.select("doc_id", "label"), on="doc_id"
        )
        rows = scored.collect()
        acc = sum(int(r.quality_pred == r.label) for r in rows) / len(rows)
        assert acc >= 0.95, acc
        clean_mean = np.mean([r.quality_score for r in rows if r.label == 1])
        junk_mean = np.mean([r.quality_score for r in rows if r.label == 0])
        assert clean_mean > 0.8 > 0.2 > junk_mean

    def test_scoring_plan_is_jvm_only(self, spark):
        """Scoring 100 TB must be a map-only JVM pass: no Python eval
        nodes anywhere in the transform plan."""
        from extended_rabitq_spark.operators import quality_model as qm

        corpus = _corpus(spark, n_clean=20, n_junk=20)
        model = qm.train_quality_classifier(corpus)
        plan = qm.score_quality(model, corpus)._jdf.queryExecution().executedPlan().toString()
        for bad in ("PythonUDF", "InPandas", "BatchEvalPython", "ArrowEval"):
            assert bad not in plan, f"Python node {bad} in scoring plan"
        assert "Exchange" not in plan, "scoring must be map-only (no shuffle)"

    def test_explain_model_names_every_feature(self, spark):
        from extended_rabitq_spark.operators import quality_model as qm

        model = qm.train_quality_classifier(_corpus(spark, 20, 20))
        info = qm.explain_model(model)
        assert set(info["weights"]) == set(qm.FEATURE_COLS)
        # junk is one dominating token: its share must push DOWN quality
        assert info["weights"]["f_max_token_share"] < 0
        # stopwords are the clean marker: must push UP
        assert info["weights"]["f_stopword_ratio"] > 0

    def test_threshold_override(self, spark):
        from extended_rabitq_spark.operators import quality_model as qm

        corpus = _corpus(spark, 20, 20)
        model = qm.train_quality_classifier(corpus)
        strict = qm.score_quality(model, corpus, threshold=0.99)
        loose = qm.score_quality(model, corpus, threshold=0.01)
        assert (
            strict.agg(F.sum("quality_pred")).first()[0]
            <= loose.agg(F.sum("quality_pred")).first()[0]
        )

    def test_registered_query_contract(self, spark):
        """The self-trained registered query returns one scored row per
        document with the declared schema (rows-only driver check)."""
        import __spark_entry__ as e

        q = e.queries()["quality_classifier_score"]
        df = q(spark, SF_SMOKE)
        assert [f.name for f in df.schema.fields] == [
            "doc_id", "quality_score", "quality_pred",
        ]
        n_docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").count()
        rows = df.collect()
        assert len(rows) == n_docs
        assert all(0.0 <= r.quality_score <= 1.0 for r in rows)

    def test_model_persistence_roundtrip(self, spark, tmp_path):
        """save/load: a reloaded model scores bit-identically — the
        train-once / serve-anywhere contract."""
        from extended_rabitq_spark.operators import quality_model as qm

        corpus = _corpus(spark, 20, 20)
        model = qm.train_quality_classifier(corpus)
        path = str(tmp_path / "qmodel")
        qm.save_model(model, path)
        reloaded = qm.load_model(path)
        a = sorted(map(tuple, qm.score_quality(model, corpus).collect()))
        b = sorted(map(tuple, qm.score_quality(reloaded, corpus).collect()))
        assert a == b
        assert qm.explain_model(reloaded) == qm.explain_model(model)
