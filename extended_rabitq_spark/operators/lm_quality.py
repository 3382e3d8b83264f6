"""Statistical corpus-LM quality scoring (CCNet's third pillar).

CCNet-style pipelines filter with three signals: rule heuristics
(``textops.text_quality`` / ``cleanops.gopher_quality_filter``), a
learned classifier (``quality_model``), and a corpus language-model
score (KenLM perplexity in the original).  This module is the third:
a character-trigram LM trained ON THE CORPUS ITSELF in one pass, then
a per-document typicality score — documents whose character transitions
are rare in the corpus (mojibake, binary spill, boilerplate soup, wrong
language) score low and can be filtered or curriculum-bucketed.

Scores are FIXED-POINT arithmetic-mean transition probabilities
(Σ ⌊10⁶·c(ctx,ch)/c(ctx) + ½⌋ as BIGINT), not log-space perplexity:
integer sums are order-independent and bitwise cross-engine (the
token_pmi / events_moving_avg convention), where a float log fold is
neither.  Arithmetic vs geometric mean changes the scale, not the
garbage-vs-fluent separation the filter needs; a true log-perplexity
needs only ``ln`` on the same joined frame if a consumer wants it.

Scale (100 TB): training is one map-side explode + one partial-agg
shuffle keyed (lang, ctx, ch) — character-level contexts keep the model
bounded (≤ |charset|² rows per language) regardless of corpus size.
Scoring is a map-side explode + broadcast joins against the model +
one partial-agg shuffle keyed doc_id.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIXED_POINT = 1_000_000


def _transitions(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, lang, ctx CHAR(2), ch CHAR(1)) — one row per character
    trigram of every document (docs shorter than 3 chars yield none)."""
    # CASE-guarded: Spark's sequence(1, 0) yields a DESCENDING [1, 0]
    # (not empty), which would mint phantom transitions for docs under
    # 3 characters.  The char array is materialized as a COLUMN first:
    # substring(text, i, ·) inside the lambda re-scans the string from
    # offset 0 per element (O(len²) per doc — measured 81 s at 50k
    # docs), while element_at over a pre-split array is O(len) total
    # (~3× faster end-to-end); values are identical (both operate on
    # characters).
    return docs.select(
        "doc_id", "lang", F.expr(f"split({text}, '')").alias("_cs")
    ).select(
        "doc_id",
        "lang",
        F.expr(
            "explode(CASE WHEN size(_cs) >= 3 "
            "THEN transform(sequence(1, size(_cs) - 2), "
            "i -> struct(concat(element_at(_cs, i), element_at(_cs, i + 1)) AS ctx, "
            "element_at(_cs, i + 2) AS ch)) "
            "ELSE array() END)"
        ).alias("t"),
    ).select("doc_id", "lang", "t.ctx", "t.ch")


def train_char_lm(docs: DataFrame, text: str = "text") -> DataFrame:
    """Corpus char-trigram counts → (lang, ctx, ch, c2, c1): c2 is the
    (ctx, ch) transition count, c1 the ctx context total — both per
    language, so the same byte patterns in different languages keep
    independent statistics (CCNet trains one LM per language)."""
    return _train_from_transitions(_transitions(docs, text))


def _train_from_transitions(t: DataFrame) -> DataFrame:
    """c1 derives from c2 by summing over ch (every transition has a ch),
    so training is ONE corpus pass + a model-sized re-aggregate — not two
    full explode passes."""
    c2 = t.groupBy("lang", "ctx", "ch").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("lang", "ctx").agg(F.sum("c2").alias("c1"))
    return c2.join(c1, on=["lang", "ctx"])


def lm_typicality(
    docs: DataFrame, lm: DataFrame | None = None, text: str = "text"
) -> DataFrame:
    """Per-document corpus-typicality: (doc_id, n_trans, score_fp).

    ``score_fp = Σ ⌊10⁶ · c2/c1 + ½⌋`` over the document's transitions
    (BIGINT — order-independent, cross-engine exact);
    ``score_fp / n_trans / 10⁶`` is the mean transition probability.
    ``lm`` defaults to a model trained on ``docs`` itself (self-scoring,
    the bootstrap mode); pass a persisted model to score new shards
    against a reference corpus.  Transitions unseen in the model (only
    possible with an external ``lm``) contribute probability 0.
    """
    t = _transitions(docs, text)
    if lm is None:
        # Self-scoring reads the transition table twice (train + score):
        # materialize it once executor-side instead of re-running the
        # explode+substring pass (the minhash localCheckpoint lesson).
        t = t.localCheckpoint(eager=False)
        lm = _train_from_transitions(t)
    scored = t.join(
        F.broadcast(lm), on=["lang", "ctx", "ch"], how="left"
    ).select(
        "doc_id",
        F.expr(
            f"CAST(coalesce(floor({FIXED_POINT} * (CAST(c2 AS DOUBLE) / "
            f"CAST(c1 AS DOUBLE)) + 0.5), 0) AS BIGINT)"
        ).alias("p_fp"),
    )
    return (
        docs.select("doc_id")
        .join(
            scored.groupBy("doc_id").agg(
                F.count("*").alias("n_trans"),
                F.sum("p_fp").alias("score_fp"),
            ),
            on="doc_id",
            how="left",
        )
        .select(
            "doc_id",
            F.coalesce("n_trans", F.lit(0)).cast("long").alias("n_trans"),
            F.coalesce("score_fp", F.lit(0)).cast("long").alias("score_fp"),
        )
    )
