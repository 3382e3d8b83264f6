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
from ..staging import stage_eager as _stage_eager, stage_lazy as _stage_lazy

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
        t = t.transform(_stage_lazy)
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


# ---------------------------------------------------------------------------
# Interpolated Kneser-Ney word-bigram scoring (KenLM's smoothing — the
# actual CCNet filter is a KN-smoothed n-gram LM; Kneser & Ney 1995,
# Chen & Goodman 1998).  The discount is fixed at D = 3/4 (the center of
# the Chen-Goodman estimate for singleton-heavy count tables), which
# makes EVERY term a ratio of integers:
#
#   P_KN(w2 | w1) = (c12 - 3/4) / c1
#                 + (3/4 · N1+(w1,·) / c1) · (N1+(·,w2) / N1+(·,·))
#
# so the fixed-point model is computed with round-half-up INTEGER
# division only — bitwise identical across engines by the integer-math
# contract, strictly stronger than the float-division convention above
# (no IEEE divide in the chain at all).  Fixed-point composition (each
# factor rounded to 10⁶ before the product) is part of the definition
# and mirrored verbatim in the DuckDB oracle.
#
# Overflow bound: the widest numerator is 10⁶·4·max(c12, n1p_fwd); BIGINT
# arithmetic is exact while per-language token counts stay < ~2.3·10¹²
# (≳10 TB of text per language) — past that, cast the two c1-denominator
# divisions to DECIMAL(38,0) (the ivf_cell_stats convention).

KN_DISCOUNT = (3, 4)  # D = 3/4 as an exact rational


def _word_bigrams(docs: DataFrame, text: str = "text") -> DataFrame:
    """(doc_id, lang, w1, w2) — one row per adjacent token pair of the
    whitespace-normalized lowercase token stream (functions.text.tokens,
    the token_pmi convention).  Docs under 2 tokens yield no rows."""
    from ..functions import text as T

    return docs.select(
        "doc_id", "lang", F.expr(T.tokens(text)).alias("_toks")
    ).select(
        "doc_id",
        "lang",
        F.expr(
            "explode(CASE WHEN size(_toks) >= 2 "
            "THEN transform(sequence(0, size(_toks) - 2), "
            "i -> struct(_toks[i] AS w1, _toks[i + 1] AS w2)) "
            "ELSE array() END)"
        ).alias("b"),
    ).select("doc_id", "lang", "b.w1", "b.w2")


def train_kn_bigram(docs: DataFrame, text: str = "text") -> DataFrame:
    """Per-language interpolated-KN bigram model →
    (lang, w1, w2, p_fp BIGINT) with p_fp = ⌊10⁶·P_KN⌉ (integer-exact)."""
    return _kn_model_from_bigrams(_word_bigrams(docs, text))


def _kn_model_from_bigrams(bg: DataFrame) -> DataFrame:
    """Every KN statistic derives from the bigram TYPE table ``c12``
    (model-sized), not from extra corpus passes: c1 and the forward
    continuation count N1+(w1,·) by summing/counting over w2, the
    backward continuation count N1+(·,w2) over w1, and the per-language
    type total N1+(·,·) over both."""
    c12 = bg.groupBy("lang", "w1", "w2").agg(F.count("*").alias("c12"))
    byw1 = c12.groupBy("lang", "w1").agg(
        F.sum("c12").alias("c1"), F.count("*").alias("n1p_fwd")
    )
    byw2 = c12.groupBy("lang", "w2").agg(F.count("*").alias("n1p_bwd"))
    types = c12.groupBy("lang").agg(F.count("*").alias("n_types"))
    m = (
        c12.join(byw1, on=["lang", "w1"])
        .join(byw2, on=["lang", "w2"])
        .join(F.broadcast(types), on=["lang"])
    )
    fp = FIXED_POINT
    return m.select(
        "lang",
        "w1",
        "w2",
        F.expr(
            f"CAST(({fp} * (4 * c12 - 3) + (4 * c1) DIV 2) DIV (4 * c1) "
            f"+ ((({fp} * 3 * n1p_fwd + (4 * c1) DIV 2) DIV (4 * c1)) "
            f"* (({fp} * n1p_bwd + n_types DIV 2) DIV n_types) "
            f"+ {fp // 2}) DIV {fp} AS BIGINT)"
        ).alias("p_fp"),
    )


def kn_bigram_score(
    docs: DataFrame, lm: DataFrame | None = None, text: str = "text"
) -> DataFrame:
    """Per-document KN-bigram typicality: (doc_id, n_bigrams, kn_score_fp).

    ``kn_score_fp = Σ p_fp`` over the document's adjacent token pairs
    (BIGINT — order-independent, cross-engine exact);
    ``kn_score_fp / n_bigrams / 10⁶`` is the mean KN probability.  Self-
    scoring (lm=None) trains on ``docs`` itself, so every scored bigram
    is in the model (c12 ≥ 1 and the max(c12-D, 0) clamp never binds);
    with an external ``lm`` unseen bigrams contribute 0.

    Scale: the model join is keyed (lang, w1, w2) and NOT forced to
    broadcast — word-bigram type tables grow with the corpus (unlike the
    char-trigram model above); AQE picks broadcast when it fits.
    Scoring is one equi-join shuffle + one partial-agg shuffle on
    doc_id.  No Python anywhere."""
    bg = _word_bigrams(docs, text)
    if lm is None:
        bg = bg.transform(_stage_lazy)
        lm = _kn_model_from_bigrams(bg)
    scored = bg.join(lm, on=["lang", "w1", "w2"], how="left").select(
        "doc_id", F.coalesce("p_fp", F.lit(0)).alias("p_fp")
    )
    return (
        docs.select("doc_id")
        .join(
            scored.groupBy("doc_id").agg(
                F.count("*").alias("n_bigrams"),
                F.sum("p_fp").alias("kn_score_fp"),
            ),
            on="doc_id",
            how="left",
        )
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("kn_score_fp", F.lit(0)).cast("long").alias("kn_score_fp"),
        )
    )
