"""Text-analysis operators for training-data pipelines (north-star
surface; BASELINE.json): language-ID, quality scoring, token counting,
document fingerprinting.  All pure column expressions (codegen, no UDFs)
— at 100 TB these run as a single map-only pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..staging import stage_eager as _stage_eager, stage_lazy as _stage_lazy

from ..functions import text as T

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "en", "que", "los", "se"],
    "de": ["der", "die", "das", "und", "den", "von", "zu", "mit"],
    "fr": ["le", "la", "de", "et", "les", "des", "un", "une"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic tie-break priority


def _arr_lit(words: list[str]) -> str:
    return "array(" + ", ".join(f"'{w}'" for w in words) + ")"


def lang_scores_exprs(toks: str) -> dict[str, str]:
    return {
        lang: f"size(filter({toks}, t -> array_contains({_arr_lit(STOPWORDS[lang])}, t)))"
        for lang in LANG_ORDER
    }


def lang_id(docs: DataFrame, id_: str = "doc_id", text: str = "text") -> DataFrame:
    """Heuristic language-ID: stopword hit count per language, argmax with
    fixed priority tie-break → (doc_id, lang_pred, lang_score)."""
    scores = lang_scores_exprs("_toks")
    best = " ".join(
        f"WHEN s_{lang} = best THEN '{lang}'" for lang in LANG_ORDER
    )
    d = (
        docs.select(F.col(id_).alias("doc_id"), F.expr(T.tokens(text)).alias("_toks"))
        .select(
            "doc_id",
            *[F.expr(e).cast("long").alias(f"s_{lang}") for lang, e in scores.items()],
        )
        .withColumn("best", F.greatest(*[F.col(f"s_{lang}") for lang in LANG_ORDER]))
    )
    return d.select(
        "doc_id",
        F.expr(f"CASE {best} END").alias("lang_pred"),
        F.col("best").alias("lang_score"),
    )


def text_quality(
    docs: DataFrame,
    id_: str = "doc_id",
    text: str = "text",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """Quality metrics → (doc_id, n_tokens, n_chars_norm, avg_token_len_r,
    stopword_ratio_r, distinct_ratio_r).  distinct_ratio (type/token) is
    the cheap repetition detector.

    ``keep``: extra input columns carried through unchanged — this is a
    pure per-row projection, so composers (the clean-corpus pipeline)
    that need quality columns NEXT TO other doc columns should pass
    them here instead of re-joining the output against the input on
    doc_id (a full two-exchange self-join of the corpus; guide §2.4)."""
    en = _arr_lit(STOPWORDS["en"])
    toks = "_toks"
    return docs.select(
        F.col(id_).alias("doc_id"),
        *[F.col(c) for c in keep],
        F.expr(T.norm_text(text)).alias("_nrm"),
        F.expr(T.tokens(text)).alias("_toks"),
    ).select(
        "doc_id",
        *keep,
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_tokens"),
        F.expr("CAST(length(_nrm) AS BIGINT)").alias("n_chars_norm"),
        F.round(
            F.expr(
                f"aggregate({toks}, CAST(0.0 AS DOUBLE), (acc, t) -> acc + length(t)) / size({toks})"
            ),
            6,
        ).alias("avg_token_len_r"),
        F.round(
            F.expr(
                f"CAST(size(filter({toks}, t -> array_contains({en}, t))) AS DOUBLE) / size({toks})"
            ),
            6,
        ).alias("stopword_ratio_r"),
        F.round(
            F.expr(f"CAST(size(array_distinct({toks})) AS DOUBLE) / size({toks})"), 6
        ).alias("distinct_ratio_r"),
    )


def token_count(docs: DataFrame, id_: str = "doc_id", text: str = "text") -> DataFrame:
    """Token counting two ways: whitespace tokens and a BPE-ish regex
    ([a-z0-9]+ word pieces) → (doc_id, ws_tokens, re_tokens)."""
    toks = T.tokens(text)
    return docs.select(
        F.col(id_).alias("doc_id"),
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("ws_tokens"),
        F.expr(f"CAST(regexp_count({T.norm_text(text)}, '[a-z0-9]+') AS BIGINT)").alias(
            "re_tokens"
        ),
    )


# PII patterns — shared verbatim by the Spark ops and the DuckDB oracle
# (Java regex and RE2 agree on this subset: char classes, +, {m,}, no
# lookarounds).  Counts are measured on the RAW text (pre-redaction) so
# the three counters are independent of replacement order.
PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_URL = r"https?://[^ \t\n\r]+"  # explicit class: Java \s ⊃ RE2 \s (\x0B)
PII_PHONE = r"\+?[0-9][0-9()\- ]{6,}[0-9]"


def pii_scrub(docs: DataFrame, id_: str = "doc_id", text: str = "text") -> DataFrame:
    """PII redaction for training corpora → (doc_id, n_urls, n_emails,
    n_phones, clean_text).

    URLs are redacted first (they may embed '@' and digits), then emails,
    then phone-like digit runs.  Pure column expressions — at 100 TB this
    is a map-only pass fused into the same stage as any other per-doc
    cleaning."""
    c = F.col(text)
    return docs.select(
        F.col(id_).alias("doc_id"),
        F.regexp_count(c, F.lit(PII_URL)).cast("long").alias("n_urls"),
        F.regexp_count(c, F.lit(PII_EMAIL)).cast("long").alias("n_emails"),
        F.regexp_count(c, F.lit(PII_PHONE)).cast("long").alias("n_phones"),
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(c, PII_URL, "<URL>"), PII_EMAIL, "<EMAIL>"
            ),
            PII_PHONE,
            "<PHONE>",
        ).alias("clean_text"),
    )


def corpus_stats(docs: DataFrame) -> DataFrame:
    """Per-(lang, source) corpus profile → counts + char-length stats.

    One partial-agg-friendly groupBy over the metadata columns — the
    shape of every corpus-composition report at 100 TB (low-cardinality
    keys, map-side combine does almost all the work)."""
    return docs.groupBy("lang", "source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars_r"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
    )


def corpus_stats_rollup(docs: DataFrame) -> DataFrame:
    """ROLLUP over (lang, source) with a distinct aggregation — the
    subtotal/grand-total corpus report.  (SURVEY §2.4: the reference has
    no grouping sets and no distinct aggs; both are table stakes for a
    corpus pipeline and compile to partial-agg-friendly plans.)  Rolled-up
    keys surface as '<ALL>' so the output is hash-stable."""
    return (
        docs.rollup("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .select(
            F.coalesce("lang", F.lit("<ALL>")).alias("lang_g"),
            F.coalesce("source", F.lit("<ALL>")).alias("source_g"),
            "n_docs",
            "total_chars",
            "n_sources",
        )
    )


def corpus_length_quantiles(docs: DataFrame) -> DataFrame:
    """Per-language document-length percentiles (p50/p90/p99) →
    (lang, p50, p90, p99).

    Uses EXACT `percentile` (linear interpolation — same definition as
    DuckDB's `quantile_cont`, so the oracle matches bitwise after
    rounding).  At 100 TB swap in `approx_percentile(n_chars, p, 10000)`
    — the t-digest sketch computes in one pass with bounded memory and
    partial aggregation, trading exactness for a fixed error budget; the
    exact form here is the oracle-checkable twin."""
    return docs.groupBy("lang").agg(
        F.round(F.expr("percentile(n_chars, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(n_chars, 0.99)"), 6).alias("p99"),
    )


TOPK_TOKENS = 10


def token_topk(docs: DataFrame, k: int = TOPK_TOKENS, text: str = "text") -> DataFrame:
    """Heavy-hitter analysis: top-k tokens per language by frequency →
    (lang, rnk, token, cnt).

    explode → groupBy(lang, token) (map-side combine collapses the token
    stream before the shuffle) → per-lang top-k window (partial
    WindowGroupLimit pushes the cut before the final sort)."""
    from pyspark.sql import Window

    tok = docs.select(
        "lang", F.explode(F.expr(T.tokens(text))).alias("token")
    )
    cnt = tok.groupBy("lang", "token").agg(F.count("*").cast("long").alias("cnt"))
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("token").asc())
    return (
        cnt.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("lang", "rnk", "token", "cnt")
    )


FP_K = 5  # char k-gram size
FP_W = 4  # winnowing window


def doc_fingerprint(docs: DataFrame, id_: str = "doc_id", text: str = "text") -> DataFrame:
    """Winnowing fingerprint (rolling char-5-gram hashes, min per window
    of 4, distinct) → (doc_id, n_fp, min_fp, max_fp).

    Standard MOSS-style scheme; emitted as scalar summaries so the oracle
    hash-compares exactly."""
    # Materialize each stage as a column: a lambda body re-evaluates any
    # embedded subexpression PER ELEMENT (no CSE inside higher-order
    # functions), so inlining a stage into the next transform would cost
    # O(len²) work per document.  Catalyst keeps these projections
    # separate because the aliases are referenced multiple times.
    #
    # Gram hash: base-131 char polynomial + affine spread mod M61
    # (functions.text.fp_gram_hash) instead of md5-per-position —
    # injective on ASCII 5-grams (131 > any code point), bit-identical
    # integer arithmetic in both engines, and ~2.5× faster than one md5
    # call per character position (measured at sf0.1: 3.1s → 1.5s;
    # winnowing only needs a deterministic well-spread hash, not a
    # cryptographic one).
    norm = T.norm_text(text)
    codes = "transform(split(_nrm, ''), c -> CAST(ascii(c) AS BIGINT))"
    wins = (
        f"CASE WHEN size(_grams) < {FP_W} THEN array_distinct(_grams) "
        f"ELSE array_distinct(transform(sequence(1, size(_grams) - {FP_W - 1}), "
        f"i -> array_min(slice(_grams, i, {FP_W})))) END"
    )
    return (
        docs.select(F.col(id_).alias("doc_id"), F.expr(norm).alias("_nrm"))
        .select("doc_id", F.expr(codes).alias("_codes"))
        .select("doc_id", F.expr(T.fp_gram_hash("_codes", FP_K)).alias("_grams"))
        .select("doc_id", F.expr(wins).alias("_wins"))
        .select(
            "doc_id",
            F.expr("CAST(size(_wins) AS BIGINT)").alias("n_fp"),
            F.expr("array_min(_wins)").alias("min_fp"),
            F.expr("array_max(_wins)").alias("max_fp"),
        )
    )


def vocab_stats(docs: DataFrame, text: str = "text", approx: bool = False) -> DataFrame:
    """Per-language vocabulary size → (lang, n_tokens, n_distinct_tokens).

    ``approx=False``: exact count_distinct — two-level aggregation
    (partial distinct within partitions, exact merge).  This is the
    oracle-checkable form.

    ``approx=True``: HyperLogLog++ sketch (approx_count_distinct, 2%
    default rsd) — at 100 TB the exact distinct's shuffle carries every
    distinct (lang, token) pair once, while the sketch ships a
    fixed-size register array per group; accuracy is tolerance-tested
    against the exact form (no cross-engine oracle: Spark's HLL++ and
    DuckDB's ApproxCountDistinct sketches differ by construction)."""
    tok = docs.select("lang", F.explode(F.expr(T.tokens(text))).alias("token"))
    distinct_agg = (
        F.approx_count_distinct("token").alias("n_distinct_tokens")
        if approx
        else F.count_distinct("token").alias("n_distinct_tokens")
    )
    return tok.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_tokens"),
        distinct_agg,
    ).withColumn("n_distinct_tokens", F.col("n_distinct_tokens").cast("long"))


def repetition_stats(docs: DataFrame, id_: str = "doc_id", text: str = "text") -> DataFrame:
    """Gopher-style repetition signals per doc → (doc_id, n_tokens,
    top_word_share_r, top_bigram_share_r).

    The share of the single most frequent word / word-bigram — high
    values flag degenerate boilerplate or looped generations that
    length/stopword ratios miss (text_quality covers distinct-ratio).

    Shape: two explode→count→max/sum aggregations (words, bigrams),
    joined on doc_id — all partial-agg friendly, no Python.  Docs with
    fewer than two tokens have no bigrams; their share is NULL (honest,
    and identically NULL in the oracle)."""
    d = docs.select(F.col(id_).alias("doc_id"), F.expr(T.tokens(text)).alias("_toks"))
    wc = (
        d.select("doc_id", F.explode("_toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    w = wc.groupBy("doc_id").agg(
        F.max("c").alias("max_w"), F.sum("c").cast("long").alias("n_tokens")
    )
    bigrams = (
        "CASE WHEN size(_toks) < 2 THEN array() "
        "ELSE transform(sequence(0, size(_toks) - 2), "
        "i -> concat_ws(' ', _toks[i], _toks[i+1])) END"
    )
    bc = (
        d.select("doc_id", F.explode(F.expr(bigrams)).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
    )
    b = bc.groupBy("doc_id").agg(
        F.max("c").alias("max_b"), F.sum("c").alias("n_bg")
    )
    return (
        w.join(b, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(F.col("max_w").cast("double") / F.col("n_tokens"), 6).alias(
                "top_word_share_r"
            ),
            F.round(F.col("max_b").cast("double") / F.col("n_bg"), 6).alias(
                "top_bigram_share_r"
            ),
        )
    )


PMI_MIN_COUNT = 3   # minimum bigram support (noise floor)
PMI_TOPN = 50


def token_pmi(
    docs: DataFrame,
    text: str = "text",
    min_count: int = PMI_MIN_COUNT,
    top_n: int = PMI_TOPN,
    checkpoint: bool = True,
) -> DataFrame:
    """Corpus collocations: top-N word bigrams by pointwise mutual
    information → (rnk, bigram, n_pair, pmi_r).

    PMI is reported as the probability ratio
    ``P(ab) / (P(a)·P(b))`` (its log is monotone, so ranking is
    unaffected and the arithmetic stays a short, cross-engine-exact
    chain of IEEE divisions — no libm ``log`` whose last ulp differs
    between JVM and DuckDB).

    Shape: ONE tokenize pass, materialized (`localCheckpoint`, the same
    staging move as the minhash pipeline — without it each consumer
    re-tokenizes the corpus), feeding the unigram and bigram count
    tables; the corpus totals are derived from those aggregates (sum of
    unigram counts = token total; sum of pre-filter bigram counts =
    bigram total), not from extra scans.  The min-support filter runs
    BEFORE the unigram joins, so at 100 TB the joins carry only
    surviving collocations (the unigram table streams, nothing
    driver-side), and the global top-N is TakeOrderedAndProject + a
    tiny rank window, not a single-task global sort."""
    from pyspark.sql import Window

    d = docs.select(F.expr(T.tokens(text)).alias("_toks"))
    if checkpoint:  # False only for plan-inspection tests
        d = d.transform(_stage_eager)
    uni = (
        d.select(F.explode("_toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    bigrams = (
        "CASE WHEN size(_toks) < 2 THEN array() "
        "ELSE transform(sequence(0, size(_toks) - 2), "
        "i -> concat_ws(' ', _toks[i], _toks[i+1])) END"
    )
    bg_all = (
        d.select(F.explode(F.expr(bigrams)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("c2"))
    )
    totals = uni.agg(F.sum("c1").cast("double").alias("n_w")).crossJoin(
        bg_all.agg(F.sum("c2").cast("double").alias("n_b"))
    )
    bg = bg_all.where(F.col("c2") >= min_count)
    u1 = uni.select(F.col("tok").alias("_w1"), F.col("c1").alias("c1a"))
    u2 = uni.select(F.col("tok").alias("_w2"), F.col("c1").alias("c1b"))
    scored = (
        bg.withColumn("_w1", F.expr("split(bigram, ' ')[0]"))
        .withColumn("_w2", F.expr("split(bigram, ' ')[1]"))
        .join(u1, on="_w1")
        .join(u2, on="_w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "bigram",
            F.col("c2").alias("n_pair"),
            (
                (F.col("c2").cast("double") / F.col("n_b"))
                / (
                    (F.col("c1a").cast("double") / F.col("n_w"))
                    * (F.col("c1b").cast("double") / F.col("n_w"))
                )
            ).alias("_pmi"),
        )
    )
    top = scored.orderBy(F.col("_pmi").desc(), F.col("bigram").asc()).limit(top_n)
    w = Window.orderBy(F.col("_pmi").desc(), F.col("bigram").asc())
    return (
        top.withColumn("rnk", F.row_number().over(w).cast("long"))
        .select("rnk", "bigram", "n_pair", F.round("_pmi", 6).alias("pmi_r"))
    )
