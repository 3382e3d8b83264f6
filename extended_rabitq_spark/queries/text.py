"""Registered text-analysis queries + DuckDB oracles (north-star surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions import text as T
from ..operators import textops
from ..registry import register
from ..tables import read_parquet

_D_NORM = T.d_norm_text("text")
_D_TOKS = T.d_tokens("text")


def _d_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


_LANG_SCORES = ",\n       ".join(
    f"CAST(len(list_filter(toks, t -> list_contains({_d_list(textops.STOPWORDS[lang])}, t))) AS BIGINT) AS s_{lang}"
    for lang in textops.LANG_ORDER
)
_LANG_CASE = " ".join(f"WHEN s_{lang} = best THEN '{lang}'" for lang in textops.LANG_ORDER)

_LANG_ORACLE = f"""
WITH tk AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
sc AS (SELECT doc_id, {_LANG_SCORES} FROM tk),
mx AS (SELECT *, greatest(s_en, s_es, s_de, s_fr) AS best FROM sc)
SELECT doc_id, CASE {_LANG_CASE} END AS lang_pred, best AS lang_score FROM mx
"""


@register("text_lang_id", _LANG_ORACLE)
def text_lang_id_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID with deterministic tie-break."""
    return textops.lang_id(read_parquet(spark, f"{sf_dir}/documents.parquet"))


_QUALITY_ORACLE = f"""
WITH tk AS (SELECT doc_id, {_D_NORM} AS nrm, {_D_TOKS} AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(length(nrm) AS BIGINT) AS n_chars_norm,
       round(list_reduce(list_transform(toks, t -> CAST(length(t) AS DOUBLE)), (x, y) -> x + y)
             / len(toks), 6) AS avg_token_len_r,
       round(CAST(len(list_filter(toks, t -> list_contains({_d_list(textops.STOPWORDS['en'])}, t))) AS DOUBLE)
             / len(toks), 6) AS stopword_ratio_r,
       round(CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks), 6) AS distinct_ratio_r
FROM tk
"""


@register("text_quality", _QUALITY_ORACLE)
def text_quality_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length/stopword/repetition quality metrics in one map-only pass."""
    return textops.text_quality(read_parquet(spark, f"{sf_dir}/documents.parquet"))


_TOKENS_ORACLE = f"""
SELECT doc_id,
       CAST(len({_D_TOKS}) AS BIGINT) AS ws_tokens,
       CAST(len(regexp_extract_all({_D_NORM}, '[a-z0-9]+')) AS BIGINT) AS re_tokens
FROM documents
"""


@register("text_token_count", _TOKENS_ORACLE)
def text_token_count_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + regex token counts."""
    return textops.token_count(read_parquet(spark, f"{sf_dir}/documents.parquet"))


_PII_ORACLE = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{textops.PII_URL}')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(text, '{textops.PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{textops.PII_PHONE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(regexp_replace(text,
           '{textops.PII_URL}', '<URL>', 'g'),
           '{textops.PII_EMAIL}', '<EMAIL>', 'g'),
           '{textops.PII_PHONE}', '<PHONE>', 'g') AS clean_text
FROM documents
"""


@register("text_pii_scrub", _PII_ORACLE)
def text_pii_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (URLs → emails → phones) with pre-redaction counts."""
    return textops.pii_scrub(read_parquet(spark, f"{sf_dir}/documents.parquet"))


_STATS_ORACLE = """
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       round(avg(n_chars), 6) AS avg_chars_r,
       CAST(min(n_chars) AS BIGINT) AS min_chars,
       CAST(max(n_chars) AS BIGINT) AS max_chars
FROM documents
GROUP BY lang, source
"""


@register("corpus_stats", _STATS_ORACLE)
def corpus_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus composition profile."""
    return textops.corpus_stats(read_parquet(spark, f"{sf_dir}/documents.parquet"))


_ROLLUP_ORACLE = """
SELECT coalesce(lang, '<ALL>') AS lang_g,
       coalesce(source, '<ALL>') AS source_g,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
GROUP BY ROLLUP (lang, source)
"""


@register("corpus_stats_rollup", _ROLLUP_ORACLE)
def corpus_stats_rollup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals + distinct-source aggregation per language."""
    return textops.corpus_stats_rollup(read_parquet(spark, f"{sf_dir}/documents.parquet"))


_QUANTILES_ORACLE = """
SELECT lang,
       round(quantile_cont(n_chars, 0.5), 6) AS p50,
       round(quantile_cont(n_chars, 0.9), 6) AS p90,
       round(quantile_cont(n_chars, 0.99), 6) AS p99
FROM documents
GROUP BY lang
"""


@register("corpus_length_quantiles", _QUANTILES_ORACLE)
def corpus_length_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length percentiles (exact; approx_percentile is the
    documented 100 TB path)."""
    return textops.corpus_length_quantiles(
        read_parquet(spark, f"{sf_dir}/documents.parquet")
    )


_TOPK_ORACLE = f"""
WITH tok AS (SELECT lang, unnest({_D_TOKS}) AS token FROM documents),
cnt AS (SELECT lang, token, count(*) AS cnt FROM tok GROUP BY lang, token),
r AS (SELECT lang, token, cnt,
             CAST(row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) AS BIGINT) AS rnk
      FROM cnt)
SELECT lang, rnk, token, cnt FROM r WHERE rnk <= {textops.TOPK_TOKENS}
"""


@register("token_topk", _TOPK_ORACLE)
def token_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 tokens per language (heavy-hitter corpus analysis)."""
    return textops.token_topk(read_parquet(spark, f"{sf_dir}/documents.parquet"))


_K, _W = textops.FP_K, textops.FP_W
_D_CODES = "list_transform(string_split(nrm, ''), c -> CAST(ascii(c) AS BIGINT))"
_D_GRAMS = T.d_fp_gram_hash("codes", _K)
_D_WINS = (
    f"CASE WHEN len(grams) < {_W} THEN list_distinct(grams) "
    f"ELSE list_distinct(list_transform(range(1, len(grams) - {_W - 1} + 1), "
    f"i -> list_min(list_slice(grams, i, i + {_W - 1})))) END"
)

_FP_ORACLE = f"""
WITH nd AS (SELECT doc_id, {_D_NORM} AS nrm FROM documents),
cs AS (SELECT doc_id, {_D_CODES} AS codes FROM nd),
g AS (SELECT doc_id, {_D_GRAMS} AS grams FROM cs),
w AS (SELECT doc_id, {_D_WINS} AS wins FROM g)
SELECT doc_id,
       CAST(len(wins) AS BIGINT) AS n_fp,
       list_min(wins) AS min_fp,
       list_max(wins) AS max_fp
FROM w
"""


@register("text_fingerprint", _FP_ORACLE)
def text_fingerprint_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS-style) document fingerprint summaries."""
    from ..tables import spread_small_scan

    # k-gram hash windows are the CPU hot loop (r7 profile: 1.74s -> 
    # 0.57s warm on 8 cores); no-op at scale
    return textops.doc_fingerprint(
        spread_small_scan(
            read_parquet(spark, f"{sf_dir}/documents.parquet"), spark
        )
    )


_VOCAB_ORACLE = f"""
WITH tok AS (SELECT lang, unnest({T.d_tokens('text')}) AS token FROM documents)
SELECT lang,
       count(*) AS n_tokens,
       count(DISTINCT token) AS n_distinct_tokens
FROM tok GROUP BY lang
"""


@register("vocab_stats", _VOCAB_ORACLE)
def vocab_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary size (exact count_distinct — the
    oracle-checkable twin; the HLL++ sketch form is the 100 TB path,
    tolerance-tested in tests/test_dedup_text.py)."""
    from ..operators import textops

    return textops.vocab_stats(read_parquet(spark, f"{sf_dir}/documents.parquet"))


_REPETITION_ORACLE = f"""
WITH tk AS (SELECT doc_id, {_D_TOKS} AS toks FROM documents),
wc AS (SELECT doc_id, tok, count(*) AS c
       FROM (SELECT doc_id, unnest(toks) AS tok FROM tk) GROUP BY 1, 2),
w AS (SELECT doc_id, max(c) AS max_w, CAST(sum(c) AS BIGINT) AS n_tokens
      FROM wc GROUP BY doc_id),
bg0 AS (SELECT doc_id,
               CASE WHEN len(toks) < 2 THEN []
                    ELSE list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1]) END AS bgs
        FROM tk),
bc AS (SELECT doc_id, bg, count(*) AS c
       FROM (SELECT doc_id, unnest(bgs) AS bg FROM bg0) GROUP BY 1, 2),
b AS (SELECT doc_id, max(c) AS max_b, CAST(sum(c) AS BIGINT) AS n_bg
      FROM bc GROUP BY doc_id)
SELECT w.doc_id, n_tokens,
       round(CAST(max_w AS DOUBLE) / n_tokens, 6) AS top_word_share_r,
       round(CAST(max_b AS DOUBLE) / n_bg, 6) AS top_bigram_share_r
FROM w LEFT JOIN b ON w.doc_id = b.doc_id
"""


@register("text_repetition", _REPETITION_ORACLE)
def text_repetition_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent word / bigram share per doc (repetition flags)."""
    from ..tables import spread_small_scan

    return textops.repetition_stats(
        spread_small_scan(
            read_parquet(spark, f"{sf_dir}/documents.parquet"), spark
        )
    )


_CUBE_ORACLE = """
SELECT coalesce(lang, '<ALL>') AS lang_g,
       coalesce(source, '<ALL>') AS source_g,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY CUBE (lang, source)
"""


@register("corpus_stats_cube", _CUBE_ORACLE)
def corpus_stats_cube_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all four (lang, source) margins in ONE
    partial-agg pass — completes the grouping-set family next to
    corpus_stats_rollup's hierarchy)."""
    from pyspark.sql import functions as F

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return (
        docs.cube("lang", "source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .select(
            F.coalesce("lang", F.lit("<ALL>")).alias("lang_g"),
            F.coalesce("source", F.lit("<ALL>")).alias("source_g"),
            "n_docs",
            "total_chars",
        )
    )


_QUALITY_BINS_ORACLE = """
SELECT doc_id, lang,
       CAST(ntile(10) OVER (PARTITION BY lang ORDER BY n_chars, doc_id) AS BIGINT)
         AS len_decile
FROM documents
"""


@register("text_quality_bins", _QUALITY_BINS_ORACLE)
def text_quality_bins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language decile binning (ntile) — the curriculum/quality
    bucketing step of a training pipeline; deterministic (ties broken
    by doc_id) so both engines cut identical bins."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").asc(), F.col("doc_id").asc())
    return docs.select(
        "doc_id", "lang", F.ntile(10).over(w).cast("long").alias("len_decile")
    )


_D_BIGRAMS = (
    "CASE WHEN len(toks) < 2 THEN [] "
    "ELSE list_transform(range(1, len(toks)), "
    "i -> toks[i] || ' ' || toks[i+1]) END"
)

_PMI_ORACLE = f"""
WITH d AS (SELECT {_D_TOKS} AS toks FROM documents),
tot AS (SELECT CAST(sum(len(toks)) AS DOUBLE) AS n_w,
               CAST(sum(greatest(len(toks) - 1, 0)) AS DOUBLE) AS n_b
        FROM d),
uni AS (SELECT tok, count(*) AS c1
        FROM (SELECT unnest(toks) AS tok FROM d) GROUP BY tok),
bg AS (SELECT bigram, count(*) AS c2
       FROM (SELECT unnest({_D_BIGRAMS}) AS bigram FROM d)
       GROUP BY bigram
       HAVING count(*) >= {textops.PMI_MIN_COUNT}),
scored AS (
  SELECT bg.bigram, bg.c2 AS n_pair,
         (CAST(bg.c2 AS DOUBLE) / tot.n_b)
           / ((CAST(a.c1 AS DOUBLE) / tot.n_w)
              * (CAST(b.c1 AS DOUBLE) / tot.n_w)) AS pmi
  FROM bg
  JOIN uni a ON a.tok = string_split(bg.bigram, ' ')[1]
  JOIN uni b ON b.tok = string_split(bg.bigram, ' ')[2]
  CROSS JOIN tot
),
r AS (SELECT bigram, n_pair, pmi,
             CAST(row_number() OVER (ORDER BY pmi DESC, bigram) AS BIGINT) AS rnk
      FROM scored)
SELECT rnk, bigram, n_pair, round(pmi, 6) AS pmi_r
FROM r WHERE rnk <= {textops.PMI_TOPN}
"""


@register("token_pmi", _PMI_ORACLE)
def token_pmi_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 collocations by pointwise mutual information (probability
    ratio form — monotone in log-PMI, but free of cross-engine libm
    drift).  Min-support 3; ties broken by bigram text."""
    return textops.token_pmi(read_parquet(spark, f"{sf_dir}/documents.parquet"))


_LM_TYP_ORACLE = """
WITH raw AS (
  SELECT doc_id, lang,
         unnest(list_transform(range(1, greatest(length(text) - 2, 0) + 1),
           i -> struct_pack(ctx := substr(text, CAST(i AS INT), 2),
                            ch := substr(text, CAST(i AS INT) + 2, 1)))) AS t
  FROM documents),
t AS (SELECT doc_id, lang, t.ctx AS ctx, t.ch AS ch FROM raw),
c2 AS (SELECT lang, ctx, ch, COUNT(*) AS c2 FROM t GROUP BY 1, 2, 3),
c1 AS (SELECT lang, ctx, COUNT(*) AS c1 FROM t GROUP BY 1, 2),
m AS (SELECT c2.lang, c2.ctx, c2.ch, c2.c2, c1.c1 FROM c2 JOIN c1 USING (lang, ctx)),
p AS (SELECT t.doc_id,
             CAST(coalesce(floor(1000000 * (CAST(m.c2 AS DOUBLE) / CAST(m.c1 AS DOUBLE)) + 0.5), 0) AS BIGINT) AS p_fp
      FROM t LEFT JOIN m USING (lang, ctx, ch)),
s AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_trans,
             CAST(SUM(p_fp) AS BIGINT) AS score_fp
      FROM p GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(s.n_trans, 0) AS BIGINT) AS n_trans,
       CAST(coalesce(s.score_fp, 0) AS BIGINT) AS score_fp
FROM documents d LEFT JOIN s USING (doc_id)
"""


@register("lm_typicality_score", _LM_TYP_ORACLE)
def lm_typicality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's third quality pillar (beyond-reference §2.8): corpus
    char-trigram LM trained in one pass, per-document fixed-point mean
    transition probability — rare-transition documents (mojibake,
    binary spill, wrong-language text) score low.  Integer-exact
    cross-engine (libm-free fixed-point, the token_pmi convention)."""
    from ..operators import lm_quality

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return lm_quality.lm_typicality(docs)


@register("bpe_token_stats")  # rows-only: the learned merge table comes
# from an inherently sequential training loop (each merge depends on the
# previous) — not SQL-expressible.  Semantics pinned in tests/test_bpe.py
# (hand-checked first merges, lossless round-trip, compression curve,
# repartition determinism).
def bpe_token_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL-tokenizer token counts (BPE, Sennrich 2016 — the units
    sequence packing and token budgeting actually need): train 200
    merges on the corpus word-frequency table (one distributed pass,
    bounded collect), tokenize via broadcast merge ranks inside Arrow
    batches (map-only).  → (doc_id, n_tokens)."""
    from ..operators import bpe

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    merges = bpe.train_bpe(docs, n_merges=200)
    return bpe.bpe_tokenize(docs, merges).select("doc_id", "n_tokens")


def _hll_oracle() -> str:
    from ..operators import sketches

    return sketches.d_hll_distinct(
        f"SELECT source, unnest({T.d_shingles3(T.d_tokens('text'))}) AS shingle "
        "FROM documents",
        ["source"],
        "shingle",
        p=8,
    )


@register("hll_distinct_shingles", _hll_oracle())
def hll_distinct_shingles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary-growth monitoring via a MERGEABLE
    HyperLogLog sketch (beyond-reference §2.8): approx distinct word
    3-shingles per source → (source, sum_fp, zero_regs, n_est).  The
    register harmonic sum is exact BIGINT fixed point, so the row is
    hashable cross-engine; only the final estimate expression (shared
    verbatim with the oracle) touches floats.  At 100 TB the register
    table replaces an exact count-distinct's full-value shuffle with
    O(sources · 256) rows and merges across shards by max."""
    from pyspark.sql import functions as F

    from ..operators import sketches

    from ..tables import spread_small_scan

    # the shingle explode is the CPU hot loop — spread a small scan
    # across cores (no-op at scale; r7 profile: 12.2s -> 2.4s local)
    docs = spread_small_scan(
        read_parquet(spark, f"{sf_dir}/documents.parquet"), spark
    )
    sh = docs.select(
        "source",
        F.explode(F.expr(T.shingles3(T.tokens("text")))).alias("shingle"),
    )
    return sketches.hll_distinct(sh, ["source"], "shingle", p=8, hash_fn="hash60")


def hll_distinct_shingles_production(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION twin of ``hll_distinct_shingles``: identical plan,
    xxh64 value hash instead of the portable md5 ``hash60`` (VERDICT r6
    item 3 — md5 was the measured per-shingle hot loop).  Not registered
    (no DuckDB twin for xxhash64); benched side-by-side with the oracle
    row as ``hll_shingles_xxh64_sec``.  Estimates differ only as any two
    independent HLL hash families do (same ±1.04/√m error envelope —
    asserted in tests/test_sketches.py)."""
    from pyspark.sql import functions as F

    from ..operators import sketches

    from ..tables import spread_small_scan

    docs = spread_small_scan(
        read_parquet(spark, f"{sf_dir}/documents.parquet"), spark
    )
    sh = docs.select(
        "source",
        F.explode(F.expr(T.shingles3(T.tokens("text")))).alias("shingle"),
    )
    return sketches.hll_distinct(sh, ["source"], "shingle", p=8, hash_fn="xxh64")


def _kmv_oracle() -> str:
    from ..operators import sketches

    return sketches.d_kmv_jaccard_pairs(
        f"SELECT source, unnest({T.d_shingles3(T.d_tokens('text'))}) AS shingle "
        "FROM documents",
        "source",
        "shingle",
        k=256,
    )


@register("kmv_source_overlap", _kmv_oracle())
def kmv_source_overlap_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise source-vocabulary OVERLAP from KMV sketches
    (beyond-reference §2.8) — the set question HLL cannot answer: for
    every source pair, the k-min-values union sample and the integer
    Jaccard estimate ``(1e6·n_shared) div k_used``.  The whole query is
    exact integer arithmetic (hashes, min-k ranks, membership counts) —
    even the ESTIMATE row hashes bitwise cross-engine.  At 100 TB each
    source is sketched once (O(k) rows kept, map-side pre-cut window);
    the pairwise stage touches only O(pairs · k) sketch rows."""
    from pyspark.sql import functions as F

    from ..operators import sketches

    from ..tables import spread_small_scan

    docs = spread_small_scan(
        read_parquet(spark, f"{sf_dir}/documents.parquet"), spark
    )
    sh = docs.select(
        "source",
        F.explode(F.expr(T.shingles3(T.tokens("text")))).alias("shingle"),
    )
    sk = sketches.kmv_sketch(sh, ["source"], "shingle", k=256, hash_fn="hash60")
    return sketches.kmv_jaccard_pairs(sk, "source", k=256)


def _cms_oracle() -> str:
    from ..operators import sketches as SK

    d, w, topn = SK.CMS_D, SK.CMS_W, 20
    return f"""
WITH tok AS (SELECT unnest({T.d_tokens('text')}) AS token FROM documents),
cnt AS (SELECT token, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM tok GROUP BY token),
top AS (SELECT token, exact_cnt FROM (
          SELECT token, exact_cnt,
                 row_number() OVER (ORDER BY exact_cnt DESC, token) AS rn
          FROM cnt) WHERE rn <= {topn}),
th AS (SELECT {T.d_hash60('token')} AS h FROM tok),
cells AS (SELECT unnest({SK.d_cms_cells('h', d, w)}) AS rc FROM th),
grid AS (SELECT rc[1] AS r, rc[2] AS c, CAST(count(*) AS BIGINT) AS cnt
         FROM cells GROUP BY rc[1], rc[2]),
pt AS (SELECT token, {T.d_hash60('token')} AS h FROM top),
pc AS (SELECT token, unnest({SK.d_cms_cells('h', d, w)}) AS rc FROM pt),
est AS (SELECT token, CAST(min(coalesce(g.cnt, 0)) AS BIGINT) AS cms_est
        FROM pc LEFT JOIN grid g ON g.r = rc[1] AND g.c = rc[2]
        GROUP BY token)
SELECT t.token, t.exact_cnt, e.cms_est,
       CAST(e.cms_est - t.exact_cnt AS BIGINT) AS overcount
FROM top t JOIN est e USING (token)
"""


@register("cms_token_freq", _cms_oracle())
def cms_token_freq_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency sketch (beyond-reference §2.8) — the
    frequency member of the sketch trio (HLL = cardinality, KMV =
    overlap, CMS = how often): build the d×w counter grid over corpus
    tokens, then grade it against the exact counts of the top-20 tokens
    — (token, exact_cnt, cms_est, overcount), all BIGINT; count-min
    never underestimates, so overcount ≥ 0 with E[overcount] ≤ e/w · N.
    At 100 TB the grid is the artifact: d·w counters per shard, merged
    by plain sum; the probe-side join broadcasts the grid."""
    from pyspark.sql import functions as F

    from ..operators import sketches as SK

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    tok = docs.select(F.explode(F.expr(T.tokens("text"))).alias("token"))
    cnt = tok.groupBy("token").agg(F.count("*").cast("long").alias("exact_cnt"))
    # Deterministic global top-20 via sort+limit, NOT a row_number window:
    # Spark plans this as TakeOrderedAndProject (per-partition heaps, no
    # single-partition WindowExec sort of the whole vocabulary).
    top = cnt.orderBy(F.col("exact_cnt").desc(), F.col("token").asc()).limit(20)
    grid = SK.cms_sketch(tok, [], "token", hash_fn="hash60")
    est = SK.cms_estimate(grid, top.select("token"), "token", hash_fn="hash60")
    return top.join(est, on="token").select(
        "token",
        "exact_cnt",
        "cms_est",
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )


def _qsk_oracle() -> str:
    from ..operators.sketches import QSK_GRADE_K, QSK_GRADE_Q

    qlist = ", ".join(str(q) for q in QSK_GRADE_Q)
    h = T.d_hash60("CAST(doc_id AS VARCHAR)")
    return f"""
WITH d AS (SELECT source, doc_id, n_chars FROM documents),
hs AS (SELECT source, {h} AS h, CAST(doc_id AS VARCHAR) AS kk, n_chars AS v FROM d),
sk AS (SELECT source, h, v,
              row_number() OVER (PARTITION BY source ORDER BY h ASC, kk ASC) AS rn
       FROM hs QUALIFY rn <= {QSK_GRADE_K}),
sr AS (SELECT source, v,
              row_number() OVER (PARTITION BY source ORDER BY v ASC) AS vr,
              count(*) OVER (PARTITION BY source) AS ns
       FROM sk),
q AS (SELECT unnest([{qlist}]) AS q_pct),
est AS (SELECT source, q_pct, v AS qsk_est FROM sr CROSS JOIN q
        WHERE vr = floor((ns - 1) * q_pct / 100) + 1),
fr AS (SELECT source, v,
              row_number() OVER (PARTITION BY source ORDER BY v ASC) AS vr,
              count(*) OVER (PARTITION BY source) AS ns
       FROM (SELECT source, n_chars AS v FROM d)),
ex AS (SELECT source, q_pct, v AS exact_v FROM fr CROSS JOIN q
       WHERE vr = floor((ns - 1) * q_pct / 100) + 1)
SELECT e.source, CAST(e.q_pct AS BIGINT) AS q_pct,
       CAST(e.qsk_est AS BIGINT) AS qsk_est,
       CAST(x.exact_v AS BIGINT) AS exact_v,
       CAST(abs(e.qsk_est - x.exact_v) AS BIGINT) AS abs_err
FROM est e JOIN ex x ON x.source = e.source AND x.q_pct = e.q_pct
"""


@register("sketch_length_quantiles", _qsk_oracle())
def sketch_length_quantiles_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k quantile sketch (NEW r8, beyond-reference §2.8) — the
    QUANTILE member of the mergeable sketch family (HLL = cardinality,
    KMV = overlap, CMS = frequency): a bottom-k hash sample of doc ids
    per source carries n_chars, quantile estimates are integer order
    statistics of the sample, graded against the same order statistic
    over the full group → (source, q_pct, qsk_est, exact_v, abs_err),
    all BIGINT.  Mergeable by the KMV law (re-cut of the union), so
    100 TB shards sketch independently and combine with no second
    corpus pass; shuffle volume is O(partitions · groups · k) via the
    partial WindowGroupLimit pre-cut.  hash60 here for the cross-engine
    oracle; production default is xxh64 (sketches._HASH_FNS)."""
    from pyspark.sql import functions as F

    from ..operators import sketches as SK

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").select(
        "source", "doc_id", "n_chars"
    )
    return SK.quantile_sketch_vs_exact(
        docs, ["source"], "n_chars", "doc_id",
        quantiles=list(SK.QSK_GRADE_Q), k=SK.QSK_GRADE_K, hash_fn="hash60",
    )


_KN_ORACLE = f"""
WITH d0 AS (SELECT doc_id, lang, {_D_TOKS} AS toks FROM documents),
bgl AS (SELECT doc_id, lang,
               unnest(CASE WHEN len(toks) >= 2
                 THEN list_transform(range(1, len(toks)),
                   i -> struct_pack(w1 := toks[CAST(i AS INT)],
                                    w2 := toks[CAST(i AS INT) + 1]))
                 ELSE [] END) AS b
        FROM d0),
t AS (SELECT doc_id, lang, b.w1 AS w1, b.w2 AS w2 FROM bgl),
c12 AS (SELECT lang, w1, w2, count(*) AS c12 FROM t GROUP BY 1, 2, 3),
byw1 AS (SELECT lang, w1, CAST(sum(c12) AS BIGINT) AS c1,
                count(*) AS n1p_fwd
         FROM c12 GROUP BY 1, 2),
byw2 AS (SELECT lang, w2, count(*) AS n1p_bwd FROM c12 GROUP BY 1, 2),
ty AS (SELECT lang, count(*) AS n_types FROM c12 GROUP BY 1),
m AS (SELECT c12.lang, c12.w1, c12.w2,
             CAST((1000000 * (4 * c12.c12 - 3) + (4 * byw1.c1) // 2) // (4 * byw1.c1)
              + (((1000000 * 3 * byw1.n1p_fwd + (4 * byw1.c1) // 2) // (4 * byw1.c1))
                 * ((1000000 * byw2.n1p_bwd + ty.n_types // 2) // ty.n_types)
                 + 500000) // 1000000 AS BIGINT) AS p_fp
      FROM c12
      JOIN byw1 USING (lang, w1)
      JOIN byw2 USING (lang, w2)
      JOIN ty USING (lang)),
p AS (SELECT t.doc_id, coalesce(m.p_fp, 0) AS p_fp
      FROM t LEFT JOIN m USING (lang, w1, w2)),
s AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(p_fp) AS BIGINT) AS kn_score_fp
      FROM p GROUP BY 1)
SELECT d.doc_id,
       CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(s.kn_score_fp, 0) AS BIGINT) AS kn_score_fp
FROM documents d LEFT JOIN s USING (doc_id)
"""


@register("lm_kn_bigram_score", _KN_ORACLE)
def lm_kn_bigram_score_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney word-bigram typicality (NEW r10,
    beyond-reference §2.8 — KenLM's smoothing, the actual CCNet filter
    LM; next to the char-trigram typicality above): per-language KN
    model with exact-rational discount D = 3/4, every model probability
    computed with round-half-up INTEGER division only (no IEEE divide
    anywhere in the chain), per-document BIGINT fixed-point sums.
    Low mean-KN documents are boilerplate soup / wrong-language / token
    salad; the score feeds the same quality-bucket mixers as
    lm_typicality_score."""
    from ..operators import lm_quality

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return lm_quality.kn_bigram_score(docs)
