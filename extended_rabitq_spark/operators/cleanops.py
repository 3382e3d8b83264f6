"""Corpus-cleaning operators for the LLM training-data pipeline surface.

Beyond-reference (SURVEY §2.8 north star) — the cleanup/export stages a
100 TB pretraining pipeline runs downstream of dedup:

- ``segment_dedup``   — CCNet-style duplicated-segment removal: hash every
  segment of every document, count corpus-wide, drop segments that appear
  in ≥ ``min_dup`` distinct documents, reassemble the survivors.
- ``doc_chunks``      — overlapping fixed-size chunking (the embedding /
  context-window prep step).
- ``shard_export``    — deterministic hash-shuffle of the corpus into N
  training shards with a stable intra-shard order.
- ``gopher_filter``   — Gopher-style rule-based quality gate, expressed
  with integer-exact comparisons (no float thresholds → bitwise
  cross-engine reproducible).
- ``tfidf_terms``     — per-source top-k salient terms by tf·idf, idf in
  probability-ratio form (monotone transform of log-idf; avoids libm
  ``log`` whose last ulp differs across engines — same convention as
  ``textops.token_pmi``).
- ``integrity_audit`` — one-row dataset-quality audit: doc↔embedding
  referential integrity, metadata drift, vector-payload health.
- ``span_dedup``      — exact substring-span dedup (stride-1 windows,
  maximal-span merging — the Lee et al. shape).
- ``source_divergence`` — per-source total-variation drift vs the
  corpus token distribution (integer-exact; data-mixing QA).

All are pure column-expression plans (zero Python in the hot path);
their only shuffles are the group-bys/joins named in each docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..staging import stage_eager as _stage_eager, stage_lazy as _stage_lazy

from ..functions import text as T
from .textops import STOPWORDS, _arr_lit

# Segment dedup: fixed token-window segmentation (the fixture corpus has
# no newlines; real corpora pass separator-split lines through the same
# counting/reassembly pipeline).
SEG_TOKENS = 10
SEG_MIN_DUP = 2

# Chunking defaults: 120-char windows advancing 80 chars (40 overlap).
CHUNK_SIZE = 120
CHUNK_STRIDE = 80

N_SHARDS = 8

TFIDF_TOPK = 5

# Gopher-rule thresholds (integer-exact: every rule is a cross-multiplied
# integer comparison, never a float ratio).
GOPHER_MIN_TOKENS = 20
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_AVG_LEN = 2  # avg token length lower bound
GOPHER_MAX_AVG_LEN = 10  # upper bound
GOPHER_STOP_DENOM = 50  # stopword ratio >= 1/50 (2%)
GOPHER_DISTINCT_NUM = 3  # distinct-token ratio >= 3/10
GOPHER_DISTINCT_DENOM = 10


def _segments(toks: str, n: int) -> str:
    """Spark-SQL: consecutive ``n``-token segments of a token array."""
    return (
        f"transform(sequence(0, CAST(ceil(size({toks}) / {n}.0) AS INT) - 1), "
        f"i -> array_join(slice({toks}, i * {n} + 1, {n}), ' '))"
    )


def segment_dedup(
    docs: DataFrame,
    id_: str = "doc_id",
    text: str = "text",
    seg_tokens: int = SEG_TOKENS,
    min_dup: int = SEG_MIN_DUP,
) -> DataFrame:
    """CCNet-style duplicated-segment removal.

    Documents are segmented into consecutive ``seg_tokens``-token windows;
    a segment occurring in ≥ ``min_dup`` DISTINCT documents is dropped
    everywhere it occurs; survivors are reassembled in order.  Returns
    ``(doc_id, n_segs, n_dup_segs, kept_text, n_chars_kept)``.

    Scale shape: one tokenize+explode pass, one group-by on the 60-bit
    segment hash (partial agg → tiny distinct-doc counts), one equi-join
    back on the hash, one group-by doc_id to reassemble.  At 100 TB the
    duplicated-segment table is the only state that crosses stages and it
    shrinks with dedup quality; heavy-hitter segments (boilerplate) are
    exactly the rows the count table compacts to one row each.
    """
    seg_expr = _segments(T.tokens(text), seg_tokens)
    # Pinned (lazy localCheckpoint): segs feeds the distinct-doc count
    # AND the join-back, so the tokenize+explode+md5 pass ran twice.
    # Staging it runs the pass once — the exploded-segment handoff any
    # CCNet-style job writes between its count and filter stages.
    segs = docs.select(
        F.col(id_).alias("doc_id"),
        F.posexplode(F.expr(seg_expr)).alias("seg_idx", "seg"),
    ).withColumn("seg_h", F.expr(T.hash60("seg"))).transform(_stage_lazy)
    counts = segs.groupBy("seg_h").agg(
        F.countDistinct("doc_id").alias("nd")
    )
    joined = segs.join(counts, "seg_h")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_segs"),
            F.sum(
                F.when(F.col("nd") >= min_dup, F.lit(1)).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("n_dup_segs"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("nd") < min_dup,
                                F.struct("seg_idx", "seg"),
                            )
                        )
                    ),
                    lambda s: s.seg,
                ),
                " ",
            ).alias("kept_text"),
        )
        .withColumn("n_chars_kept", F.length("kept_text").cast("bigint"))
    )


def d_segment_dedup(
    seg_tokens: int = SEG_TOKENS, min_dup: int = SEG_MIN_DUP
) -> str:
    """DuckDB oracle for :func:`segment_dedup` (textually parallel)."""
    toks = T.d_tokens("text")
    n = seg_tokens
    return f"""
WITH tk AS (SELECT doc_id, {toks} AS toks FROM documents),
sg AS (SELECT doc_id,
              list_transform(range(0, CAST(ceil(len(toks) / {n}.0) AS BIGINT)),
                             i -> array_to_string(toks[i * {n} + 1 : i * {n} + {n}], ' ')) AS segs
       FROM tk),
seg AS (SELECT doc_id, generate_subscripts(segs, 1) - 1 AS seg_idx,
               unnest(segs) AS seg FROM sg),
segh AS (SELECT doc_id, seg_idx, seg, {T.d_hash60('seg')} AS seg_h FROM seg),
cnt AS (SELECT seg_h, count(DISTINCT doc_id) AS nd FROM segh GROUP BY seg_h)
SELECT s.doc_id,
       count(*) AS n_segs,
       CAST(sum(CASE WHEN c.nd >= {min_dup} THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
       coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_idx)
                FILTER (WHERE c.nd < {min_dup}), '') AS kept_text,
       CAST(length(coalesce(string_agg(s.seg, ' ' ORDER BY s.seg_idx)
                            FILTER (WHERE c.nd < {min_dup}), '')) AS BIGINT) AS n_chars_kept
FROM segh s JOIN cnt c USING (seg_h)
GROUP BY s.doc_id
"""


def doc_chunks(
    docs: DataFrame,
    id_: str = "doc_id",
    text: str = "text",
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Overlapping fixed-window chunking: ``(doc_id, chunk_idx,
    chunk_text, chunk_len)``.

    Chunk ``i`` covers characters ``[i·stride, i·stride + size)``; the
    chunk count is ``ceil(max(len − overlap, 1) / stride)`` so the final
    window always reaches the end of the document and no window starts
    past it.  Map-only (explode of a generated index — no shuffle at
    all); chunking 100 TB is embarrassingly parallel and the output
    inherits the input partitioning.
    """
    overlap = size - stride
    n_chunks = (
        f"CAST(ceil(greatest(length({text}) - {overlap}, 1) / {stride}.0) AS INT)"
    )
    ex = docs.select(
        F.col(id_).alias("doc_id"),
        F.col(text).alias("_t"),
        F.posexplode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias(
            "chunk_idx", "_i"
        ),
    )
    return ex.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.expr(f"substring(_t, chunk_idx * {stride} + 1, {size})").alias(
            "chunk_text"
        ),
    ).withColumn("chunk_len", F.length("chunk_text").cast("bigint"))


def d_doc_chunks(size: int = CHUNK_SIZE, stride: int = CHUNK_STRIDE) -> str:
    """DuckDB oracle for :func:`doc_chunks`."""
    overlap = size - stride
    return f"""
WITH ix AS (SELECT doc_id, text,
                   unnest(range(0, CAST(ceil(greatest(length(text) - {overlap}, 1) / {stride}.0) AS BIGINT))) AS chunk_idx
            FROM documents)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       substr(text, CAST(chunk_idx AS INT) * {stride} + 1, {size}) AS chunk_text,
       CAST(length(substr(text, CAST(chunk_idx AS INT) * {stride} + 1, {size})) AS BIGINT) AS chunk_len
FROM ix
"""


def shard_export(
    docs: DataFrame, id_: str = "doc_id", n_shards: int = N_SHARDS
) -> DataFrame:
    """Deterministic training-shard assignment: ``(doc_id, shard,
    pos_in_shard, shard_key)``.

    The shard and intra-shard order derive from a salted 60-bit md5 hash
    of the id — a reshuffle-free, resumable global shuffle: any engine
    (or a later incremental run) reproduces the same placement without
    coordination.  One hash projection + one shuffle on ``shard`` for
    the rank window; each shard's window sorts independently (no global
    order).  At scale ``n_shards`` must GROW with the corpus (standard
    practice: ~1-4 GB per training shard, so 100 TB → tens of thousands
    of shards): each rank window sorts corpus/n_shards rows in one task
    (spill-backed external sort), so the default 8 is a fixture setting,
    not a 100 TB one.
    """
    key = T.hash60(f"concat('shard:', CAST({id_} AS STRING))")
    w = Window.partitionBy("shard").orderBy("shard_key", "doc_id")
    return (
        docs.select(
            F.col(id_).alias("doc_id"),
            F.expr(key).alias("shard_key"),
        )
        .withColumn("shard", (F.col("shard_key") % n_shards).cast("int"))
        .withColumn("pos_in_shard", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos_in_shard", "shard_key")
    )


def d_shard_export(n_shards: int = N_SHARDS) -> str:
    """DuckDB oracle for :func:`shard_export`."""
    key = T.d_hash60("('shard:' || CAST(doc_id AS VARCHAR))")
    return f"""
WITH k AS (SELECT doc_id, {key} AS shard_key FROM documents),
s AS (SELECT doc_id, shard_key,
             CAST(shard_key % {n_shards} AS INT) AS shard FROM k)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY shard_key, doc_id) AS BIGINT) AS pos_in_shard,
       shard_key
FROM s
"""


def gopher_filter(
    docs: DataFrame, id_: str = "doc_id", text: str = "text"
) -> DataFrame:
    """Gopher-style quality gate with integer-exact rules.

    Emits one 0/1 column per rule plus the conjunction; every rule is a
    cross-multiplied integer comparison (``2·n ≤ Σlen`` instead of
    ``Σlen/n ≥ 2``) so both engines agree bitwise.  Map-only single pass.
    """
    toks = T.tokens(text)
    stop = _arr_lit(STOPWORDS["en"])
    d = docs.select(
        F.col(id_).alias("doc_id"),
        F.expr(f"size({toks})").cast("bigint").alias("n_tokens"),
        F.expr(
            f"aggregate({toks}, CAST(0 AS BIGINT), (a, t) -> a + length(t))"
        ).alias("_sum_len"),
        F.expr(
            f"CAST(size(filter({toks}, t -> array_contains({stop}, t))) AS BIGINT)"
        ).alias("_stop_hits"),
        F.expr(f"CAST(size(array_distinct({toks})) AS BIGINT)").alias("_n_distinct"),
    )
    r_ntok = (F.col("n_tokens") >= GOPHER_MIN_TOKENS) & (
        F.col("n_tokens") <= GOPHER_MAX_TOKENS
    )
    r_avg = (F.col("_sum_len") >= GOPHER_MIN_AVG_LEN * F.col("n_tokens")) & (
        F.col("_sum_len") <= GOPHER_MAX_AVG_LEN * F.col("n_tokens")
    )
    r_stop = F.col("_stop_hits") * GOPHER_STOP_DENOM >= F.col("n_tokens")
    r_dist = (
        F.col("_n_distinct") * GOPHER_DISTINCT_DENOM
        >= F.col("n_tokens") * GOPHER_DISTINCT_NUM
    )
    flag = lambda c: F.when(c, F.lit(1)).otherwise(F.lit(0)).cast("int")  # noqa: E731
    return d.select(
        "doc_id",
        "n_tokens",
        flag(r_ntok).alias("r_len"),
        flag(r_avg).alias("r_avg_token_len"),
        flag(r_stop).alias("r_stopword_ratio"),
        flag(r_dist).alias("r_distinct_ratio"),
        flag(r_ntok & r_avg & r_stop & r_dist).alias("keep"),
    )


def d_gopher_filter() -> str:
    """DuckDB oracle for :func:`gopher_filter`."""
    toks = T.d_tokens("text")
    stop = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"
    return f"""
WITH tk AS (SELECT doc_id, {toks} AS toks FROM documents),
m AS (SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CAST(list_sum(list_transform(toks, t -> length(t))) AS BIGINT) AS sum_len,
             CAST(len(list_filter(toks, t -> list_contains({stop}, t))) AS BIGINT) AS stop_hits,
             CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
      FROM tk)
SELECT doc_id, n_tokens,
       CAST(CASE WHEN n_tokens >= {GOPHER_MIN_TOKENS} AND n_tokens <= {GOPHER_MAX_TOKENS} THEN 1 ELSE 0 END AS INT) AS r_len,
       CAST(CASE WHEN sum_len >= {GOPHER_MIN_AVG_LEN} * n_tokens AND sum_len <= {GOPHER_MAX_AVG_LEN} * n_tokens THEN 1 ELSE 0 END AS INT) AS r_avg_token_len,
       CAST(CASE WHEN stop_hits * {GOPHER_STOP_DENOM} >= n_tokens THEN 1 ELSE 0 END AS INT) AS r_stopword_ratio,
       CAST(CASE WHEN n_distinct * {GOPHER_DISTINCT_DENOM} >= n_tokens * {GOPHER_DISTINCT_NUM} THEN 1 ELSE 0 END AS INT) AS r_distinct_ratio,
       CAST(CASE WHEN n_tokens >= {GOPHER_MIN_TOKENS} AND n_tokens <= {GOPHER_MAX_TOKENS}
                  AND sum_len >= {GOPHER_MIN_AVG_LEN} * n_tokens AND sum_len <= {GOPHER_MAX_AVG_LEN} * n_tokens
                  AND stop_hits * {GOPHER_STOP_DENOM} >= n_tokens
                  AND n_distinct * {GOPHER_DISTINCT_DENOM} >= n_tokens * {GOPHER_DISTINCT_NUM}
             THEN 1 ELSE 0 END AS INT) AS keep
FROM m
"""


def tfidf_terms(
    docs: DataFrame,
    group: str = "source",
    text: str = "text",
    k: int = TFIDF_TOPK,
) -> DataFrame:
    """Per-``group`` top-k salient terms by tf·idf: ``(source, rnk, tok,
    tf, df, score_r)``.

    idf uses the probability-ratio form ``(N + 1) / (df + 1)`` — a
    monotone transform of the usual ``ln``-idf at fixed tf, chosen (like
    ``token_pmi``) because the whole score is then a short chain of
    IEEE-exact divisions/multiplications both engines round identically.

    Shape: one tokenize+explode, one (group, tok) count, document
    frequency as ``count(*) OVER (PARTITION BY tok)`` (``tf`` is unique
    per (group, tok), so row count per tok IS the distinct-group count —
    no tok-level aggregate+join), a broadcast of the 1-row N, and a
    per-group rank window — no global sort, three shuffles total.

    NULL groups are excluded up front on BOTH sides: SQL
    ``count(DISTINCT grp)`` ignores NULL while a window ``count(*)``
    would count it, so admitting NULL-source rows would silently desync
    df between the engines.
    """
    tok_tab = docs.where(F.col(group).isNotNull()).select(
        F.col(group).alias("grp"), F.explode(F.expr(T.tokens(text))).alias("tok")
    )
    tf = tok_tab.groupBy("grp", "tok").agg(F.count("*").alias("tf"))
    n_src = docs.agg(
        F.countDistinct(F.col(group)).cast("double").alias("n_grp")
    )
    w_df = Window.partitionBy("tok")
    w = Window.partitionBy("grp").orderBy(
        F.col("_score").desc(), F.col("tok").asc()
    )
    return (
        tf.withColumn("df", F.count("*").over(w_df))
        .crossJoin(F.broadcast(n_src))
        .withColumn(
            "_score",
            F.col("tf").cast("double")
            * ((F.col("n_grp") + 1.0) / (F.col("df").cast("double") + 1.0)),
        )
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .where(F.col("rnk") <= k)
        .select(
            F.col("grp").alias(group),
            "rnk",
            "tok",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            F.round("_score", 6).alias("score_r"),
        )
    )


def d_tfidf_terms(group: str = "source", k: int = TFIDF_TOPK) -> str:
    """DuckDB oracle for :func:`tfidf_terms`."""
    toks = T.d_tokens("text")
    return f"""
WITH tok AS (SELECT {group} AS grp, unnest({toks}) AS tok FROM documents
           WHERE {group} IS NOT NULL),
tf AS (SELECT grp, tok, count(*) AS tf FROM tok GROUP BY grp, tok),
dfx AS (SELECT tok, count(DISTINCT grp) AS df FROM tf GROUP BY tok),
n AS (SELECT CAST(count(DISTINCT {group}) AS DOUBLE) AS n_grp FROM documents),
sc AS (SELECT tf.grp, tf.tok, tf.tf, dfx.df,
              CAST(tf.tf AS DOUBLE) * ((n.n_grp + 1.0) / (CAST(dfx.df AS DOUBLE) + 1.0)) AS score
       FROM tf JOIN dfx USING (tok) CROSS JOIN n),
rk AS (SELECT grp, tok, tf, df, score,
              row_number() OVER (PARTITION BY grp ORDER BY score DESC, tok ASC) AS rnk
       FROM sc)
SELECT grp AS {group}, CAST(rnk AS BIGINT) AS rnk, tok,
       CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       round(score, 6) AS score_r
FROM rk WHERE rnk <= {k}
"""


def integrity_audit(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """Corpus integrity audit → ONE summary row of dataset-quality
    counters: referential integrity between documents and embeddings,
    metadata drift, and vector-payload health.

    Columns: ``n_docs, n_embeddings, docs_missing_embedding,
    embeddings_missing_doc, n_chars_mismatch, n_empty_text,
    n_nonfinite_vec, n_zero_vec, n_dims``.

    Every counter is an integer (bitwise cross-engine).  Shape: one
    full-outer join of the two thin id projections (the only shuffle
    carrying one BIGINT per row at 100 TB) aggregated into both
    missing-link counts, plus two single-pass aggregates; fully LAZY —
    constructing the DataFrame runs no jobs, the whole audit is one
    reproducible plan.  Nothing quadratic, no Python.
    """
    d_ids = docs.select(F.col("doc_id").alias("_id"), F.lit(1).alias("_d"))
    e_ids = emb.select(F.col("vec_id").alias("_id"), F.lit(1).alias("_e"))
    link = (
        d_ids.join(e_ids, "_id", "full_outer")
        .agg(
            F.sum(F.when(F.col("_e").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("docs_missing_embedding"),
            F.sum(F.when(F.col("_d").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("embeddings_missing_doc"),
        )
    )
    doc_stats = docs.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).cast("bigint").alias("n_chars_mismatch"),
        F.sum(F.when(F.trim(F.col("text")) == "", 1).otherwise(0))
        .cast("bigint")
        .alias("n_empty_text"),
    )
    bad_vec = (
        "exists(embedding, x -> isnan(x) OR abs(x) = CAST('Infinity' AS DOUBLE))"
    )
    zero_vec = "aggregate(embedding, 0D, (a, x) -> a + x * x) = 0D"
    emb_stats = emb.agg(
        F.count("*").cast("bigint").alias("n_embeddings"),
        F.sum(F.when(F.expr(bad_vec), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nonfinite_vec"),
        F.sum(F.when(F.expr(zero_vec), 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_vec"),
        F.countDistinct(F.size("embedding")).cast("bigint").alias("n_dims"),
    )
    return (
        doc_stats.crossJoin(emb_stats)
        .crossJoin(F.broadcast(link))
        .select(
            "n_docs",
            "n_embeddings",
            "docs_missing_embedding",
            "embeddings_missing_doc",
            "n_chars_mismatch",
            "n_empty_text",
            "n_nonfinite_vec",
            "n_zero_vec",
            "n_dims",
        )
    )


def d_integrity_audit() -> str:
    """DuckDB oracle for :func:`integrity_audit`."""
    return """
WITH dm AS (SELECT count(*) AS docs_missing_embedding
            FROM documents d WHERE NOT EXISTS
              (SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)),
em AS (SELECT count(*) AS embeddings_missing_doc
       FROM embeddings e WHERE NOT EXISTS
         (SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)),
ds AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_mismatch,
              CAST(sum(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty_text
       FROM documents),
es AS (SELECT CAST(count(*) AS BIGINT) AS n_embeddings,
              CAST(sum(CASE WHEN len(list_filter(embedding,
                     x -> isnan(x) OR abs(x) = CAST('infinity' AS DOUBLE))) > 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_nonfinite_vec,
              CAST(sum(CASE WHEN list_reduce(list_prepend(CAST(0 AS DOUBLE), embedding),
                     (a, x) -> a + x * x) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_vec,
              CAST(count(DISTINCT len(embedding)) AS BIGINT) AS n_dims
       FROM embeddings)
SELECT ds.n_docs, es.n_embeddings,
       CAST(dm.docs_missing_embedding AS BIGINT) AS docs_missing_embedding,
       CAST(em.embeddings_missing_doc AS BIGINT) AS embeddings_missing_doc,
       ds.n_chars_mismatch, ds.n_empty_text,
       es.n_nonfinite_vec, es.n_zero_vec, es.n_dims
FROM ds, es, dm, em
"""


SPAN_TOKENS = 10


def span_dedup(
    docs: DataFrame,
    id_: str = "doc_id",
    text: str = "text",
    win: int = SPAN_TOKENS,
    min_dup: int = SEG_MIN_DUP,
) -> DataFrame:
    """Exact substring-span dedup (the Lee et al. 'Deduplicating
    Training Data makes LM better' shape): every OVERLAPPING ``win``-token
    window is hashed corpus-wide; windows occurring in ≥ ``min_dup``
    distinct docs mark duplicated positions, and per doc the consecutive
    duplicated positions merge into MAXIMAL spans → ``(doc_id, span_idx,
    start_tok, end_tok, span_windows)`` with ``end_tok`` exclusive.

    Unlike :func:`segment_dedup` (disjoint segments — CCNet's cheap
    form), stride-1 windows catch duplicated passages at ANY alignment;
    the cost is a ``n_tokens``-row explode per doc instead of
    ``n_tokens/win``.  Scale shape is identical: one explode, one
    group-by on the window hash, one join back, one per-doc merge pass
    (the island merge is two window functions over (doc_id, i) — no
    extra shuffle beyond the doc_id one the output needs anyway).
    """
    toks = T.tokens(text)
    wins = (
        f"CASE WHEN size({toks}) < {win} THEN array() "
        f"ELSE transform(sequence(0, size({toks}) - {win}), "
        f"i -> array_join(slice({toks}, i + 1, {win}), ' ')) END"
    )
    w_tab = docs.select(
        F.col(id_).alias("doc_id"),
        F.posexplode(F.expr(wins)).alias("i", "win"),
    ).withColumn("win_h", F.expr(T.hash60("win")))
    counts = w_tab.groupBy("win_h").agg(F.countDistinct("doc_id").alias("nd"))
    dup = (
        w_tab.join(counts, "win_h")
        .where(F.col("nd") >= min_dup)
        .select("doc_id", "i")
    )
    w_isl = Window.partitionBy("doc_id").orderBy("i")
    isl = dup.withColumn("_grp", F.col("i") - F.row_number().over(w_isl))
    spans = isl.groupBy("doc_id", "_grp").agg(
        F.min("i").cast("bigint").alias("start_tok"),
        (F.max("i") + win).cast("bigint").alias("end_tok"),
        F.count("*").cast("bigint").alias("span_windows"),
    )
    w_rank = Window.partitionBy("doc_id").orderBy("start_tok")
    return spans.select(
        "doc_id",
        F.row_number().over(w_rank).cast("bigint").alias("span_idx"),
        "start_tok",
        "end_tok",
        "span_windows",
    )


def d_span_dedup(win: int = SPAN_TOKENS, min_dup: int = SEG_MIN_DUP) -> str:
    """DuckDB oracle for :func:`span_dedup`."""
    toks = T.d_tokens("text")
    return f"""
WITH tk AS (SELECT doc_id, {toks} AS toks FROM documents),
w AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i,
             array_to_string(toks[u.i + 1 : u.i + {win}], ' ') AS win
      FROM tk, unnest(range(0, greatest(len(toks) - {win} + 1, 0))) AS u(i)),
wh AS (SELECT doc_id, i, {T.d_hash60('win')} AS win_h FROM w),
cnt AS (SELECT win_h, count(DISTINCT doc_id) AS nd FROM wh GROUP BY win_h),
dup AS (SELECT wh.doc_id, wh.i FROM wh JOIN cnt USING (win_h) WHERE cnt.nd >= {min_dup}),
isl AS (SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
        FROM dup),
spans AS (SELECT doc_id,
                 CAST(min(i) AS BIGINT) AS start_tok,
                 CAST(max(i) + {win} AS BIGINT) AS end_tok,
                 CAST(count(*) AS BIGINT) AS span_windows
          FROM isl GROUP BY doc_id, grp)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_tok) AS BIGINT) AS span_idx,
       start_tok, end_tok, span_windows
FROM spans
"""


def source_divergence(
    docs: DataFrame, group: str = "source", text: str = "text"
) -> DataFrame:
    """Data-mixing drift diagnostic: total-variation distance between
    each source's token distribution and the whole-corpus distribution →
    ``(source, n_tokens_src, tv_num, tv_r)``.

    TV(s, corpus) = ½ Σ_t |p_s(t) − p_c(t)|.  Everything stays INTEGER
    until one final division: with c_s/c_c the token counts and N_s/N_c
    the totals,  tv_num = Σ_{t∈s} |c_s·N_c − c_c·N_s|  +  N_s·(N_c −
    Σ_{t∈s} c_c)   (the second term folds in every token absent from
    the source without materializing the source×vocabulary cross join),
    and  tv_r = tv_num / (2·N_s·N_c)  — a single exact-integer-to-double
    division both engines round identically (the same reason the PMI
    and tf·idf queries avoid libm forms).  Overflow bound: products stay
    in int64 while N_s·N_c < 2⁶³ (≈3·10⁹ tokens per side) — past that,
    switch the two sums to DECIMAL(38,0), as the TPC-H money aggregates
    do.

    Shape: one tokenize+explode, a (group, tok) count and a tok-total
    count (both partial-agg), one equi-join on tok, one per-source
    aggregate, and a broadcast of the 1-row corpus total.
    """
    tok_tab = docs.where(F.col(group).isNotNull()).select(
        F.col(group).alias("grp"), F.explode(F.expr(T.tokens(text))).alias("tok")
    )
    cs = tok_tab.groupBy("grp", "tok").agg(F.count("*").alias("c_s"))
    cc = cs.groupBy("tok").agg(F.sum("c_s").alias("c_c"))
    ns = cs.groupBy("grp").agg(F.sum("c_s").alias("n_s"))
    nc = cc.agg(F.sum("c_c").cast("bigint").alias("n_c"))
    present = (
        cs.join(cc, "tok")
        .join(ns, "grp")
        .crossJoin(F.broadcast(nc))
        .groupBy("grp", "n_s", "n_c")
        .agg(
            F.sum(F.abs(F.col("c_s") * F.col("n_c") - F.col("c_c") * F.col("n_s")))
            .cast("bigint")
            .alias("_present"),
            F.sum("c_c").cast("bigint").alias("_cc_present"),
        )
    )
    return present.select(
        F.col("grp").alias(group),
        F.col("n_s").cast("bigint").alias("n_tokens_src"),
        (
            F.col("_present")
            + F.col("n_s") * (F.col("n_c") - F.col("_cc_present"))
        )
        .cast("bigint")
        .alias("tv_num"),
        F.round(
            (F.col("_present") + F.col("n_s") * (F.col("n_c") - F.col("_cc_present")))
            .cast("double")
            / (2.0 * F.col("n_s").cast("double") * F.col("n_c").cast("double")),
            6,
        ).alias("tv_r"),
    )


def d_source_divergence(group: str = "source") -> str:
    """DuckDB oracle for :func:`source_divergence`."""
    toks = T.d_tokens("text")
    return f"""
WITH tok AS (SELECT {group} AS grp, unnest({toks}) AS tok FROM documents
             WHERE {group} IS NOT NULL),
cs AS (SELECT grp, tok, count(*) AS c_s FROM tok GROUP BY grp, tok),
cc AS (SELECT tok, CAST(sum(c_s) AS BIGINT) AS c_c FROM cs GROUP BY tok),
ns AS (SELECT grp, CAST(sum(c_s) AS BIGINT) AS n_s FROM cs GROUP BY grp),
nc AS (SELECT CAST(sum(c_c) AS BIGINT) AS n_c FROM cc),
pr AS (SELECT cs.grp, ns.n_s, nc.n_c,
              CAST(sum(abs(cs.c_s * nc.n_c - cc.c_c * ns.n_s)) AS BIGINT) AS present,
              CAST(sum(cc.c_c) AS BIGINT) AS cc_present
       FROM cs JOIN cc USING (tok) JOIN ns USING (grp) CROSS JOIN nc
       GROUP BY cs.grp, ns.n_s, nc.n_c)
SELECT grp AS {group},
       n_s AS n_tokens_src,
       CAST(present + n_s * (n_c - cc_present) AS BIGINT) AS tv_num,
       round(CAST(present + n_s * (n_c - cc_present) AS DOUBLE)
             / (2.0 * CAST(n_s AS DOUBLE) * CAST(n_c AS DOUBLE)), 6) AS tv_r
FROM pr
"""


# ---------------------------------------------------------------------------
# N-gram decontamination with SPAN REMOVAL — the GPT-3 appendix-C /
# PaLM protocol (Brown et al. 2020; Chowdhery et al. 2022): instead of
# only FLAGGING eval-overlapping documents (contamination_check), find
# every n-gram collision with the benchmark set and surgically remove
# the colliding span plus a safety margin, keeping the rest of the
# document.  Flag-and-drop wastes whole documents over one quoted
# sentence; span removal keeps the clean 99%.
# ---------------------------------------------------------------------------

DECON_N = 13          # GPT-3 used 13-gram collisions
DECON_MARGIN = 20     # tokens removed on each side of a collision


def decontaminate_ngrams(
    docs: DataFrame,
    benchmark_ids: DataFrame,
    n: int = DECON_N,
    margin: int = DECON_MARGIN,
    id_: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """→ (doc_id, n_tokens, n_removed, clean_text) for every
    NON-benchmark doc: tokens covered by any benchmark n-gram collision
    (± ``margin`` tokens) are removed; ``clean_text`` is the surviving
    tokens re-joined (== the normalized text when nothing collides).

    Scale shape: benchmark n-gram hashes are DISTINCT windows of a
    small doc set → broadcast; the corpus pays one stride-1 window
    explode (O(tokens)) + one broadcast semi-join; collision positions
    expand to covered token indexes via ``sequence`` explode — O(hits ×
    window) rows through a plain (doc_id, i) equi-join, never a range
    join; reconstruction is one per-doc sort-merge.  Everything is
    deterministic integer/string work — bitwise cross-engine."""
    toks = T.tokens(text)
    wins = (
        f"CASE WHEN size({toks}) < {n} THEN array() "
        f"ELSE transform(sequence(0, size({toks}) - {n}), "
        f"i -> array_join(slice({toks}, i + 1, {n}), ' ')) END"
    )
    bench = benchmark_ids.select(F.col(id_).alias("doc_id"))
    w_tab = docs.select(
        F.col(id_).alias("doc_id"),
        F.posexplode(F.expr(wins)).alias("i", "win"),
    ).withColumn("win_h", F.expr(T.hash60("win")))
    bench_w = (
        w_tab.join(F.broadcast(bench), on="doc_id", how="left_semi")
        .select("win_h")
        .distinct()
    )
    corpus_w = w_tab.join(F.broadcast(bench), on="doc_id", how="left_anti")
    hits = corpus_w.join(F.broadcast(bench_w), on="win_h", how="left_semi")
    covered = (
        hits.select(
            "doc_id",
            F.explode(
                F.expr(f"sequence(greatest(i - {margin}, 0), i + {n - 1 + margin})")
            ).alias("i"),
        )
        .distinct()
    )
    tk = (
        docs.select(F.col(id_).alias("doc_id"), F.col(text))
        .join(F.broadcast(bench), on="doc_id", how="left_anti")
        .select("doc_id", F.posexplode(F.expr(toks)).alias("i", "tok"))
    )
    tot = tk.groupBy("doc_id").agg(F.count("*").cast("long").alias("n_tokens"))
    kept = tk.join(covered, on=["doc_id", "i"], how="left_anti")
    clean = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(i, tok))), x -> x.tok), ' ')"
        ).alias("clean_text"),
    )
    return (
        tot.join(clean, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def d_decontaminate_ngrams(
    bench_pred: str, n: int = DECON_N, margin: int = DECON_MARGIN
) -> str:
    """DuckDB oracle for :func:`decontaminate_ngrams` over ``documents``;
    ``bench_pred`` selects the benchmark rows (e.g. ``doc_id < 5``)."""
    toks = T.d_tokens("text")
    return f"""
WITH tkk AS (SELECT doc_id, {toks} AS toks FROM documents),
w AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i,
             array_to_string(toks[u.i + 1 : u.i + {n}], ' ') AS win
      FROM tkk, unnest(range(0, greatest(len(toks) - {n} + 1, 0))) AS u(i)),
wh AS (SELECT doc_id, i, {T.d_hash60('win')} AS win_h FROM w),
bw AS (SELECT DISTINCT win_h FROM wh WHERE {bench_pred}),
hits AS (SELECT doc_id, i FROM wh
         WHERE NOT ({bench_pred}) AND win_h IN (SELECT win_h FROM bw)),
cov AS (SELECT DISTINCT doc_id, CAST(u.i AS BIGINT) AS i
        FROM hits, unnest(range(greatest(i - {margin}, 0), i + {n + margin})) AS u(i)),
tk AS (SELECT doc_id, CAST(u.i AS BIGINT) AS i, toks[u.i + 1] AS tok
       FROM tkk, unnest(range(0, len(toks))) AS u(i)
       WHERE NOT ({bench_pred})),
tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens FROM tk GROUP BY doc_id),
kept AS (SELECT tk.doc_id, tk.i, tk.tok FROM tk
         ANTI JOIN cov ON tk.doc_id = cov.doc_id AND tk.i = cov.i),
cl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
              string_agg(tok, ' ' ORDER BY i) AS clean_text
       FROM kept GROUP BY doc_id)
SELECT t.doc_id, t.n_tokens,
       CAST(t.n_tokens - coalesce(c.n_kept, 0) AS BIGINT) AS n_removed,
       coalesce(c.clean_text, '') AS clean_text
FROM tot t LEFT JOIN cl c USING (doc_id)
"""
