"""Deterministic sampling / splitting operators (beyond-reference
north-star surface: the selection stages of a training-data pipeline).

All three are pure column expressions over the portable 60-bit md5 hash
(functions/text.hash60), so every split is (a) reproducible across runs
and engines — the DuckDB oracle computes the identical assignment — and
(b) embarrassingly parallel: ``train_val_split`` and
``stratified_sample`` are map-only (no shuffle at any corpus size);
``quota_sample`` shuffles once on the group key.

Why hash-based instead of ``rand()``/``TABLESAMPLE``: a 100 TB pipeline
re-runs incrementally; membership of a document in train/val must be a
pure function of its id, not of partition layout or row order, or every
re-run leaks val docs into train.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T

# hash60 yields a uniform 60-bit value; bucket into 1e6 cells for
# fraction arithmetic with 1e-6 resolution.
_BUCKETS = 1_000_000


def _bucket_expr(id_: str, salt: str) -> str:
    """Deterministic bucket in [0, 1e6) from (id, salt)."""
    keyed = f"concat(CAST({id_} AS STRING), ':{salt}')"
    return f"{T.hash60(keyed)} % {_BUCKETS}"


def train_val_split(
    docs: DataFrame,
    val_frac: float = 0.1,
    salt: str = "split",
    id_: str = "doc_id",
) -> DataFrame:
    """(doc_id, split): 'val' for a deterministic ``val_frac`` of docs,
    'train' for the rest.  Map-only; membership is a pure function of
    (id, salt) so incremental re-runs never migrate documents."""
    cut = int(round(val_frac * _BUCKETS))
    return docs.select(
        F.col(id_),
        F.when(F.expr(_bucket_expr(id_, salt)) < cut, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum: str = "lang",
    salt: str = "sample",
    id_: str = "doc_id",
    default_frac: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sample: keep a hash-fraction of each
    stratum (e.g. downsample dominant languages).  Map-only — the
    per-stratum cut is a CASE expression, no shuffle."""
    cut = F.lit(int(round(default_frac * _BUCKETS)))
    for key, frac in sorted(fractions.items()):
        cut = F.when(F.col(stratum) == key, int(round(frac * _BUCKETS))).otherwise(cut)
    return docs.where(F.expr(_bucket_expr(id_, salt)) < cut)


def quota_sample(
    docs: DataFrame,
    quota: int,
    group: str = "lang",
    salt: str = "quota",
    id_: str = "doc_id",
) -> DataFrame:
    """At most ``quota`` docs per group, chosen by deterministic hash
    order (a reproducible pseudo-random draw) → the input rows of the
    survivors, plus their within-group pick_rank.

    One shuffle (by group).  Scale note: the rank window sorts each
    group; for quotas ≪ group size on skewed groups, pre-filter with a
    generous hash cut first (keep ~4·quota·(1e6/|group|) buckets) to
    bound the sorted volume — the exact top-``quota`` by hash survives
    any such superset cut, so the result is unchanged.  The window
    itself uses partial top-k (WindowGroupLimit) when followed by the
    rank filter, so no full group materializes."""
    w = Window.partitionBy(group).orderBy(
        F.expr(_bucket_expr(id_, salt)).asc(), F.col(id_).asc()
    )
    return (
        docs.withColumn("pick_rank", F.row_number().over(w).cast("long"))
        .where(F.col("pick_rank") <= quota)
    )


# -- DuckDB oracle fragments (textually parallel) ---------------------------


def d_bucket_expr(id_: str, salt: str) -> str:
    keyed = f"concat(CAST({id_} AS VARCHAR), ':{salt}')"
    return f"{T.d_hash60(keyed)} % {_BUCKETS}"


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int,
    n_shards: int = 32,
    salt: str = "pack",
    id_: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Sequence packing (training-prep): lay documents out into fixed
    token-budget training sequences → (doc_id, shard, bin_id,
    offset_tokens, n_tokens).

    Semantics = the standard pretraining concat-and-chunk: within each
    shard, docs are concatenated in a deterministic hash order and the
    token stream is cut every ``budget_tokens``; ``bin_id`` is the chunk
    holding the doc's FIRST token and ``offset_tokens`` its position in
    that chunk (a doc whose span crosses the cut continues into the next
    chunk — exactly how LLM pretraining packs; no padding waste).

    Packing is per-shard (hash-sharded into ``n_shards`` streams)
    because a GLOBAL running sum is a single-partition window — the
    non-scalable formulation.  Per-shard windows run parallel and each
    shard packs independently, which is how a 1000-executor job lays
    out training shards anyway.  SIZE ``n_shards`` to the corpus:
    each shard is one window partition (one task sorts it), so pick
    n_shards ≈ corpus_tokens / ~10⁸ (≫ executor count) — the default
    32 is fixture-scale only.
    """
    toks = docs.select(
        F.col(id_),
        F.expr(f"CAST({id_} AS BIGINT) % {n_shards}").alias("shard"),
        F.expr(f"CAST(size({T.tokens(text)}) AS BIGINT)").alias("n_tokens"),
        F.expr(_bucket_expr(id_, salt)).alias("_ord"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_ord").asc(), F.col(id_).asc())
    cum = toks.withColumn("_cum", F.sum("n_tokens").over(w))
    # the doc's first token sits at stream position (_cum - n_tokens);
    # integer-divide by the budget to get its chunk, mod for the offset
    return cum.select(
        id_,
        "shard",
        F.floor((F.col("_cum") - F.col("n_tokens")) / budget_tokens).alias("bin_id"),
        ((F.col("_cum") - F.col("n_tokens")) % budget_tokens).alias("offset_tokens"),
        "n_tokens",
    )


def mixture_sample(
    docs: DataFrame,
    char_budget_per_source: int,
    source: str = "source",
    id_: str = "doc_id",
    size_col: str = "n_chars",
) -> DataFrame:
    """Mixture rebalancing: per-source deterministic sample up to a
    character budget → (doc_id, source, n_chars, cum_chars).

    The data-mixing step of a pretraining pipeline: cap every source at
    the same budget so over-represented crawls can't drown curated
    sources.  Docs are taken in salted-hash order (uniform within each
    source, reproducible across runs) while the running total stays
    within budget — a doc is kept iff its cumulative size up to and
    INCLUDING it is ≤ budget (documents larger than the remaining
    budget are skipped only implicitly: the scan stops at the first
    overflow, matching the window formulation exactly).

    Shape: one hash shuffle on source + an in-partition sort for the
    cumulative-sum window — identical cost to any per-group ranking; no
    driver state.  Skew note: a giant source makes one hot window
    partition — at 100 TB pre-filter each source with stratified_sample
    to ~2× budget (hash order is uniform, so the survivors are the same
    docs with overwhelming probability), then run the exact window on
    the small remainder.
    """
    w = (
        Window.partitionBy(source)
        .orderBy(F.expr(_bucket_expr(id_, "mix")).asc(), F.col(id_).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        F.col(id_), F.col(source), F.col(size_col).cast("long").alias("n_chars")
    ).withColumn("cum_chars", F.sum("n_chars").over(w).cast("long"))
    return sized.where(F.col("cum_chars") <= char_budget_per_source)


def weighted_sample_aes(
    docs: DataFrame,
    k: int,
    weight: str = "n_chars",
    id_: str = "doc_id",
    salt: str = "aes",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k items with probability ∝
    ``weight`` — the Efraimidis–Spirakis A-ES one-pass scheme: each row
    draws ``u ∈ (0,1)`` deterministically from its id, keys on
    ``−ln(u)/w`` and the k SMALLEST keys win (equivalent to the classic
    ``u^{1/w}`` top-k form, in the numerically stable log domain).

    Cross-engine exactness: u comes from the portable ``hash60`` bucket
    (md5-based), the key is micro-scaled and rounded to BIGINT once per
    row, ties break by id.  Residual libm caveat: the ``−ln(u)`` runs in
    both engines before the rounding (JVM Math.log vs DuckDB libm log,
    each ≤1 ulp but not guaranteed identical) — a divergence landing on
    a micro-scale rounding boundary would flip the BIGINT key by 1; see
    operators/dsir.py's module docstring for the full analysis.  The top-k compiles to TakeOrderedAndProject
    (per-partition local top-k, no global sort) — ONE pass at any
    corpus size, the property A-ES was designed for.

    Rows with ``weight <= 0`` are excluded (zero-weight items have zero
    selection probability).  → (doc_id, key_fix, rank).

    Key resolution: −ln(u) is bounded by ~14.5 (u ≥ 0.5/1e6), so the
    fixed-point scale must dwarf the weight range or keys collapse to
    few distinct values and ties degrade into doc_id order (the review
    found this at the natural 1e6 scale).  1e12 keeps ~1.45e13/w
    distinct levels — ~1.45e8 at a 100 KB doc, still ~14.5k at a 1 GB
    doc — while staying far inside BIGINT.
    """
    u = f"(({_bucket_expr(id_, salt)}) + 0.5) / {_BUCKETS}.0"
    key = f"CAST(round(-ln({u}) * 1e12 / CAST({weight} AS DOUBLE)) AS BIGINT)"
    sel = (
        docs.where(F.col(weight) > 0)
        .select(F.col(id_).alias("doc_id"), F.expr(key).alias("key_fix"))
        .orderBy(F.col("key_fix").asc(), F.col("doc_id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("key_fix").asc(), F.col("doc_id").asc())
    return sel.withColumn("rank", F.row_number().over(w).cast("bigint"))


def d_weighted_sample_aes(k: int, weight: str = "n_chars", salt: str = "aes") -> str:
    """DuckDB twin over the ``documents`` view."""
    u = f"(({d_bucket_expr('doc_id', salt)}) + 0.5) / {_BUCKETS}.0"
    key = f"CAST(round(-ln({u}) * 1e12 / CAST({weight} AS DOUBLE)) AS BIGINT)"
    return f"""
WITH keyed AS (SELECT doc_id, {key} AS key_fix FROM documents WHERE {weight} > 0),
rk AS (SELECT doc_id, key_fix,
              CAST(row_number() OVER (ORDER BY key_fix ASC, doc_id ASC) AS BIGINT) AS rank
       FROM keyed)
SELECT doc_id, key_fix, rank FROM rk WHERE rank <= {k}
"""


def split_by_group(
    docs_with_group: DataFrame,
    val_frac: float = 0.1,
    salt: str = "gsplit",
    id_: str = "doc_id",
    group: str = "component_id",
) -> DataFrame:
    """Leakage-safe train/val split: membership is a pure function of
    the GROUP id (e.g. a near-duplicate component), so every member of
    a duplicate cluster lands in the SAME split — the standard fix for
    train→val contamination through near-copies that a per-doc hash
    split cannot prevent.  Map-only given the group column; re-runs
    never migrate groups.  → (doc_id, <group>, split)."""
    cut = int(round(val_frac * _BUCKETS))
    return docs_with_group.select(
        F.col(id_),
        F.col(group),
        F.when(F.expr(_bucket_expr(group, salt)) < cut, F.lit("val"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# Token-budget mixture allocation (water-filling with an upsampling cap —
# the "epochs per source under a total token budget" computation every
# LLM pre-training mix sheet contains; cf. the repeat-epoch tables in
# Llama/Gopher data cards).  Target shares are integer weights; a source
# may be upsampled at most ``max_epochs``× its size, and budget that a
# capped source cannot absorb redistributes to the others in weight
# proportion (classic water-filling).  With integer weights, token
# counts, budget, and cap, the capped set is decided by CROSS-MULTIPLIED
# INTEGER comparisons (no float in any decision) and the allocations are
# round-half-up integer divisions — bitwise cross-engine.
#
# Sorted by cap/weight ascending, the capped set is a prefix, and row k
# is capped iff  (B - C_{k-1}) * w_k >= cap_k * W_k  where C_{k-1} is
# the prefix cap sum and W_k the suffix weight sum (the greedy
# water-filling test with all earlier rows capped).  Prefix-monotonicity
# lemma (so the per-row test needs no iteration): if row k-1 fails the
# test then so does row k — substituting the row-(k-1) failure into
# row k's left side gives
#   (B - C_{k-1})·w_k < cap_{k-1}/w_{k-1} · w_k·W_k ≤ cap_k·W_k,
# the last step by the sort order cap_{k-1}/w_{k-1} ≤ cap_k/w_k.  The
# float division appears ONLY in the sort key (a single IEEE divide is
# correctly rounded, hence identical in JVM and DuckDB); every
# comparison that decides output values is integer.
#
# Scale: one groupBy(source) corpus pass; the window runs over the
# per-source AGGREGATE (O(#sources) rows), never over documents.

MTB_BUDGET = 100_000   # total training-token budget — chosen so the
                       # fixture corpus exercises BOTH regimes: mixed
                       # water-filling (high-weight sources cap, low-
                       # weight ones absorb the redistribution) at
                       # sf0.001/sf0.01, fully uncapped at sf0.1
MTB_MAX_EPOCHS = 4     # upsampling cap (integer epochs)


def _mtb_weight(source: str = "source") -> str:
    """Integer target weight 1..3 derived from the source id suffix —
    deterministic and engine-portable (both engines 1-based substr)."""
    return f"1 + CAST(substring({source}, 4) AS INT) % 3"


def mixture_token_budget(
    docs: DataFrame,
    budget: int = MTB_BUDGET,
    max_epochs: int = MTB_MAX_EPOCHS,
    text: str = "text",
) -> DataFrame:
    """Per-source token allocation under ``budget`` →
    (source, weight, n_tokens, cap_tokens, capped, alloc_tokens,
    epochs_fp) — all BIGINT; ``epochs_fp/10⁶`` is the repeat factor."""
    from pyspark.sql import Window

    from ..functions import text as T

    per_src = (
        docs.select(
            F.col("source"),
            F.expr(f"CAST(size({T.tokens(text)}) AS BIGINT)").alias("_nt"),
        )
        .groupBy("source")
        .agg(F.sum("_nt").alias("n_tokens"))
        .select(
            "source",
            F.expr(f"CAST({_mtb_weight()} AS BIGINT)").alias("weight"),
            "n_tokens",
            F.expr(f"CAST({max_epochs} * n_tokens AS BIGINT)").alias("cap_tokens"),
        )
    )
    w_ord = Window.orderBy(
        F.expr("CAST(cap_tokens AS DOUBLE) / weight"), F.col("source")
    )
    marked = per_src.select(
        "*",
        F.coalesce(
            F.sum("cap_tokens").over(
                w_ord.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ).alias("_cap_before"),
        F.sum("weight")
        .over(w_ord.rowsBetween(Window.currentRow, Window.unboundedFollowing))
        .alias("_w_suffix"),
    ).select(
        "*",
        F.expr(
            f"CAST(CASE WHEN ({budget} - _cap_before) * weight >= "
            "cap_tokens * _w_suffix THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("capped"),
    )
    totals = marked.groupBy().agg(
        F.sum(F.expr("CASE WHEN capped = 1 THEN cap_tokens ELSE 0 END")).alias(
            "_cap_sum"
        ),
        F.sum(F.expr("CASE WHEN capped = 0 THEN weight ELSE 0 END")).alias(
            "_w_unc"
        ),
    )
    return marked.crossJoin(F.broadcast(totals)).select(
        "source",
        "weight",
        "n_tokens",
        "cap_tokens",
        "capped",
        F.expr(
            f"CAST(CASE WHEN capped = 1 OR _w_unc = 0 THEN cap_tokens "
            f"ELSE (({budget} - _cap_sum) * weight + _w_unc DIV 2) DIV _w_unc "
            "END AS BIGINT)"
        ).alias("alloc_tokens"),
    ).select(
        "*",
        F.expr(
            "CAST((1000000 * alloc_tokens + n_tokens DIV 2) DIV n_tokens "
            "AS BIGINT)"
        ).alias("epochs_fp"),
    )


def d_mixture_token_budget(
    budget: int = MTB_BUDGET,
    max_epochs: int = MTB_MAX_EPOCHS,
) -> str:
    """DuckDB oracle for :func:`mixture_token_budget` (verbatim mirror)."""
    from ..functions import text as T

    toks = T.d_tokens("text")
    return f"""
WITH per_src AS (
  SELECT source,
         CAST(1 + CAST(substr(source, 4) AS INT) % 3 AS BIGINT) AS weight,
         CAST(sum(len({toks})) AS BIGINT) AS n_tokens,
         CAST({max_epochs} * sum(len({toks})) AS BIGINT) AS cap_tokens
  FROM documents GROUP BY source),
marked AS (
  SELECT *,
         CAST(CASE WHEN ({budget} - cap_before) * weight >= cap_tokens * w_suffix
              THEN 1 ELSE 0 END AS BIGINT) AS capped
  FROM (
    SELECT *,
           coalesce(sum(cap_tokens) OVER (
             ORDER BY CAST(cap_tokens AS DOUBLE) / weight, source
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cap_before,
           sum(weight) OVER (
             ORDER BY CAST(cap_tokens AS DOUBLE) / weight, source
             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS w_suffix
    FROM per_src)),
tot AS (
  SELECT CAST(coalesce(sum(CASE WHEN capped = 1 THEN cap_tokens END), 0) AS BIGINT) AS cap_sum,
         CAST(coalesce(sum(CASE WHEN capped = 0 THEN weight END), 0) AS BIGINT) AS w_unc
  FROM marked),
alloc AS (
  SELECT m.source, m.weight, m.n_tokens, m.cap_tokens, m.capped,
         CAST(CASE WHEN m.capped = 1 OR t.w_unc = 0 THEN m.cap_tokens
              ELSE (({budget} - t.cap_sum) * m.weight + t.w_unc // 2) // t.w_unc
              END AS BIGINT) AS alloc_tokens
  FROM marked m CROSS JOIN tot t)
SELECT *,
       CAST((1000000 * alloc_tokens + n_tokens // 2) // n_tokens AS BIGINT) AS epochs_fp
FROM alloc
"""
