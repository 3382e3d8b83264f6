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
