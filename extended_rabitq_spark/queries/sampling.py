"""Registered sampling/selection queries + DuckDB oracles (north-star
surface: the deterministic selection stages of a training-data pipeline).

Everything here is a pure function of the md5-based portable hash60, so
the oracle reproduces each assignment bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup as dedup_ops
from ..functions import text as T
from ..operators import dsir as dsir_ops
from ..operators import sampling
from ..registry import register
from ..tables import read_parquet
from .dedup import _SHINGLE_CTES

VAL_FRAC = 0.1
QUOTA = 30
STRATA = {"en": 0.5, "de": 0.25}
DEFAULT_FRAC = 0.1
N_BENCH = 20  # fixture benchmark set: doc_id < 20

_SPLIT_ORACLE = f"""
SELECT doc_id,
       CASE WHEN {sampling.d_bucket_expr('doc_id', 'split')}
                 < {int(round(VAL_FRAC * sampling._BUCKETS))}
            THEN 'val' ELSE 'train' END AS split
FROM documents
"""


@register("split_train_val", _SPLIT_ORACLE)
def split_train_val_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash train/val split — membership is a pure function
    of (doc_id, salt): incremental re-runs never migrate documents."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return sampling.train_val_split(docs, val_frac=VAL_FRAC)


_STRAT_ORACLE = f"""
SELECT doc_id, lang
FROM documents
WHERE {sampling.d_bucket_expr('doc_id', 'sample')} <
      CASE lang
           WHEN 'de' THEN {int(round(STRATA['de'] * sampling._BUCKETS))}
           WHEN 'en' THEN {int(round(STRATA['en'] * sampling._BUCKETS))}
           ELSE {int(round(DEFAULT_FRAC * sampling._BUCKETS))} END
"""


@register("stratified_sample", _STRAT_ORACLE)
def stratified_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language deterministic downsample (rebalance dominant strata)
    — map-only CASE over the hash bucket."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return sampling.stratified_sample(
        docs, STRATA, stratum="lang", default_frac=DEFAULT_FRAC
    ).select("doc_id", "lang")


_QUOTA_ORACLE = f"""
SELECT doc_id, lang, pick_rank FROM (
    SELECT doc_id, lang,
           CAST(row_number() OVER (
                PARTITION BY lang
                ORDER BY {sampling.d_bucket_expr('doc_id', 'quota')}, doc_id
           ) AS BIGINT) AS pick_rank
    FROM documents
) WHERE pick_rank <= {QUOTA}
"""


@register("quota_sample", _QUOTA_ORACLE)
def quota_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota cap: at most QUOTA docs per lang by
    deterministic hash order (partial top-k window at scale)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return sampling.quota_sample(docs, quota=QUOTA, group="lang").select(
        "doc_id", "lang", "pick_rank"
    )


_CONTAM_ORACLE = f"""
WITH {_SHINGLE_CTES},
bsh AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < {N_BENCH}),
tgt AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= {N_BENCH}),
tot AS (SELECT doc_id, count(*) AS n_shingles FROM tgt GROUP BY doc_id),
hit AS (SELECT doc_id, count(*) AS n_contaminated
        FROM tgt JOIN bsh USING (shingle) GROUP BY doc_id)
SELECT t.doc_id, t.n_shingles,
       CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
       round(CAST(coalesce(h.n_contaminated, 0) AS DOUBLE) / t.n_shingles, 6)
         AS contamination_r
FROM tot t LEFT JOIN hit h USING (doc_id)
"""


@register("contamination_check", _CONTAM_ORACLE)
def contamination_check_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark n-gram decontamination scan: per-doc fraction of
    shingles shared with the (fixture) benchmark set doc_id < N_BENCH."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    bench_ids = docs.select("doc_id").where(F.col("doc_id") < N_BENCH)
    return dedup_ops.contamination_check(docs, bench_ids)


PACK_BUDGET = 512
PACK_SHARDS = 8

_D_TOKS = T.d_tokens("text")

_PACK_ORACLE = f"""
WITH t AS (
    SELECT doc_id,
           CAST(doc_id AS BIGINT) % {PACK_SHARDS} AS shard,
           CAST(len({_D_TOKS}) AS BIGINT) AS n_tokens,
           {sampling.d_bucket_expr('doc_id', 'pack')} AS o
    FROM documents
),
c AS (
    SELECT *, sum(n_tokens) OVER (PARTITION BY shard ORDER BY o, doc_id
                                  ROWS UNBOUNDED PRECEDING) AS cum
    FROM t
)
SELECT doc_id, shard,
       CAST((cum - n_tokens) // {PACK_BUDGET} AS BIGINT) AS bin_id,
       CAST((cum - n_tokens) % {PACK_BUDGET} AS BIGINT) AS offset_tokens,
       n_tokens
FROM c
"""


@register("pack_sequences", _PACK_ORACLE)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing into 512-token training bins,
    hash-sharded 8 ways (per-shard running-sum windows — parallel)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return sampling.pack_sequences(
        docs, budget_tokens=PACK_BUDGET, n_shards=PACK_SHARDS
    )


MIX_BUDGET = 4_000  # chars per source — bites at every fixture SF
# (per-source totals: ~7.5k chars at sf0.01, ~74k at sf0.1, scaling
# linearly — a fixed cap is exactly the rebalancing semantics: every
# source contributes the same volume no matter how large it grows)


_MIX_ORACLE = f"""
SELECT doc_id, source, n_chars, cum_chars FROM (
    SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(sum(n_chars) OVER (
                PARTITION BY source
                ORDER BY {sampling.d_bucket_expr('doc_id', 'mix')}, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_chars
    FROM documents
) WHERE cum_chars <= {MIX_BUDGET}
"""


@register("corpus_mixture_sample", _MIX_ORACLE)
def corpus_mixture_sample_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source char-budget mixture rebalancing (deterministic
    hash-order greedy fill; integer-exact cumulative sums)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return sampling.mixture_sample(docs, MIX_BUDGET)


@register(
    "dsir_select",
    dsir_ops.d_dsir_select(
        target_pred="d.lang = 'en' AND d.source IN ('src1', 'src2')", n_select=100
    ),
)
def dsir_select_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling (Xie et al. 2023): hashed-unigram
    bucket features, Laplace-smoothed log-likelihood ratio of a target
    subset (here: en docs from src1/src2) vs the raw pool, Gumbel-top-N
    selection.  Micro-nat FIXED-POINT integers end-to-end — document
    weights are BIGINT sums, exact under any aggregation order."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return dsir_ops.dsir_select(
        docs, target_pred="lang = 'en' AND source IN ('src1', 'src2')", n_select=100
    )


@register("weighted_sample_aes", sampling.d_weighted_sample_aes(k=50))
def weighted_sample_aes_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis-Spirakis A-ES weighted sampling without replacement:
    50 docs with probability proportional to n_chars, one pass, keys in
    micro fixed point, top-k via TakeOrderedAndProject (no global
    sort).  The length-proportional sample every mixture/curriculum
    pipeline draws."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return sampling.weighted_sample_aes(docs, k=50)


def _split_by_component_oracle() -> str:
    from .dedup import _COMPONENTS_ORACLE

    cut = int(round(0.2 * sampling._BUCKETS))
    comp_body = _COMPONENTS_ORACLE.strip()
    assert comp_body.startswith("WITH RECURSIVE")
    inner = comp_body[len("WITH RECURSIVE"):].strip()
    # re-wrap the components query as a CTE chain + the split projection
    head, select = inner.rsplit("SELECT id AS doc_id", 1)
    return f"""
WITH RECURSIVE {head.rstrip()},
comp AS (SELECT id AS doc_id{select.rstrip()}),
out AS (SELECT doc_id, component_id,
               CASE WHEN {sampling.d_bucket_expr('component_id', 'gsplit')} < {cut}
                    THEN 'val' ELSE 'train' END AS split
        FROM comp)
SELECT doc_id, component_id, split FROM out
"""


@register("split_by_component", _split_by_component_oracle())
def split_by_component_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val split: hash-split on the NEAR-DUP
    COMPONENT id (MinHash-LSH pair graph -> connected components), so
    every member of a duplicate cluster lands in the same split — the
    contamination a per-doc hash split cannot prevent.  Composition:
    dedup_components (checked) -> map-only group split."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    comp = dedup_ops.connected_components(
        dedup_ops.minhash_lsh_pairs(docs), docs.select("doc_id")
    )
    return sampling.split_by_group(comp, val_frac=0.2, salt="gsplit")


@register("mixture_token_budget", sampling.d_mixture_token_budget())
def mixture_token_budget_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixture allocation (NEW r10, beyond-reference §2.8):
    water-filling of a fixed training-token budget across sources under
    an upsampling cap (max 4 epochs per source) — the repeat-epoch
    computation of an LLM pre-training mix sheet.  The capped set is
    decided by cross-multiplied INTEGER comparisons and the allocations
    are round-half-up integer divisions (float appears only in the sort
    key, a single correctly-rounded IEEE divide) — bitwise cross-engine.
    The window runs over the per-source AGGREGATE (O(#sources) rows),
    so the op is one corpus groupBy pass at any scale."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return sampling.mixture_token_budget(docs)
