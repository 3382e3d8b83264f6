"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The standard pretraining-data selection recipe: score every raw document
by how much more likely its hashed n-gram features are under a TARGET
corpus distribution than under the RAW pool distribution, add Gumbel
noise, and keep the top-N (Gumbel-top-k ≡ sampling without replacement
proportional to the importance weights).

Spark-first, cross-engine-exact shape:

- Features: word unigrams hashed into ``n_buckets`` via the portable
  ``hash60`` (md5-based — identical in Spark and DuckDB).  ONE tokenize
  + explode pass produces per-doc bucket counts.
- Distributions: bucket totals for the target subset and the raw pool
  are two tiny B-row aggregates (map-side partial agg → B rows), then
  the per-bucket log-likelihood-ratio table is broadcast back.
- **Fixed-point integers end-to-end**: the per-bucket log ratio
  ``ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))`` (Laplace-smoothed) is
  scaled to micro-nats and rounded to BIGINT once; a document's weight
  is then an INTEGER sum of ``count_b · lr_b`` — exact under any
  aggregation order, so the DuckDB oracle matches bitwise (a DOUBLE
  sum here would be shuffle-order-dependent).
- Gumbel key: ``u = (hash60(doc_id) mod 1e6 + 0.5)/1e6``,
  ``g = −ln(−ln(u))`` — deterministic per doc, also micro-nat fixed
  point.  Selection key = weight + gumbel (both BIGINT).

RESIDUAL LIBM RISK (unlike the repo's libm-free hashable rows —
token_pmi/BM25 use ratio forms, nDCG uses the pre-computed
``dcg_discounts`` table): the LLR table and the Gumbel key evaluate
``ln()`` in BOTH engines before the micro-nat rounding.  JVM
``Math.log`` and DuckDB's libm ``log`` are each ≤1 ulp but not
guaranteed identical; a divergence landing exactly on a ×1e6 rounding
boundary would flip a BIGINT by 1 and break cross-engine parity.  Not
eliminable here without collecting data-dependent aggregates to the
driver (the LLR inputs are corpus counts, so a pre-computed literal
table can't be embedded in a scale-independent oracle string).
Empirically bitwise at sf0.001/0.01/0.1 on the gate host; the same
exposure applies to ``sampling.weighted_sample_aes`` (−ln(u)/w keys).

At 100 TB: one tokenize pass over the pool (map-only), two B-row
aggregates, one broadcast join, one top-N — no shuffle carries more
than B rows per partial aggregate, and N is user-bounded.  The target
corpus is typically tiny (quality sample), so its pass is cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ..staging import stage_eager as _stage_eager, stage_lazy as _stage_lazy

from ..functions import text as T

SCALE = 1_000_000  # micro-nat fixed point


def _bucket_counts(docs: DataFrame, n_buckets: int, id_: str, text: str) -> DataFrame:
    """(doc_id, bucket, cnt) — hashed-unigram bucket counts per doc."""
    toks = docs.select(
        F.col(id_).alias("doc_id"),
        F.explode(F.expr(T.tokens(text))).alias("tok"),
    )
    return (
        toks.where(F.col("tok") != "")
        .select("doc_id", F.expr(f"pmod({T.hash60('tok')}, {n_buckets})").alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def dsir_select(
    docs: DataFrame,
    target_pred: str,
    n_select: int,
    n_buckets: int = 1024,
    id_: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Gumbel-top-``n_select`` importance resampling → (doc_id, score,
    rank).  ``target_pred`` is a SQL predicate over ``docs`` defining the
    target subset (e.g. ``"lang = 'en' AND source = 'src1'"``); the raw
    pool is all of ``docs``.  ``score`` is the BIGINT micro-nat selection
    key (importance weight + Gumbel); ties break by doc_id.
    """
    # Pinned (lazy localCheckpoint): the bucket-count table feeds THREE
    # plan branches (target totals, raw totals, per-doc weights) — each
    # re-ran the tokenize+hash+groupBy pass.  Lazy, so the
    # materialization rides the first consuming job.  At 100 TB bc is
    # ≤ min(#tokens, #docs·n_buckets) rows of three integers — the
    # featurized table any DSIR run stages before scoring.
    bc = _bucket_counts(docs, n_buckets, id_, text).transform(_stage_lazy)
    tgt_ids = docs.where(F.expr(target_pred)).select(F.col(id_).alias("doc_id"))
    tgt = (
        bc.join(F.broadcast(tgt_ids), "doc_id")
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("t_cnt"))
    )
    raw = bc.groupBy("bucket").agg(F.sum("cnt").alias("r_cnt"))
    # Totals ride along as one-row cross joins (scalar aggregates).
    t_tot = tgt.agg(F.sum("t_cnt").alias("t_tot"))
    r_tot = raw.agg(F.sum("r_cnt").alias("r_tot"))
    lr = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            F.expr(
                f"CAST(round((ln((coalesce(t_cnt, 0) + 1.0) / (t_tot + {n_buckets}.0)) - "
                f"ln((r_cnt + 1.0) / (r_tot + {n_buckets}.0))) * {SCALE}.0) AS BIGINT)"
            ).alias("lr"),
        )
    )
    weights = (
        bc.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(F.sum(F.col("cnt") * F.col("lr")).alias("w"))
    )
    gumbel = (
        f"CAST(round(-ln(-ln((pmod({T.hash60('CAST(doc_id AS STRING)')}, {SCALE}) + 0.5) "
        f"/ {SCALE}.0)) * {SCALE}.0) AS BIGINT)"
    )
    # orderBy+limit compiles to TakeOrderedAndProject — each partition
    # offers only its local top-N, so no global single-partition sort.
    # The rank window then runs over just the n_select selected rows.
    sel = (
        weights.select("doc_id", (F.col("w") + F.expr(gumbel)).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(n_select)
    )
    wsel = Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return sel.withColumn("rank", F.row_number().over(wsel).cast("bigint")).select(
        "doc_id", "score", "rank"
    )


def d_dsir_select(
    target_pred: str, n_select: int, n_buckets: int = 1024
) -> str:
    """DuckDB oracle twin of :func:`dsir_select` over the ``documents``
    view (same fixed-point micro-nat arithmetic)."""
    h = T.d_hash60("tok")
    hg = T.d_hash60("CAST(doc_id AS VARCHAR)")
    return f"""
WITH tok AS (SELECT doc_id, unnest({T.d_tokens('text')}) AS tok FROM documents),
bc AS (SELECT doc_id, ((({h}) % {n_buckets}) + {n_buckets}) % {n_buckets} AS bucket,
              count(*) AS cnt
       FROM tok WHERE tok <> '' GROUP BY doc_id, bucket),
tgt AS (SELECT b.bucket, sum(b.cnt) AS t_cnt FROM bc b
        JOIN documents d ON b.doc_id = d.doc_id WHERE {target_pred}
        GROUP BY b.bucket),
raw AS (SELECT bucket, sum(cnt) AS r_cnt FROM bc GROUP BY bucket),
tt AS (SELECT sum(t_cnt) AS t_tot FROM tgt),
rt AS (SELECT sum(r_cnt) AS r_tot FROM raw),
lr AS (SELECT raw.bucket,
              CAST(round((ln((coalesce(tgt.t_cnt, 0) + 1.0) / (tt.t_tot + {n_buckets}.0)) -
                          ln((raw.r_cnt + 1.0) / (rt.r_tot + {n_buckets}.0))) * {SCALE}.0) AS BIGINT) AS lr
       FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket, tt, rt),
w AS (SELECT bc.doc_id, sum(bc.cnt * lr.lr) AS w FROM bc JOIN lr ON bc.bucket = lr.bucket
      GROUP BY bc.doc_id),
sc AS (SELECT doc_id,
              CAST(w + CAST(round(-ln(-ln(((({hg}) % {SCALE} + {SCALE}) % {SCALE} + 0.5)
                  / {SCALE}.0)) * {SCALE}.0) AS BIGINT) AS BIGINT) AS score
       FROM w),
rk AS (SELECT doc_id, score,
              CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
       FROM sc)
SELECT doc_id, score, rank FROM rk WHERE rank <= {n_select}
"""
