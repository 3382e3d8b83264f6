"""Fuzzy (approximate-string) join — blocking + exact trigram Jaccard.

The entity-resolution primitive every warehouse eventually needs: match
rows of two tables whose KEYS ALMOST agree (names, addresses, product
titles).  A naive similarity join is |L|·|R| comparisons; the standard
fix — and the 100 TB shape here — is **blocking**: explode each side
into its character trigrams, equi-join on the trigram (candidates share
at least one), and compute the exact Jaccard only on candidate pairs.

Skew guard: ultra-common trigrams (stop-trigrams — think ``"000"`` in
zero-padded ids) pair everything with everything; trigrams whose
right-side document frequency exceeds ``df_cap`` are excluded from
BLOCKING only (the exact Jaccard over full trigram sets still counts
them).  Pairs sharing ONLY stop-trigrams are missed — the standard
blocking recall trade-off, tunable via ``df_cap``; the oracle twin
applies the same cap, so cross-engine results stay bitwise-identical.

Everything is integer arithmetic: the τ cut is the cross-multiplied
comparison ``inter · 1e6 ≥ τ_fix · union`` (the Gopher-gate convention),
and the emitted similarity is the integer pair (inter, union).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..staging import stage_eager as _stage_eager, stage_lazy as _stage_lazy

SCALE = 1_000_000


def _trigrams(col: str) -> str:
    """Distinct char trigrams of a (short) normalized string column.

    ``substring`` per sequence element is O(len) each → O(len²) per row;
    fine for join KEYS (names/titles, tens of chars).  For long-text
    columns use the char-array/element_at form (the lm_quality lesson,
    NOTES milestone 14)."""
    s = f"trim(lower({col}))"
    return (
        f"CASE WHEN length({s}) < 3 THEN array({s}) "
        f"ELSE array_distinct(transform(sequence(1, length({s}) - 2), "
        f"i -> substring({s}, i, 3))) END"
    )


def d_trigrams(col: str) -> str:
    s = f"trim(lower({col}))"
    return (
        f"CASE WHEN length({s}) < 3 THEN [{s}] "
        f"ELSE list_distinct(list_transform(range(1, length({s}) - 1), "
        f"i -> substring({s}, i, 3))) END"
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    tau: float = 0.5,
    left_id: str = "l_id",
    right_id: str = "r_id",
    df_cap: int = 1000,
) -> DataFrame:
    """→ (l_id, r_id, inter, union_, sim_fix): candidate pairs via
    trigram blocking, exact Jaccard ≥ τ on full trigram sets,
    ``sim_fix = (1e6·inter) div union`` BIGINT.

    Blank/whitespace-only keys are dropped on both sides — an empty
    normalized key would otherwise trigram to ``['']`` and "perfectly
    match" every other blank key (review r6)."""
    # Pinned (lazy localCheckpoint): the trigram projections are
    # map-only (no exchange, so runtime stage reuse can never fold
    # them) and each feeds multiple plan branches — rt: blocking df,
    # blocking explode, final verify join (3×); lt: blocking explode,
    # final verify join (2×).  The O(len²)-per-row trigram expression
    # re-ran per branch; staging (id, trigrams) computes it once — the
    # featurized-keys table any blocking join materializes at scale.
    lt = left.where(F.expr(f"length(trim(lower({left_key}))) > 0")).select(
        F.col(left_id), F.expr(_trigrams(left_key)).alias("lt")
    ).transform(_stage_lazy)
    rt = right.where(F.expr(f"length(trim(lower({right_key}))) > 0")).select(
        F.col(right_id), F.expr(_trigrams(right_key)).alias("rt")
    ).transform(_stage_lazy)
    # Blocking trigram df on the right side; stop-trigrams excluded.
    rdf = (
        rt.select(right_id, F.explode("rt").alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= df_cap)
        .select("g")
    )
    lx = lt.select(left_id, F.explode("lt").alias("g")).join(F.broadcast(rdf), "g")
    rx = rt.select(right_id, F.explode("rt").alias("g")).join(F.broadcast(rdf), "g")
    cand = lx.join(rx, "g").select(left_id, right_id).distinct()
    tau_fix = round(tau * SCALE)
    return (
        cand.join(lt, left_id)
        .join(rt, right_id)
        .select(
            left_id,
            right_id,
            F.expr("size(array_intersect(lt, rt))").cast("long").alias("inter"),
            F.expr("size(lt) + size(rt) - size(array_intersect(lt, rt))")
            .cast("long")
            .alias("union_"),
        )
        .where(F.col("inter") * SCALE >= tau_fix * F.col("union_"))
        .select(
            left_id,
            right_id,
            "inter",
            "union_",
            F.expr(f"CAST(({SCALE} * inter) div union_ AS BIGINT)").alias("sim_fix"),
        )
    )


def d_fuzzy_join(
    left_sql: str,
    right_sql: str,
    left_key: str,
    right_key: str,
    tau: float,
    left_id: str,
    right_id: str,
    df_cap: int = 1000,
) -> str:
    """DuckDB twin; ``left_sql``/``right_sql`` are CTE bodies yielding
    (id, key) relations."""
    tau_fix = round(tau * SCALE)
    return f"""
WITH l0 AS ({left_sql}), r0 AS ({right_sql}),
lt AS (SELECT {left_id}, {d_trigrams(left_key)} AS lt FROM l0
       WHERE length(trim(lower({left_key}))) > 0),
rt AS (SELECT {right_id}, {d_trigrams(right_key)} AS rt FROM r0
       WHERE length(trim(lower({right_key}))) > 0),
rdf AS (SELECT g FROM (
    SELECT unnest(rt) AS g, {right_id} FROM rt) GROUP BY g
    HAVING count(*) <= {df_cap}),
lx AS (SELECT {left_id}, unnest(lt) AS g FROM lt),
rx AS (SELECT {right_id}, unnest(rt) AS g FROM rt),
cand AS (SELECT DISTINCT lx.{left_id}, rx.{right_id}
         FROM lx JOIN rdf ON lx.g = rdf.g
                 JOIN rx ON lx.g = rx.g),
sc AS (SELECT c.{left_id}, c.{right_id},
              CAST(len(list_intersect(lt.lt, rt.rt)) AS BIGINT) AS inter,
              CAST(len(lt.lt) + len(rt.rt) - len(list_intersect(lt.lt, rt.rt)) AS BIGINT) AS union_
       FROM cand c JOIN lt ON c.{left_id} = lt.{left_id}
                   JOIN rt ON c.{right_id} = rt.{right_id})
SELECT {left_id}, {right_id}, inter, union_,
       CAST(({SCALE} * inter) // union_ AS BIGINT) AS sim_fix
FROM sc WHERE inter * {SCALE} >= {tau_fix} * union_
"""
