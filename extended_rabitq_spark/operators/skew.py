"""Skew-mitigation utilities for 100 TB joins.

First line of defense is AQE skew-join splitting (enabled in the session
factory) — it repairs skewed *sort-merge* joins at runtime.  Manual
salting remains necessary when (a) the skew is in a shuffled-hash or
broadcast-ineligible join AQE won't split, or (b) one key is so hot a
single task still exceeds memory after AQE's split granularity.  The
dedup pipeline's document-frequency cap (operators/dedup.py DF_CAP) is
the third tool: drop keys whose fan-out is quadratic and semantically
worthless (stop-shingles).

``salted_join`` implements the classic replicate-small/salt-big scheme:
the big (skewed) side gets a deterministic per-row salt in [0, n); the
small side is replicated n× with every salt value; the equi-join key
becomes (key, salt).  Row-level results are identical to the plain join
(asserted in tests); the hot key's rows now spread over n tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot side salted.

    ``big`` is the skewed side (salt = pmod(hash(whole row), n) —
    deterministic, so repeated runs produce identical partitioning);
    ``small`` is replicated ``n_salts``× via an exploded literal range.
    Use when the small side is too big to broadcast outright but its
    n_salts-fold replication still shuffles less than the hot key's
    single-task pile-up costs.  Output columns = plain join's columns.

    Only join types where an unmatched replicated small-side row can
    never surface are allowed: with how='right'/'full' each unmatched
    small-side row would be emitted n_salts times with nulls.
    """
    _SAFE_HOW = {"inner", "left", "leftouter", "left_outer",
                 "semi", "leftsemi", "left_semi", "anti", "leftanti", "left_anti"}
    if how.lower() not in _SAFE_HOW:
        raise ValueError(
            f"salted_join: how={how!r} is not multiset-equal to the plain join "
            f"under small-side replication; use one of {sorted(_SAFE_HOW)}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(F.struct(*[F.col(c) for c in big.columns])), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {n_salts - 1})"))
    )
    return salted_big.join(salted_small, on=keys + ["_salt"], how=how).drop("_salt")
