"""As-of (point-in-time) join — beyond-reference north-star operator.

The feature-lookup primitive of a training pipeline: for every left row,
attach the LATEST right-side state row with ``right.ts <= left.ts`` per
key (no leakage from the future).  Spark has no native ASOF join; the
naive formulations are a range theta-join (O(N·M) per key) or a
per-key collect — both non-starters at scale.

The scalable form used here is union-tag-window: union both sides with
a tag, ONE shuffle by key, then ``last(state, ignorenulls=True)`` over
an unbounded-preceding row window ordered by (ts, tag) carries the most
recent state forward onto each left row.  Right rows sort before left
rows at equal ts, so a state row exactly AT the left timestamp is
visible — the same inclusive semantics as DuckDB/QuestDB/kdb ASOF
(the oracle uses DuckDB's native ``ASOF LEFT JOIN``).

Cost: one hash shuffle of |L|+|R| rows by key + a linear window pass —
the minimum any per-key temporal alignment can do; no range explosion,
no skew beyond what the key distribution already has.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str = "ts",
    state_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Left rows + latest right state at-or-before each left ``ts``.

    ``right`` must have columns ``[by, ts, *state_cols]``; output is all
    ``left`` columns plus ``{prefix}{col}`` for each state col and
    ``{prefix}ts`` (all NULL when no state row precedes).  Ordering ties
    at identical (key, ts, side) are broken by the state row's own
    ordering only if the caller makes ts unique per key — standard ASOF
    contract (DuckDB's is nondeterministic there too).
    """
    if state_cols is None:
        state_cols = [c for c in right.columns if c not in (by, ts)]
    lcols = left.columns
    l_tag = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_sts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_s_{c}") for c in state_cols],
    )
    r_tag = right.select(
        *[
            F.col(by) if c == by
            else F.col(ts).alias(ts) if c == ts
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        # unix_micros, not cast('double'): the double path goes through
        # fractional epoch-seconds, which cannot represent every
        # microsecond — the round trip truncates 1 us on a fraction of
        # values (same failure class as the ns->us div fix in
        # tables.load_events).  Integer micros are exact everywhere.
        F.unix_micros(F.col(ts)).alias("_sts"),
        *[F.col(c).alias(f"_s_{c}") for c in state_cols],
    )
    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        *lcols,
        "_side",
        F.last("_sts", ignorenulls=True).over(w).alias("_c_ts"),
        *[
            F.last(f"_s_{c}", ignorenulls=True).over(w).alias(f"{prefix}{c}")
            for c in state_cols
        ],
    )
    return carried.where(F.col("_side") == 1).select(
        *lcols,
        F.timestamp_micros(F.col("_c_ts")).alias(f"{prefix}{ts}"),
        *[f"{prefix}{c}" for c in state_cols],
    )
