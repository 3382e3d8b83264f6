"""Z-order (Morton) interleave keys for multi-column data clustering.

The lakehouse layout primitive (Delta/Iceberg ``OPTIMIZE ZORDER BY``):
sort-cluster files by the bit-interleave of several columns so a filter
on ANY of them prunes file-level min/max zone maps.  At 100 TB this is
how you make ``WHERE user_id = ?`` AND ``WHERE ts BETWEEN ?`` both scan
~√(files) instead of everything, from ONE physical layout.

Pure integer bit arithmetic — ``(col >> i) & 1 << (i·n + j)`` folded
over a frozen bit range — identical in Spark and DuckDB, so the keys
are bitwise cross-engine (no float, no hash library).

- :func:`zorder_key_expr` emits the key as a single codegen expression.
- :func:`zorder_layout` applies it and range-partitions + sorts — the
  actual write layout (``df.write.parquet`` after this gives min/max
  zone-map-friendly files).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _check(cols: list[str], bits: int) -> None:
    if not cols:
        raise ValueError("zorder needs at least one column")
    if bits * len(cols) > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a signed BIGINT")


def zorder_key_expr(cols: list[str], bits: int = 21, check: bool = True) -> str:
    """Spark SQL text: Morton interleave of the low ``bits`` bits of each
    (non-negative integral) column.  Column j contributes its bit i at
    output position ``i·n + j``.

    ``check=True`` (default) raises at runtime on any value outside
    ``[0, 2^bits)`` instead of silently wrapping — a wrapped column
    (e.g. epoch-minutes ≈ 28.5M >> 2²¹) would alias values 2^bits apart
    into the same key and quietly defeat the zone-map pruning the layout
    exists for.  Normalize first (rank, or subtract the corpus min, as
    ``events_zorder_layout`` does) rather than disabling the check."""
    _check(cols, bits)
    n = len(cols)
    lim = 1 << bits
    refs = []
    for c in cols:
        v = f"CAST({c} AS BIGINT)"
        if check:
            refs.append(
                f"(CASE WHEN {v} >= 0 AND {v} < {lim} THEN {v} ELSE "
                f"CAST(raise_error(concat('zorder: value of {c} outside [0, {lim}): ', "
                f"CAST({c} AS STRING))) AS BIGINT) END)"
            )
        else:
            refs.append(v)
    terms = " + ".join(
        f"shiftleft(shiftright({v}, i) & 1, i * {n} + {j})" for j, v in enumerate(refs)
    )
    return f"aggregate(sequence(0, {bits - 1}, 1), CAST(0 AS BIGINT), (acc, i) -> acc + {terms})"


def d_zorder_key_expr(cols: list[str], bits: int = 21, check: bool = True) -> str:
    """DuckDB twin (list_reduce over the same frozen bit range; the
    range guard uses ``error()``)."""
    _check(cols, bits)
    n = len(cols)
    lim = 1 << bits
    refs = []
    for c in cols:
        v = f"CAST({c} AS BIGINT)"
        if check:
            refs.append(
                f"(CASE WHEN {v} >= 0 AND {v} < {lim} THEN {v} ELSE "
                f"CAST(error('zorder: value of {c} outside [0, {lim})') AS BIGINT) END)"
            )
        else:
            refs.append(v)
    terms = " + ".join(
        f"((({v} >> i) & 1) << (i * {n} + {j}))" for j, v in enumerate(refs)
    )
    return (
        f"list_reduce(list_transform(range(0, {bits}), i -> {terms}), "
        f"(x, y) -> x + y)"
    )


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 21, key: str = "zkey"
) -> DataFrame:
    """Attach the Morton key and range-cluster rows by it — the layout
    you ``.write.parquet(...)`` for zone-map pruning on every interleaved
    column.  Uses ``repartitionByRange`` (sampled range exchange) +
    ``sortWithinPartitions`` so no single-task global sort happens."""
    out = df.withColumn(key, F.expr(zorder_key_expr(cols, bits)))
    return out.repartitionByRange(key).sortWithinPartitions(key)
