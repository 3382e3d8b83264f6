"""DuckDB-oracle SQL fragments textually parallel to ``functions.vector``.

The driver's t2 gate runs our Spark queries AND these oracle strings
side-by-side on the same parquet and hash-compares values.  Float sums here
fold left-to-right in DOUBLE exactly like the Spark fragments, so hashes
match bitwise (SURVEY §4.2.4).

DuckDB 1.0 notes: ``list_zip`` yields *unnamed* structs → index with
``p[1]/p[2]``; ``list_reduce`` has no init accumulator (starts at element 1,
which equals Spark's ``0.0 + v1`` exactly in IEEE arithmetic).
"""

from __future__ import annotations


def l2sq(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), p -> "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))), "
        f"(x, y) -> x + y)"
    )


def dot(a: str, b: str) -> str:
    return (
        f"list_reduce(list_transform(list_zip({a}, {b}), p -> "
        f"CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)"
    )


def vec_sum(a: str) -> str:
    return f"list_reduce(list_transform({a}, v -> CAST(v AS DOUBLE)), (x, y) -> x + y)"


def l2sq_self(a: str) -> str:
    return (
        f"list_reduce(list_transform({a}, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), "
        f"(x, y) -> x + y)"
    )


def norm(a: str) -> str:
    return f"sqrt({l2sq_self(a)})"


def cosine_sim(a: str, b: str) -> str:
    return f"({dot(a, b)}) / (sqrt({l2sq_self(a)}) * sqrt({l2sq_self(b)}))"


def popcount(a: str) -> str:
    return (
        f"CAST(list_reduce(list_transform({a}, x -> "
        f"CASE WHEN x > 0 THEN 1 ELSE 0 END), (x, y) -> x + y) AS BIGINT)"
    )


def hamming(a: str, b: str) -> str:
    return (
        f"CAST(list_reduce(list_transform(list_zip({a}, {b}), p -> "
        f"CASE WHEN (p[1] > 0) != (p[2] > 0) THEN 1 ELSE 0 END), "
        f"(x, y) -> x + y) AS BIGINT)"
    )
