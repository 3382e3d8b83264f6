"""Text scalar-function fragments, paired Spark-SQL / DuckDB-SQL.

Beyond-reference operators (SURVEY §2.8 north star): normalization,
tokenization, shingling, and a portable 60-bit string hash built from
``md5`` (identical hex output in both engines → identical BIGINT keys, so
MinHash/SimHash signatures hash-match across engines).

Both sides are kept textually parallel; the only systematic differences:
- Spark ``regexp_replace`` is global, DuckDB needs the ``'g'`` flag;
- Spark ``slice(arr, start, LENGTH)`` vs DuckDB ``list_slice(l, begin,
  END-inclusive)``;
- Spark arrays index 0-based with ``arr[i]``, DuckDB 1-based.
"""

from __future__ import annotations

# -- Spark side -------------------------------------------------------------


def norm_text(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '\\\\s+', ' '))"


def tokens(col: str) -> str:
    return f"split({norm_text(col)}, ' ')"


def hash60(expr: str) -> str:
    """Portable 60-bit hash: first 15 hex chars of md5 → BIGINT."""
    return f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def shingles3(toks: str) -> str:
    """Distinct word 3-shingles (0-based Spark subscripts)."""
    return (
        f"CASE WHEN size({toks}) < 3 THEN array({toks}[0]) "
        f"ELSE array_distinct(transform(sequence(0, size({toks}) - 3), "
        f"i -> concat_ws(' ', {toks}[i], {toks}[i+1], {toks}[i+2]))) END"
    )


# -- DuckDB side ------------------------------------------------------------


def d_norm_text(col: str) -> str:
    return f"trim(regexp_replace(lower({col}), '\\s+', ' ', 'g'))"


def d_tokens(col: str) -> str:
    return f"string_split({d_norm_text(col)}, ' ')"


def d_hash60(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def d_shingles3(toks: str) -> str:
    """Distinct word 3-shingles (1-based DuckDB subscripts)."""
    return (
        f"CASE WHEN len({toks}) < 3 THEN [{toks}[1]] "
        f"ELSE list_distinct(list_transform(range(1, len({toks}) - 1), "
        f"i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2])) END"
    )
