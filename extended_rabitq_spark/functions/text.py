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


def xxh60(expr: str) -> str:
    """PRODUCTION 60-bit hash: Spark's JVM-side ``xxhash64`` (no md5
    string round-trip — measured ~5-10× cheaper per value), top 60 bits
    via unsigned shift so the result is a non-negative BIGINT with the
    same domain as :func:`hash60`.  NOT cross-engine portable (DuckDB
    has no bit-compatible xxhash64) — oracle-twin queries must keep
    ``hash60``; everything statistical (sketch accuracy, merge laws,
    partitioning invariance) is hash-agnostic."""
    return f"CAST(shiftrightunsigned(xxhash64({expr}), 4) AS BIGINT)"


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

# -- MinHash permutation family (shared constants) ---------------------------
#
# One md5 per shingle, N cheap 2-universal permutations on top:
#     perm_i(h) = (A_i·(h & 2^30−1) + B_i·(h >> 30) + C_i) mod M61
# with A,B,C < 2^30 and M61 = 2^61−1.  Every intermediate fits signed-64
# (A·lo ≤ 2^60, sum < 2^62), the operands are plain BIGINT ops both engines
# evaluate identically, and h < 2^60 is non-negative so % agrees too.
# Replaces the per-seed md5('i:'||shingle) scheme: the signature pass
# hashes each shingle ONCE instead of N_MINHASH times — at 100 TB the
# md5 over the exploded shingle table is the dominant signature cost.

MINHASH_P = (1 << 61) - 1  # Mersenne prime M61
_MASK30 = (1 << 30) - 1


def _mh_coeffs(n: int) -> list[tuple[int, int, int]]:
    # Deterministic splitmix-style constants (computed once at import;
    # no runtime randomness — both engines inline the same literals).
    out, s = [], 0x9E3779B97F4A7C15
    def nxt() -> int:
        nonlocal s
        s = (s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return (s >> 22) & _MASK30
    for _ in range(n):
        out.append((nxt() | 1, nxt() | 1, nxt()))
    return out


MINHASH_COEFFS = _mh_coeffs(16)


def minhash_perm(i: int, h: str) -> str:
    """Spark-SQL permutation i applied to a BIGINT hash expression."""
    a, b, c = MINHASH_COEFFS[i]
    return (
        f"(({a} * ({h} & {_MASK30}) + {b} * shiftright({h}, 30) + {c})"
        f" % {MINHASH_P})"
    )


def d_minhash_perm(i: int, h: str) -> str:
    """DuckDB permutation i (same literals, same integer ops)."""
    a, b, c = MINHASH_COEFFS[i]
    return f"(({a} * ({h} & {_MASK30}) + {b} * ({h} >> 30) + {c}) % {MINHASH_P})"

# -- Winnowing fingerprint gram hash (shared constants) ----------------------
#
# Base-131 polynomial over the k-gram's (code point mod 131) values —
# injective for ASCII (code points < 131 pass through unchanged, so the
# residue IS the code point — collision-free where md5 only promises
# 60-bit-unlikely; non-ASCII folds onto the same 131-ary alphabet, a
# plain hash collision, not an error), spread by an affine map mod M61
# so winnowing's min-per-window selection sees well-mixed values.
# Bounds hold for ARBITRARY unicode because of the mod: poly <
# 131^5 < 2^35.2, FP_A < 2^27 → product < 2^62.2; all signed-64.
# (Without the mod, any code point ≥ 232 — 'é', CJK, emoji — overflows
# the FP_A·poly product and BOTH engines raise under ANSI arithmetic.)

FP_A = 134217689  # prime < 2^27
FP_B = 98765


def fp_gram_hash(codes: str, k: int) -> str:
    """Spark-SQL: all k-gram hashes of a BIGINT char-code array.

    Short texts (< k chars) get one whole-text polynomial so every doc
    fingerprints (same contract as the old substring form)."""
    poly = " + ".join(
        f"({codes}[i+{j}] % 131)*{131 ** (k - 1 - j)}" for j in range(k)
    )
    return (
        f"CASE WHEN size({codes}) < {k} THEN "
        f"array(({FP_A} * aggregate({codes}, CAST(0 AS BIGINT), (a, x) -> a * 131 + (x % 131)) + {FP_B}) % {MINHASH_P}) "
        f"ELSE transform(sequence(0, size({codes}) - {k}), "
        f"i -> ({FP_A} * ({poly}) + {FP_B}) % {MINHASH_P}) END"
    )


def d_fp_gram_hash(codes: str, k: int) -> str:
    """DuckDB twin (1-based subscripts; list_reduce seeded via prepend)."""
    poly = " + ".join(
        f"({codes}[i+{j}] % 131)*{131 ** (k - 1 - j)}" for j in range(k)
    )
    return (
        f"CASE WHEN len({codes}) < {k} THEN "
        f"[({FP_A} * list_reduce(list_prepend(CAST(0 AS BIGINT), {codes}), (a, x) -> a * 131 + (x % 131)) + {FP_B}) % {MINHASH_P}] "
        f"ELSE list_transform(range(1, len({codes}) - {k - 2}), "
        f"i -> ({FP_A} * ({poly}) + {FP_B}) % {MINHASH_P}) END"
    )
