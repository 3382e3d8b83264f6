"""Named SQL functions for the vector kernels (SURVEY §2.10).

The reference hardcodes its distance kernels behind function pointers
(inc/index/Initializer.hpp:40-44, inc/index/Searcher.hpp:62-74) with no
user extensibility; the Spark-native surface exposes them as NAMED SQL
functions so a ``spark.sql`` user writes

    SELECT id FROM corpus ORDER BY l2sq(vec, :q) LIMIT 10

without importing anything.  Implementation is Spark 4 **declarative
SQL UDFs** (``CREATE FUNCTION ... RETURNS ... RETURN <expr>``): Catalyst
inlines the body at plan time, so the registered functions compile into
the SAME whole-stage-codegen expressions as the DataFrame path — no UDF
call node, no Python, filters containing them still push down.  The
bodies are generated from :mod:`..functions.vector`'s expression text,
so results are bitwise identical to the DataFrame API (same
left-to-right fold; asserted in tests).

Registration is per-session (temporary functions): call
:func:`register_sql_functions` once after ``getOrCreate``.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from . import vector as V

_VF = "ARRAY<FLOAT>"

# name -> (arg signature, return type, body builder over arg names)
_FUNCTIONS: dict[str, tuple[str, str, str]] = {
    "l2sq": (f"a {_VF}, b {_VF}", "DOUBLE", V.l2sq("a", "b")),
    "dot_ip": (f"a {_VF}, b {_VF}", "DOUBLE", V.dot("a", "b")),
    "ip_dist": (f"a {_VF}, b {_VF}", "DOUBLE", f"-({V.dot('a', 'b')})"),
    "cosine_sim": (f"a {_VF}, b {_VF}", "DOUBLE", V.cosine_sim("a", "b")),
    "cosine_dist": (
        f"a {_VF}, b {_VF}",
        "DOUBLE",
        f"1.0 - ({V.cosine_sim('a', 'b')})",
    ),
    "vec_norm": (f"a {_VF}", "DOUBLE", V.norm("a")),
    "vec_sum": (f"a {_VF}", "DOUBLE", V.vec_sum("a")),
    "l2_normalize": (f"a {_VF}", "ARRAY<DOUBLE>", V.l2_normalize("a")),
    "sign_bits": (f"a {_VF}", "ARRAY<INT>", V.sign_bits("a")),
    "popcount_bits": (f"a {_VF}", "BIGINT", V.popcount("a")),
}


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every vector kernel as a temporary SQL function on this
    session; returns the registered names."""
    for name, (args, ret, body) in _FUNCTIONS.items():
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {ret} RETURN {body}"
        )
    return list(_FUNCTIONS)
