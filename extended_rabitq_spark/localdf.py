"""LocalRelation-backed DataFrames for tiny driver-built tables (r11).

``spark.createDataFrame(sc.parallelize(rows, 1), ...)`` produces a
LogicalRDD: every downstream ``collect()``/broadcast launches a Spark
job that round-trips one Python RDD worker (~0.2s each on local[*], and
a real scheduling round on a cluster).  The K-row centroid side tables
are collected/broadcast MANY times per search plan, so that overhead
multiplies (measured: 0.94s vs 0.03s for 5 collects of a 16×64 centroid
table).

With Arrow enabled (session.get_spark sets it), ``createDataFrame`` on
a pandas frame below ``spark.sql.execution.arrow.localRelationThreshold``
(default 48 MB) plans as a **LocalRelation**: collects are served
driver-side with NO job, broadcasts build straight from the in-plan
rows.  Values cross as binary float64 through Arrow — bitwise-exact,
no text round-trip — and the result schema is byte-identical to the
parallelize route's (both asserted in tests/test_localdf.py).  Above
the threshold, or without Arrow, Spark itself falls back to the
classic distributed route — same semantics either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def local_rows_df(spark: SparkSession, rows: list, schema: str) -> DataFrame:
    """Driver-local rows → DataFrame, LocalRelation-backed when small.

    ``schema`` is the usual DDL string (``"cluster_id int, centroid
    array<double>"``) — exactly what the parallelize route took.

    Caveat (pandas NaN-as-missing): a float NaN arrives as NULL, where
    the parallelize route kept NaN.  No caller ships NaN (centroid
    tables are means/rotations of finite data); pinned in tests so a
    future NaN-bearing caller fails loudly there, not silently here.
    """
    if not rows:
        return spark.createDataFrame([], schema)
    import pandas as pd

    names = [c.strip().split(None, 1)[0] for c in _split_cols(schema)]
    pdf = pd.DataFrame(
        {name: [row[i] for row in rows] for i, name in enumerate(names)}
    )
    return spark.createDataFrame(pdf, schema)


def _split_cols(schema: str) -> list[str]:
    """Split a DDL column list on top-level commas (array<...> safe)."""
    out, depth, cur = [], 0, []
    for ch in schema:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
