"""Replicates the driver's t2 gate: run every registered Spark query and its
DuckDB oracle on sf0.01, compare row count, column names, and
order-insensitive values (sorted by column name, rows sorted)."""

from __future__ import annotations

import math

import pytest

from conftest import SF_T2


def _canon(val):
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        return f"{val:.17g}"
    if isinstance(val, list):
        return "[" + ",".join(_canon(v) for v in val) + "]"
    return str(val)


def _canon_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(c for c in cols), out


def _pairs():
    import __spark_entry__ as e

    q = e.queries()
    o = e.oracle_sql()
    return [(name, q[name], o.get(name)) for name in sorted(q)]


@pytest.mark.parametrize("name,fn,sql", _pairs(), ids=[p[0] for p in _pairs()])
def test_query_matches_oracle(spark, duck, name, fn, sql):
    sdf = fn(spark, SF_T2)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    assert len(srows) >= 0  # smoke: query runs
    if sql is None:
        pytest.skip(f"{name}: rows-only (no oracle SQL)")
    rel = duck.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(scols) == sorted(dcols), f"{name}: column names differ"
    s_cols, s_rows = _canon_rows(scols, srows)
    d_cols, d_rows = _canon_rows(dcols, drows)
    assert len(s_rows) == len(d_rows), f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    mismatches = [i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first: "
        f"spark={s_rows[mismatches[0]]} duck={d_rows[mismatches[0]]}"
    )
