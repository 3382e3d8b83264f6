"""Static type audit of every DuckDB oracle: the driver's value hash is
TYPE-sensitive, and DuckDB silently widens integer ``sum()`` to HUGEINT
(int128) — a type Spark never produces — so any oracle emitting HUGEINT
is a guaranteed hash-mismatch even when values are identical (this bit
``events_json_props``/``events_pivot`` in round 3; see VERDICT.md r3).

This test runs ONLY the DuckDB side (cheap — sf0.001) and rejects types
Spark cannot emit.  The full value-parity check lives in
tests/test_oracle_parity.py.
"""

from __future__ import annotations

import duckdb
import pytest

from conftest import SF_SMOKE, TABLES

# DuckDB result types that have no Spark equivalent → driver hash-mismatch
# even with identical values.  DECIMAL joined the set in round 5: Spark CAN
# emit it, but the driver's pandas canonicalization coerces DECIMAL(38,6) to
# float64 on one engine and not the other, so bit-identical decimal answers
# still hash-mismatch (r4's tpch_q1 — values verified identical by the
# judge).  DECIMAL stays legal INTERNALLY (sums, HAVING cuts, ORDER BY
# keys); only FINAL projections must cast to DOUBLE/BIGINT on both sides.
_FORBIDDEN = {"HUGEINT", "UHUGEINT", "UTINYINT", "USMALLINT", "UINTEGER",
              "UBIGINT", "TIME", "INTERVAL", "DECIMAL"}


def _forbidden_cols(rel):
    """Columns of a DuckDB relation whose type the driver hash cannot
    canonicalize consistently across engines."""
    return [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t).split("(")[0] in _FORBIDDEN
    ]


def _oracles():
    import __spark_entry__ as e

    return sorted(e.oracle_sql().items())


@pytest.fixture(scope="module")
def duck_smoke():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_emits_spark_compatible_types(duck_smoke, name, sql):
    rel = duck_smoke.sql(sql)
    bad = _forbidden_cols(rel)
    assert not bad, (
        f"{name}: oracle emits Spark-incompatible types {bad} — wrap the "
        f"aggregate in an explicit CAST (e.g. CAST(sum(...) AS BIGINT))"
    )
    # duplicate column names break the driver's sort-by-name value hash
    assert len(set(rel.columns)) == len(rel.columns), (
        f"{name}: duplicate column names {rel.columns}"
    )


def test_audit_catches_decimal_final(duck_smoke):
    """Self-test of the audit (VERDICT r4 item 2): a deliberately-DECIMAL
    final — the exact shape that broke tpch_q1 in r4 — must be flagged."""
    rel = duck_smoke.sql(
        "SELECT l_returnflag, sum(CAST(l_quantity AS DECIMAL(38,6))) AS s "
        "FROM lineitem GROUP BY l_returnflag"
    )
    bad = _forbidden_cols(rel)
    assert bad == [("s", "DECIMAL(38,6)")]
    # ...and the fixed projection passes.
    rel2 = duck_smoke.sql(
        "SELECT l_returnflag, CAST(sum(CAST(l_quantity AS DECIMAL(38,6))) "
        "AS DOUBLE) AS s FROM lineitem GROUP BY l_returnflag"
    )
    assert _forbidden_cols(rel2) == []


def test_events_props_k_is_json_number(duck_smoke):
    """ADVICE r3: Spark's typed ``from_json`` (LongType) yields NULL for a
    JSON *string* ``"7"`` while the DuckDB oracle's CAST coerces it to 7 —
    a latent value divergence in ``events_json_props`` if the fixture ever
    string-encodes k.  Pin the fixture contract: props.k is a JSON number
    or absent, never a string (checked at both gate scales)."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        (n_str,) = duck_smoke.sql(
            "SELECT count(*) FROM read_parquet('" + sf + "/events.parquet') "
            "WHERE json_type(props, '$.k') = 'VARCHAR'"
        ).fetchone()
        assert n_str == 0, f"{sf}: {n_str} rows encode props.k as a string"
