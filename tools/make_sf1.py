"""Synthesize a 10× ("sf1") copy of the sf0.1 test tables for bench
scaling runs: every table replicates REPLICAS times with key columns
shifted so referential integrity holds (lineitem→orders/part/supplier,
orders→customer, events/documents/embeddings by their own ids).
nation/region are FK targets and stay as-is.

Usage: python tools/make_sf1.py [OUT_DIR]   (default /tmp/sf1full)
Then:  SPARK_GRAFT_SF_DIR=OUT_DIR python bench.py
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
OFF = 10_000_000  # key shift per replica — far above any sf0.1 key

# table -> columns to shift by r*OFF (all BIGINT keys)
SHIFTS = {
    "region": [],
    "nation": [],
    "supplier": ["s_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> int:
    import duckdb

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1full"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table, keys in SHIFTS.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'"
            ).fetchall()
        ]
        if not keys:
            con.sql(
                f"COPY (SELECT * FROM '{SRC}/{table}.parquet') "
                f"TO '{out}/{table}.parquet' (FORMAT parquet)"
            )
        else:
            proj = ", ".join(
                f"{c} + r * {OFF} AS {c}" if c in keys else c for c in cols
            )
            con.sql(
                f"COPY (SELECT {proj} FROM '{SRC}/{table}.parquet', "
                f"range({REPLICAS}) AS t(r)) "
                f"TO '{out}/{table}.parquet' (FORMAT parquet)"
            )
        (n,) = con.sql(f"SELECT count(*) FROM '{out}/{table}.parquet'").fetchone()
        print(f"{table}: {n} rows")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
