"""One-shot sf1-scale events parity sweep (VERDICT r3 item 7).

The driver ships sf0.001/0.01/0.1 only; this script synthesizes an
sf1-sized events table (10× sf0.1 = 1M rows) by replicating events with
distinct event_ids and shifted user_ids while KEEPING every timestamp —
so cross-replica timestamp ties, session-gap edges, and window-frame
boundaries appear at 10× density, exactly the hazards that only show up
at volume.  Every registered events_* query then runs on Spark AND its
DuckDB oracle over the same parquet, compared with the driver's
repr-tuple method.

Usage: python tools/sf1_events_parity.py   (~2-4 min, local[8])
Writes nothing outside $TMPDIR.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = 10
SRC = "/root/testdata/sf0.1"


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from extended_rabitq_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="sf1events_")
    con = duckdb.connect()
    # distinct event_ids per replica; user_ids shifted so the user
    # population grows 10× (per-user history length stays sf0.1-like,
    # matching how event volume actually scales); timestamps unchanged →
    # cross-replica ties stress every ORDER BY ts window determinism.
    con.sql(
        f"""
        COPY (
          SELECT event_id + r * 10_000_000 AS event_id,
                 ts,
                 user_id + r * 1_000_000 AS user_id,
                 event_type, value, props
          FROM read_parquet('{SRC}/events.parquet'),
               range({REPLICAS}) AS t(r)
        ) TO '{tmp}/events.parquet' (FORMAT parquet)
        """
    )
    (n,) = con.sql(f"SELECT count(*) FROM '{tmp}/events.parquet'").fetchone()
    print(f"sf1 events synthesized: {n} rows at {tmp}")
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{tmp}/events.parquet'")

    spark = get_spark("sf1-events-parity", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    q, o = e.queries(), e.oracle_sql()
    names = sorted(n for n in q if n.startswith("events_") and n in o)
    failures = []
    for name in names:
        t0 = time.perf_counter()
        s = sorted(tuple(map(repr, r)) for r in q[name](spark, tmp).collect())
        d = sorted(tuple(map(repr, r)) for r in con.sql(o[name]).fetchall())
        ok = s == d
        print(
            f"{name}: match={ok} rows={len(s)} "
            f"({time.perf_counter() - t0:.1f}s)"
        )
        if not ok:
            failures.append(name)
            # symmetric diff, not a positional zip: a pure row-count
            # mismatch with an equal common prefix must still print
            only_s = sorted(set(s) - set(d))[:2]
            only_d = sorted(set(d) - set(s))[:2]
            print(f"  rows spark={len(s)} duck={len(d)}; "
                  f"spark-only={only_s} duck-only={only_d}")
    print(f"RESULT: {len(names) - len(failures)}/{len(names)} match; "
          f"failures={failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
