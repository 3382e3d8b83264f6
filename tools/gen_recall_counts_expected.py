"""Regenerate the pinned expected table for ``rabitq_recall_counts``.

The registered query attests the approximate search path with a hashable
integer result; its oracle is this pinned per-query hit-count table for
the driver's correctness-gate scale (sf0.01).  Re-run this tool (and
paste its output into ``queries/rabitq.py:_RECALL_COUNTS_EXPECTED``)
ONLY when the operating point changes on purpose — a drift without a
deliberate change is a regression the pinned oracle exists to catch.

    python tools/gen_recall_counts_expected.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from extended_rabitq_spark.queries.rabitq import (
        _recall_counts,
        rabitq_recall_counts_adaptive,
    )

    for name, kw in (
        ("_RECALL_COUNTS_EXPECTED", {}),
        ("_RECALL_COUNTS_HA_EXPECTED", {"estimator": "high_acc"}),
    ):
        rows = sorted(
            (r.qid, r.hits) for r in _recall_counts(spark, sf_dir, **kw).collect()
        )
        print(f"{name} = [")
        for q, h in rows:
            print(f"    ({q}, {h}),")
        print("]")
    # the adaptive row pins (hits, n_pool, n_kept) — the prune-activity
    # columns certify the cut is ACTIVE at the pinned operating point
    arows = sorted(
        (r.qid, r.hits, r.n_pool, r.n_kept)
        for r in rabitq_recall_counts_adaptive(spark, sf_dir).collect()
    )
    print("_RECALL_COUNTS_ADAPTIVE_EXPECTED = [")
    for q, h, p, kp in arows:
        print(f"    ({q}, {h}, {p}, {kp}),")
    print("]")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
