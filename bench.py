"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each timing includes full materialization (count/collect) — the honest
Spark analog of the reference's per-query wall clock
(src/test_search.cpp:101-130, rotation amortized in).
"""

from __future__ import annotations

import json
import os
import sys
import time

HEADLINE = [
    "knn_exact",
    "knn_exact_combined",
    "knn_ivf",
    "knn_rabitq",
    "rabitq_recall",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from extended_rabitq_spark.session import get_spark

    spark = get_spark("exrabitq-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        if name not in qmap:
            continue
        t0 = time.perf_counter()
        try:
            qmap[name](spark, sf_dir).count()
        except Exception as exc:  # keep the bench line parseable on failure
            print(f"bench: {name} failed: {exc}", file=sys.stderr)
            timings[name] = -1.0
            continue
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
