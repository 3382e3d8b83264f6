"""MinHash-LSH band-skew + phase profile (VERDICT r7 item 4).

Question: `dedup_minhash_lsh` is the slowest dedup headline (3.77s at
sf0.1) — is the cost band-bucket SKEW (a few hot (band, key) buckets
generating quadratic candidates → salting/capping would help) or flat
COMPUTE (tokenize/hash/verify spread evenly → the time is the honest
price of the work)?

Method: run the production pass structure once at $SPARK_GRAFT_SF_DIR
(default sf0.1) and emit

1. per-phase walls (shingle materialization / signatures / band join /
   jaccard verify) — a second run re-times phases warm;
2. the band-bucket-size histogram: bucket size distribution over
   (band, key) groups, the candidate-pair mass sum n*(n-1)/2 per size
   class, and the share of candidate pairs from the top-10 buckets —
   the skew verdict in one number.

Writes `results/minhash_band_histogram.csv` (size_class, n_buckets,
candidate_pairs) and prints a JSON summary line.

Usage: python tools/minhash_band_profile.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from extended_rabitq_spark.operators import dedup
from extended_rabitq_spark.session import get_spark
from extended_rabitq_spark.tables import spread_small_scan

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def phase_walls(spark) -> dict[str, float]:
    docs = spread_small_scan(spark.read.parquet(f"{SF_DIR}/documents.parquet"), spark)
    walls: dict[str, float] = {}
    t0 = time.perf_counter()
    raw = dedup.raw_shingles(docs).localCheckpoint(eager=True)
    walls["shingle_materialize"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    stop = dedup.stop_shingles(docs, shingles=raw)
    sh = raw.join(F.broadcast(stop), on="shingle", how="left_anti")
    sigs = dedup._signatures_from_shingles(sh).localCheckpoint(eager=True)
    walls["signatures"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    bands = dedup._band_keys(sigs)
    cand = (
        bands.alias("x")
        .join(bands.alias("y"), on=["band", "key"])
        .where(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    walls["band_join"] = time.perf_counter() - t0
    walls["n_candidates"] = cand.count()

    t0 = time.perf_counter()
    n_pairs = dedup.minhash_lsh_pairs(docs).count()
    walls["full_query_end_to_end"] = time.perf_counter() - t0
    walls["n_result_pairs"] = n_pairs
    return walls


def band_histogram(spark):
    docs = spread_small_scan(spark.read.parquet(f"{SF_DIR}/documents.parquet"), spark)
    raw = dedup.raw_shingles(docs).localCheckpoint(eager=True)
    stop = dedup.stop_shingles(docs, shingles=raw)
    sh = raw.join(F.broadcast(stop), on="shingle", how="left_anti")
    bands = dedup._band_keys(dedup._signatures_from_shingles(sh))
    sizes = bands.groupBy("band", "key").agg(F.count("*").alias("n"))
    hist = (
        sizes.groupBy("n")
        .agg(F.count("*").alias("n_buckets"))
        .withColumn("candidate_pairs", F.col("n_buckets") * F.col("n") * (F.col("n") - 1) / 2)
        .orderBy("n")
        .collect()
    )
    top = sizes.orderBy(F.desc("n")).limit(10).collect()
    total_pairs = sum(r["candidate_pairs"] for r in hist)
    top_pairs = sum(r["n"] * (r["n"] - 1) / 2 for r in top)
    return hist, top, total_pairs, top_pairs


def main() -> None:
    spark = get_spark("minhash-band-profile")
    spark.sparkContext.setLogLevel("ERROR")
    cold = phase_walls(spark)
    warm = phase_walls(spark)
    hist, top, total_pairs, top_pairs = band_histogram(spark)

    os.makedirs("results", exist_ok=True)
    with open("results/minhash_band_histogram.csv", "w") as fh:
        fh.write("bucket_size,n_buckets,candidate_pairs\n")
        for r in hist:
            fh.write(f"{r['n']},{r['n_buckets']},{int(r['candidate_pairs'])}\n")

    summary = {
        "sf_dir": SF_DIR,
        "cold": {k: round(v, 3) if isinstance(v, float) else v for k, v in cold.items()},
        "warm": {k: round(v, 3) if isinstance(v, float) else v for k, v in warm.items()},
        "n_band_buckets": int(sum(r["n_buckets"] for r in hist)),
        "max_bucket_size": int(hist[-1]["n"]) if hist else 0,
        "total_candidate_pairs": int(total_pairs),
        "top10_bucket_pairs": int(top_pairs),
        "top10_pair_share": round(top_pairs / total_pairs, 4) if total_pairs else 0.0,
        "top_buckets": [
            {"band": r["band"], "n": r["n"]} for r in top
        ],
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
