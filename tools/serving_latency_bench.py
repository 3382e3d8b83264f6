"""Streaming ANN-serving latency benchmark (VERDICT r5 item 7).

Builds (or reuses) a RaBitQ index over the sf0.1 embeddings, then drives
it with the deterministic rate-source query stream
(``streaming.stream_ops.synthetic_query_stream``) through the
``foreachBatch`` serving loop at several batch rates, recording
per-micro-batch latency.  Writes ``results/serving_latency.csv``:

    rows_per_batch,n_batches,p50_sec,p99_sec,throughput_qps

Micro-batch latency on Spark = job-scheduling floor + search time, so
small batches are floor-bound and larger batches amortize it — the same
economics a 1000-executor cluster has, just with a smaller floor per
executor count.  Run on an otherwise-idle host; p99 is noise-sensitive.

    python tools/serving_latency_bench.py [--sf-dir DIR] [--rates 10,50,200]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--rates", default="10,50,200",
                    help="comma list of rows_per_batch settings")
    ap.add_argument("--batches", type=int, default=24,
                    help="measured micro-batches per rate (after warmup)")
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--nprobe", type=int, default=6)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--index", default=f"{REPO}/_artifacts/serving_index")
    ap.add_argument("--results-dir", default=f"{REPO}/results")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from extended_rabitq_spark.session import get_spark
    from extended_rabitq_spark.operators import ivf, rabitq
    from extended_rabitq_spark.streaming.stream_ops import serve_latency_benchmark
    from extended_rabitq_spark.tables import NQ

    spark = get_spark("serving-latency-bench", cpus=a.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    if not os.path.exists(f"{a.index}/meta.json"):
        emb = spark.read.parquet(f"{a.sf_dir}/embeddings.parquet")
        base = emb.where(F.col("vec_id") >= NQ).select(
            F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        cents = ivf.label_centroids(emb.where(F.col("vec_id") >= NQ))
        index_df, meta = rabitq.build_index(base, cents, total_bits=4)
        rabitq.save_index(index_df, cents, meta, a.index)
        print(f"built serving index -> {a.index}")

    # Three serving configurations (VERDICT r6 item 8): the baseline
    # two-jobs-per-batch loop, the single-job fold (query count folded
    # into the search-result aggregation), and single-job with AQE off
    # (no runtime re-planning barriers for tiny fixed micro-batches).
    # The p50 gap between configs measures the job floor directly.
    configs = [
        ("baseline", dict(single_job=False, conf=None)),
        ("single_job", dict(single_job=True, conf=None)),
        ("single_job_aqe_off",
         dict(single_job=True,
              conf={"spark.sql.adaptive.enabled": "false"})),
        # r8 (VERDICT r7 item 7): tiny fixed micro-batches don't need 32
        # shuffle partitions for the per-query top-k window — 4 tasks
        # cover a 200-row batch and cut per-batch task-launch overhead
        # 8×; centroids are persisted across batches (stream_ops change)
        # so per-batch probe selection reads memory, not parquet.
        ("single_job_tuned",
         dict(single_job=True,
              conf={"spark.sql.adaptive.enabled": "false",
                    "spark.sql.shuffle.partitions": "4"})),
    ]
    # r10 (VERDICT r9 item 5): the ONE-job-per-batch floor — query
    # batches held driver-side (the RPC-serving shape) go straight into
    # the broadcast scorer via rabitq_search(query_rows=...), so the
    # per-batch cost is a single search job (streaming single_job pays
    # the scheduling floor twice: scorer's query collect + search).
    configs.append(
        ("local_single_job",
         dict(local=True,
              conf={"spark.sql.adaptive.enabled": "false",
                    "spark.sql.shuffle.partitions": "4"})))
    rows = []
    for cfg_name, kw in configs:
        kw = dict(kw)
        local = kw.pop("local", False)
        for rate in [int(r) for r in a.rates.split(",")]:
            if local:
                from extended_rabitq_spark.streaming.stream_ops import (
                    serve_local_batches,
                )

                stats = serve_local_batches(
                    spark, a.index, rows_per_batch=rate,
                    n_batches=a.warmup + a.batches, nprobe=a.nprobe,
                    k=a.k, **kw,
                )
            else:
                stats = serve_latency_benchmark(
                    spark, a.index, rows_per_batch=rate,
                    n_batches=a.warmup + a.batches, nprobe=a.nprobe, k=a.k,
                    timeout_sec=600.0, **kw,
                )
            measured = stats[a.warmup:]
            if not measured:
                print(f"config={cfg_name} rate={rate}: no measured "
                      "batches (warmup never completed)", file=sys.stderr)
                continue
            lats = sorted(s["latency_sec"] for s in measured)
            p50 = lats[len(lats) // 2]
            p99 = lats[min(len(lats) - 1, int(len(lats) * 0.99))]
            total_q = sum(s["n_queries"] for s in measured)
            total_t = sum(s["latency_sec"] for s in measured)
            qps = total_q / total_t
            rows.append((cfg_name, rate, len(measured), p50, p99, qps))
            print(f"config={cfg_name} rate={rate}/batch: "
                  f"n={len(measured)} p50={p50:.3f}s "
                  f"p99={p99:.3f}s throughput={qps:.1f} qps")

    os.makedirs(a.results_dir, exist_ok=True)
    out = f"{a.results_dir}/serving_latency.csv"
    with open(out, "w") as fh:
        fh.write(
            "config,rows_per_batch,n_batches,p50_sec,p99_sec,"
            "throughput_qps\n"
        )
        for cfg_name, rate, nb, p50, p99, qps in rows:
            fh.write(f"{cfg_name},{rate},{nb},{p50:.4f},{p99:.4f},"
                     f"{qps:.2f}\n")
    print(f"wrote {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
