"""Split a warm rabitq_search rep into plan-construction vs execution.

The r11 'Not yet optimized' list flags ~0.8s of py4j/Catalyst plan-graph
construction per ANN run.  The bench's headline rabitq_search_np{3,6}
warm medians time BOTH construction and execution per rep — this tool
measures where the time goes so a construction cut can be sized before
any change (guide §1).

Usage: python tools/profile_search_construct.py [reps]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from pyspark.sql import functions as F

    from extended_rabitq_spark.session import get_spark
    from extended_rabitq_spark.operators import ivf, rabitq
    from extended_rabitq_spark.tables import NQ

    spark = get_spark("profile-search-construct", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.where(F.col("vec_id") >= NQ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    cents = ivf.label_centroids(emb.where(F.col("vec_id") >= NQ)).cache()
    index_df, meta = rabitq.build_index(base, cents, total_bits=4)
    index_df = index_df.persist()
    index_df.count()
    cents_full = rabitq.centroids_with_rotation(spark, cents, meta).cache()
    cents_full.count()
    cent_rows = cents_full.select("cluster_id", "centroid").collect()

    bench_queries = (
        emb.where(F.col("vec_id") >= NQ)
        .limit(500)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        .cache()
    )
    bench_queries.count()

    for nprobe in (3, 6):
        # untimed warm-up
        rabitq.rabitq_search(
            bench_queries, index_df, cents_full, meta, nprobe=nprobe, k=10,
            scorer="arrow_broadcast", centroid_rows=cent_rows,
        ).write.format("noop").mode("overwrite").save()
        cons, execs = [], []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = rabitq.rabitq_search(
                bench_queries, index_df, cents_full, meta, nprobe=nprobe, k=10,
                scorer="arrow_broadcast", centroid_rows=cent_rows,
            )
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
        cons.sort(); execs.sort()
        print(
            f"np{nprobe}: construct median {cons[len(cons)//2]:.3f}s "
            f"(min {cons[0]:.3f} max {cons[-1]:.3f}) | "
            f"exec median {execs[len(execs)//2]:.3f}s "
            f"(min {execs[0]:.3f} max {execs[-1]:.3f})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
