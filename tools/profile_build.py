"""Phase breakdown of the bench's untimed-setup/index_build_sec region
(VERDICT r10 item 5): one fresh JVM, bench-identical inputs at sf0.1,
each phase timed with its own action.  Run on an idle host.

Usage: python tools/profile_build.py [sf_dir]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    import pyspark.sql.functions as F

    from extended_rabitq_spark.operators import ivf, rabitq
    from extended_rabitq_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile-build", cpus=32)
    spark.sparkContext.setLogLevel("ERROR")
    NQ = 10

    def t(label, fn):
        t0 = time.perf_counter()
        out = fn()
        print(f"{label:42s} {time.perf_counter() - t0:7.3f}s", flush=True)
        return out

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.where(F.col("vec_id") >= NQ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    # mimic the bench: a couple of warm-up actions so the JVM/codegen/
    # python-worker cold costs don't masquerade as build cost
    t("warmup: emb.count x2", lambda: (emb.count(), emb.count()))
    t("warmup: arrow pass", lambda: base.mapInPandas(
        lambda it: it, "id long, vec array<double>").write.format("noop")
        .mode("overwrite").save())

    cents = ivf.label_centroids(emb.where(F.col("vec_id") >= NQ)).cache()
    t("label_centroids collect (cold cache)", lambda: cents.collect())
    t("label_centroids collect (cached)", lambda: cents.collect())

    t0_all = time.perf_counter()
    index_df, meta = t("build_index construct (centroid collect)",
                       lambda: rabitq.build_index(base, cents, total_bits=4))
    index_df = index_df.persist()
    t("index materialize (persist+count)", lambda: index_df.count())
    print(f"{'TOTAL bench index_build_sec region':42s} "
          f"{time.perf_counter() - t0_all + 0:7.3f}s  (+ label_centroids above)")

    cents_full = t("centroids_with_rotation",
                   lambda: rabitq.centroids_with_rotation(spark, cents, meta).cache())
    t("cents_full count", lambda: cents_full.count())
    t("cent_rows collect", lambda: cents_full.select("cluster_id", "centroid").collect())
    spark.stop()


if __name__ == "__main__":
    main()
