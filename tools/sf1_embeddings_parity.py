"""One-shot sf1-scale embeddings parity + quality soak (round-4 scale
validation, companion to sf1_documents_parity.py / sf1_events_parity.py).

Synthesizes an sf1-sized embeddings table (10× sf0.1 = 20k vectors) by
replicating vectors with distinct vec_ids while KEEPING every payload —
so each base vector gains 9 exact twins: every KNN distance ties 10-way
(stressing the ORDER BY dist, id determinism contract on both engines),
per-label centroids keep their exact means (rounding-grid invariant),
and each IVF cluster grows 10×.  Documents replicate alongside so the
filtered-KNN join stays referentially intact.

Two parts:
1. Oracle parity: the vector/IVF family runs on Spark AND DuckDB over
   the same parquet, compared with the driver's repr-tuple method.
2. End-to-end quality: a RaBitQ index is built at 20k vectors with the
   BENCH anchor's cluster geometry (K=16, so nprobe=6 probes the same
   37% fraction as the sf0.1 bench point that lands recall 0.78) and
   the sweep must hold recall@np6 ≥ 0.70 with monotone improvement at
   np12.

Usage: python tools/sf1_embeddings_parity.py   (~4-8 min, local[8])
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

NAMES = [
    "vector_stats",
    "normalize_vectors",
    "residual_stats",
    "knn_exact",
    "knn_cosine",
    "knn_range",
    "knn_filtered",
    "ivf_centroids",
    "ivf_assign",
    "ivf_probes",
    "knn_ivf",
    "ivf_recall",
    "ivf_ratio",
    "query_quantize_uniform",
    "query_quantize_symmetric",
    "corpus_integrity_audit",
    # r4 session 2: metric twins + late interaction — the 10× twin
    # corpus is adversarial for these (every KNN ORDER BY has 10-way
    # distance ties; the quantized twins must tie-break identically
    # through the index + exact-rerank path)
    "knn_ip",
    "knn_cosine_rabitq",
    "knn_ip_rabitq",
    "maxsim_label_topk",
]

RECALL_FLOOR_NP6 = 0.70


def main() -> int:
    import duckdb

    import __spark_entry__ as e
    from extended_rabitq_spark.session import get_spark

    tmp = tempfile.mkdtemp(prefix="sf1emb_")
    con = duckdb.connect()
    # Replica vectors keep their payload; vec_id 0..NQ-1 stay the ONLY
    # query rows (replica ids jump by 10M), so the held-out split is
    # unchanged while the base side grows 10× with exact twins.
    con.sql(
        f"""
        COPY (
          SELECT vec_id + r * 10_000_000 AS vec_id, embedding, label
          FROM read_parquet('{SRC}/embeddings.parquet'),
               range({REPLICAS}) AS t(r)
        ) TO '{tmp}/embeddings.parquet' (FORMAT parquet)
        """
    )
    con.sql(
        f"""
        COPY (
          SELECT doc_id + r * 10_000_000 AS doc_id, text, lang, source, n_chars
          FROM read_parquet('{SRC}/documents.parquet'),
               range({REPLICAS}) AS t(r)
        ) TO '{tmp}/documents.parquet' (FORMAT parquet)
        """
    )
    (n,) = con.sql(f"SELECT count(*) FROM '{tmp}/embeddings.parquet'").fetchone()
    print(f"sf1 embeddings synthesized: {n} rows at {tmp}")
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{tmp}/embeddings.parquet'")
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp}/documents.parquet'")

    spark = get_spark("sf1-embeddings-parity", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    q, o = e.queries(), e.oracle_sql()
    run = [nm for nm in NAMES if nm in q and nm in o]
    failures = []
    for name in run:
        t0 = time.perf_counter()
        s = sorted(tuple(map(repr, r)) for r in q[name](spark, tmp).collect())
        t1 = time.perf_counter()
        d = sorted(tuple(map(repr, r)) for r in con.sql(o[name]).fetchall())
        ok = s == d
        print(
            f"{name}: match={ok} rows={len(s)} "
            f"(spark {t1 - t0:.1f}s, duck {time.perf_counter() - t1:.1f}s)"
        )
        if not ok:
            failures.append(name)
            only_s = sorted(set(s) - set(d))[:2]
            only_d = sorted(set(d) - set(s))[:2]
            print(f"  rows spark={len(s)} duck={len(d)}; "
                  f"spark-only={only_s} duck-only={only_d}")

    # -- part 2: end-to-end RaBitQ quality at 20k vectors -------------------
    from pyspark.sql import functions as F

    from extended_rabitq_spark import metrics
    from extended_rabitq_spark.operators import ivf, knn, rabitq
    from extended_rabitq_spark.tables import NQ

    emb = spark.read.parquet(f"{tmp}/embeddings.parquet")
    base = emb.where(F.col("vec_id") >= NQ).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vec")
    )
    queries = emb.where(F.col("vec_id") < NQ).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    t0 = time.perf_counter()
    cents = ivf.sampled_kmeans_centroids(base, k=16, vec="vec")
    index_df, meta = rabitq.build_index(base, cents, total_bits=4)
    index_df = index_df.localCheckpoint(eager=True)
    cents_full = rabitq.centroids_with_rotation(spark, cents, meta)
    build_s = time.perf_counter() - t0
    print(f"index built: {index_df.count()} rows, K=16, {build_s:.1f}s")

    gt = knn.exact_knn(queries, base, k=100)
    recalls = {}
    for nprobe in (6, 12):
        t0 = time.perf_counter()
        res = rabitq.rabitq_search(
            queries, index_df, cents_full, meta, nprobe=nprobe, k=100,
            rerank_base=base,
        )
        rec = (
            metrics.recall_per_query(res, gt, k=100)
            .agg(F.avg("recall").alias("r")).collect()[0]["r"]
        )
        dt = time.perf_counter() - t0
        recalls[nprobe] = rec
        print(f"nprobe={nprobe}: recall@100={rec:.4f} ({dt:.1f}s, "
              f"{NQ / dt:.0f} QPS cold)")
    ok_recall = recalls[6] >= RECALL_FLOOR_NP6 and recalls[12] >= recalls[6] - 1e-9
    if not ok_recall:
        failures.append(f"recall_envelope {recalls}")
    print(f"RESULT: {len(run) - len([f for f in failures if f in run])}/{len(run)} "
          f"match; recall_ok={ok_recall}; failures={failures}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
