"""Adaptive probe escalation measured at the 1M operating point.

Runs AFTER tools/soak_bigpoint.py (reuses its synthesized corpus, built
index, and cached ground truth): for each (nprobe_lo, nprobe_hi) pair,
measures the RaBitQ-path adaptive search (operators/adaptive.py —
certificate over B-bit estimates, radii from the index's x2 column)
against the fixed-nprobe_hi search through the SAME injected-probes
cogroup scorer, so the wall comparison isolates the escalation logic
(not a scorer-routing difference).

Reported per pair: escalation fraction, recall@k of adaptive vs fixed
hi and fixed lo, and warm min walls (timed() returns min over the
rounds).  The interesting question at
this scale is whether the triangle certificate FIRES on a realistic
low-intrinsic-dimension corpus (the soak's latent topic mixture) —
unlike the sf gate embeddings where it is vacuous (NOTES milestone 55).

``--rerank`` measures the EXACT-distk variant: both arms run with
``rerank_base`` (+ ``--refine`` shortlist cut), so the lo-pass top-k
carries exact re-ranked distances and the certificate compares the
triangle bound against an exact distk instead of a noisy B-bit
estimate — the noise component of escalation inflation (NOTES
milestone 63 finding 2) drops out, at the cost of the per-pass rerank
join.  The within-cell estimator can still hide a true neighbor from
the shortlist, so the certificate stays a heuristic; the bitwise
escalation laws are unchanged.

Usage: python tools/adaptive_bigpoint.py [--pairs 3:16,5:16] [--k 100]
Writes results/exrabitq/<dataset>_adaptive.csv.
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
    ap.add_argument("--out-dir", default=f"{REPO}/_artifacts/bigpoint")
    ap.add_argument("--results-dir", default=f"{REPO}/results")
    ap.add_argument("--dataset", default="synth1536")
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--pairs", default="3:16,5:16")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--rerank", action="store_true",
                    help="exact re-rank both arms (exact-distk certificate)")
    ap.add_argument("--refine", type=int, default=4,
                    help="shortlist cut gamma for --rerank (refine*k)")
    ap.add_argument("--base", default=None,
                    help="raw-vector parquet for --rerank "
                         "(default <out-dir>/base.parquet; blocked-index "
                         "dirs keep base next to the SOURCE corpus)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    a = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    from pyspark.sql import functions as F

    from extended_rabitq_spark import metrics
    from extended_rabitq_spark.operators import adaptive, rabitq
    from extended_rabitq_spark.operators.ivf import select_probes
    from extended_rabitq_spark.session import get_spark

    spark = get_spark("adaptive-bigpoint", cpus=a.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    codes, cents, meta = rabitq.load_index(spark, f"{a.out_dir}/index")
    codes = codes.persist()
    codes.count()
    qs = (spark.read.parquet(f"{a.out_dir}/queries.parquet")
          .select(F.col("id").alias("qid"), F.col("vec").alias("qvec"))
          .persist())
    nq = qs.count()
    gt = spark.read.parquet(f"{a.out_dir}/gt_k{a.k}.parquet").persist()
    gt.count()
    radii = adaptive.cell_radii_from_codes(codes).persist()
    radii.count()
    search_kw: dict = {}
    if a.rerank:
        base = spark.read.parquet(a.base or f"{a.out_dir}/base.parquet").persist()
        base.count()
        search_kw = dict(rerank_base=base, refine=a.refine)

    def timed(fn):
        fn()  # warm (plan codegen + first-touch)
        walls = []
        for _ in range(a.rounds):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return min(walls)

    rows = []
    for pair in a.pairs.split(","):
        lo, hi = (int(x) for x in pair.split(":"))
        probes_hi = select_probes(
            qs, cents.select("cluster_id", "centroid"), hi
        ).localCheckpoint(eager=True)

        def fixed(p):
            return rabitq.rabitq_search(
                qs, codes, cents, meta, nprobe=hi, k=a.k, probes=p,
                **search_kw,
            )

        res_ad, stats = adaptive.rabitq_search_adaptive(
            qs, codes, cents, meta, k=a.k, nprobe_lo=lo, nprobe_hi=hi,
            return_stats=True, **search_kw,
        )
        esc = stats.agg(F.avg(F.col("escalate").cast("double"))).first()[0]
        rec_ad = (metrics.recall_per_query(res_ad, gt, a.k)
                  .agg(F.avg("recall")).first()[0])
        rec_hi = (metrics.recall_per_query(fixed(probes_hi), gt, a.k)
                  .agg(F.avg("recall")).first()[0])
        rec_lo = (metrics.recall_per_query(
            fixed(probes_hi.where(F.col("probe_rank") <= lo)), gt, a.k)
            .agg(F.avg("recall")).first()[0])

        def run_adaptive():
            adaptive.rabitq_search_adaptive(
                qs, codes, cents, meta, k=a.k, nprobe_lo=lo, nprobe_hi=hi,
                **search_kw,
            ).write.format("noop").mode("overwrite").save()

        def run_fixed():
            fixed(probes_hi).write.format("noop").mode("overwrite").save()

        w_ad = timed(run_adaptive)
        w_hi = timed(run_fixed)
        rows.append((lo, hi, round(esc, 4), round(rec_lo, 5),
                     round(rec_ad, 5), round(rec_hi, 5),
                     round(nq / w_ad, 2), round(nq / w_hi, 2)))
        print(f"lo={lo} hi={hi}: escalated {esc:.1%}  "
              f"recall lo/adaptive/hi = {rec_lo:.4f}/{rec_ad:.4f}/{rec_hi:.4f}  "
              f"QPS adaptive/fixed-hi = {nq / w_ad:.1f}/{nq / w_hi:.1f}",
              flush=True)

    out = f"{a.results_dir}/exrabitq/{a.dataset}_adaptive.csv"
    with open(out, "w") as f:
        f.write("nprobe_lo,nprobe_hi,escalated_frac,recall_lo,"
                "recall_adaptive,recall_hi,QPS_adaptive,QPS_fixed_hi\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
