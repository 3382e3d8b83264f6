"""Exact-IVF adaptive escalation on the metadata-blocked 1M corpus —
the operator's THEOREM regime (VERDICT r9 item 3).

`tools/adaptive_bigpoint.py` measures the RaBitQ estimate path, where
the convergence certificate is a heuristic and the B-bit estimate noise
inflates distk (measured: estimate-path escalation stays ~50% even on
blocked cells).  The exact-IVF path (`operators/adaptive.
ivf_search_adaptive`, the registered `knn_ivf_adaptive` shape) has no
estimate noise and a LOSSLESS margin=0 guarantee: adaptive results are
bitwise the fixed-nprobe_hi results.  This tool measures that A/B on
the blocked index's cells (true per-block assignment regenerated from
the synthesizer stream, per tools/build_blocked_index.py):

    escalated fraction, probe-volume ratio, warm min walls of
    adaptive vs fixed-hi vs fixed-lo — recall vs GT as a sanity column
    (adaptive ≡ hi by the theorem; asserted here too).

Usage: python tools/adaptive_exact_blocked.py [--pairs 1:8,1:16,2:16]
Writes results/exrabitq/synth1536blocked_exact_adaptive.csv.
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
    ap.add_argument("--out-dir", default=f"{REPO}/_artifacts/bigpoint_blocked")
    ap.add_argument("--base-parquet",
                    default=f"{REPO}/_artifacts/bigpoint_tight/base.parquet",
                    help="raw corpus (the blocked dir holds only "
                         "index/queries/GT; the vectors live with the "
                         "tight soak that synthesized them)")
    ap.add_argument("--results-dir", default=f"{REPO}/results")
    ap.add_argument("--dataset", default="synth1536blocked_exact")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--pairs", default="1:8,1:16,2:16")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--ncomp", type=int, default=4096)
    ap.add_argument("--din", type=int, default=16)
    ap.add_argument("--d", type=int, default=1536)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    a = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    import numpy as np
    from pyspark.sql import functions as F

    from extended_rabitq_spark import metrics
    from extended_rabitq_spark.operators import adaptive, ivf
    from extended_rabitq_spark.operators.ivf import select_probes
    from extended_rabitq_spark.session import get_spark

    # replay the synthesizer RNG to regenerate block labels (see
    # tools/build_blocked_index.py — same stream, same order)
    rng0 = np.random.default_rng(a.seed)
    np.linalg.qr(rng0.standard_normal((a.d, a.din)))
    rng0.standard_normal((a.ncomp, a.din))
    cum_w = np.cumsum(rng0.dirichlet(np.full(a.ncomp, 2.0)))

    spark = get_spark("adaptive-exact-blocked", cpus=a.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    b_cum = spark.sparkContext.broadcast(cum_w)
    seed = a.seed

    def add_label(batches):
        import numpy as np
        import pandas as pd

        cum = b_cum.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            lab = np.empty(len(ids), dtype=np.int64)
            for i, rid in enumerate(ids):
                rng = np.random.Generator(
                    np.random.Philox(key=[seed, int(rid)]))
                lab[i] = min(int(np.searchsorted(cum, rng.random())),
                             len(cum) - 1)
            yield pd.DataFrame({"id": ids, "vec": pdf["vec"],
                                "cluster_id": lab})

    base = spark.read.parquet(a.base_parquet)
    indexed = base.mapInPandas(
        add_label, "id long, vec array<float>, cluster_id long").persist()
    indexed.count()
    cents = ivf.label_centroids(
        indexed, vec="vec", label="cluster_id").persist()
    cents.count()
    qs = (spark.read.parquet(f"{a.out_dir}/queries.parquet")
          .select(F.col("id").alias("qid"), F.col("vec").alias("qvec"))
          .persist())
    nq = qs.count()
    gt = (spark.read.parquet(f"{a.out_dir}/gt_k100.parquet")
          .where(F.col("rank") <= a.k).persist())
    gt.count()
    radii = adaptive.cell_radii_exact(indexed, cents, vec="vec").persist()
    radii.count()

    def timed(fn):
        fn()
        walls = []
        for _ in range(a.rounds):
            t0 = time.perf_counter()
            fn()
            walls.append(time.perf_counter() - t0)
        return min(walls)

    def rec(res) -> float:
        return float(metrics.recall_per_query(res, gt, a.k)
                     .agg(F.avg("recall")).first()[0])

    noop = lambda df: df.write.format("noop").mode("overwrite").save()  # noqa: E731
    rows = []
    hi_max = max(int(p.split(":")[1]) for p in a.pairs.split(","))
    # probe selection is excluded from the FIXED arms (checkpointed once,
    # injected filtered — the same protocol as tools/adaptive_bigpoint.py)
    # while the adaptive arm computes its own probes inside the timed
    # call: the asymmetry is CONSERVATIVE against adaptive.
    probes_all = select_probes(
        qs, cents.select("cluster_id", "centroid"), hi_max
    ).localCheckpoint(eager=True)

    def fixed(np_):
        return adaptive.exact_probe_search(
            qs, indexed, probes_all.where(F.col("probe_rank") <= np_), a.k)

    for pair in a.pairs.split(","):
        lo, hi = (int(x) for x in pair.split(":"))
        res_ad, stats = adaptive.ivf_search_adaptive(
            qs, indexed, cents, k=a.k, nprobe_lo=lo, nprobe_hi=hi,
            return_stats=True)
        esc = float(stats.agg(
            F.avg(F.col("escalate").cast("double"))).first()[0])
        r_ad = rec(res_ad)
        r_hi = rec(fixed(hi))
        r_lo = rec(fixed(lo))
        assert abs(r_ad - r_hi) < 1e-12, (
            f"losslessness theorem violated: {r_ad} vs {r_hi}")
        probe_ratio = (lo + esc * hi) / hi

        w_ad = timed(lambda: noop(adaptive.ivf_search_adaptive(
            qs, indexed, cents, k=a.k, nprobe_lo=lo, nprobe_hi=hi)))
        w_hi = timed(lambda: noop(fixed(hi)))
        w_lo = timed(lambda: noop(fixed(lo)))
        rows.append((lo, hi, round(esc, 4), round(probe_ratio, 4),
                     round(r_lo, 5), round(r_ad, 5), round(r_hi, 5),
                     round(nq / w_ad, 2), round(nq / w_hi, 2),
                     round(nq / w_lo, 2)))
        print(f"lo={lo} hi={hi}: escalated {esc:.1%} probe_vol {probe_ratio:.2f}x  "
              f"recall lo/ad/hi = {r_lo:.4f}/{r_ad:.4f}/{r_hi:.4f}  "
              f"QPS ad/hi/lo = {nq/w_ad:.1f}/{nq/w_hi:.1f}/{nq/w_lo:.1f}",
              flush=True)

    out = f"{a.results_dir}/exrabitq/{a.dataset}_adaptive.csv"
    with open(out, "w") as f:
        f.write("nprobe_lo,nprobe_hi,escalated_frac,probe_volume_ratio,"
                "recall_lo,recall_adaptive,recall_hi,QPS_adaptive,"
                "QPS_fixed_hi,QPS_fixed_lo\n")
        for r in rows:
            f.write(",".join(str(x) for x in r) + "\n")
    print(f"wrote {out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
