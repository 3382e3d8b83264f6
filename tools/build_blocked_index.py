"""Build a METADATA-BLOCKED RaBitQ index over the tight-cluster soak
corpus (VERDICT r9 item 3).

The adaptive-escalation certificate needs cell radius ≪ centroid
spacing.  Trained k-means at K=ncomp only approximately recovers the
planted topics — a handful of merged/straddling cells have radius ≈
spacing, and ONE fat cell among a query's rank-(lo,hi] tail zeroes the
triangle bound, so ~everything escalates even on a tight corpus
(measured: 99.8% at lo=1 on synth1536tight with trained cells).  The
deployment scenario the operator doc names is different: corpora whose
blocking is GIVEN — tenant/shard/category metadata — where cells are
the true blocks by construction.  This tool models that exactly:

1. regenerate each row's planted topic label (the synthesizer's
   counter-based Philox stream makes the label a pure function of the
   row id — no stored label column needed);
2. cells := labels, centroids := per-label means (the deterministic
   ``ivf.label_centroids`` path);
3. quantize + save the index next to the soak's queries/GT so
   ``tools/adaptive_bigpoint.py --out-dir <out>`` runs the same A/B.

Usage:
    python tools/build_blocked_index.py \
        [--src _artifacts/bigpoint_tight] [--out _artifacts/bigpoint_blocked]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default=f"{REPO}/_artifacts/bigpoint_tight")
    ap.add_argument("--out", default=f"{REPO}/_artifacts/bigpoint_blocked")
    ap.add_argument("--seed", type=int, default=42,
                    help="synthesizer seed (label stream replay)")
    ap.add_argument("--ncomp", type=int, default=4096)
    ap.add_argument("--din", type=int, default=16)
    ap.add_argument("--d", type=int, default=1536)
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    a = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")
    import numpy as np
    from pyspark.sql import functions as F

    from extended_rabitq_spark.operators import ivf, rabitq
    from extended_rabitq_spark.session import get_spark

    # replay the synthesizer's driver-side RNG IN ORDER (soak_bigpoint.
    # synthesize): frame QR draw, topic centers, Dirichlet sizes — only
    # cum_w is needed to reproduce each row's component draw.
    rng0 = np.random.default_rng(a.seed)
    g = rng0.standard_normal((a.d, a.din))
    np.linalg.qr(g)
    rng0.standard_normal((a.ncomp, a.din))
    cum_w = np.cumsum(rng0.dirichlet(np.full(a.ncomp, 2.0)))

    spark = get_spark("blocked-index-build", cpus=a.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    b_cum = sc.broadcast(cum_w)
    seed = a.seed

    def add_label(batches):
        import numpy as np
        import pandas as pd

        cum = b_cum.value
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            labels = np.empty(len(ids), dtype=np.int64)
            for i, rid in enumerate(ids):
                rng = np.random.Generator(
                    np.random.Philox(key=[seed + 0, int(rid)]))
                # the component draw is the synthesizer's FIRST draw for
                # this row — later draws (latent gaussian, ambient noise)
                # never affect it
                c = int(np.searchsorted(cum, rng.random()))
                labels[i] = min(c, len(cum) - 1)
            yield pd.DataFrame({"id": ids, "vec": pdf["vec"],
                                "label": labels})

    base = spark.read.parquet(f"{a.src}/base.parquet")
    labeled = base.mapInPandas(
        add_label, "id long, vec array<float>, label long").persist()
    n = labeled.count()
    n_lab = labeled.select("label").distinct().count()
    print(f"labeled {n} rows, {n_lab} distinct blocks")

    t0 = time.perf_counter()
    cents = ivf.label_centroids(labeled, vec="vec", label="label")
    index_df, meta = rabitq.build_index(
        labeled.select("id", "vec"), cents, total_bits=a.b)
    os.makedirs(a.out, exist_ok=True)
    rabitq.save_index(index_df, cents, meta, f"{a.out}/index")
    print(f"blocked index built+saved in {time.perf_counter() - t0:.1f}s "
          f"-> {a.out}/index")

    # same corpus ⇒ the soak's queries and exact GT carry over verbatim
    for name in ("queries.parquet", f"gt_k100.parquet"):
        dst = f"{a.out}/{name}"
        if not os.path.exists(dst) and os.path.exists(f"{a.src}/{name}"):
            shutil.copytree(f"{a.src}/{name}", dst)
            print(f"copied {name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
