"""Laws of the adaptive probe-escalation operators (operators/adaptive.py).

Planted geometry: three well-separated clusters (centers 100 apart,
radius ≤ 1), one query AT a cluster center (its k-th distance ≤ 2 while
every other cell's bound is ≥ 98² — MUST converge at nprobe_lo=1) and
one query midway between two clusters (both cells' bounds are ~0 —
MUST escalate).  On this fixture the verdicts are forced by construction,
so the tests pin behavior, not luck of the draw.

The exact-IVF variant's convergence certificate is a THEOREM (triangle
inequality on true distances): margin=0 adaptive ≡ fixed-nprobe_hi,
asserted bitwise.  The RaBitQ variant's certificate is a heuristic over
estimates; its pinned laws are the escalation-routing ones (converged ≡
fixed-lo rows, escalated ≡ fixed-hi rows, huge margin ≡ fixed-hi
everywhere).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from extended_rabitq_spark.operators import adaptive, ivf, rabitq
from extended_rabitq_spark.operators.ivf import select_probes

K = 5
LO, HI = 1, 3


def _planted(spark):
    """3 clusters of 40 points each (radius ≤ 1) at (0,0..), (100,0..),
    (0,100,0..) in 8-dim; queries: q0 at cluster-0 center (converges at
    nprobe_lo=1), q1 at the 0-1 midpoint (escalates)."""
    rng = np.random.default_rng(7)
    dim = 8
    centers = np.zeros((3, dim))
    centers[1, 0] = 100.0
    centers[2, 1] = 100.0
    rows = []
    for c in range(3):
        pts = rng.standard_normal((40, dim))
        pts /= np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1.0)  # radius ≤ 1
        for j, p in enumerate(pts):
            rows.append((c * 40 + j, [float(x) for x in centers[c] + p], c))
    base = spark.createDataFrame(rows, "id long, vec array<float>, label int")
    q0 = [float(x) for x in centers[0]]
    q1 = [float(x) for x in (centers[0] + centers[1]) / 2.0]
    queries = spark.createDataFrame([(0, q0), (1, q1)], "qid long, qvec array<float>")
    cents = ivf.label_centroids(base, vec="vec", label="label")
    return base, queries, cents


def _rows(df, dist_col):
    return {
        (r["qid"], r["rank"]): (r["id"], r[dist_col]) for r in df.collect()
    }


def _assert_rank_identical(a, b, tol=1e-9):
    """ids/ranks exact; distances within tol — estimate floats are only
    rank-stable across scorer batch shapes (BLAS accumulation order
    varies with matrix shape; same convention as test_rabitq)."""
    assert set(a) == set(b) and len(a) > 0
    for key, (aid, ad) in a.items():
        bid, bd = b[key]
        assert aid == bid, key
        assert abs(ad - bd) <= tol * max(1.0, abs(bd)), key


@pytest.mark.usefixtures("spark")
class TestExactAdaptive:
    def test_theorem_margin0_equals_fixed_hi_bitwise(self, spark):
        base, qs, cents = _planted(spark)
        indexed = ivf.assign_clusters(base, cents, vec="vec")
        res, stats = adaptive.ivf_search_adaptive(
            qs, indexed, cents, k=K, nprobe_lo=LO, nprobe_hi=HI,
            return_stats=True,
        )
        fixed = ivf.ivf_search(qs, indexed, cents, nprobe=HI, k=K)
        assert _rows(res, "dist") == _rows(fixed, "dist")  # bitwise (==)
        verd = {r["qid"]: r["escalate"] for r in stats.collect()}
        assert verd == {0: False, 1: True}  # forced by the geometry

    def test_all_escalate_when_no_candidates_at_lo(self, spark):
        # k bigger than any single cell's population → n_lo < k → escalate
        base, qs, cents = _planted(spark)
        indexed = ivf.assign_clusters(base, cents, vec="vec")
        res, stats = adaptive.ivf_search_adaptive(
            qs, indexed, cents, k=50, nprobe_lo=LO, nprobe_hi=HI,
            return_stats=True,
        )
        assert all(r["escalate"] for r in stats.collect())
        fixed = ivf.ivf_search(qs, indexed, cents, nprobe=HI, k=50)
        assert _rows(res, "dist") == _rows(fixed, "dist")


def _rabitq_fixture(spark):
    base, qs, cents = _planted(spark)
    idx, meta = rabitq.build_index(base.select("id", "vec"), cents, total_bits=4)
    cents_full = rabitq.centroids_with_rotation(spark, cents, meta)
    return base, qs, idx.localCheckpoint(eager=True), cents_full, meta


@pytest.mark.usefixtures("spark")
class TestRabitqAdaptive:
    def test_routing_laws(self, spark):
        base, qs, idx, cents, meta = _rabitq_fixture(spark)
        res, stats = adaptive.rabitq_search_adaptive(
            qs, idx, cents, meta, k=K, nprobe_lo=LO, nprobe_hi=HI,
            return_stats=True,
        )
        verd = {r["qid"]: r["escalate"] for r in stats.collect()}
        assert verd == {0: False, 1: True}
        got = _rows(res, "est_dist")
        # converged query ≡ fixed-lo rows; escalated ≡ fixed-hi rows —
        # both sides through the SAME injected-probes cogroup path, so
        # equality is bitwise, not rank-only
        probes_hi = select_probes(
            qs, cents.select("cluster_id", "centroid"), HI
        ).localCheckpoint(eager=True)
        fixed_lo = rabitq.rabitq_search(
            qs, idx, cents, meta, nprobe=LO, k=K,
            probes=probes_hi.where(F.col("probe_rank") <= LO),
        )
        fixed_hi = rabitq.rabitq_search(
            qs, idx, cents, meta, nprobe=HI, k=K, probes=probes_hi
        )
        lo_rows, hi_rows = _rows(fixed_lo, "est_dist"), _rows(fixed_hi, "est_dist")
        want = {
            key: (hi_rows if verd[key[0]] else lo_rows)[key] for key in got
        }
        _assert_rank_identical(got, want)
        assert {q for q, _ in got} == {0, 1}

    def test_huge_margin_equals_fixed_hi(self, spark):
        base, qs, idx, cents, meta = _rabitq_fixture(spark)
        res, stats = adaptive.rabitq_search_adaptive(
            qs, idx, cents, meta, k=K, nprobe_lo=LO, nprobe_hi=HI,
            margin=1e18, return_stats=True,
        )
        assert all(r["escalate"] for r in stats.collect())
        probes_hi = select_probes(qs, cents.select("cluster_id", "centroid"), HI)
        fixed_hi = rabitq.rabitq_search(
            qs, idx, cents, meta, nprobe=HI, k=K, probes=probes_hi
        )
        _assert_rank_identical(_rows(res, "est_dist"), _rows(fixed_hi, "est_dist"))

    def test_partition_invariance(self, spark):
        base, qs, idx, cents, meta = _rabitq_fixture(spark)
        a = adaptive.rabitq_search_adaptive(
            qs, idx, cents, meta, k=K, nprobe_lo=LO, nprobe_hi=HI
        )
        b = adaptive.rabitq_search_adaptive(
            qs.repartition(7), idx.repartition(5), cents, meta,
            k=K, nprobe_lo=LO, nprobe_hi=HI,
        )
        _assert_rank_identical(_rows(a, "est_dist"), _rows(b, "est_dist"))

    def test_stats_shape(self, spark):
        base, qs, idx, cents, meta = _rabitq_fixture(spark)
        _, stats = adaptive.rabitq_search_adaptive(
            qs, idx, cents, meta, k=K, nprobe_lo=LO, nprobe_hi=HI,
            return_stats=True,
        )
        rows = stats.collect()
        assert {r["qid"] for r in rows} == {0, 1}
        for r in rows:
            assert r["nprobe_eff"] == (HI if r["escalate"] else LO)

    def test_nprobe_order_guard(self, spark):
        base, qs, idx, cents, meta = _rabitq_fixture(spark)
        with pytest.raises(ValueError, match="must exceed"):
            adaptive.rabitq_search_adaptive(
                qs, idx, cents, meta, k=K, nprobe_lo=3, nprobe_hi=3
            )

    def test_margin_guard(self, spark):
        base, qs, idx, cents, meta = _rabitq_fixture(spark)
        for bad in (float("inf"), float("nan"), -0.5):
            with pytest.raises(ValueError, match="finite"):
                adaptive.rabitq_search_adaptive(
                    qs, idx, cents, meta, k=K, nprobe_lo=LO, nprobe_hi=HI,
                    margin=bad,
                )


@pytest.mark.usefixtures("spark")
class TestCellRadii:
    def test_codes_radii_match_exact_radii(self, spark):
        """√x2 from the index equals ‖x−c‖ computed from raw vectors
        (rotation is orthonormal, padding appends zeros)."""
        base, qs, cents = _planted(spark)
        idx, meta = rabitq.build_index(base.select("id", "vec"), cents, total_bits=4)
        indexed = ivf.assign_clusters(base, cents, vec="vec")
        from_codes = {
            r["cluster_id"]: r["radius"]
            for r in adaptive.cell_radii_from_codes(idx).collect()
        }
        exact = {
            r["cluster_id"]: r["radius"]
            for r in adaptive.cell_radii_exact(indexed, cents).collect()
        }
        assert set(from_codes) == set(exact)
        for cid, r_exact in exact.items():
            assert from_codes[cid] == pytest.approx(r_exact, rel=1e-9, abs=1e-9)
