"""Product quantization (PQ) codec + ADC search (beyond-reference).

The OTHER major ANN quantization family next to the reference's RaBitQ
(FAISS ``IndexPQ`` / Jégou et al. 2011): split each D-dim vector into
``m`` contiguous subspaces of ``D/m`` dims, quantize every subvector to
its nearest per-subspace codeword, store only the ``m`` small codes
(``m·log2(ksub)`` bits/vector vs ``32·D``), and search by asymmetric
distance (ADC): the query stays exact, the base side is reconstructed
from codewords.

Spark-first shapes:

- **Encode** is the per-subspace argmin join: subvectors exploded in ONE
  generator projection, codebooks broadcast, a (id, sub_id) rank window
  picks the nearest codeword (ties → smaller code).  Cost is the
  standard ``N·m·ksub`` distance evaluations, all inside codegen.
- **Decode** reassembles the codeword approximation by folding the ``m``
  codewords back in subspace order (``array_sort`` on (sub_id, ·) then
  ``flatten``) — deterministic element order, so distances over decoded
  vectors fold bitwise like every other kernel.
- **ADC distance** = one ``l2sq(qvec, decoded)`` — mathematically equal
  to the per-subspace LUT sum (the FAISS formulation) but expressed as
  the SAME left-to-right fold the DuckDB oracle replicates, avoiding a
  cross-engine float-sum-order hazard a SUM-over-subspaces would have.
- **Search** is estimate → overfetch → exact re-rank on the broadcast
  shortlist (the E1→E3 pipeline shape shared with ``knn_int8_rerank``).

Codebooks: :func:`train_pq_codebooks` runs seeded per-subspace Lloyd's
(the production path, pytest-verified); the registered query uses
label-mean codebooks (`ivf.label_centroids` sliced per subspace) — the
same deterministic stand-in the IVF oracles use, which makes the whole
PQ pipeline expressible as a bitwise DuckDB oracle.

At 100 TB: codes are 64× smaller than fp32 vectors (m=4, ksub≤256 over
D=64), so the estimate scan reads ~1.5% of the bytes; encode is one
broadcast join + rank window per shard (embarrassingly parallel, no
shuffle of vector payloads); the fp32 column is touched only by the
rank-bounded rerank shortlist join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vector as V


def _sub_explode(df: DataFrame, vec: str, m: int, dsub: int, out: str) -> DataFrame:
    """Explode a vector column into (…, sub_id INT, <out> ARRAY) — one
    generator projection, slices taken from the materialized column."""
    return df.withColumn(
        "_sub",
        F.expr(
            f"explode(transform(sequence(0, {m - 1}), "
            f"j -> struct(CAST(j AS INT) AS sub_id, "
            f"slice({vec}, j * {dsub} + 1, {dsub}) AS sv)))"
        ),
    ).select(*[c for c in df.columns], F.col("_sub.sub_id").alias("sub_id"), F.col("_sub.sv").alias(out))


def subspace_codebooks(centroids: DataFrame, m: int, dsub: int) -> DataFrame:
    """Slice full-D centroids → (sub_id INT, code INT, cw ARRAY<DOUBLE>).

    Any (cluster_id, centroid) frame works: label means (the oracle
    twin) or k-means output (production)."""
    return _sub_explode(
        centroids.select(F.col("cluster_id").alias("code"), "centroid"),
        "centroid", m, dsub, "cw",
    ).select("sub_id", "code", "cw")


def pq_encode(base: DataFrame, codebooks: DataFrame, m: int, dsub: int) -> DataFrame:
    """Encode → (id, sub_id, code): nearest codeword per subspace (ties →
    smaller code).  Codebooks broadcast; everything else map-side until
    the per-(id, sub_id) rank window."""
    subs = _sub_explode(base.select("id", "vec"), "vec", m, dsub, "sv").select(
        "id", "sub_id", "sv"
    )
    w = Window.partitionBy("id", "sub_id").orderBy(
        F.col("sdist").asc(), F.col("code").asc()
    )
    return (
        subs.join(F.broadcast(codebooks), "sub_id")
        .withColumn("sdist", F.expr(V.l2sq("sv", "cw")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("id", "sub_id", "code")
    )


def pq_decode(codes: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Reconstruct → (id, dvec ARRAY<DOUBLE>): codewords joined back and
    reassembled in subspace order (deterministic element order)."""
    return (
        codes.join(F.broadcast(codebooks), ["sub_id", "code"])
        .groupBy("id")
        .agg(F.array_sort(F.collect_list(F.struct("sub_id", "cw"))).alias("scw"))
        .select("id", F.expr("flatten(transform(scw, x -> x.cw))").alias("dvec"))
    )


def pq_adc_knn(
    queries: DataFrame,
    base: DataFrame,
    codebooks: DataFrame,
    m: int,
    dsub: int,
    coarse_k: int = 50,
    k: int = 10,
) -> DataFrame:
    """PQ-ADC search → (qid, rank, id, dist): estimate on decoded
    codewords, exact fp32 re-rank on the broadcast shortlist."""
    decoded = pq_decode(pq_encode(base, codebooks, m, dsub), codebooks)
    wc = Window.partitionBy("qid").orderBy(F.col("dist_q").asc(), F.col("id").asc())
    cand = (
        decoded.crossJoin(F.broadcast(queries))
        .select("qid", "id", "qvec", F.expr(V.l2sq("qvec", "dvec")).alias("dist_q"))
        .withColumn("crank", F.row_number().over(wc).cast("bigint"))
        .where(F.col("crank") <= coarse_k)
    )
    wf = Window.partitionBy("qid").orderBy(F.col("dist").asc(), F.col("id").asc())
    out = (
        base.join(F.broadcast(cand.select("qid", "id", "qvec")), "id")
        .select("qid", "id", F.expr(V.l2sq("qvec", "vec")).alias("dist"))
        .withColumn("rank", F.row_number().over(wf).cast("bigint"))
    )
    return out.where(F.col("rank") <= k).select("qid", "rank", "id", "dist")


def train_pq_codebooks(
    base: DataFrame,
    m: int,
    ksub: int,
    vec: str = "vec",
    sample_size: int = 25_000,
    iters: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Production codebooks: seeded per-subspace Lloyd's on a driver-side
    sample (the `sampled_kmeans_centroids` recipe, once per subspace) →
    (sub_id, code, cw).  Deterministic for a fixed (seed, sample_size);
    at 100 TB the sample is the standard PQ training protocol (FAISS
    trains on ≤ a few 100k vectors regardless of corpus size)."""
    import numpy as np

    d = len(base.select(vec).first()[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    n = base.count()
    take = min(sample_size, n)
    sample = np.array(
        [r[0] for r in base.select(vec).orderBy(F.xxhash64(vec)).limit(take).collect()],
        dtype=np.float64,
    )
    rows = []
    for j in range(m):
        X = sample[:, j * dsub : (j + 1) * dsub]
        rng = np.random.default_rng(seed + j)
        cents = X[rng.choice(len(X), size=min(ksub, len(X)), replace=False)]
        for _ in range(iters):
            d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for c in range(len(cents)):
                mask = a == c
                if mask.any():
                    cents[c] = X[mask].mean(0)
        rows.extend(
            (j, c, [float(x) for x in cents[c]]) for c in range(len(cents))
        )
    return base.sparkSession.createDataFrame(
        rows, "sub_id INT, code INT, cw ARRAY<DOUBLE>"
    )
