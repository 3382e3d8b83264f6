"""Iterative graph centrality — fixed-point weighted PageRank.

Crawl-derived training corpora rank pages/hosts by link importance
before sampling (the Common-Crawl curation step); event analytics ranks
states of a user-journey graph the same way.  Both need PageRank-style
iterative mass propagation — an operator family Spark has no built-in
for and the reference engine (a vector-search stack) lacks entirely.

Spark-first shape: each iteration is ONE equi-join (edge.src →
current score) + ONE groupBy-sum on dst + a left join back onto the
node table — all shuffles keyed on the node id, so AQE reuses the same
hash partitioning across rounds.  The frontier is ``localCheckpoint``ed
per round (the ``connected_components`` lesson: without it lineage
grows linearly and every action replays the whole history).  At 100 TB
the edge table is the big side and scores are small-per-node — the
join shape stays a shuffle-hash join on ``src``; rounds are fixed
(``iters``), not convergence-polled, so the job graph is static.

Everything is 64-bit FIXED-POINT integer arithmetic so the DuckDB
oracle (an unrolled CTE chain with the textually identical update
formula) is bitwise:

* scores start at ``SCALE`` (1e9 micro-units; unnormalized PageRank —
  totals sum to ~n·SCALE, a constant factor that cancels in ranking);
* an edge carries ``contrib = (score_src · weight) div out_w_src``
  (exact integer; requires ``max_score · max_weight < 2^63``, and a
  score can absorb up to the whole graph's mass ≈ n · SCALE — so the
  safe bound is ``max_weight < 2^63 / (n · SCALE)``: ~9e6 at
  SCALE=1e9 with n = 1e3 nodes.  Callers with heavier edge weights or
  bigger node sets lower SCALE accordingly);
* the update is ``new = (15 · SCALE) div 100 + (85 · Σcontrib) div
  100`` — damping 0.85 as an exact integer ratio, and the Σ is an
  integer sum (order-independent, no float-reduction hazard).

Dangling nodes (no out-edges) leak their mass — the simple standard
variant; the alternative (redistribute uniformly) adds a per-round
global sum.  Documented, matched exactly by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..staging import stage_eager as _stage_eager, stage_lazy as _stage_lazy

SCALE = 1_000_000_000
_BASE = 15 * SCALE // 100  # (1 - d) · SCALE with d = 0.85, exact


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """→ (node, score_fix): weighted PageRank after ``iters`` exact
    fixed-point iterations over ``edges(src, dst, weight BIGINT)``.
    Nodes = every id appearing as src or dst.  ``score_fix`` is in
    SCALE micro-units; ranking/normalization is the caller's choice."""
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    # Both static frames joined every round — the annotated edge table
    # and the node list — are persisted ONCE; without this each round's
    # eager checkpoint would re-execute the whole upstream edge pipeline
    # (review r6: 5 rounds = 5 full re-reads of the input).
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    nodes.count()
    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    ew = e.join(out_w, on="src").persist()
    ew.count()
    scores = nodes.select("node", F.lit(SCALE).cast("long").alias("score_fix"))
    try:
        for _ in range(iters):
            inc = (
                ew.join(
                    scores.withColumnRenamed("node", "src"), on="src"
                )
                .select(
                    "dst",
                    F.expr("(score_fix * w) div out_w").alias("contrib"),
                )
                .groupBy("dst")
                .agg(F.sum("contrib").alias("inc"))
            )
            prev = scores
            scores = (
                nodes.join(inc.withColumnRenamed("dst", "node"), on="node", how="left")
                .select(
                    "node",
                    F.expr(
                        f"CAST({_BASE} + (85 * coalesce(inc, 0)) div 100 AS BIGINT)"
                    ).alias("score_fix"),
                )
                .transform(_stage_eager)
            )
            # bound storage: only the newest frame lives (the
            # connected_components convention)
            prev.unpersist()
    finally:
        ew.unpersist()
        nodes.unpersist()
    return scores


def d_pagerank(edges_sql: str, iters: int = 5) -> str:
    """DuckDB oracle: the same update unrolled as a CTE chain.
    ``edges_sql`` yields (src, dst, w BIGINT)."""
    ctes = [
        f"e AS ({edges_sql})",
        "nodes AS (SELECT DISTINCT node FROM (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))",
        "ew AS (SELECT e.src, e.dst, e.w, o.out_w FROM e JOIN "
        "(SELECT src, sum(w) AS out_w FROM e GROUP BY src) o ON e.src = o.src)",
        f"s0 AS (SELECT node, CAST({SCALE} AS BIGINT) AS score_fix FROM nodes)",
    ]
    for i in range(iters):
        ctes.append(
            f"i{i} AS (SELECT dst, sum((score_fix * w) // out_w) AS inc "
            f"FROM ew JOIN s{i} ON ew.src = s{i}.node GROUP BY dst)"
        )
        ctes.append(
            f"s{i + 1} AS (SELECT n.node, "
            f"CAST({_BASE} + (85 * coalesce(i{i}.inc, 0)) // 100 AS BIGINT) AS score_fix "
            f"FROM nodes n LEFT JOIN i{i} ON i{i}.dst = n.node)"
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT node, score_fix FROM s{iters}"
