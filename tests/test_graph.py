"""Fixed-point PageRank: reference parity, structure, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from extended_rabitq_spark.operators import graph


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, weight long")


def _numpy_reference(edge_rows, iters=5):
    """Independent driver-side re-implementation of the SAME integer
    arithmetic (dict-based, no Spark) — pins the distributed result."""
    out_w: dict[str, int] = {}
    for s, _, w in edge_rows:
        out_w[s] = out_w.get(s, 0) + w
    nodes = sorted({s for s, _, _ in edge_rows} | {d for _, d, _ in edge_rows})
    score = {n: graph.SCALE for n in nodes}
    base = 15 * graph.SCALE // 100
    for _ in range(iters):
        inc: dict[str, int] = {}
        for s, d, w in edge_rows:
            inc[d] = inc.get(d, 0) + (score[s] * w) // out_w[s]
        score = {n: base + (85 * inc.get(n, 0)) // 100 for n in nodes}
    return score


class TestPageRank:
    ROWS = [
        ("a", "b", 3), ("a", "c", 1), ("b", "c", 2), ("c", "a", 1),
        ("d", "a", 5), ("b", "d", 1), ("e", "a", 2),  # e: no in-edges
    ]

    def test_matches_independent_reference(self, spark):
        got = {
            r["node"]: r["score_fix"]
            for r in graph.pagerank(_edges(spark, self.ROWS)).collect()
        }
        assert got == _numpy_reference(self.ROWS)

    def test_no_inlinks_gets_base_only(self, spark):
        got = {
            r["node"]: r["score_fix"]
            for r in graph.pagerank(_edges(spark, self.ROWS)).collect()
        }
        assert got["e"] == 15 * graph.SCALE // 100

    def test_hub_outranks_spokes(self, spark):
        # star: every spoke points at the hub
        rows = [(f"s{i}", "hub", 1) for i in range(8)]
        got = {
            r["node"]: r["score_fix"]
            for r in graph.pagerank(_edges(spark, rows)).collect()
        }
        assert all(got["hub"] > got[f"s{i}"] for i in range(8))

    def test_weight_sensitivity(self, spark):
        # b receives 9x the weight c does from the same source
        rows = [("a", "b", 9), ("a", "c", 1)]
        got = {
            r["node"]: r["score_fix"]
            for r in graph.pagerank(_edges(spark, rows)).collect()
        }
        assert got["b"] > got["c"]

    def test_partitioning_invariant(self, spark):
        e = _edges(spark, self.ROWS)
        one = sorted(map(tuple, graph.pagerank(e.coalesce(1)).collect()))
        many = sorted(map(tuple, graph.pagerank(e.repartition(7)).collect()))
        assert one == many

    def test_symmetric_cycle_is_uniform(self, spark):
        rows = [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)]
        scores = {
            r["node"]: r["score_fix"]
            for r in graph.pagerank(_edges(spark, rows)).collect()
        }
        assert len(set(scores.values())) == 1  # perfect symmetry

    def test_iters_zero_is_init(self, spark):
        got = graph.pagerank(_edges(spark, self.ROWS), iters=0).collect()
        assert {r["score_fix"] for r in got} == {graph.SCALE}


class TestEntityResolutionContract:
    def test_canonical_and_sizes(self, spark):
        from extended_rabitq_spark.registry import QUERIES

        df = QUERIES["entity_resolution"](spark, "/root/testdata/sf0.001").collect()
        by_entity: dict[int, list] = {}
        for r in df:
            by_entity.setdefault(r["entity_id"], []).append(r)
        for eid, members in by_entity.items():
            ids = [m["part_id"] for m in members]
            assert min(ids) == eid  # canonical = min member id
            assert all(m["entity_size"] == len(members) for m in members)
            assert sum(m["is_canonical"] for m in members) == 1
        # every slice row present exactly once
        n = spark.read.parquet("/root/testdata/sf0.001/part.parquet").where(
            F.col("p_partkey") < 400
        ).count()
        assert len(df) == n
