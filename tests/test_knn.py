"""Direct equality of exact_knn (declarative) vs exact_knn_combined
(map-side partial top-k) — the claim cited by knn.py / harness.py /
queries/ann.py docstrings, including the tie fixture that exercises the
at-or-below-k-th candidate selection (duplicate vectors ⇒ >k rows tied
at the boundary inside one partition)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from extended_rabitq_spark.operators import knn


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _collect_sorted(df):
    return [tuple(r) for r in df.orderBy("qid", "rank").collect()]


@pytest.mark.parametrize("metric", ["l2", "ip", "cosine"])
def test_combined_equals_declarative(spark, metric):
    rng = np.random.default_rng(7)
    base = _df(
        spark,
        [(int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(200)],
        "id long, vec array<float>",
    ).repartition(4)
    queries = _df(
        spark,
        [(int(i), [float(x) for x in rng.standard_normal(8)]) for i in range(7)],
        "qid long, qvec array<float>",
    )
    a = _collect_sorted(knn.exact_knn(queries, base, k=9, metric=metric))
    b = _collect_sorted(knn.exact_knn_combined(queries, base, k=9, metric=metric))
    assert a == b  # bit-identical: same candidates, same declarative distance


def test_combined_ties_duplicate_vectors(spark):
    """>k duplicate vectors in ONE partition: exactly-k argpartition used to
    drop an id the (dist, id) order keeps; the at-or-below-k-th selection
    must not."""
    v = [1.0, 2.0, 3.0, 4.0]
    # 30 identical vectors (ids 0..29) + some distinct ones, single partition
    rows = [(int(i), v) for i in range(30)]
    rows += [(int(100 + i), [float(x + i + 1) for x in v]) for i in range(5)]
    base = _df(spark, rows, "id long, vec array<float>").coalesce(1)
    queries = _df(spark, [(0, v)], "qid long, qvec array<float>")
    k = 10
    a = _collect_sorted(knn.exact_knn(queries, base, k=k))
    b = _collect_sorted(knn.exact_knn_combined(queries, base, k=k))
    assert a == b
    # the winners under (dist, id) are exactly ids 0..9 at dist 0
    assert [r[2] for r in b] == list(range(k))
    assert all(r[3] == 0.0 for r in b)


def test_combined_ties_across_partitions(spark):
    """Ties split across partitions + k larger than any single partition's
    tie group — the global window must still finish exactly."""
    v = [0.5, -1.5, 2.5]
    rows = [(int(i), v) for i in range(40)]
    base = _df(spark, rows, "id long, vec array<float>").repartition(8)
    queries = _df(spark, [(1, v), (2, [float(x) for x in np.array(v) + 0.25])],
                  "qid long, qvec array<float>")
    a = _collect_sorted(knn.exact_knn(queries, base, k=15))
    b = _collect_sorted(knn.exact_knn_combined(queries, base, k=15))
    assert a == b
