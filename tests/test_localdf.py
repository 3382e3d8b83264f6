"""local_rows_df (r11): LocalRelation-backed tiny driver tables must be
value- and schema-identical to the parallelize route — bitwise on
doubles — and actually plan as LocalRelation (job-free collects)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from extended_rabitq_spark.localdf import local_rows_df

SCHEMA = "cluster_id int, centroid array<double>"


def _rows(n, dim, seed=7):
    rng = np.random.default_rng(seed)
    # mix magnitudes so float64 exactness is actually exercised
    scales = rng.choice([1e-17, 1e-9, 1.0, 1e9, 1e17], size=(n, dim))
    return [
        (int(i), [float(x) for x in rng.standard_normal(dim) * scales[i]])
        for i in range(n)
    ]


class TestLocalRowsDf:
    def test_bitwise_equals_parallelize_route(self, spark):
        rows = _rows(16, 64)
        a = local_rows_df(spark, rows, SCHEMA)
        b = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), SCHEMA)
        ra = sorted((r[0], tuple(r[1])) for r in a.collect())
        rb = sorted((r[0], tuple(r[1])) for r in b.collect())
        assert ra == rb  # tuple equality on floats == bitwise for non-NaN
        assert a.schema == b.schema

    def test_plans_as_local_relation(self, spark):
        df = local_rows_df(spark, _rows(4, 8), SCHEMA)
        plan = df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()
        assert plan == "LocalRelation"

    def test_specials_and_strings(self, spark):
        rows = [
            (1, [float("inf"), float("-inf"), 0.0, -0.0]),
            (2, [float("nan"), 1.5e-300, 1.7976931348623157e308, 5e-324]),
        ]
        got = {r[0]: r[1] for r in local_rows_df(spark, rows, SCHEMA).collect()}
        assert got[1] == [float("inf"), float("-inf"), 0.0, -0.0]
        # pandas NaN-as-missing: NaN arrives as NULL (documented caveat —
        # no production caller ships NaN in a local table)
        assert got[2][0] is None
        assert got[2][1:] == rows[1][1][1:]
        s = local_rows_df(
            spark, [("a'b\\c", 3)], "name string, n long"
        ).collect()[0]
        assert (s["name"], s["n"]) == ("a'b\\c", 3)

    def test_empty(self, spark):
        df = local_rows_df(spark, [], SCHEMA)
        assert df.count() == 0 and len(df.columns) == 2
