"""Named SQL vector functions (SURVEY §2.10): bitwise parity with the
DataFrame expression path, Catalyst inlining (no UDF call node), and
registration through the session factory."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from extended_rabitq_spark.functions import sqlfuncs
from extended_rabitq_spark.functions import vector as V


@pytest.fixture(scope="module")
def sqlf(spark):
    names = sqlfuncs.register_sql_functions(spark)
    # fixture vectors as a temp view for spark.sql access
    rng = np.random.default_rng(9)
    rows = [
        (i, [float(x) for x in rng.standard_normal(8)],
         [float(x) for x in rng.standard_normal(8)])
        for i in range(50)
    ] + [(50, [0.0] * 8, [1.0] * 8)]  # zero vector: l2_normalize fallback
    spark.createDataFrame(
        rows, "id long, a array<float>, b array<float>"
    ).createOrReplaceTempView("vecs")
    return names


class TestSqlFunctions:
    def test_bitwise_parity_with_dataframe_exprs(self, spark, sqlf):
        """Each named function must produce the exact bits of the raw
        expression it was generated from (same fold order)."""
        pairs = {
            "l2sq(a, b)": V.l2sq("a", "b"),
            "dot_ip(a, b)": V.dot("a", "b"),
            "ip_dist(a, b)": f"-({V.dot('a', 'b')})",
            "cosine_sim(a, b)": V.cosine_sim("a", "b"),
            "cosine_dist(a, b)": f"1.0 - ({V.cosine_sim('a', 'b')})",
            "vec_norm(a)": V.norm("a"),
            "vec_sum(a)": V.vec_sum("a"),
            "popcount_bits(a)": V.popcount("a"),
        }
        # id=50 is the all-zero vector: cosine divides by ‖a‖=0 and ANSI
        # mode raises (identically on both paths) — the zero-vector
        # contract belongs to l2_normalize's fallback, tested below.
        for fn_call, raw in pairs.items():
            got = spark.sql(
                f"SELECT id, {fn_call} AS v FROM vecs WHERE id < 50 ORDER BY id"
            ).collect()
            exp = spark.sql(
                f"SELECT id, {raw} AS v FROM vecs WHERE id < 50 ORDER BY id"
            ).collect()
            for g, x in zip(got, exp):
                assert repr(g.v) == repr(x.v), (fn_call, g.id)

    def test_l2_normalize_and_zero_fallback(self, spark, sqlf):
        rows = spark.sql(
            "SELECT id, l2_normalize(a) AS n FROM vecs WHERE id IN (0, 50) ORDER BY id"
        ).collect()
        n0 = np.array(rows[0].n)
        assert abs(np.linalg.norm(n0) - 1.0) < 1e-12
        # zero vector → the reference's constant 1/√D fallback
        assert rows[1].n == pytest.approx([1 / np.sqrt(8)] * 8)

    def test_catalyst_inlines_no_udf_node(self, spark, sqlf):
        plan = (
            spark.sql("SELECT l2sq(a, b) AS d FROM vecs WHERE l2sq(a, b) < 100")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "aggregate(zip_with" in plan  # body inlined as expressions
        for bad in ("UDF", "InPandas", "BatchEvalPython"):
            assert bad not in plan

    def test_session_factory_registers(self):
        """get_spark sessions expose the functions without extra setup.
        (The shared test session was built by get_spark — catalog lookup
        must resolve every name.)"""
        from extended_rabitq_spark.session import get_spark

        spark = get_spark("sqlfuncs-check", cpus=2)
        (row,) = spark.sql(
            "SELECT l2sq(array(3.0F), array(0.0F)) AS d, "
            "cosine_dist(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c"
        ).collect()
        assert row.d == 9.0 and abs(row.c) < 1e-15


class TestUnrolledKernels:
    """r10: dim-specialized unrolled distance kernels must be BITWISE
    equal to the higher-order-function forms — same IEEE additions in
    the same left-to-right order, just codegen'd instead of interpreted
    (functions.vector._unrolled_fold)."""

    @pytest.mark.parametrize("build", ["l2sq", "dot", "l2sq_self", "cosine_sim"])
    def test_bitwise_equals_hof(self, spark, sqlf, build):
        if build == "l2sq_self":
            hof, unr = V.l2sq_self("a"), V.l2sq_self("a", 8)
        elif build == "l2sq":
            hof, unr = V.l2sq("a", "b"), V.l2sq("a", "b", 8)
        elif build == "dot":
            hof, unr = V.dot("a", "b"), V.dot("a", "b", 8)
        else:
            hof, unr = V.cosine_sim("a", "b"), V.cosine_sim("a", "b", 8)
        t = spark.table("vecs")
        if build == "cosine_sim":
            # the fixture's zero vector is for the l2_normalize fallback
            # test; cosine on it divides by zero (ANSI) in BOTH forms
            t = t.where("id < 50")
        # Null-SAFE inequality (ADVICE r10): plain != is NULL-propagating,
        # so a row where one form returns NULL and the other a value
        # would yield NULL, be dropped by .where, and hide exactly the
        # divergence class (short/NULL arrays) the unrolled kernels
        # could introduce.  NOT (x <=> y) counts NULL-vs-value as unequal.
        ne = (
            t.select(F.expr(f"NOT (({hof}) <=> ({unr}))").alias("ne"))
            .where("ne")
            .count()
        )
        assert ne == 0

    def test_null_and_short_arrays_propagate_null(self, spark, sqlf):
        df = spark.createDataFrame(
            [(0, None, [1.0] * 8), (1, [1.0] * 4, [1.0] * 8)],
            "id long, a array<float>, b array<float>",
        )
        rows = df.select(
            F.expr(V.l2sq("a", "b", 8)).alias("u"),
            F.expr(V.l2sq("a", "b")).alias("h"),
        ).collect()
        for r in rows:
            assert r["u"] is None and r["h"] is None
