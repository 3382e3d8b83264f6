"""DSIR importance resampling (operators/dsir.py) + SemDeDup
(operators/semdedup.py) semantics on planted corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from extended_rabitq_spark.operators import dsir, semdedup as sd


def _planted_docs(spark):
    """60 docs: 20 'target-like' (share the rare token 'zyxw'), 40 filler.
    Target subset = the first 10 target-like docs (source='tgt')."""
    rows = []
    for i in range(20):
        src = "tgt" if i < 10 else "pool"
        rows.append((i, f"alpha beta zyxw gamma delta zyxw epsilon {i}", "en", src, 40))
    for i in range(20, 60):
        rows.append((i, f"lorem ipsum dolor sit amet consectetur {i}", "en", "pool", 40))
    return spark.createDataFrame(
        rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )


class TestDSIR:
    def test_target_like_docs_selected_first(self, spark):
        docs = _planted_docs(spark)
        sel = dsir.dsir_select(docs, target_pred="source = 'tgt'", n_select=20)
        picked = {r.doc_id for r in sel.collect()}
        # The 10 pool docs sharing the target's rare-token signature must
        # all be selected ahead of generic filler.
        assert set(range(10, 20)) <= picked
        # Filler can only fill the remaining slots.
        assert len(picked & set(range(20, 60))) <= 10

    def test_weights_integer_and_deterministic(self, spark):
        docs = _planted_docs(spark)
        a = sorted(map(tuple, dsir.dsir_select(docs, "source = 'tgt'", 15).collect()))
        b = sorted(
            map(
                tuple,
                dsir.dsir_select(docs.repartition(7), "source = 'tgt'", 15).collect(),
            )
        )
        assert a == b
        assert all(isinstance(t[1], int) for t in a)  # BIGINT scores

    def test_rank_dense_and_bounded(self, spark):
        docs = _planted_docs(spark)
        rows = dsir.dsir_select(docs, "source = 'tgt'", 12).collect()
        assert sorted(r.rank for r in rows) == list(range(1, 13))


class TestSemDeDup:
    def test_min_id_survives_exact_dups(self, spark):
        # Two clusters; ids 1/2/3 are identical vectors (one group),
        # id 4 is a lone vector in the other cluster.
        vecs = spark.createDataFrame(
            [
                (1, [1.0, 0.0, 0.0]),
                (2, [1.0, 0.0, 0.0]),
                (3, [1.0, 0.0, 0.0]),
                (4, [0.0, 1.0, 0.0]),
            ],
            "id BIGINT, vec ARRAY<DOUBLE>",
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
            "cluster_id INT, centroid ARRAY<DOUBLE>",
        )
        got = {r.id: r.is_dup for r in sd.semdedup(vecs, cents, tau=0.99).collect()}
        assert got == {1: False, 2: True, 3: True, 4: False}

    def test_cross_cluster_pairs_never_compared(self, spark):
        # Identical vectors that land in DIFFERENT clusters are not
        # compared (the SemDeDup contract: scope = cluster).
        vecs = spark.createDataFrame(
            [(1, [1.0, 0.05, 0.0]), (2, [0.05, 1.0, 0.0])],
            "id BIGINT, vec ARRAY<DOUBLE>",
        )
        cents = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0])],
            "cluster_id INT, centroid ARRAY<DOUBLE>",
        )
        got = {r.id: r.is_dup for r in sd.semdedup(vecs, cents, tau=0.0).collect()}
        assert got == {1: False, 2: False}

    def test_deterministic_across_partitioning(self, spark):
        from conftest import SF_SMOKE

        from extended_rabitq_spark.operators import ivf as ivf_ops

        emb = spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").where(
            F.col("vec_id") >= 10
        )
        cents = ivf_ops.label_centroids(emb).select("cluster_id", "centroid")
        vecs = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        a = sorted(map(tuple, sd.semdedup(vecs, cents, tau=0.925).collect()))
        b = sorted(
            map(tuple, sd.semdedup(vecs.repartition(9), cents, tau=0.925).collect())
        )
        assert a == b


class TestWeightedSampleAES:
    def test_huge_weight_always_wins(self, spark):
        from extended_rabitq_spark.operators import sampling

        rows = [(i, "x", "en", "s", 10) for i in range(100)] + [(999, "x", "en", "s", 10**9)]
        docs = spark.createDataFrame(
            rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
        )
        sel = sampling.weighted_sample_aes(docs, k=5)
        got = {r.doc_id: r.rank for r in sel.collect()}
        assert got[999] == 1  # key = -ln(u)/1e9 ~ 0 beats every unit weight

    def test_zero_weight_excluded_and_deterministic(self, spark):
        from extended_rabitq_spark.operators import sampling

        rows = [(i, "x", "en", "s", i % 7) for i in range(50)]
        docs = spark.createDataFrame(
            rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
        )
        a = sorted(map(tuple, sampling.weighted_sample_aes(docs, k=10).collect()))
        b = sorted(map(tuple, sampling.weighted_sample_aes(docs.repartition(5), k=10).collect()))
        assert a == b
        zero_ids = {i for i in range(50) if i % 7 == 0}
        assert not ({t[0] for t in a} & zero_ids)

    def test_longer_docs_overrepresented(self, spark):
        """Inclusion frequency must increase with weight: split 200 docs
        into weight-1 and weight-20 halves; the heavy half should take
        a clear majority of a k=60 sample."""
        from extended_rabitq_spark.operators import sampling

        rows = [(i, "x", "en", "s", 1 if i < 100 else 20) for i in range(200)]
        docs = spark.createDataFrame(
            rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
        )
        sel = [r.doc_id for r in sampling.weighted_sample_aes(docs, k=60).collect()]
        heavy = sum(1 for i in sel if i >= 100)
        assert heavy > 40


class TestZOrder:
    def test_matches_python_interleave(self, spark):
        from extended_rabitq_spark.operators import zorder as Z

        rows = [(i, (i * 37) % 1000, (i * 101) % 50000) for i in range(300)]
        df = spark.createDataFrame(rows, "id BIGINT, a BIGINT, b BIGINT")
        got = {r.id: r.zkey for r in df.select(
            "id", __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
                Z.zorder_key_expr(["a", "b"], bits=21)).alias("zkey")).collect()}

        def morton(a, b, bits=21):
            out = 0
            for i in range(bits):
                out |= ((a >> i) & 1) << (2 * i)
                out |= ((b >> i) & 1) << (2 * i + 1)
            return out

        for i, a, b in rows:
            assert got[i] == morton(a, b), (i, a, b)

    def test_bits_overflow_guard(self, spark):
        import pytest

        from extended_rabitq_spark.operators import zorder as Z

        with pytest.raises(ValueError, match="BIGINT"):
            Z.zorder_key_expr(["a", "b", "c"], bits=22)
        with pytest.raises(ValueError, match="at least one"):
            Z.zorder_key_expr([], bits=8)

    def test_layout_sorted_within_partitions(self, spark):
        from extended_rabitq_spark.operators import zorder as Z

        rows = [(i, (i * 37) % 1000, (i * 101) % 50000) for i in range(500)]
        df = spark.createDataFrame(rows, "id BIGINT, a BIGINT, b BIGINT")
        out = Z.zorder_layout(df, ["a", "b"], bits=21)
        ok = out.rdd.mapPartitions(
            lambda it: [all(x <= y for x, y in zip(ks, ks[1:]))
                        for ks in [[r["zkey"] for r in it]]]
        ).collect()
        assert all(ok)


class TestSCD2:
    def test_planted_stream_intervals(self, spark):
        import datetime as dt

        from extended_rabitq_spark.queries.events import events_scd2_intervals_q  # noqa: F401
        from pyspark.sql import Window

        # Reuse the registered query's logic via a direct mini-frame
        base = dt.datetime(2024, 1, 1)
        rows = [
            (1, base + dt.timedelta(minutes=m), 7, t, 0.0, "{}")
            for m, (t,) in enumerate([("A",), ("A",), ("B",), ("A",)])
        ]
        ev = spark.createDataFrame(
            rows, "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"
        )
        w = Window.partitionBy("user_id").orderBy(F.col("us").asc(), F.col("event_id").asc())
        sel = ev.select("user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id")
        ch = sel.withColumn("prev", F.lag("event_type").over(w)).where(
            F.col("prev").isNull() | (F.col("prev") != F.col("event_type"))
        )
        iv = ch.select(
            "user_id", F.col("event_type").alias("state"), F.col("us").alias("f"),
            F.lead("us").over(w).alias("t"),
        ).orderBy("f").collect()
        assert [r.state for r in iv] == ["A", "B", "A"]
        # consecutive same-state events merged; intervals contiguous
        assert iv[0].t == iv[1].f and iv[1].t == iv[2].f
        assert iv[2].t is None  # current/open

    def test_registered_query_contiguity(self, spark):
        from conftest import SF_SMOKE

        import __spark_entry__ as e

        rows = e.queries()["events_scd2_intervals"](spark, SF_SMOKE).collect()
        by_user = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        MAX = 9223372036854775807
        for uid, ivs in by_user.items():
            ivs.sort(key=lambda r: r.valid_from_us)
            assert sum(1 for r in ivs if r.is_current) == 1
            assert ivs[-1].valid_to_us == MAX and ivs[-1].is_current
            for a, b in zip(ivs, ivs[1:]):
                assert a.valid_to_us == b.valid_from_us  # no gaps/overlaps
                # consecutive intervals never share a state (else merged)
                assert a.state != b.state


class TestZOrderGuard:
    def test_out_of_budget_value_raises(self, spark):
        import pytest

        from extended_rabitq_spark.operators import zorder as Z

        df = spark.createDataFrame([(1, 5, 1 << 22)], "id BIGINT, a BIGINT, b BIGINT")
        with pytest.raises(Exception, match="zorder"):
            df.select(F.expr(Z.zorder_key_expr(["a", "b"], bits=21)).alias("z")).collect()

    def test_check_false_allows_wrap(self, spark):
        from extended_rabitq_spark.operators import zorder as Z

        df = spark.createDataFrame([(1, 5, 1 << 22)], "id BIGINT, a BIGINT, b BIGINT")
        row = df.select(
            F.expr(Z.zorder_key_expr(["a", "b"], bits=21, check=False)).alias("z")
        ).first()
        assert row.z is not None


class TestAESResolution:
    def test_large_weights_keep_distinct_keys(self, spark):
        """The review's collapse case: n_chars ~1e5-1e7 must still give
        (near-)distinct keys, preserving weight-proportional order."""
        from extended_rabitq_spark.operators import sampling

        rows = [(i, "x", "en", "s", 100_000 + i * 97_000) for i in range(200)]
        docs = spark.createDataFrame(
            rows, "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
        )
        sel = sampling.weighted_sample_aes(docs, k=100).collect()
        keys = [r.key_fix for r in sel]
        assert len(set(keys)) >= 95  # no mass ties -> no doc_id-order bias
