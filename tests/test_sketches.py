"""HyperLogLog sketch: accuracy, merge law, determinism, guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from extended_rabitq_spark.operators import sketches


def _values(spark, n, group="g", offset=0):
    """n distinct string values in one group."""
    return spark.range(n).select(
        F.lit(group).alias("grp"),
        F.concat(F.lit("val-"), (F.col("id") + offset).cast("string")).alias("v"),
    )


class TestHLLAccuracy:
    @pytest.mark.parametrize("n", [300, 5_000, 40_000])
    def test_estimate_within_5_sigma(self, spark, n):
        # m = 256 -> relative std ~ 1.04/sqrt(256) = 6.5%; 5 sigma = 32.5%
        est = sketches.hll_distinct(_values(spark, n), ["grp"], "v", p=8).collect()
        assert len(est) == 1
        got = est[0]["n_est"]
        assert abs(got - n) / n < 0.325, f"n={n} est={got}"

    def test_multi_group_independent(self, spark):
        df = _values(spark, 1000, "a").unionByName(_values(spark, 3000, "b"))
        rows = {
            r["grp"]: r["n_est"]
            for r in sketches.hll_distinct(df, ["grp"], "v", p=8).collect()
        }
        assert abs(rows["a"] - 1000) / 1000 < 0.325
        assert abs(rows["b"] - 3000) / 3000 < 0.325

    def test_duplicates_do_not_inflate(self, spark):
        once = _values(spark, 2000)
        thrice = once.unionByName(once).unionByName(once)
        a = sketches.hll_distinct(once, ["grp"], "v", p=8).collect()[0]
        b = sketches.hll_distinct(thrice, ["grp"], "v", p=8).collect()[0]
        assert a["n_est"] == b["n_est"]  # registers identical: max is idempotent
        assert a["sum_fp"] == b["sum_fp"]


class TestHLLMergeLaw:
    def test_merge_equals_union_sketch(self, spark):
        # sketch(A u B) == merge(sketch(A), sketch(B)) EXACTLY
        a = _values(spark, 1500, offset=0)
        b = _values(spark, 1500, offset=1000)  # 500 overlap
        direct = sketches.hll_sketch(a.unionByName(b), ["grp"], "v", p=8)
        merged = sketches.hll_merge(
            sketches.hll_sketch(a, ["grp"], "v", p=8).unionByName(
                sketches.hll_sketch(b, ["grp"], "v", p=8)
            ),
            ["grp"],
        )
        d = {(r["grp"], r["j"]): r["m_j"] for r in direct.collect()}
        m = {(r["grp"], r["j"]): r["m_j"] for r in merged.collect()}
        assert d == m

    def test_estimate_sees_true_union_cardinality(self, spark):
        a = _values(spark, 1500, offset=0)
        b = _values(spark, 1500, offset=1000)
        merged = sketches.hll_merge(
            sketches.hll_sketch(a, ["grp"], "v", p=8).unionByName(
                sketches.hll_sketch(b, ["grp"], "v", p=8)
            ),
            ["grp"],
        )
        est = sketches.hll_estimate(merged, ["grp"], p=8).collect()[0]["n_est"]
        assert abs(est - 2500) / 2500 < 0.325


class TestHLLContract:
    def test_partitioning_invariant(self, spark):
        df = _values(spark, 4000)
        one = sketches.hll_distinct(df.coalesce(1), ["grp"], "v", p=8).collect()
        many = sketches.hll_distinct(df.repartition(16), ["grp"], "v", p=8).collect()
        assert one == many

    def test_register_table_bounded(self, spark):
        sk = sketches.hll_sketch(_values(spark, 50_000), ["grp"], "v", p=8)
        n = sk.count()
        assert n <= 256  # never more rows than registers, whatever the input

    def test_null_values_ignored(self, spark):
        df = _values(spark, 1000).unionByName(
            spark.range(50).select(
                F.lit("g").alias("grp"), F.lit(None).cast("string").alias("v")
            )
        )
        a = sketches.hll_distinct(df, ["grp"], "v", p=8).collect()
        b = sketches.hll_distinct(_values(spark, 1000), ["grp"], "v", p=8).collect()
        assert a == b

    def test_bad_p_raises(self, spark):
        df = _values(spark, 10)
        for p in (3, 6, 13):
            with pytest.raises(ValueError):
                sketches.hll_sketch(df, ["grp"], "v", p=p)

    def test_small_range_linear_counting_branch(self, spark):
        # tiny cardinality -> most registers empty -> linear counting;
        # at n << m the estimate should be nearly exact
        est = sketches.hll_distinct(_values(spark, 40), ["grp"], "v", p=8).collect()[0]
        assert est["zero_regs"] > 0
        assert abs(est["n_est"] - 40) <= 5


class TestKMV:
    def _sh(self, spark, groups):
        """groups: {name: (n, offset)} — distinct values val-offset..offset+n."""
        dfs = [
            spark.range(n).select(
                F.lit(g).alias("grp"),
                F.concat(F.lit("val-"), (F.col("id") + off).cast("string")).alias("v"),
            )
            for g, (n, off) in groups.items()
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def test_sketch_size_capped(self, spark):
        df = self._sh(spark, {"a": (5000, 0)})
        sk = sketches.kmv_sketch(df, ["grp"], "v", k=256)
        assert sk.count() == 256

    def test_small_group_kept_whole(self, spark):
        df = self._sh(spark, {"a": (100, 0)})
        sk = sketches.kmv_sketch(df, ["grp"], "v", k=256)
        assert sk.count() == 100  # fewer distinct values than k: exact

    def test_sketch_is_k_smallest(self, spark):
        from pyspark.sql import functions as F2

        df = self._sh(spark, {"a": (2000, 0)})
        sk = {
            r["h"]
            for r in sketches.kmv_sketch(
                df, ["grp"], "v", k=64, hash_fn="hash60"
            ).collect()
        }
        from extended_rabitq_spark.functions import text as T

        all_h = sorted(
            r["h"]
            for r in df.select(F2.expr(T.hash60("v")).alias("h")).distinct().collect()
        )
        assert sk == set(all_h[:64])

    def test_jaccard_estimate_accuracy(self, spark):
        # A = 0..2999, B = 2000..4999 -> |A n B| = 1000, |A u B| = 5000, J = 0.2
        df = self._sh(spark, {"a": (3000, 0), "b": (3000, 2000)})
        sk = sketches.kmv_sketch(df, ["grp"], "v", k=256)
        row = sketches.kmv_jaccard_pairs(sk, "grp", k=256).collect()[0]
        est = row["jaccard_fix"] / 1e6
        # k=256 sample of the union: std ~ sqrt(J(1-J)/k) ~ 0.025; 5 sigma
        assert abs(est - 0.2) < 0.125, row
        assert row["k_used"] == 256

    def test_disjoint_and_identical(self, spark):
        df = self._sh(spark, {"a": (1000, 0), "b": (1000, 5000), "c": (1000, 0)})
        rows = {
            (r["g_a"], r["g_b"]): r["jaccard_fix"]
            for r in sketches.kmv_jaccard_pairs(
                sketches.kmv_sketch(df, ["grp"], "v", k=256), "grp", k=256
            ).collect()
        }
        assert rows[("a", "b")] == 0  # disjoint
        assert rows[("a", "c")] == 1_000_000  # identical sets
        assert rows[("b", "c")] == 0

    def test_max_groups_guard_raises(self, spark):
        # The pair join is quadratic in group count; the documented
        # small-groups contract is enforced with a typed error (VERDICT
        # r6 item 6).
        df = self._sh(spark, {f"g{i}": (3, i * 10) for i in range(9)})
        sk = sketches.kmv_sketch(df, ["grp"], "v", k=16)
        with pytest.raises(ValueError, match="max_groups"):
            sketches.kmv_jaccard_pairs(sk, "grp", k=16, max_groups=8)
        # at the bound it runs: 9 groups -> 36 pairs
        assert (
            sketches.kmv_jaccard_pairs(sk, "grp", k=16, max_groups=9).count()
            == 36
        )

    def test_partitioning_invariant(self, spark):
        df = self._sh(spark, {"a": (2000, 0), "b": (2000, 1500)})
        one = sorted(
            map(
                tuple,
                sketches.kmv_jaccard_pairs(
                    sketches.kmv_sketch(df.coalesce(1), ["grp"], "v"), "grp"
                ).collect(),
            )
        )
        many = sorted(
            map(
                tuple,
                sketches.kmv_jaccard_pairs(
                    sketches.kmv_sketch(df.repartition(16), ["grp"], "v"), "grp"
                ).collect(),
            )
        )
        assert one == many


class TestCMS:
    def _tok(self, spark, counts):
        """counts: {value: n occurrences}."""
        dfs = [
            spark.range(n).select(F.lit(v).alias("v")) for v, n in counts.items()
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def test_never_underestimates_and_tight_when_sparse(self, spark):
        counts = {f"t{i}": (i + 1) * 3 for i in range(50)}
        df = self._tok(spark, counts)
        grid = sketches.cms_sketch(df, [], "v")
        probes = df.select("v").distinct()
        est = {
            r["v"]: r["cms_est"]
            for r in sketches.cms_estimate(grid, probes, "v").collect()
        }
        for v, n in counts.items():
            assert est[v] >= n  # count-min never underestimates
            # 50 items in a 4x2048 grid: collisions are rare -> exact
        exact_hits = sum(est[v] == n for v, n in counts.items())
        assert exact_hits >= 45

    def test_merge_is_sum(self, spark):
        a = self._tok(spark, {"x": 10, "y": 5})
        b = self._tok(spark, {"x": 7, "z": 2})
        direct = sketches.cms_sketch(a.unionByName(b), [], "v")
        merged = sketches.cms_merge(
            sketches.cms_sketch(a, [], "v").unionByName(
                sketches.cms_sketch(b, [], "v")
            ),
            [],
        )
        d = {(r["r"], r["c"]): r["cnt"] for r in direct.collect()}
        m = {(r["r"], r["c"]): r["cnt"] for r in merged.collect()}
        assert d == m

    def test_unseen_probe_estimates_zero(self, spark):
        grid = sketches.cms_sketch(self._tok(spark, {"x": 10}), [], "v")
        probes = spark.range(1).select(F.lit("never-seen-value-12345").alias("v"))
        est = sketches.cms_estimate(grid, probes, "v").collect()[0]["cms_est"]
        # 4 independent cells must ALL collide with x's cells to misreport
        assert est == 0

    @staticmethod
    def _tok_seq(spark, n_values: int, reps_expr: str):
        """Same multiset as ``_tok({f'u{i}': reps(i)})`` built as ONE
        frame: the union-per-value helper creates an n-way union whose
        driver-side plan construction alone took ~17 min at n=3000
        (VERIFY r10 could not finish the suite because of it) — the
        properties under test are about the SKETCH, not plan building."""
        return (
            spark.range(n_values)
            .select(
                F.concat(F.lit("u"), F.col("id").cast("string")).alias("v"),
                F.expr(reps_expr).alias("_n"),
            )
            .select("v", F.expr("explode(sequence(1, _n))").alias("_i"))
            .select("v")
        )

    def test_grid_bounded(self, spark):
        df = self._tok_seq(spark, 3000, "2")
        n = sketches.cms_sketch(df, [], "v").count()
        assert n <= sketches.CMS_D * sketches.CMS_W

    def test_partitioning_invariant(self, spark):
        df = self._tok_seq(spark, 200, "CAST(id % 5 + 1 AS INT)")
        probes = df.select("v").distinct()
        one = sorted(
            map(
                tuple,
                sketches.cms_estimate(
                    sketches.cms_sketch(df.coalesce(1), [], "v"), probes, "v"
                ).collect(),
            )
        )
        many = sorted(
            map(
                tuple,
                sketches.cms_estimate(
                    sketches.cms_sketch(df.repartition(16), [], "v"), probes, "v"
                ).collect(),
            )
        )
        assert one == many

    def test_bad_d_raises(self, spark):
        with pytest.raises(ValueError):
            sketches.cms_sketch(self._tok(spark, {"x": 1}), [], "v", d=99)

    def test_grouped_sketch_rejected_by_estimate(self, spark):
        # A grid built with group_cols has one row per group per cell;
        # joining on (r, c) alone would min() across groups and silently
        # underestimate — cms_estimate must refuse it (ADVICE r6).
        df = self._tok(spark, {"x": 10, "y": 5}).withColumn(
            "grp", F.lit("a")
        )
        grouped = sketches.cms_sketch(df, ["grp"], "v")
        probes = df.select("v").distinct()
        with pytest.raises(ValueError, match="extra columns"):
            sketches.cms_estimate(grouped, probes, "v")


class TestHashFnKnob:
    """The production xxh64 / oracle hash60 dispatch (VERDICT r6 item 3):
    statistical guarantees are hash-agnostic, so the accuracy envelope
    must hold on BOTH families; the knob itself is typed-checked."""

    def test_unknown_hash_fn_raises(self, spark):
        df = spark.range(10).select(F.col("id").cast("string").alias("v"))
        with pytest.raises(ValueError, match="hash_fn"):
            sketches.hll_sketch(df, [], "v", hash_fn="md5")

    @pytest.mark.parametrize("hash_fn", ["hash60", "xxh64"])
    def test_hll_accuracy_both_hashes(self, spark, hash_fn):
        n = 20000
        df = spark.range(n).select(
            F.concat(F.lit("v-"), F.col("id").cast("string")).alias("v")
        )
        est = sketches.hll_distinct(df, [], "v", p=8, hash_fn=hash_fn).collect()[0][
            "n_est"
        ]
        # sigma = 1.04/sqrt(256) ~ 6.5%; 5 sigma
        assert abs(est - n) < 0.325 * n, (hash_fn, est)

    @pytest.mark.parametrize("hash_fn", ["hash60", "xxh64"])
    def test_kmv_jaccard_both_hashes(self, spark, hash_fn):
        # A = 0..2999, B = 2000..4999 -> J = 0.2 (same as the main test)
        dfs = [
            spark.range(3000).select(
                F.lit("a").alias("grp"),
                F.concat(F.lit("val-"), F.col("id").cast("string")).alias("v"),
            ),
            spark.range(3000).select(
                F.lit("b").alias("grp"),
                F.concat(F.lit("val-"), (F.col("id") + 2000).cast("string")).alias(
                    "v"
                ),
            ),
        ]
        df = dfs[0].unionByName(dfs[1])
        sk = sketches.kmv_sketch(df, ["grp"], "v", k=256, hash_fn=hash_fn)
        row = sketches.kmv_jaccard_pairs(sk, "grp", k=256).collect()[0]
        assert abs(row["jaccard_fix"] / 1e6 - 0.2) < 0.125, (hash_fn, row)

    @pytest.mark.parametrize("hash_fn", ["hash60", "xxh64"])
    def test_cms_never_underestimates_both_hashes(self, spark, hash_fn):
        counts = {f"t{i}": (i + 1) * 3 for i in range(30)}
        dfs = [
            spark.range(n).select(F.lit(v).alias("v")) for v, n in counts.items()
        ]
        df = dfs[0]
        for d in dfs[1:]:
            df = df.unionByName(d)
        grid = sketches.cms_sketch(df, [], "v", hash_fn=hash_fn)
        probes = df.select("v").distinct()
        est = {
            r["v"]: r["cms_est"]
            for r in sketches.cms_estimate(
                grid, probes, "v", hash_fn=hash_fn
            ).collect()
        }
        for v, n in counts.items():
            assert est[v] >= n, (hash_fn, v)

    def test_xxh60_domain_is_60_bit_nonnegative(self, spark):
        from extended_rabitq_spark.functions import text as T

        rows = (
            spark.range(5000)
            .select(F.expr(T.xxh60("CAST(id AS STRING)")).alias("h"))
            .agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
            .collect()[0]
        )
        assert rows["lo"] >= 0
        assert rows["hi"] < 1 << 60


class TestQuantileSketch:
    """Bottom-k quantile sketch (NEW r8): order-statistic correctness,
    merge law, exactness at k >= n, partitioning invariance, rank-error
    bound."""

    @staticmethod
    def _docs(spark, n, groups=("a", "b"), parts=4):
        # value = a deterministic skewed function of the id so quantiles
        # are nontrivial; key = unique id per group
        return spark.range(n).repartition(parts).select(
            F.element_at(
                F.array(*[F.lit(g) for g in groups]),
                (F.col("id") % len(groups) + 1).cast("int"),
            ).alias("grp"),
            F.col("id").alias("key"),
            ((F.col("id") * F.col("id")) % 9973).cast("long").alias("v"),
        )

    def test_exact_when_k_covers_group(self, spark):
        df = self._docs(spark, 100)
        out = sketches.quantile_sketch_vs_exact(
            df, ["grp"], "v", "key", quantiles=[10, 50, 90], k=1000
        ).collect()
        assert len(out) == 6  # 2 groups x 3 quantiles
        assert all(r["abs_err"] == 0 for r in out)
        assert all(r["qsk_est"] == r["exact_v"] for r in out)

    def test_rank_error_bound(self, spark):
        # k=256 on n=20000: rank SE ~ sqrt(q(1-q)/k) <= 3.1%; 5 sigma
        # rank error 15.6% -> value error bounded by the value spread of
        # that rank window.  Check the RANK of the estimate, not the
        # value: find where the estimate falls in the exact CDF.
        df = self._docs(spark, 20_000, groups=("a",))
        est = {
            r["q_pct"]: r["qsk_est"]
            for r in sketches.quantile_estimate(
                sketches.quantile_sketch(df, ["grp"], "v", "key", k=256),
                ["grp"], [25, 50, 75],
            ).collect()
        }
        vals = sorted(r["v"] for r in df.select("v").collect())
        n = len(vals)
        import bisect

        for q, e in est.items():
            rank = bisect.bisect_left(vals, e) / n
            assert abs(rank - q / 100) < 0.16, f"q={q} est-rank={rank:.3f}"

    def test_merge_law(self, spark):
        # sketch(shard1) ∪ sketch(shard2) re-cut == sketch(full corpus)
        df = self._docs(spark, 5_000)
        s1 = sketches.quantile_sketch(
            df.where(F.col("key") % 2 == 0), ["grp"], "v", "key", k=128
        )
        s2 = sketches.quantile_sketch(
            df.where(F.col("key") % 2 == 1), ["grp"], "v", "key", k=128
        )
        merged = sketches.quantile_sketch_merge(
            s1.unionByName(s2), ["grp"], k=128
        )
        full = sketches.quantile_sketch(df, ["grp"], "v", "key", k=128)
        a = sorted(map(tuple, merged.collect()))
        b = sorted(map(tuple, full.collect()))
        assert a == b

    def test_string_keys_deterministic(self, spark):
        # ADVICE r8: a long-cast tie-break nulls out string doc ids and
        # voids the partitioning-invariance guarantee.  String keys must
        # carry a non-null kk and produce identical sketches regardless
        # of input partitioning.
        def mk(parts):
            return self._docs(spark, 2_000, parts=parts).select(
                "grp",
                F.concat(F.lit("doc-"), F.col("key").cast("string")).alias("key"),
                "v",
            )

        s1 = sketches.quantile_sketch(mk(2), ["grp"], "v", "key", k=64)
        s2 = sketches.quantile_sketch(mk(13), ["grp"], "v", "key", k=64)
        a = sorted(map(tuple, s1.collect()))
        b = sorted(map(tuple, s2.collect()))
        assert a == b
        assert all(r["kk"] is not None for r in s1.collect())

    def test_merge_recut_tie_break(self, spark):
        # ADVICE r8: an exact hash tie at the k boundary must merge
        # deterministically — (h, kk) ordering, same window as the
        # build.  Construct sketches with a planted tie by hand.
        rows = [("g", 7, "a", 10), ("g", 7, "b", 20), ("g", 7, "c", 30)]
        sk = spark.createDataFrame(rows, "grp string, h long, kk string, v long")
        merged = sketches.quantile_sketch_merge(sk, ["grp"], k=2)
        got = sorted((r["kk"], r["v"]) for r in merged.collect())
        assert got == [("a", 10), ("b", 20)]  # kk breaks the h tie

    def test_partitioning_invariance(self, spark):
        df1 = self._docs(spark, 3_000, parts=2)
        df17 = self._docs(spark, 3_000, parts=17)
        q = [10, 25, 50, 75, 90, 99]
        a = sorted(
            map(tuple, sketches.quantile_sketch_vs_exact(
                df1, ["grp"], "v", "key", q, k=64).collect())
        )
        b = sorted(
            map(tuple, sketches.quantile_sketch_vs_exact(
                df17, ["grp"], "v", "key", q, k=64).collect())
        )
        assert a == b

    def test_hash_fn_knob_portable_vs_production(self, spark):
        # both hash modes give valid samples; estimates differ (different
        # samples) but both satisfy the rank bound; hash60 is the oracle
        # mode (cross-engine), xxh64 the production mode
        df = self._docs(spark, 8_000, groups=("a",))
        for fn in ("hash60", "xxh64"):
            out = sketches.quantile_sketch_vs_exact(
                df, ["grp"], "v", "key", [50], k=256, hash_fn=fn
            ).collect()
            assert len(out) == 1
            assert out[0]["abs_err"] <= 9973 * 0.2  # generous value bound
        with pytest.raises(ValueError):
            sketches.quantile_sketch(df, ["grp"], "v", "key", hash_fn="sha9")
