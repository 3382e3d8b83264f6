"""Sampling/selection operators (north-star pipeline stages): behavior
tests beyond the oracle gate — determinism, bounds, migration-freedom."""

from __future__ import annotations

import pyspark.sql.functions as F

from conftest import SF_SMOKE, SF_T2


class TestTrainValSplit:
    def test_deterministic_and_disjoint(self, spark):
        from extended_rabitq_spark.operators import sampling

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        a = {r.doc_id: r.split for r in sampling.train_val_split(docs, 0.2).collect()}
        b = {r.doc_id: r.split for r in sampling.train_val_split(docs, 0.2).collect()}
        assert a == b and set(a) == {r.doc_id for r in docs.select("doc_id").collect()}
        frac = sum(1 for v in a.values() if v == "val") / len(a)
        assert 0.05 < frac < 0.4  # hash-uniform around 0.2 on 50 docs

    def test_membership_stable_under_corpus_growth(self, spark):
        """The anti-leak property: a doc's split must not change when the
        corpus around it changes (pure function of id+salt)."""
        from extended_rabitq_spark.operators import sampling

        docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
        small = docs.where(F.col("doc_id") < 100)
        full_split = {
            r.doc_id: r.split for r in sampling.train_val_split(docs).collect()
        }
        small_split = {
            r.doc_id: r.split for r in sampling.train_val_split(small).collect()
        }
        assert all(full_split[k] == v for k, v in small_split.items())

    def test_map_only_plan(self, spark):
        from extended_rabitq_spark.operators import sampling
        from extended_rabitq_spark.plans import inspect

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        plan = inspect.physical_plan(sampling.train_val_split(docs))
        assert "Exchange" not in plan  # no shuffle at any corpus size


class TestStratifiedSample:
    def test_fraction_zero_and_one(self, spark):
        from extended_rabitq_spark.operators import sampling

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        langs = [r.lang for r in docs.select("lang").distinct().collect()]
        all_one = sampling.stratified_sample(
            docs, {lang: 1.0 for lang in langs}, stratum="lang"
        )
        assert all_one.count() == docs.count()
        none = sampling.stratified_sample(docs, {}, stratum="lang", default_frac=0.0)
        assert none.count() == 0


class TestQuotaSample:
    def test_quota_bound_and_determinism(self, spark):
        from extended_rabitq_spark.operators import sampling

        docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
        out = sampling.quota_sample(docs, quota=7, group="lang")
        per = out.groupBy("lang").count().collect()
        assert all(r["count"] <= 7 for r in per)
        a = sorted(r.doc_id for r in out.select("doc_id").collect())
        b = sorted(
            r.doc_id
            for r in sampling.quota_sample(docs, quota=7, group="lang")
            .select("doc_id")
            .collect()
        )
        assert a == b

    def test_window_uses_partial_topk(self, spark):
        from extended_rabitq_spark.operators import sampling
        from extended_rabitq_spark.plans import inspect

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        plan = inspect.physical_plan(sampling.quota_sample(docs, quota=3))
        assert "WindowGroupLimit" in plan  # no full group materializes


class TestContamination:
    def test_bounds_and_self_exclusion(self, spark):
        from extended_rabitq_spark.operators import dedup

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        bench = docs.select("doc_id").where(F.col("doc_id") < 5)
        out = dedup.contamination_check(docs, bench).collect()
        ids = {r.doc_id for r in out}
        assert ids.isdisjoint({0, 1, 2, 3, 4})  # benchmark docs not scored
        for r in out:
            assert 0 <= r.n_contaminated <= r.n_shingles
            assert 0.0 <= r.contamination_r <= 1.0

    def test_duplicate_of_benchmark_doc_is_fully_contaminated(self, spark):
        from extended_rabitq_spark.operators import dedup

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        clone = docs.where(F.col("doc_id") == 0).select(
            (F.col("doc_id") + 10_000).alias("doc_id"), "text"
        )
        corpus = docs.select("doc_id", "text").unionByName(clone)
        bench = corpus.select("doc_id").where(F.col("doc_id") < 5)
        row = [
            r
            for r in dedup.contamination_check(corpus, bench).collect()
            if r.doc_id == 10_000
        ][0]
        assert row.contamination_r == 1.0


class TestAsofJoin:
    def test_point_in_time_no_future_leakage(self, spark):
        from extended_rabitq_spark.operators.asof import asof_join

        left = spark.createDataFrame(
            [(1, 10, "2024-01-01 00:05:00"), (2, 10, "2024-01-01 00:20:00"),
             (3, 10, "2024-01-01 00:00:00"), (4, 20, "2024-01-01 01:00:00")],
            "event_id long, user_id long, ts string",
        ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
        right = spark.createDataFrame(
            [(10, "2024-01-01 00:05:00", 1.0), (10, "2024-01-01 00:10:00", 2.0)],
            "user_id long, ts string, value double",
        ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
        out = {r.event_id: r.asof_value for r in asof_join(left, right, by="user_id").collect()}
        # inclusive at equal ts (event 1); latest-at-or-before (event 2);
        # NULL before any state (event 3) and for keyless users (event 4)
        assert out == {1: 1.0, 2: 2.0, 3: None, 4: None}

    def test_single_shuffle_plan(self, spark):
        from extended_rabitq_spark.operators.asof import asof_join
        from extended_rabitq_spark.plans import inspect

        left = spark.createDataFrame(
            [(1, 10, "2024-01-01 00:05:00")], "event_id long, user_id long, ts string"
        ).selectExpr("event_id", "user_id", "CAST(ts AS TIMESTAMP) AS ts")
        right = spark.createDataFrame(
            [(10, "2024-01-01 00:00:00", 1.0)], "user_id long, ts string, value double"
        ).selectExpr("user_id", "CAST(ts AS TIMESTAMP) AS ts", "value")
        plan = inspect.physical_plan(asof_join(left, right, by="user_id"))
        # one hash shuffle by key total — union feeds a single window
        assert plan.count("hashpartitioning(user_id") == 1
        assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan


class TestAsofProperty:
    def test_random_vs_pandas_merge_asof(self, spark):
        """Randomized cross-check against pandas.merge_asof (independent
        reference implementation, allow_exact_matches=True ≡ our
        inclusive-at-ts semantics), 5 seeds."""
        import numpy as np
        import pandas as pd

        from extended_rabitq_spark.operators.asof import asof_join

        for seed in range(5):
            rng = np.random.default_rng(seed)
            nl, nr = 60, 25
            lts = np.sort(rng.integers(0, 10_000, nl))
            rts = np.sort(rng.integers(0, 10_000, nr))
            lkey = rng.integers(0, 4, nl)
            rkey = rng.integers(0, 4, nr)
            lpdf = pd.DataFrame({
                "event_id": np.arange(nl), "user_id": lkey,
                "ts": pd.to_datetime(lts, unit="s"),
            })
            rpdf = pd.DataFrame({
                "user_id": rkey, "ts": pd.to_datetime(rts, unit="s"),
                "value": rng.normal(size=nr).round(3),
            })
            # make (key, ts) unique on the right: ASOF tie semantics are
            # undefined there (documented contract)
            rpdf = rpdf.drop_duplicates(["user_id", "ts"])
            want = pd.merge_asof(
                lpdf.sort_values("ts", kind="stable"),
                rpdf.sort_values("ts", kind="stable"),
                on="ts", by="user_id", allow_exact_matches=True,
            ).set_index("event_id")["value"]
            got = {
                r.event_id: r.asof_value
                for r in asof_join(
                    spark.createDataFrame(lpdf),
                    spark.createDataFrame(rpdf),
                    by="user_id",
                ).collect()
            }
            for eid in range(nl):
                w = want.loc[eid]
                g = got[eid]
                if pd.isna(w):
                    assert g is None, (seed, eid)
                else:
                    assert g is not None and abs(g - w) < 1e-12, (seed, eid)


class TestComponentsProperty:
    def test_random_vs_union_find(self, spark):
        """Randomized cross-check against a driver-side union-find."""
        import numpy as np

        for seed in range(4):
            rng = np.random.default_rng(seed)
            n = 60
            m = int(rng.integers(10, 60))
            edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (m, 2)) if a != b]
            parent = list(range(n))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in edges:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            want = {i: min(j for j in range(n) if find(j) == find(i)) for i in range(n)}

            from extended_rabitq_spark.operators import dedup

            nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
            pairs = spark.createDataFrame(
                [(min(a, b), max(a, b)) for a, b in edges] or [(0, 0)],
                "doc_a long, doc_b long",
            )
            got = {
                r.doc_id: r.component_id
                for r in dedup.connected_components(pairs, nodes).collect()
            }
            assert got == want, seed


class TestPackSequencesProperty:
    def test_closed_form_equals_sequential_simulation(self, spark):
        """The window closed form must equal an explicit per-shard
        sequential concat-and-chunk simulation (same hash order)."""
        from conftest import SF_SMOKE
        from extended_rabitq_spark.operators import sampling

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        budget, nsh = 200, 4
        got = {
            r.doc_id: (r.shard, r.bin_id, r.offset_tokens, r.n_tokens)
            for r in sampling.pack_sequences(
                docs, budget_tokens=budget, n_shards=nsh
            ).collect()
        }
        # independent reference: order docs per shard by (bucket, id),
        # walk the token stream sequentially
        import pyspark.sql.functions as F

        rows = docs.select(
            "doc_id",
            F.expr(sampling._bucket_expr("doc_id", "pack")).alias("o"),
            F.expr(
                "CAST(size(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')) AS BIGINT)"
            ).alias("n"),
        ).collect()
        by_shard: dict = {}
        for r in rows:
            by_shard.setdefault(r.doc_id % nsh, []).append(r)
        want = {}
        for shard, rs in by_shard.items():
            pos = 0
            for r in sorted(rs, key=lambda r: (r.o, r.doc_id)):
                want[r.doc_id] = (shard, pos // budget, pos % budget, r.n)
                pos += r.n
        assert got == want


class TestLeakageSafeSplit:
    def test_same_component_same_split(self, spark):
        from extended_rabitq_spark.operators import sampling

        comp = spark.createDataFrame(
            [(1, 100), (2, 100), (3, 100), (4, 200), (5, 300), (6, 300)],
            "doc_id BIGINT, component_id BIGINT",
        )
        rows = sampling.split_by_group(comp, val_frac=0.5).collect()
        by_comp = {}
        for r in rows:
            by_comp.setdefault(r.component_id, set()).add(r.split)
        assert all(len(s) == 1 for s in by_comp.values())  # no leakage

    def test_registered_query_no_cross_split_components(self, spark):
        import __spark_entry__ as e
        from conftest import SF_SMOKE

        rows = e.queries()["split_by_component"](spark, SF_SMOKE).collect()
        by_comp = {}
        for r in rows:
            by_comp.setdefault(r.component_id, set()).add(r.split)
        assert all(len(s) == 1 for s in by_comp.values())
        assert {r.split for r in rows} == {"train", "val"}


class TestHardNegatives:
    def test_no_near_dups_and_ranked(self, spark):
        import numpy as np

        import __spark_entry__ as e
        from conftest import SF_SMOKE

        rows = e.queries()["mine_hard_negatives"](spark, SF_SMOKE).collect()
        emb = {r.vec_id: np.array(r.embedding, dtype=np.float64)
               for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").collect()}
        for r in rows:
            a, b = emb[r.qid], emb[r.id]
            cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
            assert cos < 0.92  # the dup gate held
        by_q = {}
        for r in rows:
            by_q.setdefault(r.qid, []).append(r)
        for qid, rs in by_q.items():
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            assert all(x.dist <= y.dist for x, y in zip(rs, rs[1:]))


class TestMixtureTokenBudget:
    """Water-filling token-budget allocator (NEW r10)."""

    def _docs(self, spark, rows):
        # rows: (doc_id, source, text)
        return spark.createDataFrame(
            [(i, t, "en", s, len(t)) for i, s, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    def _toy(self, spark):
        # src1 (w=2): 4 tokens; src2 (w=3): 8 tokens; src3 (w=1): 40 tokens
        rows = [
            (1, "src1", "a b c d"),
            (2, "src2", "a b c d e f g h"),
            (3, "src3", " ".join(f"w{i}" for i in range(40))),
        ]
        return self._docs(spark, rows)

    def test_hand_computed_water_filling(self, spark):
        """B=100, max_e=4: caps are (16, 32, 160), weights (2, 3, 1).
        Sorted by cap/w: src1 (8), src2 (10.67), src3 (160).
        src1: 100*2 >= 16*6 -> capped (alloc 16).
        src2: (100-16)*3 >= 32*4 -> capped (alloc 32).
        src3: (100-48)*1 < 160*1 -> uncapped, alloc = 52."""
        from extended_rabitq_spark.operators import sampling

        out = {
            r.source: r
            for r in sampling.mixture_token_budget(
                self._toy(spark), budget=100, max_epochs=4
            ).collect()
        }
        assert (out["src1"].capped, out["src1"].alloc_tokens) == (1, 16)
        assert (out["src2"].capped, out["src2"].alloc_tokens) == (1, 32)
        assert (out["src3"].capped, out["src3"].alloc_tokens) == (0, 52)
        assert out["src1"].epochs_fp == 4_000_000
        assert out["src3"].epochs_fp == 1_300_000  # 52/40 = 1.3 epochs
        assert sum(r.alloc_tokens for r in out.values()) == 100

    def test_all_capped_when_budget_exceeds_caps(self, spark):
        from extended_rabitq_spark.operators import sampling

        out = sampling.mixture_token_budget(
            self._toy(spark), budget=10_000, max_epochs=4
        ).collect()
        assert all(r.capped == 1 and r.alloc_tokens == r.cap_tokens for r in out)

    def test_none_capped_splits_by_weight(self, spark):
        """Small budget: nobody caps; allocations are weight-proportional
        round-half-up shares of B."""
        from extended_rabitq_spark.operators import sampling

        out = {
            r.source: r
            for r in sampling.mixture_token_budget(
                self._toy(spark), budget=42, max_epochs=4
            ).collect()
        }
        assert all(r.capped == 0 for r in out.values())
        assert out["src1"].alloc_tokens == 14  # 42*2/6
        assert out["src2"].alloc_tokens == 21  # 42*3/6
        assert out["src3"].alloc_tokens == 7   # 42*1/6

    def test_epochs_never_exceed_cap(self, spark):
        from extended_rabitq_spark.operators import sampling

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        out = sampling.mixture_token_budget(docs).collect()
        assert len(out) == 20
        for r in out:
            assert 0 <= r.epochs_fp <= 4_000_000 + 1, r
            assert (r.alloc_tokens == r.cap_tokens) == (r.capped == 1) or (
                r.capped == 0 and r.alloc_tokens < r.cap_tokens
            )

    def test_fixture_regimes_and_budget_conservation(self, spark):
        """sf0.001 sits in the MIXED regime (some capped, some not) and
        the budget is spent to within rounding of the uncapped count."""
        from extended_rabitq_spark.operators import sampling

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        out = sampling.mixture_token_budget(docs).collect()
        n_capped = sum(r.capped for r in out)
        assert 0 < n_capped < len(out)
        total = sum(r.alloc_tokens for r in out)
        assert abs(total - sampling.MTB_BUDGET) <= len(out)
