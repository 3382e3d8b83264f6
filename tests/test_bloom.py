"""Bloom pre-gate tests (operators.bloom): no false negatives, sane FP
rate, OR-append, save/load, and lossless composition with
incremental_dedup's artifact mode."""

from __future__ import annotations

import pyspark.sql.functions as F

from extended_rabitq_spark.operators import bloom, dedup


def _keys_df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.concat(F.lit(tag), F.col("id").cast("string")).alias("key")
    )


class TestBloomCore:
    def test_no_false_negatives_and_fp_rate(self, spark):
        members = _keys_df(spark, 0, 2000, "m")
        others = _keys_df(spark, 0, 2000, "x")
        b = bloom.build_bloom(members, ["key"], fpp=0.01)
        # every inserted key must survive the prefilter
        assert bloom.bloom_prefilter(members, b, ["key"]).count() == 2000
        # non-members: FP rate near the 1% design point (≤ 5× slack for
        # a 2000-sample estimate)
        fp = bloom.bloom_prefilter(others, b, ["key"]).count()
        assert fp <= 2000 * 0.05
        # and the gate genuinely prunes (not a pass-through)
        assert fp < 2000

    def test_composite_key_column_order_matters(self, spark):
        df = spark.createDataFrame([(1, "a"), (2, "b")], "band int, key string")
        b = bloom.build_bloom(df, ["band", "key"])
        assert bloom.bloom_prefilter(df, b, ["band", "key"]).count() == 2
        flipped = spark.createDataFrame([("a", 1)], "band string, key int")
        # different composite ⇒ (almost surely) filtered out
        assert bloom.bloom_prefilter(flipped, b, ["band", "key"]).count() == 0

    def test_or_append_equals_rebuild(self, spark):
        a = _keys_df(spark, 0, 500, "k")
        d = _keys_df(spark, 500, 900, "k")
        base = bloom.build_bloom(a, ["key"], fpp=0.01)
        delta = bloom.build_bloom(d, ["key"], m=base["m"], k=base["k"])
        merged = bloom.bloom_or(base, delta)
        rebuilt = bloom.build_bloom(
            a.unionByName(d), ["key"], m=base["m"], k=base["k"]
        )
        assert merged == rebuilt  # bitmap-identical, not just equivalent

    def test_or_param_mismatch_raises(self, spark):
        import pytest

        a = bloom.build_bloom(_keys_df(spark, 0, 10, "k"), ["key"], m=128, k=3)
        b = bloom.build_bloom(_keys_df(spark, 0, 10, "k"), ["key"], m=256, k=3)
        with pytest.raises(ValueError, match="parameter mismatch"):
            bloom.bloom_or(a, b)

    def test_save_load_roundtrip(self, spark, tmp_path):
        a = bloom.build_bloom(_keys_df(spark, 0, 100, "k"), ["key"])
        b = bloom.build_bloom(_keys_df(spark, 0, 50, "j"), ["key"], fpp=0.001)
        path = str(tmp_path / "blooms")
        bloom.save_blooms(spark, {"a": a, "b": b}, path)
        loaded = bloom.load_blooms(spark, path)
        assert loaded == {"a": a, "b": b}


class TestBloomGatedIncremental:
    def _fixture(self, spark):
        from conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = docs.where(F.col("doc_id") < 40)
        new = docs.where(F.col("doc_id") >= 40).select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text"
        ).unionByName(
            corpus.where(F.col("doc_id") == 7).select(
                (F.col("doc_id") + 9000).alias("doc_id"), "text"
            )
        )
        return corpus, new

    def test_gated_equals_ungated(self, spark, tmp_path):
        """The bloom pre-gate must not change a single verdict — the
        no-false-negative property composed with the exact tiers."""
        corpus, new = self._fixture(spark)
        path = str(tmp_path / "art")
        dedup.save_dedup_artifacts(corpus, path)
        gated = sorted(
            map(tuple, dedup.incremental_dedup(new, corpus, artifacts=path).collect())
        )
        ungated = sorted(
            map(
                tuple,
                dedup.incremental_dedup(
                    new, corpus, artifacts=path, use_bloom=False
                ).collect(),
            )
        )
        assert gated == ungated
        assert any(s == "exact_dup" for _, s, _ in gated)

    def test_appended_corpus_visible_through_bloom(self, spark, tmp_path):
        """A doc duplicating an APPENDED shard must still be flagged when
        gated — the OR-append keeps no-false-negatives across growth."""
        from conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = docs.where(F.col("doc_id") < 30)
        shard = docs.where((F.col("doc_id") >= 30) & (F.col("doc_id") < 40))
        path = str(tmp_path / "art")
        dedup.save_dedup_artifacts(corpus, path)
        dedup.append_dedup_artifacts(shard, path)
        probe = shard.where(F.col("doc_id") == 35).select(
            (F.col("doc_id") + 5000).alias("doc_id"), "text"
        )
        grown = corpus.unionByName(shard)
        out = {
            r.doc_id: (r.status, r.dup_of)
            for r in dedup.incremental_dedup(probe, grown, artifacts=path).collect()
        }
        assert out[5035] == ("exact_dup", 35)

    def test_bloom_prunes_unique_batch(self, spark, tmp_path):
        """An all-unique batch's hash probes are (almost) all dropped
        before the corpus join — the O(batch) fast path."""
        corpus, _ = self._fixture(spark)
        path = str(tmp_path / "art")
        dedup.save_dedup_artifacts(corpus, path)
        blooms = bloom.load_blooms(spark, f"{path}/blooms")
        fresh = spark.range(0, 500).select(
            F.col("id").alias("new_id"),
            F.md5(F.concat(F.lit("fresh-"), F.col("id").cast("string"))).alias("h"),
        )
        survivors = bloom.bloom_prefilter(fresh, blooms["hashes"], ["h"]).count()
        assert survivors <= 25  # ≪ 500: the gate is doing its job


class TestBloomPushdown:
    def test_inlist_pushdown_reaches_corpus_scan(self, spark, tmp_path):
        """With bloom gating, the surviving keys are pushed into the
        corpus parquet scans as IN-list predicates (PushedFilters shows
        In(h,...)/In(key,...)) — zone-map row-group skipping at scale."""
        import pyspark.sql.functions as F
        from conftest import SF_SMOKE

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = docs.where(F.col("doc_id") < 40)
        path = str(tmp_path / "art")
        dedup.save_dedup_artifacts(corpus, path)
        new = corpus.where(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 9000).alias("doc_id"), "text"
        )
        out = dedup.incremental_dedup(new, corpus, artifacts=path)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # hash tier: the IN-list reached the content_hashes parquet scan
        assert "In(h, [" in plan
        # band tier: its subtree runs eagerly inside the candidate
        # localCheckpoint, so it can't appear in `out`'s plan — assert
        # the same predicate shape pushes on the artifact table itself
        band_plan = (
            spark.read.parquet(f"{path}/bands")
            .where(F.col("key").isin(["k1", "k2"]))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "In(key, [" in band_plan
        # and the verdicts are right: every probe doc is an exact dup
        got = {r.doc_id: r.status for r in out.collect()}
        assert got == {9000 + i: "exact_dup" for i in range(5)}
