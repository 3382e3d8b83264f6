"""Behavioral tests for dedup + text operators (beyond oracle parity):
known-duplicate planted fixtures must be found."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from extended_rabitq_spark.operators import dedup, textops


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
        (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),  # near dup
        (3, "completely different content about spark distributed query engines and data"),
        (4, "another unrelated document mentioning vectors indexes and quantization methods"),
        (5, "THE  Quick   brown fox jumps over the lazy dog near the river bank today"),  # dup mod case/ws
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(docs):
    out = {r.content_hash: (r.keep_doc_id, r.dup_count) for r in dedup.exact_dedup(docs).collect()}
    assert len(out) == 4  # 0/1/5 collapse to one group
    groups = sorted(out.values())
    assert (0, 3) in groups  # keep min id, count 3


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard_r for r in dedup.ngram_jaccard_pairs(docs).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert (3, 4) not in pairs


def test_minhash_lsh_finds_near_dup(docs):
    pairs = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_pairs(docs).collect()}
    assert (0, 1) in pairs and (0, 5) in pairs
    assert (3, 4) not in pairs


def test_jaccard_prefix_filter_is_lossless(spark, docs):
    """The prefix-filtered exact join must return EXACTLY the all-shingle
    join's output at every threshold — including t=0.4, whose binary
    float sits above the exact value (0.4·5 → 2.0000000000000004), the
    ceil edge the epsilon guards."""
    sf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for frame in (docs, sf):
        for t in (0.3, 0.4, 0.5, 0.8, 1.0):
            full = {(r.doc_a, r.doc_b): r.jaccard_r
                    for r in dedup.ngram_jaccard_pairs(frame, threshold=t).collect()}
            pref = {(r.doc_a, r.doc_b): r.jaccard_r
                    for r in dedup.jaccard_prefix_pairs(frame, threshold=t).collect()}
            assert pref == full, t
    with pytest.raises(ValueError, match="threshold"):
        dedup.jaccard_prefix_pairs(docs, threshold=0.0)


def test_minhash_hash_modes_same_verified_pairs(spark, docs):
    """hash_mode='xxh64' (production, JVM-native) vs 'md5' (oracle):
    candidate DISCOVERY uses a different hash family, but on corpora
    whose near-dups sit well above the threshold both modes must emit
    the same verified pairs with the same exact-Jaccard values — pinned
    on the planted fixture AND the sf0.001 documents table."""
    sf = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for frame in (docs, sf):
        md5 = {(r.doc_a, r.doc_b): r.jaccard_r
               for r in dedup.minhash_lsh_pairs(frame).collect()}
        xxh = {(r.doc_a, r.doc_b): r.jaccard_r
               for r in dedup.minhash_lsh_pairs(frame, hash_mode="xxh64").collect()}
        assert md5  # non-vacuous: the corpus has near-dups
        # verified values are hash-independent (exact Jaccard on shingle
        # strings): every pair BOTH modes discover agrees exactly
        common = md5.keys() & xxh.keys()
        assert all(md5[p] == xxh[p] for p in common)
        # discovery may differ only on borderline pairs — with 4 bands
        # of 2 rows, J ≥ 0.95 collides w.p. ≥ 1-(1-0.95²)⁴ ≈ 0.99997
        # per hash family; everything that high must be found by both
        for p in md5.keys() ^ xxh.keys():
            j = md5.get(p, xxh.get(p))
            assert j < 0.95, (p, j)
    with pytest.raises(ValueError, match="hash_mode"):
        dedup.minhash_lsh_pairs(docs, hash_mode="sha1").collect()


def test_simhash_near_dup(docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in dedup.simhash_pairs(docs, max_hamming=10).collect()}
    assert pairs[(0, 1)] == 0 and pairs[(0, 5)] == 0
    assert (0, 2) in pairs  # one word changed → small hamming
    assert (3, 4) not in pairs


def test_simhash_banded_equals_all_pairs(spark):
    """Pigeonhole losslessness: banded candidate generation must return
    EXACTLY the all-pairs result at every max_hamming (nb = h+1 bands),
    including uneven band widths (48 % nb != 0)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for h in (0, 3, 4):
        full = {
            (r.doc_a, r.doc_b): r.hamming
            for r in dedup.simhash_pairs(docs, max_hamming=h).collect()
        }
        banded = {
            (r.doc_a, r.doc_b): r.hamming
            for r in dedup.simhash_banded_pairs(docs, max_hamming=h).collect()
        }
        assert banded == full, h


def test_embedding_cosine_pairs(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.999, 0.01, 0.0]),  # near-dup of 0
            (2, [0.0, 1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    )
    pairs = {(r.id_a, r.id_b) for r in dedup.embedding_cosine_pairs(emb, threshold=0.99).collect()}
    assert pairs == {(0, 1)}


def test_lang_id_deterministic(docs):
    out = {r.doc_id: r.lang_pred for r in textops.lang_id(docs).collect()}
    assert out[0] == "en"  # 'the'/'over' hits dominate
    assert set(out.values()) <= {"en", "es", "de", "fr"}


def test_text_quality_ranges(docs):
    for r in textops.text_quality(docs).collect():
        assert r.n_tokens > 0
        assert 0.0 <= r.stopword_ratio_r <= 1.0
        assert 0.0 < r.distinct_ratio_r <= 1.0
        assert r.avg_token_len_r > 1.0


def test_fingerprint_dups_share_fp(docs):
    out = {r.doc_id: (r.n_fp, r.min_fp, r.max_fp) for r in textops.doc_fingerprint(docs).collect()}
    assert out[0] == out[1] == out[5]  # normalization-equal docs → same fingerprints
    assert out[0] != out[3]


def test_embedding_ann_pairs_approximate_recall(spark):
    """With nprobe < n_clusters the ANN self-join is approximate; its
    top-N pair recall vs the exact form stays high (deterministic
    fixture: ≥ 70% at nprobe=4/16)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_ann_pairs(emb, top_n=10).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_ann_pairs(emb, top_n=10, nprobe=4).collect()
    }
    assert len(exact) == 10
    assert len(exact & approx) >= 7


def test_pii_scrub_planted(spark, duck):
    """Planted PII: counts, redaction, and cross-engine parity on data
    that actually contains emails/URLs/phones (the parquet corpus has
    none, so the registered-query oracle alone can't exercise matches)."""
    rows = [
        (0, "contact me at john.doe@example.com or visit https://example.com/a?b=1 soon"),
        (1, "call +1 (555) 123-4567 now"),
        (2, "no pii here at all"),
        (3, "two mails a@b.co c@d.org and http://x.io/path#frag"),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in textops.pii_scrub(sdf).collect()}
    assert out[0].n_emails == 1 and out[0].n_urls == 1 and out[0].n_phones == 0
    assert "<EMAIL>" in out[0].clean_text and "<URL>" in out[0].clean_text
    assert out[1].n_phones == 1 and "<PHONE>" in out[1].clean_text
    assert out[2].clean_text == "no pii here at all"
    assert out[3].n_emails == 2 and out[3].n_urls == 1

    import pandas as pd

    from extended_rabitq_spark.queries.text import _PII_ORACLE

    duck.register("pii_docs_t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    drows = duck.sql(_PII_ORACLE.replace("FROM documents", "FROM pii_docs_t")).fetchall()
    dmap = {r[0]: r for r in drows}
    for i, r in out.items():
        d = dmap[i]
        assert (r.n_urls, r.n_emails, r.n_phones, r.clean_text) == (d[1], d[2], d[3], d[4]), i


def test_corpus_stats_and_token_topk(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    stats = textops.corpus_stats(docs).collect()
    assert sum(r.n_docs for r in stats) == docs.count()
    assert all(r.min_chars <= r.avg_chars_r <= r.max_chars for r in stats)
    top = textops.token_topk(docs).collect()
    by_lang = {}
    for r in top:
        by_lang.setdefault(r.lang, []).append((r.rnk, r.cnt))
    for lang, rows_ in by_lang.items():
        rows_.sort()
        cnts = [c for _, c in rows_]
        assert cnts == sorted(cnts, reverse=True), lang  # ranked by freq
        assert rows_[0][0] == 1


def test_salted_join_equals_plain_join(spark):
    """Salted equi-join (hot side salted, small side replicated) returns
    exactly the plain join's multiset of rows, including under a heavily
    skewed key distribution and duplicate rows."""
    from extended_rabitq_spark.operators.skew import salted_join

    big = spark.createDataFrame(
        [(i, "hot" if i % 10 else f"k{i}") for i in range(2000)]
        + [(99990, "hot"), (99990, "hot")],  # duplicate rows on the hot key
        "id long, k string",
    )
    small = spark.createDataFrame(
        [("hot", 1.0), ("k10", 2.0), ("k20", 3.0), ("miss", 9.0)], "k string, v double"
    )
    plain = sorted(tuple(r) for r in big.join(small, on="k").collect())
    salted = sorted(tuple(r) for r in salted_join(big, small, on="k", n_salts=8).collect())
    assert salted == plain and len(plain) > 1800


def test_embedding_threshold_pairs_ann_equals_exact(spark):
    """VERDICT r1 #8: the threshold-form ANN pair finder (scale twin)
    is value-equal to the exact all-pairs form on the fixture."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    tau = 0.45
    exact = {
        (r.id_a, r.id_b, r.cos_r)
        for r in dedup.embedding_cosine_pairs(emb, threshold=tau).collect()
    }
    ann = {
        (r.id_a, r.id_b, r.cos_r)
        for r in dedup.embedding_threshold_pairs_ann(emb, threshold=tau).collect()
    }
    assert exact and ann == exact


def test_pipeline_scale_variant_equals_exact(spark):
    """pipeline_clean_corpus(scale=True) swaps the all-pairs stage 3 for
    the ANN self-join and must keep the same surviving docs on the
    fixture."""
    from extended_rabitq_spark.queries.pipeline import pipeline_clean_corpus

    sf = "/root/testdata/sf0.001"
    a = {tuple(r) for r in pipeline_clean_corpus(spark, sf, scale=False).collect()}
    b = {tuple(r) for r in pipeline_clean_corpus(spark, sf, scale=True).collect()}
    assert a and b == a


class TestConnectedComponents:
    def test_chain_transitive_closure(self, spark):
        """A~B, B~C, C~D (no direct A~C/A~D): all four must land in one
        component rooted at the smallest id — the case pairwise
        drop-higher-id under-merges."""
        from extended_rabitq_spark.operators import dedup

        nodes = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
        pairs = spark.createDataFrame(
            [(1, 3), (3, 5), (5, 7), (2, 4)], "doc_a long, doc_b long"
        )
        comp = {
            r.doc_id: r.component_id
            for r in dedup.connected_components(pairs, nodes).collect()
        }
        assert comp == {0: 0, 1: 1, 3: 1, 5: 1, 7: 1, 2: 2, 4: 2, 6: 6}

    def test_empty_pairs_all_singletons(self, spark):
        from extended_rabitq_spark.operators import dedup

        nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        comp = {
            r.doc_id: r.component_id
            for r in dedup.connected_components(pairs, nodes).collect()
        }
        assert comp == {i: i for i in range(5)}


class TestIncrementalDedup:
    def test_statuses_and_precedence(self, spark):
        """Exact dup beats near dup; unique docs get NULL dup_of; only
        new-vs-corpus comparisons (a dup WITHIN the new shard is not
        flagged — that's the intra-shard operators' job)."""
        import pyspark.sql.functions as F

        from conftest import SF_SMOKE
        from extended_rabitq_spark.operators import dedup

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = docs.where(F.col("doc_id") < 30)
        # new shard: clone of corpus doc 3 (exact), fresh docs, and a
        # pair of identical NEW docs (must stay 'unique' here)
        clone = corpus.where(F.col("doc_id") == 3).select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text"
        )
        fresh = docs.where(F.col("doc_id") >= 30).select(
            (F.col("doc_id") + 2000).alias("doc_id"), "text"
        )
        twin = fresh.where(F.col("doc_id") == 2030).select(
            (F.col("doc_id") + 5000).alias("doc_id"), "text"
        )
        new = clone.unionByName(fresh).unionByName(twin)
        out = {r.doc_id: (r.status, r.dup_of)
               for r in dedup.incremental_dedup(new, corpus).collect()}
        assert out[1003] == ("exact_dup", 3)
        assert out[7030][0] == "unique"  # intra-shard twin not flagged
        assert set(out) == {1003, 7030} | {r.doc_id for r in fresh.collect()}
        for status, dup_of in out.values():
            assert (dup_of is None) == (status == "unique")


    def test_artifacts_path_value_equal(self, spark, tmp_path):
        """incremental_dedup with saved artifacts must return exactly
        the in-lineage verdicts (same hashes, same stop list, same band
        keys — read from parquet instead of recomputed)."""
        import pyspark.sql.functions as F

        from conftest import SF_SMOKE
        from extended_rabitq_spark.operators import dedup

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
        path = str(tmp_path / "artifacts")
        dedup.save_dedup_artifacts(corpus, path)
        inline = sorted(
            (r.doc_id, r.status, r.dup_of)
            for r in dedup.incremental_dedup(new, corpus).collect()
        )
        via_art = sorted(
            (r.doc_id, r.status, r.dup_of)
            for r in dedup.incremental_dedup(new, corpus, artifacts=path).collect()
        )
        assert inline == via_art and any(s == "exact_dup" for _, s, _ in inline)

    def test_append_artifacts_matches_resave(self, spark, tmp_path):
        """Appending a shard's artifact rows must yield the same band/hash
        tables as recomputing hashes+bands for the grown corpus under the
        ORIGINAL stop list (the documented consistency contract)."""
        import pyspark.sql.functions as F

        from conftest import SF_SMOKE
        from extended_rabitq_spark.operators import dedup

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
            "doc_id", "text"
        )
        corpus = docs.where(F.col("doc_id") < 40)
        shard = docs.where((F.col("doc_id") >= 40) & (F.col("doc_id") < 60))
        path = str(tmp_path / "a")
        dedup.save_dedup_artifacts(corpus, path)
        dedup.append_dedup_artifacts(shard, path)
        bands = spark.read.parquet(f"{path}/bands")
        hashes = spark.read.parquet(f"{path}/content_hashes")
        stop = spark.read.parquet(f"{path}/stop_shingles")
        grown = corpus.unionByName(shard)
        exp_hashes = dedup.normalized(grown, "text").select(
            F.col("doc_id"), F.md5("_norm").alias("h")
        )
        sh = dedup.raw_shingles(grown).join(
            F.broadcast(stop), on="shingle", how="left_anti"
        )
        exp_bands = dedup._band_keys(dedup._signatures_from_shingles(sh))
        assert sorted(map(tuple, hashes.collect())) == sorted(
            map(tuple, exp_hashes.collect())
        )
        assert sorted(map(tuple, bands.collect())) == sorted(
            map(tuple, exp_bands.collect())
        )


class TestPackSequences:
    def test_invariants(self, spark):
        from conftest import SF_SMOKE
        from extended_rabitq_spark.operators import sampling

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        out = sampling.pack_sequences(docs, budget_tokens=256, n_shards=4).collect()
        assert {r.doc_id for r in out} == {
            r.doc_id for r in docs.select("doc_id").collect()
        }
        for r in out:
            assert 0 <= r.offset_tokens < 256 and r.shard == r.doc_id % 4
        # per (shard, bin): offsets are dense under concat-and-chunk —
        # each doc starts where the previous span left off (mod budget)
        by_bin: dict = {}
        for r in out:
            by_bin.setdefault((r.shard, r.bin_id), []).append(r)
        for rows in by_bin.values():
            rows.sort(key=lambda r: r.offset_tokens)
            # first doc of shard's first bin starts at 0
        firsts = [min(rows, key=lambda r: r.bin_id * 1000 + r.offset_tokens)
                  for (s, b), rows in by_bin.items() if b == 0]
        assert all(r.offset_tokens == 0 for r in firsts)


class TestCosineCombined:
    def test_equals_declarative_all_pairs(self, spark):
        """BLAS-selected + declaratively re-scored ≡ the interpreted SQL
        cross join, bit for bit (same re-score expression)."""
        from conftest import SF_T2
        from extended_rabitq_spark.operators import dedup

        emb = spark.read.parquet(f"{SF_T2}/embeddings.parquet")
        nonempty = 0
        for tau in (0.45, 0.9):
            a = sorted(
                map(tuple, dedup.embedding_cosine_pairs(emb, tau).collect())
            )
            b = sorted(
                map(tuple, dedup.embedding_cosine_pairs_combined(emb, tau).collect())
            )
            assert a == b
            nonempty += bool(a)
        assert nonempty > 0  # at least one threshold exercises real pairs


class TestStopShingleSemantics:
    def test_df_cap_stays_corpus_wide_in_verify(self, spark, monkeypatch):
        """Adversarial fixture for the candidate-restricted verify pass:
        a boilerplate shingle with df > DF_CAP corpus-wide must stay
        dropped when Jaccard is verified on candidate docs only (naively
        re-deriving df on the subset resurrects it and changes values).
        Compared against a 4-pass reference implementation with the
        window-based corpus-wide cap."""
        from pyspark.sql import Window

        from extended_rabitq_spark.operators import dedup

        monkeypatch.setattr(dedup, "DF_CAP", 10)
        boiler = "subscribe to our newsletter for updates"
        rows = [(i, f"{boiler} unique tail {i} words differ entirely {i*7}")
                for i in range(40)]
        rows += [(100, f"{boiler} the quick brown fox jumps over the lazy dog today"),
                 (101, f"{boiler} the quick brown fox jumps over the lazy dog tonight")]
        docs = spark.createDataFrame(rows, "doc_id long, text string")

        got = {(r.doc_a, r.doc_b): r.jaccard_r
               for r in dedup.minhash_lsh_pairs(docs, threshold=0.3).collect()}

        # reference: window-capped shingle table used for EVERY stage
        sh = dedup.shingle_table(docs)
        sigs = dedup._signatures_from_shingles(sh)
        bands = dedup._band_keys(sigs)
        cand = (
            bands.alias("x").join(bands.alias("y"), on=["band", "key"])
            .where(F.col("x.doc_id") < F.col("y.doc_id"))
            .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
            .distinct()
        )
        sizes = sh.groupBy("doc_id").agg(F.count("*").alias("nsh"))
        sa = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
        sb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
        inter = (
            cand.join(sa, on="doc_a").join(sb, on=["doc_b", "shingle"])
            .groupBy("doc_a", "doc_b").agg(F.count("*").alias("inter"))
        )
        ref = {}
        for r in (
            cand.join(inter, on=["doc_a", "doc_b"], how="left")
            .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nsh", "na"), on="doc_a")
            .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nsh", "nb"), on="doc_b")
            .collect()
        ):
            inter_n = r.inter or 0
            jac = inter_n / (r.na + r.nb - inter_n)
            if jac >= 0.3:
                ref[(r.doc_a, r.doc_b)] = round(jac, 6)
        assert got == ref
        assert (100, 101) in got  # the true near-dup pair survives


def test_vocab_stats_sketch_within_tolerance(spark):
    """HLL++ sketch twin of vocab_stats stays within 5% of exact (2%
    rsd default; fixture vocab is small so the bound is loose)."""
    from conftest import SF_T2
    from extended_rabitq_spark.operators import textops

    docs = spark.read.parquet(f"{SF_T2}/documents.parquet")
    exact = {r.lang: r.n_distinct_tokens for r in textops.vocab_stats(docs).collect()}
    appr = {
        r.lang: r.n_distinct_tokens
        for r in textops.vocab_stats(docs, approx=True).collect()
    }
    assert set(exact) == set(appr)
    for lang in exact:
        assert abs(appr[lang] - exact[lang]) / exact[lang] <= 0.05, lang


def test_connected_components_raises_on_diameter_exceeding_max_iter(spark):
    from extended_rabitq_spark.operators import dedup

    n = 10
    nodes = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    # diameter 9 > max_iter 3 -> must raise, not silently under-merge
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="no convergence"):
        dedup.connected_components(chain, nodes, max_iter=3)
    # ample iterations converge to a single component
    comp = {r.doc_id: r.component_id
            for r in dedup.connected_components(chain, nodes, max_iter=15).collect()}
    assert set(comp.values()) == {0}


def test_fingerprint_non_ascii_no_overflow(spark, duck):
    """The gram polynomial folds code points mod 131: accented/CJK/emoji
    chars must neither overflow signed-64 (ANSI arithmetic raises in
    BOTH engines without the mod) nor break Spark/DuckDB parity."""
    import pandas as pd

    from extended_rabitq_spark.operators import textops

    docs = spark.createDataFrame(
        pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": [
                "café résumé naïve déjà vu élan",
                "日本語のテキストです 機械学習 データ",
                "emoji soup 😀😀😀 🎉 🚀 end",
                "plain ascii control row for parity",
            ],
        })
    )
    got = {r.doc_id: (r.n_fp, r.min_fp, r.max_fp)
           for r in textops.doc_fingerprint(docs).collect()}
    assert set(got) == {1, 2, 3, 4}
    # DuckDB twin on the same rows (registered-view shape)
    duck.sql("CREATE OR REPLACE TABLE nadocs (doc_id BIGINT, text VARCHAR)")
    duck.sql("""INSERT INTO nadocs VALUES
        (1, 'café résumé naïve déjà vu élan'),
        (2, '日本語のテキストです 機械学習 データ'),
        (3, 'emoji soup 😀😀😀 🎉 🚀 end'),
        (4, 'plain ascii control row for parity')""")
    from extended_rabitq_spark.queries.text import _FP_ORACLE

    want = {r[0]: (r[1], r[2], r[3])
            for r in duck.sql(_FP_ORACLE.replace("FROM documents", "FROM nadocs")).fetchall()}
    assert got == want


class TestFuzzyJoin:
    def _tables(self, spark):
        left = spark.createDataFrame(
            [(1, "John Smith"), (2, "Mary Jones"), (3, "Unrelated Name")],
            "l_id BIGINT, k STRING",
        )
        right = spark.createDataFrame(
            [(10, "jon smith"), (20, "mary jomes"), (30, "zzzz qqqq")],
            "r_id BIGINT, k STRING",
        )
        return left, right

    def test_planted_matches_found(self, spark):
        from extended_rabitq_spark.operators import fuzzy

        left, right = self._tables(spark)
        got = {(r.l_id, r.r_id): r.sim_fix for r in fuzzy.fuzzy_join(
            left, right, "k", "k", tau=0.4).collect()}
        assert (1, 10) in got and (2, 20) in got
        assert not any(l == 3 or r == 30 for (l, r) in got)
        assert all(400_000 <= v <= 1_000_000 for v in got.values())

    def test_exact_match_sim_is_one(self, spark):
        from extended_rabitq_spark.operators import fuzzy

        left = spark.createDataFrame([(1, "Acme Corp")], "l_id BIGINT, k STRING")
        right = spark.createDataFrame([(9, "ACME CORP")], "r_id BIGINT, k STRING")
        r = fuzzy.fuzzy_join(left, right, "k", "k", tau=0.9).first()
        assert r.sim_fix == 1_000_000  # case-normalized exact match

    def test_stop_trigram_blocking_documented_miss(self, spark):
        """Pairs sharing ONLY over-cap trigrams are not candidates — the
        documented blocking trade-off."""
        from extended_rabitq_spark.operators import fuzzy

        left = spark.createDataFrame([(1, "aaaa")], "l_id BIGINT, k STRING")
        # 3 right rows all containing 'aaa' -> df('aaa') = 3 > cap=2
        right = spark.createDataFrame(
            [(10, "aaaa"), (11, "aaab"), (12, "baaa")], "r_id BIGINT, k STRING"
        )
        got = fuzzy.fuzzy_join(left, right, "k", "k", tau=0.1, df_cap=2).collect()
        assert got == []  # blocked despite true similarity

    def test_deterministic_across_partitioning(self, spark):
        from extended_rabitq_spark.operators import fuzzy

        left, right = self._tables(spark)
        a = sorted(map(tuple, fuzzy.fuzzy_join(left, right, "k", "k", tau=0.2).collect()))
        b = sorted(map(tuple, fuzzy.fuzzy_join(
            left.repartition(3), right.repartition(2), "k", "k", tau=0.2).collect()))
        assert a == b
