"""Semantic tests for the corpus-cleaning/export operators (cleanops).

Oracle parity at sf0.01 lives in test_oracle_parity.py; these tests pin
the *semantics* on hand-built fixtures where the expected output is
derivable by eye.
"""

from __future__ import annotations

import pytest

from extended_rabitq_spark.operators import cleanops


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_segment_dedup_removes_cross_doc_segments(spark):
    # seg_tokens=3: doc 1 and 2 share the segment "a b c"; doc 3 is unique.
    rows = [
        (1, "a b c x y z"),
        (2, "a b c q r s"),
        (3, "u v w"),
    ]
    out = {
        r["doc_id"]: r
        for r in cleanops.segment_dedup(
            _docs(spark, rows), seg_tokens=3
        ).collect()
    }
    assert out[1]["n_segs"] == 2 and out[1]["n_dup_segs"] == 1
    assert out[1]["kept_text"] == "x y z"
    assert out[2]["kept_text"] == "q r s"
    assert out[3]["n_dup_segs"] == 0 and out[3]["kept_text"] == "u v w"
    assert out[3]["n_chars_kept"] == 5


def test_segment_dedup_within_doc_repeat_not_dup(spark):
    # The same segment twice in ONE doc: distinct-doc count stays 1 → kept.
    rows = [(1, "a b c a b c")]
    r = cleanops.segment_dedup(_docs(spark, rows), seg_tokens=3).collect()[0]
    assert r["n_dup_segs"] == 0
    assert r["kept_text"] == "a b c a b c"


def test_doc_chunks_cover_and_overlap(spark):
    text = "abcdefghijklmnopqrstuvwxyz" * 10  # 260 chars
    rows = [(1, text)]
    chunks = (
        cleanops.doc_chunks(_docs(spark, rows), size=120, stride=80)
        .orderBy("chunk_idx")
        .collect()
    )
    # ceil((260-40)/80) = 3 chunks
    assert [c["chunk_idx"] for c in chunks] == [0, 1, 2]
    # Each chunk is the right substring; the last reaches the end.
    for c in chunks:
        start = c["chunk_idx"] * 80
        assert c["chunk_text"] == text[start : start + 120]
    assert chunks[-1]["chunk_text"].endswith(text[-1])
    # Consecutive chunks overlap by size - stride = 40 chars.
    assert chunks[0]["chunk_text"][80:] == chunks[1]["chunk_text"][:40]


def test_doc_chunks_short_doc_single_chunk(spark):
    rows = [(1, "short")]
    chunks = cleanops.doc_chunks(_docs(spark, rows)).collect()
    assert len(chunks) == 1
    assert chunks[0]["chunk_text"] == "short" and chunks[0]["chunk_len"] == 5


def test_shard_export_deterministic_dense_positions(spark):
    rows = [(i, f"doc {i}") for i in range(100)]
    a = cleanops.shard_export(_docs(spark, rows)).collect()
    b = cleanops.shard_export(_docs(spark, rows)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # deterministic
    assert {r["doc_id"] for r in a} == set(range(100))
    by_shard: dict[int, list[int]] = {}
    for r in a:
        assert 0 <= r["shard"] < cleanops.N_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos_in_shard"])
    for shard, pos in by_shard.items():
        assert sorted(pos) == list(range(1, len(pos) + 1)), shard


def test_gopher_filter_rules(spark):
    # 45 tokens, all distinct, one stopword (1/45 ≈ 2.2% ≥ 2%).
    long_good = "the " + " ".join(f"w{i}" for i in range(44))
    rows = [
        (1, long_good),  # passes all rules
        (2, "tiny doc here"),  # fails min-token rule
        (3, ("the " + "word " * 49) * 1),  # no distinct variety? 50 toks
    ]
    out = {
        r["doc_id"]: r for r in cleanops.gopher_filter(_docs(spark, rows)).collect()
    }
    assert out[1]["keep"] == 1
    assert out[2]["r_len"] == 0 and out[2]["keep"] == 0
    # doc 3: 50 tokens, 2 distinct → distinct ratio 0.04 < 0.3
    assert out[3]["r_distinct_ratio"] == 0 and out[3]["keep"] == 0


def test_gopher_filter_integer_thresholds_exact(spark):
    # Exactly at the stopword boundary: 1 stopword hit in 50 tokens = 2%.
    text = "the " + " ".join(f"w{i}" for i in range(49))
    r = cleanops.gopher_filter(_docs(spark, [(1, text)])).collect()[0]
    assert r["n_tokens"] == 50
    assert r["r_stopword_ratio"] == 1  # 1*50 >= 50 holds at equality
    # One fewer stopword-per-token: 1 hit in 51 tokens < 2%.
    text2 = "the " + " ".join(f"w{i}" for i in range(50))
    r2 = cleanops.gopher_filter(_docs(spark, [(1, text2)])).collect()[0]
    assert r2["r_stopword_ratio"] == 0


def test_tfidf_terms_ranks_group_exclusive_terms_first(spark):
    rows = [
        (1, "alpha alpha alpha shared shared", "s1"),
        (2, "beta beta shared shared shared", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    out = cleanops.tfidf_terms(docs, k=2).collect()
    top = {r["source"]: r for r in out if r["rnk"] == 1}
    # Terms exclusive to one source (df=1) outrank the shared term (df=2).
    assert top["s1"]["tok"] == "alpha" and top["s1"]["df"] == 1
    assert top["s2"]["tok"] == "beta"
    for r in out:
        assert r["rnk"] <= 2
        # ratio-idf score: tf * (N+1)/(df+1) with N=2 sources
        assert r["score_r"] == pytest.approx(
            r["tf"] * 3.0 / (r["df"] + 1.0), abs=1e-6
        )


def test_integrity_audit_detects_planted_issues(spark):
    docs = spark.createDataFrame(
        [
            (1, "good doc text", "en", "s1", 13),
            (2, "   ", "en", "s1", 3),          # empty after trim
            (3, "mismatch", "en", "s1", 99),    # n_chars wrong
            (4, "no embedding", "en", "s1", 12),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    emb = spark.createDataFrame(
        [
            (1, [1.0, 2.0]),
            (2, [0.0, 0.0]),                    # zero vector
            (3, [float("nan"), 1.0]),           # non-finite
            (9, [1.0, 2.0, 3.0]),               # orphan + odd dim
        ],
        "vec_id LONG, embedding ARRAY<DOUBLE>",
    )
    from extended_rabitq_spark.operators import cleanops

    r = cleanops.integrity_audit(docs, emb).collect()[0]
    assert r["n_docs"] == 4 and r["n_embeddings"] == 4
    assert r["docs_missing_embedding"] == 1   # doc 4
    assert r["embeddings_missing_doc"] == 1   # vec 9
    assert r["n_chars_mismatch"] == 1         # doc 3
    assert r["n_empty_text"] == 1             # doc 2
    assert r["n_nonfinite_vec"] == 1          # vec 3
    assert r["n_zero_vec"] == 1               # vec 2
    assert r["n_dims"] == 2                   # dims {2, 3}


def test_integrity_audit_is_lazy(spark):
    """Constructing the audit DataFrame must run ZERO Spark jobs (the
    missing-link counters are plan nodes, not driver-side collects)."""
    from extended_rabitq_spark.operators import cleanops

    docs = spark.createDataFrame(
        [(1, "t", "en", "s", 1)],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    emb = spark.createDataFrame([(1, [1.0])], "vec_id LONG, embedding ARRAY<DOUBLE>")
    st = spark.sparkContext.statusTracker()
    before = set(st.getJobIdsForGroup(None))
    df = cleanops.integrity_audit(docs, emb)
    after = set(st.getJobIdsForGroup(None))
    assert before == after, "audit construction must be lazy"
    assert df.collect()[0]["n_docs"] == 1


def test_span_dedup_merges_overlapping_windows(spark):
    # win=3: docs 1 and 2 share tokens 2..6 ("c d e f g") = three
    # duplicated 3-windows at i=2,3,4 in doc 1 -> ONE maximal span [2, 7).
    rows = [
        (1, "a b c d e f g h"),
        (2, "x y c d e f g z"),
    ]
    out = cleanops.span_dedup(_docs(spark, rows), win=3).collect()
    spans = {(r["doc_id"], r["start_tok"], r["end_tok"]): r for r in out}
    assert (1, 2, 7) in spans and spans[(1, 2, 7)]["span_windows"] == 3
    assert (2, 2, 7) in spans
    assert all(r["span_idx"] == 1 for r in out)  # one span per doc


def test_span_dedup_separate_islands_stay_separate(spark):
    # Shared windows at the start AND end with a unique middle: two spans.
    rows = [
        (1, "p q r UNIQ1 UNIQ2 UNIQ3 s t u"),
        (2, "p q r OTHER1 OTHER2 OTHER3 s t u"),
    ]
    out = {
        (r["doc_id"], r["span_idx"]): (r["start_tok"], r["end_tok"])
        for r in cleanops.span_dedup(_docs(spark, rows), win=3).collect()
    }
    assert out[(1, 1)] == (0, 3) and out[(1, 2)] == (6, 9)
    assert out[(2, 1)] == (0, 3) and out[(2, 2)] == (6, 9)


def test_span_dedup_short_docs_produce_no_windows(spark):
    rows = [(1, "a b"), (2, "a b")]
    assert cleanops.span_dedup(_docs(spark, rows), win=3).count() == 0


class TestLmTypicality:
    """Corpus char-LM typicality score (operators/lm_quality)."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(
            [(i, t, "en", "web", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    def test_garbage_scores_below_fluent(self, spark):
        from extended_rabitq_spark.operators import lm_quality

        fluent = [
            "the quick brown fox jumps over the lazy dog and then rests",
            "the quiet brown fox walks over the grassy field and rests",
            "a quick brown dog jumps over the lazy fox near the field",
            "the lazy dog rests near the quiet field and the brown fox",
        ]
        garbage = "zq xv qj wx kz jq vx zx qk jw zv xq kj wq"
        docs = self._docs(
            spark, [(i, t) for i, t in enumerate(fluent)] + [(99, garbage)]
        )
        got = {r.doc_id: (r.n_trans, r.score_fp)
               for r in lm_quality.lm_typicality(docs).collect()}
        mean = {d: s / n / lm_quality.FIXED_POINT
                for d, (n, s) in got.items() if n}
        assert all(mean[99] < mean[i] for i in range(len(fluent))), mean

    def test_external_model_and_unseen_transitions(self, spark):
        from extended_rabitq_spark.operators import lm_quality

        corpus = self._docs(spark, [(1, "abcabcabcabc"), (2, "abcabcabc")])
        lm = lm_quality.train_char_lm(corpus)
        new = self._docs(spark, [(10, "abcabc"), (11, "xyzxyz")])
        got = {r.doc_id: (r.n_trans, r.score_fp)
               for r in lm_quality.lm_typicality(new, lm=lm).collect()}
        # in-distribution shard: every transition seen, prob 1 each
        n, s = got[10]
        assert n == 4 and s == 4 * lm_quality.FIXED_POINT
        # unseen alphabet: all transitions miss the model -> score 0
        n, s = got[11]
        assert n == 4 and s == 0

    def test_short_docs_score_zero_transitions(self, spark):
        from extended_rabitq_spark.operators import lm_quality

        docs = self._docs(spark, [(1, "ab"), (2, ""), (3, "abcd")])
        got = {r.doc_id: (r.n_trans, r.score_fp)
               for r in lm_quality.lm_typicality(docs).collect()}
        assert got[1] == (0, 0) and got[2] == (0, 0)
        assert got[3][0] == 2


class TestKnBigramScore:
    """Interpolated Kneser-Ney word-bigram typicality
    (operators/lm_quality.kn_bigram_score, NEW r10)."""

    def _docs(self, spark, rows, lang="en"):
        return spark.createDataFrame(
            [(i, t, lang, "web", len(t)) for i, t in rows],
            "doc_id long, text string, lang string, source string, n_chars long",
        )

    def test_model_matches_float_kn_formula(self, spark):
        """The integer fixed-point model tracks the real-arithmetic
        interpolated-KN probability within composition rounding
        (each of the three rounded factors contributes <=1/2 ulp at
        1e-6 scale -> total drift < 2e-6)."""
        from extended_rabitq_spark.operators import lm_quality

        docs = self._docs(
            spark,
            [(1, "a b a b a c"), (2, "a b c a b"), (3, "b c a")],
        )
        model = {
            (r.w1, r.w2): r.p_fp
            for r in lm_quality.train_kn_bigram(docs).collect()
        }
        # independent float reference from hand-kept count tables
        from collections import Counter

        toks = [d.split() for d in ("a b a b a c", "a b c a b", "b c a")]
        c12 = Counter()
        for ts in toks:
            for x, y in zip(ts, ts[1:]):
                c12[(x, y)] += 1
        c1 = Counter()
        fwd = Counter()
        bwd = Counter()
        for (x, y), c in c12.items():
            c1[x] += c
            fwd[x] += 1
            bwd[y] += 1
        n_types = len(c12)
        D = 0.75
        for (x, y), c in c12.items():
            p = (c - D) / c1[x] + (D * fwd[x] / c1[x]) * (bwd[y] / n_types)
            assert abs(model[(x, y)] / 1e6 - p) < 2e-6, (x, y, p, model[(x, y)])

    def test_probabilities_bounded_and_positive(self, spark):
        from extended_rabitq_spark.operators import lm_quality

        docs = self._docs(
            spark,
            [(i, f"w{i} common w{i + 1} common tail{i % 3}") for i in range(20)],
        )
        rows = lm_quality.train_kn_bigram(docs).collect()
        assert rows
        for r in rows:
            assert 0 < r.p_fp <= lm_quality.FIXED_POINT + 1, r

    def test_garbage_scores_below_fluent(self, spark):
        from extended_rabitq_spark.operators import lm_quality

        fluent = [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown dog walks over the lazy fox",
            "a quick brown fox rests near the lazy dog",
            "the lazy dog rests near the quick brown fox",
        ]
        garbage = "zq kj wx vv qpf zzk jx wq kz vj xq"
        docs = self._docs(
            spark, [(i, t) for i, t in enumerate(fluent)] + [(99, garbage)]
        )
        got = {
            r.doc_id: (r.n_bigrams, r.kn_score_fp)
            for r in lm_quality.kn_bigram_score(docs).collect()
        }
        mean = {
            d: s / n / lm_quality.FIXED_POINT for d, (n, s) in got.items() if n
        }
        assert all(mean[99] < mean[i] for i in range(len(fluent))), mean

    def test_external_model_unseen_bigrams_score_zero(self, spark):
        from extended_rabitq_spark.operators import lm_quality

        corpus = self._docs(spark, [(1, "a b a b a b"), (2, "a b a b")])
        lm = lm_quality.train_kn_bigram(corpus)
        new = self._docs(spark, [(10, "a b a b"), (11, "x y x y")])
        got = {
            r.doc_id: (r.n_bigrams, r.kn_score_fp)
            for r in lm_quality.kn_bigram_score(new, lm=lm).collect()
        }
        assert got[10][0] == 3 and got[10][1] > 0
        assert got[11] == (3, 0)

    def test_short_and_empty_docs(self, spark):
        from extended_rabitq_spark.operators import lm_quality

        docs = self._docs(spark, [(1, "solo"), (2, ""), (3, "a b c")])
        got = {
            r.doc_id: (r.n_bigrams, r.kn_score_fp)
            for r in lm_quality.kn_bigram_score(docs).collect()
        }
        assert got[1] == (0, 0) and got[2] == (0, 0)
        assert got[3][0] == 2

    def test_languages_train_independent_models(self, spark):
        from extended_rabitq_spark.operators import lm_quality

        en = self._docs(spark, [(1, "a b a b a b a b")], lang="en")
        de = self._docs(spark, [(2, "a b a c a d a e")], lang="de")
        model = {
            (r.lang, r.w1, r.w2): r.p_fp
            for r in lm_quality.train_kn_bigram(en.unionByName(de)).collect()
        }
        # ("a","b") is 4/4 of en's a-continuations but 1/4 of de's
        assert model[("en", "a", "b")] > model[("de", "a", "b")]


class TestDecontaminateNgrams:
    """GPT-3/PaLM-style span-removal decontamination (n-gram collision
    + margin window)."""

    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_clean_doc_passes_through_normalized(self, spark):
        bench_text = " ".join(f"eval{i}" for i in range(20))
        doc_text = " ".join(f"word{i}" for i in range(30))
        df = self._df(spark, [(0, bench_text), (10, "  " + doc_text + "  ")])
        bench = df.select("doc_id").where("doc_id < 5")
        (row,) = cleanops.decontaminate_ngrams(df, bench, n=13, margin=2).collect()
        assert row["doc_id"] == 10
        assert row["n_tokens"] == 30 and row["n_removed"] == 0
        assert row["clean_text"] == doc_text  # == normalized input

    def test_collision_removes_span_plus_margin_only(self, spark):
        # doc = 10 clean + 13 quoted-eval + 10 clean tokens; margin=2
        # must remove tokens [8, 24] (13-gram at i=10, +-2), keeping
        # 8 + 8 = 16 tokens
        quoted = " ".join(f"eval{i}" for i in range(13))
        pre = " ".join(f"pre{i}" for i in range(10))
        post = " ".join(f"post{i}" for i in range(10))
        df = self._df(
            spark,
            [(0, "header " + quoted + " footer"), (10, f"{pre} {quoted} {post}")],
        )
        bench = df.select("doc_id").where("doc_id < 5")
        (row,) = cleanops.decontaminate_ngrams(df, bench, n=13, margin=2).collect()
        assert row["n_tokens"] == 33
        assert row["n_removed"] == 17  # 13 quoted + 2 margin each side
        kept = row["clean_text"].split(" ")
        assert kept == [f"pre{i}" for i in range(8)] + [f"post{i}" for i in range(2, 10)]

    def test_fully_contaminated_doc_empties(self, spark):
        quoted = " ".join(f"eval{i}" for i in range(15))
        df = self._df(spark, [(0, quoted), (10, quoted)])
        bench = df.select("doc_id").where("doc_id < 5")
        (row,) = cleanops.decontaminate_ngrams(df, bench, n=13, margin=2).collect()
        assert row["n_removed"] == row["n_tokens"] == 15
        assert row["clean_text"] == ""

    def test_short_docs_never_collide(self, spark):
        # fewer than n tokens -> no n-grams -> untouched even if the
        # text is a verbatim benchmark substring
        df = self._df(
            spark,
            [(0, " ".join(f"eval{i}" for i in range(20))),
             (10, " ".join(f"eval{i}" for i in range(5)))],
        )
        bench = df.select("doc_id").where("doc_id < 5")
        (row,) = cleanops.decontaminate_ngrams(df, bench, n=13, margin=2).collect()
        assert row["n_removed"] == 0 and row["n_tokens"] == 5

    def test_partitioning_invariant(self, spark):
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        bench = docs.select("doc_id").where("doc_id < 20")
        a = sorted(
            map(tuple, cleanops.decontaminate_ngrams(docs.coalesce(1), bench).collect())
        )
        b = sorted(
            map(
                tuple,
                cleanops.decontaminate_ngrams(docs.repartition(16), bench).collect(),
            )
        )
        assert a == b

    def test_plan_is_broadcast_only_jvm_only(self, spark):
        # benchmark hash set + covered-index list must broadcast (no
        # sort-merge shuffle at fixture scale) and the whole pipeline
        # stays JVM-side (no Python eval nodes)
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        bench = docs.select("doc_id").where("doc_id < 20")
        plan = (
            cleanops.decontaminate_ngrams(docs, bench)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
        assert "EvalPython" not in plan
