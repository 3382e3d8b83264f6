"""BPE tokenizer (operators/bpe.py): hand-checkable merges, round-trip,
compression, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from extended_rabitq_spark.operators import bpe

from conftest import SF_SMOKE


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT",
    )


class TestTrain:
    def test_first_merges_hand_checked(self, spark):
        """Corpus 'low low low lower lower newest' — classic Sennrich
        example shape: the most frequent pair is ('l','o') (5 words
        contain it), then ('lo','w')."""
        docs = _docs(spark, ["low low low lower lower newest"])
        merges = bpe.train_bpe(docs, n_merges=2)
        assert merges[0] == ("l", "o")
        assert merges[1] == ("lo", f"w{bpe.EOW}") or merges[1] == ("lo", "w")

    def test_deterministic(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        a = bpe.train_bpe(docs, n_merges=40)
        b = bpe.train_bpe(docs.repartition(7), n_merges=40)
        assert a == b and len(a) == 40

    def test_stops_when_no_repeating_pairs(self, spark):
        docs = _docs(spark, ["ab cd ef"])
        merges = bpe.train_bpe(docs, n_merges=50)
        assert len(merges) < 50  # count<2 cutoff fires


class TestApply:
    def test_round_trip_and_compression(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(100)
        merges = bpe.train_bpe(docs, n_merges=200)
        toks = bpe.bpe_tokenize(docs, merges)
        joined = toks.join(docs, "doc_id").select(
            "doc_id",
            F.expr(bpe.detokenize_expr("tokens")).alias("rt"),
            F.expr(
                "trim(regexp_replace(lower(text), '\\\\s+', ' '))"
            ).alias("norm"),
            "n_tokens",
            F.length(F.expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))")).alias("nc"),
        )
        rows = joined.collect()
        assert all(r.rt == r.norm for r in rows)  # lossless round-trip
        # merges compress: fewer tokens than characters, more than words
        assert all(0 < r.n_tokens <= r.nc for r in rows)
        total_chars = sum(r.nc for r in rows)
        total_toks = sum(r.n_tokens for r in rows)
        assert total_toks < 0.8 * total_chars

    def test_more_merges_fewer_tokens(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(100)
        m50 = bpe.train_bpe(docs, n_merges=50)
        m300 = bpe.train_bpe(docs, n_merges=300)
        n50 = bpe.bpe_tokenize(docs, m50).agg(F.sum("n_tokens")).first()[0]
        n300 = bpe.bpe_tokenize(docs, m300).agg(F.sum("n_tokens")).first()[0]
        assert n300 < n50

    def test_unseen_words_fall_back_to_chars(self, spark):
        train = _docs(spark, ["aaa aaa aaa bbb"])
        merges = bpe.train_bpe(train, n_merges=5)
        new = _docs(spark, ["zqx"])
        row = bpe.bpe_tokenize(new, merges).first()
        assert row.tokens == ["z", "q", f"x{bpe.EOW}"]


class TestPersistAndCLI:
    def test_save_load_merges_round_trip(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
        merges = bpe.train_bpe(docs, n_merges=30)
        p = str(tmp_path / "merges.json")
        bpe.save_merges(merges, p)
        assert bpe.load_merges(p) == merges

    def test_cli_tokenize_train_then_reuse(self, spark, tmp_path, capsys):
        from extended_rabitq_spark import cli

        out1 = str(tmp_path / "t1.parquet")
        out2 = str(tmp_path / "t2.parquet")
        mp = str(tmp_path / "m.json")
        docs = f"{SF_SMOKE}/documents.parquet"
        assert cli.main(["tokenize", docs, out1, "--n-merges", "50", "--merges", mp]) == 0
        assert "tokenized" in capsys.readouterr().out
        # second run loads the saved merges -> identical token counts
        assert cli.main(["tokenize", docs, out2, "--merges", mp]) == 0
        a = sorted(map(tuple, spark.read.parquet(out1).select("doc_id", "n_tokens").collect()))
        b = sorted(map(tuple, spark.read.parquet(out2).select("doc_id", "n_tokens").collect()))
        assert a == b


class TestReviewRegressions:
    def test_reserved_marker_stripped_not_corrupting(self, spark):
        docs = _docs(spark, [f"foo{bpe.EOW}bar baz"])
        merges = bpe.train_bpe(_docs(spark, ["baz baz baz"]), n_merges=3)
        row = bpe.bpe_tokenize(docs, merges).first()
        rt = docs.sparkSession.createDataFrame(
            [(row.tokens,)], "tokens array<string>"
        ).selectExpr(bpe.detokenize_expr("tokens") + " AS t").first().t
        assert rt == "foobar baz"  # marker stripped, words intact

    def test_string_id_column_supported(self, spark):
        docs = spark.createDataFrame(
            [("u-1", "hello world"), ("u-2", "hello hello")],
            "doc_id STRING, text STRING",
        )
        merges = bpe.train_bpe(docs, n_merges=5)
        rows = {r.doc_id: r.n_tokens for r in bpe.bpe_tokenize(docs, merges).collect()}
        assert set(rows) == {"u-1", "u-2"} and all(v > 0 for v in rows.values())

    def test_incremental_trainer_matches_reference_loop(self, spark):
        """The indexed incremental trainer must produce the same merges
        as a brute-force full-recount reference on a real corpus."""
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(60)
        got = bpe.train_bpe(docs, n_merges=60)

        freqs = bpe.word_frequencies(docs)
        words = {w: tuple(w[:-1]) + (w[-1] + bpe.EOW,) for w in freqs}
        ref = []
        for _ in range(60):
            pc = {}
            for w, sym in words.items():
                for a, b in zip(sym, sym[1:]):
                    pc[(a, b)] = pc.get((a, b), 0) + freqs[w]
            live = [(p, c) for p, c in pc.items() if c >= 2]
            if not live:
                break
            pair, _ = min(live, key=lambda kv: (-kv[1], kv[0]))
            ref.append(pair)
            nw = {}
            for w, sym in words.items():
                out, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and (sym[i], sym[i + 1]) == pair:
                        out.append(pair[0] + pair[1]); i += 2
                    else:
                        out.append(sym[i]); i += 1
                nw[w] = tuple(out)
            words = nw
        assert got == ref


class TestTwoStageWordFrequencies:
    def test_identical_to_single_stage_on_corpus(self, spark):
        # Exactness, not just superset: same deterministic tiebreak on
        # both paths => identical dicts (VERDICT r6 item 7).
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        one = bpe.word_frequencies(docs, top_words=300)
        two = bpe.word_frequencies_two_stage(docs, top_words=300, n_buckets=8)
        assert one == two

    def test_identical_under_small_caps_and_buckets(self, spark):
        # cap smaller than the vocabulary, buckets > distinct words in
        # some buckets — the pre-cut must still keep every global winner
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        one = bpe.word_frequencies(docs, top_words=25)
        two = bpe.word_frequencies_two_stage(docs, top_words=25, n_buckets=64)
        assert one == two

    def test_partitioning_invariant(self, spark):
        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        a = bpe.word_frequencies_two_stage(docs.coalesce(1), top_words=100)
        b = bpe.word_frequencies_two_stage(docs.repartition(16), top_words=100)
        assert a == b

    def test_two_stage_precut_is_partial_window_group_limit(self, spark):
        # the salt-bucket pre-cut must compile to a map-side partial
        # WindowGroupLimit (pre-shuffle top-K per bucket), or the
        # "driver-merge-free" claim is hollow
        from pyspark.sql import Window, functions as F
        from extended_rabitq_spark.functions import text as T

        docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        wc = (
            docs.select(F.explode(F.expr(T.tokens("text"))).alias("w"))
            .where(F.col("w") != "")
            .groupBy("w")
            .agg(F.count("*").alias("c"))
            .withColumn("b", F.pmod(F.xxhash64("w"), F.lit(8)))
        )
        win = Window.partitionBy("b").orderBy(F.col("c").desc(), F.col("w").asc())
        cand = wc.withColumn("rn", F.row_number().over(win)).where(F.col("rn") <= 100)
        plan = cand._jdf.queryExecution().executedPlan().toString()
        assert "WindowGroupLimit" in plan and "Partial" in plan
