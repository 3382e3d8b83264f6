"""Multimodal plumbing tests: schema, Arrow batch shape, decoder registry
seam, and the media→feature→ANN-index bridge."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE
from extended_rabitq_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(50)
    return multimodal.docs_as_media(docs)


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,content:binary,"
        "meta:struct<width:int,height:int,sample_rate:int,n_frames:int>>"
    )


def test_metadata_no_decode(media):
    out = multimodal.media_metadata(media).collect()
    assert len(out) == 50
    assert all(r.n_bytes > 0 and len(r.content_sha256) == 64 for r in out)


def test_features_deterministic(media):
    f1 = {r.media_id: list(r.feat) for r in multimodal.extract_features(media).collect()}
    f2 = {r.media_id: list(r.feat) for r in multimodal.extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())


def test_unregistered_kind_raises(spark):
    # "tiff" has no registered decoder (jpeg gained a real one in r6)
    bad = spark.createDataFrame(
        [(1, "tiff", bytearray(b"xx"))], "media_id long, kind string, content binary"
    ).withColumn("meta", F.expr(
        "named_struct('width', 1, 'height', 1, 'sample_rate', CAST(NULL AS INT), "
        "'n_frames', CAST(NULL AS INT))"
    ))
    with pytest.raises(Exception, match="no decoder registered"):
        multimodal.extract_features(bad).collect()


def test_media_features_feed_ann_index(spark, media):
    """The multimodal→vector bridge: extracted features build a RaBitQ
    index and answer a self-query with itself as the nearest neighbor."""
    from extended_rabitq_spark.operators import ivf, knn, rabitq

    feats = multimodal.extract_features(media).select(
        F.col("media_id").alias("id"), F.col("feat").alias("vec")
    )
    res = knn.exact_knn(
        feats.limit(3).select(F.col("id").alias("qid"), F.col("vec").alias("qvec")),
        feats,
        k=1,
    )
    top = {r.qid: r.id for r in res.collect()}
    assert all(q == i for q, i in top.items())  # self is nearest (dist 0)


def test_frame_sampling_and_decode(spark):
    """sample_frames is pure metadata arithmetic (ceil(n_frames/2) rows
    per video); decode_frames materializes one deterministic feature per
    sampled frame via the registry stub."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(30)
    video = multimodal.docs_as_video(docs)
    nf = {r.media_id: r["meta"].n_frames for r in video.select("media_id", "meta").collect()}
    sampled = multimodal.sample_frames(video, every_n=2).collect()
    per_media = {}
    for r in sampled:
        per_media.setdefault(r.media_id, []).append(r.frame_idx)
        assert r.n_frames == nf[r.media_id]
    assert set(per_media) == set(nf)
    for mid, idxs in per_media.items():
        assert sorted(idxs) == list(range(0, nf[mid], 2))

    feats = multimodal.decode_frames(video, every_n=2).collect()
    assert len(feats) == len(sampled)
    by_key = {(r.media_id, r.frame_idx): tuple(r.feat) for r in feats}
    assert set(by_key) == {(r.media_id, r.frame_idx) for r in sampled}
    feats2 = {(r.media_id, r.frame_idx): tuple(r.feat)
              for r in multimodal.decode_frames(video, every_n=2).collect()}
    assert by_key == feats2  # deterministic codec
    assert all(len(v) == 8 and abs(sum(v) - 1.0) < 1e-6 for v in by_key.values())


def test_audio_chunking(spark):
    """Chunk plan covers every sample exactly once; last chunk is the
    remainder; start_ms consistent with the sample rate."""
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(25)
    audio = multimodal.docs_as_audio(docs)
    n_samp = {r.media_id: r.n for r in audio.select("media_id", F.length("content").alias("n")).collect()}
    rows = multimodal.chunk_audio(audio, chunk_samples=100).collect()
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r)
        assert r.start_ms == r.start_samp * 1000 // 8000
    assert set(per) == set(n_samp)
    for mid, chunks in per.items():
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        assert sum(c.chunk_len for c in chunks) == n_samp[mid]
        assert all(c.chunk_len == 100 for c in chunks[:-1])
        assert 1 <= chunks[-1].chunk_len <= 100


class TestPerceptualHash:
    @staticmethod
    def _install_raw_decoder():
        """A test decoder whose output pixels come straight from the
        content bytes — lets tests plant images with controlled pixel
        (hence Hamming) differences, unlike the sha-seeded fake codec."""
        import numpy as np

        from extended_rabitq_spark.operators import multimodal

        def raw(content: bytes) -> np.ndarray:
            a = np.frombuffer(content, dtype=np.uint8)[:64]
            return np.pad(a, (0, 64 - a.size)).reshape(8, 8)

        multimodal.register_decoder("rawimg", raw)

    def _media(self, spark, rows):
        return spark.createDataFrame(
            [(i, "rawimg", bytearray(bs)) for i, bs in rows],
            "media_id long, kind string, content binary",
        )

    def test_phash_matches_numpy_reference(self, spark):
        import numpy as np

        from extended_rabitq_spark.operators import multimodal

        self._install_raw_decoder()
        rng = np.random.default_rng(3)
        rows = [(i, bytes(rng.integers(0, 256, 64, dtype=np.uint8))) for i in range(10)]
        got = {
            r.media_id: r.phash
            for r in multimodal.perceptual_hash(self._media(spark, rows)).collect()
        }
        for i, bs in rows:
            a = np.frombuffer(bs, dtype=np.uint8).astype(np.float64)
            bits = (a > a.mean()).astype(np.uint64)
            w = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
            exp = int((bits * w).sum(dtype=np.uint64).astype(np.int64))
            assert got[i] == exp

    def test_phash_block_averages_large_decodes(self, spark):
        """ADVICE r4: a decoder yielding a 16×16 image must block-average
        to 8×8 (not silently hash the top-left 64 values), and a
        non-image-shaped decode must raise — scale invariance is the
        point of aHash."""
        import numpy as np

        from extended_rabitq_spark.operators import multimodal

        def big(content: bytes) -> np.ndarray:
            a = np.frombuffer((content * 64)[:256], dtype=np.uint8).astype(
                np.float64
            ).reshape(16, 16)
            return a

        multimodal.register_decoder("bigimg", big)
        content = bytes(np.random.default_rng(7).integers(0, 256, 64, dtype=np.uint8))
        media = spark.createDataFrame(
            [(1, "bigimg", bytearray(content))],
            "media_id long, kind string, content binary",
        )
        (got,) = multimodal.perceptual_hash(media).collect()
        # numpy reference: 2×2 block means, then aHash
        a = big(content)
        small = a.reshape(8, 2, 8, 2).mean(axis=(1, 3)).ravel()
        bits = (small > small.mean()).astype(np.uint64)
        w = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
        assert got.phash == int((bits * w).sum(dtype=np.uint64).astype(np.int64))

        # tiny-but-valid decodes zero-pad to 64 (a 2×2 tracking pixel
        # must not abort a corpus-wide job); an EMPTY decode raises
        def tiny(content: bytes) -> np.ndarray:
            return np.arange(4, dtype=np.float64)  # 2×2 "image", raveled

        multimodal.register_decoder("tinyimg", tiny)
        media_tiny = spark.createDataFrame(
            [(1, "tinyimg", bytearray(b"x"))],
            "media_id long, kind string, content binary",
        )
        (row,) = multimodal.perceptual_hash(media_tiny).collect()
        padded = np.pad(np.arange(4, dtype=np.float64), (0, 60))
        bits = (padded > padded.mean()).astype(np.uint64)
        w64 = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
        assert row.phash == int((bits * w64).sum(dtype=np.uint64).astype(np.int64))

        def empty(content: bytes) -> np.ndarray:
            return np.zeros(0)

        multimodal.register_decoder("emptyimg", empty)
        media_bad = spark.createDataFrame(
            [(1, "emptyimg", bytearray(b"x"))],
            "media_id long, kind string, content binary",
        )
        import pytest as _pytest

        with _pytest.raises(Exception, match="decoder contract"):
            multimodal.perceptual_hash(media_bad).collect()

    def test_planted_near_dups_and_exact_dups(self, spark):
        import numpy as np

        from extended_rabitq_spark.operators import multimodal

        self._install_raw_decoder()
        rng = np.random.default_rng(5)
        base = rng.integers(0, 256, 64, dtype=np.uint8)
        # flip 3 pixels hard (dark<->bright) → small Hamming distance
        near = base.copy()
        near[[3, 17, 42]] = 255 - near[[3, 17, 42]]
        far = rng.integers(0, 256, 64, dtype=np.uint8)
        rows = [(1, bytes(base)), (2, bytes(base)), (3, bytes(near)), (4, bytes(far))]
        pairs = {
            (r.id_a, r.id_b): r.hamming
            for r in multimodal.phash_pairs(
                self._media(spark, rows), max_hamming=8
            ).collect()
        }
        assert pairs[(1, 2)] == 0  # exact duplicate content
        assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 8
        assert pairs[(1, 3)] == pairs[(2, 3)]
        assert (1, 4) not in pairs and (3, 4) not in pairs

    def test_banding_is_lossless_vs_bruteforce(self, spark):
        """Pigeonhole guarantee: the banded candidate join finds EVERY
        pair within the Hamming budget — compare against an all-pairs
        numpy scan on 60 random images."""
        import itertools

        import numpy as np

        from extended_rabitq_spark.operators import multimodal

        self._install_raw_decoder()
        rng = np.random.default_rng(11)
        # half-random, half-perturbed so some pairs land under the budget
        imgs = [rng.integers(0, 256, 64, dtype=np.uint8) for _ in range(30)]
        for i in range(30):
            p = imgs[i].copy()
            flips = rng.integers(0, 64, rng.integers(1, 5))
            p[flips] = 255 - p[flips]
            imgs.append(p)
        rows = [(i, bytes(a)) for i, a in enumerate(imgs)]
        D = 6
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in multimodal.phash_pairs(self._media(spark, rows), max_hamming=D).collect()
        }

        def ph(a):
            x = a.astype(np.float64)
            bits = (x > x.mean()).astype(np.uint64)
            w = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
            return (bits * w).sum(dtype=np.uint64)

        hashes = [ph(a) for a in imgs]
        exp = {}
        for i, j in itertools.combinations(range(len(imgs)), 2):
            h = bin(int(hashes[i] ^ hashes[j])).count("1")
            if h <= D:
                exp[(i, j)] = h
        assert got == exp


class TestOddShapeHashing:
    """ADVICE r5: banner/tall-narrow images and shape-vs-kind routing."""

    W = None  # set lazily

    @staticmethod
    def _expected_bucket_hash(arr):
        import numpy as np

        flat = arr.astype(np.float64).ravel()
        if flat.size < 64:
            flat = np.pad(flat, (0, 64 - flat.size))
        if flat.size > 64:
            flat = np.array([s.mean() for s in np.array_split(flat, 64)])
        bits = (flat > flat.mean()).astype(np.uint64)
        w = np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64)
        return int((bits * w).sum(dtype=np.uint64).astype(np.int64))

    def test_banner_and_tall_narrow_images_hash_as_2d_content(self, spark):
        import numpy as np

        from extended_rabitq_spark.operators import multimodal

        rng = np.random.default_rng(11)
        banner = rng.integers(0, 256, (4, 100)).astype(np.float64)   # 4×100
        tall = rng.integers(0, 256, (100, 4)).astype(np.float64)     # 100×4
        shapes = {1: banner, 2: tall}

        def odd(content: bytes) -> np.ndarray:
            return shapes[content[0]]

        multimodal.register_decoder("oddimg", odd)
        media = spark.createDataFrame(
            [(1, "oddimg", bytearray([1])), (2, "oddimg", bytearray([2]))],
            "media_id long, kind string, content binary",
        )
        got = {r.media_id: r.phash
               for r in multimodal.perceptual_hash(media).collect()}
        # no ValueError poison-row abort, and the hash is the row-major
        # 2-D ravel bucket-average — NOT an audio-style mono mixdown of
        # the tall-narrow image
        assert got[1] == self._expected_bucket_hash(banner)
        assert got[2] == self._expected_bucket_hash(tall)
        mixed = tall.mean(axis=1)  # the pre-fix (wrong) signal treatment
        assert got[2] != self._expected_bucket_hash(mixed)

    def test_audio_kind_still_mixes_down_to_mono(self, spark):
        import numpy as np

        from extended_rabitq_spark.operators import multimodal

        rng = np.random.default_rng(12)
        stereo = rng.integers(-(2**15), 2**15, (100, 2)).astype(np.float64)

        def aud(content: bytes) -> np.ndarray:
            return stereo

        multimodal.register_decoder("testaud", aud, audio=True)
        try:
            media = spark.createDataFrame(
                [(1, "testaud", bytearray(b"x"))],
                "media_id long, kind string, content binary",
            )
            (row,) = multimodal.perceptual_hash(media).collect()
            assert row.phash == self._expected_bucket_hash(stereo.mean(axis=1))
        finally:
            multimodal._DECODERS.pop("testaud", None)
            multimodal._AUDIO_KINDS.discard("testaud")

    def test_wav_kind_registered_as_audio(self):
        from extended_rabitq_spark.operators import multimodal

        assert "wav" in multimodal._AUDIO_KINDS
        assert "png" not in multimodal._AUDIO_KINDS
