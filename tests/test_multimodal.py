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
    bad = spark.createDataFrame(
        [(1, "jpeg", bytearray(b"xx"))], "media_id long, kind string, content binary"
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
