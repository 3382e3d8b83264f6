"""Multimodal binary-column plumbing (north-star surface; BASELINE.json).

Images/audio/video are opaque ``BINARY`` columns with typed metadata
structs.  The Spark-side plumbing — schemas, Arrow batch shapes,
``mapInPandas`` signatures, partitioning — is real and tested; the codec
step itself is stubbed (no image/audio libs in this container) behind
:func:`register_decoder`: a deterministic fake decoder ships for tests,
and ``NotImplementedError`` marks the seam where PIL/ffmpeg decoders plug
in on a real cluster.

Scale notes: binary payloads dominate row size → keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of
blobs fits executor memory; metadata-only transformations select away the
``content`` column so parquet column pruning skips the blob bytes
entirely (verify ReadSchema in the plan).
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, content binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

_DECODERS: dict[str, Callable[[bytes], np.ndarray]] = {}

# Kinds whose 2-D decodes are (n_samples, n_channels) signals rather than
# (H, W) images — perceptual_hash mixes these to mono; image kinds keep
# their 2-D content even when tall-and-narrow (ADVICE r5).
_AUDIO_KINDS: set[str] = set()


def register_decoder(
    kind: str, fn: Callable[[bytes], np.ndarray], audio: bool = False
) -> None:
    _DECODERS[kind] = fn
    if audio:
        _AUDIO_KINDS.add(kind)
    else:
        _AUDIO_KINDS.discard(kind)


def _fake_decode(content: bytes) -> np.ndarray:
    """Deterministic fake decoder: sha256-seeded 8×8 'image'.  Stands in
    for PIL/libav so the batch plumbing is testable in this container."""
    seed = int.from_bytes(hashlib.sha256(content).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(8, 8), dtype=np.uint8)


register_decoder("fake", _fake_decode)

# Real pure-stdlib codecs (round 5): PNG/PPM/PGM/BMP images and PCM WAV
# audio decode with zlib/struct only — no PIL/ffmpeg needed — so these
# kinds run the full surface (extract_features, perceptual_hash,
# phash_pairs, decode_frames) un-stubbed.  Baseline JPEG joined in r6,
# progressive JPEG (spectral selection + successive approximation) in
# r7 (decode_jpeg); arithmetic-coded JPEG and video still raise through
# the seam.
from ..sources import codecs as _codecs  # noqa: E402  (registry wiring)

register_decoder("png", _codecs.decode_png)
register_decoder("ppm", _codecs.decode_pnm)
register_decoder("pgm", _codecs.decode_pnm)
register_decoder("bmp", _codecs.decode_bmp)
register_decoder("wav", _codecs.decode_wav, audio=True)
register_decoder("jpeg", _codecs.decode_jpeg)
register_decoder("jpg", _codecs.decode_jpeg)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Fixture adapter: wrap document text bytes as a media table with the
    canonical schema (media_id, kind, content BINARY, meta struct)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("fake").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.expr(
            "named_struct('width', 8, 'height', 8, 'sample_rate', CAST(NULL AS INT), "
            "'n_frames', CAST(NULL AS INT))"
        ).alias("meta"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Metadata-only pass: sizes + content hash WITHOUT decoding.  Selects
    prune to (media_id, kind, content) → blob column read once, no Python."""
    return media.select(
        "media_id",
        "kind",
        F.length("content").cast("long").alias("n_bytes"),
        F.sha2("content", 256).alias("content_sha256"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def extract_features(media: DataFrame, out_dim: int = 16) -> DataFrame:
    """Decode + feature-extract via Arrow-batched ``mapInPandas`` →
    (media_id, feat ARRAY<FLOAT>).

    The per-kind decoder is looked up in the registry; unknown kinds raise
    ``NotImplementedError`` at the task (the deliberate stub seam).  The
    'feature' is a mean-pooled pixel histogram — deterministic, so tests
    pin exact values.  Output embeds straight into the ANN index
    (build_index) — the multimodal→vector bridge.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for kind, content in zip(pdf["kind"], pdf["content"]):
                dec = _DECODERS.get(kind)
                if dec is None:
                    raise NotImplementedError(
                        f"no decoder registered for media kind {kind!r}; "
                        "register one with multimodal.register_decoder"
                    )
                arr = dec(bytes(content)).astype(np.float64).ravel()
                hist, _ = np.histogram(arr, bins=out_dim, range=(0, 256))
                feats.append((hist / max(arr.size, 1)).astype(np.float32))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feat": feats})

    return media.select("media_id", "kind", "content").mapInPandas(
        run, "media_id long, feat array<float>"
    )


def docs_as_video(docs: DataFrame) -> DataFrame:
    """Fixture adapter for the frame-sampling path: text bytes as fake
    'video' blobs with a deterministic frame count derived from n_chars
    (1..7 frames) so the sampler has real per-row variation."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("fake").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.expr(
            "named_struct('width', 8, 'height', 8, 'sample_rate', CAST(NULL AS INT), "
            "'n_frames', CAST(1 + n_chars % 7 AS INT))"
        ).alias("meta"),
    )


def sample_frames(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame sampling: every ``every_n``-th frame index per video →
    (media_id, frame_idx, n_frames).

    Pure metadata arithmetic (sequence + explode, no Python, no blob
    read — column pruning drops ``content``): the selection plan for
    which frames to decode.  Feed the result through
    :func:`decode_frames` to materialize per-frame features; at 100 TB
    the explode keeps blob bytes out of the shuffle because only
    (media_id, frame_idx) rows move."""
    return media.select(
        "media_id",
        F.explode(F.expr(f"sequence(0, meta.n_frames - 1, {every_n})")).alias("_fi"),
        F.col("meta.n_frames").cast("long").alias("n_frames"),
    ).select("media_id", F.col("_fi").cast("long").alias("frame_idx"), "n_frames")


def decode_frames(media: DataFrame, every_n: int = 2, out_dim: int = 8) -> DataFrame:
    """Decode the sampled frames via the decoder registry →
    (media_id, frame_idx, feat ARRAY<FLOAT>).

    The blob is decoded once per media row inside an Arrow batch and the
    sampled frames are sliced from it (fake codec: frame f = decode of
    content salted with f).  Same stub seam as :func:`extract_features` —
    a real ffmpeg decoder slots into the registry unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out_m, out_f, out_feat = [], [], []
            for mid, kind, content, nf in zip(
                pdf["media_id"], pdf["kind"], pdf["content"], pdf["n_frames"]
            ):
                dec = _DECODERS.get(kind)
                if dec is None:
                    raise NotImplementedError(
                        f"no decoder registered for media kind {kind!r}; "
                        "register one with multimodal.register_decoder"
                    )
                for f in range(0, int(nf), every_n):
                    arr = dec(bytes(content) + f.to_bytes(4, "big")).astype(np.float64).ravel()
                    hist, _ = np.histogram(arr, bins=out_dim, range=(0, 256))
                    out_m.append(mid)
                    out_f.append(f)
                    out_feat.append((hist / max(arr.size, 1)).astype(np.float32))
            yield pd.DataFrame({"media_id": out_m, "frame_idx": out_f, "feat": out_feat})

    src = media.select(
        "media_id", "kind", "content", F.col("meta.n_frames").alias("n_frames")
    )
    return src.mapInPandas(run, "media_id long, frame_idx long, feat array<float>")


def docs_as_audio(docs: DataFrame) -> DataFrame:
    """Fixture adapter for the audio path: text bytes as fake PCM blobs
    (1 byte = 1 sample) at a nominal 8 kHz sample rate.  For audio,
    ``meta.n_frames`` carries the total sample count — like a real
    container header, so chunk planning never touches the blob."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("fake").alias("kind"),
        F.encode("text", "UTF-8").alias("content"),
        F.expr(
            "named_struct('width', CAST(NULL AS INT), 'height', CAST(NULL AS INT), "
            "'sample_rate', 8000, 'n_frames', CAST(n_chars AS INT))"
        ).alias("meta"),
    )


def chunk_audio(media: DataFrame, chunk_samples: int = 2048) -> DataFrame:
    """Audio chunking: fixed-size sample windows per blob →
    (media_id, chunk_idx, start_samp, chunk_len, start_ms).

    Metadata arithmetic only (sample count from the container header in
    ``meta.n_frames``, never the blob — asserted on the plan's
    ReadSchema) — the chunk plan a feature extractor maps over.  Like
    :func:`sample_frames`, only the tiny chunk-index rows shuffle; blob
    bytes stay in place until a decoder needs them."""
    src = media.select(
        "media_id",
        F.col("meta.n_frames").cast("long").alias("n_samp"),
        F.col("meta.sample_rate").cast("long").alias("sr"),
    )
    return (
        src.select(
            "media_id",
            "n_samp",
            "sr",
            F.explode(
                F.expr(f"sequence(0, CAST(ceil(n_samp / {chunk_samples}.0) AS INT) - 1)")
            ).alias("_ci"),
        )
        .select(
            "media_id",
            F.col("_ci").cast("long").alias("chunk_idx"),
            (F.col("_ci") * chunk_samples).cast("long").alias("start_samp"),
            F.least(
                F.lit(chunk_samples).cast("long"),
                F.col("n_samp") - F.col("_ci") * chunk_samples,
            ).alias("chunk_len"),
            F.expr(f"CAST(_ci * {chunk_samples} * 1000 div sr AS BIGINT)").alias("start_ms"),
        )
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes metadata through with the new target dims;
    the pixel transform is the stubbed codec step (NotImplementedError on
    non-fake kinds at execution, same seam as extract_features)."""
    return media.withColumn(
        "meta",
        F.expr(
            f"named_struct('width', {width}, 'height', {height}, "
            "'sample_rate', meta.sample_rate, 'n_frames', meta.n_frames)"
        ),
    )


def perceptual_hash(media: DataFrame) -> DataFrame:
    """64-bit average-hash per media row → (media_id, phash BIGINT).

    Decode via the registry seam (the one Python stage — Arrow-batched),
    then aHash: resize-to-8×8 is the decoder's contract here, bit i = 1
    iff pixel i > the image mean, packed row-major into a signed int64.
    Classic perceptual image fingerprint: visually-near images differ in
    few bits, so near-dup detection becomes small-Hamming search."""

    def to_8x8(kind: str, raw: np.ndarray) -> np.ndarray:
        """Decoder output → 64 values to hash.  Exactly 64 values pass
        through; a ≥8×8 2-D image block-averages down to 8×8 (mean over
        an 8×8 grid of cells — deterministic, no interpolation lib).
        Channels collapse first: gray+alpha (C=2) keeps the gray plane,
        color (C=3/4) averages RGB; multi-channel AUDIO (n, ch) mixes
        down to mono — gated on the media kind, not the array shape, so
        a tall-narrow image (e.g. 100×4 banner) keeps its 2-D content
        (ADVICE r5).  Everything else non-empty bucket-averages its
        row-major ravel into 64 segments (zero-padding first when
        < 64 values — tracking pixels, favicons, sub-64-sample clips);
        only an EMPTY decode raises, so a poison row can't abort a
        corpus-wide mapInPandas job (ADVICE r5).  Oversized decodes
        never truncate — silently hashing a corner of a big decode
        would quietly gut near-dup recall (ADVICE r4)."""
        arr = raw.astype(np.float64)
        if arr.size == 0:
            raise ValueError(
                f"perceptual_hash decoder contract: empty decode "
                f"(kind={kind!r}, shape {raw.shape})"
            )
        if arr.ndim == 3:  # H×W×C image → gray plane
            if arr.shape[-1] == 2:  # gray + alpha (e.g. PNG color type 4)
                arr = arr[..., 0]
            elif arr.shape[-1] in (1, 3, 4):
                arr = arr[..., : min(arr.shape[-1], 3)].mean(axis=-1)
        if arr.ndim == 2 and kind in _AUDIO_KINDS:  # (n, ch) → mono
            arr = arr.mean(axis=1)
        if arr.size == 64:
            return arr.ravel()
        if arr.ndim == 2 and arr.shape[0] >= 8 and arr.shape[1] >= 8:
            return np.array(
                [
                    [c.mean() for c in np.array_split(r8, 8, axis=1)]
                    for r8 in np.array_split(arr, 8, axis=0)
                ]
            ).ravel()
        flat = arr.ravel()
        if flat.size < 64:
            flat = np.pad(flat, (0, 64 - flat.size))
        if flat.size == 64:
            return flat
        return np.array([seg.mean() for seg in np.array_split(flat, 64)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = (np.uint64(1) << np.arange(63, -1, -1, dtype=np.uint64))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = []
            for kind, content in zip(pdf["kind"], pdf["content"]):
                dec = _DECODERS.get(kind)
                if dec is None:
                    raise NotImplementedError(
                        f"no decoder registered for media kind {kind!r}; "
                        "register one with multimodal.register_decoder"
                    )
                arr = to_8x8(kind, dec(bytes(content)))
                bits = (arr > arr.mean()).astype(np.uint64)
                out.append(int((bits * weights).sum(dtype=np.uint64).astype(np.int64)))
            yield pd.DataFrame({"media_id": pdf["media_id"], "phash": out})

    return media.select("media_id", "kind", "content").mapInPandas(
        run, "media_id long, phash long"
    )


def phash_pairs(media: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Perceptual near-dup pairs → (id_a, id_b, hamming ≤ max_hamming).

    LOSSLESS pigeonhole banding, exactly like the SimHash text path: the
    64-bit hash splits into ``max_hamming + 1`` contiguous bit bands —
    any pair within the Hamming budget must agree exactly on ≥1 band —
    so candidates come from a plain equi-join on (band, key) and the
    exact Hamming distance is a JVM ``bit_count(a ^ b)`` post-filter.
    Only the decode stage is Python; at 100 TB the phash table is tiny
    (16 bytes/row) and the join shuffles only band keys.  Band-key skew
    (e.g. monochrome boilerplate images hashing identically) is the
    same DF_CAP/AQE story as text banding."""
    B = max_hamming + 1
    ph = perceptual_hash(media)
    # contiguous bands: first (64 % B) bands get an extra bit
    widths = [64 // B + (1 if i < 64 % B else 0) for i in range(B)]
    offs = [sum(widths[:i]) for i in range(B)]
    band_cols = [
        F.struct(
            F.lit(i).alias("band"),
            (
                F.shiftrightunsigned(F.col("phash"), 64 - offs[i] - widths[i])
                .bitwiseAND(F.lit((1 << widths[i]) - 1))
            ).alias("key"),
        )
        for i in range(B)
    ]
    bands = ph.select(
        "media_id", F.explode(F.array(*band_cols)).alias("bk")
    ).select("media_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = bands.withColumnRenamed("media_id", "id_a")
    b = bands.withColumnRenamed("media_id", "id_b")
    cand = (
        a.join(b, on=["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    pa = ph.select(F.col("media_id").alias("id_a"), F.col("phash").alias("pa"))
    pb = ph.select(F.col("media_id").alias("id_b"), F.col("phash").alias("pb"))
    return (
        cand.join(pa, "id_a")
        .join(pb, "id_b")
        .select(
            "id_a", "id_b",
            F.bit_count(F.col("pa").bitwiseXOR(F.col("pb"))).cast("int").alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
