"""Env-gated PIL decoders through the codec seam (VERDICT r7 item 6).

The container ships no Pillow, so this module SKIPS here — on any
machine with Pillow installed it becomes the proof that the production
decode seam (`operators/multimodal.register_decoder`) accepts a real
imaging library with zero plan changes:

1. a PIL-backed decode function registers for a new media kind and
   drives `perceptual_hash` end-to-end through the same `mapInPandas`
   plan as the pure-stdlib decoders;
2. PIL decode output is pinned EQUAL to the pure-stdlib decoders
   (`sources/codecs.py`) on the committed fixtures — bitwise for the
   lossless formats (PNG incl. Adam7/palette/filters, BMP, PPM);
   for JPEG, luma within IDCT rounding and a bounded RGB mean: on
   4:2:0 files the chroma UPSAMPLING FILTER is decoder's choice
   (nearest here, triangular in libjpeg) so full-RGB max deltas at
   chroma edges are legitimate — measured against the JDK's ImageIO
   decoder in tests/test_codecs_imageio.py, the executed twin of this
   module;
3. malformed blobs (truncated at arbitrary points) raise a bounded
   exception on BOTH sides — neither decoder hangs or returns garbage
   silently.

Run: `pip install Pillow && python -m pytest tests/test_codecs_pil.py`.
"""

from __future__ import annotations

import io

import numpy as np
import pytest

pytest.importorskip("PIL", reason="Pillow not installed (expected in this container)")

from PIL import Image  # noqa: E402

from extended_rabitq_spark.operators import multimodal  # noqa: E402
from extended_rabitq_spark.sources import codecs  # noqa: E402

# test-local independent encoders (separate implementation path from the
# decoders under test)
from test_codecs import (  # noqa: E402
    FIXTURES,
    encode_bmp,
    encode_png,
    encode_png_adam7,
    encode_ppm,
)


def pil_decode(data: bytes) -> np.ndarray:
    """PIL-backed decode with the same output contract as
    `sources/codecs.py`: uint8 (H, W) gray or (H, W, C)."""
    img = Image.open(io.BytesIO(data))
    if img.mode == "P":  # palette → RGB, matching decode_png's expansion
        img = img.convert("RGB")
    img.load()
    return np.asarray(img)


def _gradient_rgb(h: int = 24, w: int = 32) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [(xx * 8) % 256, (yy * 11) % 256, (xx * 3 + yy * 5) % 256], axis=-1
    ).astype(np.uint8)


class TestLosslessBitwiseParity:
    """PIL and the pure-stdlib decoders agree bit-for-bit on lossless
    formats — the strongest possible seam-equivalence statement."""

    def test_png_all_filters(self):
        img = _gradient_rgb()
        for filters in ([0, 1, 2, 3, 4], None):
            blob = encode_png(img, filters)
            np.testing.assert_array_equal(pil_decode(blob), codecs.decode_png(blob))

    def test_png_adam7_interlaced(self):
        img = _gradient_rgb(21, 13)  # non-multiple dims stress the passes
        blob = encode_png_adam7(img)
        np.testing.assert_array_equal(pil_decode(blob), codecs.decode_png(blob))

    def test_bmp_24bit(self):
        img = _gradient_rgb()
        blob = encode_bmp(img)
        np.testing.assert_array_equal(pil_decode(blob), codecs.decode_bmp(blob))

    def test_ppm_binary(self):
        img = _gradient_rgb()
        blob = encode_ppm(img)
        np.testing.assert_array_equal(pil_decode(blob), codecs.decode_pnm(blob))


class TestJpegNearParity:
    """JPEG decoders may differ by IDCT rounding (libjpeg integer IDCT
    vs our float einsum) — pin shape-identical, ≤3-level pixel drift,
    and near-identical perceptual hash on the committed independent
    fixtures (CPython/IPython test-suite files + a progressive scan)."""

    @pytest.mark.parametrize(
        "name", ["cpython_python.jpg", "ipython_2x2.jpg", "progressive_logo.jpg"]
    )
    def test_fixture_decode_matches(self, name):
        """r10 correction (found by the EXECUTED ImageIO twin,
        tests/test_codecs_imageio.py): both color fixtures are 4:2:0
        chroma-subsampled, and the JPEG standard does not mandate an
        upsampling filter — our decoder replicates chroma (nearest),
        libjpeg (PIL's backend, like the JDK's decoder) triangular-
        interpolates.  Full-RGB max deltas at chroma edges therefore
        reach ~68 legitimately (measured vs the JDK decoder); the
        original flat ≤3 assertion was a never-executed wrong
        expectation.  What must agree: the luma plane and the mean."""
        with open(f"{FIXTURES}/{name}", "rb") as fh:
            blob = fh.read()
        ours = codecs.decode_jpeg(blob)
        pil = pil_decode(blob)
        if pil.ndim == 3 and ours.ndim == 2:  # PIL may upconvert gray
            pil = pil[..., 0]
        assert pil.shape == ours.shape
        a, b = pil.astype(np.float64), ours.astype(np.float64)
        if a.ndim == 2:  # grayscale: no chroma, bitwise-level agreement
            assert np.abs(a - b).max() <= 1, f"{name}: gray drift"
            return

        def luma(x):
            return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]

        dy = np.abs(luma(a) - luma(b))
        assert dy.max() <= 10, f"{name}: luma max delta {dy.max():.2f}"
        assert dy.mean() <= 1.5, f"{name}: luma mean delta {dy.mean():.3f}"
        assert np.abs(a - b).mean() <= 8, f"{name}: rgb mean delta"

    def test_phash_hamming_near_zero(self):
        """aHash over both decodes of the same fixture: visually
        identical → tiny Hamming distance (the property phash_pairs
        relies on)."""
        with open(f"{FIXTURES}/cpython_python.jpg", "rb") as fh:
            blob = fh.read()

        def ahash(arr: np.ndarray) -> int:
            a = arr.astype(np.float64)
            if a.ndim == 3:
                a = a[..., :3].mean(axis=-1)
            cells = np.array(
                [
                    [c.mean() for c in np.array_split(r8, 8, axis=1)]
                    for r8 in np.array_split(a, 8, axis=0)
                ]
            ).ravel()
            return int(
                "".join("1" if v > cells.mean() else "0" for v in cells), 2
            )

        h_ours = ahash(codecs.decode_jpeg(blob))
        h_pil = ahash(pil_decode(blob))
        assert bin(h_ours ^ h_pil).count("1") <= 4


class TestSeamRegistration:
    """The production ask: register a PIL decoder for a NEW kind and run
    the unchanged Spark plan (`perceptual_hash` mapInPandas) over it —
    equal phash to the pure-stdlib decoder on the same bytes."""

    def test_pil_decoder_through_spark_seam(self, spark):
        img = _gradient_rgb(40, 40)
        blob = encode_png(img, None)
        multimodal.register_decoder("png_pil", pil_decode)
        try:
            rows = [
                (1, "png", bytearray(blob), None),
                (2, "png_pil", bytearray(blob), None),
            ]
            media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
            out = {
                r["media_id"]: r["phash"]
                for r in multimodal.perceptual_hash(media).collect()
            }
            assert out[1] == out[2]  # lossless decode → identical phash
        finally:
            multimodal._DECODERS.pop("png_pil", None)


class TestMalformedBlobFuzz:
    """Truncated blobs raise a bounded exception on both sides — the
    guard the 100-TB corpus path needs (a poison row must fail loud,
    fast, and catchably, not hang the executor)."""

    @pytest.mark.parametrize("fmt", ["png", "bmp", "ppm", "jpeg"])
    def test_truncations_raise_both_sides(self, fmt):
        img = _gradient_rgb(16, 16)
        if fmt == "png":
            blob, dec = encode_png(img, None), codecs.decode_png
        elif fmt == "bmp":
            blob, dec = encode_bmp(img), codecs.decode_bmp
        elif fmt == "ppm":
            blob, dec = encode_ppm(img), codecs.decode_pnm
        else:
            with open(f"{FIXTURES}/cpython_python.jpg", "rb") as fh:
                blob, dec = fh.read(), codecs.decode_jpeg
        for cut in (4, len(blob) // 4, len(blob) // 2, len(blob) - 3):
            bad = blob[:cut]
            # hard contract on OUR decoders: truncation raises, always
            with pytest.raises(Exception):
                dec(bad)
            # PIL contract: never hangs; either raises or (for formats
            # with no trailing checksum, e.g. a PPM cut mid-raster in
            # permissive builds) returns a well-formed ndarray — a
            # non-array or None "success" is the failure mode we reject
            try:
                arr = pil_decode(bad)
            except Exception:
                continue
            assert isinstance(arr, np.ndarray) and arr.dtype == np.uint8
