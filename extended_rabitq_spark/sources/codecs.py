"""Pure-stdlib media codecs for the multimodal decode seam.

The container ships no PIL/ffmpeg/libav, so the decode seam was a
registry stub (``operators/multimodal.register_decoder``).  These
decoders are REAL on-disk formats implemented with only ``zlib`` /
``struct`` / numpy — no new dependency — so a user with PNG / BMP /
PPM / WAV columns runs the full multimodal surface (extract_features,
perceptual_hash, phash_pairs, decode_frames) un-stubbed end-to-end:

- **PNG** (``decode_png``): 8-bit depth, color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced —
  the overwhelming majority of real PNGs.  zlib inflate + the five
  scanline filters (None/Sub/Up/Average/Paeth) unfiltered row-by-row
  in numpy.
- **PPM/PGM** (``decode_pnm``): binary P5/P6, 8-bit maxval.
- **BMP** (``decode_bmp``): uncompressed (BI_RGB) 24/32-bit,
  bottom-up or top-down.
- **WAV** (``decode_wav``): RIFF PCM 8-bit unsigned / 16-bit signed,
  any channel count; samples rescaled to [0, 256) so the downstream
  histogram features (range=(0, 256)) bin identically to pixels.

Every decoder returns a numpy array with values in [0, 256): images
as (H, W) grayscale or (H, W, C), audio as (n_samples,) mono or
(n_samples, n_channels) — the shapes ``extract_features`` (ravel +
histogram) and ``perceptual_hash`` (block-average to 8×8) accept.

JPEG and video containers still raise through the registry seam
(honest: entropy-coded DCT needs a real codec library); the registry
call shape is identical when one becomes available.

These run INSIDE Arrow ``mapInPandas`` batches — per-blob decode is
plain numpy, no Spark objects — so the same function serves any
executor count unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "decode_pnm", "decode_bmp", "decode_wav"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type → samples per pixel (before palette expansion)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """PNG Paeth predictor, vectorized over one scanline (int16 domain —
    the predictor subtractions overflow uint8)."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG → (H, W) or (H, W, C) uint8."""
    if not data.startswith(_PNG_SIG):
        raise ValueError("decode_png: bad PNG signature")
    pos = len(_PNG_SIG)
    ihdr = None
    palette = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + CRC (CRC unverified)
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"PLTE":
            palette = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.extend(chunk)
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("decode_png: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"decode_png: unsupported PNG (depth={depth}, compression={comp}, "
            f"filter={filt}, interlace={interlace}); only 8-bit non-interlaced"
        )
    if color not in _PNG_CHANNELS:
        raise ValueError(f"decode_png: unsupported color type {color}")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("decode_png: decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth: sequential in x
            cur = line
            left = np.zeros(ch, dtype=np.uint8)
            upleft = np.zeros(ch, dtype=np.uint8)
            for x in range(0, stride, ch):
                up = prev[x : x + ch]
                if ftype == 1:
                    cur[x : x + ch] = cur[x : x + ch] + left
                elif ftype == 3:
                    cur[x : x + ch] = cur[x : x + ch] + (
                        (left.astype(np.int16) + up.astype(np.int16)) // 2
                    ).astype(np.uint8)
                else:
                    cur[x : x + ch] = cur[x : x + ch] + _paeth(left, up, upleft)
                left = cur[x : x + ch]
                upleft = up
        else:
            raise ValueError(f"decode_png: bad filter type {ftype} on row {y}")
        out[y] = cur
        prev = cur
    img = out.reshape(h, w, ch)
    if color == 3:
        if palette is None:
            raise ValueError("decode_png: palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img[:, :, 0] if img.shape[2] == 1 else img


def _pnm_tokens(data: bytes, n: int) -> tuple[list[int], int]:
    """First ``n`` whitespace-separated integer tokens after the magic,
    skipping ``#`` comments; returns (tokens, offset past last token's
    single trailing whitespace byte)."""
    toks: list[int] = []
    i = 2  # past magic
    while len(toks) < n:
        while i < len(data) and data[i : i + 1].isspace():
            i += 1
        if i < len(data) and data[i] == 0x23:  # '#' comment to EOL
            while i < len(data) and data[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < len(data) and not data[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("decode_pnm: truncated header")
        toks.append(int(data[i:j]))
        i = j
    return toks, i + 1  # exactly one whitespace byte before raster


def decode_pnm(data: bytes) -> np.ndarray:
    """Decode binary PGM (P5) → (H, W) or PPM (P6) → (H, W, 3) uint8."""
    magic = data[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"decode_pnm: unsupported magic {magic!r} (binary P5/P6 only)")
    (w, h, maxval), off = _pnm_tokens(data, 3)
    if maxval > 255:
        raise ValueError("decode_pnm: only 8-bit maxval supported")
    ch = 1 if magic == b"P5" else 3
    need = w * h * ch
    px = np.frombuffer(data, dtype=np.uint8, count=need, offset=off)
    return px.reshape(h, w) if ch == 1 else px.reshape(h, w, 3)


def decode_bmp(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24/32-bit BMP → (H, W, 3) uint8 (RGB)."""
    if data[:2] != b"BM":
        raise ValueError("decode_bmp: bad BMP signature")
    (px_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size, w, h) = struct.unpack_from("<Iii", data, 14)
    if hdr_size < 40:
        raise ValueError("decode_bmp: pre-BITMAPINFOHEADER BMPs unsupported")
    (planes, bpp) = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"decode_bmp: only uncompressed 24/32-bit supported "
            f"(bpp={bpp}, compression={compression})"
        )
    top_down = h < 0
    h = abs(h)
    ch = bpp // 8
    row_stride = (w * ch + 3) & ~3  # rows pad to 4 bytes
    rows = []
    for y in range(h):
        off = px_off + y * row_stride
        rows.append(np.frombuffer(data, dtype=np.uint8, count=w * ch, offset=off))
    img = np.stack(rows).reshape(h, w, ch)
    if not top_down:
        img = img[::-1]
    return img[:, :, [2, 1, 0]]  # BGR(A) storage → RGB


def decode_wav(data: bytes) -> np.ndarray:
    """Decode a RIFF/WAVE PCM blob → float64 samples in [0, 256).

    8-bit unsigned passes through; 16-bit signed rescales by
    ``(x + 32768) / 256``.  Mono → (n,), multi-channel → (n, ch).
    """
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("decode_wav: bad RIFF/WAVE header")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + clen]
        pos += 8 + clen + (clen & 1)  # chunks pad to even length
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body, 0)
        elif cid == b"data":
            raw = body
    if fmt is None or raw is None:
        raise ValueError("decode_wav: missing fmt/data chunk")
    audio_fmt, n_ch, _rate, _byte_rate, _block, bits = fmt
    if audio_fmt != 1 or bits not in (8, 16):
        raise ValueError(
            f"decode_wav: only PCM 8/16-bit supported (fmt={audio_fmt}, bits={bits})"
        )
    if bits == 8:
        samples = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
    else:
        n = len(raw) // 2
        samples = (
            np.frombuffer(raw, dtype="<i2", count=n).astype(np.float64) + 32768.0
        ) / 256.0
    if n_ch > 1:
        samples = samples[: len(samples) // n_ch * n_ch].reshape(-1, n_ch)
    return samples
