"""Pure-stdlib media codecs for the multimodal decode seam.

The container ships no PIL/ffmpeg/libav, so the decode seam was a
registry stub (``operators/multimodal.register_decoder``).  These
decoders are REAL on-disk formats implemented with only ``zlib`` /
``struct`` / numpy — no new dependency — so a user with PNG / BMP /
PPM / WAV columns runs the full multimodal surface (extract_features,
perceptual_hash, phash_pairs, decode_frames) un-stubbed end-to-end:

- **PNG** (``decode_png``): 8-bit depth, color types 0 (gray),
  2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced AND
  Adam7-interlaced.  zlib inflate + the five scanline filters
  (None/Sub/Up/Average/Paeth) unfiltered row-by-row in numpy; Adam7
  unfilters each of the 7 passes as its own sub-image and scatters.
- **PPM/PGM** (``decode_pnm``): binary P5/P6, 8-bit maxval.
- **BMP** (``decode_bmp``): uncompressed (BI_RGB) 24/32-bit,
  bottom-up or top-down.
- **WAV** (``decode_wav``): RIFF PCM 8-bit unsigned / 16-bit signed,
  any channel count; samples rescaled to [0, 256) so the downstream
  histogram features (range=(0, 256)) bin identically to pixels.
- **JPEG** (``decode_jpeg``): baseline/extended sequential DCT
  (SOF0/SOF1) AND progressive DCT (SOF2, full spectral selection +
  successive approximation with EOB-run coding), 8-bit, Huffman-coded,
  any integer-ratio subsampling (4:4:4 / 4:2:0 / 4:2:2 / grayscale),
  restart markers — the dominant real-world corpus image format.
  Marker parse + entropy decode in Python into a per-component
  coefficient store; dequantize/iDCT/color as batched numpy einsums.

Every decoder returns a numpy array with values in [0, 256): images
as (H, W) grayscale or (H, W, C), audio as (n_samples,) mono or
(n_samples, n_channels) — the shapes ``extract_features`` (ravel +
histogram) and ``perceptual_hash`` (block-average to 8×8) accept.

Arithmetic-coded/lossless/hierarchical JPEG and video containers
still raise through the registry seam; the registry call shape is
identical when a codec for those becomes available.

These run INSIDE Arrow ``mapInPandas`` batches — per-blob decode is
plain numpy, no Spark objects — so the same function serves any
executor count unchanged.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["decode_png", "decode_pnm", "decode_bmp", "decode_wav", "decode_jpeg"]

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
    if depth != 8 or comp != 0 or filt != 0 or interlace not in (0, 1):
        raise ValueError(
            f"decode_png: unsupported PNG (depth={depth}, compression={comp}, "
            f"filter={filt}, interlace={interlace}); only 8-bit, interlace 0/1"
        )
    if color not in _PNG_CHANNELS:
        raise ValueError(f"decode_png: unsupported color type {color}")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    if interlace == 0:
        sub = _png_unfilter(raw, 0, h, w, ch)
        if sub is None or len(raw) != h * (w * ch + 1):
            raise ValueError("decode_png: decompressed size mismatch")
        img = sub.reshape(h, w, ch)
    else:  # Adam7: 7 independently-filtered sub-images, scattered back
        img = np.zeros((h, w, ch), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            sub = _png_unfilter(raw, off, ph, pw, ch)
            if sub is None:
                raise ValueError("decode_png: truncated interlaced data")
            off += ph * (pw * ch + 1)
            img[y0::dy, x0::dx] = sub.reshape(ph, pw, ch)
        if off != len(raw):
            raise ValueError("decode_png: decompressed size mismatch")
    if color == 3:
        if palette is None:
            raise ValueError("decode_png: palette image without PLTE")
        img = palette[img[:, :, 0]]
    return img[:, :, 0] if img.shape[2] == 1 else img


# Adam7 pass grid: (x0, y0, dx, dy) per pass (PNG spec 8.2)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _png_unfilter(raw: bytes, off: int, h: int, w: int, ch: int):
    """Unfilter ``h`` scanlines of a (sub-)image starting at ``off`` in
    the inflated stream; returns (h, w*ch) uint8 or None if truncated."""
    stride = w * ch
    if off + h * (stride + 1) > len(raw):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = off + y * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=base + 1
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
    return out


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


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT) — VERDICT r5 item 5.  Pure stdlib+numpy:
# marker parse, DQT/DHT tables, Huffman entropy decode (bit-serial over
# un-stuffed segments), dequantize, 8x8 iDCT as two numpy matmuls,
# chroma upsample, YCbCr->RGB.  Covers SOF0/SOF1 (baseline/extended
# sequential, 8-bit) AND SOF2 (progressive: spectral selection +
# successive approximation, T.81 Annex G) with any integer-ratio
# subsampling (4:4:4, 4:2:0, 4:2:2, grayscale) and restart markers.
# Arithmetic coding, lossless/hierarchical modes, 12-bit, and CMYK
# raise honestly through the seam.
# ---------------------------------------------------------------------------

def _jpeg_zigzag() -> np.ndarray:
    """Raster index of the k-th zigzag coefficient (generated, not typed)."""
    idx = []
    for s in range(15):
        rng = range(s + 1)
        for i in (rng if s % 2 else reversed(rng)):
            r, c = i, s - i
            if r < 8 and c < 8:
                idx.append(r * 8 + c)
    return np.array(idx, dtype=np.int64)


_JPEG_ZZ = _jpeg_zigzag()

# orthonormal 8-point DCT-II matrix: X = A.T @ F @ A inverts F = A @ X @ A.T
_DCT_A = np.array(
    [
        [
            (np.sqrt(1 / 8.0) if u == 0 else np.sqrt(2 / 8.0))
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _JpegBits:
    """MSB-first bit reader over one un-stuffed entropy segment."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.i = 0
        self.acc = 0
        self.n = 0

    def read(self, nbits: int) -> int:
        if nbits == 0:
            return 0
        while self.n < nbits:
            byte = self.buf[self.i] if self.i < len(self.buf) else 0
            self.i += 1
            self.acc = ((self.acc << 8) | byte) & 0xFFFFFFFFFF
            self.n += 8
        self.n -= nbits
        return (self.acc >> self.n) & ((1 << nbits) - 1)


def _jpeg_huff_table(bits_counts: bytes, values: bytes) -> dict:
    """DHT (16 code-length counts + symbols) → {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits_counts[ln - 1]):
            table[(ln, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _jpeg_huff_decode(bits: _JpegBits, table: dict) -> int:
    code = 0
    for ln in range(1, 17):
        code = (code << 1) | bits.read(1)
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    raise ValueError("decode_jpeg: invalid Huffman code in scan")


def _jpeg_extend(v: int, s: int) -> int:
    """DIFF/coefficient sign extension (ITU T.81 F.2.2.1 EXTEND)."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


def _jpeg_unstuff_scan(data: bytes, pos: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``pos`` → restart-delimited un-stuffed
    segments, plus the offset of the terminating marker."""
    segs: list[bytes] = []
    cur = bytearray()
    i = pos
    n = len(data)
    while i < n:
        b = data[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        m = data[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:  # stuffed FF
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            segs.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # real marker ends the scan
            break
    segs.append(bytes(cur))
    return segs, i


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a Huffman-coded 8-bit JPEG → (H, W) gray or (H, W, 3) RGB
    uint8.

    Covers baseline/extended sequential (SOF0/SOF1) AND progressive
    (SOF2) with full spectral selection + successive approximation
    (T.81 Annex G): every scan entropy-decodes into a per-component
    zigzag coefficient store; reconstruction (dequantize, batched iDCT,
    upsample, color) runs ONCE after the last scan.  Arithmetic coding
    (SOF9-SOF11/SOF13-SOF15), lossless (SOF3/SOF7), hierarchical
    (SOF5/SOF6/SOF14), 12-bit, and CMYK still raise ValueError through
    the seam."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: bad SOI marker")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    store: dict[int, np.ndarray] = {}  # cid -> (nby, nbx, 64) zigzag coefs
    eobrun_box = [0]
    saw_scan = False
    i = 2
    n = len(data)
    while i + 2 <= n:
        if data[i] != 0xFF:
            raise ValueError(f"decode_jpeg: marker desync at {i}")
        m = data[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if m == 0xD9:  # EOI
            break
        if i + 4 > n:
            raise ValueError("decode_jpeg: truncated marker segment")
        (seg_len,) = struct.unpack_from(">H", data, i + 2)
        seg = data[i + 4 : i + 2 + seg_len]
        i += 2 + seg_len
        if m == 0xDB:  # DQT (may hold several tables)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int32)
                    p += 128
                qt[tq] = tbl
        elif m == 0xC4:  # DHT (may hold several tables)
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = seg[p + 1 : p + 17]
                nv = sum(counts)
                vals = seg[p + 17 : p + 17 + nv]
                huff[(tc, th)] = _jpeg_huff_table(counts, vals)
                p += 17 + nv
        elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError(f"decode_jpeg: only 8-bit precision (got {prec})")
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * c)
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps, m == 0xC2)
            if nc not in (1, 3):
                raise ValueError(
                    f"decode_jpeg: {nc}-component images unsupported (1 or 3)"
                )
            hmax = max(hc for _, hc, _, _ in comps)
            vmax = max(vc for _, _, vc, _ in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            for cid, hc, vc, _tq in comps:
                store[cid] = np.zeros((mcuy * vc, mcux * hc, 64), dtype=np.int32)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"decode_jpeg: unsupported SOF marker FF{m:02X} "
                "(baseline/extended sequential and progressive Huffman "
                "only; arithmetic-coded, lossless, and hierarchical "
                "JPEGs are outside the seam)"
            )
        elif m == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", seg, 0)
        elif m == 0xDA:  # SOS — one entropy-coded scan follows
            if frame is None:
                raise ValueError("decode_jpeg: SOS before SOF")
            ns = seg[0]
            scan_spec = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_spec.append((cs, tt >> 4, tt & 15))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            a = seg[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            segs, i = _jpeg_unstuff_scan(data, i)
            _jpeg_scan_pass(
                store, frame, scan_spec, ss, se, ah, al, huff, segs,
                restart_interval,
            )
            saw_scan = True
        # else: APPn/COM — skipped
    if not saw_scan:
        raise ValueError("decode_jpeg: no SOS marker found")
    return _jpeg_reconstruct(frame, store, qt)


def _jpeg_scan_pass(
    store, frame, scan_spec, ss, se, ah, al, huff, segs, restart_interval
):
    """Entropy-decode ONE scan into the zigzag coefficient store.

    Sequential frames arrive as one (Ss=0, Se=63, Ah=Al=0) scan per SOS;
    progressive frames split the spectrum (Ss..Se) and the bit-depth
    (Ah..Al) across many scans — DC first/refine may be interleaved,
    AC scans are single-component by spec (T.81 G.1.1.1)."""
    h, w, comps, progressive = frame
    by_id = {cid: (hc, vc, tq) for cid, hc, vc, tq in comps}
    hmax = max(hc for _, hc, _, _ in comps)
    vmax = max(vc for _, _, vc, _ in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    if not progressive:
        ss, se, ah, al = 0, 63, 0, 0

    # resolve tables per scan component (only the tables the scan uses)
    order = []  # (cid, hc, vc, dc_table|None, ac_table|None)
    for cs, td, ta in scan_spec:
        if cs not in by_id:
            raise ValueError(f"decode_jpeg: scan references unknown component {cs}")
        hc, vc, _tq = by_id[cs]
        dct = act = None
        if ss == 0:
            if ah == 0 and (0, td) not in huff:
                raise ValueError("decode_jpeg: missing DC Huffman table")
            dct = huff.get((0, td))
        if se > 0:
            if (1, ta) not in huff:
                raise ValueError("decode_jpeg: missing AC Huffman table")
            act = huff[(1, ta)]
        order.append((cs, hc, vc, dct, act))

    interleaved = len(order) > 1
    if progressive and ss > 0 and interleaved:
        raise ValueError("decode_jpeg: progressive AC scan must be single-component")
    if progressive and ss == 0 and se != 0:
        # T.81 G.1.1.1: progressive DC and AC never share a scan — a
        # (0, 63) band under SOF2 is a corrupt/relabeled stream
        raise ValueError("decode_jpeg: invalid progressive scan band (Ss=0, Se!=0)")

    # walk units: MCUs when interleaved, the component's own block grid
    # when single-component (T.81 A.2.2: non-interleaved order)
    if interleaved:
        units_total = mcux * mcuy
    else:
        cs, hc, vc, _dct, _act = order[0]
        cw = -(-w * hc // hmax)
        ch = -(-h * vc // vmax)
        nbx_c = -(-cw // 8)
        nby_c = -(-ch // 8)
        units_total = nbx_c * nby_c

    per_seg = restart_interval if restart_interval else units_total
    unit = 0
    for seg in segs:
        if unit >= units_total:
            break
        bits = _JpegBits(seg)
        dc_pred = {cs: 0 for cs, *_ in order}
        eobrun = 0
        for _ in range(min(per_seg, units_total - unit)):
            if interleaved:
                my, mx = divmod(unit, mcux)
                for cs, hc, vc, dct, act in order:
                    plane = store[cs]
                    for by in range(vc):
                        for bx in range(hc):
                            blk = plane[my * vc + by, mx * hc + bx]
                            eobrun = _jpeg_block_pass(
                                bits, blk, ss, se, ah, al, dct, act,
                                dc_pred, cs, eobrun, progressive,
                            )
            else:
                cs, hc, vc, dct, act = order[0]
                by, bx = divmod(unit, nbx_c)
                blk = store[cs][by, bx]
                eobrun = _jpeg_block_pass(
                    bits, blk, ss, se, ah, al, dct, act,
                    dc_pred, cs, eobrun, progressive,
                )
            unit += 1


def _jpeg_block_pass(
    bits, blk, ss, se, ah, al, dct, act, dc_pred, cs, eobrun, progressive
):
    """Decode one 8×8 block's slice of the current scan into ``blk``
    (zigzag-order int32 view).  Returns the updated EOB run counter."""
    if not progressive:
        # sequential: DC diff + full AC run-length, one pass
        s = _jpeg_huff_decode(bits, dct)
        dc_pred[cs] += _jpeg_extend(bits.read(s), s)
        blk[0] = dc_pred[cs]
        k = 1
        while k < 64:
            rs = _jpeg_huff_decode(bits, act)
            r, sz = rs >> 4, rs & 15
            if sz == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("decode_jpeg: coefficient index overrun")
            blk[k] = _jpeg_extend(bits.read(sz), sz)
            k += 1
        return 0

    if ss == 0:  # DC scan (Se must be 0)
        if ah == 0:  # first pass: diff-coded, shifted by Al
            s = _jpeg_huff_decode(bits, dct)
            dc_pred[cs] += _jpeg_extend(bits.read(s), s)
            blk[0] = dc_pred[cs] << al
        else:  # refinement: one raw bit appends precision
            if bits.read(1):
                blk[0] = int(blk[0]) | (1 << al)
        return 0

    if ah == 0:  # AC first pass for this band: run-length + EOBRUN
        if eobrun > 0:
            return eobrun - 1
        k = ss
        while k <= se:
            rs = _jpeg_huff_decode(bits, act)
            r, sz = rs >> 4, rs & 15
            if sz == 0:
                if r == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << r) - 1  # this block included
                if r:
                    eobrun += bits.read(r)
                return eobrun
            k += r
            if k > se:
                raise ValueError("decode_jpeg: AC band index overrun")
            blk[k] = _jpeg_extend(bits.read(sz), sz) << al
            k += 1
        return 0

    # AC refinement (T.81 G.1.2.3 / the libjpeg decode_mcu_AC_refine
    # structure): each history coefficient gets a correction bit; new
    # coefficients arrive as ±1<<Al after their zero-history run.
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _jpeg_huff_decode(bits, act)
            r, sz = rs >> 4, rs & 15
            val = 0
            if sz:
                # spec: size must be 1 in a refinement scan
                val = p1 if bits.read(1) else m1
            elif r != 15:
                eobrun = 1 << r  # this block's tail included below
                if r:
                    eobrun += bits.read(r)
                break
            # advance over r zero-history coefficients, applying
            # correction bits to nonzero-history ones along the way
            while k <= se:
                c = int(blk[k])
                if c:
                    if bits.read(1) and (c & p1) == 0:
                        blk[k] = c + (p1 if c > 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(blk[k])
            if c:
                if bits.read(1) and (c & p1) == 0:
                    blk[k] = c + (p1 if c > 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _jpeg_reconstruct(frame, store, qt):
    """Coefficient store → pixels: dequantize + batched iDCT (one einsum
    per component, no per-block Python loop), crop, nearest-upsample,
    YCbCr→RGB."""
    h, w, comps, _progressive = frame
    hmax = max(hc for _, hc, _, _ in comps)
    vmax = max(vc for _, _, vc, _ in comps)
    out_planes = []
    for cid, hc, vc, tq in comps:
        if tq not in qt:
            raise ValueError("decode_jpeg: missing quantization table")
        zz = store[cid]  # (nby, nbx, 64) zigzag order
        nby, nbx = zz.shape[:2]
        deq = zz.astype(np.float64) * qt[tq].astype(np.float64)[None, None, :]
        rast = np.zeros_like(deq)
        rast[..., _JPEG_ZZ] = deq
        blocks = rast.reshape(nby, nbx, 8, 8)
        px = np.einsum("ij,abjk,kl->abil", _DCT_A.T, blocks, _DCT_A) + 128.0
        p = px.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        # crop to the component's true resolution, then nearest upsample
        ch = -(-h * vc // vmax) if vc != vmax else h
        cw = -(-w * hc // hmax) if hc != hmax else w
        p = p[:ch, :cw]
        if vc != vmax:
            p = np.repeat(p, vmax // vc, axis=0)
        if hc != hmax:
            p = np.repeat(p, hmax // hc, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.rint(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
