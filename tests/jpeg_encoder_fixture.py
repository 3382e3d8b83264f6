"""Minimal baseline JPEG ENCODER — test fixture generator only.

An independent implementation path from ``sources/codecs.decode_jpeg``
(forward DCT + canonical fixed-length Huffman tables it builds itself),
so encode→decode round-trips exercise the real on-disk format rather
than one function inverting its own in-memory state.  Supports
grayscale and YCbCr 3-channel with integer chroma subsampling
((1,1)=4:4:4, (2,2)=4:2:0, (2,1)=4:2:2), optional restart intervals.
NOT product surface — the engine's decode seam is read-only.
"""

from __future__ import annotations

import struct

import numpy as np

_A = np.array(
    [
        [
            (np.sqrt(1 / 8.0) if u == 0 else np.sqrt(2 / 8.0))
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _zigzag() -> np.ndarray:
    idx = []
    for s in range(15):
        rng = range(s + 1)
        for i in (rng if s % 2 else reversed(rng)):
            r, c = i, s - i
            if r < 8 and c < 8:
                idx.append(r * 8 + c)
    return np.array(idx)


_ZZ = _zigzag()


def _csize(v: int) -> int:
    """Bit-size category of a DC diff / AC coefficient."""
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _extra_bits(v: int, s: int) -> int:
    """The s low-order bits encoding v (negative → v - 1 two's-ish)."""
    return v if v >= 0 else v + (1 << s) - 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        while self.n:
            self.write(1, 1)  # pad with 1s per T.81


def _fixed_table(symbols: set[int]) -> tuple[bytes, bytes, dict[int, tuple[int, int]]]:
    """Canonical fixed-length Huffman table over the used symbols.
    Length L = ceil(log2(n+1)) keeps the all-ones codeword unused."""
    vals = sorted(symbols)
    n = len(vals)
    L = max(1, (n + 1 - 1).bit_length())
    while (1 << L) - 1 < n:  # need n codes, all-ones reserved
        L += 1
    counts = bytearray(16)
    counts[L - 1] = n
    enc = {sym: (L, code) for code, sym in enumerate(vals)}
    return bytes(counts), bytes(vals), enc


def _blocks_symbols(plane: np.ndarray, q: np.ndarray) -> list[list[tuple]]:
    """Per 8×8 block: [(dc_diff_sym, bits), (ac_sym, bits), ...] with the
    DC value kept raw (diff applied at emit time, per component)."""
    h, w = plane.shape
    out = []
    for y in range(0, h, 8):
        for x in range(0, w, 8):
            blk = plane[y : y + 8, x : x + 8] - 128.0
            coef = _A @ blk @ _A.T
            qz = np.rint(coef / q).astype(np.int64).ravel()[_ZZ]
            out.append(qz)
    return out


def encode_jpeg(
    img: np.ndarray,
    subsampling: tuple[int, int] = (1, 1),
    q_scale: float = 1.0,
    restart_interval: int = 0,
) -> bytes:
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    # quant tables: low-loss synthetic ramps (valid per spec; q>=1)
    q_luma = np.clip(np.rint((1 + np.add.outer(np.arange(8), np.arange(8))) * q_scale), 1, 255)
    q_chroma = np.clip(np.rint((2 + np.add.outer(np.arange(8), np.arange(8))) * q_scale), 1, 255)

    if gray:
        comps = [(1, 1, 1, 0)]
        planes = [img]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        sh, sv = subsampling
        comps = [(1, sh, sv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [yy, cb, cr]

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    comp_blocks = []
    for (cid, hc, vc, tq), plane in zip(comps, planes):
        if (hc, vc) != (hmax, vmax):
            # average-pool subsample (chroma)
            fh, fv = hmax // hc, vmax // vc
            ph = -(-h // fv) * fv
            pw = -(-w // fh) * fh
            pp = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = pp.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))
        th = mcuy * vc * 8
        tw = mcux * hc * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        q = q_luma if tq == 0 else q_chroma
        # block list in raster order of this component's block grid
        nby, nbx = th // 8, tw // 8
        blocks = _blocks_symbols(plane, q)
        comp_blocks.append((cid, hc, vc, tq, nbx, nby, blocks))

    # First pass: interleaved MCU walk → symbol streams + histograms
    per_seg = restart_interval if restart_interval else mcux * mcuy
    events = []  # (kind, payload) kind: 'rst' | ('sym', comp_class, table_id, sym, extra, nbits)
    dc_syms = [set(), set()]
    ac_syms = [set(), set()]
    dc_pred = {cid: 0 for cid, *_ in comp_blocks}
    seg_count = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % per_seg == 0:
            events.append(("rst", seg_count % 8))
            seg_count += 1
            dc_pred = {cid: 0 for cid, *_ in comp_blocks}
        my, mx = divmod(mcu, mcux)
        for cid, hc, vc, tq, nbx, nby, blocks in comp_blocks:
            tid = 0 if tq == 0 else 1
            for by in range(vc):
                for bx in range(hc):
                    bi = (my * vc + by) * nbx + (mx * hc + bx)
                    qz = blocks[bi]
                    dc = int(qz[0])
                    diff = dc - dc_pred[cid]
                    dc_pred[cid] = dc
                    s = _csize(diff)
                    dc_syms[tid].add(s)
                    events.append(("dc", tid, s, _extra_bits(diff, s)))
                    run = 0
                    last_nz = 0
                    for k in range(1, 64):
                        if qz[k]:
                            last_nz = k
                    k = 1
                    while k <= last_nz:
                        v = int(qz[k])
                        if v == 0:
                            run += 1
                            k += 1
                            continue
                        while run >= 16:
                            ac_syms[tid].add(0xF0)
                            events.append(("ac", tid, 0xF0, 0, 0))
                            run -= 16
                        s = _csize(v)
                        sym = (run << 4) | s
                        ac_syms[tid].add(sym)
                        events.append(("ac", tid, sym, _extra_bits(v, s), s))
                        run = 0
                        k += 1
                    if last_nz < 63:
                        ac_syms[tid].add(0x00)
                        events.append(("ac", tid, 0x00, 0, 0))

    used_tids = sorted({e[1] for e in events if e[0] in ("dc", "ac")})
    dc_tables = {}
    ac_tables = {}
    dht = bytearray()
    for tid in used_tids:
        cb_, vb_, enc = _fixed_table(dc_syms[tid] or {0})
        dc_tables[tid] = enc
        dht += bytes([0x00 | tid]) + cb_ + vb_
        cb_, vb_, enc = _fixed_table(ac_syms[tid] or {0})
        ac_tables[tid] = enc
        dht += bytes([0x10 | tid]) + cb_ + vb_

    out = bytearray(b"\xff\xd8")
    # DQT (both tables zigzag-ordered)
    for tq, q in ((0, q_luma), (1, q_chroma)):
        if gray and tq == 1:
            continue
        zz_q = q.ravel()[_ZZ].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64) + bytes([tq]) + zz_q.tobytes()
    # SOF0
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cid, hc, vc, tq in comps:
        sof += bytes([cid, (hc << 4) | vc, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    # DHT
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + bytes(dht)
    # DRI
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytes([nc])
    for cid, hc, vc, tq in comps:
        tid = 0 if tq == 0 else 1
        sos += bytes([cid, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # entropy-coded data
    bw = _BitWriter()
    for ev in events:
        if ev[0] == "rst":
            bw.flush()
            out += bytes(bw.out)
            bw = _BitWriter()
            out += bytes([0xFF, 0xD0 + ev[1]])
            continue
        if ev[0] == "dc":
            _, tid, s, extra = ev
            ln, code = dc_tables[tid][s]
            bw.write(code, ln)
            if s:
                bw.write(extra, s)
        else:
            _, tid, sym, extra, s = ev
            ln, code = ac_tables[tid][sym]
            bw.write(code, ln)
            if s:
                bw.write(extra, s)
    bw.flush()
    out += bytes(bw.out)
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive (SOF2) encoder — spectral selection + successive
# approximation, the libjpeg-style default scan script shape:
#   1. DC first (all components interleaved, Al=1)
#   2. DC refinement (Ah=1 -> Al=0)
#   3. per component: AC first (Ss=1..63, Al=1) with EOB-run coding
#   4. per component: AC refinement (Ah=1 -> Al=0) with correction bits
# Independent implementation path from the decoder (same policy as the
# baseline fixture encoder above).
# ---------------------------------------------------------------------------


class _ScanSyms:
    """Collects (symbol, extra-bit) events for one scan, then emits them
    with a canonical fixed-length table built over the used symbols."""

    def __init__(self) -> None:
        self.events: list[tuple] = []  # ("sym", s, extra, nbits) | ("bit", b)
        self.syms: set[int] = set()

    def sym(self, s: int, extra: int = 0, nbits: int = 0) -> None:
        self.syms.add(s)
        self.events.append(("sym", s, extra, nbits))

    def bit(self, b: int) -> None:
        self.events.append(("bit", b & 1))

    def emit(self) -> tuple[bytes, bytes, bytes]:
        counts, vals, enc = _fixed_table(self.syms or {0})
        bw = _BitWriter()
        for ev in self.events:
            if ev[0] == "bit":
                bw.write(ev[1], 1)
            else:
                _, s, extra, nbits = ev
                ln, code = enc[s]
                bw.write(code, ln)
                if nbits:
                    bw.write(extra, nbits)
        bw.flush()
        return counts, vals, bytes(bw.out)


def _prog_quantized_blocks(img, subsampling):
    """Shared front half: color convert, subsample, pad, FDCT, quantize.
    Returns (h, w, comps, per-comp (nbx, nby, [zigzag int block...]),
    q-tables)."""
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q_luma = np.clip(np.rint(1 + np.add.outer(np.arange(8), np.arange(8))), 1, 255)
    q_chroma = np.clip(np.rint(2 + np.add.outer(np.arange(8), np.arange(8))), 1, 255)
    if gray:
        comps = [(1, 1, 1, 0)]
        planes = [img]
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        yy = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        sh, sv = subsampling
        comps = [(1, sh, sv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        planes = [yy, cb, cr]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    blocks_per_comp = []
    for (cid, hc, vc, tq), plane in zip(comps, planes):
        if (hc, vc) != (hmax, vmax):
            fh, fv = hmax // hc, vmax // vc
            ph = -(-h // fv) * fv
            pw = -(-w // fh) * fh
            pp = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
            plane = pp.reshape(ph // fv, fv, pw // fh, fh).mean(axis=(1, 3))
        th = mcuy * vc * 8
        tw = mcux * hc * 8
        plane = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        q = q_luma if tq == 0 else q_chroma
        blocks = _blocks_symbols(plane, q)
        blocks_per_comp.append((cid, hc, vc, tq, tw // 8, th // 8, blocks))
    return (h, w, gray, comps, blocks_per_comp, q_luma, q_chroma,
            hmax, vmax, mcux, mcuy)


def _prog_ac_first(blocks, order, ss, se, al, scan):
    """AC first pass over one component's blocks (non-interleaved raster
    ``order`` indices) with EOB-run accumulation.  One EOBn symbol per
    flush: n = bit_length-1 (run capped at 0x7FFF so n <= 14), extra
    bits = run - 2^n."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            scan.sym(r << 4, eobrun - (1 << r), r)
            eobrun = 0

    for bi in order:
        qz = blocks[bi]
        band = [int(v) for v in qz[ss : se + 1]]
        pt = [(-((-v) >> al) if v < 0 else v >> al) for v in band]
        last_nz = -1
        for j, v in enumerate(pt):
            if v:
                last_nz = j
        if last_nz < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        run = 0
        for j in range(last_nz + 1):
            v = pt[j]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                scan.sym(0xF0)
                run -= 16
            s = _csize(v)
            scan.sym((run << 4) | s, _extra_bits(v, s), s)
            run = 0
        if last_nz < len(pt) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _prog_ac_refine(blocks, order, ss, se, ah, al, scan):
    """AC refinement pass — the jcphuff.c encode_mcu_AC_refine structure
    (the encoder mirror of T.81 G.1.2.3):

    * ``run`` counts coefficients that are zero at BOTH precisions;
      history coefficients (nonzero at Ah) are transparent to the run —
      their correction bits buffer in ``pend`` and ride out with the
      NEXT emitted symbol (ZRL, new-coefficient, or EOBn), in position
      order, exactly when the decoder's walk consumes them.
    * ZRLs flush at the first nonzero (history OR new) once run > 15 —
      flushing only at new coefficients would misplace the buffered
      correction bits relative to the decoder's 16-zero walk.
    """
    eobrun = 0
    eob_bits: list[int] = []  # correction bits owed with the pending EOB run

    def flush_eob():
        nonlocal eobrun, eob_bits
        if eobrun > 0:
            r = eobrun.bit_length() - 1
            scan.sym(r << 4, eobrun - (1 << r), r)
            eobrun = 0
        for b in eob_bits:
            scan.bit(b)
        eob_bits = []

    for bi in order:
        qz = blocks[bi]
        band = [int(v) for v in qz[ss : se + 1]]
        run = 0
        pend: list[int] = []  # correction bits since the last symbol
        for v in band:
            temp = (abs(v) >> al)  # magnitude at THIS scan's precision
            if temp == 0:
                run += 1
                continue
            # nonzero at some precision: flush full ZRL units first
            while run > 15:
                flush_eob()
                scan.sym(0xF0)
                for b in pend:
                    scan.bit(b)
                pend = []
                run -= 16
            if temp > 1:  # history coefficient -> correction bit only
                pend.append(temp & 1)
                continue
            # newly significant (temp == 1): (run, 1) + sign + buffered
            flush_eob()
            scan.sym((run << 4) | 1)
            scan.bit(1 if v > 0 else 0)
            for b in pend:
                scan.bit(b)
            pend = []
            run = 0
        # block tail: leftovers fold into the EOB run
        if run or pend:
            eobrun += 1
            eob_bits.extend(pend)
            if eobrun == 0x7FFF:
                flush_eob()
        else:
            # block ended exactly on an emitted coefficient — still an
            # EOB participant? No: nothing remains to signal.
            pass
    flush_eob()


def encode_jpeg_progressive(
    img: np.ndarray, subsampling: tuple[int, int] = (1, 1)
) -> bytes:
    """Progressive (SOF2) JPEG with DC+AC successive approximation."""
    (h, w, gray, comps, blocks_per_comp, q_luma, q_chroma,
     hmax, vmax, mcux, mcuy) = _prog_quantized_blocks(img, subsampling)

    out = bytearray(b"\xff\xd8")
    for tq, q in ((0, q_luma), (1, q_chroma)):
        if gray and tq == 1:
            continue
        zz_q = q.ravel()[_ZZ].astype(np.uint8)
        out += (b"\xff\xdb" + struct.pack(">H", 2 + 1 + 64)
                + bytes([tq]) + zz_q.tobytes())
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for cid, hc, vc, tq in comps:
        sof += bytes([cid, (hc << 4) | vc, tq])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof

    def write_scan(scan_comps, ss, se, ah, al, scan, table_class):
        counts, vals, payload = scan.emit()
        tid = 0  # one table per scan, always slot 0 of its class
        out.extend(b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + len(vals))
                   + bytes([(table_class << 4) | tid]) + counts + vals)
        sos = bytes([len(scan_comps)])
        for cid in scan_comps:
            sos += bytes([cid, (tid << 4) | tid])
        sos += bytes([ss, se, (ah << 4) | al])
        out.extend(b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos)
        out.extend(payload)

    # scan 1: DC first, all components interleaved, Al=1
    scan = _ScanSyms()
    dc_pred = {cid: 0 for cid, *_ in comps}
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for cid, hc, vc, tq, nbx, nby, blocks in blocks_per_comp:
            for by in range(vc):
                for bx in range(hc):
                    bi = (my * vc + by) * nbx + (mx * hc + bx)
                    dc = int(blocks[bi][0]) >> 1  # Al=1 point transform
                    diff = dc - dc_pred[cid]
                    dc_pred[cid] = dc
                    s = _csize(diff)
                    scan.sym(s, _extra_bits(diff, s), s)
    write_scan([c[0] for c in comps], 0, 0, 0, 1, scan, 0)

    # scan 2: DC refinement (Ah=1, Al=0) — one raw bit per block
    scan = _ScanSyms()
    for mcu in range(mcux * mcuy):
        my, mx = divmod(mcu, mcux)
        for cid, hc, vc, tq, nbx, nby, blocks in blocks_per_comp:
            for by in range(vc):
                for bx in range(hc):
                    bi = (my * vc + by) * nbx + (mx * hc + bx)
                    scan.bit(int(blocks[bi][0]) & 1)
    # DC refinement scans carry no Huffman symbols; emit() still writes
    # a (trivial) DC table so the stream stays self-contained
    write_scan([c[0] for c in comps], 0, 0, 1, 0, scan, 0)

    # per component: AC first (Al=1) then AC refinement (Ah=1, Al=0),
    # non-interleaved raster order over the COMPONENT's true block grid
    for cid, hc, vc, tq, nbx, nby, blocks in blocks_per_comp:
        cw = -(-w * hc // hmax)
        ch = -(-h * vc // vmax)
        nbx_c = -(-cw // 8)
        nby_c = -(-ch // 8)
        order = [by * nbx + bx for by in range(nby_c) for bx in range(nbx_c)]
        scan = _ScanSyms()
        _prog_ac_first(blocks, order, 1, 63, 1, scan)
        write_scan([cid], 1, 63, 0, 1, scan, 1)
        scan = _ScanSyms()
        _prog_ac_refine(blocks, order, 1, 63, 1, 0, scan)
        write_scan([cid], 1, 63, 1, 0, scan, 1)

    out += b"\xff\xd9"
    return bytes(out)
