"""JPEG (JFIF) codec — stdlib + numpy only, no imaging libraries.

Closes the round-3 gap: JPEG is the most common training-corpus image
format, and ``decode_image`` previously raised for it. The decoder handles
the two Huffman-coded profiles that dominate real corpora: baseline/
extended sequential (SOF0/SOF1) and — since round 5 — progressive (SOF2,
T.81 Annex G.1.2: spectral selection AND successive approximation, DC/AC
first + refinement passes, EOB runs). Both profiles share: 8-bit
precision, 1- or 3-component scans, arbitrary DQT/DHT tables, chroma
subsampling (4:4:4, 4:2:2, 4:2:0 — any dividing h/v factors),
non-interleaved single-component scans (T.81 A.2), restart intervals
(DRI + RSTn), APPn/COM skip, 0xFF fill bytes, and 0xFF00 byte stuffing.
Arithmetic-coded (SOF9+) and lossless/hierarchical JPEGs raise
``ValueError`` — a declared boundary, quarantined by the ``err`` channel
like every other undecodable payload.

The encoder exists so the decoder can be tested against spec-conformant
fixtures in a container with no imaging library: it emits standard
baseline JFIF (SOI/APP0/DQT/SOF0/DHT/SOS/EOI) with Annex-K quantization
tables scaled by quality, canonical custom Huffman tables (legal in
baseline — every decoder reads them from DHT), optional 2x2 chroma
subsampling, optional restart intervals, and (``progressive=True``) an
SOF2 scan script with optional successive approximation. Output decodes
in any standard viewer.

DCT convention: the orthonormal 8x8 DCT-II matrix ``_DCT8`` gives
``coeffs = A @ block @ A.T`` and ``block = A.T @ coeffs @ A`` (ITU T.81
Annex A with the c(u)/2 normalization folded in).

Used by :mod:`sopspark.multimodal`'s ``decode_image`` → the Spark-side
``extract_features`` mapInPandas stage; per-asset decode is embarrassingly
parallel, so scale comes from partitioning, not from this kernel.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def _zigzag() -> list[tuple[int, int]]:
    """The 64 (row, col) positions in JPEG zigzag scan order (T.81 fig 5)."""
    out = []
    for d in range(15):
        rng = range(min(d, 7), max(0, d - 7) - 1, -1) if d % 2 == 0 else range(
            max(0, d - 7), min(d, 7) + 1
        )
        out.extend((r, d - r) for r in rng)
    return out


_ZZ = _zigzag()
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        cu = np.sqrt(0.5) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * np.cos((2 * x + 1) * u * np.pi / 16)
    return a


_DCT8 = _dct_matrix()

# Annex K.1/K.2 quantization tables (quality-50 reference), zigzag-free
# (natural row-major order)
_Q_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
])
_Q_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
])


def _scaled_q(table: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 / quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------


def _canonical_codes(counts: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    def __init__(self, counts: list[int], symbols: list[int]):
        # (length, code) → symbol; decode walks bit-by-bit (≤16 steps)
        self.table: dict[tuple[int, int], int] = {}
        for sym, (code, length) in _canonical_codes(counts, symbols).items():
            self.table[(length, code)] = sym


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops at markers,
    byte-aligns across RSTn restart markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bitbuf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                # marker reached mid-entropy (EOI / next segment): the spec
                # pads the last byte with 1-bits, so synthesize 1s
                self.bitbuf = (self.bitbuf << 8) | 0xFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.bitbuf = (self.bitbuf << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bitbuf >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, dec: _HuffDecoder) -> int:
        code, length = 0, 0
        table = dec.table
        while length < 17:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.nbits = 0  # drop pad bits
        d = self.data
        while d[self.pos] != 0xFF:
            self.pos += 1  # tolerate stray pad bytes (rare, but seen)
        m = d[self.pos + 1]
        if not (0xD0 <= m <= 0xD7):
            raise ValueError(f"expected RSTn, found FF{m:02X}")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to the signed coefficient."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → HxWx3 uint8 RGB (grayscale replicates)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) — comps: [(cid, hi, vi, tq)]
    progressive = False
    coefs = None  # progressive: per-component zigzag coef grids (bh, bw, 64)
    pos = 2
    n = len(data)
    while pos < n:
        if data[pos] != 0xFF:
            pos += 1  # fill bytes between segments
            continue
        pos += 1
        # T.81 B.1.1.2: a marker may be preceded by any number of 0xFF fill
        # bytes — 'FF FF <marker>' is legal padding, so skip the run rather
        # than treating the second 0xFF as the marker byte (which would fall
        # through to a bogus length read and desync the segment parse).
        while pos < n and data[pos] == 0xFF:
            pos += 1
        if pos >= n:
            break
        marker = data[pos]
        pos += 1
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        body = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq:  # 16-bit table
                    vals = np.frombuffer(body[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(body[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                t = np.zeros((8, 8), dtype=np.int32)
                t[_ZZ_ROWS, _ZZ_COLS] = vals
                qtables[tq] = t
        elif marker in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            if body[0] != 8:
                # 12-bit extended-sequential is legal JPEG but this decoder's
                # level shift / clip math is 8-bit — decoding it would emit
                # silently corrupted pixels instead of an err-channel row
                raise ValueError(
                    f"unsupported JPEG sample precision {body[0]} — 8-bit only"
                )
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            hmax = max(c[1] for c in comps)
            vmax = max(c[2] for c in comps)
            for cid, hi, vi, _tq in comps:
                if hi == 0 or vi == 0 or hmax % hi or vmax % vi:
                    # np.repeat with integer-divided factors would silently
                    # mis-upsample non-dividing factors (e.g. 3 vs 2)
                    raise ValueError(
                        f"unsupported JPEG sampling factors {hi}x{vi} "
                        f"(max {hmax}x{vmax}) — factors must divide"
                    )
            frame = (h, w, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG coding process (SOF marker FF{marker:02X})")
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                counts = list(body[i + 1 : i + 17])
                nsym = sum(counts)
                symbols = list(body[i + 17 : i + 17 + nsym])
                (huff_ac if tc else huff_dc)[th] = _HuffDecoder(counts, symbols)
                i += 17 + nsym
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows the segment
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []  # (comp_idx, dc_table, ac_table)
            cid_index = {c[0]: i for i, c in enumerate(frame[2])}
            for s in range(ns):
                cid, tt = body[1 + 2 * s : 3 + 2 * s]
                scan.append((cid_index[cid], tt >> 4, tt & 0x0F))
            if progressive:
                ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
                if coefs is None:
                    coefs = _alloc_coefs(frame)
                _decode_prog_scan(
                    data, pos + seglen, frame, scan,
                    (ss, se, ahal >> 4, ahal & 0x0F),
                    huff_dc, huff_ac, restart_interval, coefs,
                )
                pos = _next_marker_pos(data, pos + seglen)
                continue
            if ns != len(frame[2]):
                raise ValueError("non-interleaved multi-scan JPEG not supported")
            return _decode_scan(
                data, pos + seglen, frame, scan, qtables, huff_dc, huff_ac,
                restart_interval,
            )
        pos += seglen
    if progressive and coefs is not None:
        # EOI (or end of data — a truncated progressive stream still renders
        # whatever passes arrived; that IS the format's point)
        return _reconstruct(frame, qtables, coefs)
    raise ValueError("no SOS scan found in JPEG")


def _decode_scan(data, start, frame, scan, qtables, huff_dc, huff_ac, dri):
    h, w, comps = frame
    if len(scan) == 1:
        # T.81 A.2 / A.2.3: a single-component scan is NON-interleaved — the
        # MCU is one data unit and the declared sampling factors do not
        # apply, so the grid is ceil(w/8) x ceil(h/8). A legal grayscale
        # JPEG declaring 2x2 factors must not be decoded on a 16-aligned
        # interleaved MCU grid (wrong block order / phantom blocks).
        cid, _hi, _vi, tq = comps[scan[0][0]]
        comps = [(cid, 1, 1, tq)]
        scan = [(0, scan[0][1], scan[0][2])]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    r = _BitReader(data, start)
    # per component: coefficient store (before IDCT) as float planes
    planes = [
        np.zeros((mcuy * c[2] * 8, mcux * c[1] * 8), dtype=np.float32) for c in comps
    ]
    preds = [0] * len(comps)
    idct_t = _DCT8.T
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                r.restart()
                preds = [0] * len(comps)
            mcu_count += 1
            for ci, tdc, tac in scan:
                cid, hi, vi, tq = comps[ci]
                q = qtables[tq]
                for by in range(vi):
                    for bx in range(hi):
                        coef = np.zeros((8, 8), dtype=np.float32)
                        s = r.huff(huff_dc[tdc])
                        diff = _extend(r.bits(s), s) if s else 0
                        preds[ci] += diff
                        zz = np.zeros(64, dtype=np.float32)
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = r.huff(huff_ac[tac])
                            rr, ss = rs >> 4, rs & 0x0F
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise ValueError("AC coefficient index overflow")
                            zz[k] = _extend(r.bits(ss), ss)
                            k += 1
                        coef[_ZZ_ROWS, _ZZ_COLS] = zz
                        block = idct_t @ (coef * q) @ _DCT8 + 128.0
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
    # upsample each plane to full MCU-grid resolution, crop, color-convert
    full = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        p = planes[ci]
        if hi < hmax or vi < vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    return _planes_to_rgb(full)


def _planes_to_rgb(full: list) -> np.ndarray:
    """Cropped sample planes → uint8 RGB (shared baseline/progressive tail)."""
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return np.clip(rgb, 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# progressive (SOF2) — T.81 Annex G.1.2: each scan delivers a spectral band
# [Ss,Se] of every block's zigzag DCT coefficients at successive-approximation
# bit position Al; coefficients accumulate across scans and IDCT runs once at
# EOI. Four pass types: DC first / DC refine (Ss=Se=0), AC first / AC refine
# (Ss>0, always single-component per G.1.1.1.1).
# ---------------------------------------------------------------------------


def _next_marker_pos(data: bytes, pos: int) -> int:
    """First byte offset >= pos of a real marker (skips entropy bytes,
    0xFF00 stuffing, RSTn, and 0xFF fill runs)."""
    n = len(data)
    while pos < n - 1:
        if data[pos] != 0xFF:
            pos += 1
        elif data[pos + 1] == 0x00:
            pos += 2
        elif 0xD0 <= data[pos + 1] <= 0xD7:
            pos += 2
        elif data[pos + 1] == 0xFF:
            pos += 1
        else:
            return pos
    return n


def _alloc_coefs(frame) -> list:
    """Per-component zigzag coefficient grids, padded to the interleaved
    MCU grid (non-interleaved scans touch only the true block grid)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    return [
        np.zeros((mcuy * vi, mcux * hi, 64), dtype=np.int32)
        for _cid, hi, vi, _tq in comps
    ]


def _dc_pass(r, coef, dec, ah: int, al: int, preds, ci: int) -> None:
    if ah == 0:
        s = r.huff(dec)
        diff = _extend(r.bits(s), s) if s else 0
        preds[ci] += diff
        # T.81 A.4: the DC point transform is an ARITHMETIC shift (the AC
        # one is sign-magnitude divide — both reduce to << on decode)
        coef[0] = preds[ci] << al
    elif r.bit():
        # append one magnitude bit (two's-complement identity: the stored
        # value is (dc >> al+1) << al+1, so += (1<<al) sets bit al exactly)
        coef[0] += 1 << al


def _ac_first(r, coef, dec, ss, se, al, eobrun) -> int:
    """AC first pass (Ah=0) for one block; returns the new EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = r.huff(dec)
        rr, s = rs >> 4, rs & 0x0F
        if s == 0:
            if rr < 15:  # EOBn: run of (1<<rr)+bits(rr) all-done blocks
                eb = (1 << rr) - 1
                if rr:
                    eb += r.bits(rr)
                return eb
            k += 16  # ZRL
        else:
            k += rr
            if k > se:
                raise ValueError("AC coefficient index outside spectral band")
            coef[k] = _extend(r.bits(s), s) << al
            k += 1
    return 0


def _ac_refine(r, coef, dec, ss, se, al, eobrun) -> int:
    """AC refinement pass (Ah=Al+1) for one block; returns the EOB run.

    Zero-history coefficients consume the (run,1) symbols; every NONZERO
    history coefficient passed over (or swept during an EOB run) consumes
    one correction bit that appends bit Al to its magnitude."""
    bit = 1 << al

    def _correct(k_):
        if r.bit() and not (int(coef[k_]) & bit):
            coef[k_] += bit if coef[k_] > 0 else -bit

    if eobrun > 0:
        for k in range(ss, se + 1):
            if coef[k] != 0:
                _correct(k)
        return eobrun - 1
    k = ss
    while k <= se:
        rs = r.huff(dec)
        rr, s = rs >> 4, rs & 0x0F
        val = 0
        if s == 0:
            if rr < 15:
                eobrun = (1 << rr) - 1
                if rr:
                    eobrun += r.bits(rr)
                rr = 64  # no new coefficient; sweep corrections to band end
            # rr == 15 (ZRL): skip 16 zero-history coefficients
        else:
            if s != 1:
                raise ValueError("AC refinement magnitude must be 1")
            val = bit if r.bit() else -bit
        while k <= se:
            if coef[k] != 0:
                _correct(k)
            else:
                if rr == 0:
                    if val:
                        coef[k] = val
                    k += 1
                    break
                rr -= 1
            k += 1
    return eobrun


def _decode_prog_scan(data, start, frame, scan, band, huff_dc, huff_ac, dri, coefs):
    """Decode one progressive scan's entropy segment into ``coefs``."""
    h, w, comps = frame
    ss, se, ah, al = band
    if not (ss <= se <= 63 and (ss > 0 or se == 0)):
        raise ValueError(f"bad progressive spectral band [{ss},{se}]")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    r = _BitReader(data, start)
    preds = [0] * len(comps)
    if ss == 0:  # DC scan — the only kind that may interleave components
        if len(scan) > 1:
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    if dri and mcu and mcu % dri == 0:
                        r.restart()
                        preds = [0] * len(comps)
                    mcu += 1
                    for ci, tdc, _tac in scan:
                        _cid, hi, vi, _tq = comps[ci]
                        for by in range(vi):
                            for bx in range(hi):
                                _dc_pass(
                                    r, coefs[ci][my * vi + by, mx * hi + bx],
                                    huff_dc[tdc] if ah == 0 else None,
                                    ah, al, preds, ci,
                                )
            return
        ci, tdc, _tac = scan[0]
    else:
        if len(scan) != 1:
            raise ValueError("progressive AC scan must be single-component")
        ci, _tdc, tac = scan[0]
    # non-interleaved: raster order over the component's TRUE block grid
    # (T.81 A.2: MCU = one data unit; padded MCU-alignment blocks excluded)
    _cid, hi, vi, _tq = comps[ci]
    cw = -(-(w * hi) // hmax)  # component sample dims (A.1.1)
    ch = -(-(h * vi) // vmax)
    cbw = -(-cw // 8)
    cbh = -(-ch // 8)
    eobrun = 0
    mcu = 0
    for by in range(cbh):
        for bx in range(cbw):
            if dri and mcu and mcu % dri == 0:
                r.restart()
                preds = [0] * len(comps)
                eobrun = 0
            mcu += 1
            blk = coefs[ci][by, bx]
            if ss == 0:
                _dc_pass(
                    r, blk, huff_dc[tdc] if ah == 0 else None, ah, al, preds, ci
                )
            elif ah == 0:
                eobrun = _ac_first(r, blk, huff_ac[tac], ss, se, al, eobrun)
            else:
                eobrun = _ac_refine(r, blk, huff_ac[tac], ss, se, al, eobrun)


def _reconstruct(frame, qtables, coefs) -> np.ndarray:
    """Accumulated zigzag coefficients → dequantize → IDCT → RGB."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    idct_t = _DCT8.T
    full = []
    for ci, (_cid, hi, vi, tq) in enumerate(comps):
        arr = coefs[ci]
        bh, bw = arr.shape[:2]
        nat = np.zeros((bh, bw, 8, 8), dtype=np.float32)
        nat[:, :, _ZZ_ROWS, _ZZ_COLS] = arr
        nat *= qtables[tq].astype(np.float32)
        blocks = idct_t @ nat @ _DCT8 + 128.0
        # float32 plane storage mirrors the baseline decoder exactly, so
        # the two paths produce bit-identical pixels from equal coefficients
        p = blocks.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8).astype(np.float32)
        if hi < hmax or vi < vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        full.append(p[:h, :w])
    return _planes_to_rgb(full)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _simple_huff(symbols: list[int]) -> tuple[list[int], list[int]]:
    """A legal canonical table giving every symbol the same code length L
    (2^L > nsymbols, all-ones code unused). Suboptimal compression,
    perfectly standard — the decoder reads whatever DHT declares."""
    length = max(2, (len(symbols)).bit_length())
    if len(symbols) >= (1 << length) - 1:
        length += 1
    counts = [0] * 16
    counts[length - 1] = len(symbols)
    return counts, list(symbols)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsample: bool = False,
    restart_interval: int = 0, progressive: bool = False,
    successive: bool = False,
) -> bytes:
    """HxWx3 uint8 RGB (or HxW grayscale) → JFIF bytes.

    ``subsample=True`` emits 4:2:0 chroma; ``restart_interval`` emits DRI +
    RSTn markers every that many MCUs (exercises decoder resync).
    ``progressive=True`` emits SOF2 with a spectral-selection scan script
    (DC scan + per-component AC 1-63 scans); ``successive=True`` adds
    successive approximation (Al=1 first passes + Ah=1 refinement scans) —
    both exist so the progressive DECODER can be tested against
    spec-conformant fixtures without an imaging library.
    ``restart_interval`` is ignored in progressive mode."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    qlum = _scaled_q(_Q_LUM, quality)
    qchrom = _scaled_q(_Q_CHROM, quality)
    if gray:
        planes = [img.astype(np.float32)]
        samp = [(1, 1)]
        qsel = [0]
    else:
        rgb = img.astype(np.float32)
        y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
        cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
        cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
        if subsample:
            # pad to even dims then average 2x2
            ph, pw = h + (h & 1), w + (w & 1)
            def pad2(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = pad2(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad2(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # pad planes to full MCU coverage
    padded = []
    for p, (hi, vi) in zip(planes, samp):
        th, tw = mcuy * vi * 8, mcux * hi * 8
        padded.append(
            np.pad(
                p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
            ).astype(np.float32)
        )
    # Huffman tables: DC categories 0-11; AC symbols = EOB/ZRL + all (run,size)
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    dc_counts, dc_vals = _simple_huff(dc_syms)
    ac_counts, ac_vals = _simple_huff(ac_syms)
    dc_codes = _canonical_codes(dc_counts, dc_vals)
    ac_codes = _canonical_codes(ac_counts, ac_vals)

    qmats = [qlum, qchrom]
    if progressive:
        return _encode_progressive(
            padded, samp, qsel, qmats, h, w,
            (dc_counts, dc_vals, dc_codes), (ac_counts, ac_vals, ac_codes),
            successive,
        )

    bw = _BitWriter()
    preds = [0] * len(planes)

    def encode_block(block: np.ndarray, q: np.ndarray, ci: int) -> None:
        coef = _DCT8 @ (block - 128.0) @ _DCT8.T
        zz = np.round(coef / q)[_ZZ_ROWS, _ZZ_COLS].astype(np.int64)
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        s = _category(diff)
        code, ln = dc_codes[s]
        bw.write(code, ln)
        if s:
            bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        run = 0
        last_nz = np.nonzero(zz[1:])[0]
        end = (last_nz[-1] + 2) if last_nz.size else 1
        for k in range(1, end):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                bw.write(code, ln)
                run -= 16
            s = _category(v)
            code, ln = ac_codes[(run << 4) | s]
            bw.write(code, ln)
            bw.write(v if v > 0 else v + (1 << s) - 1, s)
            run = 0
        if end < 64:
            code, ln = ac_codes[0x00]
            bw.write(code, ln)

    rst = 0
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, ((hi, vi), p) in enumerate(zip(samp, padded)):
                q = qmats[qsel[ci]]
                for by in range(vi):
                    for bx in range(hi):
                        y0 = (my * vi + by) * 8
                        x0 = (mx * hi + bx) * 8
                        encode_block(p[y0 : y0 + 8, x0 : x0 + 8], q, ci)
    bw.flush()

    # --- assemble segments ---
    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qmats[: 1 if gray else 2]):
        out += seg(0xDB, bytes([tq]) + bytes(int(x) for x in q[_ZZ_ROWS, _ZZ_COLS]))
    ncomp = 1 if gray else 3
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qsel[ci]])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0 for all comps
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# progressive encoder (decoder-test scaffolding)
# ---------------------------------------------------------------------------


def _encode_progressive(padded, samp, qsel, qmats, h, w, dc_tbl, ac_tbl,
                        successive: bool) -> bytes:
    """SOF2 JFIF bytes per T.81 Annex G.1.2.

    Scan script: interleaved DC scan (non-interleaved for 1 component)
    followed by one AC 1-63 scan per component; with ``successive`` the
    script runs each scan at Al=1 first and appends Ah=1 refinement scans.
    EOB runs are emitted one block at a time (symbol 0x00 — legal, just
    uncompressed); the AC refinement emitter mirrors the decoder's walk so
    correction bits land exactly where G.1.2.3 consumes them."""
    dc_counts, dc_vals, dc_codes = dc_tbl
    ac_counts, ac_vals, ac_codes = ac_tbl
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ncomp = len(padded)

    # quantized zigzag coefficients over the padded MCU grid + true grids
    zz, tdims = [], []
    for ci, (p, (hi, vi)) in enumerate(zip(padded, samp)):
        q = qmats[qsel[ci]]
        bh, bwid = p.shape[0] // 8, p.shape[1] // 8
        blocks = p.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3) - 128.0
        coef = _DCT8 @ blocks @ _DCT8.T
        zz.append(np.round(coef / q)[..., _ZZ_ROWS, _ZZ_COLS].astype(np.int64))
        cw = -(-(w * hi) // hmax)
        ch = -(-(h * vi) // vmax)
        tdims.append((-(-ch // 8), -(-cw // 8)))

    def dc_blocks():
        """Block visit order of a DC scan (interleaved iff ncomp > 1)."""
        if ncomp > 1:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci, (hi, vi) in enumerate(samp):
                        for by in range(vi):
                            for bx in range(hi):
                                yield ci, my * vi + by, mx * hi + bx
        else:
            tbh, tbw = tdims[0]
            for r_ in range(tbh):
                for c_ in range(tbw):
                    yield 0, r_, c_

    def dc_first(al: int) -> bytes:
        bw = _BitWriter()
        preds = [0] * ncomp
        for ci, r_, c_ in dc_blocks():
            v = int(zz[ci][r_, c_, 0]) >> al  # DC point transform: >> (A.4)
            diff = v - preds[ci]
            preds[ci] = v
            s = _category(diff)
            code, ln = dc_codes[s]
            bw.write(code, ln)
            if s:
                bw.write(diff if diff > 0 else diff + (1 << s) - 1, s)
        bw.flush()
        return bytes(bw.out)

    def dc_refine(al: int) -> bytes:
        bw = _BitWriter()
        for ci, r_, c_ in dc_blocks():
            bw.write((int(zz[ci][r_, c_, 0]) >> al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def ac_first(ci: int, al: int) -> bytes:
        bw = _BitWriter()
        tbh, tbw = tdims[ci]
        for r_ in range(tbh):
            for c_ in range(tbw):
                blk = zz[ci][r_, c_]
                # AC point transform: sign-magnitude divide (A.4)
                vals = [
                    (abs(int(v)) >> al) * (1 if v > 0 else -1)
                    for v in blk[1:64]
                ]
                nz = [i for i, v in enumerate(vals) if v]
                last = nz[-1] if nz else -1
                run = 0
                for i in range(last + 1):
                    v = vals[i]
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[0xF0]
                        bw.write(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = ac_codes[(run << 4) | s]
                    bw.write(code, ln)
                    bw.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if last < 62:  # trailing zeros → EOB covering this block only
                    code, ln = ac_codes[0x00]
                    bw.write(code, ln)
        bw.flush()
        return bytes(bw.out)

    def ac_refine(ci: int, al: int) -> bytes:
        bw = _BitWriter()
        tbh, tbw = tdims[ci]
        for r_ in range(tbh):
            for c_ in range(tbw):
                blk = zz[ci][r_, c_]
                # ordered events the decoder will walk: zero-history zeros
                # ('z'), correction bits for nonzero-history coefs
                # ('c', bit), newly-nonzero placements ('n', positive?)
                events = []
                for k in range(1, 64):
                    c = int(blk[k])
                    mag = abs(c)
                    if mag >> (al + 1):
                        events.append(("c", (mag >> al) & 1))
                    elif (mag >> al) & 1:
                        events.append(("n", c > 0))
                    else:
                        events.append(("z", 0))
                i, n_ev = 0, len(events)
                while True:
                    j, zeros = i, 0
                    while j < n_ev and events[j][0] != "n":
                        if events[j][0] == "z":
                            zeros += 1
                        j += 1
                    if j == n_ev:
                        if i < n_ev:  # tail: EOB sweep consumes corr bits
                            code, ln = ac_codes[0x00]
                            bw.write(code, ln)
                            for kind, b in events[i:]:
                                if kind == "c":
                                    bw.write(b, 1)
                        break
                    while zeros > 15:
                        # ZRL: decoder skips 16 zero-history coefs, reading
                        # corr bits for nonzero-history coefs in between
                        code, ln = ac_codes[0xF0]
                        bw.write(code, ln)
                        consumed = 0
                        while consumed < 16:
                            kind, b = events[i]
                            i += 1
                            if kind == "z":
                                consumed += 1
                            else:
                                bw.write(b, 1)
                        zeros -= 16
                    code, ln = ac_codes[(zeros << 4) | 1]
                    bw.write(code, ln)
                    bw.write(1 if events[j][1] else 0, 1)  # sign bit
                    for kind, b in events[i:j]:
                        if kind == "c":
                            bw.write(b, 1)
                    i = j + 1
        bw.flush()
        return bytes(bw.out)

    # --- scan script ---
    scans = []  # (sos_components, Ss, Se, Ah, Al, entropy)
    dc_comps = list(range(ncomp))
    if successive:
        scans.append((dc_comps, 0, 0, 0, 1, dc_first(1)))
        for ci in range(ncomp):
            scans.append(([ci], 1, 63, 0, 1, ac_first(ci, 1)))
        scans.append((dc_comps, 0, 0, 1, 0, dc_refine(0)))
        for ci in range(ncomp):
            scans.append(([ci], 1, 63, 1, 0, ac_refine(ci, 0)))
    else:
        scans.append((dc_comps, 0, 0, 0, 0, dc_first(0)))
        for ci in range(ncomp):
            scans.append(([ci], 1, 63, 0, 0, ac_first(ci, 0)))

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qmats[: 1 if ncomp == 1 else 2]):
        out += seg(0xDB, bytes([tq]) + bytes(int(x) for x in q[_ZZ_ROWS, _ZZ_COLS]))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, qsel[ci]])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_vals))
    for comps_, ss, se, ah, al, entropy in scans:
        sos = bytes([len(comps_)])
        for ci in comps_:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos)
        out += entropy
    out += b"\xff\xd9"
    return bytes(out)
