"""Minimal baseline JPEG codec — pure stdlib + numpy, no PIL.

Reference parity: docling-serve pipelines rasterize and OCR real images
(reference docs/usage.md:16-20,29-30); JPEG is the dominant raster
format on the web, so the pixel-operator family (raster stats / OCR /
classify in media.py) needs a real JPEG path, not just PNG/GIF/BMP.

Scope is baseline sequential DCT (ITU-T T.81, SOF0):

- decoder: marker walk (APPn/COM skip, DQT 8/16-bit, DHT built from the
  stream's own BITS/HUFFVAL, SOF0, DRI), entropy decode with 0xFF00
  unstuffing and RSTn restart handling, DC prediction, AC run/ZRL/EOB,
  dequantize, vectorized numpy IDCT over all blocks of a component at
  once, chroma upsample by replication, JFIF YCbCr->RGB.  Returns
  ``(w, h, top-down RGB rows)`` or None — same contract as the other
  ``media.decode_rgb`` codecs; never raises on hostile bytes.
- encoder: deterministic writer used to synthesize gate payloads — real
  FDCT, flat quantization (q=1), canonical Huffman coding, byte
  stuffing, optional restart intervals, grayscale (1x1) or YCbCr 4:2:0
  color.  With q=1 a per-8x8-block-solid image is DC-only and decodes
  byte-exactly, which is what lets the DuckDB oracle recompute raster
  stats from a (doc_id, bx, by) formula while the wire bytes still
  exercise the full Huffman/bitstream machinery.

Everything here derives from the public JPEG spec; the Huffman tables
are our own canonical construction (EOB at 2 bits, ZRL at 6, the 160
run/size symbols at 10), not a copy of any implementation's tables.
"""
from __future__ import annotations

import struct
from functools import lru_cache

import numpy as np

# zigzag index -> raster index (T.81 Figure A.6)
ZIGZAG = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)
_ZZ_IDX = np.array(ZIGZAG)

# 8x8 DCT-II basis matrix: M[u,x] = c(u)/2 * cos((2x+1) u pi / 16).
# FDCT: S = M @ s @ M.T ; IDCT: s = M.T @ S @ M.
_DCTM = np.zeros((8, 8))
for _u in range(8):
    _c = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _DCTM[_u, _x] = (_c / 2.0) * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# --- Huffman tables (our own canonical layout, valid per T.81 Annex C) ---
# DC: 12 category symbols, lengths 2,3,3,3,3,3,4,5,6,7,8,9 (Kraft-valid).
DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))
# AC: EOB at 2 bits, ZRL at 6 bits, the 160 (run,size) symbols at 10.
AC_BITS = [0, 1, 0, 0, 0, 1, 0, 0, 0, 160, 0, 0, 0, 0, 0, 0]
AC_VALS = [0x00, 0xF0] + [(r << 4) | s for r in range(16)
                          for s in range(1, 11)]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """T.81 Annex C code assignment: symbol -> (code, length)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = _canonical_codes(DC_BITS, DC_VALS)
_ENC_AC = _canonical_codes(AC_BITS, AC_VALS)


def _mag_category(v: int) -> int:
    """Size category of a coefficient (number of magnitude bits)."""
    return int(abs(v)).bit_length()


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF -> 0xFF 0x00 stuffing.

    Bits collect into ONE big int and flush to bytes in chunks:
    ``to_bytes`` + C-level ``replace`` perform the byte split and the
    0xFF00 stuffing (stuffing is per-0xFF-byte, independent of
    neighbors, so chunked flushing is exact).  Byte-identical to the
    per-byte emitter it replaces: MSB-first concatenation means the
    accumulated int IS the bit stream."""

    _FLUSH_BITS = 1 << 13      # flush at ~1 KiB so shifts stay small

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        if self._n >= self._FLUSH_BITS:
            self._flush()

    def _flush(self) -> None:
        k = self._n >> 3
        if not k:
            return
        rem = self._n & 7
        chunk = (self._acc >> rem).to_bytes(k, "big")
        self._acc &= (1 << rem) - 1
        self._n = rem
        if b"\xff" in chunk:
            chunk = chunk.replace(b"\xff", b"\xff\x00")
        self.out += chunk

    def pad_align(self) -> None:
        """Pad to a byte boundary with 1-bits (T.81 F.1.2.3), then
        flush everything so ``out`` holds the full stuffed stream."""
        if self._n & 7:
            pad = 8 - (self._n & 7)
            self._acc = (self._acc << pad) | ((1 << pad) - 1)
            self._n += pad
        self._flush()


_BLOCK_CACHE: dict = {}
_BLOCK_CACHE_MAX = 1 << 16


def _encode_block(w: _BitWriter, coefs: np.ndarray, dc_pred: int) -> int:
    """Huffman-encode one quantized 8x8 block (raster order); returns
    the new DC predictor.  Iterates only the nonzero AC positions.

    Memoized per (block bytes, dc_pred): the glyph-grid / solid-block
    fixtures repeat a tiny universe of blocks, so symbol derivation
    runs once per distinct pair and replays as ONE concatenated put —
    bit-identical output because put(a,n);put(b,m) equals
    put((a<<m)|b, n+m) by construction (MSB-first concatenation)."""
    key = (coefs.tobytes(), dc_pred)
    hit = _BLOCK_CACHE.get(key)
    if hit is None:
        acc = 0
        nbits = 0
        zz = coefs.reshape(64)[_ZZ_IDX]
        dc = int(zz[0])
        diff = dc - dc_pred
        size = _mag_category(diff)
        code, ln = _ENC_DC[size]
        acc = (acc << ln) | code
        nbits += ln
        if size:
            bits = diff if diff >= 0 else diff + (1 << size) - 1
            acc = (acc << size) | (bits & ((1 << size) - 1))
            nbits += size
        nz = np.nonzero(zz[1:])[0]
        prev = 0                          # next unencoded AC pos - 1
        for p in nz:
            run = int(p) - prev
            prev = int(p) + 1
            while run >= 16:
                zc, zl = _ENC_AC[0xF0]
                acc = (acc << zl) | zc
                nbits += zl
                run -= 16
            v = int(zz[1 + p])
            size = _mag_category(v)
            ac, al = _ENC_AC[(run << 4) | size]
            acc = (acc << al) | ac
            nbits += al
            bits = v if v >= 0 else v + (1 << size) - 1
            acc = (acc << size) | (bits & ((1 << size) - 1))
            nbits += size
        if prev < 63:
            ec, el = _ENC_AC[0x00]
            acc = (acc << el) | ec
            nbits += el
        if len(_BLOCK_CACHE) >= _BLOCK_CACHE_MAX:
            _BLOCK_CACHE.clear()
        hit = _BLOCK_CACHE[key] = (acc, nbits, dc)
    w.put(hit[0], hit[1])
    return hit[2]


def _pad_plane(plane: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Edge-replicate a plane up to (bh, bw) multiples-of-8... actually
    to exactly (bh, bw) which the caller sizes to the MCU grid."""
    h, w = plane.shape
    if h == bh and w == bw:
        return plane
    out = np.empty((bh, bw), dtype=plane.dtype)
    out[:h, :w] = plane
    if w < bw:
        out[:h, w:] = plane[:, w - 1:w]
    if h < bh:
        out[h:, :] = out[h - 1:h, :]
    return out


def _fdct_quant(plane: np.ndarray) -> np.ndarray:
    """(H,W) uint8 plane -> (H//8, W//8, 8, 8) int32 quantized (q=1)
    DCT coefficients.  Vectorized across all blocks."""
    h, w = plane.shape
    blocks = (plane.astype(np.float64) - 128.0).reshape(
        h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    coefs = np.einsum("ux,byxz,vz->byuv", _DCTM, blocks, _DCTM)
    return np.rint(coefs).astype(np.int32)


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def jpeg_encode_gray(w: int, h: int, rows: list[bytes], *,
                     color: bool = False, restart: int = 0) -> bytes:
    """Encode a grayscale raster as a baseline JPEG.

    ``color=False`` writes a 1-component (luma only) stream; ``True``
    writes a 3-component YCbCr 4:2:0 stream with constant-128 chroma
    (gray content has Cb=Cr=128 exactly, so decode returns R=G=B).
    ``restart`` > 0 writes DRI and emits RSTn every ``restart`` MCUs.
    Quantization is flat q=1 on table 0 for all components.
    """
    plane = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w)
    out = bytearray()
    out += b"\xff\xd8"                                        # SOI
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"  # APP0
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64  # DQT
    if color:
        comps = [(1, 0x22, 0), (2, 0x11, 0), (3, 0x11, 0)]
    else:
        comps = [(1, 0x11, 0)]
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, samp, tq in comps:
        sof += bytes([cid, samp, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof  # SOF0
    out += _dht_segment(0, 0, DC_BITS, DC_VALS)
    out += _dht_segment(1, 0, AC_BITS, AC_VALS)
    if color:
        out += _dht_segment(0, 1, DC_BITS, DC_VALS)
        out += _dht_segment(1, 1, AC_BITS, AC_VALS)
    if restart:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart)    # DRI
    sos = bytes([len(comps)])
    for cid, _samp, _tq in comps:
        sos += bytes([cid, 0x00 if cid == 1 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos  # SOS

    if color:
        mcu_w, mcu_h = 16, 16
        mcus_x = (w + mcu_w - 1) // mcu_w
        mcus_y = (h + mcu_h - 1) // mcu_h
        luma = _pad_plane(plane, mcus_x * 16, mcus_y * 16)
        ycoef = _fdct_quant(luma)
        # chroma planes are constant 128 -> all-zero coefficient blocks
        zero = np.zeros((8, 8), dtype=np.int32)
        writer = _BitWriter()
        preds = [0, 0, 0]
        rst, mcu_i = 0, 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and mcu_i and mcu_i % restart == 0:
                    writer.pad_align()
                    writer.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    preds = [0, 0, 0]
                for by in range(2):
                    for bx in range(2):
                        preds[0] = _encode_block(
                            writer, ycoef[my * 2 + by, mx * 2 + bx], preds[0])
                preds[1] = _encode_block(writer, zero, preds[1])
                preds[2] = _encode_block(writer, zero, preds[2])
                mcu_i += 1
        writer.pad_align()
    else:
        mcus_x = (w + 7) // 8
        mcus_y = (h + 7) // 8
        luma = _pad_plane(plane, mcus_x * 8, mcus_y * 8)
        ycoef = _fdct_quant(luma)
        writer = _BitWriter()
        pred = 0
        rst, mcu_i = 0, 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and mcu_i and mcu_i % restart == 0:
                    writer.pad_align()
                    writer.out += bytes([0xFF, 0xD0 + rst])
                    rst = (rst + 1) % 8
                    pred = 0
                pred = _encode_block(writer, ycoef[my, mx], pred)
                mcu_i += 1
        writer.pad_align()
    out += writer.out
    out += b"\xff\xd9"                                        # EOI
    return bytes(out)


# --- progressive encoder ---------------------------------------------------
# AC table for progressive scans: baseline's layout plus the 14 EOBn
# run-length symbols (0x10..0xE0) progressive EOB-run coding needs.
# Kraft check: 2^-2 + 2^-6 + 174*2^-10 = 0.4355 < 1 — valid.
AC_PROG_BITS = [0, 1, 0, 0, 0, 1, 0, 0, 0, 174, 0, 0, 0, 0, 0, 0]
AC_PROG_VALS = ([0x00, 0xF0] + [r << 4 for r in range(1, 15)]
                + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_ENC_ACP = _canonical_codes(AC_PROG_BITS, AC_PROG_VALS)


def _put_eobrun(w: _BitWriter, eobrun: int, pending: list[int]) -> None:
    """Emit an EOBn symbol covering ``eobrun`` blocks, then the
    buffered refinement correction bits (T.81 G.1.2.3: bits buffered
    since the previous symbol follow the next symbol)."""
    if eobrun:
        r = eobrun.bit_length() - 1
        code, ln = _ENC_ACP[r << 4]
        w.put(code, ln)
        if r:
            w.put(eobrun - (1 << r), r)
    for bit in pending:
        w.put(bit, 1)


def _enc_dc_first_scan(wr: _BitWriter, blocks: list) -> None:
    """DC first scan (Al applied by caller): ``blocks`` is the scan's
    block sequence as (comp_idx, zz) — MCU-interleaved or a single
    component's row-major grid; predictors are per component."""
    preds: dict[int, int] = {}
    for ci, zz in blocks:
        v = int(zz[0]) >> 1                   # arithmetic shift, Al=1
        diff = v - preds.get(ci, 0)
        preds[ci] = v
        size = _mag_category(diff)
        code, ln = _ENC_DC[size]
        wr.put(code, ln)
        if size:
            wr.put(diff if diff >= 0 else diff + (1 << size) - 1, size)


def _enc_dc_refine_scan(wr: _BitWriter, blocks: list) -> None:
    """DC refinement: one raw bit per block, no entropy coding."""
    for _ci, zz in blocks:
        wr.put(int(zz[0]) & 1, 1)


def _t2(v: int) -> int:
    """AC point transform at Al=1: truncate toward zero (G.1.2.2)."""
    return -((-v) >> 1) if v < 0 else v >> 1


def _enc_ac_first_scan(wr: _BitWriter, zz_blocks: list) -> None:
    """AC first scan 1..63 at Al=1 over ONE component's blocks,
    EOB-run coded across all-zero tails/blocks."""
    eobrun = 0
    for zz in zz_blocks:
        vals = [_t2(int(zz[k])) for k in range(1, 64)]
        nz = [j for j, v in enumerate(vals) if v]
        if not nz:
            eobrun += 1
            if eobrun == 32767:
                _put_eobrun(wr, eobrun, [])
                eobrun = 0
            continue
        _put_eobrun(wr, eobrun, [])
        eobrun = 0
        prev = 0
        for j in nz:
            run = j - prev
            prev = j + 1
            while run >= 16:
                zc, zl = _ENC_ACP[0xF0]
                wr.put(zc, zl)
                run -= 16
            v = vals[j]
            size = _mag_category(v)
            ac, al_ = _ENC_ACP[(run << 4) | size]
            wr.put(ac, al_)
            wr.put(v if v >= 0 else v + (1 << size) - 1, size)
        if prev < 63:
            eobrun = 1
    _put_eobrun(wr, eobrun, [])


def _enc_ac_refine_scan(wr: _BitWriter, zz_blocks: list) -> None:
    """AC refinement Al 1->0 over ONE component's blocks — mirrors
    the decoder's G.1.2.3 traversal exactly: events per position are
    H (history-nonzero, carries a correction bit), Z (stays zero),
    N (newly ±1)."""
    eobrun = 0
    pending: list[int] = []
    for zz in zz_blocks:
        events = []
        for k in range(1, 64):
            v = int(zz[k])
            if _t2(v):                       # history nonzero after first
                events.append(("H", abs(v) & 1))
            elif v:                          # |v| == 1: newly significant
                events.append(("N", 1 if v > 0 else 0))
            else:
                events.append(("Z", 0))
        if not any(t == "N" for t, _ in events):
            eobrun += 1
            pending.extend(b for t, b in events if t == "H")
            if eobrun == 32767:
                _put_eobrun(wr, eobrun, pending)
                eobrun, pending = 0, []
            continue
        _put_eobrun(wr, eobrun, pending)
        eobrun, pending = 0, []
        i = 0
        n_ev = len(events)
        while i < n_ev:
            # scan ahead to the next newly-significant coefficient
            z = 0
            j = i
            nxt = None
            while j < n_ev:
                t = events[j][0]
                if t == "Z":
                    z += 1
                elif t == "N":
                    nxt = j
                    break
                j += 1
            if nxt is None:
                tail_bits = [b for t, b in events[i:] if t == "H"]
                if z > 0 or tail_bits:
                    eobrun = 1
                    pending = tail_bits
                break
            # ZRLs: each consumes exactly 16 Z positions; H bits
            # crossed attach to THAT symbol (decoder reads them
            # during its advance)
            while z >= 16:
                cnt = 0
                zbits = []
                while cnt < 16:
                    t, bit = events[i]
                    if t == "H":
                        zbits.append(bit)
                    else:
                        cnt += 1
                    i += 1
                zc, zl = _ENC_ACP[0xF0]
                wr.put(zc, zl)
                for bit in zbits:
                    wr.put(bit, 1)
                z -= 16
            rest_bits = [b for t, b in events[i:nxt] if t == "H"]
            code, ln = _ENC_ACP[(z << 4) | 1]
            wr.put(code, ln)
            wr.put(events[nxt][1], 1)        # sign bit (1 = positive)
            for bit in rest_bits:
                wr.put(bit, 1)
            i = nxt + 1
    _put_eobrun(wr, eobrun, pending)


def _prog_headers(w: int, h: int, comps: list[tuple]) -> bytearray:
    """SOI..DHT for a progressive stream: flat q=1 DQT, SOF2 with
    ``comps`` = [(cid, samp_byte)], DC table 0, progressive AC table 0."""
    out = bytearray()
    out += b"\xff\xd8"
    out += (b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
            + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0]))
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + b"\x01" * 64
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, samp in comps:
        sof += bytes([cid, samp, 0])
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof   # SOF2
    out += _dht_segment(0, 0, DC_BITS, DC_VALS)
    out += _dht_segment(1, 0, AC_PROG_BITS, AC_PROG_VALS)
    return out


def _sos(comp_ids: list[int], ss: int, se: int, ah: int,
         al: int) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def jpeg_encode_gray_progressive(w: int, h: int,
                                 rows: list[bytes]) -> bytes:
    """Encode a grayscale raster as a REAL progressive JPEG (SOF2),
    four scans exercising every progressive decode path: DC first
    (Al=1), AC first 1..63 (Al=1, EOB-run coded), DC refinement (raw
    bits), AC refinement (Al 1->0: newly-significant ±1 insertions +
    buffered correction bits, the full G.1.2.3 state machine).
    Quantization is flat q=1, so decode is bit-exact against the
    baseline encoder's output on the same raster."""
    plane = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w)
    bw_, bh_ = (w + 7) // 8, (h + 7) // 8
    coef = _fdct_quant(_pad_plane(plane, bw_ * 8, bh_ * 8))
    blocks = [coef[by, bx].reshape(64)[_ZZ_IDX]
              for by in range(bh_) for bx in range(bw_)]
    out = _prog_headers(w, h, [(1, 0x11)])
    for scan, writer in (
            ((0, 0, 0, 1), lambda wr: _enc_dc_first_scan(
                wr, [(0, zz) for zz in blocks])),
            ((1, 63, 0, 1), lambda wr: _enc_ac_first_scan(wr, blocks)),
            ((0, 0, 1, 0), lambda wr: _enc_dc_refine_scan(
                wr, [(0, zz) for zz in blocks])),
            ((1, 63, 1, 0), lambda wr: _enc_ac_refine_scan(wr, blocks))):
        wr = _BitWriter()
        writer(wr)
        wr.pad_align()
        out += _sos([1], *scan) + wr.out
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_color_progressive(w: int, h: int,
                                  rows: list[bytes]) -> bytes:
    """Gray content as a 3-component YCbCr 4:2:0 PROGRESSIVE stream
    (Cb=Cr=128 -> all-zero chroma coefficients, so decode returns
    R=G=B exactly like the baseline color encoder): the DC scans are
    MCU-INTERLEAVED across all three components while the AC scans run
    per component over its OWN subsampled block grid — the two
    progressive scan geometries the gray encoder cannot reach."""
    plane = np.frombuffer(b"".join(rows), dtype=np.uint8).reshape(h, w)
    mcus_x = (w + 15) // 16
    mcus_y = (h + 15) // 16
    ycoef = _fdct_quant(_pad_plane(plane, mcus_x * 16, mcus_y * 16))
    zero = np.zeros(64, dtype=np.int32)
    yzz = {}
    for by in range(mcus_y * 2):
        for bx in range(mcus_x * 2):
            yzz[by, bx] = ycoef[by, bx].reshape(64)[_ZZ_IDX]
    # MCU-interleaved DC block order: 4 luma + Cb + Cr per MCU
    dc_blocks = []
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for by in range(2):
                for bx in range(2):
                    dc_blocks.append((0, yzz[my * 2 + by, mx * 2 + bx]))
            dc_blocks.append((1, zero))
            dc_blocks.append((2, zero))
    # non-interleaved AC grids: the component's OWN ceil(c/8) extent
    y_bw = (w + 7) // 8
    y_bh = (h + 7) // 8
    y_ac = [yzz[by, bx] for by in range(y_bh) for bx in range(y_bw)]
    c_bw = ((w + 1) // 2 + 7) // 8
    c_bh = ((h + 1) // 2 + 7) // 8
    c_ac = [zero] * (c_bh * c_bw)
    out = _prog_headers(w, h, [(1, 0x22), (2, 0x11), (3, 0x11)])
    wr = _BitWriter()
    _enc_dc_first_scan(wr, dc_blocks)
    wr.pad_align()
    out += _sos([1, 2, 3], 0, 0, 0, 1) + wr.out
    for cid, blocks in ((1, y_ac), (2, c_ac), (3, c_ac)):
        wr = _BitWriter()
        _enc_ac_first_scan(wr, blocks)
        wr.pad_align()
        out += _sos([cid], 1, 63, 0, 1) + wr.out
    wr = _BitWriter()
    _enc_dc_refine_scan(wr, dc_blocks)
    wr.pad_align()
    out += _sos([1, 2, 3], 0, 0, 1, 0) + wr.out
    for cid, blocks in ((1, y_ac), (2, c_ac), (3, c_ac)):
        wr = _BitWriter()
        _enc_ac_refine_scan(wr, blocks)
        wr.pad_align()
        out += _sos([cid], 1, 63, 1, 0) + wr.out
    out += b"\xff\xd9"
    return bytes(out)


# --------------------------------------------------------------------------
# decoder
# --------------------------------------------------------------------------

class _HuffTable:
    """Decode side of a DHT: a flat fast-LUT indexed by the next
    ``max_len`` bits of the stream -> (symbol, code_length)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.kid = (bytes(bits), bytes(vals))      # content key for memos
        pairs: list[tuple[int, int, int]] = []     # (code, length, symbol)
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                pairs.append((code, length, vals[k]))
                code += 1
                k += 1
            code <<= 1
        self.max_len = max((ln for _, ln, _ in pairs), default=0)
        L = self.max_len
        self.fast: list[tuple[int, int] | None] = [None] * (1 << L)
        for code, length, sym in pairs:
            base = code << (L - length)
            for s in range(1 << (L - length)):
                self.fast[base + s] = (sym, length)


@lru_cache(maxsize=64)
def _huff_table_cached(bits: bytes, vals: bytes) -> _HuffTable:
    """DHT payloads repeat across a corpus of same-encoder images;
    cache the (expensive) fast-LUT build per distinct table."""
    return _HuffTable(list(bits), list(vals))


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None    # marker that ended the segment

    def _fill(self) -> bool:
        d = self.data
        p = self.pos
        if p >= len(d):
            return False
        if d[p] != 0xFF:
            # consume a clean run (no stuffing/marker) in one chunk
            stop = d.find(0xFF, p, p + 8)
            end = stop if stop != -1 else min(p + 8, len(d))
            self.pos = end
            span = end - p
            self._acc = ((self._acc << (8 * span))
                         | int.from_bytes(d[p:end], "big"))
            self._n += 8 * span
            return True
        if p + 1 >= len(d):
            return False
        nxt = d[p + 1]
        if nxt == 0x00:
            self.pos = p + 2
            self._acc = (self._acc << 8) | 0xFF
            self._n += 8
            return True
        self.marker = nxt
        return False                      # a real marker ends the segment

    def read_bit(self) -> int:
        if self._n == 0 and not self._fill():
            raise EOFError
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        while self._n < n:
            if not self._fill():
                raise EOFError
        self._n -= n
        v = (self._acc >> self._n) & ((1 << n) - 1)
        self._acc &= (1 << self._n) - 1
        return v

    def decode_huff(self, table: _HuffTable) -> int:
        """LUT decode: peek max_len bits (zero-padded near the segment
        end), one lookup, consume the matched code's length."""
        L = table.max_len
        while self._n < L:
            if not self._fill():
                break
        n = self._n
        if n >= L:
            prefix = (self._acc >> (n - L)) & ((1 << L) - 1)
        elif n > 0:
            prefix = (self._acc << (L - n)) & ((1 << L) - 1)
        else:
            raise EOFError
        hit = table.fast[prefix]
        if hit is None:
            raise ValueError("bad huffman code")
        sym, length = hit
        if length > n:
            raise EOFError               # code ran past the segment end
        self._n = n - length
        self._acc &= (1 << self._n) - 1
        return sym

    def restart_sync(self) -> None:
        """Byte-align and consume an RSTn marker (T.81 E.2.4)."""
        self._acc = 0
        self._n = 0
        if self.marker is None:
            # marker not yet seen: it must be the next bytes
            if (self.pos + 1 < len(self.data)
                    and self.data[self.pos] == 0xFF
                    and 0xD0 <= self.data[self.pos + 1] <= 0xD7):
                self.pos += 2
                return
            raise ValueError("missing restart marker")
        if 0xD0 <= self.marker <= 0xD7:
            self.pos += 2                 # consume the 0xFF 0xDn pair
            self.marker = None
            return
        raise ValueError("expected RSTn")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: magnitude bits -> signed coefficient."""
    if size == 0:
        return 0
    if v < (1 << (size - 1)):
        return v - (1 << size) + 1
    return v


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """(n,8,8) float coefficients -> (n,8,8) uint8 samples.

    r6: two broadcast matmuls instead of one einsum (9x less per-call
    overhead on frame-sized batches).  Raw float sums can differ in
    the last ULP from the einsum order, but every decoded sample
    passes through rint+clip and the fixture universe is DC-only /
    glyph-threshold content where the order cannot flip a pixel
    (fuzzed: 0 pixel diffs over 566k samples incl. sparse blocks)."""
    spatial = _DCTM.T @ coefs @ _DCTM
    return np.clip(np.rint(spatial + 128.0), 0, 255).astype(np.uint8)


def jpeg_decode_rgb(b: bytes) -> tuple[int, int, list[bytes]] | None:
    """Decode a baseline OR progressive JPEG to (w, h, top-down
    interleaved RGB rows).

    Supports SOF0/SOF1 single-scan streams and SOF2 progressive
    streams (spectral selection + successive approximation: DC
    first/refine, AC first/refine with EOB runs, per T.81 G.1.2 /
    G.2), 1 or 3 components, sampling factors in {1,2}, 8/16-bit DQT,
    DRI/RSTn, and any spec-valid Huffman tables (read from the
    stream).  Returns None for non-JPEG, arithmetic, 12-bit, or
    corrupt input; never raises.
    """
    try:
        return _decode(b)
    except Exception:
        return None


def _decode(b: bytes) -> tuple[int, int, list[bytes]] | None:
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    restart_interval = 0
    frame = None        # (h, w, [(cid, hs, vs, tq), ...])
    progressive = False
    prog = None         # per-component zigzag int coefficient stores
    i = 2
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        if marker == 0xFF:                     # fill byte
            i += 1
            continue
        if marker == 0xD9:                     # EOI
            break                              # assemble if progressive
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            i += 2                             # standalone marker
            continue
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i + 4:i + 2 + seg_len]
        if len(seg) != seg_len - 2:
            return None
        i += 2 + seg_len
        if marker == 0xDB:                     # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    tab = np.frombuffer(seg[p:p + 64], dtype=np.uint8)
                    p += 64
                else:
                    tab = np.frombuffer(seg[p:p + 128],
                                        dtype=">u2").astype(np.int64)
                    p += 128
                if tab.size != 64:
                    return None
                raster = np.zeros(64, dtype=np.int64)
                raster[list(ZIGZAG)] = tab
                qt[tq] = raster.reshape(8, 8)
        elif marker == 0xC4:                   # DHT
            p = 0
            while p + 17 <= len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                cnt = sum(bits)
                vals = list(seg[p + 17:p + 17 + cnt])
                if len(vals) != cnt:
                    return None
                (dc_tabs if tc == 0 else ac_tabs)[th] = _huff_table_cached(
                    bytes(bits), bytes(vals))
                p += 17 + cnt
        elif marker in (0xC0, 0xC1, 0xC2):     # SOF0/1 / SOF2 progressive
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8 or nc not in (1, 3) or fh == 0 or fw == 0:
                return None
            comps = []
            for c in range(nc):
                cid, samp, tq = seg[6 + 3 * c:9 + 3 * c]
                hs, vs = samp >> 4, samp & 0x0F
                if hs not in (1, 2) or vs not in (1, 2):
                    return None
                comps.append((cid, hs, vs, tq))
            frame = (fh, fw, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            return None                        # lossless / arithmetic
        elif marker == 0xDD:                   # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                   # SOS — entropy data follows
            if frame is None:
                return None
            if not progressive:
                return _decode_scan(b, i, seg, frame, qt, dc_tabs,
                                    ac_tabs, restart_interval)
            if prog is None:
                prog = _prog_init(frame)
            i = _prog_scan(b, i, seg, frame, prog, dc_tabs, ac_tabs,
                           restart_interval)
        # APPn / COM / anything else: skipped via seg_len
    if prog is not None:
        return _prog_assemble(frame, prog, qt)
    return None


def _prog_init(frame):
    """Per-component coefficient stores for a progressive frame:
    MCU-grid-padded (interleaved DC scans touch the padding blocks),
    ZIGZAG-ORDER int32 — successive approximation refines integers,
    so floats only appear at assembly."""
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)
    stores = [np.zeros((mcus_y * vs, mcus_x * hs, 64), dtype=np.int32)
              for _cid, hs, vs, _tq in comps]
    return {"stores": stores, "hmax": hmax, "vmax": vmax,
            "mcus_x": mcus_x, "mcus_y": mcus_y}


def _next_marker(b: bytes, pos: int) -> int:
    """Position of the next real marker at/after ``pos`` (skipping
    entropy bytes, 0xFF00 stuffing, fill bytes, and RSTn)."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] != 0xFF:
            pos = b.find(b"\xff", pos + 1)
            if pos < 0:
                raise ValueError("no trailing marker")
            continue
        nxt = b[pos + 1]
        if nxt == 0x00:
            pos += 2                         # stuffed data byte
        elif nxt == 0xFF:
            pos += 1                         # fill byte
        elif 0xD0 <= nxt <= 0xD7:
            pos += 2                         # restart marker
        else:
            return pos
    raise ValueError("no trailing marker")


def _prog_scan(b, pos, sos, frame, prog, dc_tabs, ac_tabs,
               restart_interval) -> int:
    """Consume ONE progressive scan's entropy data (T.81 G.2), update
    the integer coefficient stores, and return the stream offset of
    the next marker."""
    fh, fw, comps = frame
    ns = sos[0]
    if not 1 <= ns <= len(comps) or len(sos) < 4 + 2 * ns:
        raise ValueError("bad SOS")
    ss, se, ahal = sos[1 + 2 * ns:4 + 2 * ns]
    ah, al = ahal >> 4, ahal & 0x0F
    scan = []                                # (store_idx, td_or_ta)
    for c in range(ns):
        cid, tt = sos[1 + 2 * c], sos[2 + 2 * c]
        ci = next((k for k, cc in enumerate(comps) if cc[0] == cid),
                  None)
        if ci is None:
            raise ValueError("unknown component in scan")
        scan.append((ci, tt >> 4, tt & 0x0F))
    if ss == 0 and se != 0:
        raise ValueError("DC scan with spectral band")
    if ss > 0 and ns != 1:
        raise ValueError("interleaved AC scan")   # spec G.1.1.1.1
    if ss > se or se > 63:
        raise ValueError("bad spectral band")
    reader = _BitReader(b, pos)
    stores = prog["stores"]
    hmax, vmax = prog["hmax"], prog["vmax"]
    mcus_x, mcus_y = prog["mcus_x"], prog["mcus_y"]

    if ss == 0:                              # DC scan
        preds = [0] * len(scan)
        if ns == 1:                          # non-interleaved: comp grid
            ci, td, _ta = scan[0]
            _cid, hs, vs, _tq = comps[ci]
            bw = (fw * hs + 8 * hmax - 1) // (8 * hmax)
            bh = (fh * vs + 8 * vmax - 1) // (8 * vmax)
            units = [(0, by, bx) for by in range(bh) for bx in range(bw)]
        else:
            bw = bh = None
            units = None
        mcu_i = 0
        for my in range(mcus_y if ns > 1 else 1):
            for mx in range(mcus_x if ns > 1 else 1):
                blocks = (units if ns == 1 else
                          [(si, my * comps[scan[si][0]][2] + by,
                            mx * comps[scan[si][0]][1] + bx)
                           for si in range(ns)
                           for by in range(comps[scan[si][0]][2])
                           for bx in range(comps[scan[si][0]][1])])
                for si, by, bx in blocks:
                    # a restart unit is an MCU: one block when
                    # non-interleaved, the whole block group otherwise
                    if (ns == 1 and restart_interval and mcu_i
                            and mcu_i % restart_interval == 0):
                        reader.restart_sync()
                        preds = [0] * len(scan)
                    ci, td, _ta = scan[si]
                    blk = stores[ci][by, bx]
                    if ah == 0:              # DC first
                        if td not in dc_tabs:
                            raise ValueError("missing DC table")
                        size = reader.decode_huff(dc_tabs[td])
                        if size > 11:
                            raise ValueError("bad DC size")
                        preds[si] += _extend(reader.receive(size), size)
                        blk[0] = preds[si] << al
                    else:                    # DC refinement: 1 raw bit
                        if reader.read_bit():
                            blk[0] |= 1 << al
                    if ns == 1:
                        mcu_i += 1
                if ns > 1:
                    mcu_i += 1
                    if (restart_interval and mcu_i % restart_interval == 0
                            and (my, mx) != (mcus_y - 1, mcus_x - 1)):
                        reader.restart_sync()
                        preds = [0] * len(scan)
        return _next_marker(b, reader.pos)

    # AC scan: ns == 1, iterate the component's own block grid
    ci, _td, ta = scan[0]
    _cid, hs, vs, _tq = comps[ci]
    if ta not in ac_tabs:
        raise ValueError("missing AC table")
    act = ac_tabs[ta]
    bw = (fw * hs + 8 * hmax - 1) // (8 * hmax)
    bh = (fh * vs + 8 * vmax - 1) // (8 * vmax)
    store = stores[ci]
    eobrun = 0
    mcu_i = 0
    for by in range(bh):
        for bx in range(bw):
            if (restart_interval and mcu_i
                    and mcu_i % restart_interval == 0):
                reader.restart_sync()
                eobrun = 0
            blk = store[by, bx]
            # r6: the per-coefficient walks in the AC block decoders
            # did ~63 numpy scalar reads per block (measured 62% of
            # progressive decode); a plain-int list round-trip makes
            # them list accesses, and the store writes back in one
            # vector assignment.  Values are identical — the stores
            # are int32 and every write is an int.
            blkl = blk.tolist()
            if ah == 0:
                eobrun = _ac_first_block(reader, blkl, ss, se, al,
                                         act, eobrun)
            else:
                eobrun = _ac_refine_block(reader, blkl, ss, se, al,
                                          act, eobrun)
            blk[:] = blkl
            mcu_i += 1
    return _next_marker(b, reader.pos)


def _ac_first_block(reader, blk, ss, se, al, act, eobrun) -> int:
    """AC first scan for one block (T.81 G.2.2): run/size with
    EOB-run coding; new coefficients land at magnitude << Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.decode_huff(act)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                break
            k += 16                          # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC run past Se")
            blk[k] = _extend(reader.receive(s), s) << al
            k += 1
    return eobrun


def _ac_refine_block(reader, blk, ss, se, al, act, eobrun) -> int:
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3 decode mirror): newly-significant coefficients arrive as
    ±(1<<Al); every already-nonzero coefficient crossed — including
    those inside an EOB run — carries one correction bit."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.decode_huff(act)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break                    # remainder handled below
                # r == 15 (ZRL): skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad refinement size")
                val = p1 if reader.read_bit() else -p1
            while k <= se:
                coef = blk[k]
                if coef != 0:
                    if reader.read_bit() and (coef & p1) == 0:
                        blk[k] = coef + (p1 if coef >= 0 else -p1)
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
            coef = blk[k]
            if coef != 0:
                if reader.read_bit() and (coef & p1) == 0:
                    blk[k] = coef + (p1 if coef >= 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _prog_assemble(frame, prog, qt):
    """Dequantize the accumulated integer zigzag stores, IDCT, and
    assemble exactly like the baseline path."""
    fh, fw, comps = frame
    hmax, vmax = prog["hmax"], prog["vmax"]
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in qt:
            return None
        zz = prog["stores"][ci]
        by, bx = zz.shape[:2]
        raster = np.zeros((by, bx, 64), dtype=np.float64)
        raster[:, :, list(ZIGZAG)] = zz
        coefs = raster.reshape(by, bx, 8, 8) * qt[tq][None, None, :, :]
        pix = _idct_blocks(coefs.reshape(-1, 8, 8)).reshape(by, bx, 8, 8)
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        planes.append(plane[:fh, :fw])
    return _to_rgb(fh, fw, planes)


class _Reject(Exception):
    """Stream shapes the baseline decoder answers with None."""


def _seg_end(data: bytes, p: int) -> int:
    """Exclusive end of the entropy segment starting at ``p``: the
    offset of the first REAL-marker 0xFF (stuffed 0xFF00 pairs are
    data; a truncated trailing 0xFF counts as an end, matching the
    reader's ended condition)."""
    dlen = len(data)
    while True:
        q = data.find(0xFF, p)
        if q < 0:
            return dlen
        if q + 1 < dlen and data[q + 1] == 0x00:
            p = q + 2
            continue
        return q


def _gray_segment(data: bytes, pos: int, n_mcus: int,
                  dct: _HuffTable, act: _HuffTable):
    """Entropy-decode ONE restart segment of a 1-component baseline
    scan from a fresh bit state (predictor 0, empty reservoir — the
    T.81 state at a scan start or just after RSTn).  Returns
    (rel_idx:int64 array, vals:int64 array, consumed:int): block j's
    coefficient at zigzag position k lands at rel offset j*64+zz[k]
    in a 64*n_mcus span; ``consumed`` is how far the reader advanced.
    Bit-for-bit the generic loop's reader: 28-bit reservoir, 8-byte
    chunk fills stopping at any 0xFF, 0xFF00 unstuffing, marker/EOF
    stops, zero-padded lookahead at the segment end."""
    dlen = len(data)
    p = pos
    acc = 0
    nb = 0
    ended = False

    def topup():
        nonlocal acc, nb, p, ended
        while nb < 28:
            if p >= dlen:
                ended = True
                return
            if data[p] != 0xFF:
                stop = data.find(0xFF, p, p + 8)
                end = stop if stop != -1 else min(p + 8, dlen)
                acc = (acc << ((end - p) * 8)) | int.from_bytes(
                    data[p:end], "big")
                nb += (end - p) * 8
                p = end
            elif p + 1 < dlen and data[p + 1] == 0x00:
                acc = (acc << 8) | 0xFF
                nb += 8
                p += 2
            else:
                ended = True          # marker (or truncated 0xFF tail)
                return

    dfast, dmax = dct.fast, dct.max_len
    afast, amax = act.fast, act.max_len
    ilist: list[int] = []
    vlist: list[int] = []
    zz = ZIGZAG
    pred = 0
    for j in range(n_mcus):
        base = j * 64
        if nb < 28 and not ended:
            topup()
        if nb >= dmax:
            prefix = (acc >> (nb - dmax)) & ((1 << dmax) - 1)
        elif nb > 0:
            prefix = (acc << (dmax - nb)) & ((1 << dmax) - 1)
        else:
            raise EOFError
        hit = dfast[prefix]
        if hit is None:
            raise ValueError("bad huffman code")
        size, length = hit
        if length > nb:
            raise EOFError
        nb -= length
        acc &= (1 << nb) - 1
        if size > 11:
            raise _Reject
        if size:
            while nb < size:
                if ended:
                    raise EOFError
                topup()
                if nb < size and ended:
                    raise EOFError
            nb -= size
            v = (acc >> nb) & ((1 << size) - 1)
            acc &= (1 << nb) - 1
            pred += (v - (1 << size) + 1
                     if v < (1 << (size - 1)) else v)
        ilist.append(base)
        vlist.append(pred)
        k = 1
        while k < 64:
            if nb < 28 and not ended:
                topup()
            if nb >= amax:
                prefix = (acc >> (nb - amax)) & ((1 << amax) - 1)
            elif nb > 0:
                prefix = (acc << (amax - nb)) & ((1 << amax) - 1)
            else:
                raise EOFError
            hit = afast[prefix]
            if hit is None:
                raise ValueError("bad huffman code")
            rs, length = hit
            if length > nb:
                raise EOFError
            nb -= length
            acc &= (1 << nb) - 1
            s = rs & 0x0F
            if s == 0:
                if rs == 0xF0:
                    k += 16    # ZRL
                    continue
                break          # EOB
            k += rs >> 4
            if k > 63:
                raise _Reject
            while nb < s:
                if ended:
                    raise EOFError
                topup()
                if nb < s and ended:
                    raise EOFError
            nb -= s
            v = (acc >> nb) & ((1 << s) - 1)
            acc &= (1 << nb) - 1
            ilist.append(base + zz[k])
            vlist.append(v - (1 << s) + 1
                         if v < (1 << (s - 1)) else v)
            k += 1
    return (np.asarray(ilist, dtype=np.int64),
            np.asarray(vlist, dtype=np.int64), p - pos)


# Restart segments decode context-free (predictor and bit state reset
# at every RSTn), so (segment bytes, MCU count, table contents) fully
# determine the coefficients — a per-worker memo of a pure function.
# Glyph-grid corpora repeat a tiny universe of segments (~96% hit rate
# on rendered English text), making replay a dict hit + array add.
_SEG_CACHE: dict = {}
_SEG_CACHE_MAX = 1 << 16


def _gray_entropy(data, pos, mcus_total, restart_interval, dct, act,
                  store) -> bool:
    """Drive the whole 1-component entropy scan through per-segment
    decode with memoization; scatters coefficients into ``store``
    (the (blocks, 8, 8) array, raster-flattened).  Returns False for
    _Reject shapes (caller answers None); raises like the generic
    loop on malformed streams."""
    dlen = len(data)
    p = pos
    mcu_i = 0
    idx_parts: list[np.ndarray] = []
    val_parts: list[np.ndarray] = []
    try:
        while mcu_i < mcus_total:
            if restart_interval and mcu_i:
                if (p + 1 < dlen and data[p] == 0xFF
                        and 0xD0 <= data[p + 1] <= 0xD7):
                    p += 2
                else:
                    raise ValueError("missing restart marker")
            n_seg = (min(restart_interval, mcus_total - mcu_i)
                     if restart_interval else mcus_total)
            key = (data[p:_seg_end(data, p)], n_seg, dct.kid, act.kid)
            hit = _SEG_CACHE.get(key)
            if hit is None:
                hit = _gray_segment(data, p, n_seg, dct, act)
                if len(_SEG_CACHE) >= _SEG_CACHE_MAX:
                    _SEG_CACHE.clear()
                _SEG_CACHE[key] = hit
            rel, vals, consumed = hit
            if rel.size:
                idx_parts.append(rel + mcu_i * 64)
                val_parts.append(vals)
            p += consumed
            mcu_i += n_seg
    except _Reject:
        return False
    if idx_parts:
        store.reshape(-1)[np.concatenate(idx_parts)] = \
            np.concatenate(val_parts)
    return True


def _decode_scan(b, pos, sos, frame, qt, dc_tabs, ac_tabs, restart_interval):
    fh, fw, comps = frame
    ns = sos[0]
    if ns != len(comps):
        return None                            # single interleaved scan only
    scan_tabs = {}
    for c in range(ns):
        cid, tt = sos[1 + 2 * c], sos[2 + 2 * c]
        scan_tabs[cid] = (tt >> 4, tt & 0x0F)
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = (fw + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (fh + 8 * vmax - 1) // (8 * vmax)

    # per-component coefficient stores, sized to the MCU grid
    stores = []
    for cid, hs, vs, tq in comps:
        if tq not in qt or cid not in scan_tabs:
            return None
        td, ta = scan_tabs[cid]
        if td not in dc_tabs or ta not in ac_tabs:
            return None
        stores.append(np.zeros((mcus_y * vs, mcus_x * hs, 8, 8),
                               dtype=np.float64))

    # r6 hot path: the entropy loop keeps the bit-reader state in
    # LOCAL ints (a 28-bit-minimum reservoir topped up in 8-byte
    # chunks) instead of per-symbol method calls on _BitReader, and
    # coefficients collect into index/value lists batch-assigned into
    # the stores afterwards (each (block, position) is written at most
    # once in a baseline scan, so the fancy assignment is exact).
    # Fill/marker/zero-padding/restart semantics replicate _BitReader
    # bit-for-bit: chunks stop at any 0xFF, stuffed 0xFF00 unstuffs,
    # a real marker ends the segment with pos at its 0xFF, and codes
    # near the segment end decode against zero-padded lookahead.
    # Malformed-stream behavior is unchanged — EOF/bad-code raise and
    # the jpeg_decode_rgb wrapper returns None, exactly as before.
    data = b
    dlen = len(data)
    p = pos
    acc = 0
    nb = 0
    ended = False

    def topup():
        nonlocal acc, nb, p, ended
        while nb < 28:
            if p >= dlen:
                ended = True
                return
            if data[p] != 0xFF:
                stop = data.find(0xFF, p, p + 8)
                end = stop if stop != -1 else min(p + 8, dlen)
                acc = (acc << ((end - p) * 8)) | int.from_bytes(
                    data[p:end], "big")
                nb += (end - p) * 8
                p = end
            elif p + 1 < dlen and data[p + 1] == 0x00:
                acc = (acc << 8) | 0xFF
                nb += 8
                p += 2
            else:
                ended = True          # marker (or truncated 0xFF tail)
                return

    comp_meta = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        td, ta = scan_tabs[cid]
        comp_meta.append((ci, hs, vs, dc_tabs[td], ac_tabs[ta]))
    preds = [0] * len(comps)
    idxs: list[list[int]] = [[] for _ in comps]
    vals: list[list[int]] = [[] for _ in comps]
    zz = ZIGZAG
    mcu_i = 0
    # 1-component unsampled scans (the OCR/glyph shape) take the
    # memoized per-restart-segment path: block index == MCU index, so
    # segment-relative offsets tile the store directly.  The generic
    # loop below is skipped (empty range); all other shapes keep it.
    if len(comps) == 1 and comps[0][1] == 1 and comps[0][2] == 1:
        if not _gray_entropy(data, p, mcus_x * mcus_y, restart_interval,
                             comp_meta[0][3], comp_meta[0][4], stores[0]):
            return None
        gen_rows = ()
    else:
        gen_rows = range(mcus_y)
    for my in gen_rows:
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                acc = 0
                nb = 0
                if (p + 1 < dlen and data[p] == 0xFF
                        and 0xD0 <= data[p + 1] <= 0xD7):
                    p += 2
                    ended = False
                else:
                    raise ValueError("missing restart marker")
                preds = [0] * len(comps)
            for ci, hs, vs, dct, act in comp_meta:
                dfast, dmax = dct.fast, dct.max_len
                afast, amax = act.fast, act.max_len
                ilist, vlist = idxs[ci], vals[ci]
                cols = mcus_x * hs
                for by in range(vs):
                    for bx in range(hs):
                        base = ((my * vs + by) * cols + mx * hs + bx) * 64
                        if nb < 28 and not ended:
                            topup()
                        if nb >= dmax:
                            prefix = (acc >> (nb - dmax)) \
                                & ((1 << dmax) - 1)
                        elif nb > 0:
                            prefix = (acc << (dmax - nb)) \
                                & ((1 << dmax) - 1)
                        else:
                            raise EOFError
                        hit = dfast[prefix]
                        if hit is None:
                            raise ValueError("bad huffman code")
                        size, length = hit
                        if length > nb:
                            raise EOFError
                        nb -= length
                        acc &= (1 << nb) - 1
                        if size > 11:
                            return None
                        if size:
                            while nb < size:
                                if ended:
                                    raise EOFError
                                topup()
                                if nb < size and ended:
                                    raise EOFError
                            nb -= size
                            v = (acc >> nb) & ((1 << size) - 1)
                            acc &= (1 << nb) - 1
                            preds[ci] += (v - (1 << size) + 1
                                          if v < (1 << (size - 1)) else v)
                        ilist.append(base)
                        vlist.append(preds[ci])
                        k = 1
                        while k < 64:
                            if nb < 28 and not ended:
                                topup()
                            if nb >= amax:
                                prefix = (acc >> (nb - amax)) \
                                    & ((1 << amax) - 1)
                            elif nb > 0:
                                prefix = (acc << (amax - nb)) \
                                    & ((1 << amax) - 1)
                            else:
                                raise EOFError
                            hit = afast[prefix]
                            if hit is None:
                                raise ValueError("bad huffman code")
                            rs, length = hit
                            if length > nb:
                                raise EOFError
                            nb -= length
                            acc &= (1 << nb) - 1
                            s = rs & 0x0F
                            if s == 0:
                                if rs == 0xF0:
                                    k += 16    # ZRL
                                    continue
                                break          # EOB
                            k += rs >> 4
                            if k > 63:
                                return None
                            while nb < s:
                                if ended:
                                    raise EOFError
                                topup()
                                if nb < s and ended:
                                    raise EOFError
                            nb -= s
                            v = (acc >> nb) & ((1 << s) - 1)
                            acc &= (1 << nb) - 1
                            ilist.append(base + zz[k])
                            vlist.append(v - (1 << s) + 1
                                         if v < (1 << (s - 1)) else v)
                            k += 1
            mcu_i += 1
    for ci in range(len(comps)):
        if idxs[ci]:
            stores[ci].reshape(-1)[
                np.asarray(idxs[ci], dtype=np.int64)] = vals[ci]

    # dequantize + IDCT per component, assemble planes
    planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        coefs = stores[ci] * qt[tq][None, None, :, :]
        by, bx = coefs.shape[:2]
        pix = _idct_blocks(coefs.reshape(-1, 8, 8)).reshape(by, bx, 8, 8)
        plane = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8)
        # upsample to full-frame resolution, then crop
        if hs != hmax or vs != vmax:
            plane = np.repeat(np.repeat(plane, vmax // vs, axis=0),
                              hmax // hs, axis=1)
        planes.append(plane[:fh, :fw])

    return _to_rgb(fh, fw, planes)


def _to_rgb(fh, fw, planes):
    """Assemble decoded planes into (w, h, top-down RGB rows): JFIF
    YCbCr->RGB for 3 components, replication for luma-only."""
    if len(planes) == 1:
        y = planes[0].astype(np.uint8)
        rgb = np.stack([y, y, y], axis=-1)
    else:
        y = planes[0].astype(np.float64)
        cb = planes[1].astype(np.float64) - 128.0
        cr = planes[2].astype(np.float64) - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        bl = y + 1.772 * cb
        rgb = np.clip(np.rint(np.stack([r, g, bl], axis=-1)),
                      0, 255).astype(np.uint8)
    rows = [rgb[yy].tobytes() for yy in range(fh)]
    return (fw, fh, rows)
