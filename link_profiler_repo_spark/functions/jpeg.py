"""Pure-numpy baseline JPEG codec — the third and last REAL decode path for
the multimodal media columns (operators/media.py), joining functions/png.py
and functions/gif.py. Baseline JFIF needs no image library: markers are
length-typed segments, entropy coding is canonical Huffman over (run,size)
symbols, and the transform is an 8x8 DCT-II — all integer/float work numpy
does natively. With this tier the engine has ZERO decode stubs for its
image formats; decode_stub remains only as the documented tier for
codec-less payloads (audio/video containers).

Supported subset (asserted, not silently mis-decoded): baseline sequential
DCT (SOF0), 8-bit, 1 (gray) or 3 (YCbCr 4:4:4) components, no restart
intervals, no progressive (SOF2) or arithmetic coding. The encoder writes
exactly this subset: JFIF APP0, Annex-K quantization tables scaled by the
libjpeg quality formula, the Annex-K Huffman tables, interleaved 4:4:4
MCUs. The decoder builds its Huffman and quantization tables FROM THE
PARSED DHT/DQT segments, not from shared constants — the two halves meet
only at the wire format, so a table typo breaks round trips loudly instead
of cancelling silently.

JPEG is lossy by design: round trips assert bounded error (exact for
constant blocks at quality 100, tight bounds for smooth content), not
pixel equality — the contract tests pin it. Decoding is a pure function of
the bytes, so features derived from decoded pixels stay deterministic.

Scale note: runs inside mapInPandas per media row (media.py); rows are
independent, so the codec being Python bounds per-row latency, not the
plan shape. A production build swaps this file for libjpeg-turbo behind
the same two functions."""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constant tables (ITU-T T.81 Annex K) — used by the ENCODER only; the
# decoder reads everything from the stream's own DQT/DHT segments
# ---------------------------------------------------------------------------

_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_LUMA_VALS = list(range(12))
_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_CHROMA_VALS = list(range(12))

_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _zigzag_order() -> np.ndarray:
    """Row-major indices in zigzag order, generated (not transcribed —
    a typo here would silently permute coefficients)."""
    out = []
    for s in range(15):
        rows = range(max(0, s - 7), min(s, 7) + 1)
        if s % 2 == 0:
            rows = reversed(list(rows))
        out.extend(r * 8 + (s - r) for r in rows)
    return np.array(out, dtype=np.int64)


_ZZ = _zigzag_order()

# orthonormal 8-point DCT-II matrix: coeffs = M @ block @ M.T
_M = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    _M[_u] = 0.5 * _c * np.cos((2 * np.arange(8) + 1) * _u * np.pi / 16)


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality scaling: 1..100 -> scaled table clamped to [1, 255]."""
    q = min(max(int(quality), 1), 100)
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int32)


class _BitWriterMSB:
    """MSB-first bit packing with 0xFF byte stuffing (B.1.1.5)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        return bytes(self.buf)


class _BitReaderMSB:
    """MSB-first bit reading with 0xFF 0x00 unstuffing; a real marker byte
    mid-entropy-data raises (restart intervals are unsupported)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def read(self, size: int) -> int:
        if size == 0:
            return 0
        while self.nbits < size:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream exhausted")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("dangling 0xFF in entropy stream")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
            self.acc = (self.acc << 8) | b
            self.nbits += 8
        v = (self.acc >> (self.nbits - size)) & ((1 << size) - 1)
        self.nbits -= size
        self.acc &= (1 << self.nbits) - 1
        return v


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman assignment (C.2): symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, for bit-serial decoding."""
    return {(ln, code): sym for sym, (code, ln) in _huff_codes(bits, vals).items()}


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _amplitude_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _encode_block(
    zz: np.ndarray, pred: int, dc_tab: dict, ac_tab: dict, bw: _BitWriterMSB
) -> int:
    """One quantized block in zigzag order -> entropy bits; returns new DC
    predictor."""
    dc = int(zz[0])
    diff = dc - pred
    size = _category(diff)
    code, ln = dc_tab[size]
    bw.write(code, ln)
    if size:
        bw.write(_amplitude_bits(diff, size), size)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for i in range(1, 64):
        v = int(zz[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = ac_tab[0xF0]  # ZRL
            bw.write(code, ln)
            run -= 16
        size = _category(v)
        code, ln = ac_tab[(run << 4) | size]
        bw.write(code, ln)
        bw.write(_amplitude_bits(v, size), size)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        bw.write(code, ln)
    return dc


def _decode_block(
    br: _BitReaderMSB, pred: int, dc_map: dict, ac_map: dict
) -> tuple[np.ndarray, int]:
    def read_symbol(m):
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | br.read(1)
            ln += 1
            if (ln, code) in m:
                return m[(ln, code)]
        raise ValueError("invalid Huffman code")

    zz = np.zeros(64, dtype=np.int32)
    size = read_symbol(dc_map)
    zz[0] = pred + _extend(br.read(size), size)
    i = 1
    while i < 64:
        sym = read_symbol(ac_map)
        if sym == 0x00:  # EOB
            break
        if sym == 0xF0:  # ZRL
            i += 16
            continue
        run, size = sym >> 4, sym & 0x0F
        i += run
        if i >= 64:
            raise ValueError("AC run past block end")
        zz[i] = _extend(br.read(size), size)
        i += 1
    return zz, int(zz[0])


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(H,W) float -> (nby, nbx, 8, 8) with edge-replication padding."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    nby, nbx = p.shape[0] // 8, p.shape[1] // 8
    return p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)


def encode_jpeg(arr: np.ndarray, quality: int = 90) -> bytes:
    """uint8 (H,W) gray or (H,W,3) RGB -> baseline JFIF bytes (SOF0, 4:4:4,
    Annex-K tables at the given libjpeg-formula quality)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        comps = [arr.astype(np.float64)]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        r, g, b = (arr[:, :, c].astype(np.float64) for c in range(3))
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = arr.shape[:2]
    nc = len(comps)
    ql = _quality_scale(_QUANT_LUMA, quality)
    qc = _quality_scale(_QUANT_CHROMA, quality)
    qtabs = [ql] if nc == 1 else [ql, qc]

    dc_tabs = [_huff_codes(_DC_LUMA_BITS, _DC_LUMA_VALS)]
    ac_tabs = [_huff_codes(_AC_LUMA_BITS, _AC_LUMA_VALS)]
    if nc == 3:
        dc_tabs.append(_huff_codes(_DC_CHROMA_BITS, _DC_CHROMA_VALS))
        ac_tabs.append(_huff_codes(_AC_CHROMA_BITS, _AC_CHROMA_VALS))

    # quantized zigzag blocks per component
    qblocks = []
    for ci, plane in enumerate(comps):
        q = qtabs[min(ci, 1)].astype(np.float64)
        blocks = _plane_blocks(plane) - 128.0
        coef = np.einsum("ux,byxv,wv->byuw", _M, blocks, _M)
        # round half away from zero (C round()), not banker's
        zq = coef / q
        qz = np.sign(zq) * np.floor(np.abs(zq) + 0.5)
        qblocks.append(qz.astype(np.int32).reshape(-1, 64)[:, _ZZ])

    bw = _BitWriterMSB()
    preds = [0] * nc
    n_mcu = qblocks[0].shape[0]
    for m in range(n_mcu):
        for ci in range(nc):
            t = min(ci, 1)
            preds[ci] = _encode_block(
                qblocks[ci][m], preds[ci], dc_tabs[t], ac_tabs[t], bw
            )
    scan = bw.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, q in enumerate(qtabs):
        out += b"\xff\xdb" + struct.pack(">HB", 67, ti)
        out += bytes(int(x) for x in q.reshape(-1)[_ZZ])
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x11, min(ci, 1)])
    huffs = [(0, 0, _DC_LUMA_BITS, _DC_LUMA_VALS), (1, 0, _AC_LUMA_BITS, _AC_LUMA_VALS)]
    if nc == 3:
        huffs += [
            (0, 1, _DC_CHROMA_BITS, _DC_CHROMA_VALS),
            (1, 1, _AC_CHROMA_BITS, _AC_CHROMA_VALS),
        ]
    for cls, tid, bits, vals in huffs:
        out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (cls << 4) | tid)
        out += bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        t = min(ci, 1)
        out += bytes([ci + 1, (t << 4) | t])
    out += b"\x00\x3f\x00"
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 (H,W,ch). Tables come from the stream's
    own DQT/DHT segments. Raises ValueError on non-JPEG bytes or an
    unsupported variant (progressive, subsampled, restart intervals) —
    callers route those to the stub tier."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG signature")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_maps: dict[int, dict] = {}
    ac_maps: dict[int, dict] = {}
    sof = None
    scan_comps = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment")
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                if b + 65 > len(body):
                    raise ValueError("truncated DQT")
                t = np.zeros(64, dtype=np.int32)
                t[_ZZ] = np.frombuffer(body[b + 1 : b + 65], dtype=np.uint8)
                qtabs[tq] = t.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                nv = sum(bits)
                if len(bits) != 16 or b + 17 + nv > len(body):
                    raise ValueError("truncated DHT")
                vals = list(body[b + 17 : b + 17 + nv])
                m = _huff_decode_map(bits, vals)
                (dc_maps if cls == 0 else ac_maps)[tid] = m
                b += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                if hv != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, tq))
            sof = (h, w, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline SOF 0x{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI
            if struct.unpack(">H", body[:2])[0] != 0:
                raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            pos = pos + 2 + seglen
            break
        pos += 2 + seglen
    if sof is None or scan_comps is None:
        raise ValueError("missing SOF0/SOS")
    h, w, comps = sof
    nc = len(comps)
    if [c for c, _ in scan_comps] != [cid for cid, _ in comps]:
        raise ValueError("scan/frame component mismatch")
    nby, nbx = (h + 7) // 8, (w + 7) // 8

    br = _BitReaderMSB(data, pos)
    planes = [np.zeros((nby * 8, nbx * 8)) for _ in range(nc)]
    preds = [0] * nc
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(nc):
                tsel = scan_comps[ci][1]
                dct, act = tsel >> 4, tsel & 0x0F
                zz, preds[ci] = _decode_block(br, preds[ci], dc_maps[dct], ac_maps[act])
                blk = np.zeros(64, dtype=np.float64)
                blk[_ZZ] = zz
                q = qtabs[comps[ci][1]].astype(np.float64)
                coef = blk.reshape(8, 8) * q
                px = _M.T @ coef @ _M + 128.0
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
    planes = [p[:h, :w] for p in planes]
    if nc == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
