"""Pure-stdlib GIF codec (LZW + numpy palette math) — the second REAL
decode path for the multimodal media columns (operators/media.py), joining
functions/png.py. GIF is fully decodable without an image library: the
container is length-typed blocks and the pixel data is GIF-variant LZW
(variable-width codes, LSB-first bit packing, clear/EOI control codes) —
pure integer work. With this tier, JPEG is the engine's only remaining
decode stub (an actual DCT needs an image library).

Supported subset (asserted, not silently mis-decoded): single full-frame
image, non-interlaced, global or local color table. The encoder writes
grayscale (H,W) via the identity 256-gray palette, or RGB (H,W,3) with
<= 256 distinct colors via an exact np.unique palette — both round-trip
pixel-exact. >256-color inputs raise (GIF cannot represent them losslessly;
quantization is a policy choice that belongs to the caller).

The LZW pair is round-trip-proven across the code-width growth boundaries
AND the 4096-entry table reset (the encoder emits CLEAR and rebuilds when
the dictionary fills; tests drive a noise image large enough to hit it).

Scale note: runs inside mapInPandas per media row (media.py); rows are
independent, so the codec being Python bounds per-row latency, not the
plan shape. A production build swaps this file for a C-backed codec behind
the same two functions."""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE = 4096  # 12-bit ceiling, GIF89a spec appendix F


class _BitWriter:
    """LSB-first variable-width code packing (the GIF bit order)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += size
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, size: int) -> int:
        while self.nbits < size:
            if self.pos >= len(self.data):
                raise ValueError("LZW stream exhausted mid-code")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << size) - 1)
        self.acc >>= size
        self.nbits -= size
        return v


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    bw = _BitWriter()
    code_size, next_code, table = min_code + 1, eoi + 1, {}
    bw.write(clear, code_size)
    cur = indices[0]
    for k in indices[1:]:
        key = (cur, k)
        if key in table:
            cur = table[key]
            continue
        bw.write(cur, code_size)
        if next_code < _MAX_CODE:
            table[key] = next_code
            next_code += 1
            # encoder bumps at next_code > 2^size (it builds one entry AHEAD
            # of the decoder, which bumps at == — see the paired decoder)
            if next_code > (1 << code_size):
                code_size += 1
        else:
            bw.write(clear, code_size)
            code_size, next_code, table = min_code + 1, eoi + 1, {}
        cur = k
    bw.write(cur, code_size)
    bw.write(eoi, code_size)
    return bw.flush()


def _lzw_decode(data: bytes, min_code: int, expected: int) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code + 1
    br = _BitReader(data)
    out = bytearray()
    prev = None
    while len(out) < expected:
        c = br.read(code_size)
        if c == clear:
            table, code_size, prev = list(base), min_code + 1, None
            continue
        if c == eoi:
            break
        if prev is None:
            entry = table[c]
        elif c < len(table):
            entry = table[c]
        elif c == len(table):  # the KwKwK case
            entry = prev + prev[:1]
        else:
            raise ValueError(f"LZW code {c} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) != expected:
        raise ValueError(f"decoded {len(out)} pixels, expected {expected}")
    return bytes(out)


def encode_gif(arr: np.ndarray) -> bytes:
    """uint8 (H,W) gray or (H,W,3) with <=256 distinct colors -> GIF89a
    bytes, pixel-exact under decode_gif."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 3, axis=1)
        idx = arr
    elif arr.ndim == 3 and arr.shape[2] == 3:
        pal, inv = np.unique(arr.reshape(-1, 3), axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError(f"{len(pal)} distinct colors > 256; quantize first")
        idx = inv.reshape(arr.shape[:2])
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = idx.shape
    cbits = max(1, (len(pal) - 1).bit_length())  # GCT holds 2^cbits entries
    gct = np.zeros((1 << cbits, 3), dtype=np.uint8)
    gct[: len(pal)] = pal
    min_code = max(2, cbits)  # spec floor of 2
    lzw = _lzw_encode(idx.reshape(-1).tolist(), min_code)
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0xF0 | (cbits - 1), 0, 0)
    out += gct.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out.append(min_code)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


def decode_gif(data: bytes) -> np.ndarray:
    """GIF bytes -> uint8 (H,W,3) via palette application. Raises ValueError
    on non-GIF bytes or an unsupported variant (interlace, partial frame) —
    callers route those to the stub tier."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF signature")
    if len(data) < 13:
        raise ValueError("truncated screen descriptor")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 1 << ((packed & 0x07) + 1)
        gct = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
        if len(gct) != n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    while pos < len(data):
        b = data[pos]
        if b == 0x21:  # extension: introducer + label, then sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += data[pos] + 1
            pos += 1
        elif b == 0x2C:
            left, top, iw, ih = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            ipacked = data[pos + 9]
            pos += 10
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported")
            if (left, top, iw, ih) != (0, 0, sw, sh):
                raise ValueError("partial-frame GIF unsupported")
            pal = gct
            if ipacked & 0x80:
                n = 1 << ((ipacked & 0x07) + 1)
                pal = np.frombuffer(data[pos : pos + 3 * n], dtype=np.uint8).reshape(n, 3)
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table")
            min_code = data[pos]
            pos += 1
            stream = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                stream += data[pos + 1 : pos + 1 + ln]
                pos += ln + 1
            idx = np.frombuffer(
                _lzw_decode(bytes(stream), min_code, iw * ih), dtype=np.uint8
            )
            if idx.max(initial=0) >= len(pal):
                raise ValueError("palette index out of range")
            return pal[idx].reshape(ih, iw, 3)
        elif b == 0x3B:
            break
        else:
            raise ValueError(f"unknown block introducer 0x{b:02x}")
    raise ValueError("no image block found")
