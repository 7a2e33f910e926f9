"""Pure-stdlib PNG codec (zlib + numpy) — the REAL decode path for the
multimodal media columns (operators/media.py). PNG is the one raster
container this sandbox can decode without an image library: chunks are
length-typed, pixel data is zlib (stdlib), and the five scanline filters
(RFC 2083 §6) are byte arithmetic. JPEG/GIF stay stubbed (an actual DCT /
LZW codec is out of scope); PNG media flows bytes -> exact pixels.

Supported subset (asserted, not silently mis-decoded): 8-bit depth,
color types 0 (gray), 2 (RGB), 6 (RGBA), non-interlaced. The encoder
exercises all five filter types (row r uses filter r % 5) so the
decoder's unfilter paths are round-trip-proven, not dead code.

Scale note: this runs inside mapInPandas per media row (media.py); rows
are independent so the codec being Python bounds per-row latency, not the
plan shape. Unfiltering is vectorized per row for NONE/SUB/UP; AVERAGE/
PAETH walk pixels within a row (left-neighbor dependency is inherently
sequential) — a production build swaps this file for a C-backed codec
behind the same two functions."""

from __future__ import annotations

import struct
import zlib
from binascii import crc32

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=up-left), int16 in."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(arr: np.ndarray) -> bytes:
    """uint8 (H,W), (H,W,3) or (H,W,4) -> PNG bytes. Row r is filtered with
    type r % 5, covering every filter the spec defines."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 3: 2, 4: 6}[ch]
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    raw = arr.reshape(h, w * ch).astype(np.int16)
    zero = np.zeros(w * ch, dtype=np.int16)
    out = bytearray()
    for r in range(h):
        f = r % 5
        cur = raw[r]
        prior = raw[r - 1] if r else zero
        left = np.concatenate([np.zeros(ch, np.int16), cur[:-ch]])
        upleft = np.concatenate([np.zeros(ch, np.int16), prior[:-ch]])
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prior
        elif f == 3:
            filt = cur - ((left + prior) >> 1)
        else:
            filt = cur - _paeth(left, prior, upleft)
        out.append(f)
        out.extend((filt % 256).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (H,W,ch). Raises ValueError on non-PNG bytes or an
    unsupported variant — callers route those to the stub tier."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG signature")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(data):
        (ln,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError("truncated chunk")
        if typ == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif typ == b"IDAT":
            idat.append(body)
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if meta is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, color, comp, filt, interlace = meta
    if depth != 8 or color not in _CHANNELS or comp or filt or interlace:
        raise ValueError(f"unsupported PNG variant {meta}")
    ch = _CHANNELS[color]
    stride = w * ch
    flat = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if flat.size != h * (stride + 1):
        raise ValueError("pixel payload size mismatch")
    rows = flat.reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int16)
    zero = np.zeros(stride, dtype=np.int16)
    for r in range(h):
        f = int(rows[r, 0])
        cur = rows[r, 1:].astype(np.int16)
        prior = out[r - 1] if r else zero
        if f == 0:
            res = cur
        elif f == 2:
            res = (cur + prior) % 256
        elif f == 1:
            # raw[x] = filt[x] + raw[x-ch]: per-lane prefix sum mod 256
            lanes = cur.reshape(-1, ch)
            res = np.cumsum(lanes, axis=0, dtype=np.int64).reshape(stride) % 256
        elif f in (3, 4):
            res = np.empty(stride, dtype=np.int16)
            for x in range(0, stride, ch):
                left = res[x - ch : x] if x else zero[:ch]
                up = prior[x : x + ch]
                upleft = prior[x - ch : x] if x else zero[:ch]
                if f == 3:
                    res[x : x + ch] = (cur[x : x + ch] + ((left + up) >> 1)) % 256
                else:
                    res[x : x + ch] = (
                        cur[x : x + ch] + _paeth(left, up, upleft)
                    ) % 256
        else:
            raise ValueError(f"bad filter byte {f}")
        out[r] = res
    return out.astype(np.uint8).reshape(h, w, ch)
