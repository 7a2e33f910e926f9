"""Pure-stdlib YUV4MPEG2 (Y4M) video codec — the engine's real video tier.

Y4M is the uncompressed interchange format ffmpeg/x264/mjpegtools speak: an
ASCII stream header (`YUV4MPEG2 W<w> H<h> F<num>:<den> ...`), then one
`FRAME\\n` marker + raw 8-bit planes per frame. Because the payload is raw
planes there is no entropy coder to stub — a pure numpy reader/writer is the
*complete* codec, and round trips are sample-exact.

Two colorspace tags are supported, both with full-resolution planes so no
chroma resampling ever happens:

- ``Cmono``  — one luma plane per frame; frames are (H, W) uint8.
- ``C444``   — three planes (Y, Cb, Cr) per frame; frames are (H, W, 3)
  uint8, stored/returned verbatim (no RGB<->YCbCr matrix is applied — color
  conversion is presentation, not storage, and applying one would break the
  exact round trip the media oracles rely on).

Subsampled tags (C420*, C422) raise: supporting them would force a lossy
chroma resample on decode, which this tier deliberately refuses.

Reference analog: media spans / video refs (core/models.py:390,
crawlers/content_parser.py:62-67) — the reference records video URLs but
never decodes; this tier gives the training-data pipeline a real,
dependency-free frame source.
"""

from __future__ import annotations

import numpy as np

MAGIC = b"YUV4MPEG2"
_FRAME = b"FRAME"


def encode_y4m(
    frames: np.ndarray, fps_num: int = 25, fps_den: int = 1
) -> bytes:
    """(T, H, W) uint8 -> Cmono stream; (T, H, W, 3) uint8 -> C444 stream
    (channel-major planes per frame: Y, Cb, Cr written verbatim)."""
    if frames.dtype != np.uint8:
        raise ValueError(f"unsupported frame dtype {frames.dtype}")
    if frames.ndim == 3:
        cspace = b"Cmono"
    elif frames.ndim == 4 and frames.shape[3] == 3:
        cspace = b"C444"
    else:
        raise ValueError(f"unsupported frame shape {frames.shape}")
    if frames.shape[0] < 1:
        raise ValueError("need at least one frame")
    t, h, w = frames.shape[:3]
    if fps_num <= 0 or fps_den <= 0:
        raise ValueError("fps must be positive")
    out = [
        b"%s W%d H%d F%d:%d Ip A1:1 %s\n"
        % (MAGIC, w, h, fps_num, fps_den, cspace)
    ]
    for i in range(t):
        out.append(_FRAME + b"\n")
        if cspace == b"Cmono":
            out.append(frames[i].tobytes())
        else:
            for c in range(3):  # plane-major: Y then Cb then Cr
                out.append(np.ascontiguousarray(frames[i, :, :, c]).tobytes())
    return b"".join(out)


def decode_y4m(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Y4M bytes -> (frames, (fps_num, fps_den)). Frames are (T, H, W) uint8
    for Cmono, (T, H, W, 3) for C444. Raises ValueError on a bad signature,
    unsupported colorspace, or truncation — same error routing contract as
    the PNG/GIF/JPEG/WAV tiers."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(MAGIC + b" "):
        raise ValueError("not a YUV4MPEG2 signature")
    w = h = fps_num = fps_den = None
    cspace = b"C420jpeg"  # spec default when no C tag is present
    for tok in data[len(MAGIC) + 1 : nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:]
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"F":
            num, den = val.split(b":")
            fps_num, fps_den = int(num), int(den)
        elif tag == b"C":
            cspace = tok
        # Ip/A/X tags carry no layout information for full-res planes
    if w is None or h is None or w <= 0 or h <= 0:
        raise ValueError("missing or invalid W/H header tags")
    if fps_num is None or fps_num <= 0 or fps_den <= 0:
        raise ValueError("missing or invalid F header tag")
    if cspace == b"Cmono":
        planes = 1
    elif cspace == b"C444":
        planes = 3
    else:
        raise ValueError(f"unsupported colorspace {cspace!r} (Cmono/C444 only)")
    frame_bytes = w * h * planes
    pos = nl + 1
    frames = []
    while pos < len(data):
        if data[pos : pos + len(_FRAME)] != _FRAME:
            raise ValueError("bad FRAME marker")
        fnl = data.find(b"\n", pos)
        if fnl < 0:
            raise ValueError("truncated FRAME header")
        pos = fnl + 1
        raw = data[pos : pos + frame_bytes]
        if len(raw) < frame_bytes:
            raise ValueError("truncated frame payload")
        arr = np.frombuffer(raw, dtype=np.uint8)
        if planes == 1:
            frames.append(arr.reshape(h, w))
        else:
            # plane-major on the wire -> (H, W, 3) channel-last in memory
            frames.append(arr.reshape(3, h, w).transpose(1, 2, 0))
        pos += frame_bytes
    if not frames:
        raise ValueError("stream contains no frames")
    return np.stack(frames), (fps_num, fps_den)


VIDEO_T = 5  # synthetic clip length (frames)
VIDEO_FPS = 4  # synthetic clip rate (F4:1)


def synth_frames(ref: str, t: int = VIDEO_T, h: int = 8, w: int = 8) -> np.ndarray:
    """Deterministic (t, h, w) uint8 grayscale frames from a media ref:
    counter-mode sha256 stream in a per-frame domain — the ground truth the
    real-decode tests and the media corpus compare against."""
    import hashlib

    need = h * w
    out = np.empty((t, h, w), dtype=np.uint8)
    for f in range(t):
        blocks = []
        i = 0
        while sum(len(b) for b in blocks) < need:
            blocks.append(hashlib.sha256(f"{ref}|f{f}|{i}".encode()).digest())
            i += 1
        out[f] = np.frombuffer(b"".join(blocks)[:need], dtype=np.uint8).reshape(h, w)
    return out
