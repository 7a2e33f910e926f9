"""Pure-stdlib WAV (RIFF PCM) codec — the REAL audio decode path for the
multimodal media columns (operators/media.py), joining the png/gif/jpeg
image tiers. Linear PCM needs no audio library: the container is RIFF
chunks and the samples are raw little-endian integers numpy reads
natively. With this tier, audio decode is real; video remains the engine's
only codec-less media class (an actual H.26x/VPx decoder is out of scope).

Supported subset (asserted, not silently mis-decoded): RIFF/WAVE with a
PCM `fmt ` chunk (audio format 1), 8- or 16-bit samples, any channel
count/sample rate; unknown chunks (LIST, fact, ...) are skipped by their
declared length — the round trip is sample-exact.

Scale note: runs inside mapInPandas per media row (media.py); rows are
independent, so the codec being Python bounds per-row latency, not the
plan shape."""

from __future__ import annotations

import struct

import numpy as np

# the synthetic audio corpus shape (media.py): 256 samples at 16 kHz = 16 ms
AUDIO_N = 256
AUDIO_RATE = 16000


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """int16 (n,) mono or (n, ch) multi-channel -> WAV bytes (PCM 16-bit).
    uint8 input encodes as PCM 8-bit."""
    samples = np.asarray(samples)
    if samples.dtype == np.uint8:
        width, fmt_np = 1, np.uint8
    elif samples.dtype == np.int16:
        width, fmt_np = 2, "<i2"
    else:
        raise ValueError(f"unsupported sample dtype {samples.dtype}")
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.ndim != 2:
        raise ValueError(f"unsupported sample shape {samples.shape}")
    n, ch = samples.shape
    data = np.ascontiguousarray(samples.astype(fmt_np)).tobytes()
    block = ch * width
    fmt = struct.pack(
        "<HHIIHH", 1, ch, sample_rate, sample_rate * block, block, 8 * width
    )
    out = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data)) + b"WAVE"
    out += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    out += b"data" + struct.pack("<I", len(data)) + data
    return out


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples (n, ch) int16-or-uint8, sample_rate). Raises
    ValueError on non-WAV bytes or a non-PCM variant — callers route those
    to the stub tier."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE signature")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        body = data[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("short fmt chunk")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            raw = body
            if fmt is not None:
                break
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or raw is None:
        raise ValueError("missing fmt/data chunk")
    audio_fmt, ch, rate, _byterate, _block, bits = fmt
    if audio_fmt != 1:
        raise ValueError(f"non-PCM WAV (format {audio_fmt}) unsupported")
    if bits == 16:
        samples = np.frombuffer(raw[: len(raw) - (len(raw) % (2 * ch))], dtype="<i2")
    elif bits == 8:
        samples = np.frombuffer(raw[: len(raw) - (len(raw) % ch)], dtype=np.uint8)
    else:
        raise ValueError(f"{bits}-bit PCM unsupported")
    return samples.reshape(-1, ch), rate


def synth_samples(ref: str, n: int = 256, sample_rate: int = 16000) -> np.ndarray:
    """Deterministic int16 mono waveform from a media ref: a sine whose
    frequency/phase derive from the ref's bytes — the ground truth the
    real-decode tests compare against."""
    import hashlib

    h = hashlib.sha256(ref.encode()).digest()
    freq = 200 + (int.from_bytes(h[:2], "big") % 1800)
    phase = int.from_bytes(h[2:4], "big") / 65536.0 * 2 * np.pi
    t = np.arange(n, dtype=np.float64) / sample_rate
    return np.round(np.sin(2 * np.pi * freq * t + phase) * 12000).astype(np.int16)
