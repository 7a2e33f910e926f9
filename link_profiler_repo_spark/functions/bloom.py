"""Bloom-filter prefilter for the URL-seen anti-join (north_rule: bloom/cuckoo
URL-seen set as state tables).

The EXACT layer is the left-anti join against the `seen` table keyed by
sha2(canonical_url, 256) — required because final-seen-set equality with the
reference is part of the contract (SURVEY §4.2). The Bloom sidecar is a
PREFILTER: candidates whose hash is definitely absent skip the anti-join
shuffle entirely; possible-positives fall through to the exact join.

Probing is fully vectorized: positions derive from the Catalyst-computed
xxhash64(url) column via double-hashing (h_i = h1 + i*h2 mod m) in numpy
uint64 arithmetic — no per-row Python anywhere. Building runs distributed as
per-partition partial bitmaps OR-reduced on the driver (each partial is a
fixed m/8-byte array, independent of row count).

At the 10^10 design point the single bitmap becomes a per-bucket sidecar table
(bucket = url_hash prefix) so each probe task loads only its buckets; the
sizing knob is m_bits (default 2^23 ≈ 1 MiB ~ 0.5M URLs at ~1% fpp; scale m
with expected |seen|).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _positions(h: np.ndarray, m_bits: int, k: int) -> list[np.ndarray]:
    h1 = h.astype(np.uint64)
    h2 = (h1 * _MIX) | np.uint64(1)
    m = np.uint64(m_bits)
    return [((h1 + np.uint64(i) * h2) % m) for i in range(k)]


def build_bloom(df: DataFrame, xx_col: str, m_bits: int = 1 << 23, k: int = 4) -> np.ndarray:
    """Distributed build: per-partition partial bitmaps (packed uint8),
    OR-reduced driver-side. Returns the bitmap (m_bits/8 bytes)."""
    nbytes = m_bits // 8

    def partial(it):
        bits = np.zeros(m_bits, dtype=bool)
        any_rows = False
        for pdf in it:
            if len(pdf) == 0:
                continue
            any_rows = True
            h = pdf[xx_col].to_numpy(dtype=np.int64).view(np.uint64)
            for pos in _positions(h, m_bits, k):
                bits[pos] = True
        if any_rows:
            yield pd.DataFrame({"bitmap": [np.packbits(bits).tobytes()]})

    partials = df.select(xx_col).mapInPandas(partial, schema="bitmap binary").collect()
    out = np.zeros(nbytes, dtype=np.uint8)
    for row in partials:
        out |= np.frombuffer(row["bitmap"], dtype=np.uint8)
    return out


def might_contain_udf(bitmap: np.ndarray, m_bits: int, k: int = 4):
    """pandas UDF: xxhash64 column -> bool (possible member). The bitmap rides
    to executors once via closure capture of the broadcast-sized array."""
    bits = np.unpackbits(bitmap).astype(bool)

    @F.pandas_udf(T.BooleanType())
    def probe(xx: pd.Series) -> pd.Series:
        h = xx.to_numpy(dtype=np.int64).view(np.uint64)
        res = np.ones(len(h), dtype=bool)
        for pos in _positions(h, m_bits, k):
            res &= bits[pos]
        return pd.Series(res, index=xx.index)

    return probe


def add_to_bloom(bitmap: np.ndarray, df: DataFrame, xx_col: str, m_bits: int, k: int = 4) -> np.ndarray:
    delta = build_bloom(df, xx_col, m_bits, k)
    return bitmap | delta
