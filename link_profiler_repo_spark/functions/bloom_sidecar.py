"""Per-bucket Bloom sidecar — the 10^10-scale layout of the URL-seen
prefilter promised in functions/bloom.py.

A single bitmap sized for 10^10 keys (~12 GiB at 1% fpp) cannot ride to every
task. The sidecar shards it: bucket = pmod(xx64, n_buckets); each bucket owns
an independent bitmap of m_bits bits stored as rows of a bucket-partitioned
parquet table

    {path}/bucket=N/part-*.parquet      rows: (bitmap binary)

Per-epoch inserts APPEND one delta bitmap per touched bucket (the same
epoch-delta discipline as the seen table itself — a re-run after a crash
appends a duplicate delta, which is harmless: probe semantics are "maybe
present iff ANY delta bitmap contains the key", and every key is inserted
into exactly one epoch's delta). compact() ORs a bucket's deltas into one.

Probing repartitions candidates by bucket, then a mapInPandas pass loads ONLY
the bucket files present in its partition (directory-pruned read — this is
the 'probe tasks load only their bucket' property, asserted in tests by
probing against a sidecar whose other bucket directories are deleted).
Position arithmetic is the same double-hash family as functions/bloom.py,
fully vectorized in numpy over Arrow batches — no per-row Python.

Scale math at the design point: |seen| = 10^10, n_buckets = 4096,
m_bits = 2^25 per bucket => 4 MiB per probe task, total 16 GiB distributed,
~1% fpp. The knobs below default to sandbox-sized values."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from .bloom import _positions


def bucket_col(xx_col: str, n_buckets: int) -> F.Column:
    return F.pmod(F.col(xx_col), F.lit(n_buckets)).cast("int")


def build_delta(
    df: DataFrame, xx_col: str, n_buckets: int = 64, m_bits: int = 1 << 17, k: int = 4
) -> DataFrame:
    """One delta bitmap per bucket touched by df: repartition by bucket, build
    per-partition partial bitmaps per bucket, OR them per bucket with a keyed
    aggregation (bit_or over fixed-width chunks would need a UDAF; instead the
    second mapInPandas groups a whole bucket per task post-shuffle, so each
    bucket's bitmap is built exactly once). Returns (bucket int, bitmap
    binary)."""
    nbytes = m_bits // 8

    def per_bucket(it):
        # after repartition(bucket) every batch of a task belongs to the
        # task's buckets only; accumulate one bitmap per bucket
        acc: dict[int, np.ndarray] = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            for b, grp in pdf.groupby("_bucket"):
                bits = acc.setdefault(int(b), np.zeros(m_bits, dtype=bool))
                h = grp[xx_col].to_numpy(dtype=np.int64).view(np.uint64)
                for pos in _positions(h, m_bits, k):
                    bits[pos] = True
        for b, bits in acc.items():
            yield pd.DataFrame(
                {"bucket": [b], "bitmap": [np.packbits(bits).tobytes()]}
            )

    assert nbytes * 8 == m_bits
    bucketed = df.select(F.col(xx_col), bucket_col(xx_col, n_buckets).alias("_bucket"))
    return bucketed.repartition(n_buckets, "_bucket").mapInPandas(
        per_bucket, schema="bucket int, bitmap binary"
    )


def append_delta(
    df: DataFrame,
    xx_col: str,
    path: str,
    n_buckets: int = 64,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> None:
    """Append one epoch's delta bitmaps under the bucket-partitioned layout."""
    build_delta(df, xx_col, n_buckets, m_bits, k).write.mode("append").partitionBy(
        "bucket"
    ).parquet(path)


def probe(
    df: DataFrame,
    xx_col: str,
    path: str,
    n_buckets: int = 64,
    m_bits: int = 1 << 17,
    k: int = 4,
    out_col: str = "_maybe",
) -> DataFrame:
    """df + boolean out_col (possible member). Candidates are repartitioned by
    bucket so each task reads ONLY its buckets' bitmap files (pyarrow
    directory-pruned read; nothing global is loaded anywhere)."""
    import pyarrow.parquet as pq

    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.BooleanType(), False)])
    cols = [f.name for f in df.schema.fields]

    def run(it):
        cache: dict[int, list[np.ndarray]] = {}

        def bitmaps_for(b: int) -> list[np.ndarray]:
            if b not in cache:
                bdir = os.path.join(path, f"bucket={b}")
                maps: list[np.ndarray] = []
                if os.path.isdir(bdir):
                    tbl = pq.read_table(bdir, columns=["bitmap"])
                    for buf in tbl.column("bitmap").to_pylist():
                        maps.append(np.unpackbits(np.frombuffer(buf, dtype=np.uint8)).astype(bool))
                cache[b] = maps
            return cache[b]

        for pdf in it:
            if len(pdf) == 0:
                continue
            h_all = pdf[xx_col].to_numpy(dtype=np.int64).view(np.uint64)
            # bucket on the SIGNED value with floored modulo — numpy int64 %
            # matches Catalyst's pmod for a positive divisor, while unsigned
            # modulo diverges for negative hashes whenever n_buckets is not a
            # power of two (the write path buckets with F.pmod).
            buckets = pdf[xx_col].to_numpy(dtype=np.int64) % n_buckets
            maybe = np.zeros(len(pdf), dtype=bool)
            for b in np.unique(buckets):
                sel = buckets == b
                h = h_all[sel]
                res_b = np.zeros(h.size, dtype=bool)
                for bits in bitmaps_for(int(b)):
                    hit = np.ones(h.size, dtype=bool)
                    for pos in _positions(h, m_bits, k):
                        hit &= bits[pos]
                    res_b |= hit
                maybe[sel] = res_b
            out = pdf[cols].copy()
            out[out_col] = maybe
            yield out

    bucketed = df.repartition(n_buckets, bucket_col(xx_col, n_buckets))
    return bucketed.mapInPandas(run, schema=out_schema)


def compact(spark, path: str, n_buckets: int = 64, m_bits: int = 1 << 17) -> None:
    """OR each bucket's delta bitmaps into one (bounds probe work after many
    epochs). Crash-safe the same way StateStore.compact is: the new layout is
    written completely to a sibling dir, then swapped in with os.replace."""
    import shutil

    src = spark.read.parquet(path)  # bucket partition discovered

    def fold(it):
        acc: dict[int, np.ndarray] = {}
        nbytes = m_bits // 8
        for pdf in it:
            for b, grp in pdf.groupby("bucket"):
                bits = acc.setdefault(int(b), np.zeros(nbytes, dtype=np.uint8))
                for buf in grp["bitmap"]:
                    bits |= np.frombuffer(buf, dtype=np.uint8)
        for b, bits in acc.items():
            yield pd.DataFrame({"bucket": [b], "bitmap": [bits.tobytes()]})

    tmp = path.rstrip("/") + "__compact_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    (
        src.repartition(n_buckets, "bucket")
        .mapInPandas(fold, schema="bucket int, bitmap binary")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp)
    )
    old = path.rstrip("/") + "__old"
    if os.path.isdir(old):
        shutil.rmtree(old)
    os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old, ignore_errors=True)
