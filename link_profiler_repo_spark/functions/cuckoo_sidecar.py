"""Per-bucket cuckoo-filter sidecar — the DELETABLE variant of the URL-seen
prefilter (north_rule names "bloom/cuckoo"; Fan et al., "Cuckoo Filter:
Practically Better Than Bloom", CoNEXT 2014). The Bloom sidecar
(functions/bloom_sidecar.py) is smaller per key but cannot forget; a crawler
that re-admits stale URLs on a recrawl schedule (operators/recrawl.py) needs
the prefilter to EVICT those keys, or every re-admitted URL pays the exact
anti-join shuffle forever. Same outer layout as the Bloom sidecar: outer
bucket = pmod(xx64, n_buckets); one filter per outer bucket stored as a row

    {path}/bucket=N/part-*.parquet    rows: (table binary, stash binary)

and probes repartition by outer bucket so each task directory-prunes to its
own files. All per-key work is vectorized numpy over Arrow batches.

Filter per outer bucket: nb inner buckets (power of 2) x 4 slots of 16-bit
fingerprints (0 = empty). fp(x) = ((x >> 48) mod 65535) + 1 (never 0);
i1 = (x >> 16) & (nb-1); i2 = i1 XOR (h(fp) & (nb-1)) — partial-key cuckoo,
so a later delete can recover i2 from (i1, fp) of either bucket. Insertion
is ROUND-BASED TWO-CHOICE placement first — alternating rounds try i1 then
i2, placing every pending key that fits (a vectorized rank-vs-capacity
scatter) — then classic evicting-kick chains ONLY for the residue whose
both buckets are full (<1% of keys at the <= 50% load factor the sizing
targets). Kick chains are inherently sequential per key (each kick depends
on the previous victim), so running them only on the residue keeps the
bulk fully vectorized; a chain that cycles past max_kicks lands its last
victim in a small exact STASH of canonical (min(i1,i2), fp) pairs, which
stays essentially empty (tests pin a bound).

Semantics: no false negatives for inserted keys (cuckoo tables give this
structurally — a key is AT i1/i2 or in the stash; nothing is ever silently
dropped); false positives only cost exact-join work, as with Bloom.
delete() removes ONE copy of (i1, fp) — after a crash-replayed duplicate
insert a key may survive one delete, which is safe for a prefilter (the
exact seen table stays authoritative; a stale maybe only costs join work).

Scale math at the design point: |seen| = 10^10, n_buckets = 4096 =>
2.4M keys/bucket; slots_per_bucket = 2^23 at ~0.3 load => 16 MiB table per
probe task, 64 GiB total distributed. ~5 bytes/key vs Bloom's ~1.6 at 1%
fpp — the price of deletability; fpp here is ~2*4*2/65535 ~ 0.02%.
Defaults below are sandbox-sized."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from .bloom_sidecar import bucket_col

_EMPTY = np.uint16(0)
_ROUNDS = 8  # alternating i1/i2 placement passes before stashing


def _derive(x: np.ndarray, nb: int):
    """(fp uint16 in [1,65535], i1, i2) from int64 xx64 keys."""
    u = x.view(np.uint64) if x.dtype == np.int64 else x.astype(np.uint64)
    fp = ((u >> np.uint64(48)) % np.uint64(65535) + np.uint64(1)).astype(np.uint16)
    mask = np.uint64(nb - 1)
    i1 = ((u >> np.uint64(16)) & mask).astype(np.int64)
    h = (fp.astype(np.uint64) * np.uint64(0x5BD1E995)) & mask
    i2 = (i1 ^ h.astype(np.int64)).astype(np.int64)
    return fp, i1, i2


def _pack(i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
    return (i1.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)


def _spack(i1: np.ndarray, i2: np.ndarray, fp: np.ndarray) -> np.ndarray:
    """Canonical stash packing: min(i1, i2) disambiguates nothing — it's the
    same value whichever bucket a kicked fingerprint currently sits near —
    so lookup/delete can recompute it from the key alone."""
    return _pack(np.minimum(i1, i2), fp)


def _place_round(table: np.ndarray, occ: np.ndarray, b: np.ndarray, fp: np.ndarray):
    """Place as many (b, fp) as fit (rank-within-bucket < remaining capacity).
    Returns boolean placed-mask. Vectorized: sort by bucket, rank = position
    minus first-occurrence index, scatter into slot occ[b] + rank."""
    order = np.argsort(b, kind="stable")
    bs = b[order]
    first = np.searchsorted(bs, bs)
    ranks = np.arange(len(bs)) - first
    cap = 4 - occ[bs]
    fit = ranks < cap
    rows = bs[fit]
    slots = (occ[bs] + ranks)[fit]
    table[rows, slots] = fp[order][fit]
    np.add.at(occ, rows, 1)
    placed = np.zeros(len(b), dtype=bool)
    placed[order[fit]] = True
    return placed


def _kick_chain(table: np.ndarray, nb: int, b: int, f: int, max_kicks: int = 500) -> bool:
    """Classic cuckoo insertion for ONE homeless fingerprint: evict a
    deterministic victim (slot = fp mod 4), move it to its alternate bucket,
    repeat. Partial-key cuckoo lets the victim's alternate be recomputed
    from (bucket, fp) alone. Sequential per key by nature — called only for
    the <1% residue that vectorized two-choice placement could not seat."""
    mask = np.uint64(nb - 1)
    for _ in range(max_kicks):
        row = table[b]
        empty = np.flatnonzero(row == _EMPTY)
        if empty.size:
            table[b, empty[0]] = f
            return True
        s = int(f) & 3
        victim = int(row[s])
        table[b, s] = f
        f = victim
        b = int(np.int64(b) ^ np.int64((np.uint64(victim) * np.uint64(0x5BD1E995)) & mask))
    # chain cycled: re-seat the final homeless fingerprint is the caller's
    # job (stash) — but we no longer know its key, only (b, f); stash the
    # canonical packing recomputed from (b, fp)'s own alternate pair.
    alt = int(np.int64(b) ^ np.int64((np.uint64(f) * np.uint64(0x5BD1E995)) & mask))
    return (min(b, alt) << 16) | f  # packed uint64 for the stash


def _insert(table: np.ndarray, stash: np.ndarray, x: np.ndarray, nb: int):
    """Insert keys (np.unique'd) into (table, stash); returns new stash.
    Bulk placement is vectorized round-based two-choice; the residue whose
    both buckets are full (<1% at the <=50% design load) runs classic kick
    chains; only a cycled chain's last victim lands in the exact stash."""
    x = np.unique(x)
    fp, i1, i2 = _derive(x, nb)
    occ = (table != _EMPTY).sum(axis=1).astype(np.int64)
    pending = np.ones(len(x), dtype=bool)
    for r in range(_ROUNDS):
        if not pending.any():
            break
        idx = np.flatnonzero(pending)
        b = i1[idx] if r % 2 == 0 else i2[idx]
        placed = _place_round(table, occ, b, fp[idx])
        pending[idx[placed]] = False
    if pending.any():
        overflow = []
        for j in np.flatnonzero(pending):
            res = _kick_chain(table, nb, int(i1[j]), int(fp[j]))
            if res is not True:
                overflow.append(res)
        if overflow:
            stash = np.union1d(stash, np.array(overflow, dtype=np.uint64))
    return stash


def _lookup(table: np.ndarray, stash: np.ndarray, x: np.ndarray, nb: int) -> np.ndarray:
    fp, i1, i2 = _derive(x, nb)
    hit = (table[i1] == fp[:, None]).any(axis=1) | (table[i2] == fp[:, None]).any(axis=1)
    if stash.size:
        hit |= np.isin(_spack(i1, i2, fp), stash, assume_unique=False)
    return hit


def _compact_rows(table: np.ndarray, rows: np.ndarray) -> None:
    """Left-align the occupied slots of the given rows. _place_round scatters
    into slot occ+rank, which is only a free slot if occupied slots form a
    prefix — deletes punch holes mid-row, so every delete re-compacts the
    rows it touched (stable per-row sort on emptiness; 4-wide, vectorized)."""
    rows = np.unique(rows)
    if rows.size == 0:
        return
    sub = table[rows]
    order = np.argsort(sub == _EMPTY, axis=1, kind="stable")
    table[rows] = np.take_along_axis(sub, order, axis=1)


def _delete(table: np.ndarray, stash: np.ndarray, x: np.ndarray, nb: int):
    """Remove one copy of each key's (fp) from i1, else i2, else stash.
    Distinct keys sharing (i1, fp) are folded by np.unique first, then each
    such group removes copies one at a time (a per-GROUP loop over the rare
    fingerprint-collision case, not per-row work)."""
    x = np.unique(x)
    fp, i1, i2 = _derive(x, nb)
    packed = _pack(i1, fp)
    uniq, counts = np.unique(packed, return_counts=True)
    # singles: fully vectorized one-copy removal. The i2 pass reads the
    # table AFTER the i1 scatter, so an i1-removal and an i2-removal can
    # never double-spend the same stored copy.
    singles = np.isin(packed, uniq[counts == 1])
    idx = np.flatnonzero(singles)
    if idx.size:
        m1 = table[i1[idx]] == fp[idx, None]
        has1 = m1.any(axis=1)
        r1 = idx[has1]
        table[i1[r1], m1[has1].argmax(axis=1)] = _EMPTY
        rest = idx[~has1]
        if rest.size:
            m2 = table[i2[rest]] == fp[rest, None]
            has2 = m2.any(axis=1)
            r2 = rest[has2]
            table[i2[r2], m2[has2].argmax(axis=1)] = _EMPTY
            miss = rest[~has2]
            if miss.size and stash.size:
                stash = np.setdiff1d(stash, _spack(i1[miss], i2[miss], fp[miss]))
    # collision groups (same i1+fp from different keys): remove count copies
    for g in np.flatnonzero(counts > 1):
        gi = np.flatnonzero(packed == uniq[g])
        for j in gi:
            row1, row2, f = i1[j], i2[j], fp[j]
            s1 = np.flatnonzero(table[row1] == f)
            if s1.size:
                table[row1, s1[0]] = _EMPTY
                continue
            s2 = np.flatnonzero(table[row2] == f)
            if s2.size:
                table[row2, s2[0]] = _EMPTY
            elif stash.size:
                stash = np.setdiff1d(
                    stash, _spack(i1[j : j + 1], i2[j : j + 1], fp[j : j + 1])
                )
    _compact_rows(table, np.concatenate([i1, i2]))
    return stash


def _load_bucket(path: str, b: int, nb: int):
    import pyarrow.parquet as pq

    bdir = os.path.join(path, f"bucket={b}")
    if os.path.isdir(bdir):
        tbl = pq.read_table(bdir, columns=["table", "stash"])
        raw_t = tbl.column("table").to_pylist()
        raw_s = tbl.column("stash").to_pylist()
        if raw_t:
            table = np.frombuffer(bytearray(raw_t[0]), dtype=np.uint16).reshape(nb, 4).copy()
            stash = (
                np.frombuffer(bytearray(raw_s[0]), dtype=np.uint64).copy()
                if raw_s[0]
                else np.empty(0, dtype=np.uint64)
            )
            return table, stash
    return np.zeros((nb, 4), dtype=np.uint16), np.empty(0, dtype=np.uint64)


def update(
    spark: SparkSession,
    path: str,
    inserts: DataFrame | None,
    deletes: DataFrame | None = None,
    xx_col: str = "xx64",
    n_buckets: int = 64,
    slots_per_bucket: int = 1 << 14,
) -> None:
    """Apply one epoch of inserts/deletes. Updates repartition by outer
    bucket; each task loads ONLY its buckets' current rows, folds the keys in
    numpy, and writes the new rows. Untouched buckets are carried over by
    directory COPY into the staging layout (a move would gut the live layout
    before the swap commits), then the whole layout swaps in atomically
    (os.replace), the same crash discipline as bloom_sidecar.compact /
    StateStore."""
    nb = slots_per_bucket // 4
    assert nb & (nb - 1) == 0, "slots_per_bucket/4 must be a power of two"
    parts = []
    if inserts is not None:
        parts.append(inserts.select(F.col(xx_col).alias("xx64"), F.lit(1).alias("op")))
    if deletes is not None:
        parts.append(deletes.select(F.col(xx_col).alias("xx64"), F.lit(-1).alias("op")))
    if not parts:
        return
    ups = parts[0]
    for p in parts[1:]:
        ups = ups.unionByName(p)
    ups = ups.withColumn("bucket", bucket_col("xx64", n_buckets))

    def fold(it):
        acc: dict[int, list] = {}
        for pdf in it:
            for b, grp in pdf.groupby("bucket"):
                acc.setdefault(int(b), []).append(grp)
        for b, grps in acc.items():
            table, stash = _load_bucket(path, b, nb)
            g = pd.concat(grps)
            ins = g.loc[g["op"] > 0, "xx64"].to_numpy(dtype=np.int64)
            dels = g.loc[g["op"] < 0, "xx64"].to_numpy(dtype=np.int64)
            if ins.size:
                stash = _insert(table, stash, ins, nb)
            if dels.size:
                stash = _delete(table, stash, dels, nb)
            yield pd.DataFrame(
                {"bucket": [b], "table": [table.tobytes()], "stash": [stash.tobytes()]}
            )

    tmp = path.rstrip("/") + "__update_tmp"
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    (
        ups.repartition(n_buckets, "bucket")
        .mapInPandas(fold, schema="bucket int, table binary, stash binary")
        .write.mode("overwrite")
        .partitionBy("bucket")
        .parquet(tmp)
    )
    if os.path.isdir(path):
        touched = {d for d in os.listdir(tmp) if d.startswith("bucket=")}
        for d in os.listdir(path):
            if d.startswith("bucket=") and d not in touched:
                shutil.copytree(os.path.join(path, d), os.path.join(tmp, d))
        old = path.rstrip("/") + "__old"
        if os.path.isdir(old):
            shutil.rmtree(old)
        os.replace(path, old)
        os.replace(tmp, path)
        shutil.rmtree(old, ignore_errors=True)
    else:
        os.replace(tmp, path)


def probe(
    df: DataFrame,
    xx_col: str,
    path: str,
    n_buckets: int = 64,
    slots_per_bucket: int = 1 << 14,
    out_col: str = "_maybe",
) -> DataFrame:
    """df + boolean out_col. Same bucket-pruned read discipline as the Bloom
    sidecar probe: candidates repartition by outer bucket, each task loads
    only its buckets' rows."""
    nb = slots_per_bucket // 4
    out_schema = T.StructType(df.schema.fields + [T.StructField(out_col, T.BooleanType(), False)])
    cols = [f.name for f in df.schema.fields]

    def run(it):
        cache: dict[int, tuple] = {}
        for pdf in it:
            if len(pdf) == 0:
                continue
            keys = pdf[xx_col].to_numpy(dtype=np.int64)
            # floored signed modulo matches Catalyst pmod (bloom_sidecar note)
            buckets = keys % n_buckets
            maybe = np.zeros(len(pdf), dtype=bool)
            for b in np.unique(buckets):
                if b not in cache:
                    cache[int(b)] = _load_bucket(path, int(b), nb)
                table, stash = cache[int(b)]
                sel = buckets == b
                maybe[sel] = _lookup(table, stash, keys[sel], nb)
            out = pdf[cols].copy()
            out[out_col] = maybe
            yield out

    bucketed = df.repartition(n_buckets, bucket_col(xx_col, n_buckets))
    return bucketed.mapInPandas(run, schema=out_schema)
