"""Scalable global dense ordering — zipWithIndex without RDDs.

Assigning a dense 0..n-1 index in a total order normally means a global window
(`row_number().over(Window.orderBy(...))`) which collapses to ONE partition —
fine at test scale, fatal at 10^10. This helper keeps it distributed:

  1. range-partition by the order columns (sampled range boundaries),
  2. sort within partitions,
  3. count rows per partition (one cheap agg),
  4. per-partition cumulative offsets broadcast back; a mapInPandas pass
     assigns offset + running position.

Two passes over the data, no single-partition bottleneck. This is the same
strategy Spark's own zipWithIndex uses, expressed DataFrame-native so the
input/output stay columnar Arrow batches.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

# intermediates persisted by with_global_index; callers release them at safe
# barriers (e.g. the crawl engine at each epoch commit) via unpersist_all()
_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Register an externally persisted intermediate for release at the next
    unpersist_all() barrier."""
    _PERSISTED.append(df)
    return df


def unpersist_all() -> None:
    while _PERSISTED:
        try:
            _PERSISTED.pop().unpersist()
        except Exception:
            pass


def with_global_index(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "idx",
    num_partitions: int | None = None,
    small: bool = False,
    keep_pid: bool = False,
    bucket_by: tuple[str, int] | None = None,
) -> tuple[DataFrame, int]:
    """Dense global index in the total order of `order_cols` (must be a
    deterministic total order — include a unique tiebreaker column).
    Returns (indexed_df, total_rows) — the count comes free from pass 1.

    small=True takes the single-partition window shortcut (1 job instead of 3)
    — correct at any size but serial; callers flip it when the input is known
    to be driver-trivial (e.g. a crawl wave far below the shuffle threshold).
    The default path stays fully distributed for the 10^10 design point.

    keep_pid=True (distributed path only) retains the internal ``_pid``
    range-bucket column in the output, whose rows stay bucket-ordered and
    sorted by `order_cols` within each bucket run — downstream consumers
    (the crawl budget admission) can then run per-bucket cumulative logic
    with NO re-shuffle. The small path scrambles placement on fan-out, so it
    never emits _pid.

    bucket_by=(col, domain) — when the leading order column `col` is known
    to be a long in [0, domain) (e.g. a dense index from a previous pass),
    buckets are computed DETERMINISTICALLY as col * n_buckets // domain and
    hash-shuffled, instead of repartitionByRange. This skips the range
    sampling pass, which otherwise evaluates the (possibly expensive)
    upstream lineage a second time. Monotonicity of the bucket id along the
    total order is the caller's contract; 4x buckets per partition keep the
    hash placement balanced."""
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = max(2, spark.sparkContext.defaultParallelism)
    if small:
        from pyspark.sql import Window

        w = Window.orderBy(*order_cols)
        # repartition(1), NOT coalesce(1): coalesce propagates the 1-partition
        # constraint UP through the whole lineage (bloom probe, anti-joins,
        # extraction all serialize on one core — measured 11-12s/epoch on a
        # <2000-row wave whose actual data is trivial); a 1-partition shuffle
        # keeps upstream at full parallelism and only the tiny shuffled wave
        # is serial.
        indexed = df.repartition(1).withColumn(
            out_col, F.row_number().over(w).cast("long") - 1
        )
        # CRITICAL: fan back out after the single-partition window — without
        # this the wave stays at 1 partition and every downstream stage of
        # the epoch (fetch join, extraction, dedup) serializes on one core
        # (measured 2.2x slower end-to-end crawl than the distributed path it
        # was meant to beat). The index column carries the ordering; row
        # placement is free to change.
        out = indexed.repartition(num_partitions)
        out.persist(StorageLevel.MEMORY_AND_DISK)
        _PERSISTED.append(out)
        return out, out.count()

    # NOTE: repartitionByRange runs a sampling pass over its child before the
    # shuffle; persisting the input first was A/B-tested (r3, re-confirmed
    # r4) and is a net LOSS at bench scale (cache churn outweighs the saved
    # re-eval). bucket_by avoids the sampling pass structurally instead.
    if bucket_by is not None:
        bcol, domain = bucket_by
        n_buckets = 4 * num_partitions
        # integer DIV: float division would lose exactness past 2^53 at the
        # 10^10-row design point
        bucket = F.expr(
            f"CAST((CAST(`{bcol}` AS BIGINT) * {n_buckets}) DIV {max(int(domain), 1)} AS INT)"
        )
        sorted_df = (
            df.withColumn("_pid", bucket)
            .repartition(num_partitions, "_pid")
            .sortWithinPartitions("_pid", *order_cols)
        )
    else:
        sorted_df = (
            df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
            .sortWithinPartitions(*order_cols)
            .withColumn("_pid", F.spark_partition_id())
        )
    sorted_df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(sorted_df)
    counts = dict(
        (r["_pid"], r["cnt"])
        for r in sorted_df.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]

    out_fields = df.schema.fields + [T.StructField(out_col, T.LongType(), False)]
    if keep_pid:
        out_fields = out_fields + [T.StructField("_pid", T.IntegerType(), False)]
    out_schema = T.StructType(out_fields)
    cols = [f.name for f in df.schema.fields]

    def assign(it):
        # one task == one partition; batches arrive in partition order. With
        # bucket_by, a partition holds one or more whole buckets, sorted by
        # (_pid, order_cols): detect bucket runs and restart at each bucket's
        # offset. (Range mode is the single-run special case.)
        import numpy as np

        cur, pos = None, 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            pids = pdf["_pid"].to_numpy()
            idx = np.empty(len(pdf), dtype=np.int64)
            starts = np.flatnonzero(
                np.concatenate(([True], pids[1:] != pids[:-1]))
            )
            for i, s in enumerate(starts):
                e = starts[i + 1] if i + 1 < len(starts) else len(pdf)
                b = int(pids[s])
                if b != cur:
                    cur, pos = b, offsets[b]
                idx[s:e] = np.arange(pos, pos + (e - s))
                pos += e - s
            out = pdf[cols].copy()
            out[out_col] = idx
            if keep_pid:
                out["_pid"] = pdf["_pid"].values
            yield out

    result = sorted_df.mapInPandas(assign, schema=out_schema)
    return result, acc
