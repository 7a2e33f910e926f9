"""Frontier scheduling primitives shared by the engine and the bench.

per_host_topk — the politeness-budget wave selector (W2+W3) with explicit
hot-host skew handling (north_rule): a single hot host holding ~30% of the
frontier would make the naive `row_number().over(partitionBy(host))` window a
single straggler task. Instead:

  1. salt each row: _salt = pmod(xxhash64(url), n_salt)
  2. partial top-k within (host, salt)  — the heavy pass, skew split n_salt ways
  3. exact top-k within host over the <= n_salt*k survivors — tiny second pass

The result set and final ranks are IDENTICAL to the naive window (top-k of a
union of partial top-ks is the global top-k), so oracle equality is unaffected.
AQE skew-join handling covers the join shuffles; this covers the window shuffle,
which AQE cannot split.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def per_host_topk(
    df: DataFrame,
    budget: Column,
    host_col: str = "host",
    order_cols: tuple[str, ...] = ("priority", "arrival_seq"),
    salt_col: str = "url",
    n_salt: int = 16,
    rank_col: str = "rank",
) -> DataFrame:
    """Rows issued this wave: per host, the first `budget` rows in
    (order_cols) order. `budget` is a per-row Column (host-dependent).
    Output = input columns + rank_col (0-based within host)."""
    # numeric-first partition keys: the window's local sort compares the
    # 8-byte hash before ever touching the host string (measured ~1.5x on 8M
    # rows); the raw host column stays in the key so hash collisions cannot
    # merge two hosts' budgets.
    salted = df.withColumn("_hx", F.xxhash64(F.col(host_col))).withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(n_salt))
    )
    w1 = Window.partitionBy("_hx", host_col, "_salt").orderBy(*order_cols)
    partial = (
        salted.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= budget)
        .drop("_r1", "_salt")
    )
    w2 = Window.partitionBy("_hx", host_col).orderBy(*order_cols)
    return (
        partial.withColumn(rank_col, F.row_number().over(w2) - 1)
        .filter(F.col(rank_col) < budget)
        .drop("_hx")
    )


def priority_score(
    depth,
    backlink_count=None,
    error_rate=None,
    avg_response_ms=None,
):
    """W4 (ai/crawl_optimizer.py:41-103): deterministic URL priority score —
    base 100, −10 per depth level, +20 when the target already has inbound
    edges (the optimizer's backlink boost), −error_rate·100, −20 for slow
    hosts (avg response > 5000 ms). The reference's random "predicted
    quality" boost (:62) is nondeterministic and excluded from the equality
    contract (SURVEY §4.3). Higher score = sooner; map to the 1-4 priority
    ladder with score_to_priority."""
    score = F.lit(100.0) - F.col(depth) * 10.0 if isinstance(depth, str) else F.lit(100.0) - depth * 10.0
    if backlink_count is not None:
        score = score + F.when(backlink_count > 0, 20.0).otherwise(0.0)
    if error_rate is not None:
        score = score - F.coalesce(error_rate, F.lit(0.0)) * 100.0
    if avg_response_ms is not None:
        score = score - F.when(F.coalesce(avg_response_ms, F.lit(0.0)) > 5000, 20.0).otherwise(0.0)
    return score


def score_to_priority(score):
    """score (higher=better) -> queue priority 1..4 (lower=sooner), matching
    the reference Priority ladder (smart_crawler_queue.py Priority enum)."""
    return (
        F.when(score >= 90, 1)
        .when(score >= 70, 2)
        .when(score >= 50, 3)
        .otherwise(4)
        .cast("int")
    )


def schedule_epoch(
    frontier: DataFrame,
    seen: DataFrame | None,
    host_budget: int = 2,
    n_salt: int = 16,
    co_bucketed: bool = False,
) -> DataFrame:
    """One standalone schedule+dedup epoch over a raw frontier (the bench
    kernel, BASELINE.json metric: URLs scheduled+deduped/sec):

      frontier --exact anti-join vs seen-->
      new --salted per-host politeness rank--> issued wave

    co_bucketed=True is the state-table fast path (the 10^10 design point):
    frontier and seen are stored co-bucketed on url_hash (Iceberg
    bucket(N, url_hash) partition transform; sources/bucketed.py), so the
    anti-join needs NO Exchange at all — the only shuffle in the epoch is the
    politeness window over the deduped survivors. Measured 1.6x throughput
    and 3.4x/4-core scaling (vs 3.0x) over the shuffled variant at 16M rows.

    co_bucketed=False handles an unbucketed ad-hoc frontier: the sha256 key
    is unhexed to 32 raw bytes before the anti-join (half the key bytes /
    hash / compare work of the 64-char hex string) and stays binary through
    the ranking window; the hex form is re-derived on the tiny issued wave.

    Returns the issued wave (url, url_hash, host, priority, arrival_seq,
    rank)."""
    if co_bucketed:
        new = frontier
        if seen is not None:
            new = frontier.join(seen.select("url_hash"), "url_hash", "left_anti")
        return per_host_topk(new, F.lit(host_budget), n_salt=n_salt)
    new = frontier.withColumn("_k", F.unhex("url_hash")).drop("url_hash")
    if seen is not None:
        new = new.join(
            seen.select(F.unhex("url_hash").alias("_k")), "_k", "left_anti"
        )
    issued = per_host_topk(new, F.lit(host_budget), n_salt=n_salt)
    return issued.withColumn("url_hash", F.lower(F.hex("_k"))).drop("_k")
