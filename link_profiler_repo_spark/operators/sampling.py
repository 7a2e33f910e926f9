"""Training-data mixture sampling — deterministic, scale-invariant corpus
composition operators (added LLM-pipeline family; no reference counterpart —
the reference's only sampling is a LIMIT, `crawl_service.py:953-955`).

A 100 TB corpus build needs three sampling primitives, and all three must be
DETERMINISTIC functions of the row key so that (a) re-runs and resumed runs
select the same rows with no coordination, (b) samples at different rates
nest (the 10% sample is a superset of the 1% sample — threshold
monotonicity), and (c) the oracle can re-derive membership exactly:

- `deterministic_sample`: keep a row iff the first 8 hex chars of
  md5(salt|id) — a uniform 32-bit key — fall below the rate threshold.
  Rendered as a plain STRING comparison against a fixed-width lowercase hex
  literal, which both Spark and DuckDB evaluate identically (no float
  parsing, no engine-specific hash). Pure Catalyst, fully pushdown-able: the
  filter sits directly on the scan.
- `mixture_rates` / `mixture_sample`: per-stratum rates derived FROM TARGET
  PROPORTIONS relationally (one tiny groupBy + a broadcast join back), the
  "data mixing" step of a training build: e.g. 40% en / 30% code / ... of a
  total budget, capped at availability (rate clamps to 1).
- `token_budget_pack`: greedy prefix packing — per stratum, order docs by
  their hash key (a deterministic shuffle) and keep while the running token
  total fits the budget. Computed as a TWO-LEVEL distributed prefix sum:
  the hash key's first hex digit splits each stratum into 16 ordered
  buckets, the cumulative sum runs per (stratum, bucket) partition in
  parallel, and bucket offsets come from a 16-row-per-stratum subtotal
  aggregate — so no stratum is ever sorted on a single partition, the same
  closed-form-offsets pattern as the crawl loop's shuffle-free budget
  admission (operators/crawl.py). The DuckDB oracle runs the naive
  single-window cumulative sum instead — different algorithm, same rows.
"""

from __future__ import annotations

import math
from functools import reduce

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession, Window

# 8 hex chars = 32 bits; key/SCALE is uniform in [0, 1)
SCALE = 1 << 32


def hash_key(id_col: Column, salt: str = "") -> Column:
    """Uniform sampling key: first 8 hex chars (lowercase) of md5(salt|id).
    Identical bytes in Spark and DuckDB (md5 of the same string), so
    membership is oracle-exact."""
    return F.substring(
        F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string"))), 1, 8
    )


def rate_threshold_hex(rate: float) -> str:
    """Fixed-width lowercase hex literal t such that key < t  <=>
    key/2^32 < rate, for rate in [0, 1)."""
    v = int(math.floor(max(rate, 0.0) * SCALE))
    return format(min(v, SCALE - 1), "08x")


def keep_expr(key: Column, rate: float) -> Column:
    """key admitted at `rate` (driver-known constant rate)."""
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    return key < F.lit(rate_threshold_hex(rate))


def keep_expr_col(key: Column, rate: Column) -> Column:
    """key admitted at `rate` (per-row rate column, e.g. joined mixture
    rates). floor(rate*2^32) stays under 2^32 for rate<1 so the hex render
    is always 8 chars; rate>=1 short-circuits (its 9-char hex would compare
    wrong lexicographically)."""
    thresh = F.lower(
        F.lpad(
            F.hex(F.floor(rate * F.lit(float(SCALE))).cast("bigint")), 8, "0"
        )
    )
    return (rate >= 1.0) | ((rate > 0.0) & (key < thresh))


def deterministic_sample(
    df: DataFrame, id_col: str, rate: float, salt: str = ""
) -> DataFrame:
    """Uniform deterministic sample: keep iff hash_key(id) < rate. Samples
    nest across rates (monotone threshold) and across runs (pure function
    of id)."""
    return df.filter(keep_expr(hash_key(F.col(id_col), salt), rate))


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sample with driver-known rates (strata not
    listed get default_rate). One scan, no shuffle: the rate lookup is a
    when-chain (strata configs are small by construction)."""
    key = hash_key(F.col(id_col), salt)
    cond = reduce(
        lambda acc, kv: acc.when(F.col(strata_col) == kv[0], keep_expr(key, kv[1])),
        rates.items(),
        F.when(F.lit(False), F.lit(False)),
    ).otherwise(keep_expr(key, default_rate))
    return df.filter(cond)


def mixture_rates(
    df: DataFrame,
    strata_col: str,
    targets: dict[str, float],
    total_rows: float,
) -> DataFrame:
    """Per-stratum sampling rates that hit a target mixture: stratum s gets
    rate = min(1, total_rows*target_s / count_s) — the availability-capped
    rate a data-mixing recipe prescribes. One groupBy over the corpus; the
    targets table is a handful of literal rows. Returns (stratum, rate)."""
    spark = df.sparkSession
    tgt = _targets_df(spark, strata_col, targets)
    counts = df.groupBy(strata_col).agg(F.count("*").alias("_n"))
    return counts.join(F.broadcast(tgt), strata_col).select(
        strata_col,
        F.least(
            F.lit(1.0), F.lit(float(total_rows)) * F.col("_t") / F.col("_n")
        ).alias("rate"),
    )


def _targets_df(
    spark: SparkSession, strata_col: str, targets: dict[str, float]
) -> DataFrame:
    from ..functions.localdf import local_df

    return local_df(
        spark,
        [(k, float(v)) for k, v in sorted(targets.items())],
        f"{strata_col} string, _t double",
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    targets: dict[str, float],
    total_rows: float,
    salt: str = "",
) -> DataFrame:
    """Sample df to the target mixture: derive per-stratum rates
    relationally, broadcast-join them back, admit by hash threshold. Strata
    without a target are dropped (rate 0). Expected kept rows ≈ total_rows
    scaled by each target (exactly capped where a stratum lacks volume)."""
    rates = mixture_rates(df, strata_col, targets, total_rows)
    key = hash_key(F.col(id_col), salt)
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(keep_expr_col(key, F.col("rate")))
        .drop("rate")
    )


def token_budget_pack(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    tokens_col: str,
    budget: int,
    salt: str = "",
) -> DataFrame:
    """Greedy token-budget packing per stratum: order docs by hash key (a
    deterministic shuffle) and keep while the stratum's running token total
    (inclusive) stays <= budget. Returns df + (cum_tokens, keep).

    Two-level prefix sum, never a per-stratum global sort: the key's first
    hex digit is a BUCKET whose lexicographic order equals the key order, so
    global rank = (bucket, key-within-bucket). The window runs per
    (stratum, bucket) — 16-way parallel per stratum — and each bucket's
    offset is an exclusive prefix over the 16-row-per-stratum subtotal
    table, broadcast-joined back. A giant stratum therefore costs one
    hash-partitioned window over ~1/16 slices, not one executor sorting the
    whole stratum."""
    key = hash_key(F.col(id_col), salt)
    d = df.withColumn("_key", key).withColumn(
        "_bkt", F.substring("_key", 1, 1)
    )
    w_in = (
        Window.partitionBy(strata_col, "_bkt")
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_cum_in", F.sum(tokens_col).over(w_in))
    sub = d.groupBy(strata_col, "_bkt").agg(F.sum(tokens_col).alias("_btot"))
    w_off = (
        Window.partitionBy(strata_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = sub.withColumn(
        "_off", F.coalesce(F.sum("_btot").over(w_off), F.lit(0))
    ).select(strata_col, "_bkt", "_off")
    return (
        d.join(F.broadcast(off), [strata_col, "_bkt"])
        .withColumn("cum_tokens", (F.col("_off") + F.col("_cum_in")).cast("bigint"))
        .withColumn("keep", F.col("cum_tokens") <= F.lit(int(budget)))
        .drop("_key", "_bkt", "_cum_in", "_off")
    )


def shard_corpus(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    n_shards: int,
    salt: str = "",
) -> DataFrame:
    """Equal-token OUTPUT SHARDING — the write stage after packing: assign
    every doc a shard in [0, n_shards) so shards carry ~equal token mass
    (±1 doc), deterministically (re-runs produce identical shards; training
    jobs that stream shard k always see the same bytes). Docs order by the
    same md5 key the sampler uses; shard = exclusive-prefix-tokens DIV
    ceil(total/n_shards) — a contiguous token-range cut, so a shard is a
    key range and adding docs only perturbs shards after their key.

    Same two-level prefix sum as token_budget_pack (16 hex buckets +
    broadcast offsets), ONE stratum = the whole corpus — no global sort,
    no single-partition window. total is one scalar agg, broadcast back.
    Returns df + (cum_tokens inclusive BIGINT, shard INT); write with
    `.write.partitionBy("shard")` for one directory per shard."""
    key = hash_key(F.col(id_col), salt)
    d = df.withColumn("_key", key).withColumn("_bkt", F.substring("_key", 1, 1))
    w_in = (
        Window.partitionBy("_bkt")
        .orderBy("_key", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("_cum_in", F.sum(tokens_col).over(w_in))
    sub = d.groupBy("_bkt").agg(F.sum(tokens_col).alias("_btot"))
    w_off = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    off = sub.withColumn(
        "_off", F.coalesce(F.sum("_btot").over(w_off), F.lit(0))
    ).select("_bkt", "_off")
    total = df.agg(
        F.coalesce(F.sum(tokens_col), F.lit(0)).cast("long").alias("_total")
    )
    # integer DIV end to end: double division near an exact shard boundary
    # could round x.999... up in one engine's floor and not the other's
    shard_size = F.greatest(
        F.lit(1).cast("long"),
        F.expr(f"(_total + {n_shards - 1}) DIV {n_shards}"),
    )
    return (
        d.join(F.broadcast(off), "_bkt")
        .join(F.broadcast(total), how="cross")
        .withColumn("cum_tokens", (F.col("_off") + F.col("_cum_in")).cast("bigint"))
        .withColumn("_ssize", shard_size)
        .withColumn(
            "shard",
            F.expr(f"CAST((cum_tokens - {tokens_col}) DIV _ssize AS INT)"),
        )
        .drop("_key", "_bkt", "_cum_in", "_off", "_total", "_ssize")
    )
