"""Domain/SERP history snapshots — latest-N-per-key (W6 as a real operator).

Reference analogs: DomainHistory / SERP snapshot queries
(database/database.py:511-513 `ORDER BY created_date DESC LIMIT n` per
domain, api/analytics.py:68-114 history endpoints). A history table is
append-only (domain, snapshot_ts, metrics...); consumers want the latest N
snapshots per key, or the latest row per key joined back to full width.

Spark shape: windowed row_number over (key) ordered by ts DESC — shuffles
once on the key, no global window; at 10^10 rows the window partitions by
the key hash exactly like the groupBy path, and a pre-filter on a snapshot
time range partition-prunes the scan (history tables are naturally
time-partitioned)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def latest_n_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    n: int = 1,
    tiebreak: list[str] | None = None,
    rank_col: str = "rn",
) -> DataFrame:
    """Latest n rows per key by order_col DESC (deterministic: pass a unique
    tiebreak for total order). Output = input + rank_col (1 = newest)."""
    order = [F.desc(order_col)] + [F.asc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def domain_history_from_edges(edges: DataFrame, ts_col: str = "discovered_at") -> DataFrame:
    """DomainHistory producer (core/models.py:740-762): per-epoch snapshots of
    each target domain's cumulative link metrics, derived from the edge log.

    The reference appends a snapshot row per domain per refresh; rather than
    aggregating cumulative state inside the crawl loop (an extra full-history
    shuffle per epoch), the whole snapshot table falls out of ONE pass over
    the edge log after the run: per-(domain, epoch) deltas + a running-sum
    window per domain. Cumulative distinct referring domains without a
    distinct-per-epoch re-scan: each (dst_host, src_host) pair contributes at
    its FIRST epoch, then the same running sum applies.

    Scale shape: two keyed shuffles (dst_host,epoch / dst_host,src_host) and
    one window partitioned by dst_host — no global window, nothing collects.
    authority/trust are the deterministic renderings of the reference's
    scoring bands (domain_analyzer_service.py spirit)."""
    per = edges.groupBy("dst_host", "epoch").agg(
        F.count("*").alias("_links"),
        F.sum(F.when(F.col("spam_level") != "clean", 1).otherwise(0)).alias("_spam"),
        F.max(ts_col).alias("snapshot_ts"),
    )
    firsts = (
        edges.groupBy("dst_host", "src_host")
        .agg(F.min("epoch").alias("epoch"))
        .groupBy("dst_host", "epoch")
        .agg(F.count("*").alias("_new_refs"))
    )
    j = per.join(firsts, ["dst_host", "epoch"], "left").na.fill({"_new_refs": 0})
    w = (
        Window.partitionBy("dst_host")
        .orderBy("epoch")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_links = F.sum("_links").over(w)
    cum_refs = F.sum("_new_refs").over(w)
    spam = F.round(F.sum("_spam").over(w) * 100.0 / cum_links, 4)
    return j.select(
        F.col("dst_host").alias("domain"),
        "epoch",
        "snapshot_ts",
        cum_links.alias("total_backlinks"),
        cum_refs.alias("referring_domains"),
        spam.alias("spam_score"),
        F.least(F.lit(100.0), cum_refs * 10.0).cast("double").alias("authority_score"),
        F.greatest(F.lit(0.0), F.lit(100.0) - spam).cast("double").alias("trust_score"),
        F.col("snapshot_ts").alias("last_fetched_at"),
    )


def domain_history_latest(
    history: DataFrame,
    n: int = 1,
    domain_col: str = "domain",
    ts_col: str = "snapshot_ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """database.py:511-513: the latest n snapshots per domain."""
    return latest_n_per_key(history, [domain_col], ts_col, n, tiebreak=tiebreak)
