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


def domain_history_latest(
    history: DataFrame,
    n: int = 1,
    domain_col: str = "domain",
    ts_col: str = "snapshot_ts",
    tiebreak: list[str] | None = None,
) -> DataFrame:
    """database.py:511-513: the latest n snapshots per domain."""
    return latest_n_per_key(history, [domain_col], ts_col, n, tiebreak=tiebreak)
