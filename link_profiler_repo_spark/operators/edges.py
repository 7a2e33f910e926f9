"""Edge-stream quality filtering and upsert sinks.

- filter_backlinks: P9 spam/quality gate (services/crawl_service.py:411-436):
  drop CONFIRMED_SPAM; LIKELY_SPAM when source spam_score > 40; SUSPICIOUS
  when spam_score > 70; and (when quality scoring enabled) drop sources with
  authority < 5.0. One broadcast join against domain metrics — replaces the
  reference's per-backlink N+1 lookups (crawl_service.py:638-654).

- merge_upsert: S8's ReplacingMergeTree semantics (clickhouse_loader.py
  ReplacingMergeTree + sort key) without Delta/Iceberg MERGE INTO: anti-join +
  union + newest-wins window — the guide's CDC emulation pattern. At cluster
  scale this IS Iceberg `MERGE INTO t USING s WHEN MATCHED AND s.ts > t.ts
  THEN UPDATE`; the plan shape (shuffle on the key, keep-latest window) is
  identical.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def filter_backlinks(
    edges: DataFrame,
    domains: DataFrame | None = None,
    spam_filtering: bool = True,
    quality_scoring: bool = False,
) -> DataFrame:
    """edges must carry spam_level (default 'clean'); domains(name,
    spam_score, authority_score) is broadcast when provided."""
    out = edges
    if "spam_level" not in out.columns:
        out = out.withColumn("spam_level", F.lit("clean"))
    if domains is not None:
        d = F.broadcast(
            domains.select(
                F.col("name").alias("_dn"),
                F.col("spam_score").alias("_spam"),
                F.col("authority_score").alias("_auth"),
            )
        )
        out = out.join(d, out["src_host"] == d["_dn"], "left")
    else:
        out = out.withColumn("_spam", F.lit(None).cast("double")).withColumn(
            "_auth", F.lit(None).cast("double")
        )
    if spam_filtering:
        spam = F.coalesce(F.col("_spam"), F.lit(0.0))
        out = out.filter(
            ~(
                (F.col("spam_level") == "confirmed_spam")
                | ((F.col("spam_level") == "likely_spam") & (spam > 40))
                | ((F.col("spam_level") == "suspicious") & (spam > 70))
            )
        )
    if quality_scoring:
        out = out.filter(F.coalesce(F.col("_auth"), F.lit(0.0)) >= 5.0)
    return out.drop("_dn", "_spam", "_auth")


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    version_col: str,
) -> DataFrame:
    """Newest-wins upsert: rows present in source replace target rows with an
    older version; unseen target rows pass through. One shuffle on the key."""
    merged = target.unionByName(source, allowMissingColumns=False)
    w = Window.partitionBy(*keys).orderBy(F.desc(version_col))
    return (
        merged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def export_json(df: DataFrame, path: str) -> None:
    """S10/S12 debug/export sink (services/crawl_service.py:454-455,
    utils/data_exporter.py)."""
    df.write.mode("overwrite").json(path)


def export_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", "true").csv(path)
