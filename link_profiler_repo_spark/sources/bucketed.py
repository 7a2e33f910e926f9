"""Bucketed seen-table — the 10^10-scale layout for the URL-seen set.

The accumulated `seen` table is the one state that grows without bound
(10^10 rows at the design point). Anti-joining each wave against it must NOT
re-shuffle the big side every epoch. Solution (the Iceberg equivalent is
`bucket(N, url_hash)` partition transform + storage-partitioned join):

  - persist `seen` as a bucketBy(N, url_hash) managed table;
  - per-epoch appends via insertInto keep the bucket layout;
  - the anti-join then shuffles ONLY the wave side (candidates) into the
    bucketing; the seen side reads co-located, no Exchange.

Verified by plan assertion in tests (exactly one Exchange, on the candidate
side) — the difference between O(wave) and O(|seen|) network per epoch.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


class BucketedSeenTable:
    """Bucketed state table; `key` defaults to the seen-set's url_hash, and
    the same layout serves any key-clustered big side of a per-epoch join
    (e.g. the docs corpus bucketed on doc_id for the fetch join)."""

    def __init__(
        self,
        spark: SparkSession,
        name: str = "seen_bucketed",
        buckets: int = 64,
        key: str = "url_hash",
    ):
        self.spark = spark
        self.name = name
        self.buckets = buckets
        self.key = key

    def exists(self) -> bool:
        return self.spark.catalog.tableExists(self.name)

    def init(self, seen: DataFrame) -> None:
        (
            seen.write.mode("overwrite")
            .bucketBy(self.buckets, self.key)
            .sortBy(self.key)
            .format("parquet")
            .saveAsTable(self.name)
        )

    def append(self, delta: DataFrame) -> None:
        # insertInto preserves the table's bucket spec (each append writes
        # its own bucket files; compaction folds them periodically)
        delta.write.mode("append").format("parquet").insertInto(self.name)

    def df(self) -> DataFrame:
        return self.spark.table(self.name)

    def anti_join(self, candidates: DataFrame) -> DataFrame:
        """candidates minus seen, on this table's own bucket key (a caller-
        supplied key different from the bucket column would defeat the
        bucketed-scan plan anyway); only the candidate side shuffles."""
        return candidates.join(self.df().select(self.key), on=self.key, how="left_anti")

    def drop(self) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {self.name}")


def register_external_bucketed(
    spark: SparkSession,
    name: str,
    location: str,
    schema_source: DataFrame,
    bucket_col: str = "url_hash",
    buckets: int = 32,
) -> DataFrame:
    """Register an EXTERNAL bucketed+sorted parquet table over an existing
    location (the local-metastore rendering of attaching an Iceberg table
    whose partition spec is bucket(N, url_hash)): the bucket metadata lives in
    the catalog, so a fresh session — e.g. each bench subprocess — can reuse
    previously written bucket files with zero-Exchange joins on the bucket
    key. The data at `location` must have been written with an identical
    bucketBy(buckets, bucket_col).sortBy(bucket_col) spec."""
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema_source.schema.fields
    )
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    spark.sql(
        f"""CREATE TABLE {name} ({cols}) USING PARQUET
            CLUSTERED BY ({bucket_col}) SORTED BY ({bucket_col}) INTO {buckets} BUCKETS
            LOCATION '{location}'"""
    )
    return spark.table(name)
