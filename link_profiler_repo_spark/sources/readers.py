"""Input sources.

- docs_source: the interleaved-span corpus from parquet/json (schema-enforced,
  never inferred — SURVEY §1.4), or synthesized (synth.synth_docs_spark).
- fetcher abstraction (S1): the engine's "fetch" is a join against the docs
  table plus a deterministic status column; fetch_http_stub documents the
  real-world shape — a mapInPandas batch fetcher — without performing IO in
  this sandbox (no network). Swapping stub -> aiohttp session per partition
  is the only change a live deployment needs; partitioning, batching, retry
  accounting and the result schema stay identical.
- seeds_source / robots_source: small dimension tables.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from ..schemas import DOCS, ROBOTS, SEEDS

FETCH_RESULT = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("final_url", T.StringType(), True),
        T.StructField("elapsed_ms", T.IntegerType(), True),
    ]
)


def docs_source(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "parquet":
        return spark.read.schema(DOCS).parquet(path)
    if fmt == "json":
        return spark.read.schema(DOCS).json(path)
    raise ValueError(f"unsupported docs format: {fmt}")


def seeds_source(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(SEEDS).parquet(path)


def robots_source(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(ROBOTS).parquet(path)


def fetch_http_stub(wave: DataFrame, timeout_s: float = 10.0) -> DataFrame:
    """The live-fetch operator shape (reference: crawlers/web_crawler.py
    _fetch_with_aiohttp :262-328): one async HTTP client per PARTITION, Arrow
    batches of URLs in, FETCH_RESULT rows out. Network IO is stubbed here
    (sandbox has no egress) — raises on use; the synthetic-join fetcher in
    operators/crawl.py is the test-scale implementation."""

    def run(batches):
        for pdf in batches:
            raise NotImplementedError(
                "live HTTP fetch requires network egress; deploy swaps this "
                "body for an aiohttp session reused across the partition"
            )
            yield pd.DataFrame()  # pragma: no cover

    return wave.select("url").mapInPandas(run, schema=FETCH_RESULT)
