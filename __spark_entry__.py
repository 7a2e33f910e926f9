"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship — a full BFS frontier crawl over a deterministic
synthetic interleaved-span corpus (the engine's native input shape,
BASELINE.json input_hint), returning the crawl-order table.

queries()/oracle_sql(): one entry per implemented operator class from
SURVEY.md §2 over the harness parquet tables; SQL oracles run in DuckDB.
UDF-native operators (MinHash/CDC hashing, IVF assignment, crawl engines)
export their intermediate tables to parquet inside the query so DuckDB
re-derives the relational tail from the same bytes; the crawl-ordering rows
export the Python reference simulator's order table the same way. The single
rows-only entry is media_features, and only because it INCLUDES the lossy
jpeg tier: PNG, GIF, JPEG images, WAV audio, and Y4M video all decode for
real (pure zlib+numpy, LZW+palette, baseline-DCT, RIFF-PCM, and raw-plane
codecs), the non-decode half is the SQL-oracled media_meta row, and the
lossless decode path itself is the SQL-oracled media_decode row (DuckDB
re-derives the decoded bytes from its own sha256 of the ground-truth
stream, touching no engine codec code); jpeg's decoded pixels are not
ground-truth-equal by design and carry PSNR/determinism pytest bounds.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BFS crawl (ordering-exact mode) over synthetic docs; returns
    (crawl_order, url, depth). Driver checks rows>0 and a stable schema."""
    from link_profiler_repo_spark.queries import q_crawl_bfs_order

    return q_crawl_bfs_order(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from link_profiler_repo_spark.queries import ROWS_ONLY_QUERIES, SPARK_QUERIES

    out: dict[str, Callable] = {}
    out.update(SPARK_QUERIES)
    out.update(ROWS_ONLY_QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    from link_profiler_repo_spark.queries import SQL_ORACLES

    return dict(SQL_ORACLES)
