"""SparkSession factory tuned for the frontier engine.

Local-mode defaults mirror what we would set cluster-side via spark-submit:
AQE on (runtime re-plan + skew-join splitting), Arrow on (every custom operator
is a pandas/Arrow UDF), shuffle partitions sized to cores (local) — on a real
cluster this would be ~2-3x total executor cores and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# At 100 TB scale these same configs apply; only sizes change:
#   spark.sql.shuffle.partitions ~ 2-3x total cores, AQE coalesces;
#   spark.sql.files.maxPartitionBytes 128-256 MiB keeps scan tasks bounded.
_BASE_CONF = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # runtime bloom-filter join pruning: injects a bloom from the small join
    # side into the big side's scan (the frontier-wave vs docs fetch join)
    # (runtimeFilter.semiJoinReduction deadlocks jobs in this Spark build —
    # verified by bisection; bloom variant alone is safe)
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # oracle comparisons (DuckDB) are UTC-naive; pin the session TZ
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.files.maxPartitionBytes": "134217728",
    # pandas UDF batches: large enough to amortize Arrow transfer
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app: str = "spark-frontier",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    cores=None -> local[*]; shuffle partitions default to the core count so
    tiny local runs don't fan out 200 empty tasks (guide: set it ~cores local).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = f"local[{cores}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(4, cores)
    b = SparkSession.builder.appName(app).master(master)
    for k, v in _BASE_CONF.items():
        b = b.config(k, v)
    b = b.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    b = b.config("spark.default.parallelism", str(cores))
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
