#!/usr/bin/env python
"""Phase-level profiling of the frontier bench kernel at one parallelism
level: anti-join alone, window pass 1 alone (no dedup), and the full kernel.
Usage: profile_frontier.py <cores> [shuffle_partitions]"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main():
    cores = int(sys.argv[1])
    parts = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from bench import BENCH_BUCKETS, ensure_frontier_input
    from link_profiler_repo_spark.operators.frontier import per_host_topk, schedule_epoch
    from link_profiler_repo_spark.session import get_spark
    from link_profiler_repo_spark.sources.bucketed import register_external_bucketed

    spark = get_spark(app=f"profile-{cores}", cores=cores, shuffle_partitions=parts)
    fdir, sdir = ensure_frontier_input(spark)
    frontier = register_external_bucketed(
        spark, "bench_frontier", fdir, spark.read.parquet(fdir), buckets=BENCH_BUCKETS
    )
    seen = register_external_bucketed(
        spark, "bench_seen", sdir, spark.read.parquet(sdir), buckets=BENCH_BUCKETS
    )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    # warm
    force(schedule_epoch(frontier.limit(10_000), seen.limit(10_000), co_bucketed=True))

    t: dict[str, float] = {}

    t0 = time.monotonic()
    force(frontier.select("url_hash", "host"))
    t["scan_frontier"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    force(frontier.join(seen.select("url_hash"), "url_hash", "left_anti"))
    t["anti_join"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    force(per_host_topk(frontier, F.lit(2), n_salt=32))
    t["window_only"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    force(schedule_epoch(frontier, seen, host_budget=2, n_salt=32, co_bucketed=True))
    t["full"] = round(time.monotonic() - t0, 2)

    print(json.dumps({"cores": cores, "parts": parts, **t}))


if __name__ == "__main__":
    main()
