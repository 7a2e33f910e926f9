#!/usr/bin/env python
"""Variant profiler: single-file-per-bucket input + legacy sorted bucketed
scan (no in-task Sort before the SMJ anti-join). Usage: profile_frontier2.py <cores>"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main():
    cores = int(sys.argv[1])
    from link_profiler_repo_spark.operators.frontier import schedule_epoch
    from link_profiler_repo_spark.session import get_spark
    from link_profiler_repo_spark.sources.bucketed import register_external_bucketed

    spark = get_spark(
        app=f"profile2-{cores}", cores=cores, shuffle_partitions=32,
        extra={"spark.sql.legacy.bucketedTableScan.outputOrdering": "true"},
    )
    f = register_external_bucketed(
        spark, "bf1x", "/dev/shm/bench1f/frontier", spark.read.parquet("/dev/shm/bench1f/frontier")
    )
    s = register_external_bucketed(
        spark, "bs1x", "/dev/shm/bench1f/seen", spark.read.parquet("/dev/shm/bench1f/seen")
    )

    def force(df):
        df.write.format("noop").mode("overwrite").save()

    force(schedule_epoch(f.limit(10_000), s.limit(10_000), co_bucketed=True))
    t = {}
    t0 = time.monotonic()
    force(f.join(s.select("url_hash"), "url_hash", "left_anti"))
    t["anti_join"] = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    force(schedule_epoch(f, s, host_budget=2, n_salt=32, co_bucketed=True))
    t["full"] = round(time.monotonic() - t0, 2)
    print(json.dumps({"cores": cores, **t}))


if __name__ == "__main__":
    main()
