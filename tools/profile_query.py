#!/usr/bin/env python
"""Per-job/stage breakdown of one gate query (guide §1: empirical loop).

Runs the named queries once (cold, like the driver's bench) in a fresh
session with the Spark event log on, then prints every job's wall time,
stage task counts, and total task time. NOT part of the driver contract.

Usage: python tools/profile_query.py semdedup [more ...]
       PROFILE_WARM=1 python tools/profile_query.py semdedup   # 2nd run too
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    names = sys.argv[1:]
    from link_profiler_repo_spark.queries import SPARK_QUERIES
    from link_profiler_repo_spark.session import get_spark

    evdir = tempfile.mkdtemp(prefix="profile_ev_")
    spark = get_spark(
        app="profile_query", cores=CPUS, shuffle_partitions=CPUS * 2,
        extra={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    import pyspark.sql.functions as F

    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000).count()
    spark.range(1_000_000).select(F.sum("id")).collect()

    marks = []
    runs = 2 if os.environ.get("PROFILE_WARM") else 1
    for name in names:
        for i in range(runs):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.time() * 1000
            tw = time.monotonic()
            SPARK_QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            marks.append((f"{name} [{i}]", t0, round(time.monotonic() - tw, 2)))
    spark.sparkContext.setJobDescription(None)
    spark.stop()

    # parse the single event-log file
    evfiles = []
    for root, _dirs, files in os.walk(evdir):
        evfiles.extend(
            os.path.join(root, f) for f in files if not f.startswith("appstatus")
        )
    jobs: dict[int, dict] = {}
    stage_info: dict[int, dict] = {}
    for path in evfiles:
        for line in open(path):
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "desc": ev.get("Properties", {}).get(
                        "spark.job.description", ""
                    ),
                    "start": ev["Submission Time"],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    "ntasks": sum(
                        s.get("Number of Tasks", 0)
                        for s in ev.get("Stage Infos", [])
                    ),
                }
            elif t == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "ntasks": si.get("Number of Tasks", 0),
                    "wall": (si.get("Completion Time", 0) - si.get("Submission Time", 0))
                    if si.get("Submission Time")
                    else None,
                }

    prev_end = None
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end is not None else 0.0
        prev_end = j["end"]
        print(
            f"job {jid:3d}  {dur:7.2f}s  gap={gap:6.2f}s  "
            f"ntasks={j['ntasks']:5d}  {j['desc']}"
        )
        for sid in j["stages"]:
            si = stage_info.get(sid)
            if si and si["wall"] is not None:
                print(
                    f"    stage {sid:3d}  {si['wall'] / 1000.0:7.2f}s "
                    f"tasks={si['ntasks']:5d}  {si['name'][:90]}"
                )
    for desc, t0, wall in marks:
        print(f"query {desc}: {wall}s")
    import shutil

    shutil.rmtree(evdir, ignore_errors=True)


if __name__ == "__main__":
    main()
