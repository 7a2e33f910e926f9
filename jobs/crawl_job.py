#!/usr/bin/env python
"""spark-submit entry point (north_rule: runs via spark-submit --py-files).

Package the engine and launch a crawl:

    cd /root/repo && zip -qr /tmp/engine.zip link_profiler_repo_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/crawl_job.py --mode bfs --n-docs 5000 --max-pages 500 \
        --workdir /tmp/crawl_state

On a cluster: same command with --master yarn/k8s and executor sizing; the
engine code has no local-mode assumptions (the session factory's local-only
tunings are skipped when a master is provided externally).
"""

from __future__ import annotations

import argparse
import json
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["bfs", "scheduler"], default="bfs")
    ap.add_argument("--docs", help="parquet path of docs(doc_id, spans); synthesized if omitted")
    ap.add_argument("--n-docs", type=int, default=5000)
    ap.add_argument("--n-hosts", type=int, default=50)
    ap.add_argument("--seeds", type=int, default=8, help="number of synthetic seeds")
    ap.add_argument("--max-depth", type=int, default=3)
    ap.add_argument("--max-pages", type=int, default=1000)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--resume", action="store_true")
    ap.add_argument("--job-id", default="job-0")
    ap.add_argument(
        "--docs-layout", choices=["inmem", "bucketed"], default="inmem",
        help="'bucketed' persists the corpus once as a bucketBy(doc_id) "
        "table so per-epoch fetch joins exchange only the wave (the "
        "10^10-corpus layout); 'inmem' keeps the corpus as a cached "
        "DataFrame and picks broadcast vs shuffle per wave",
    )
    ap.add_argument("--docs-buckets", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from link_profiler_repo_spark.config import CrawlConfig
    from link_profiler_repo_spark.operators.crawl import CrawlEngine
    from link_profiler_repo_spark.sources.readers import docs_source
    from link_profiler_repo_spark.synth import SynthParams, default_seeds, robots_spark, synth_docs_spark

    spark = SparkSession.builder.appName(f"spark-frontier-{args.job_id}").getOrCreate()
    p = SynthParams(n_docs=args.n_docs, n_hosts=args.n_hosts)
    docs = docs_source(spark, args.docs) if args.docs else synth_docs_spark(spark, p)
    cfg = CrawlConfig(job_id=args.job_id, max_depth=args.max_depth, max_pages=args.max_pages)
    eng = CrawlEngine(
        spark, cfg, docs.persist(), args.workdir, synth_params=p,
        robots_df=robots_spark(spark, p),
        docs_layout=args.docs_layout, docs_buckets=args.docs_buckets,
    )
    seeds = [u for _, u, _ in default_seeds(p, args.seeds)]
    out = eng.run_bfs(seeds, resume=args.resume) if args.mode == "bfs" else eng.run_scheduler(seeds, resume=args.resume)
    st = out["stats"]
    print(json.dumps({
        "job_id": args.job_id, "mode": args.mode, "epochs": st.epochs,
        "crawled": st.crawled, "scheduled": st.scheduled,
        "seconds": round(st.wall_seconds, 2),
    }))


if __name__ == "__main__":
    sys.exit(main())
