#!/usr/bin/env python
"""spark-submit dispatcher for every registered job type — the deployment
rendering of the reference's execute_predefined_job string dispatch
(services/crawl_service.py:268-389): one entry point, --type selects the
runner, results print as one JSON line (row samples capped).

    cd /root/repo && zip -qr /tmp/engine.zip link_profiler_repo_spark
    spark-submit --master local[8] --py-files /tmp/engine.zip \
        jobs/run_job.py --type serp_analysis --keyword "fast table" \
        --sf-dir /root/testdata/sf0.01

Crawl-backed jobs (backlink_discovery, full_seo_audit) synthesize their
corpus like jobs/crawl_job.py; analytics jobs run over the harness parquet
tables at --sf-dir. On a cluster: same command with --master yarn/k8s.
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--type", required=True, dest="job_type")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--keyword", default="fast table")
    ap.add_argument("--seed-keyword", default="table")
    ap.add_argument("--num-results", type=int, default=10)
    ap.add_argument("--n-docs", type=int, default=2000)
    ap.add_argument("--n-hosts", type=int, default=20)
    ap.add_argument("--max-pages", type=int, default=200)
    ap.add_argument("--max-depth", type=int, default=3)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--job-id", default="job-0")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from link_profiler_repo_spark.config import CrawlConfig
    from link_profiler_repo_spark.jobs import JOB_TYPES, run_job
    from link_profiler_repo_spark.synth import SynthParams, default_seeds, synth_docs_spark

    if args.job_type not in JOB_TYPES:
        print(json.dumps({"error": f"unknown --type; known: {sorted(JOB_TYPES)}"}))
        return 2

    spark = SparkSession.builder.appName(f"job-{args.job_type}").getOrCreate()

    def read(name):
        return spark.read.parquet(f"{args.sf_dir}/{name}.parquet")

    out: dict = {"job_type": args.job_type, "job_id": args.job_id}
    if args.job_type in ("backlink_discovery", "full_seo_audit"):
        p = SynthParams(n_docs=args.n_docs, n_hosts=args.n_hosts)
        cfg = CrawlConfig(
            job_id=args.job_id, max_depth=args.max_depth, max_pages=args.max_pages
        )
        docs = synth_docs_spark(spark, p).persist()
        res = run_job(
            args.job_type, spark, docs, [u for _, u, _ in default_seeds(p, 4)], cfg,
            workdir=args.workdir or tempfile.mkdtemp(prefix="runjob_"), p=p,
        )
        st = res["stats"]
        out.update(crawled=st.crawled, scheduled=st.scheduled, epochs=st.epochs)
        # a crawl that yields no edges sets no profiles/history keys — emit 0
        # counts instead of KeyError (ADVICE r03)
        out["profiles"] = res["profiles"].count() if res.get("profiles") is not None else 0
        out["history_snapshots"] = res["history"].count() if res.get("history") is not None else 0
        if res.get("health") is not None:
            out["health_rows"] = res["health"].count()
    elif args.job_type == "serp_analysis":
        df = run_job(args.job_type, spark, read("documents"), args.keyword,
                     num_results=args.num_results)
        out["rows"] = [r.asDict() for r in df.collect()][: args.num_results]
    elif args.job_type == "keyword_research":
        df = run_job(args.job_type, spark, read("documents"), args.seed_keyword,
                     num_suggestions=args.num_results)
        out["rows"] = [r.asDict() for r in df.collect()][: args.num_results]
    else:
        print(json.dumps({
            "error": f"--type {args.job_type} needs crawl outputs; run it through "
            "backlink_discovery/full_seo_audit or the library API"
        }))
        return 2
    print(json.dumps(out, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
