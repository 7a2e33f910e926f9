#!/usr/bin/env python
"""Per-query measurement harness for the optimization round (guide §1).

NOT part of the driver contract — bench.py stays frozen. This tool:
  * times individual headline queries through the noop sink (guide §1.4),
    best-of-R with all samples reported;
  * dumps .explain("formatted") for each query to plans/r06/;
  * labels jobs with setJobDescription (guide §1.5).

Usage:
  python bench_extra.py time  [query ...]        # default: all headline
  python bench_extra.py plans [query ...]        # write plans/r06/<q>_current.txt
  BENCH_EXTRA_REPEATS=3 python bench_extra.py time tpch_q1
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "2"))

HEADLINE = [
    "tpch_q1", "enrich_join", "profile_rollup", "topk_per_group",
    "rolling_error_rate", "sessionization", "text_profile", "dedup_exact",
    "embedding_pairs", "similarity_topk", "repetition_profile",
    "incremental_profile", "corpus_build", "pii_scan", "c4_clean",
    "decontaminate", "corpus_build_clean", "lm_perplexity",
    "quality_classifier", "paragraph_dedup", "dsir_select",
    "exact_substr_dedup", "bm25_topk", "semdedup",
]


def _spark():
    from link_profiler_repo_spark.session import get_spark

    spark = get_spark(app="bench_extra", cores=CPUS, shuffle_partitions=CPUS * 2)
    import pyspark.sql.functions as F

    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").limit(1000).count()
    spark.range(1_000_000).select(F.sum("id")).collect()
    return spark


def minhash_stages(cores: int, reps: int = 2) -> dict:
    """Per-stage attribution of the MinHash kernel (VERDICT r05 #4): wall
    per stage at `cores`, best-of-reps, over the bench signature corpus.
    Stages: (sig) the signature UDF pass alone; (band) banding + candidate
    self-join from a PERSISTED signature table; (agree) the numpy agreement
    join from the same persisted table. Run this pinned (taskset) at 4 and
    16 cores and compare stage ratios."""
    import time as _t

    from bench import DEDUP_REP, ensure_dedup_docs
    from link_profiler_repo_spark.operators.dedup import (
        minhash_pairs_from_sigs,
        minhash_signatures,
    )
    from link_profiler_repo_spark.session import get_spark

    spark = get_spark(app=f"mh-stages-{cores}", cores=cores, shuffle_partitions=32)
    docs = spark.read.parquet(ensure_dedup_docs(spark, DEDUP_REP))
    docs.count()
    out = {"cores": cores, "n_docs": docs.count()}

    def best(label, mk):
        walls = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"mh {label}")
            t0 = _t.monotonic()
            mk().write.format("noop").mode("overwrite").save()
            walls.append(round(_t.monotonic() - t0, 2))
        out[label] = min(walls)
        out[f"{label}_samples"] = walls

    # warm the whole path once
    minhash_signatures(docs.limit(2000)).count()
    best("sig", lambda: minhash_signatures(docs))
    sig = minhash_signatures(docs).persist()
    sig.count()
    # candidates alone (banding + bucket self-join + distinct), no agree
    # kernel — the same subplan minhash_pairs_from_sigs builds internally
    import pyspark.sql.functions as F

    def _cand():
        s = sig.select(F.col("doc_id").alias("_id"), "sig")
        bands_df = s.select(
            "_id",
            F.posexplode(
                F.array(*[F.hash(F.slice("sig", i * 4 + 1, 4)) for i in range(32)])
            ).alias("band", "bucket"),
        )
        left, right = bands_df.alias("l"), bands_df.alias("r")
        return (
            left.join(
                right,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l._id") < F.col("r._id")),
            )
            .select(F.col("l._id").alias("a"), F.col("r._id").alias("b"))
            .distinct()
        )

    best("band+cand", _cand)
    best(
        "full(agree)",
        lambda: minhash_pairs_from_sigs(sig, threshold=0.7, agree_kernel="numpy"),
    )
    sig.unpersist()
    spark.stop()
    return out


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    if mode == "minhash-stages":
        print(json.dumps(minhash_stages(int(sys.argv[2]))))
        return
    names = sys.argv[2:] or HEADLINE
    from link_profiler_repo_spark.queries import SPARK_QUERIES

    spark = _spark()
    if mode == "plans":
        out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")
        os.makedirs(out_dir, exist_ok=True)
        from link_profiler_repo_spark.plans.inspect import physical_plan

        for name in names:
            df = SPARK_QUERIES[name](spark, SF_DIR)
            plan = physical_plan(df)
            path = os.path.join(out_dir, f"{name}_current.txt")
            with open(path, "w") as f:
                f.write(plan)
            print(f"wrote {path}")
        spark.stop()
        return

    results: dict[str, dict] = {}
    for name in names:
        samples = []
        for i in range(REPEATS):
            spark.sparkContext.setJobDescription(f"{name} [{i}]")
            t0 = time.monotonic()
            SPARK_QUERIES[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            samples.append(round(time.monotonic() - t0, 2))
        spark.sparkContext.setJobDescription(None)
        results[name] = {"best": min(samples), "samples": samples}
        print(json.dumps({name: results[name]}), flush=True)
    total = round(sum(r["best"] for r in results.values()), 2)
    print(json.dumps({"total_best": total, "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
