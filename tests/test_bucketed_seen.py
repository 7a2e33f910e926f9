"""Bucketed seen-table: correctness of append/anti-join AND the scale
property — the accumulated side joins without an Exchange (only the wave
side shuffles into the bucketing)."""

import re

import pyspark.sql.functions as F

from link_profiler_repo_spark.plans import physical_plan
from link_profiler_repo_spark.sources.bucketed import BucketedSeenTable


def _urls(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
        F.concat(F.lit("http://h.test/p/"), F.col("id").cast("string")).alias("url"),
    )


def test_bucketed_seen_correct_and_shuffle_free(spark):
    t = BucketedSeenTable(spark, name="seen_b_test", buckets=8)
    try:
        t.init(_urls(spark, 0, 1000))
        t.append(_urls(spark, 1000, 1500))
        assert t.df().count() == 1500

        candidates = _urls(spark, 1200, 2000)  # 300 dup, 500 new
        survivors = t.anti_join(candidates)
        assert survivors.count() == 500

        # at real scale the seen side is far beyond broadcast; force the
        # shuffle path to verify the bucketed layout joins without moving
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            plan = physical_plan(t.anti_join(candidates))
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_ex == 1, f"expected 1 exchange (candidates only), got {n_ex}:\n{plan[:1500]}"
        assert "seen_b_test" in plan
    finally:
        t.drop()


def test_cobucketed_schedule_epoch_exchange_free_join_and_exact(spark, tmp_path):
    """The bench kernel's co-bucketed fast path: frontier and seen stored
    bucket(N, url_hash) — the anti-join must plan with ZERO Exchange (both
    sides co-located); the only shuffles left are the two politeness-window
    passes. Result must equal the unbucketed kernel exactly."""
    from link_profiler_repo_spark.operators.frontier import schedule_epoch
    from link_profiler_repo_spark.sources.bucketed import register_external_bucketed

    def synth(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("http://h"), (F.col("id") % 13).cast("string"), F.lit(".test/p/"),
                     F.col("id").cast("string")).alias("url"),
            F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
            F.concat(F.lit("h"), (F.col("id") % 13).cast("string"), F.lit(".test")).alias("host"),
            (F.col("id") % 4 + 1).cast("int").alias("priority"),
            F.col("id").alias("arrival_seq"),
        )

    floc, sloc = str(tmp_path / "fb"), str(tmp_path / "sb")
    frontier_raw, seen_raw = synth(0, 3000), synth(0, 1100).select("url_hash")
    for name, df, loc in (("t_fb", frontier_raw, floc), ("t_sb", seen_raw, sloc)):
        df.write.bucketBy(8, "url_hash").sortBy("url_hash").option("path", loc).mode(
            "overwrite"
        ).saveAsTable(f"{name}_gen")
    try:
        fb = register_external_bucketed(spark, "t_frontier", floc, frontier_raw, buckets=8)
        sb = register_external_bucketed(spark, "t_seen", sloc, seen_raw, buckets=8)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            wave = schedule_epoch(fb, sb, host_budget=2, co_bucketed=True)
            plan = physical_plan(wave)
            got = {
                (r["url"], int(r["rank"])) for r in wave.collect()
            }
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # the join section (before the first window) must not Exchange:
        # total exchanges == the two window passes only
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_ex == 2, f"expected 2 exchanges (window passes only), got {n_ex}"
        expected = {
            (r["url"], int(r["rank"]))
            for r in schedule_epoch(frontier_raw, seen_raw, host_budget=2).collect()
        }
        assert got == expected
    finally:
        for t in ("t_frontier", "t_seen", "t_fb_gen", "t_sb_gen"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
