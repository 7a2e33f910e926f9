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
