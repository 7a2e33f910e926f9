"""Plan-property tests: lock in the physical-plan shapes that matter at scale
(explain('formatted') review, automated)."""

import os

import pyspark.sql.functions as F

from link_profiler_repo_spark.operators.frontier import per_host_topk, schedule_epoch
from link_profiler_repo_spark.operators.profile import full_link_profile, link_profiles
from link_profiler_repo_spark.plans import (
    assert_no_single_partition_exchange,
    has_broadcast_join,
    physical_plan,
    pushed_filters,
    read_schema_columns,
)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


def test_filter_and_projection_pushed_to_scan(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    q = li.filter(F.col("l_quantity") > 30).select("l_orderkey", "l_quantity")
    pf = pushed_filters(q)
    assert any("l_quantity" in f for f in pf), f"filter not pushed: {pf}"
    cols = read_schema_columns(q)[0]
    assert cols == {"l_orderkey", "l_quantity"}, f"scan reads too much: {cols}"


def test_enrich_join_broadcasts_dims(spark):
    from link_profiler_repo_spark.queries import q_enrich_join

    assert has_broadcast_join(q_enrich_join(spark, SF_DIR))


def test_profile_rollup_has_no_global_window(spark):
    edges = spark.createDataFrame(
        [("s", "t", "sh", "th", "a", "dofollow", [], "ctx", 0, 1, 1)],
        schema="src string, dst string, src_host string, dst_host string,"
        "anchor_text string, link_type string, rel array<string>, context_text string,"
        "pos int, depth int, epoch int",
    )
    assert_no_single_partition_exchange(link_profiles(edges))
    assert_no_single_partition_exchange(full_link_profile(edges))


def test_frontier_kernel_has_no_global_window(spark):
    frontier = spark.range(100).select(
        F.concat(F.lit("http://h"), (F.col("id") % 5).cast("string"), F.lit(".test/p")).alias("url"),
        F.sha2(F.col("id").cast("string"), 256).alias("url_hash"),
        F.concat(F.lit("h"), (F.col("id") % 5).cast("string")).alias("host"),
        (F.col("id") % 3).cast("int").alias("priority"),
        F.col("id").alias("arrival_seq"),
    )
    seen = frontier.filter(F.col("arrival_seq") < 10).select("url_hash")
    wave = schedule_epoch(frontier, seen)
    assert_no_single_partition_exchange(wave)
    # the politeness rank shuffles on (hash(host), host, salt) — never on a
    # single partition — and the anti-join is hash-partitioned
    plan = physical_plan(wave)
    assert "Window" in plan


def test_salted_topk_equals_naive_window(spark):
    from pyspark.sql import Window

    frontier = spark.range(500).select(
        F.concat(F.lit("u"), F.col("id").cast("string")).alias("url"),
        # heavy skew: 60% of rows on one host
        F.when(F.col("id") % 5 < 3, "hot.test").otherwise(
            F.concat(F.lit("h"), (F.col("id") % 7).cast("string"), F.lit(".test"))
        ).alias("host"),
        (F.col("id") % 4).cast("int").alias("priority"),
        F.col("id").alias("arrival_seq"),
    )
    salted = {
        (r["host"], r["rank"], r["url"])
        for r in per_host_topk(frontier, F.lit(3), n_salt=8).collect()
    }
    w = Window.partitionBy("host").orderBy("priority", "arrival_seq")
    naive = {
        (r["host"], r["rank"], r["url"])
        for r in frontier.withColumn("rank", F.row_number().over(w) - 1)
        .filter(F.col("rank") < 3)
        .collect()
    }
    assert salted == naive


def test_small_path_global_index_fans_back_out(spark):
    """Regression: the small (single-partition window) path of
    with_global_index must NOT return a 1-partition DataFrame — that would
    serialize every downstream stage of the epoch (measured 2.2x end-to-end).
    The distributed and small paths must also agree on the index values."""
    from link_profiler_repo_spark.operators.order import unpersist_all, with_global_index

    df = spark.range(0, 5000).selectExpr("id", "id % 7 AS k")
    small, n_small = with_global_index(df, ["id"], "idx", small=True)
    assert n_small == 5000
    assert small.rdd.getNumPartitions() > 1
    dist, n_dist = with_global_index(df, ["id"], "idx")
    assert n_dist == 5000
    assert sorted((r["id"], r["idx"]) for r in small.collect()) == sorted(
        (r["id"], r["idx"]) for r in dist.collect()
    )
    unpersist_all()


def test_per_host_topk_rank_pushdown(spark):
    """The politeness window's row_number()<=k filter must plan as
    WindowGroupLimit with a Partial mode BEFORE the exchange (Spark's
    rank-based filter pushdown): each map task then ships only its local
    top-k per (host, salt) group, so the window shuffle is O(hosts x salt
    x k) regardless of frontier size — measured 147MB constant from 32M to
    64M input rows. A regression here reintroduces a full-frontier shuffle."""
    df = spark.range(2_000_000).select(
        F.concat(F.lit("http://h"), (F.col("id") % 50).cast("string"), F.lit(".test/p/"),
                 F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 50).cast("string"), F.lit(".test")).alias("host"),
        (F.pmod(F.col("id"), 4) + 1).cast("int").alias("priority"),
        F.col("id").alias("arrival_seq"),
    )
    plan = physical_plan(per_host_topk(df, F.lit(2), n_salt=8), mode="simple")
    assert "WindowGroupLimit" in plan, f"rank pushdown missing:\n{plan[:2000]}"
    import re

    partials = re.findall(r"WindowGroupLimit.*Partial", plan)
    assert partials, f"no Partial-mode WindowGroupLimit before the exchange:\n{plan[:2000]}"


def test_bucketed_docs_fetch_join_exchanges_only_the_wave(spark):
    """docs_layout='bucketed' scale contract: the per-epoch fetch join must
    read the corpus co-located and pre-sorted — exactly ONE shuffle Exchange
    (the wave side) and at most one Sort (the wave side; the bucketed scan's
    sortBy order covers the corpus side)."""
    from link_profiler_repo_spark.sources.bucketed import BucketedSeenTable
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

    p = SynthParams(n_docs=200, n_hosts=6)
    t = BucketedSeenTable(spark, name="docs_plan_test", buckets=8, key="doc_id")
    t.init(synth_docs_spark(spark, p))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        wave = spark.range(0, 50).select(
            F.concat(F.lit("http://h000.test/p/"), F.col("id")).alias("url")
        )
        j = wave.join(t.df(), F.col("url") == F.col("doc_id"), "left")
        plan = physical_plan(j)
        n_shuffle_ex = plan.count("+- Exchange") + plan.count(":- Exchange")
        assert n_shuffle_ex == 1, plan
        n_sort = plan.count("+- Sort") + plan.count(":- Sort")
        assert n_sort <= 1, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        t.drop()


def test_prune_trapped_rank_pushdown(spark):
    """prune_trapped's rank()<=cap must also plan as a Partial-mode
    WindowGroupLimit (the trapped branch windows on exactly the skewed
    template key; only each map task's local top-cap rows may reach the
    exchange) and the flagged-template join must be a broadcast."""
    from link_profiler_repo_spark.operators.frontier import prune_trapped

    df = spark.range(500_000).select(
        F.concat(
            F.lit("https://t"), (F.col("id") % 3).cast("string"),
            F.lit(".test/cal/"), F.col("id").cast("string"),
        ).alias("url")
    )
    plan = physical_plan(prune_trapped(df, min_urls=100, cap=5), mode="simple")
    import re

    assert re.search(r"WindowGroupLimit.*Partial", plan), plan[:2000]
    assert "BroadcastHashJoin" in plan, plan[:2000]
