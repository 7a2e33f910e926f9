"""Link-profile rollups — the reference's per-target aggregate
(create_link_profile_from_backlinks, core/models.py:449-491) as one
shuffle-once groupBy over the edge table.

Spark shape: partial+final hash aggregation (map-side combine) on dst; the
top-10 histograms use sort_array(collect_list(struct(cnt,key))) inside a
second keyed aggregation rather than a global window, so no single-partition
stage exists anywhere. count_distinct(src_host) is exact (profile contract),
approx_count_distinct is used only in monitoring stats (A13,
monitoring/crawler_metrics.py:158)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def link_profiles(edges: DataFrame) -> DataFrame:
    """Per-target rollup (A1/A3): total, per-type counts, distinct referring
    hosts. Input: EDGES schema; output one row per dst."""
    t = F.col("link_type")
    return edges.groupBy(F.col("dst").alias("target_url")).agg(
        F.count("*").alias("total_backlinks"),
        F.count_distinct("src_host").alias("unique_referring_domains"),
        F.sum(F.when(t == "dofollow", 1).otherwise(0)).alias("dofollow_backlinks"),
        F.sum(F.when(t == "nofollow", 1).otherwise(0)).alias("nofollow_backlinks"),
        F.sum(F.when(t == "sponsored", 1).otherwise(0)).alias("sponsored_backlinks"),
        F.sum(F.when(t == "ugc", 1).otherwise(0)).alias("ugc_backlinks"),
        F.sum(F.when(t == "canonical", 1).otherwise(0)).alias("canonical_backlinks"),
        # Backlink.context_text surface (core/models.py:350): deterministic
        # sample (lexicographic max of non-empty contexts) per target
        F.max(F.when(F.col("context_text") != "", F.col("context_text"))).alias(
            "sample_context_text"
        ),
    )


def top_k_per_target(edges: DataFrame, key_col: str, k: int = 10, out_prefix: str = "top") -> DataFrame:
    """Top-k histogram per dst (A2: top-10 anchor texts / referring domains,
    core/models.py:481,489). Two keyed aggregations, no global window:
    count per (dst,key) then per-dst sort_array(collect_list)+slice.
    Ties broken by key ascending (deterministic; the reference's dict/sort
    order on ties is unspecified, so we pin one)."""
    counted = edges.groupBy("dst", key_col).agg(F.count("*").alias("cnt"))
    packed = counted.groupBy("dst").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(F.col("cnt"), F.col(key_col).alias("k"))),
                asc=False,
            ),
            1,
            k,
        ).alias("_top")
    )
    return packed.select(
        F.col("dst").alias("target_url"),
        F.map_from_entries(
            F.transform("_top", lambda s: F.struct(s["k"].alias("key"), s["cnt"].alias("value")))
        ).alias(f"{out_prefix}_{key_col}"),
    )


def full_link_profile(edges: DataFrame, k: int = 10) -> DataFrame:
    """A1+A2 combined: rollup plus top-k anchors and referring domains."""
    base = link_profiles(edges)
    anchors = top_k_per_target(edges, "anchor_text", k)
    domains = top_k_per_target(edges, "src_host", k)
    return (
        base.join(anchors, "target_url", "left")
        .join(domains, "target_url", "left")
    )


def referring_domain_map(edges: DataFrame) -> DataFrame:
    """A4 (database/database.py:537-551): dst_host -> set of src_hosts."""
    return edges.groupBy(F.col("dst_host")).agg(
        F.array_sort(F.collect_set("src_host")).alias("referring_domains")
    )
