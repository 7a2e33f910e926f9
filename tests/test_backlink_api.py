"""Backlink-API recorded-response source (SURVEY S5): schema-on-read
fixtures mirroring SimulatedBacklinkAPIClient shapes
(backlink_service.py:49-141), normalization to the edge-merge shape,
newest-wins ingestion, and the EDGES_STORED adapter."""

import pyspark.sql.functions as F

from link_profiler_repo_spark.schemas import EDGES_STORED
from link_profiler_repo_spark.sources.backlink_api import (
    api_backlink_edges,
    as_stored_edges,
    merge_api_backlinks,
    read_backlink_api,
    synth_backlink_responses,
)


def _write(spark, tmp_path, name, **kw):
    path = str(tmp_path / name)
    synth_backlink_responses(spark, **kw).coalesce(1).write.mode("overwrite").json(path)
    return path


def test_schema_on_read_roundtrip(spark, tmp_path):
    p = _write(spark, tmp_path, "b1", n_targets=4, per_target=6)
    df = read_backlink_api(spark, p)
    assert df.count() == 24
    r = df.filter(F.col("target_url") == "http://t0.example/").collect()
    assert len(r) == 6
    assert all(x["source_url"].startswith("http://source") for x in r)
    assert all(0.1 <= x["authority_passed"] <= 1.0 for x in r)
    # reference enum values only (core/models.py:31-40 + quality-gate levels)
    types = {x["link_type"] for x in df.collect()}
    assert types <= {
        "dofollow", "nofollow", "ugc", "sponsored", "internal",
        "external", "broken", "canonical", "redirect",
    }


def test_merge_newest_wins(spark, tmp_path):
    p1 = _write(spark, tmp_path, "b1", n_targets=6, per_target=8, base_date="2024-01-01")
    p2 = _write(
        spark, tmp_path, "b2",
        n_targets=3, per_target=8, base_date="2024-03-01", anchor_salt=" v2",
    )
    stored = api_backlink_edges(read_backlink_api(spark, p1))
    batch = api_backlink_edges(read_backlink_api(spark, p2))
    merged = merge_api_backlinks(stored, batch)
    # all 48 distinct (src, dst) pairs survive; the 24 re-recorded ones carry
    # the March last_seen and the ' v2' anchors
    assert merged.count() == 48
    v2 = merged.filter(F.col("anchor_text").endswith(" v2"))
    assert v2.count() == 24
    assert v2.filter(F.col("last_seen") < "2024-03-01").count() == 0
    old = merged.filter(~F.col("anchor_text").endswith(" v2"))
    assert old.count() == 24
    assert old.filter(F.col("dst") < "http://t3").count() == 0  # t0-t2 replaced


def test_as_stored_edges_unions_with_crawl_edges(spark, tmp_path):
    p1 = _write(spark, tmp_path, "b1", n_targets=2, per_target=3)
    api = as_stored_edges(api_backlink_edges(read_backlink_api(spark, p1)))
    assert [f.name for f in api.schema.fields] == [f.name for f in EDGES_STORED.fields]
    crawl = spark.createDataFrame([], EDGES_STORED)
    both = crawl.unionByName(api, allowMissingColumns=False)
    assert both.count() == 6
