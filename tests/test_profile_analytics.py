"""Aggregation goldens (SURVEY §5.2-4): link-profile rollups and analytics
operators vs hand-computed expectations on a small edge fixture
(semantics: core/models.py:449-491, api/analytics.py, backlink_service.py)."""

import datetime as dt

import pyspark.sql.functions as F

from link_profiler_repo_spark.operators.analytics import (
    host_success_rate,
    link_intersect,
    link_velocity,
    queue_stats,
)
from link_profiler_repo_spark.operators.profile import (
    full_link_profile,
    link_profiles,
    referring_domain_map,
    top_k_per_target,
)

EDGES = [
    # src, dst, src_host, dst_host, anchor_text, link_type, rel, context_text, pos, depth, epoch
    ("http://a.test/1", "http://t.test/x", "a.test", "t.test", "hello", "dofollow", [], "see hello here", 0, 1, 1),
    ("http://a.test/2", "http://t.test/x", "a.test", "t.test", "hello", "nofollow", ["nofollow"], "", 0, 1, 1),
    ("http://b.test/1", "http://t.test/x", "b.test", "t.test", "world", "dofollow", [], "world ctx", 1, 2, 2),
    ("http://b.test/1", "http://t.test/y", "b.test", "t.test", "other", "sponsored", ["sponsored"], "", 2, 2, 2),
    ("http://c.test/1", "http://t.test/x", "c.test", "t.test", "hello", "ugc", ["ugc"], "", 0, 1, 1),
]
SCHEMA = (
    "src string, dst string, src_host string, dst_host string, anchor_text string,"
    "link_type string, rel array<string>, context_text string, pos int, depth int, epoch int"
)


def _edges(spark):
    return spark.createDataFrame(EDGES, schema=SCHEMA)


def test_link_profiles_golden(spark):
    rows = {r["target_url"]: r for r in link_profiles(_edges(spark)).collect()}
    x = rows["http://t.test/x"]
    assert x["total_backlinks"] == 4
    assert x["unique_referring_domains"] == 3
    assert x["dofollow_backlinks"] == 2
    assert x["nofollow_backlinks"] == 1
    assert x["ugc_backlinks"] == 1
    y = rows["http://t.test/y"]
    assert y["total_backlinks"] == 1 and y["sponsored_backlinks"] == 1


def test_top_k_anchors(spark):
    rows = {
        r["target_url"]: r["top_anchor_text"]
        for r in top_k_per_target(_edges(spark), "anchor_text", k=2).collect()
    }
    assert rows["http://t.test/x"] == {"hello": 3, "world": 1}


def test_full_profile_and_referring_map(spark):
    prof = {r["target_url"]: r for r in full_link_profile(_edges(spark)).collect()}
    assert prof["http://t.test/x"]["top_src_host"]["a.test"] == 2
    rm = {r["dst_host"]: r["referring_domains"] for r in referring_domain_map(_edges(spark)).collect()}
    assert rm["t.test"] == ["a.test", "b.test", "c.test"]


def test_link_velocity(spark):
    e = _edges(spark).withColumn(
        "discovered_at",
        F.to_timestamp(F.concat(F.lit("2024-01-0"), F.col("epoch").cast("string"))),
    )
    rows = {r["bucket"]: r["backlinks"] for r in link_velocity(e).collect()}
    assert rows[dt.datetime(2024, 1, 1)] == 3
    assert rows[dt.datetime(2024, 1, 2)] == 2


def test_link_intersect(spark):
    edges = spark.createDataFrame(
        [
            ("s1.test", "primary.test"),
            ("s1.test", "comp1.test"),
            ("s2.test", "primary.test"),
            ("s3.test", "comp1.test"),
            ("s4.test", "primary.test"),
            ("s4.test", "comp2.test"),
        ],
        schema="src_host string, dst_host string",
    )
    rows = {r["src_host"]: r["shared_with"] for r in link_intersect(edges, "primary.test", ["comp1.test", "comp2.test"]).collect()}
    # s1 links primary+comp1; s4 links primary+comp2; s2 only primary; s3 only comp1
    assert rows == {"s1.test": ["comp1.test"], "s4.test": ["comp2.test"]}


def test_queue_stats_and_success_rate(spark):
    frontier = spark.createDataFrame(
        [("u1", "h1", 0, 1), ("u2", "h1", 1, 2), ("u3", "h2", 0, 1)],
        schema="url string, host string, depth int, priority int",
    )
    s = queue_stats(frontier).collect()[0]
    assert s["queued_tasks"] == 3 and s["max_depth"] == 1

    log = spark.createDataFrame(
        [("h1", 1, 200), ("h1", 2, 500), ("h1", 3, 200), ("h2", 1, 404)],
        schema="host string, ts int, status_code int",
    )
    rates = {
        (r["host"], r["ts"]): r["success_rate"]
        for r in host_success_rate(log, window_rows=2).collect()
    }
    assert rates[("h1", 1)] == 1.0
    assert rates[("h1", 2)] == 0.5
    assert rates[("h1", 3)] == 0.5
    assert rates[("h2", 1)] == 0.0


def test_keyword_gap_golden(spark):
    """J6 keyword-gap semantics (core/models.py:624-644) on a constructed
    fixture: per-competitor common/gap plus primary-unique."""
    from link_profiler_repo_spark.operators.keywords import keyword_gap

    rows = [
        ("p", "alpha"), ("p", "beta"), ("p", "gamma"),
        ("c1", "alpha"), ("c1", "delta"),
        ("c2", "beta"), ("c2", "alpha"), ("c2", "epsilon"),
    ]
    df = spark.createDataFrame(rows, schema="domain string, keyword string")
    got = {
        (r["domain"], r["keyword"], r["category"])
        for r in keyword_gap(df, primary="p").collect()
    }
    assert got == {
        ("c1", "alpha", "common"),
        ("c2", "alpha", "common"),
        ("c2", "beta", "common"),
        ("c1", "delta", "gap"),
        ("c2", "epsilon", "gap"),
        ("p", "gamma", "primary_unique"),
    }


def test_domain_history_producer_and_latest(spark):
    """DomainHistory producer (core/models.py:740-762) from the edge log,
    consumed by W6 latest-N: cumulative totals, first-epoch referring-domain
    accounting, spam share; latest row per domain is the newest snapshot."""
    import pyspark.sql.functions as F

    from link_profiler_repo_spark.operators.history import (
        domain_history_from_edges,
        domain_history_latest,
    )

    rows = [
        # src_host, dst_host, spam_level, epoch, discovered_at
        ("a.test", "t.test", "clean", 1, "2024-01-01 00:00:02"),
        ("b.test", "t.test", "suspicious", 1, "2024-01-01 00:00:04"),
        ("a.test", "t.test", "clean", 2, "2024-01-01 00:00:06"),  # repeat ref
        ("c.test", "t.test", "clean", 3, "2024-01-01 00:00:08"),  # new ref
        ("a.test", "u.test", "clean", 2, "2024-01-01 00:00:06"),
    ]
    edges = spark.createDataFrame(
        rows,
        schema="src_host string, dst_host string, spam_level string, epoch int,"
        " discovered_at string",
    ).withColumn("discovered_at", F.to_timestamp("discovered_at"))
    hist = {(r["domain"], r["epoch"]): r for r in domain_history_from_edges(edges).collect()}
    assert hist[("t.test", 1)]["total_backlinks"] == 2
    assert hist[("t.test", 1)]["referring_domains"] == 2
    assert hist[("t.test", 1)]["spam_score"] == 50.0
    assert hist[("t.test", 2)]["total_backlinks"] == 3
    assert hist[("t.test", 2)]["referring_domains"] == 2  # a.test repeat
    assert hist[("t.test", 3)]["referring_domains"] == 3  # c.test new
    assert hist[("t.test", 3)]["spam_score"] == 25.0
    assert hist[("t.test", 1)]["authority_score"] == 20.0
    assert hist[("t.test", 1)]["trust_score"] == 50.0
    latest = {
        r["domain"]: r["epoch"]
        for r in domain_history_latest(
            domain_history_from_edges(edges), ts_col="epoch"
        ).collect()
    }
    assert latest == {"t.test": 3, "u.test": 2}


def test_link_profile_report_golden(spark, tmp_path):
    """S11 report assembly (report_service.py:115-200 sections) on the edge
    fixture: summary == the A1 rollup, top-k maps, pinned-order sample; JSON
    export distributed, HTML renders, xlsx/pdf raise the documented stub."""
    import json
    import os

    import pytest

    from link_profiler_repo_spark.operators.reports import (
        export_report,
        link_profile_report,
    )

    rep = link_profile_report(_edges(spark))
    rows = {r["target_url"]: r for r in rep.collect()}
    x = rows["http://t.test/x"]
    assert x["summary"]["total_backlinks"] == 4
    assert x["summary"]["unique_referring_domains"] == 3
    assert x["summary"]["dofollow_backlinks"] == 2
    assert x["top_anchors"]["hello"] == 3
    assert x["top_referring_domains"]["a.test"] == 2
    # deterministic lexicographic sample order
    assert [s["source_url"] for s in x["sample_backlinks"]] == [
        "http://a.test/1", "http://a.test/2", "http://b.test/1", "http://c.test/1",
    ]
    assert x["sample_backlinks"][0]["link_type"] == "dofollow"

    jdir = str(tmp_path / "rep_json")
    export_report(rep, jdir, "json")
    loaded = [
        json.loads(line)
        for f in os.listdir(jdir) if f.endswith(".json")
        for line in open(os.path.join(jdir, f))
    ]
    assert {r["target_url"] for r in loaded} == set(rows)

    html = str(tmp_path / "rep.html")
    export_report(rep, html, "html")
    text = open(html).read()
    assert "http://t.test/x" in text and "<table" in text

    # xlsx/pdf raise the documented stub only when their render lib is
    # absent (this sandbox ships neither; xlsx legitimately renders when
    # openpyxl exists, so the assertion tracks availability)
    stub_fmts = ["pdf"]
    try:
        import openpyxl  # noqa: F401
    except ImportError:
        stub_fmts.append("xlsx")
    for stub_fmt in stub_fmts:
        with pytest.raises(NotImplementedError):
            export_report(rep, str(tmp_path / f"rep.{stub_fmt}"), stub_fmt)
