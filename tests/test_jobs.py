"""Job-type dispatch (reference: crawl_service.py:134-266 twelve-way switch)."""

import pytest

from link_profiler_repo_spark.config import CrawlConfig
from link_profiler_repo_spark.jobs import run_job
from link_profiler_repo_spark.synth import SynthParams, default_seeds, synth_docs_spark


def test_full_seo_audit_composition(spark, tmp_workdir):
    p = SynthParams(n_docs=60, n_hosts=6)
    docs = synth_docs_spark(spark, p).persist()
    cfg = CrawlConfig(job_id="audit", max_depth=2, max_pages=40)
    out = run_job(
        "full_seo_audit", spark, docs, [u for _, u, _ in default_seeds(p, 2)], cfg,
        workdir=tmp_workdir, p=p, use_bloom=False, metrics_enabled=False,
    )
    assert out["stats"].crawled > 0
    assert out["profiles"].count() > 0
    # health audit flags dangling/failed targets (404/503 in the fixture)
    health = out["health"].collect()
    assert all(r["status_code"] is None or r["status_code"] >= 400 for r in health)
    docs.unpersist()


def test_unknown_job_type_raises(spark):
    with pytest.raises(ValueError, match="unknown job_type"):
        run_job("nope", spark)


def test_pop_next_job_priority_fifo(spark):
    """T5: priority pop — smallest priority first, FIFO within priority."""
    from link_profiler_repo_spark.jobs import pop_next_job

    rows = [
        ("j1", "backlink_discovery", 2, "2024-01-01 00:00:05", "pending"),
        ("j2", "domain_analysis", 1, "2024-01-01 00:00:09", "pending"),
        ("j3", "link_health_audit", 1, "2024-01-01 00:00:01", "running"),
        ("j4", "full_seo_audit", 1, "2024-01-01 00:00:09", "pending"),
    ]
    df = spark.createDataFrame(
        rows, schema="job_id string, job_type string, priority int, created_at string, status string"
    )
    got = pop_next_job(df).collect()
    assert len(got) == 1
    # j3 is running (excluded); j2 vs j4 tie on (priority, created_at) -> job_id
    assert got[0]["job_id"] == "j2"
    plan = pop_next_job(df)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # no global sort materialization


def test_serp_analysis_job_golden(spark):
    """crawl_service.py:714-749: top-N SERPResult rows, corpus TF relevance."""
    rows = [
        (0, "fast table scan with fast merge and a fast table"),
        (1, "table value part hash"),
        (2, "nothing relevant here at all"),
        (3, "fast fast fast"),
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = run_job("serp_analysis", spark, docs, "fast table", num_results=3).collect()
    # doc0 score 5 (3 fast + 2 table), doc3 score 3, doc1 score 1
    assert [r["rank"] for r in got] == [1, 2, 3]
    assert [r["url"].split("/")[-1] for r in got] == ["0", "3", "1"]
    assert got[0]["keyword"] == "fast table"
    assert got[0]["position_type"] == "organic"
    assert got[0]["domain"] == "host0.example"
    assert got[0]["score"] == 5


def test_keyword_research_job_golden(spark):
    """crawl_service.py:751-786: n-gram suggestions ranked by doc frequency."""
    rows = [
        (0, "big data table scan engine"),
        (1, "big data table scan engine"),
        (2, "data table scan"),
        (3, "unrelated words entirely here"),
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    got = {r["keyword"]: r for r in run_job(
        "keyword_research", spark, docs, "table", num_suggestions=5
    ).collect()}
    # "data table scan" appears in docs 0,1,2 -> volume 3
    assert got["data table scan"]["search_volume"] == 3
    assert got["big data table"]["search_volume"] == 2
    assert all(" " in k and "table" in k.split() for k in got)
    assert got["data table scan"]["difficulty"] == 3
    assert got["data table scan"]["source"] == "corpus"


def test_content_gap_job_golden(spark):
    """crawl_service.py:1074-1101 rendering: missing keywords + topic rollup
    + competitor coverage counts."""
    rows = [
        ("d0", "alpha beta gamma"),
        ("d1", "alpha beta gamma"),
        ("d1", "delta epsilon zeta"),
        ("d2", "delta epsilon zeta"),
        ("d3", "eta theta iota"),
        ("d9", "ignored by competitor filter"),
    ]
    kws = spark.createDataFrame(rows, schema="domain string, keyword string")
    got = {
        r["keyword"]: r
        for r in run_job("content_gap_analysis", spark, kws, "d0", ["d1", "d2", "d3"]).collect()
    }
    assert set(got) == {"delta epsilon zeta", "eta theta iota"}
    assert got["delta epsilon zeta"]["n_competitors"] == 2
    assert got["delta epsilon zeta"]["topic"] == "delta"
    assert got["eta theta iota"]["n_competitors"] == 1
    assert all(r["target_domain"] == "d0" for r in got.values())


def test_prospect_identification_golden(spark):
    """link_building_service.py:52-137 strategy 1 + score formula :173-201:
    links-to-competitor-not-target difference, authority/spam gate, additive
    score."""
    edges = [
        ("p1.test", "c1.test"), ("p1.test", "c2.test"),  # prospect candidate
        ("p2.test", "c1.test"), ("p2.test", "t.test"),   # links target too
        ("c1.test", "c2.test"),                           # competitor itself
        ("p3.test", "c2.test"),                           # low authority
    ]
    edges_df = spark.createDataFrame(edges, schema="src_host string, dst_host string")
    domains = [
        ("p1.test", 50.0, 0.5, 0.2, 2000),
        ("p3.test", 10.0, 0.5, 0.2, 2000),
        ("c1.test", 90.0, 0.9, 0.0, 4000),
        ("p2.test", 80.0, 0.9, 0.0, 4000),
    ]
    domains_df = spark.createDataFrame(
        domains,
        schema="name string, authority_score double, trust_score double, spam_score double, age_days int",
    )
    got = run_job(
        "prospect_identification", spark, edges_df, domains_df, "t.test",
        ["c1.test", "c2.test"],
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert r["prospect_domain"] == "p1.test"
    assert r["prospect_url"] == "https://p1.test"
    # 50*0.5 + 0.5*20 - 0.2*30 + 10 (follow) + 5 (age>3y) + 10 (reason) = 54
    assert r["score"] == 54.0
    assert r["status"] == "identified"


def test_technical_audit_golden(spark):
    """crawl_service.py:810-904 shape: per-URL flags + the content-computable
    score subset (core/models.py:191-242 weights)."""
    pages = [
        ("https://a.test/p",
         '<title>T</title><meta name="description" content="d"><h1>x</h1>'
         + "word " * 60),
        ("http://b.test/p", '<h1>a</h1><h1>b</h1><img src="x">short'),
        ("https://c.test/skipped", "<title>nope</title>"),
    ]
    df = spark.createDataFrame(pages, schema="url string, content string")
    got = {
        r["url"]: r
        for r in run_job(
            "technical_audit", spark, df, ["https://a.test/p", "http://b.test/p"]
        ).collect()
    }
    assert set(got) == {"https://a.test/p", "http://b.test/p"}  # audit list only
    a = got["https://a.test/p"]
    assert not a["missing_title"] and not a["missing_meta_description"]
    assert a["n_issues"] == 1  # only no_canonical
    assert a["audit_score"] == 55  # full content-computable subset
    b = got["http://b.test/p"]
    for flag in ("missing_title", "missing_meta_description", "multiple_h1",
                 "images_without_alt", "thin_content", "no_canonical", "not_https"):
        assert b[flag], flag
    assert b["n_issues"] == 7
    assert b["audit_score"] == 10  # only the h1-present term


def test_run_job_dispatcher_every_type(spark, tmp_path, capsys, monkeypatch):
    """VERDICT r03 next #2: every registered JOB_TYPE is runnable from the
    spark-submit dispatcher — analytics jobs via the new --edges/--seen
    stored-table inputs, keyword jobs over the harness tables, audit over
    the synthetic page fixture. Runs main() in-process (same code path as
    spark-submit; the JVM/session is shared with the test fixture)."""
    import importlib.util
    import json as _json
    import os
    import sys as _sys

    from link_profiler_repo_spark.jobs import JOB_TYPES

    spec = importlib.util.spec_from_file_location(
        "run_job_main",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "jobs", "run_job.py"),
    )
    rj = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(rj)

    # one small crawl provides the stored tables for the analytics jobs
    p = SynthParams(n_docs=60, n_hosts=6)
    docs = synth_docs_spark(spark, p).persist()
    cfg = CrawlConfig(job_id="smoke", max_depth=2, max_pages=40)
    res = run_job(
        "backlink_discovery", spark, docs, [u for _, u, _ in default_seeds(p, 2)],
        cfg, workdir=str(tmp_path / "wd"), p=p, use_bloom=False,
        metrics_enabled=False,
    )
    edges_p, seen_p = str(tmp_path / "edges.pq"), str(tmp_path / "seen.pq")
    res["edges"].write.parquet(edges_p)
    res["seen"].write.parquet(seen_p)
    docs.unpersist()

    extra = {
        "backlink_discovery": ["--n-docs", "60", "--n-hosts", "6",
                               "--max-pages", "30", "--max-depth", "2"],
        "full_seo_audit": ["--n-docs", "60", "--n-hosts", "6",
                           "--max-pages", "30", "--max-depth", "2"],
        "link_health_audit": ["--edges", edges_p, "--seen", seen_p],
        "link_velocity": ["--edges", edges_p],
        "link_intersect": ["--edges", edges_p],
        "domain_analysis": ["--edges", edges_p],
        "prospect_identification": ["--edges", edges_p],
        "serp_analysis": [],
        "keyword_research": [],
        "content_gap_analysis": [],
        "technical_audit": ["--n-docs", "40"],
        "report_generation": ["--edges", edges_p, "--report-format", "html",
                              "--out", str(tmp_path / "report.html")],
        "corpus_build": ["--token-budget", "1000"],
    }
    assert set(extra) == set(JOB_TYPES)  # dispatcher stays in sync
    for jt, xs in extra.items():
        monkeypatch.setattr(
            _sys, "argv",
            ["run_job.py", "--type", jt, "--sf-dir", "/root/testdata/sf0.001",
             "--workdir", str(tmp_path / f"wd_{jt}")] + xs,
        )
        rc = rj.main()
        line = capsys.readouterr().out.strip().splitlines()[-1]
        out = _json.loads(line)
        assert rc in (0, None), (jt, out)
        assert "error" not in out, (jt, out)
        assert out["job_type"] == jt


def test_zero_edge_crawl_flows_through_empty(spark, tmp_path):
    """A crawl that yields nothing (empty seeds) must flow through the
    profile/history/health tails as typed empty frames, count 0 — the
    stored-edge schema (EDGES_STORED, analytics columns included) is what
    the empty substitute must carry, or domain_history_from_edges raises
    UNRESOLVED_COLUMN on spam_level/discovered_at."""
    p = SynthParams(n_docs=40, n_hosts=4)
    docs = synth_docs_spark(spark, p)
    cfg = CrawlConfig(job_id="zero", max_depth=2, max_pages=10)
    res = run_job(
        "full_seo_audit", spark, docs, [], cfg,
        workdir=str(tmp_path / "wd0"), p=p, use_bloom=False, metrics_enabled=False,
    )
    assert res["profiles"].count() == 0
    assert res["history"].count() == 0
    assert res["health"].count() == 0
    assert res["stats"].crawled == 0
