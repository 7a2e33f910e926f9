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
