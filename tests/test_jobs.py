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
