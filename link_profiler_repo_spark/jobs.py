"""Job-type dispatch — the reference's CrawlService runner surface
(services/crawl_service.py:134-266 dispatches 12 job types by string) as
driver-side pipeline compositions. Each job = a function (spark, params) ->
dict of result DataFrames; status transitions live in the state store's
checkpoint manifest rather than a Postgres row.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import SparkSession

from .config import CrawlConfig
from .operators.analytics import domain_value_score, link_intersect, link_velocity
from .operators.crawl import CrawlEngine
from .operators.profile import full_link_profile
from .synth import SynthParams


def backlink_discovery(spark: SparkSession, docs_df, seeds, cfg: CrawlConfig,
                       workdir: str | None = None, p: SynthParams | None = None,
                       mode: str = "bfs", **engine_kw):
    """§3.1: the crawl; returns seen/edges/metrics plus the profile rollup
    (the reference's aggregation tail, crawl_service.py:656-707)."""
    eng = CrawlEngine(
        spark, cfg, docs_df, workdir or tempfile.mkdtemp(prefix="job_"),
        synth_params=p, **engine_kw,
    )
    out = eng.run_bfs(seeds) if mode == "bfs" else eng.run_scheduler(seeds)
    # _outputs guarantees typed (possibly empty) DataFrames, never None — a
    # zero-edge crawl flows through as empty profiles/history, count 0
    out["profiles"] = full_link_profile(out["edges"])
    # DomainHistory snapshots (core/models.py:740-762): one pass over the
    # edge log, not per-epoch loop aggregation
    from .operators.history import domain_history_from_edges

    out["history"] = domain_history_from_edges(out["edges"])
    return out


def link_health_audit(spark: SparkSession, edges, seen):
    """crawl_service.py:788-808: dead/broken targets = edges whose dst was
    crawled with an error status, or never resolved."""
    import pyspark.sql.functions as F

    s = seen.select(F.col("url").alias("dst"), "status_code")
    return (
        edges.join(s, "dst", "left")
        .filter(F.col("status_code").isNull() | (F.col("status_code") >= 400))
        .select("src", "dst", "status_code")
    )


def domain_analysis(spark: SparkSession, domains, profiles):
    """crawl_service.py:906-975 scoring loop -> one DataFrame plan."""
    return domain_value_score(domains, profiles)


def full_seo_audit(spark: SparkSession, docs_df, seeds, cfg, **kw):
    """crawl_service.py:977-1029: sequential composition — crawl, then the
    analytics tail over its outputs."""
    out = backlink_discovery(spark, docs_df, seeds, cfg, **kw)
    out["health"] = link_health_audit(spark, out["edges"], out["seen"])
    return out


def pop_next_job(jobs_df):
    """T5 (job_coordinator.py pop ordering / smart_crawler_queue priority
    pop): the next pending job = smallest priority value, FIFO within
    priority (created_at, then job_id as the total-order tiebreak). Plans as
    TakeOrderedAndProject — a per-partition top-1 merged on the driver, no
    global sort materialization."""
    import pyspark.sql.functions as F

    return (
        jobs_df.filter(F.col("status") == "pending")
        .orderBy(F.asc("priority"), F.asc("created_at"), F.asc("job_id"))
        .limit(1)
    )


def serp_analysis_job(spark: SparkSession, docs, keyword: str, num_results: int = 10, **kw):
    """crawl_service.py:714-749 _run_serp_analysis_job: top-N SERPResult rows
    for a keyword (serp_service replaced by corpus TF relevance)."""
    from .operators.keywords import serp_analysis

    return serp_analysis(docs, keyword, num_results=num_results, **kw)


def keyword_research_job(spark: SparkSession, docs, seed_keyword: str,
                         num_suggestions: int = 10, **kw):
    """crawl_service.py:751-786 _run_keyword_research_job: KeywordSuggestion
    rows for a seed keyword (keyword_service replaced by corpus n-gram DF)."""
    from .operators.keywords import keyword_research

    return keyword_research(docs, seed_keyword, num_suggestions=num_suggestions, **kw)


def content_gap_job(spark: SparkSession, keywords_df, target: str,
                    competitors: list[str], **kw):
    """crawl_service.py:1074-1101 _run_content_gap_analysis_job: missing
    keyword/topic coverage vs a competitor set (AI service replaced by the
    relational coverage-gap rendering)."""
    from .operators.keywords import content_gap_analysis

    return content_gap_analysis(keywords_df, target, competitors, **kw)


def prospect_identification_job(spark: SparkSession, edges, domains, target: str,
                                competitors: list[str], **kw):
    """crawl_service.py:1107-1134 _run_prospect_identification_job over
    stored edge + domain-info tables (link_building_service.py:52-137
    strategy 1 + scoring :173-201)."""
    from .operators.prospects import prospect_identification

    return prospect_identification(edges, domains, target, competitors, **kw)


def technical_audit_job(spark: SparkSession, pages, urls=None, **kw):
    """crawl_service.py:810-904 _run_technical_audit_job: per-URL audit over
    an explicit URL list (Lighthouse effects non-goal)."""
    from .operators.analytics import technical_audit

    return technical_audit(pages, urls, **kw)


def report_generation_job(spark: SparkSession, edges, target_url: str | None = None,
                          fmt: str = "json", path: str | None = None, **kw):
    """crawl_service.py:260-263 _run_report_generation_job -> ReportService
    (report_service.py:79-313): assemble the per-target link-profile report
    rows (summary + top anchors/domains + pinned-order backlink sample) from
    a stored edge table, optionally filtered to one target, and export
    (json distributed / html driver-side; xlsx-pdf stubbed — libs absent)."""
    import pyspark.sql.functions as F

    from .functions.urls import url_host
    from .operators.reports import export_report, link_profile_report

    rep = link_profile_report(edges, **kw)
    if target_url:
        # accept a full target URL or a host (the reference's
        # report_target_identifier is a URL; every other job type here takes
        # hosts — match either, never silently report the wrong thing)
        rep = rep.filter(
            (F.col("target_url") == target_url)
            | (url_host(F.col("target_url")) == target_url)
        )
    if path:
        export_report(rep, path, fmt)
    return rep


def _corpus_build_job(spark, docs, targets, total_rows, budget, **kw):
    from .operators.corpus import build_corpus

    return build_corpus(docs, targets=targets, total_rows=total_rows,
                        budget=budget, **kw)


JOB_TYPES = {
    "backlink_discovery": backlink_discovery,
    "link_health_audit": link_health_audit,
    "domain_analysis": domain_analysis,
    "full_seo_audit": full_seo_audit,
    "link_velocity": lambda spark, edges, **kw: link_velocity(edges, **kw),
    "link_intersect": lambda spark, edges, primary, comps: link_intersect(edges, primary, comps),
    "serp_analysis": serp_analysis_job,
    "keyword_research": keyword_research_job,
    "content_gap_analysis": content_gap_job,
    "prospect_identification": prospect_identification_job,
    "technical_audit": technical_audit_job,
    "report_generation": report_generation_job,
    # added LLM-pipeline family: the end-to-end training-corpus build
    # (quality filter -> exact-dedup keep -> mixture sample -> token-budget
    # pack; operators/corpus.py) as a first-class deployable job
    "corpus_build": _corpus_build_job,
    # Deliberately NOT registered from the reference's 12-type dispatch
    # (crawl_service.py:162, runners :1031-1134): "web3_crawl" and
    # "social_media_crawl". Both are thin wrappers over external-API
    # side-effect clients (web3_service / social_media_service HTTP calls)
    # with no relational tail to re-express — the same non-goal class as S2
    # (headless browser) and the LIVE half of S5 (whose recorded-response
    # rendering IS in scope: sources/backlink_api.py). If recorded fixtures
    # for those APIs existed, they'd follow the backlink_api pattern.
}


def run_job(job_type: str, spark: SparkSession, *args, **kw):
    """reference: execute_predefined_job dispatch (crawl_service.py:268-389)."""
    if job_type not in JOB_TYPES:
        raise ValueError(f"unknown job_type {job_type!r}; known: {sorted(JOB_TYPES)}")
    return JOB_TYPES[job_type](spark, *args, **kw)
