"""Analytics read surface — the reference's API-layer queries re-expressed as
DataFrame plans over the edges/profiles/events tables.

Each function is a thin declarative plan: Catalyst handles pushdown and join
strategy; the small dimension side of every join is broadcast."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def link_velocity(edges: DataFrame, ts_col: str = "discovered_at", unit: str = "day") -> DataFrame:
    """A5 (api/analytics.py:40-66): backlink counts bucketed per time unit."""
    return (
        edges.groupBy(F.date_trunc(unit, F.col(ts_col)).alias("bucket"))
        .agg(F.count("*").alias("backlinks"))
        .orderBy("bucket")
    )


def link_intersect(edges: DataFrame, primary_host: str, competitor_hosts: list[str]) -> DataFrame:
    """J4 (services/backlink_service.py:627-653): source hosts linking to the
    primary AND to each competitor, unioned across competitors.

    Spark shape: one aggregation pass building per-source target-host sets,
    then array predicates — a single shuffle instead of N self-joins."""
    targets = [primary_host] + list(competitor_hosts)
    by_src = (
        edges.filter(F.col("dst_host").isin(targets))
        .groupBy("src_host")
        .agg(F.collect_set("dst_host").alias("linked"))
    )
    hits = by_src.filter(
        F.array_contains("linked", primary_host)
        & (F.size(F.array_remove("linked", primary_host)) > 0)
    )
    return hits.select(
        "src_host",
        F.array_sort(F.array_remove("linked", primary_host)).alias("shared_with"),
    )


def domain_value_score(domains: DataFrame, profiles: DataFrame) -> DataFrame:
    """A12 (services/domain_analyzer_service.py:84-151): rule-based additive
    score; valuable = score >= 50. Inputs: domains(name, available, authority
    _score, spam_score, age_days), profiles keyed by target host.

    Weights are the reference's: availability+20, authority>=20 => +30,
    spam<=30 => +25, age>=365d => +15, dofollow>=5 => +40, unique/total
    ratio>2.5... (the reference compares unique_referring_domains >
    total_backlinks*0.25 variant) => +10, no profile => -20."""
    p = profiles.select(
        F.col("target_url").alias("_purl"),
        "total_backlinks", "dofollow_backlinks", "unique_referring_domains",
    )
    j = domains.join(F.broadcast(p), domains["name"] == p["_purl"], "left")
    score = (
        F.when(F.col("available"), 20).otherwise(0)
        + F.when(F.col("authority_score") >= 20, 30).otherwise(0)
        + F.when(F.col("spam_score") <= 30, 25).otherwise(0)
        + F.when(F.col("age_days") >= 365, 15).otherwise(0)
        + F.when(F.coalesce(F.col("dofollow_backlinks"), F.lit(0)) >= 5, 40).otherwise(0)
        + F.when(
            F.coalesce(F.col("unique_referring_domains"), F.lit(0))
            > F.coalesce(F.col("total_backlinks"), F.lit(0)) * 0.25,
            10,
        ).otherwise(0)
        + F.when(F.col("_purl").isNull(), -20).otherwise(0)
    )
    return j.select(
        "name",
        score.alias("value_score"),
        (score >= 50).alias("valuable"),
    )


def expired_domain_candidates(edges: DataFrame, seen: DataFrame) -> DataFrame:
    """Expired/dead-domain link-building finder
    (services/expired_domain_finder_service.py + link_health_service.py):
    target hosts that backlinks point at but that never resolved — every
    crawled target on the host failed (status >= 400) or was never reached —
    ranked by inbound link equity (distinct referring hosts, dofollow count).
    These are the 'register this domain and inherit its backlinks'
    candidates.

    Spark shape: edges left-join seen on the target URL (both sides keyed on
    the string URL — one shuffle), then a per-host aggregation; no collect.
    The seen side is first reduced to ONE row per URL (scheduler-mode seen
    holds a row per fetch ATTEMPT — joining attempts would multiply every
    inbound edge by the retry count and inflate equity); a URL counts as
    resolved if ANY attempt succeeded."""
    s = (
        seen.select(F.col("url").alias("dst"), "status_code")
        .groupBy("dst")
        .agg(F.max(F.when(F.col("status_code") < 400, 1).otherwise(0)).alias("_ok"))
    )
    j = edges.join(s, "dst", "left")
    per_host = j.groupBy("dst_host").agg(
        F.count("*").alias("inbound_links"),
        F.count_distinct("src_host").alias("referring_hosts"),
        F.sum(F.when(F.col("link_type") == "dofollow", 1).otherwise(0)).alias("dofollow_links"),
        F.sum(F.when(F.col("_ok") == 1, 1).otherwise(0)).alias("resolved_ok"),
        F.sum(F.when(F.col("_ok").isNotNull(), 1).otherwise(0)).alias("crawled_targets"),
    )
    return per_host.filter(F.col("resolved_ok") == 0).select(
        "dst_host", "inbound_links", "referring_hosts", "dofollow_links",
        "crawled_targets",
        (F.col("referring_hosts") * 10 + F.col("dofollow_links") * 2).alias("equity_score"),
    )


def queue_stats(frontier: DataFrame) -> DataFrame:
    """A6 (smart_crawler_queue.py:256-274): global queue stats."""
    return frontier.agg(
        F.count("*").alias("queued_tasks"),
        F.approx_count_distinct("host").alias("unique_domains"),
        F.min("depth").alias("min_depth"),
        F.max("depth").alias("max_depth"),
    )


def per_host_queue_breakdown(frontier: DataFrame) -> DataFrame:
    return frontier.groupBy("host").agg(
        F.count("*").alias("queued"),
        F.min("priority").alias("best_priority"),
    )


def host_success_rate(fetch_log: DataFrame, window_rows: int = 20) -> DataFrame:
    """A9 (utils/adaptive_rate_limiter.py:134-137): trailing-N success ratio
    per host over the fetch log (host, ts, status_code)."""
    w = (
        Window.partitionBy("host")
        .orderBy("ts")
        .rowsBetween(-(window_rows - 1), 0)
    )
    return fetch_log.withColumn(
        "success_rate",
        F.avg(F.when(F.col("status_code") < 400, 1.0).otherwise(0.0)).over(w),
    )


def response_percentiles(fetch_log: DataFrame, col: str = "elapsed_ms") -> DataFrame:
    """A8 (crawler_metrics.py / adaptive_rate_limiter.py:129-131)."""
    return fetch_log.groupBy("host").agg(
        F.percentile_approx(col, 0.5).alias("p50"),
        F.percentile_approx(col, 0.95).alias("p95"),
        F.avg(col).alias("mean"),
    )


def seo_score(pages: DataFrame) -> DataFrame:
    """A11 (core/models.py:191-242): fixed-weight page score, normalized 0-100.
    Expects boolean/metric columns; weights follow the reference's
    calculate_seo_score: title 15, meta_desc 10, h1 10, mobile 15, perf(score
    /100*20) 20, https 10, broken-links -10, images-alt 10, structured 10."""
    score = (
        F.when(F.col("has_title"), 15).otherwise(0)
        + F.when(F.col("has_meta_description"), 10).otherwise(0)
        + F.when(F.col("has_h1"), 10).otherwise(0)
        + F.when(F.col("mobile_friendly"), 15).otherwise(0)
        + F.coalesce(F.col("performance_score"), F.lit(0.0)) / 100.0 * 20
        + F.when(F.col("https"), 10).otherwise(0)
        + F.when(F.col("broken_links") > 0, -10).otherwise(0)
        + F.when(F.col("images_missing_alt") == 0, 10).otherwise(0)
        + F.when(F.col("has_structured_data"), 10).otherwise(0)
    )
    return pages.withColumn(
        "seo_score", F.greatest(F.lit(0.0), F.least(F.lit(100.0), score))
    )


def technical_audit_from_metrics(m: DataFrame) -> DataFrame:
    """Relational tail of the technical audit over a (stored) parsed-metrics
    table — split from the parser so the flags + score derivation can be
    SQL-oracled independently (the parser itself is gate-verified by
    seo_metrics_sql). Expects the parse_seo_metrics_udf columns plus url."""
    has_title = F.col("title").isNotNull() & (F.length("title") > 0)
    has_meta = F.col("meta_description").isNotNull() & (
        F.length("meta_description") > 0
    )
    https = F.col("url").startswith("https://")
    flags = {
        "missing_title": ~has_title,
        "missing_meta_description": ~has_meta,
        "multiple_h1": F.col("h1_count") > 1,
        "missing_h1": F.col("h1_count") == 0,
        "images_without_alt": F.col("images_missing_alt") > 0,
        "thin_content": F.col("word_count") < 50,
        "no_canonical": ~F.col("has_canonical"),
        "not_https": ~https,
    }
    n_issues = sum(
        F.when(expr, 1).otherwise(0) for expr in flags.values()
    ).cast("int")
    # the sandbox-computable subset of calculate_seo_score
    # (core/models.py:191-242): title 15, meta 10, h1 10, images-alt 10,
    # https 10; mobile/performance/structured-data terms need a Lighthouse /
    # render pass (declared non-goal) and are omitted, so max = 55
    audit_score = (
        F.when(has_title, 15).otherwise(0)
        + F.when(has_meta, 10).otherwise(0)
        + F.when(F.col("h1_count") >= 1, 10).otherwise(0)
        + F.when(F.col("images_missing_alt") == 0, 10).otherwise(0)
        + F.when(https, 10).otherwise(0)
    ).cast("int")
    out = m
    for name, expr in flags.items():
        out = out.withColumn(name, expr)
    return out.withColumn("n_issues", n_issues).withColumn("audit_score", audit_score)


def technical_audit(pages: DataFrame, urls: list[str] | None = None) -> DataFrame:
    """Technical-audit job (crawl_service.py:810-904 _run_technical_audit_job
    shape — per-URL SEOMetrics for an explicit URL list; the Lighthouse /
    SSL / DNS external calls are sandbox non-goals): Arrow-batched SEO
    parsing restricted to the audit list, then issue flags + the
    content-computable score subset. pages: (url, content)."""
    from ..functions.seo import parse_seo_metrics_udf

    sel = pages if urls is None else pages.filter(F.col("url").isin(list(urls)))
    m = sel.select(
        "url", parse_seo_metrics_udf(F.col("url"), F.col("content")).alias("seo")
    ).select("url", "seo.*")
    return technical_audit_from_metrics(m)


# ---------------------------------------------------------------------------
# Anchor-text over-optimization profile
# ---------------------------------------------------------------------------

GENERIC_ANCHORS = ("click here", "here", "read more", "website", "link", "this site")


def anchor_profile(
    edges: DataFrame,
    money_terms: list[str],
    dst_col: str = "dst_host",
    anchor_col: str = "anchor_text",
    exact_threshold: float = 0.3,
) -> DataFrame:
    """Per-target anchor-text distribution → (dst_host, n_backlinks,
    exact_ratio, naked_ratio, generic_ratio, branded_ratio, other_ratio,
    over_optimized).

    The reference stores top-10 anchor histograms (core/models.py:481) and
    flags spam per-domain; the CLASS MIX of anchors is the established
    over-optimization signal (a natural profile is dominated by branded /
    naked-URL / generic anchors; a high exact-match-keyword share is the
    manipulated pattern penalized since Google Penguin). Classification is
    first-match: exact (anchor = a money keyword) > naked URL > generic
    stop-anchor > branded > other. The brand token is the label LEFT OF THE
    TLD (m./blog./shop. subdomains resolve to the brand, not the subdomain;
    multi-part public suffixes like co.uk are a documented heuristic gap),
    matched as a WHOLE WORD — DNS labels contain no regex metacharacters,
    so interpolating the label into the pattern is safe, and a substring
    contains() would let a 1-2 char label match almost everything. One
    groupBy(dst_host) with conditional aggregates — a single keyed shuffle;
    the brand token derives from the group key, no extra join."""
    a = F.lower(F.trim(F.col(anchor_col)))
    brand = F.lower(F.regexp_extract(F.col(dst_col), r"([^.]+)\.[^.]+$", 1))
    money = [t.lower() for t in money_terms]
    exact = a.isin(*money) if money else F.lit(False)
    cls = (
        F.when(exact, "exact")
        .when(a.rlike(r"^https?://") | (a == F.col(dst_col)), "naked")
        .when(a.isin(*GENERIC_ANCHORS), "generic")
        .when(
            (F.length(brand) > 0)
            & F.regexp_like(a, F.concat(F.lit(r"\b"), brand, F.lit(r"\b"))),
            "branded",
        )
        .otherwise("other")
    )
    e = edges.select(F.col(dst_col).alias("dst_host"), cls.alias("_cls"))
    n = F.count("*")

    def ratio(name):
        return F.round(
            F.sum(F.when(F.col("_cls") == name, 1).otherwise(0)) / n, 6
        ).alias(f"{name}_ratio")

    return (
        e.groupBy("dst_host")
        .agg(
            n.alias("n_backlinks"),
            ratio("exact"), ratio("naked"), ratio("generic"),
            ratio("branded"), ratio("other"),
        )
        .withColumn(
            "over_optimized", F.col("exact_ratio") > F.lit(float(exact_threshold))
        )
    )
