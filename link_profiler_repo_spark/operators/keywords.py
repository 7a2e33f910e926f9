"""Keyword-gap competitive analysis (J6 as a real operator).

Reference semantics (core/models.py:624-644 KeywordGapAnalysis +
services/keyword_service.py / serp_service.py): given keyword sets per
domain and a designated primary domain,

  - common:         keywords the competitor shares with the primary
                    (per competitor),
  - gap:            keywords the competitor ranks for that the primary lacks
                    (per competitor — the link-building opportunity list),
  - primary_unique: keywords only the primary holds vs ALL competitors.

Spark shape: one distinct projection of (domain, keyword) then semi/anti
joins per category — each is a single hash-partitioned shuffle on keyword;
nothing collects. At 100 TB the keyword table shuffles once into the join
partitioning and all three categories reuse it (persist the distinct)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def keyword_gap(
    df: DataFrame,
    primary: str,
    domain_col: str = "domain",
    keyword_col: str = "keyword",
) -> DataFrame:
    """Returns (domain, keyword, category) with category in
    {'common', 'gap', 'primary_unique'}; primary_unique rows carry the
    primary domain."""
    kws = df.select(
        F.col(domain_col).alias("domain"), F.col(keyword_col).alias("keyword")
    ).distinct()
    prim = kws.filter(F.col("domain") == primary).select("keyword")
    comp = kws.filter(F.col("domain") != primary)
    common = comp.join(prim, "keyword", "left_semi").select(
        "domain", "keyword", F.lit("common").alias("category")
    )
    gaps = comp.join(prim, "keyword", "left_anti").select(
        "domain", "keyword", F.lit("gap").alias("category")
    )
    unique = prim.join(comp.select("keyword"), "keyword", "left_anti").select(
        F.lit(primary).alias("domain"), "keyword",
        F.lit("primary_unique").alias("category"),
    )
    return common.unionByName(gaps).unionByName(unique)


def doc_keywords(
    docs: DataFrame,
    n_domains: int = 16,
    n_gram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Derive a (domain, keyword) table from the documents corpus: domain =
    'd'||(doc_id % n_domains), keywords = distinct lowercase word n-grams
    (a deterministic stand-in for per-domain SERP keyword phrases — real
    keyword sets ARE multi-word queries). Pure Catalyst: split +
    word_ngrams (linear zip_with form), no UDF."""
    from .textops import word_ngrams_or_empty

    words = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9]+", " ")), r"\s+"
        ),
        lambda w: F.length(w) > 0,
    )
    # words materialized as a column, grams built in the SAME select as the
    # explode: the inline/extra-projection shapes re-evaluate the regexp per
    # gram (measured 16.4s -> <1s at sf0.1; see textops.word_ngrams)
    wdf = docs.select(
        F.concat(F.lit("d"), (F.col(id_col) % n_domains).cast("string")).alias("domain"),
        words.alias("_w"),
    )
    grams = word_ngrams_or_empty(F.col("_w"), n_gram)
    return wdf.select("domain", F.explode(grams).alias("keyword")).distinct()


def serp_analysis(
    docs: DataFrame,
    keyword: str,
    num_results: int = 10,
    n_hosts: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """SERP analysis job (crawl_service.py:714-749 _run_serp_analysis_job +
    core/models.py:559-568 SERPResult): rank the corpus for a keyword and
    emit the top-N as SERPResult-shaped rows (keyword, rank, url, title,
    snippet, domain, position_type). The external search API is replaced by
    corpus term-frequency relevance — score = total occurrences of the
    keyword's tokens in the doc, pure Catalyst.

    Scale shape: one scan + TakeOrderedAndProject top-N (per-partition top-N
    merged on the driver, no global sort); rank assigned after the limit on
    the tiny N-row result."""
    kw_tokens = [t for t in keyword.lower().split() if t]
    words = F.split(
        F.lower(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9]+", " ")), r"\s+"
    )
    kw_arr = F.array(*[F.lit(t) for t in kw_tokens])
    score = F.size(F.filter(words, lambda w: F.array_contains(kw_arr, w)))
    host = F.concat(F.lit("host"), (F.col(id_col) % n_hosts).cast("string"), F.lit(".example"))
    top = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            score.alias("score"),
            F.concat(F.lit("https://"), host, F.lit("/page/"), F.col(id_col).cast("string")).alias("url"),
            F.substring(F.col(text_col), 1, 60).alias("title"),
            F.substring(F.col(text_col), 1, 160).alias("snippet"),
            host.alias("domain"),
        )
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(num_results)
    )
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.select(
        F.lit(keyword).alias("keyword"),
        F.row_number().over(w).alias("rank"),
        "url", "title", "snippet", "domain",
        F.lit("organic").alias("position_type"),
        "score",
    )


def keyword_research(
    docs: DataFrame,
    seed_keyword: str,
    num_suggestions: int = 10,
    n_gram: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Keyword research job (crawl_service.py:751-786 _run_keyword_research_job
    + core/models.py:583-593 KeywordSuggestion): suggestions = word n-grams
    containing the seed token, ranked by corpus document frequency; metric
    columns (search_volume, competition, difficulty, relevance) are
    deterministic functions of that frequency (the external Ads/Ahrefs APIs
    have no sandbox equivalent). One n-gram explode + one distinct + one
    groupBy — two shuffles on the phrase key, then a top-N."""
    seed = seed_keyword.lower().split()[0] if seed_keyword.strip() else ""
    words = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9]+", " ")), r"\s+"
        ),
        lambda w: F.length(w) > 0,
    )
    from .textops import word_ngrams_or_empty

    # same linear-gram shape as doc_keywords (words column + word_ngrams in
    # the explode's own select; measured 13.6s -> ~1s at sf0.1)
    wdf = docs.select(F.col(id_col).alias("doc_id"), words.alias("_w"))
    grams = word_ngrams_or_empty(F.col("_w"), n_gram)
    freq = (
        wdf.select("doc_id", F.explode(grams).alias("keyword"))
        .filter(F.array_contains(F.split(F.col("keyword"), " "), seed))
        .distinct()  # document frequency, not term frequency
        .groupBy("keyword")
        .agg(F.count("*").alias("search_volume"))
        .orderBy(F.desc("search_volume"), F.asc("keyword"))
        .limit(num_suggestions)
    )
    return freq.select(
        "keyword",
        "search_volume",
        F.round(F.col("search_volume") * 0.05, 2).alias("cpc"),
        F.round(F.least(F.lit(1.0), F.col("search_volume") / 1000.0), 3).alias("competition"),
        F.least(F.lit(100), F.col("search_volume")).cast("bigint").alias("difficulty"),
        F.lit("corpus").alias("source"),
    )


def content_gap_analysis(
    df: DataFrame,
    target: str,
    competitors: list[str],
    domain_col: str = "domain",
    keyword_col: str = "keyword",
) -> DataFrame:
    """Content-gap analysis job (crawl_service.py:1074-1101
    _run_content_gap_analysis_job + core/models.py:859-880
    ContentGapAnalysisResult): the reference delegates to an AI service
    (non-goal); the relational rendering keeps the result shape —
    missing_keywords = keywords >=1 competitor covers that the target lacks,
    missing_topics = their head-token rollup — computed from (domain,
    keyword) coverage sets. Output: one row per missing keyword
    (target_domain, keyword, topic, n_competitors), where n_competitors is
    how many of the given competitors cover it (the outreach-priority
    signal).

    Scale shape: one distinct projection, one anti-join on keyword, one
    keyed count — all hash-partitioned on keyword; competitors arrive as a
    literal filter so no extra shuffle."""
    kws = df.select(
        F.col(domain_col).alias("domain"), F.col(keyword_col).alias("keyword")
    ).distinct()
    tgt = kws.filter(F.col("domain") == target).select("keyword")
    comp = kws.filter(F.col("domain").isin(list(competitors)))
    missing = comp.join(tgt, "keyword", "left_anti")
    return (
        missing.groupBy("keyword")
        .agg(F.count_distinct("domain").alias("n_competitors"))
        .select(
            F.lit(target).alias("target_domain"),
            "keyword",
            F.split(F.col("keyword"), " ")[0].alias("topic"),
            F.col("n_competitors").cast("bigint").alias("n_competitors"),
        )
    )
