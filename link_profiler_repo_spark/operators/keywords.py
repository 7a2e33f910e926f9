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
from pyspark.sql import DataFrame


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
    keyword sets ARE multi-word queries). Pure Catalyst: split + transform
    over a sequence, no UDF."""
    words = F.filter(
        F.split(
            F.lower(F.regexp_replace(F.col(text_col), r"[^a-zA-Z0-9]+", " ")), r"\s+"
        ),
        lambda w: F.length(w) > 0,
    )
    grams = F.when(
        F.size(words) >= n_gram,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n_gram - 1)),
            lambda i: F.concat_ws(" ", F.slice(words, i, n_gram)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.select(
            F.concat(F.lit("d"), (F.col(id_col) % n_domains).cast("string")).alias("domain"),
            F.explode(grams).alias("keyword"),
        )
        .distinct()
    )
