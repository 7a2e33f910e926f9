"""Adaptive recrawl scheduling — page change-rate estimation from capture
histories (Cho & Garcia-Molina, "Estimating Frequency of Change", ACM TOIT
2003: the bias-corrected Poisson estimator; "Effective Page Refresh Policies
for Web Crawlers", TODS 2003: refresh allocation from the estimated rates).

The reference recrawls on demand (`last_fetched_at` staleness checks,
`services/domain_service.py` cache TTLs) — it has no freshness model. A
tiered crawler at 10^10 URLs must decide WHICH pages to refetch; the
published answer models each page as Poisson with change rate λ and
estimates λ from repeated observations. Inputs the engine already produces:
crawl snapshots carry `html_content_hash` per fetch (core/models.py:316) and
the CDX source (sources/cdx.py) carries a content `digest` per capture — a
change is a digest that differs from the previous capture's.

Estimator (TOIT 2003 §4.2, the bias-corrected version): with n observation
intervals of average length Ī and X of them showing a change,

    λ̂ = -ln((n - X + 0.5) / (n + 0.5)) / Ī

which stays finite at X = n (always-changed) and near-unbiased for small n.
The recrawl interval is 1/λ̂ clamped to [min,max] bounds — the uniform-
allocation rendering (the paper's bandwidth-constrained allocation further
DE-prioritizes pages that change faster than any feasible revisit; the clamp
floor is exactly that cutoff).

Plan shape: one lag() window per url (keyed shuffle, no global window) +
one groupBy(url) — two shuffles on the url key total, the same partitioning
the frontier already uses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def change_rates(
    captures: DataFrame,
    url_col: str = "url",
    ts_col: str = "ts_days",
    digest_col: str = "digest",
) -> DataFrame:
    """Capture log (url, observation time in DAYS — double or int — and
    content digest) → per-url change statistics:
    (url, n_visits, n_intervals, n_changes, interval_days, lambda_per_day).

    A change is observed when a capture's digest differs from the previous
    capture of the same url. URLs with < 2 captures have no intervals and
    get lambda NULL (no evidence — the caller's default-interval case)."""
    w = Window.partitionBy(url_col).orderBy("_ts")
    obs = captures.select(
        url_col,
        F.col(ts_col).cast("double").alias("_ts"),
        F.col(digest_col).alias("_d"),
    ).withColumn("_prev", F.lag("_d").over(w))
    per = obs.groupBy(url_col).agg(
        F.count("*").alias("n_visits"),
        (F.count("*") - 1).alias("n_intervals"),
        F.sum(
            F.when(F.col("_prev").isNotNull() & (F.col("_d") != F.col("_prev")), 1)
            .otherwise(0)
        ).alias("n_changes"),
        ((F.max("_ts") - F.min("_ts")) / F.greatest(F.count("*") - 1, F.lit(1)))
        .alias("interval_days"),
    )
    n = F.col("n_intervals").cast("double")
    x = F.col("n_changes").cast("double")
    lam = -F.log((n - x + 0.5) / (n + 0.5)) / F.col("interval_days")
    return per.withColumn(
        "lambda_per_day",
        F.when((F.col("n_intervals") > 0) & (F.col("interval_days") > 0), lam),
    )


def recrawl_schedule(
    rates: DataFrame,
    min_interval_days: float = 1.0,
    max_interval_days: float = 90.0,
    default_interval_days: float = 30.0,
) -> DataFrame:
    """Change rates → (…, recrawl_days): 1/λ̂ clamped to [min, max]. URLs
    with no evidence (NULL λ: fewer than 2 captures) get the default; URLs
    never observed to change (λ̂ = 0) get the max — observed-stable earns
    the longest staleness bound, unknown does not. The floor is the paper's
    faster-than-feasible cutoff."""
    inv = 1.0 / F.col("lambda_per_day")
    return rates.withColumn(
        "recrawl_days",
        F.when(F.col("lambda_per_day").isNull(), F.lit(float(default_interval_days)))
        .when(F.col("lambda_per_day") <= 0, F.lit(float(max_interval_days)))
        .otherwise(
            F.least(
                F.lit(float(max_interval_days)),
                F.greatest(F.lit(float(min_interval_days)), inv),
            )
        ),
    )
