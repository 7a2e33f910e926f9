"""Link-building prospect identification (J-family job operator).

Reference semantics (services/link_building_service.py:52-137 strategy 1 —
competitor backlink link-intersect — plus the scoring model at :173-201 and
core/models.py:765-800 LinkProspect): prospects are source hosts that link
to >=1 competitor but never to the target, restricted to domains passing the
authority/spam gate, scored by the reference's additive formula.

Spark shape: two distinct host projections off the edge table (one shuffle
each on src_host), an anti-join target-side, then one equi-join against the
domain-info table — AQE broadcasts the (aggregated, small) prospect host set
into it. Nothing collects; at 10^10 edges the distinct projections are the
only full-table work and they reduce map-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def prospect_identification(
    edges: DataFrame,
    domains: DataFrame,
    target_host: str,
    competitor_hosts: list[str],
    min_authority: float = 20.0,
    max_spam: float = 0.3,
) -> DataFrame:
    """Returns (prospect_url, prospect_domain, authority_score, spam_score,
    score, reason, status) — LinkProspect rows (link_building_service.py:
    94-110 shape, Postgres persistence replaced by the returned DataFrame).

    domains columns: name, authority_score (0-100), trust_score (0-1),
    spam_score (0-1), age_days. Score = authority*0.5 + trust*20 - spam*30
    + 10 (FOLLOW link assumed, :188-189) + 5 if age > 3y (:194-195)
    + 10 for the links-to-competitor reason (:200-201)."""
    comps = [h for h in competitor_hosts]
    comp_linking = (
        edges.filter(F.col("dst_host").isin(comps))
        .select(F.col("src_host").alias("name"))
        .distinct()
    )
    tgt_linking = (
        edges.filter(F.col("dst_host") == target_host)
        .select(F.col("src_host").alias("name"))
        .distinct()
    )
    prospects = comp_linking.join(tgt_linking, "name", "left_anti").filter(
        ~F.col("name").isin([target_host] + comps)
    )
    d = domains.join(prospects, "name").filter(
        (F.col("authority_score") >= min_authority)
        & (F.col("spam_score") <= max_spam)
    )
    score = (
        F.col("authority_score") * 0.5
        + F.col("trust_score") * 20
        - F.col("spam_score") * 30
        + F.lit(10)  # FOLLOW link type
        + F.when(F.col("age_days") > 365 * 3, 5).otherwise(0)
        + F.lit(10)  # reason: links to competitor, not to target
    )
    return d.select(
        F.concat(F.lit("https://"), F.col("name")).alias("prospect_url"),
        F.col("name").alias("prospect_domain"),
        "authority_score",
        "spam_score",
        F.round(score, 2).alias("score"),
        F.lit("Links to competitor, not to target").alias("reason"),
        F.lit("identified").alias("status"),
    )
