"""Backlink-API source from RECORDED responses (SURVEY S5).

Reference: `services/backlink_service.py:33-141` — BaseBacklinkAPIClient +
SimulatedBacklinkAPIClient generate Backlink records (source_url, target_url,
anchor_text, link_type, context_text, is_image_link, alt_text,
discovered_date, last_seen_date, authority_passed, spam_level) per requested
target; `:143-537` adds the real API clients (GSC/Ahrefs-shaped) whose rows
are merged into the edge store. The LIVE APIs are out of scope (no egress,
non-goal) — the same treatment that closed S6 applies: recorded response
batches become a schema-on-read NDJSON table, normalization to the edge
schema is one Catalyst projection, and ingestion is the S8 newest-wins
merge. At 100 TB the recorded-response lake is just another partitioned
table; nothing here collects or loops.

No Python UDFs anywhere; the synthetic fixture is a DataFrame plan (no
driver rows, no RNG) mirroring SimulatedBacklinkAPIClient's value shapes
(`backlink_service.py:94-119`) minus the randomness.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from .cdx import surt_host

# one Backlink record per NDJSON line, as the reference serializes it
# (Backlink.to_dict, core/models.py:333-366; simulated shapes
# backlink_service.py:94-119)
BACKLINK_API_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("source_url", T.StringType()),
        T.StructField("target_url", T.StringType()),
        T.StructField("anchor_text", T.StringType()),
        T.StructField("link_type", T.StringType()),
        T.StructField("context_text", T.StringType()),
        T.StructField("is_image_link", T.BooleanType()),
        T.StructField("alt_text", T.StringType()),
        T.StructField("discovered_date", T.StringType()),  # ISO timestamp
        T.StructField("last_seen_date", T.StringType()),
        T.StructField("authority_passed", T.DoubleType()),
        T.StructField("spam_level", T.StringType()),
    ]
)

# LinkType enum values (core/models.py:31-40)
LINK_TYPES = (
    "dofollow", "nofollow", "ugc", "sponsored", "internal",
    "external", "broken", "canonical", "redirect",
)
# spam_level values the quality gate consumes (crawl_service.py:411-436)
SPAM_LEVELS = ("clean", "suspicious", "likely_spam", "confirmed_spam")


def read_backlink_api(spark: SparkSession, path: str) -> DataFrame:
    """Recorded-response NDJSON -> DataFrame. Explicit schema-on-read: no
    inference pass over the response lake, malformed lines become nulls."""
    return spark.read.schema(BACKLINK_API_SCHEMA).json(path)


def api_backlink_edges(responses: DataFrame) -> DataFrame:
    """Normalize recorded API records to the edge-merge shape: one Catalyst
    projection (hosts via the same surt_host regex the CDX source uses),
    timestamps parsed for the newest-wins merge version column."""
    return responses.select(
        F.col("source_url").alias("src"),
        F.col("target_url").alias("dst"),
        surt_host(F.col("source_url")).alias("src_host"),
        surt_host(F.col("target_url")).alias("dst_host"),
        "anchor_text",
        "link_type",
        "context_text",
        "spam_level",
        "authority_passed",
        F.col("last_seen_date").cast("timestamp").alias("last_seen"),
    )


def merge_api_backlinks(stored: DataFrame, batch: DataFrame) -> DataFrame:
    """Ingest a recorded response batch into the stored API-edge table:
    newest-wins on (src, dst) by last_seen — S8's replacing-merge, one
    shuffle on the pair key (backlink_service merges API rows into the DB
    the same upsert way)."""
    from ..operators.edges import merge_upsert

    return merge_upsert(stored, batch, keys=["src", "dst"], version_col="last_seen")


def as_stored_edges(api_edges: DataFrame) -> DataFrame:
    """Adapt normalized API edges to the crawl's EDGES_STORED shape so the
    two edge sources union into one table (rel/pos/depth/epoch are
    crawl-only facts — null for API rows; http_status is unknown to the
    APIs)."""
    return api_edges.select(
        "src",
        "dst",
        "src_host",
        "dst_host",
        "anchor_text",
        "link_type",
        F.lit(None).cast(T.ArrayType(T.StringType())).alias("rel"),
        "context_text",
        F.lit(None).cast("int").alias("pos"),
        F.lit(None).cast("int").alias("depth"),
        F.col("last_seen").alias("discovered_at"),
        F.lit(None).cast("int").alias("http_status"),
        "spam_level",
        F.lit(None).cast("int").alias("epoch"),
    )


def synth_backlink_responses(
    spark: SparkSession,
    n_targets: int = 6,
    per_target: int = 8,
    base_date: str = "2024-01-01",
    anchor_salt: str = "",
) -> DataFrame:
    """Deterministic recorded-response fixture as a DataFrame plan, mirroring
    SimulatedBacklinkAPIClient's value shapes (backlink_service.py:94-119:
    source{i}.com/page{1..5} sources, 'Anchor Text {i}', enum-cycled
    link_type/spam_level, authority in [0.1, 1.0], discovered within 365
    days) with arithmetic in place of randomness. base_date stamps
    last_seen_date — a later batch re-recording the same (src, dst) pairs is
    'newer' for the merge; anchor_salt distinguishes its payloads."""
    n = n_targets * per_target
    g = F.col("id")  # global record index
    t = (g / per_target).cast("long")  # target index
    i = g % per_target  # per-target record index
    src = F.concat(
        F.lit("http://source"), i.cast("string"), F.lit(".com/page"),
        (g % 5 + 1).cast("string"),
    )
    dst = F.concat(F.lit("http://t"), t.cast("string"), F.lit(".example/"))
    base = F.lit(base_date).cast("date")
    link_type = F.element_at(F.array(*[F.lit(x) for x in LINK_TYPES]), (g % len(LINK_TYPES) + 1).cast("int"))
    spam = F.element_at(F.array(*[F.lit(x) for x in SPAM_LEVELS]), (g % len(SPAM_LEVELS) + 1).cast("int"))
    return spark.range(n).select(
        F.sha2(F.concat(F.lit(base_date), F.lit("|"), g.cast("string")), 256).substr(1, 32).alias("id"),
        src.alias("source_url"),
        dst.alias("target_url"),
        F.concat(F.lit("Anchor Text "), i.cast("string"), F.lit(anchor_salt)).alias("anchor_text"),
        link_type.alias("link_type"),
        F.concat(F.lit("Context around link "), i.cast("string")).alias("context_text"),
        (g % 2 == 0).alias("is_image_link"),
        F.when(g % 3 == 0, F.concat(F.lit("Alt text "), i.cast("string"))).alias("alt_text"),
        F.concat(
            F.date_sub(base, (g % 365 + 1).cast("int")).cast("string"),
            F.lit(" 00:00:00"),
        ).alias("discovered_date"),
        F.concat(base.cast("string"), F.lit(" 12:00:00")).alias("last_seen_date"),
        F.round(0.1 + 0.9 * (g % 100) / 100.0, 4).alias("authority_passed"),
        spam.alias("spam_level"),
    )
