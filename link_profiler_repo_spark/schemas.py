"""Canonical table schemas — ONE StructType per table, replacing the
reference's dataclass/Pydantic/ORM triple declaration (core/models.py,
database/models.py, api pydantic models).

Driver-mandated input shape (BASELINE.json input_hint):
  docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)
"""

from __future__ import annotations

import pyspark.sql.types as T

SPAN = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # 'text' | 'media'
        T.StructField("text", T.StringType(), True),
        T.StructField("media_ref", T.StringType(), True),
        T.StructField("offset", T.IntegerType(), False),  # strictly increasing per doc
    ]
)

DOCS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),  # the page URL
        T.StructField("spans", T.ArrayType(SPAN), False),
    ]
)

# one extracted link (canonical extraction semantics: see functions/extract.py;
# reference analogs: crawlers/web_crawler.py:330-376 (crawl path regex) and
# crawlers/link_extractor.py:23-109 (rich path))
LINK = T.StructType(
    [
        T.StructField("href", T.StringType(), False),  # resolved absolute URL
        T.StructField("anchor_text", T.StringType(), True),
        T.StructField("rel", T.ArrayType(T.StringType()), True),
        T.StructField("link_type", T.StringType(), True),
        T.StructField("context_text", T.StringType(), True),  # models.py:350, link_extractor.py:111-132
        T.StructField("pos", T.IntegerType(), False),  # document order, 0-based
        T.StructField("from_tag", T.StringType(), False),  # 'a' | 'link'
        # within-page first occurrence of href; a page is crawled exactly
        # once per run, so this IS the global (src,dst) pair dedup
        # (crawl_service.py:95-116 Redis SADD) computed shuffle-free
        T.StructField("first", T.BooleanType(), False),
    ]
)

FRONTIER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.StringType(), False),  # sha2(canonical,256)
        T.StructField("host", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("retries", T.IntegerType(), False),
        T.StructField("order_key", T.StringType(), False),  # lexicographic total order
        T.StructField("epoch", T.IntegerType(), False),  # discovery epoch
    ]
)

SEEN = T.StructType(
    [
        T.StructField("url_hash", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("depth", T.IntegerType(), False),
        T.StructField("crawl_order", T.LongType(), False),  # global crawl sequence
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("status_code", T.IntegerType(), True),
    ]
)

EDGES = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("src_host", T.StringType(), True),
        T.StructField("dst_host", T.StringType(), True),
        T.StructField("anchor_text", T.StringType(), True),
        T.StructField("link_type", T.StringType(), True),
        T.StructField("rel", T.ArrayType(T.StringType()), True),
        T.StructField("context_text", T.StringType(), True),  # Backlink.context_text (models.py:350)
        T.StructField("pos", T.IntegerType(), True),
        T.StructField("depth", T.IntegerType(), True),
        T.StructField("epoch", T.IntegerType(), True),
    ]
)

# The edge table AS STORED by the crawl loops: EDGES plus the per-edge
# analytics surface (_edge_analytics_cols — discovered_at/http_status/
# spam_level) inserted before the epoch stamp. _outputs' typed-empty
# substitute must use THIS shape: downstream consumers
# (domain_history_from_edges, edge quality filters) aggregate the analytics
# columns, so a zero-edge crawl with the narrower EDGES schema raised
# UNRESOLVED_COLUMN instead of flowing through as empty.
EDGES_STORED = T.StructType(
    [f for f in EDGES.fields if f.name != "epoch"]
    + [
        T.StructField("discovered_at", T.TimestampType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("spam_level", T.StringType(), True),
        T.StructField("epoch", T.IntegerType(), True),
    ]
)

ROBOTS = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("user_agent", T.StringType(), True),
        T.StructField("disallow", T.ArrayType(T.StringType()), True),
        T.StructField("allow", T.ArrayType(T.StringType()), True),
        T.StructField("crawl_delay", T.DoubleType(), True),
        T.StructField("sitemaps", T.ArrayType(T.StringType()), True),
    ]
)

SEEDS = T.StructType(
    [
        T.StructField("job_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("seed_order", T.IntegerType(), False),
    ]
)

DEAD_LETTER = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("retries", T.IntegerType(), False),
        T.StructField("last_status", T.IntegerType(), True),
        T.StructField("epoch", T.IntegerType(), False),
    ]
)

METRICS = T.StructType(
    [
        T.StructField("epoch", T.IntegerType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("rows", T.LongType(), False),
    ]
)
