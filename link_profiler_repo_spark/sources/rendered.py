"""Headless-browser fetch from RECORDED renders (SURVEY S2).

Reference: `crawlers/web_crawler.py:196-259` — `_fetch_with_playwright`
returns (rendered content, final_url, status_code, headers, validation
issues, anomaly_flags), with anomaly detection scanning the rendered DOM for
captcha/bot markers (`:232-240`, `_is_captcha_page` `:255-261`). The LIVE
browser is a side effect this engine cannot (and should not) run — the same
recorded-fixture treatment that closed S5 (backlink_api) and S6 (cdx)
applies: rendered-page snapshots are a schema-on-read table; anomaly
detection and the HTML -> interleaved-span normalization are DECLARATIVE
(pure Catalyst — regexp over the recorded DOM), so the whole post-render
pipeline is oracleable and the only thing left outside the engine is the
browser process itself.

At 100 TB the snapshot lake is a partitioned table written by a render farm;
normalization here is one projection per row — no shuffle, no Python.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

# one rendered snapshot per NDJSON line (the tuple _fetch_with_playwright
# returns, plus capture metadata; headers flattened to user_agent — the one
# the engine consumes)
RENDERED_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("final_url", T.StringType()),
        T.StructField("status_code", T.IntegerType()),
        T.StructField("fetched_at", T.StringType()),  # ISO timestamp
        T.StructField("content", T.StringType()),  # rendered DOM html
        T.StructField("user_agent", T.StringType()),
    ]
)

_IMG_TAG = r'<img[^>]*?src="([^"]*)"[^>]*?>'


def read_rendered_snapshots(spark: SparkSession, path: str) -> DataFrame:
    """Recorded render NDJSON -> DataFrame (explicit schema, no inference)."""
    return spark.read.schema(RENDERED_SCHEMA).json(path)


def anomaly_flags(content_col) -> "F.Column":
    """The reference's render anomaly detection as one Catalyst expression
    (web_crawler.py:232-240 + _is_captcha_page :255-261): CAPTCHA_DETECTED
    for captcha/verify-human/unusual-traffic markers, BOT_DETECTION_KEYWORDS
    for bot/robot mentions. Returns array<string> (possibly empty)."""
    low = F.lower(content_col)
    captcha = (
        low.contains("captcha")
        | low.contains("verify you are human")
        | low.contains("unusual traffic")
    )
    bot = low.contains("bot") | low.contains("robot")
    return F.filter(
        F.array(
            F.when(captcha, F.lit("CAPTCHA_DETECTED")),
            F.when(bot, F.lit("BOT_DETECTION_KEYWORDS")),
        ),
        lambda x: x.isNotNull(),
    )


def rendered_to_docs(snapshots: DataFrame) -> DataFrame:
    """Rendered DOM -> the engine's interleaved-span DOCS shape
    (BASELINE.json input_hint), PURE CATALYST: <img src> tags become
    kind='media' spans carrying the src as media_ref; the text between them
    becomes kind='text' spans (anchor markup intact — the extraction UDF
    consumes it exactly like synthetic spans). Offsets are the interleave
    positions, strictly increasing per doc (the span-sequence invariant).

    split() on the img-tag regex yields n_refs+1 text pieces; transform with
    index interleaves (text_i, media_i) pairs and the trailing text piece
    closes the document. Empty text pieces are kept (they carry offset
    structure and cost nothing downstream)."""
    refs = F.regexp_extract_all("content", F.lit(_IMG_TAG), 1)
    texts = F.split("content", _IMG_TAG)

    def text_span(txt, off):
        return F.struct(
            F.lit("text").alias("kind"),
            txt.alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            off.cast("int").alias("offset"),
        )

    def media_span(ref, off):
        return F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            ref.alias("media_ref"),
            off.cast("int").alias("offset"),
        )

    pairs = F.flatten(
        F.transform(
            refs,
            lambda r, i: F.array(
                text_span(F.element_at(texts, i + 1), i * 2),
                media_span(r, i * 2 + 1),
            ),
        )
    )
    spans = F.concat(
        pairs,
        F.array(text_span(F.element_at(texts, F.size(texts)), F.size(refs) * 2)),
    )
    return snapshots.select(
        F.col("url").alias("doc_id"),
        F.when(F.col("content").isNull(), F.array().cast(
            "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
        )).otherwise(spans).alias("spans"),
    )


def synth_rendered_snapshots(
    spark: SparkSession, n_pages: int = 24, n_hosts: int = 4
) -> DataFrame:
    """Deterministic recorded-render fixture as a DataFrame plan (no driver
    rows, no RNG): every third page embeds an <img>, every fifth links
    cross-host, every seventh carries a captcha marker, every eleventh a
    'robots' mention — so anomaly flags, media spans, and extraction all
    have non-vacuous cases."""
    r = spark.range(n_pages)
    pid = F.col("id")
    host = F.concat(F.lit("h"), (pid % n_hosts).cast("string"), F.lit(".example"))
    url = F.concat(F.lit("http://"), host, F.lit("/r"), pid.cast("string"), F.lit(".html"))
    tgt = F.concat(
        F.lit("http://h"), ((pid + 1) % n_hosts).cast("string"),
        F.lit(".example/r"), ((pid * 3 + 1) % n_pages).cast("string"), F.lit(".html"),
    )
    img = F.when(
        pid % 3 == 0,
        F.concat(F.lit('<img src="http://'), host, F.lit("/img/"), pid.cast("string"), F.lit('.png" alt="x">')),
    ).otherwise(F.lit(""))
    captcha = F.when(pid % 7 == 0, F.lit(" please verify you are human ")).otherwise(F.lit(""))
    bots = F.when(pid % 11 == 0, F.lit(" robots welcome ")).otherwise(F.lit(""))
    content = F.concat(
        F.lit("<html><body><p>rendered page "), pid.cast("string"), F.lit("</p>"),
        captcha, img,
        F.lit('<a href="'), tgt, F.lit('" rel="nofollow">next page</a>'),
        bots, F.lit("</body></html>"),
    )
    return r.select(
        url.alias("url"),
        url.alias("final_url"),
        F.when(pid % 13 == 0, F.lit(408)).otherwise(F.lit(200)).cast("int").alias("status_code"),
        F.concat(
            F.lit("2024-02-0"), (pid % 9 + 1).cast("string"), F.lit(" 08:00:00")
        ).alias("fetched_at"),
        content.alias("content"),
        F.lit("Mozilla/5.0 (recorded)").alias("user_agent"),
    )
