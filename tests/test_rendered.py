"""Recorded headless-render source (SURVEY S2): schema-on-read snapshots,
pure-Catalyst anomaly detection + DOM -> interleaved-span normalization, and
the end-to-end story — a recorded render flows through the SAME extraction
UDF as synthetic spans and yields its links."""

import pyspark.sql.functions as F

from link_profiler_repo_spark.functions.extract import with_links
from link_profiler_repo_spark.schemas import DOCS
from link_profiler_repo_spark.sources.rendered import (
    anomaly_flags,
    read_rendered_snapshots,
    rendered_to_docs,
    synth_rendered_snapshots,
)


def _snaps(spark, tmp_path):
    path = str(tmp_path / "renders")
    synth_rendered_snapshots(spark).coalesce(1).write.mode("overwrite").json(path)
    return read_rendered_snapshots(spark, path)


def test_rendered_to_docs_span_invariant(spark, tmp_path):
    docs = rendered_to_docs(_snaps(spark, tmp_path))
    # schema matches the engine's input shape (names + types)
    assert [(f.name, f.dataType.simpleString()) for f in docs.schema] == [
        (f.name, f.dataType.simpleString()) for f in DOCS
    ]
    rows = docs.collect()
    assert len(rows) == 24
    for r in rows:
        offs = [s["offset"] for s in r["spans"]]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
        kinds = {s["kind"] for s in r["spans"]}
        assert kinds <= {"text", "media"}
        for s in r["spans"]:
            if s["kind"] == "media":
                assert s["media_ref"].endswith(".png") and s["text"] is None
    # every third page embeds exactly one img -> one media span
    with_img = [r for r in rows if any(s["kind"] == "media" for s in r["spans"])]
    assert len(with_img) == 8


def test_rendered_extraction_end_to_end(spark, tmp_path):
    """The S2 pipeline: recorded render -> spans -> the standard extraction
    UDF -> outlinks (the cross-host <a href> planted by the fixture)."""
    docs = rendered_to_docs(_snaps(spark, tmp_path))
    linked = with_links(docs).select(
        "doc_id", F.explode("links").alias("l")
    ).select("doc_id", "l.href", "l.link_type")
    rows = linked.collect()
    assert len(rows) == 24  # one anchor per page
    assert all(r["href"].startswith("http://h") for r in rows)
    assert all(r["link_type"] == "nofollow" for r in rows)  # rel="nofollow"


def test_anomaly_flag_goldens(spark):
    cases = [
        ("please verify you are human", "CAPTCHA_DETECTED"),
        ("our CAPTCHA blocked you", "CAPTCHA_DETECTED"),
        ("all about robots", "BOT_DETECTION_KEYWORDS"),
        ("unusual traffic and bot checks", "CAPTCHA_DETECTED,BOT_DETECTION_KEYWORDS"),
        ("a perfectly normal page", ""),
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], schema="content string")
    got = [
        r["f"]
        for r in df.select(
            F.array_join(anomaly_flags(F.col("content")), ",").alias("f")
        ).collect()
    ]
    assert got == [e for _, e in cases]
