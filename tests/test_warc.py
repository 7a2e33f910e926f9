"""WARC archive source/sink: sink->source round trip at the record level,
engine parser vs the independent twin parser (the gate's oracle), WET/
response conversions into the engine document shapes, and malformed-archive
errors."""

import gzip
import os

import pyspark.sql.functions as F
import pytest

from link_profiler_repo_spark.sources.warc import (
    oracle_warc_parse,
    read_warc,
    response_docs,
    save_warc,
    synth_warc_records,
    wet_documents,
)


def _write(spark, tmp_path, gzip_members, n_docs=30, parts=3):
    out = str(tmp_path / ("gz" if gzip_members else "plain"))
    recs = synth_warc_records(spark, n_docs).repartition(parts, "record_id")
    manifest = save_warc(recs, out, gzip_members=gzip_members).collect()
    assert sum(r["n_records"] for r in manifest) == 2 * n_docs
    return out, manifest


@pytest.mark.parametrize("gzip_members", [True, False])
def test_roundtrip_matches_twin_parser(spark, tmp_path, gzip_members):
    out, manifest = _write(spark, tmp_path, gzip_members)
    got = read_warc(spark, out)
    cols = ["warc_file", "record_seq", "rec_offset", "warc_type", "record_id",
            "target_uri", "warc_date", "content_type"]
    engine = sorted(
        (tuple(r[c] for c in cols), bytes(r["payload"]))
        for r in got.collect()
    )
    twin = sorted(
        (tuple(r[c] for c in cols), bytes(r["payload"]))
        for r in oracle_warc_parse([r["path"] for r in manifest])
    )
    assert engine == twin
    assert len(engine) == 60
    # record_seq is dense per file starting at 0
    per_file = {}
    for (key, _p) in engine:
        per_file.setdefault(key[0], []).append(key[1])
    for f, seqs in per_file.items():
        assert sorted(seqs) == list(range(len(seqs))), f


def test_gzip_files_are_per_record_members(spark, tmp_path):
    """The splittability contract: each record is its own gzip member, so
    member count == record count (Common Crawl's layout)."""
    out, manifest = _write(spark, tmp_path, True, n_docs=10, parts=1)
    path = manifest[0]["path"]
    raw = open(path, "rb").read()
    assert raw.count(b"\x1f\x8b\x08") >= 20  # one magic per member
    # and gzip itself sees valid concatenated members
    assert gzip.decompress(raw).count(b"WARC/1.0\r\n") == 20


def test_wet_documents(spark, tmp_path):
    out, _ = _write(spark, tmp_path, True, n_docs=12)
    docs = wet_documents(read_warc(spark, out))
    rows = {r["url"]: r for r in docs.collect()}
    assert len(rows) == 12
    r0 = rows["http://h000.test/p/00000"]
    assert r0["text"].startswith("Common Crawl fixture text for document number 0.")
    assert r0["doc_id"] == "<urn:uuid:wet-0>"
    assert str(r0["fetched_at"]).startswith("2024-01-01 00:00")


def test_response_docs_spans(spark, tmp_path):
    out, _ = _write(spark, tmp_path, True, n_docs=9)
    docs = response_docs(read_warc(spark, out))
    rows = {r["doc_id"]: r["spans"] for r in docs.collect()}
    assert len(rows) == 9
    # every 3rd doc embeds an <img> -> exactly one media span; others none
    for i in (0, 3, 6):
        spans = rows[f"http://h00{i % 5}.test/p/0000{i}"]
        media = [s for s in spans if s["kind"] == "media"]
        assert [m["media_ref"] for m in media] == [f"http://img.test/i{i}.png"]
        # HTTP header block stripped: no span text mentions the status line
        assert all("HTTP/1.1" not in (s["text"] or "") for s in spans)
        # offsets strictly increasing (span-sequence invariant)
        offs = [s["offset"] for s in spans]
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
    spans1 = rows["http://h001.test/p/00001"]
    assert [s for s in spans1 if s["kind"] == "media"] == []
    assert "document number 1." in "".join(s["text"] or "" for s in spans1)


def test_cdx_from_warc(spark, tmp_path):
    from link_profiler_repo_spark.sources.warc import cdx_from_warc

    out, _ = _write(spark, tmp_path, True, n_docs=6)
    idx = cdx_from_warc(read_warc(spark, out))
    rows = {r["url"]: r for r in idx.collect()}
    # responses only (6 of 12 records), one per fixture URL
    assert len(rows) == 6
    r = rows["http://h002.test/p/00002"]
    assert r["urlkey"] == "test,h002)/p/00002"
    assert r["timestamp"] == "20240101000200"
    assert r["mime"] == "text/html" and r["status"] == "200"
    assert len(r["digest"]) == 64 and int(r["offset"]) >= 0
    assert r["filename"].endswith(".warc.gz")
    # the index output feeds the sharded CDX layout directly
    from link_profiler_repo_spark.sources.cdx import write_cdx_sharded

    write_cdx_sharded(idx, str(tmp_path / "cdx"), n_shards=2)


def test_truncated_record_raises(spark, tmp_path):
    out, manifest = _write(spark, tmp_path, False, n_docs=3, parts=1)
    path = manifest[0]["path"]
    data = open(path, "rb").read()
    open(path, "wb").write(data[:-40])  # cut into the last payload
    with pytest.raises(Exception, match="overruns|WARC"):
        read_warc(spark, out).collect()


def test_empty_dir_and_leading_padding(spark, tmp_path):
    d = tmp_path / "pad"
    os.makedirs(d)
    # a file of pure inter-record padding parses to zero records
    (d / "part-00000.warc").write_bytes(b"\r\n\r\n")
    assert read_warc(spark, str(d)).count() == 0
