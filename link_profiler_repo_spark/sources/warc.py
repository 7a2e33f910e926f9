"""WARC archive source + sink — Common Crawl's wire format (ISO 28500),
the actual on-disk shape of the 100 TB corpus the CDX source (cdx.py)
indexes. The reference repo consumes Common Crawl ONLY through the CDX
index API (`services/common_crawl_cdx.py`); the archive bytes themselves it
never touches — this closes that gap so a corpus build can start from the
raw crawl instead of a pre-extracted table: WARC/WET records parse into the
engine's interleaved-span document shape (BASELINE.json input_hint) and the
crawl engine's own output can be archived back out as WARC.

Layout facts this source is built around (all public, from the Common
Crawl docs and the WARC 1.1 spec):
  * a .warc.gz is a CONCATENATION of per-record gzip members — any record
    boundary is a valid resync point, which is what makes a 1 GB archive
    file splittable at all;
  * each record is `WARC/1.0\\r\\n` + headers + CRLF CRLF + Content-Length
    payload bytes + CRLF CRLF;
  * a crawl ships ~64k archive files of ~1 GB each, so the natural Spark
    parallelism is ONE TASK PER FILE (binaryFile source) — 64k tasks with
    no intra-file splitting needed; per-record members keep peak memory at
    O(largest record) during the streaming-decompress walk, never
    O(decompressed file).

Scale shape: `read_warc` is `binaryFile scan -> mapInPandas` — per-FILE
Python (format decode, the same class as media.py), zero driver loops,
zero shuffles; everything downstream of the parse (WET -> documents,
response -> spans via rendered.rendered_to_docs) is pure Catalyst. The
sink writes one archive file per partition from inside the task (the
Hadoop-committer shape), so serialization is distributed and the driver
never sees payload bytes.

Correctness: the gate row (queries.q_warc_roundtrip) writes a deterministic
fixture through the sink, reads it back through this parser, and
hash-compares against an INDEPENDENT twin parser (oracle_warc_parse below:
BytesIO/readline + email-parser header walk — a genuinely different
implementation) whose output the DuckDB oracle reads from parquet, the
same independent-reference pattern as the crawl-ordering rows.
"""

from __future__ import annotations

import gzip
import io
import zlib
from collections.abc import Iterator
from email.parser import BytesHeaderParser

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

# one row per WARC record; payload is the raw record block (HTTP response
# bytes for warc_type=response, plain text for WET warc_type=conversion)
WARC_RECORD = T.StructType(
    [
        T.StructField("warc_file", T.StringType()),
        T.StructField("record_seq", T.IntegerType()),  # index within file
        # record start offset in the DECOMPRESSED stream. Common Crawl's own
        # cdx records compressed offsets (each record is its own gzip member,
        # so member index == record_seq and random access re-syncs on the
        # member magic); the decompressed offset is the deterministic analog
        # both parsers can state without tracking compression framing.
        T.StructField("rec_offset", T.LongType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

_CRLF2 = b"\r\n\r\n"


# -- record-block serialization (sink side) ----------------------------------


def _record_bytes(
    warc_type: str,
    record_id: str,
    target_uri: str | None,
    warc_date: str,
    content_type: str | None,
    payload: bytes,
) -> bytes:
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: " + record_id.encode(),
        b"WARC-Date: " + warc_date.encode(),
    ]
    if target_uri:
        head.append(b"WARC-Target-URI: " + target_uri.encode())
    if content_type:
        head.append(b"Content-Type: " + content_type.encode())
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + _CRLF2 + payload + _CRLF2


def save_warc(
    records: DataFrame, out_dir: str, gzip_members: bool = True
) -> DataFrame:
    """SINK: write one `part-{partition:05d}.warc[.gz]` per partition of
    `records` (schema-compatible with WARC_RECORD minus warc_file/
    record_seq), each record its own gzip member (the Common Crawl layout,
    so the files this sink writes are splittable by the same rule the
    source exploits). Serialization happens INSIDE the task; the returned
    (path, n_records) frame is the write manifest (count() it to force the
    write — the usual lazy-sink contract)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if gzip_members else ".warc"

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        n = 0
        with open(path, "wb") as fh:
            for b in batches:
                for r in b.itertuples(index=False):
                    blk = _record_bytes(
                        r.warc_type,
                        r.record_id,
                        getattr(r, "target_uri", None),
                        r.warc_date,
                        getattr(r, "content_type", None),
                        bytes(r.payload),
                    )
                    if gzip_members:
                        # mtime pinned: gzip headers carry a timestamp; a
                        # deterministic sink must not embed wall clock
                        blk = gzip.compress(blk, mtime=0)
                    fh.write(blk)
                    n += 1
        yield pd.DataFrame({"path": [path], "n_records": [n]})

    return records.mapInPandas(_write, schema="path string, n_records long")


# -- parsing (source side) ----------------------------------------------------


def _split_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip byte string; plain bytes
    pass through. Streaming decompressobj walk so peak extra memory is one
    member, not one file."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = []
    while data:
        d = zlib.decompressobj(wbits=47)  # gzip wrapper
        out.append(d.decompress(data))
        data = d.unused_data
    return b"".join(out)


def _parse_warc_bytes(name: str, data: bytes) -> list[tuple]:
    """Engine parser: index-walk over the decompressed stream. Tolerant of
    leading/trailing CRLF runs between records; raises on a record whose
    declared Content-Length overruns the file (truncated archive)."""
    data = _split_members(data)
    rows = []
    pos, seq = 0, 0
    n = len(data)
    while True:
        # skip inter-record CRLF padding
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"{name}: expected WARC header at offset {pos}")
        hdr_end = data.find(_CRLF2, pos)
        if hdr_end < 0:
            raise ValueError(f"{name}: unterminated header block at {pos}")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        clen = int(headers["content-length"])
        body_start = hdr_end + 4
        if body_start + clen > n:
            raise ValueError(f"{name}: record at {pos} overruns file")
        rows.append(
            (
                name,
                seq,
                pos,
                headers.get("warc-type"),
                headers.get("warc-record-id"),
                headers.get("warc-target-uri"),
                headers.get("warc-date"),
                headers.get("content-type"),
                data[body_start : body_start + clen],
            )
        )
        seq += 1
        pos = body_start + clen
    return rows


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """SOURCE: WARC/WET archive files -> WARC_RECORD rows. binaryFile scan
    (one task per archive file — the Common Crawl deployment shape) +
    mapInPandas per-file parse; warc_file is the file's base name so
    results are location-independent."""
    import os

    files = spark.read.format("binaryFile").load(path)

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for r in b.itertuples(index=False):
                rows = _parse_warc_bytes(os.path.basename(r.path), bytes(r.content))
                if rows:
                    yield pd.DataFrame(rows, columns=WARC_RECORD.fieldNames())

    return files.select("path", "content").mapInPandas(_parse, schema=WARC_RECORD)


# -- conversions to the engine's document shapes (pure Catalyst) -------------


def wet_documents(records: DataFrame) -> DataFrame:
    """WET conversion records -> (doc_id, url, fetched_at, text). WET
    payloads are UTF-8 plain text (Common Crawl's pre-extracted tier)."""
    return records.filter(F.col("warc_type") == "conversion").select(
        F.col("record_id").alias("doc_id"),
        F.col("target_uri").alias("url"),
        F.col("warc_date").cast("timestamp").alias("fetched_at"),
        F.decode(F.col("payload"), "UTF-8").alias("text"),
    )


def response_docs(records: DataFrame) -> DataFrame:
    """HTML response records -> the interleaved-span DOCS shape, reusing
    the rendered-snapshot normalizer (sources/rendered.py): the HTTP body
    (after the header block, if any) becomes the content column; <img>
    tags interleave as media spans, everything else as text spans."""
    from .rendered import rendered_to_docs

    html = records.filter(
        (F.col("warc_type") == "response")
        & F.col("content_type").startswith("application/http")
    ).select(
        F.col("target_uri").alias("url"),
        # body = text after the first CRLF CRLF (HTTP status+headers);
        # no header block -> whole payload. Pure codegen expressions.
        F.decode(F.col("payload"), "UTF-8").alias("_raw"),
    )
    sep_pos = F.instr(F.col("_raw"), "\r\n\r\n")
    body = F.when(
        sep_pos > 0,
        F.col("_raw").substr(sep_pos + F.lit(4), F.length("_raw")),
    ).otherwise(F.col("_raw"))
    return rendered_to_docs(html.select("url", body.alias("content")))


def cdx_from_warc(records: DataFrame) -> DataFrame:
    """Build the CDX index (sources/cdx.py CDX_SCHEMA) FROM parsed archive
    records — the indexing step Common Crawl itself runs over every crawl,
    closing the loop archive -> index -> pruned query (cdx.write_cdx_sharded
    / read_cdx_pruned consume this output directly). Response records only
    (CC's index covers fetches, not WET derivatives). Pure Catalyst:

      urlkey    SURT key (the cdx.py convention, same expression)
      timestamp ISO WARC-Date -> YYYYMMDDHHMMSS digit squeeze
      mime      Content-Type of the HTTP payload (headers before CRLF CRLF)
      status    HTTP status line code
      digest    sha256 hex of the full record payload (CC uses sha1-base32;
                sha256 keeps the engine's one-hash-family convention)
      length    payload byte length; offset/filename from the parse — with
                per-record gzip members, member index == record_seq, which
                is what random access re-syncs on (see WARC_RECORD note)
    """
    from .cdx import surt_key

    head = F.substring_index(F.decode(F.col("payload"), "UTF-8"), "\r\n\r\n", 1)
    return records.filter(F.col("warc_type") == "response").select(
        surt_key(F.col("target_uri")).alias("urlkey"),
        F.rpad(
            F.substring(F.regexp_replace("warc_date", r"[^0-9]", ""), 1, 14), 14, "0"
        ).alias("timestamp"),
        F.col("target_uri").alias("url"),
        F.regexp_extract(head, r"(?i)content-type:\s*([^;\r\n]+)", 1).alias("mime"),
        F.regexp_extract(head, r"^HTTP/[0-9.]+\s+(\d{3})", 1).alias("status"),
        F.sha2(F.col("payload"), 256).alias("digest"),
        F.length("payload").cast("string").alias("length"),
        F.col("rec_offset").cast("string").alias("offset"),
        F.col("warc_file").alias("filename"),
    )


# -- independent twin parser (oracle only) ------------------------------------


def oracle_warc_parse(paths: list[str]) -> list[dict]:
    """The gate's independent reference parser: gzip.open / BytesIO
    readline walk with email-parser header parsing — shares no code with
    _parse_warc_bytes. Driver-side by design (oracle only, never a data
    path)."""
    import os

    out = []
    for p in sorted(paths):
        raw = open(p, "rb").read()
        if raw[:2] == b"\x1f\x8b":
            # gzip.open handles concatenated members natively
            raw = gzip.open(io.BytesIO(raw)).read()
        buf = io.BytesIO(raw)
        seq = 0
        while True:
            start = buf.tell()
            line = buf.readline()
            if not line:
                break
            if line.strip() == b"":
                continue
            if not line.startswith(b"WARC/"):
                raise ValueError(f"{p}: bad record start {line!r}")
            hdr_lines = []
            while True:
                ln = buf.readline()
                if ln in (b"\r\n", b""):
                    break
                hdr_lines.append(ln)
            msg = BytesHeaderParser().parsebytes(b"".join(hdr_lines))
            payload = buf.read(int(msg["Content-Length"]))
            out.append(
                {
                    "warc_file": os.path.basename(p),
                    "record_seq": seq,
                    "rec_offset": start,
                    "warc_type": msg["WARC-Type"],
                    "record_id": msg["WARC-Record-ID"],
                    "target_uri": msg["WARC-Target-URI"],
                    "warc_date": msg["WARC-Date"],
                    "content_type": msg["Content-Type"],
                    "payload": payload,
                }
            )
            seq += 1
    return out


# -- deterministic fixture (tests + gate) -------------------------------------


def synth_warc_records(spark: SparkSession, n_docs: int = 60) -> DataFrame:
    """Deterministic WARC-record fixture as a DataFrame plan (range(), no
    driver rows, no RNG): per i, a WET conversion record AND an HTML
    response record (img tags every 3rd doc so response_docs interleaves
    media spans), urls over 5 hosts, dates stepping minutes."""
    i = F.col("id")
    url = F.concat(
        F.lit("http://h"),
        F.lpad((i % 5).cast("string"), 3, "0"),
        F.lit(".test/p/"),
        F.lpad(i.cast("string"), 5, "0"),
    )
    date = F.concat(
        F.lit("2024-01-01T00:"),
        F.lpad((i % 60).cast("string"), 2, "0"),
        F.lit(":00Z"),
    )
    text = F.concat(
        F.lit("Common Crawl fixture text for document number "),
        i.cast("string"),
        F.lit(". The quick brown fox jumps over host "),
        (i % 5).cast("string"),
        F.lit("."),
    )
    html = F.concat(
        F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<html><body><p>"),
        text,
        F.when(
            i % 3 == 0,
            F.concat(F.lit('</p><img src="http://img.test/i'), i.cast("string"), F.lit('.png"><p>tail')),
        ).otherwise(F.lit("")),
        F.lit("</p></body></html>"),
    )
    base = spark.range(n_docs)
    wet = base.select(
        F.lit("conversion").alias("warc_type"),
        F.concat(F.lit("<urn:uuid:wet-"), i.cast("string"), F.lit(">")).alias("record_id"),
        url.alias("target_uri"),
        date.alias("warc_date"),
        F.lit("text/plain").alias("content_type"),
        F.encode(text, "UTF-8").alias("payload"),
    )
    resp = base.select(
        F.lit("response").alias("warc_type"),
        F.concat(F.lit("<urn:uuid:resp-"), i.cast("string"), F.lit(">")).alias("record_id"),
        url.alias("target_uri"),
        date.alias("warc_date"),
        F.lit("application/http; msgtype=response").alias("content_type"),
        F.encode(html, "UTF-8").alias("payload"),
    )
    return wet.unionByName(resp)
