"""Common Crawl CDX(J) index source (SURVEY S6).

Reference: `clients/common_crawl_client.py:100-190` — queries the Common
Crawl CDX API over HTTP (newline-delimited JSON records with fields urlkey,
timestamp, url, mime, status, digest, length, offset, filename) with
match_type domain/host/prefix/exact, YYYYMMDD date bounds, field selection
and a record limit; on failure it falls back to a simulated result set
(`:173-190`).

Spark-first rendering: the index is a TABLE, not an API. Common Crawl
publishes the same records as cdx shards SORTED BY urlkey, so `spark.read`
with an explicit schema replaces the HTTP client and every API parameter
becomes a Catalyst predicate. The urlkey is a SURT (Sort-friendly URI
Reordering Transform: reversed host labels + ')' + lowercased path), which
turns the API's `*.domain/*` query into a PREFIX predicate on the sort key —
at the 100 TB tier that is a partition-prunable range scan over the sorted
shards (min/max urlkey statistics skip whole files), never a full pass.
No Python anywhere: SURT computation, match, dedup are all Catalyst.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column, DataFrame, SparkSession, Window

# The CDX API emits every field as a JSON string (status/length/offset
# included) — the schema preserves that for fidelity; consumers cast.
CDX_SCHEMA = T.StructType(
    [
        T.StructField("urlkey", T.StringType()),
        T.StructField("timestamp", T.StringType()),  # YYYYMMDDHHMMSS
        T.StructField("url", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("digest", T.StringType()),
        T.StructField("length", T.StringType()),
        T.StructField("offset", T.StringType()),
        T.StructField("filename", T.StringType()),
    ]
)


def read_cdxj(spark: SparkSession, path: str) -> DataFrame:
    """NDJSON CDX shards -> DataFrame. Explicit schema-on-read: no inference
    pass over 100 TB of shards, and malformed lines become nulls instead of
    schema drift (the reference skips undecodable lines the same way,
    common_crawl_client.py:152-156)."""
    return spark.read.schema(CDX_SCHEMA).json(path)


def surt_host(url: Column | str) -> Column:
    """Lowercased registrable host: netloc minus userinfo and port."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(
        F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://(?:[^/?#@]*@)?([^/?#:]+)", 1)
    )


def surt_key(url: Column | str) -> Column:
    """SURT sort key of a URL, pure Catalyst: reversed host labels joined by
    commas + ')' + lowercased path ('com,example)/page'). Matches the CDX
    urlkey convention; the reference's simulated records use the same
    reversed-label shape (common_crawl_client.py:180)."""
    c = F.col(url) if isinstance(url, str) else url
    host = surt_host(c)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*(/[^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(F.lower(path))
    return F.concat(rev, F.lit(")"), path)


def _reversed_labels(name: str) -> str:
    return ",".join(reversed(name.lower().split(".")))


def _norm_date(d: str | None, pad: str) -> str | None:
    """YYYY-MM-DD or YYYYMMDD[HHMMSS] -> 14-digit bound (reference strips
    dashes the same way, common_crawl_client.py:133-136)."""
    if d is None:
        return None
    d = d.replace("-", "")
    return d + pad[len(d):] if len(d) < 14 else d[:14]


def cdx_search(
    cdx: DataFrame,
    pattern: str,
    match_type: str = "domain",
    from_date: str | None = None,
    to_date: str | None = None,
    fields: list[str] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """The CDX API's query surface as one declarative plan
    (common_crawl_client.py:100-147 parameter semantics):

    - 'domain': the domain and every subdomain (the API's `*.domain/*`) —
      TWO prefix predicates on the sorted urlkey ('com,example)' for the
      apex, 'com,example,' for subdomains); prefix predicates push down to
      the scan and prune sorted shards by min/max urlkey.
    - 'host':   exactly that host ('com,sub,example)').
    - 'prefix': url starts with the pattern.
    - 'exact':  url equals the pattern.
    - from/to:  lexicographic bounds on the 14-digit timestamp (inclusive,
      like the API); partial dates are padded to the period's edges.
    - fields:   projection (column pruning reaches the scan).
    - limit:    CollectLimit, like the API's `limit` param.
    """
    if match_type == "domain":
        rev = _reversed_labels(pattern)
        cond = F.col("urlkey").startswith(rev + ")") | F.col("urlkey").startswith(
            rev + ","
        )
    elif match_type == "host":
        cond = F.col("urlkey").startswith(_reversed_labels(pattern) + ")")
    elif match_type == "prefix":
        cond = F.col("url").startswith(pattern)
    elif match_type == "exact":
        cond = F.col("url") == pattern
    else:
        raise ValueError(f"unknown match_type: {match_type}")
    out = cdx.filter(cond)
    lo, hi = _norm_date(from_date, "00000000000000"), _norm_date(to_date, "99999999999999")
    if lo:
        out = out.filter(F.col("timestamp") >= lo)
    if hi:
        out = out.filter(F.col("timestamp") <= hi)
    if fields is not None:
        out = out.select(*fields)
    if limit is not None:
        out = out.limit(limit)  # limit=0 means zero rows, like the API
    return out


def latest_captures(cdx: DataFrame) -> DataFrame:
    """One row per urlkey: the newest capture (digest/filename tiebreak for
    determinism when an index carries same-second recrawls). Keyed window —
    scales as a partial aggregation per urlkey, never a global sort."""
    w = Window.partitionBy("urlkey").orderBy(
        F.desc("timestamp"), F.desc("digest"), F.desc("filename")
    )
    return (
        cdx.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def cdx_seed_frontier(captures: DataFrame, ok_status: tuple[str, ...] = ("200",)) -> DataFrame:
    """Captures -> distinct seed URLs for the crawl engine (the reference
    feeds CC results into expired-domain/backlink seeding): keep OK HTML
    captures, one row per URL with its host — the shape
    CrawlEngine.run_bfs/run_scheduler seed ingestion expects."""
    return (
        captures.filter(
            F.col("status").isin(*ok_status) & F.col("mime").startswith("text/html")
        )
        .select("url", surt_host(F.col("url")).alias("host"))
        .distinct()
    )


def write_cdx_sharded(df: DataFrame, path: str, n_shards: int = 8) -> None:
    """Write the index as urlkey-RANGE shards plus a cluster.idx-style
    manifest — the layout Common Crawl itself publishes (its `cluster.idx`
    secondary index maps urlkey ranges to cdx-NNNNN shard files).
    repartitionByRange gives each output file a disjoint urlkey range; one
    tiny aggregation over the written files records per-file (min, max)
    urlkey into `_cluster_idx.json` inside the table dir (underscore-prefixed
    -> invisible to parquet listings, like _SUCCESS). At 100 TB the manifest
    is O(shards) — thousands of entries for a full monthly crawl — and lives
    on the driver."""
    import json
    import os

    (
        df.repartitionByRange(n_shards, "urlkey")
        .sortWithinPartitions("urlkey")
        .write.mode("overwrite")
        .parquet(path)
    )
    spark = df.sparkSession
    rows = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(F.min("urlkey").alias("lo"), F.max("urlkey").alias("hi"))
        .collect()
    )
    manifest = sorted(
        ({"file": r["file"], "lo": r["lo"], "hi": r["hi"]} for r in rows),
        key=lambda e: e["lo"],
    )
    with open(os.path.join(path, "_cluster_idx.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def _prefix_upper(p: str) -> str:
    """Smallest string greater than every key starting with p."""
    return p[:-1] + chr(ord(p[-1]) + 1)


def prune_shards(path: str, prefixes: list[str]) -> list[str] | None:
    """Shard files whose [lo, hi] urlkey range can contain a key with any of
    the given prefixes (range-overlap against the cluster.idx manifest).
    Returns None when the table has no manifest (caller reads everything)."""
    import json
    import os

    idx = os.path.join(path, "_cluster_idx.json")
    if not os.path.exists(idx):
        return None
    with open(idx) as f:
        manifest = json.load(f)
    keep = []
    for e in manifest:
        for p in prefixes:
            if e["hi"] >= p and e["lo"] < _prefix_upper(p):
                keep.append(e["file"])
                break
    return keep


def read_cdx_pruned(
    spark: SparkSession, path: str, pattern: str, match_type: str = "domain"
) -> DataFrame:
    """FILE-SKIPPING reader for domain/host queries (VERDICT r04 next #6 —
    demonstrate skipping, not just pushdown): the urlkey prefixes implied by
    the query are intersected with the cluster.idx manifest and ONLY the
    overlapping shard files are handed to the scan. Correctness never
    depends on the pruning — cdx_search re-applies the full predicate; the
    manifest only shrinks the file list (df.inputFiles() is the audit).
    url-space match types (prefix/exact) don't align with the urlkey sort
    and read the full table."""
    if match_type == "domain":
        rev = _reversed_labels(pattern)
        prefixes = [rev + ")", rev + ","]
    elif match_type == "host":
        prefixes = [_reversed_labels(pattern) + ")"]
    else:
        prefixes = None
    files = prune_shards(path, prefixes) if prefixes else None
    if files is None:
        return spark.read.parquet(path)
    if not files:
        return spark.read.parquet(path).filter(F.lit(False))
    return spark.read.parquet(*files)


def synth_cdx_spark(
    spark: SparkSession,
    n_domains: int = 8,
    pages_per_domain: int = 20,
    captures_per_page: int = 3,
    with_subdomains: bool = True,
) -> DataFrame:
    """Deterministic CDX fixture, generated as a DataFrame plan (no driver
    rows, no RNG): domains d{i}.example with pages /page{j}.html, each
    captured captures_per_page times across months, subdomains www.d{i} on
    even pages, status/mime varied by arithmetic on the ids — the offline
    stand-in for the API's simulated fallback records
    (common_crawl_client.py:173-190), minus the randomness."""
    if not 1 <= captures_per_page <= 4:
        # captures land 3 months apart (01/04/07/10); more would overflow
        # into invalid month 13+
        raise ValueError("captures_per_page must be 1..4")
    n = n_domains * pages_per_domain * captures_per_page
    r = spark.range(n)
    cap = F.col("id") % captures_per_page
    page = (F.col("id") / captures_per_page).cast("long") % pages_per_domain
    dom = (F.col("id") / (captures_per_page * pages_per_domain)).cast("long")
    sub = (page % 2 == 0) & F.lit(with_subdomains)
    host = F.concat(
        F.when(sub, F.lit("www.")).otherwise(F.lit("")),
        F.lit("d"), dom.cast("string"), F.lit(".example"),
    )
    url = F.concat(
        F.lit("http://"), host, F.lit("/page"), page.cast("string"), F.lit(".html")
    )
    # captures land in successive months of 2023, day = 1 + page % 27
    ts = F.concat(
        F.lit("2023"),
        F.lpad((cap * 3 + 1).cast("string"), 2, "0"),
        F.lpad((page % 27 + 1).cast("string"), 2, "0"),
        F.lit("120000"),
    )
    status = F.when(page % 7 == 0, F.lit("404")).otherwise(F.lit("200"))
    mime = F.when(page % 5 == 0, F.lit("application/pdf")).otherwise(F.lit("text/html"))
    return r.select(
        surt_key(url).alias("urlkey"),
        ts.alias("timestamp"),
        url.alias("url"),
        mime.alias("mime"),
        status.alias("status"),
        F.sha2(F.concat(url, ts), 256).substr(1, 16).alias("digest"),
        ((F.col("id") % 900) * 17 + 5000).cast("string").alias("length"),
        (F.col("id") * 1024).cast("string").alias("offset"),
        F.concat(
            F.lit("CC-MAIN-2023-"), F.lpad((cap + 1).cast("string"), 2, "0"),
            F.lit("-warc.gz"),
        ).alias("filename"),
    )
