"""CDX index source (SURVEY S6): SURT key semantics, the CDX API's query
surface as DataFrame plans, latest-capture dedup, frontier seeding, and the
sorted-urlkey pushdown that makes a domain query prunable at scale."""

import pyspark.sql.functions as F

from link_profiler_repo_spark.plans.inspect import physical_plan, pushed_filters
from link_profiler_repo_spark.sources.cdx import (
    cdx_search,
    cdx_seed_frontier,
    latest_captures,
    read_cdxj,
    surt_key,
    synth_cdx_spark,
)


def _fixture(spark):
    return synth_cdx_spark(spark, n_domains=12, pages_per_domain=10).persist()


def test_surt_key_goldens(spark):
    cases = [
        ("http://example.com/Page.html", "com,example)/page.html"),
        ("HTTPS://User:pw@WWW.Example.COM:8443/A/B?q=1#f", "com,example,www)/a/b"),
        ("http://d1.example", "example,d1)/"),
        ("http://sub.d1.example/x", "example,d1,sub)/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], schema="url string")
    got = [r["k"] for r in df.select(surt_key("url").alias("k")).collect()]
    assert got == [want for _, want in cases]


def test_domain_match_covers_subdomains_not_siblings(spark):
    """'domain' = apex + every subdomain (the API's `*.domain/*`), via the
    ')' / ',' prefix pair — which also rules out the classic prefix false
    positive (d1 must not match d10)."""
    cdx = _fixture(spark)
    hosts = {
        r["h"]
        for r in cdx_search(cdx, "d1.example", "domain")
        .select(F.regexp_extract("url", r"://([^/]+)/", 1).alias("h"))
        .distinct()
        .collect()
    }
    assert hosts == {"d1.example", "www.d1.example"}
    host_only = {
        r["h"]
        for r in cdx_search(cdx, "d1.example", "host")
        .select(F.regexp_extract("url", r"://([^/]+)/", 1).alias("h"))
        .distinct()
        .collect()
    }
    assert host_only == {"d1.example"}
    cdx.unpersist()


def test_prefix_exact_and_date_bounds(spark):
    cdx = _fixture(spark)
    pre = cdx_search(cdx, "http://d2.example/page1", "prefix")
    assert {r["url"] for r in pre.select("url").distinct().collect()} == {
        "http://d2.example/page1.html"
    }
    exact = cdx_search(cdx, "http://d2.example/page1.html", "exact")
    # every capture of exactly that URL: months 01/04/07, day = 1 + page%27
    assert sorted(r["timestamp"] for r in exact.collect()) == [
        "20230102120000", "20230402120000", "20230702120000",
    ]
    # inclusive bounds, dashes stripped like the reference client: a window
    # around April keeps exactly the April capture
    bounded = cdx_search(
        cdx, "http://d2.example/page1.html", "exact",
        from_date="2023-04-01", to_date="20230403",
    )
    assert [r["timestamp"] for r in bounded.collect()] == ["20230402120000"]
    # boundary inclusivity: a degenerate window equal to the capture instant
    instant = cdx_search(
        cdx, "http://d2.example/page1.html", "exact",
        from_date="20230402120000", to_date="20230402120000",
    )
    assert instant.count() == 1
    # limit=0 is zero rows (API semantics), not "unlimited"
    assert cdx_search(cdx, "d2.example", "domain", limit=0).count() == 0
    cdx.unpersist()


def test_latest_captures_one_newest_row_per_urlkey(spark):
    cdx = _fixture(spark)
    latest = latest_captures(cdx)
    assert latest.count() == latest.select("urlkey").distinct().count()
    # spot-check: the newest of the 3 monthly captures survives
    row = latest.filter(F.col("url") == "http://d0.example/page1.html").collect()
    assert len(row) == 1 and row[0]["timestamp"].startswith("202307")
    cdx.unpersist()


def test_seed_frontier_filters_and_dedups(spark):
    cdx = _fixture(spark)
    seeds = cdx_seed_frontier(latest_captures(cdx))
    rows = seeds.collect()
    urls = [r["url"] for r in rows]
    assert len(urls) == len(set(urls))
    # 404 pages (page % 7 == 0) and non-HTML (page % 5 == 0) are excluded
    assert not any("/page0.html" in u or "/page5.html" in u or "/page7.html" in u for u in urls)
    assert all(r["host"] and "." in r["host"] for r in rows)
    cdx.unpersist()


def test_domain_query_pushes_prefix_to_scan(spark, tmp_path):
    """The 100 TB property: a domain query over urlkey-sorted shards reaches
    the parquet scan as StringStartsWith filters (prunable by min/max urlkey
    file statistics); the projection prunes to the selected columns."""
    path = str(tmp_path / "cdx_parquet")
    synth_cdx_spark(spark).orderBy("urlkey").write.parquet(path)
    q = cdx_search(
        spark.read.parquet(path), "d3.example", "domain", fields=["urlkey", "url"]
    )
    pf = " ".join(pushed_filters(q))
    assert "StringStartsWith(urlkey" in pf and "d3" in pf, pf
    assert "ReadSchema" in physical_plan(q)


def test_ndjson_roundtrip(spark, tmp_path):
    """read_cdxj (schema-on-read, no inference) over NDJSON written by the
    fixture reproduces every record."""
    path = str(tmp_path / "cdx_ndjson")
    src = synth_cdx_spark(spark, n_domains=3, pages_per_domain=5)
    src.coalesce(1).write.mode("overwrite").json(path)
    back = read_cdxj(spark, path)
    # same names+types; nullability legitimately differs (computed synth
    # columns are non-null, schema-on-read is nullable)
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in src.schema
    ]
    assert back.count() == src.count()
    assert back.exceptAll(src).count() == 0


def test_cluster_idx_manifest_skips_files(spark, tmp_path):
    """The 100 TB file-skipping property, demonstrated not just pushed down
    (VERDICT r04 next #6): a cluster.idx-style manifest over urlkey-range
    shards lets a domain query hand the scan a STRICT SUBSET of the shard
    files, with results identical to the full-table read."""
    from link_profiler_repo_spark.sources.cdx import (
        prune_shards,
        read_cdx_pruned,
        write_cdx_sharded,
    )

    path = str(tmp_path / "cdx_sharded")
    write_cdx_sharded(synth_cdx_spark(spark, n_domains=12), path, n_shards=8)
    all_files = set(spark.read.parquet(path).inputFiles())
    assert len(all_files) >= 4, "range partitioner should emit several shards"

    pruned = read_cdx_pruned(spark, path, "d3.example", "domain")
    files_read = set(pruned.inputFiles())
    # the skip itself: files_read < total_shards, and nothing read that the
    # manifest says cannot contain the prefix
    assert files_read < all_files, (len(files_read), len(all_files))
    assert files_read == set(
        prune_shards(path, ["example,d3)", "example,d3,"])
    )

    got = cdx_search(pruned, "d3.example", "domain")
    full = cdx_search(spark.read.parquet(path), "d3.example", "domain")
    assert got.count() == full.count() > 0
    assert got.exceptAll(full).count() == 0 and full.exceptAll(got).count() == 0


def test_cluster_idx_no_match_reads_nothing(spark, tmp_path):
    from link_profiler_repo_spark.sources.cdx import (
        read_cdx_pruned,
        write_cdx_sharded,
    )

    path = str(tmp_path / "cdx_sharded2")
    write_cdx_sharded(synth_cdx_spark(spark, n_domains=3), path, n_shards=4)
    miss = read_cdx_pruned(spark, path, "zzz.nowhere", "domain")
    assert miss.count() == 0
