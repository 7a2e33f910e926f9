"""robots.txt ingestion + both enforcement paths (crawlers/robots_parser.py
semantics: missing/empty => allow-all :120-125; Sitemap lines :149-171)."""

import pyspark.sql.functions as F

from link_profiler_repo_spark.functions.robots import (
    disallowed_catalyst,
    extract_sitemaps,
    make_robots_allowed_udf,
    parse_robots_df,
    parse_robots_text,
)

SAMPLE = """# comment
User-agent: *
Disallow: /private/
Allow: /private/ok/
Crawl-delay: 2

User-agent: evilbot
Disallow: /

Sitemap: http://h.test/sitemap.xml
"""


def test_parse_robots_text():
    row = parse_robots_text("h.test", SAMPLE)
    assert row["disallow"] == ["/private/"]
    assert row["allow"] == ["/private/ok/"]
    assert row["crawl_delay"] == 2.0
    assert row["sitemaps"] == ["http://h.test/sitemap.xml"]
    # missing robots => allow-all
    empty = parse_robots_text("x.test", "")
    assert empty["disallow"] == [] and empty["crawl_delay"] is None


def test_parse_robots_df_and_sitemaps(spark):
    df = spark.createDataFrame(
        [("h.test", SAMPLE), ("open.test", "")],
        schema="host string, robots_txt string",
    )
    robots = parse_robots_df(df)
    rows = {r["host"]: r for r in robots.collect()}
    assert rows["h.test"]["disallow"] == ["/private/"]
    assert rows["open.test"]["disallow"] == []
    sm = extract_sitemaps(robots).collect()
    assert [(r["host"], r["sitemap_url"]) for r in sm] == [("h.test", "http://h.test/sitemap.xml")]


def test_catalyst_prefix_filter(spark):
    df = spark.createDataFrame(
        [
            ("http://h.test/private/x", ["/private/"]),
            ("http://h.test/public/x", ["/private/"]),
            ("http://h.test/anything", None),
        ],
        schema="url string, disallow array<string>",
    )
    got = [r["b"] for r in df.select(disallowed_catalyst(F.col("url"), F.col("disallow")).alias("b")).collect()]
    assert got == [True, False, False]


def test_full_grammar_udf(spark):
    rules = {"h.test": SAMPLE.splitlines()}
    udf = make_robots_allowed_udf(rules)
    df = spark.createDataFrame(
        [
            ("h.test", "http://h.test/private/secret"),
            # urllib.robotparser (the reference's parser, robots_parser.py:75)
            # is first-match-wins: the earlier Disallow beats the later Allow
            ("h.test", "http://h.test/private/ok/page"),
            ("h.test", "http://h.test/public"),
            ("nohost.test", "http://nohost.test/anything"),  # no row => allow
        ],
        schema="host string, url string",
    )
    got = [r["ok"] for r in df.select(udf(F.col("host"), F.col("url")).alias("ok")).collect()]
    assert got == [False, False, True, True]
