"""P9 backlink filtering, S8 merge-upsert, SEO metric extraction (A11/P11),
and W4 priority scoring."""

import pyspark.sql.functions as F

from link_profiler_repo_spark.functions.seo import (
    content_type_classify,
    page_text,
    parse_seo_metrics_py,
    parse_seo_metrics_udf,
)
from link_profiler_repo_spark.operators.edges import filter_backlinks, merge_upsert
from link_profiler_repo_spark.operators.frontier import priority_score, score_to_priority

HTML = (
    "<title>My Page</title>"
    '<meta name="description" content="desc here">'
    "<h1>Head</h1><h2>Sub</h2><h2>Sub2</h2>"
    '<img src="a.png" alt="ok"><img src="b.png">'
    '<a href="/internal">in</a><a href="http://other.test/x">out</a>'
    '<link rel="canonical" href="http://h.test/p">'
    "some body words here"
)


def test_parse_seo_metrics_py():
    m = parse_seo_metrics_py("http://h.test/p", HTML)
    assert m["title"] == "My Page"
    assert m["meta_description"] == "desc here"
    assert m["h1_count"] == 1 and m["h2_count"] == 2
    assert m["images_total"] == 2 and m["images_missing_alt"] == 1
    assert m["internal_links"] == 1 and m["external_links"] == 1
    assert m["has_canonical"] is True
    assert m["word_count"] > 0


def test_parse_seo_metrics_udf_and_page_text(spark):
    df = spark.createDataFrame(
        [
            (
                "http://h.test/p",
                [
                    ("text", "<title>T</title>", "", 1),
                    ("media", "", "http://h.test/img/0.png", 0),
                    ("text", "<h1>x</h1>", "", 2),
                ],
            )
        ],
        schema="doc_id string, spans array<struct<kind string, text string, media_ref string, offset int>>",
    )
    out = df.select(
        parse_seo_metrics_udf(F.col("doc_id"), page_text("spans")).alias("seo")
    ).select("seo.*").collect()[0]
    assert out["title"] == "T" and out["h1_count"] == 1


def test_content_type_classify(spark):
    df = spark.createDataFrame(
        [("text/html; charset=utf-8",), ("application/pdf",), ("image/png",), (None,)],
        schema="ct string",
    )
    got = [r["k"] for r in df.select(content_type_classify(F.col("ct")).alias("k")).collect()]
    assert got == ["html", "pdf", "image", "other"]


def test_filter_backlinks(spark):
    edges = spark.createDataFrame(
        [
            ("a.test", "t", "clean"),
            ("b.test", "t", "confirmed_spam"),
            ("c.test", "t", "likely_spam"),   # spam_score 50 > 40 -> drop
            ("d.test", "t", "likely_spam"),   # spam_score 10 -> keep
            ("e.test", "t", "suspicious"),    # spam_score 80 > 70 -> drop
        ],
        schema="src_host string, dst string, spam_level string",
    )
    domains = spark.createDataFrame(
        [("c.test", 50.0, 30.0), ("d.test", 10.0, 2.0), ("e.test", 80.0, 50.0)],
        schema="name string, spam_score double, authority_score double",
    )
    kept = {r["src_host"] for r in filter_backlinks(edges, domains).collect()}
    assert kept == {"a.test", "d.test"}
    # quality gate: authority < 5 (or unknown) drops the spam-survivors too —
    # a.test has no domain row (authority null->0), d.test has authority 2
    kept_q = {r["src_host"] for r in filter_backlinks(edges, domains, quality_scoring=True).collect()}
    assert kept_q == set()


def test_merge_upsert(spark):
    target = spark.createDataFrame(
        [("k1", "old", 1), ("k2", "keep", 5)], schema="k string, v string, ver int"
    )
    source = spark.createDataFrame(
        [("k1", "new", 2), ("k3", "ins", 1)], schema="k string, v string, ver int"
    )
    got = {r["k"]: (r["v"], r["ver"]) for r in merge_upsert(target, source, ["k"], "ver").collect()}
    assert got == {"k1": ("new", 2), "k2": ("keep", 5), "k3": ("ins", 1)}


def test_priority_score(spark):
    df = spark.createDataFrame(
        [(0, 3, 0.0), (2, 0, 0.5)], schema="depth int, backlinks int, err double"
    )
    rows = df.select(
        priority_score(F.col("depth"), F.col("backlinks"), F.col("err")).alias("s")
    ).select(F.col("s"), score_to_priority(F.col("s")).alias("p")).collect()
    assert rows[0]["s"] == 120.0 and rows[0]["p"] == 1
    assert rows[1]["s"] == 30.0 and rows[1]["p"] == 4


def test_export_json_csv_roundtrip(spark, tmp_path):
    """S10/S12: debug/export sinks round-trip rows and columns."""
    from link_profiler_repo_spark.operators.edges import export_csv, export_json

    df = spark.createDataFrame(
        [("a", 1, 0.5), ("b", 2, 1.5)], schema="k string, n int, v double"
    )
    jp, cp = str(tmp_path / "j"), str(tmp_path / "c")
    export_json(df, jp)
    export_csv(df, cp)
    jt = spark.read.json(jp)
    ct = spark.read.option("header", "true").csv(cp)
    assert {tuple(r) for r in jt.select("k", "n", "v").collect()} == {("a", 1, 0.5), ("b", 2, 1.5)}
    assert {r["k"] for r in ct.collect()} == {"a", "b"}


def test_limit_early_exit_plan(spark):
    """T3: limit() plans as CollectLimit/GlobalLimit — no full-table work."""
    df = spark.range(1_000_000).limit(5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CollectLimit" in plan or "GlobalLimit" in plan
    assert df.count() == 5


def test_structured_data_multiline_block(spark):
    """Real-world ld+json is pretty-printed across lines — the extraction
    regex must run in DOTALL mode or every such block is silently missed."""
    import pyspark.sql.functions as F

    from link_profiler_repo_spark.functions.seo import (
        has_structured_data,
        structured_data_types,
    )

    content = (
        'pre <script type="application/ld+json">{\n'
        '  "@type": "Article",\n  "position": 1\n}</script> post'
    )
    df = spark.createDataFrame([(content,), ("no blocks here",)], "content string")
    got = df.select(
        structured_data_types("content").alias("t"),
        has_structured_data("content").alias("h"),
    ).collect()
    assert got[0]["t"] == ["Article"] and got[0]["h"]
    assert got[1]["t"] == [] and not got[1]["h"]
