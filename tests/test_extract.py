"""Golden extraction tests, ported in spirit from the reference's
tests/link_extractor_test.py:23-110 (HTML samples re-encoded as spans) with the
documented deviation for multi-rel links (FIXTURES.md §6: implementation order
sponsored > ugc > nofollow wins over the test's expectation)."""

import pyspark.sql.functions as F

from link_profiler_repo_spark.functions.extract import (
    determine_link_type,
    extract_media_refs_py,
    parse_links,
    resolve_url,
    with_links,
)
from link_profiler_repo_spark.schemas import DOCS

BASE = "https://example.com/page"


def _span(text, offset, kind="text", media=""):
    return {"kind": kind, "text": text, "media_ref": media, "offset": offset}


def test_simple_links_drops_non_web_schemes():
    # reference golden "simple_links" (link_extractor_test.py:24-48):
    # 5 hrefs -> 3 extracted (mailto/tel dropped)
    spans = [
        _span(
            '<a href="https://other.com/x">ext</a> '
            '<a href="/internal">int</a> '
            '<a href="relative.html">rel</a> '
            '<a href="mailto:a@b.c">mail</a> '
            '<a href="tel:+123">tel</a>',
            0,
        )
    ]
    links = parse_links(BASE, spans)
    assert [l["href"] for l in links] == [
        "https://other.com/x",
        "https://example.com/internal",
        "https://example.com/relative.html",
    ]
    assert [l["pos"] for l in links] == [0, 1, 2]


def test_seo_links_rel_priority():
    # reference golden "seo_links" (link_extractor_test.py:50-75) as spans;
    # multi-rel "nofollow sponsored" classifies SPONSORED per the
    # implementation's priority chain (link_extractor.py:98-99)
    spans = [
        _span(
            '<link rel="canonical" href="https://example.com/canonical"> '
            '<a href="https://a.com/1" rel="sponsored">s</a> '
            '<a href="https://a.com/2" rel="ugc">u</a> '
            '<a href="https://a.com/3" rel="nofollow">n</a> '
            '<a href="https://a.com/4" rel="nofollow sponsored">ns</a> '
            '<a href="https://a.com/5">d</a>',
            0,
        )
    ]
    links = parse_links(BASE, spans)
    assert len(links) == 6
    by_type = {}
    for l in links:
        by_type[l["link_type"]] = by_type.get(l["link_type"], 0) + 1
    assert by_type == {"sponsored": 2, "ugc": 1, "nofollow": 1, "dofollow": 1, "canonical": 1}
    canonical = [l for l in links if l["from_tag"] == "link"]
    assert canonical[0]["anchor_text"] == "canonical"


def test_edge_cases():
    # empty/whitespace href, fragment-only, javascript
    spans = [
        _span(
            '<a href="">e</a> <a href="   ">w</a> <a href="#frag">f</a> '
            '<a href="javascript:void(0)">j</a>',
            0,
        )
    ]
    links = parse_links(BASE, spans)
    # fragment-only resolves to base#frag and IS kept (web_crawler regex keeps
    # any urljoin result with scheme+netloc)
    assert [l["href"] for l in links] == ["https://example.com/page#frag"]


def test_rel_priority_chain():
    assert determine_link_type(["nofollow", "sponsored"]) == "sponsored"
    assert determine_link_type(["ugc", "nofollow"]) == "ugc"
    assert determine_link_type(["nofollow"]) == "nofollow"
    assert determine_link_type([]) == "dofollow"
    assert determine_link_type(["canonical"]) == "canonical"


def test_resolve_url():
    assert resolve_url(BASE, "/x") == "https://example.com/x"
    assert resolve_url(BASE, "mailto:a@b.c") is None
    assert resolve_url(BASE, "ftp://example.com/f") is None


def test_links_span_order_and_multi_span():
    spans = [
        _span('<a href="http://h.test/2">two</a>', 2),
        _span("", 1, kind="media", media="http://h.test/img/0.png"),
        _span('<a href="http://h.test/1">one</a>', 0),
    ]
    # spans are processed in offset order regardless of array order
    links = parse_links(BASE, spans)
    assert [l["href"] for l in links] == ["http://h.test/1", "http://h.test/2"]
    assert extract_media_refs_py(spans) == ["http://h.test/img/0.png"]


def test_extract_udf_matches_python(spark):
    rows = [
        (
            "http://h000.test/p/00000",
            [
                ("text", '<a href="/p/00001" rel="ugc">x</a> hello', "", 0),
                ("media", "", "http://h000.test/img/0.png", 1),
                ("text", '<a href="http://h001.test/p/00002">y</a>', "", 2),
            ],
        )
    ]
    df = spark.createDataFrame(rows, schema=DOCS)
    out = with_links(df).select(F.explode("links").alias("l")).select("l.*").collect()
    py = parse_links(rows[0][0], [dict(zip(["kind", "text", "media_ref", "offset"], s)) for s in rows[0][1]])
    assert len(out) == len(py) == 2
    for r, p in zip(out, py):
        assert r["href"] == p["href"]
        assert r["link_type"] == p["link_type"]
        assert r["pos"] == p["pos"]


def test_context_text_capture():
    """link_extractor.py:111-132 _get_context_text: prev text + anchor +
    next text, stripped, truncated to 100 chars; canonical rows empty."""
    from link_profiler_repo_spark.functions.extract import parse_links

    spans = [
        {
            "kind": "text",
            "text": 'intro words <a href="http://t.test/x">click here</a> trailing bit <b>tag</b>'
            ' <link rel="canonical" href="http://t.test/c">',
            "media_ref": None,
            "offset": 0,
        }
    ]
    links = parse_links("http://s.test/", spans)
    a = [l for l in links if l["from_tag"] == "a"][0]
    assert a["context_text"] == "intro words click here trailing bit"
    c = [l for l in links if l["from_tag"] == "link"][0]
    assert c["context_text"] == ""
    # truncation to 100 chars
    long_spans = [
        {
            "kind": "text",
            "text": "x" * 90 + ' <a href="http://t.test/y">anchor text that is long</a>',
            "media_ref": None,
            "offset": 0,
        }
    ]
    (l2,) = [l for l in parse_links("http://s.test/", long_spans) if l["from_tag"] == "a"]
    assert len(l2["context_text"]) == 100
    assert l2["context_text"].startswith("x" * 90)
