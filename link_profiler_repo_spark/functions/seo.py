"""SEO metric extraction from page content — the reference's content parser
(crawlers/content_parser.py:21-129) as one Arrow-batched UDF returning a
struct column, plus the quality/spam heuristics from
utils/content_validator.py:39-230.

Input is the concatenated text of a doc's text spans (the engine's page
"HTML"); regex parsing replaces BeautifulSoup row loops.
"""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T

SEO_STRUCT = T.StructType(
    [
        T.StructField("title", T.StringType(), True),
        T.StructField("meta_description", T.StringType(), True),
        T.StructField("h1_count", T.IntegerType(), True),
        T.StructField("h2_count", T.IntegerType(), True),
        T.StructField("images_total", T.IntegerType(), True),
        T.StructField("images_missing_alt", T.IntegerType(), True),
        T.StructField("internal_links", T.IntegerType(), True),
        T.StructField("external_links", T.IntegerType(), True),
        T.StructField("has_canonical", T.BooleanType(), True),
        T.StructField("word_count", T.IntegerType(), True),
    ]
)

_TITLE = re.compile(r"<title[^>]*>(.*?)</title>", re.I | re.S)
_META_DESC = re.compile(r'<meta\s+[^>]*name="description"[^>]*content="([^"]*)"', re.I)
_H1 = re.compile(r"<h1[^>]*>", re.I)
_H2 = re.compile(r"<h2[^>]*>", re.I)
_IMG = re.compile(r"<img\s[^>]*>", re.I)
_ALT = re.compile(r'alt="[^"]*"', re.I)
_A = re.compile(r'<a\s[^>]*href="([^"]*)"', re.I)
_CANON = re.compile(r'<link\s+[^>]*rel="canonical"', re.I)
_TAGS = re.compile(r"<[^>]+>")
_HOST = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)")


def parse_seo_metrics_py(base_url: str, content: str) -> dict:
    content = content or ""
    m = _TITLE.search(content)
    title = m.group(1).strip() if m else None
    md = _META_DESC.search(content)
    page_host = (_HOST.match(base_url or "") or [None, ""])[1]
    internal = external = 0
    for hm in _A.finditer(content):
        href = hm.group(1)
        h = _HOST.match(href)
        if h is None or h.group(1) == page_host:
            internal += 1  # relative or same-host (content_parser.py:47-59)
        else:
            external += 1
    imgs = _IMG.findall(content)
    missing_alt = sum(1 for i in imgs if not _ALT.search(i))
    words = [w for w in _TAGS.sub(" ", content).split() if w]
    return {
        "title": title,
        "meta_description": md.group(1).strip() if md else None,
        "h1_count": len(_H1.findall(content)),
        "h2_count": len(_H2.findall(content)),
        "images_total": len(imgs),
        "images_missing_alt": missing_alt,
        "internal_links": internal,
        "external_links": external,
        "has_canonical": bool(_CANON.search(content)),
        "word_count": len(words),
    }


@F.pandas_udf(SEO_STRUCT)
def parse_seo_metrics_udf(url: pd.Series, content: pd.Series) -> pd.DataFrame:
    rows = [parse_seo_metrics_py(u, c) for u, c in zip(url, content)]
    return pd.DataFrame(rows, index=url.index)


def page_text(spans_col: str = "spans"):
    """Concatenated text of a doc's text spans in offset order (pure Catalyst)."""
    ordered = F.array_sort(
        F.col(spans_col), lambda a, b: F.when(a["offset"] < b["offset"], -1).when(a["offset"] > b["offset"], 1).otherwise(0)
    )
    texts = F.transform(
        F.filter(ordered, lambda s: s["kind"] == F.lit("text")), lambda s: s["text"]
    )
    return F.array_join(texts, " ")


def structured_data_types(content_col):
    """JSON-LD structured-data extraction (content_parser.py:83-102): pull
    every <script type="application/ld+json"> block and read its @type —
    pure Catalyst (regexp_extract_all + get_json_object), no UDF. Returns
    array<string> of @type values (null entries for unparsable blocks are
    filtered)."""
    c = content_col if not isinstance(content_col, str) else F.col(content_col)
    # (?s): real-world ld+json blocks are pretty-printed across lines — without
    # DOTALL the '.' stops at the first newline and every such block is missed.
    blocks = F.regexp_extract_all(
        c,
        F.lit(r'(?s)<script type="application/ld\+json">\s*(\{.*?\})\s*</script>'),
        1,
    )
    types = F.transform(blocks, lambda b: F.get_json_object(b, "$['@type']"))
    return F.filter(types, lambda t: t.isNotNull())


def has_structured_data(content_col):
    return F.size(structured_data_types(content_col)) > 0


def content_type_classify(content_type_header):
    """P11 (web_crawler.py:289-297): header -> HTML/PDF/IMAGE/OTHER."""
    c = F.lower(F.coalesce(content_type_header, F.lit("")))
    return (
        F.when(c.contains("text/html"), "html")
        .when(c.contains("application/pdf"), "pdf")
        .when(c.startswith("image/"), "image")
        .otherwise("other")
    )
