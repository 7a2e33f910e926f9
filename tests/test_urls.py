"""URL helpers: canonicalization modes (P13) and host/path extraction parity
between the Catalyst expressions and the pandas fallback."""

from itertools import product
from urllib.parse import urlparse

import pandas as pd
import pyspark.sql.functions as F

from link_profiler_repo_spark.functions.urls import (
    canonicalize,
    canonicalize_py,
    canonicalize_str,
    internal_external,
    is_valid_http_url,
    url_host,
)

URLS = [
    "HTTP://Example.COM:80/Path/Page?q=1#frag",
    "https://h.test:443/x",
    "http://h.test/p/00001",
    "http://user@h.test:8080/a#b",
    "http://h.test:443/x",  # NON-default port for http — must survive
    "https://h.test:80/x",  # NON-default port for https — must survive
]


def test_canonicalize_full_mode(spark):
    df = spark.createDataFrame([(u,) for u in URLS], schema="url string")
    got = [r["c"] for r in df.select(canonicalize("url", "full").alias("c")).collect()]
    assert got[0] == "http://example.com/Path/Page?q=1"
    assert got[1] == "https://h.test/x"
    assert got[2] == "http://h.test/p/00001"
    assert got[3] == "http://user@h.test:8080/a"
    # default-port strip is scheme-conditional (ADVICE r01)
    assert got[4] == "http://h.test:443/x"
    assert got[5] == "https://h.test:80/x"
    # pandas fallback produces identical strings (driver-side oracle parity)
    py = canonicalize_py(pd.Series(URLS), "full").tolist()
    assert py == got


def test_identity_mode_is_raw(spark):
    df = spark.createDataFrame([(URLS[0],)], schema="url string")
    got = df.select(canonicalize("url", "identity").alias("c")).collect()[0]["c"]
    assert got == URLS[0]


def test_host_and_validity(spark):
    df = spark.createDataFrame([(u,) for u in URLS + ["not-a-url", "mailto:a@b"]], schema="url string")
    rows = df.select(
        url_host("url").alias("h"), is_valid_http_url("url").alias("v")
    ).collect()
    assert rows[0]["h"] == "Example.COM:80"  # netloc as urlparse returns it
    assert rows[3]["h"] == "user@h.test:8080"
    assert [r["v"] for r in rows] == [True] * len(URLS) + [False, False]


def _combinatorial_urls() -> list[str]:
    """Adversarial corpus: full product of scheme x host x port x path x
    fragment features plus degenerate forms. Exercises every branch of the
    canonicalization regexes across three regex engines (Java/Catalyst,
    Python re, pandas)."""
    schemes = ["http", "HTTP", "https", "HTTPS", "ftp"]
    hosts = ["example.com", "Example.COM", "user@Host.test", "127.0.0.1", "host.test."]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/Path/Page", "//double/slash", "/p?q=1&x="]
    frags = ["", "#frag", "#a#b", "#", "#http://decoy:80/x"]
    urls = [
        f"{s}://{h}{p}{path}{f}"
        for s, h, p, path, f in product(schemes, hosts, ports, paths, frags)
    ]
    urls += ["http://", "http:///only/path", "https://#frag", "http://h#f", "not-a-url"]
    return urls


def test_canonicalize_three_way_parity(spark):
    """The engine (Catalyst regex), the oracle sims (canonicalize_str — the
    ONE identity rule the scheduler-parity tests depend on, ADVICE r03 #5),
    and the driver-side pandas fallback must canonicalize identically on the
    full combinatorial corpus; full mode must also be idempotent."""
    urls = _combinatorial_urls()
    df = spark.createDataFrame([(u,) for u in urls], schema="url string")
    for mode in ("identity", "full"):
        got = [
            r["c"] for r in df.select(canonicalize("url", mode).alias("c")).collect()
        ]
        scalar = [canonicalize_str(u, mode) for u in urls]
        assert got == scalar, f"Catalyst vs scalar twin diverged (mode={mode})"
        assert canonicalize_py(pd.Series(urls), mode).tolist() == scalar
        assert [canonicalize_str(c, mode) for c in scalar] == scalar  # idempotent


def test_url_host_matches_urlparse(spark):
    """url_host (Catalyst netloc regex) == urllib.parse.urlparse().netloc for
    every corpus URL that carries a scheme://netloc part."""
    urls = [u for u in _combinatorial_urls() if "://" in u]
    df = spark.createDataFrame([(u,) for u in urls], schema="url string")
    got = [r["h"] for r in df.select(url_host("url").alias("h")).collect()]
    assert got == [urlparse(u).netloc for u in urls]


def test_internal_external(spark):
    df = spark.createDataFrame(
        [("h.test", "h.test"), ("h.test", "other.test")], schema="a string, b string"
    )
    got = [r["k"] for r in df.select(internal_external(F.col("b"), F.col("a")).alias("k")).collect()]
    assert got == ["internal", "external"]
