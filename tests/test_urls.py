"""URL helpers: canonicalization modes (P13) and host/path extraction parity
between the Catalyst expressions and the pandas fallback."""

import pandas as pd
import pyspark.sql.functions as F

from link_profiler_repo_spark.functions.urls import (
    canonicalize,
    canonicalize_py,
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


def test_internal_external(spark):
    df = spark.createDataFrame(
        [("h.test", "h.test"), ("h.test", "other.test")], schema="a string, b string"
    )
    got = [r["k"] for r in df.select(internal_external(F.col("b"), F.col("a")).alias("k")).collect()]
    assert got == ["internal", "external"]
