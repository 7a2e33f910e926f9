"""URL column helpers — pure Catalyst where possible (no Python).

Reference analogs:
  host extraction   urlparse(url).netloc            core/models.py:356-361
  validity filter   scheme AND netloc               utils/url_validator.py:20-26
  content/URL hash  MD5 -> upgraded to SHA-256      utils/content_validator.py:83
                                                    (north_rule mandates sha2-256)
  canonicalization  none in reference (P13 in SURVEY §2.2) — raw string identity;
                    'full' mode is this engine's documented deviation.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column

_NETLOC_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)"


def url_host(url: Column | str) -> Column:
    """netloc, as urlparse returns it (userinfo/port included, case kept)."""
    return F.regexp_extract(F.col(url) if isinstance(url, str) else url, _NETLOC_RE, 1)


def url_path(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*(/[^?#]*)", 1)


def is_valid_http_url(url: Column | str) -> Column:
    # scheme match is case-insensitive: urlparse lowercases the scheme, so
    # the reference validator accepts HTTP:// (utils/url_validator.py:20-26)
    c = F.col(url) if isinstance(url, str) else url
    return c.rlike(r"(?i)^https?://[^/?#]+")


def url_sha256(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.sha2(c, 256)


def canonicalize(url: Column | str, mode: str = "identity") -> Column:
    """mode='identity': raw string (matches reference dedup-on-raw-string,
    crawl_service.py:497,599 — required for ordering equality).
    mode='full': strip fragment, lowercase scheme+host, drop default port —
    pure Catalyst (regexp), no Python."""
    c = F.col(url) if isinstance(url, str) else url
    if mode == "identity":
        return c
    no_frag = F.regexp_replace(c, r"#.*$", "")
    # lowercase scheme://host part only, keep path case
    head = F.lower(F.regexp_extract(no_frag, r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", 1))
    tail = F.regexp_replace(no_frag, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*", "")
    # default-port strip is scheme-conditional: :80 is only the default for
    # http, :443 only for https — http://host:443 stays distinct (ADVICE r01)
    head = F.regexp_replace(head, r"^(http://.+):80$", "$1")
    head = F.regexp_replace(head, r"^(https://.+):443$", "$1")
    return F.concat(head, tail)


def internal_external(link_host: Column, page_host: Column) -> Column:
    """reference: crawlers/content_parser.py:47-59 — same netloc => internal."""
    return F.when(link_host == page_host, F.lit("internal")).otherwise(F.lit("external"))


def canonicalize_str(url: str, mode: str = "identity") -> str:
    """Scalar twin of canonicalize() — the oracle sims key their seen/enqueued
    sets on this so engine and sim share ONE identity rule (ADVICE r03 #5:
    under mode='full' a sitemap URL differing from a seed only in canonical
    form must dedup identically in both)."""
    if mode == "identity":
        return url
    import re

    s = re.sub(r"#.*$", "", url)
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*", s)
    if not m:
        return s
    head, tail = s[: m.end()].lower(), s[m.end():]
    head = re.sub(r"^(http://.+):80$", r"\1", head)
    head = re.sub(r"^(https://.+):443$", r"\1", head)
    return head + tail


# pandas fallback used by driver-side oracle code paths
def canonicalize_py(url: pd.Series, mode: str = "identity") -> pd.Series:
    if mode == "identity":
        return url
    s = url.str.replace(r"#.*$", "", regex=True)
    head = s.str.extract(r"^([a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*)", expand=False).str.lower()
    tail = s.str.replace(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*", "", regex=True)
    head = head.str.replace(r"^(http://.+):80$", r"\1", regex=True)
    head = head.str.replace(r"^(https://.+):443$", r"\1", regex=True)
    return head.fillna("") + tail
