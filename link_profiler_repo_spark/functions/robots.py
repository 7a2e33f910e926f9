"""robots.txt ingestion + enforcement.

Reference: crawlers/robots_parser.py —
  fetch+parse with urllib.robotparser, 24h cache, 404 => allow-all,
  failure => allow-all (:65-127); sitemap extraction from `Sitemap:` lines
  (:149-171); can_fetch/crawl_delay lookups (:129-147).

Here the robots corpus is a small dimension TABLE (one row per host,
broadcast into the frontier plan — SURVEY J5) instead of a per-process cache:

- parse_robots_rows: raw robots.txt text -> ROBOTS-schema rows, one pass per
  (host, text) pair inside an Arrow batch (replaces the per-URL fetch+parse
  round trip).
- disallowed_catalyst: path-prefix Disallow matching as a pure Catalyst
  expression (the fixture grammar: prefix rules only) — whole-stage codegen,
  used by the engine's admission filter.
- robots_allowed_udf: the full-grammar fallback — Arrow-batched pandas UDF
  applying urllib.robotparser.RobotFileParser per host with a per-batch
  compiled-matcher cache, for real-world robots files with wildcards and
  Allow-precedence. Same signature, swap in when fixtures outgrow prefixes.
"""

from __future__ import annotations

from urllib import robotparser

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import Column


def parse_robots_text(host: str, text: str, user_agent: str = "*") -> dict:
    """One robots.txt document -> a ROBOTS row (missing/empty => allow-all,
    robots_parser.py:120-125)."""
    disallow: list[str] = []
    allow: list[str] = []
    sitemaps: list[str] = []
    crawl_delay = None
    active = False  # inside a user-agent block that applies to us
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "user-agent":
            active = val == "*" or val.lower() == user_agent.lower()
        elif key == "sitemap":
            sitemaps.append(val)  # sitemap lines are global (:149-171)
        elif active and key == "disallow" and val:
            disallow.append(val)
        elif active and key == "allow" and val:
            allow.append(val)
        elif active and key == "crawl-delay":
            try:
                crawl_delay = float(val)
            except ValueError:
                pass
    return {
        "host": host,
        "user_agent": user_agent,
        "disallow": disallow,
        "allow": allow,
        "crawl_delay": crawl_delay,
        "sitemaps": sitemaps,
    }


def parse_robots_df(df, host_col: str = "host", text_col: str = "robots_txt"):
    """(host, robots_txt) DataFrame -> ROBOTS-schema DataFrame, Arrow-batched."""
    from ..schemas import ROBOTS

    def run(batches):
        for pdf in batches:
            rows = [
                parse_robots_text(h, t)
                for h, t in zip(pdf[host_col], pdf[text_col])
            ]
            yield pd.DataFrame(rows)

    return df.select(host_col, text_col).mapInPandas(run, schema=ROBOTS)


def disallowed_catalyst(url: Column, disallow: Column) -> Column:
    """True if the URL's path starts with any Disallow prefix. Pure Catalyst:
    no Python in the admission hot path."""
    path = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*(/[^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return F.exists(
        F.coalesce(disallow, F.array()),
        lambda pref: (F.length(pref) > 0) & path.startswith(pref),
    )


def make_robots_allowed_udf(rules_by_host: dict[str, list[str]], user_agent: str = "*"):
    """Full-grammar matcher: dict host -> raw robots.txt lines, compiled once
    per python worker (closure), probed in Arrow batches.
    (reference: robots_parser.py:129-147 can_fetch)"""
    compiled: dict[str, robotparser.RobotFileParser] = {}

    def _matcher(host: str) -> robotparser.RobotFileParser | None:
        if host not in compiled:
            lines = rules_by_host.get(host)
            if lines is None:
                compiled[host] = None  # type: ignore[assignment]
            else:
                rp = robotparser.RobotFileParser()
                rp.parse(lines)
                compiled[host] = rp
        return compiled[host]

    @F.pandas_udf(T.BooleanType())
    def robots_allowed(host: pd.Series, url: pd.Series) -> pd.Series:
        out = []
        for h, u in zip(host, url):
            rp = _matcher(h)
            out.append(True if rp is None else rp.can_fetch(user_agent, u))
        return pd.Series(out, index=host.index)

    return robots_allowed


def extract_sitemaps(robots_df):
    """S4: one row per (host, sitemap URL)."""
    return robots_df.select(
        "host", F.explode(F.coalesce("sitemaps", F.array())).alias("sitemap_url")
    )
