"""Deterministic synthetic web corpus (FIXTURES.md §1).

One row per fetchable page: docs(doc_id, spans array<struct<kind,text,media_ref,offset>>)
where doc_id IS the page URL. Every doc is a pure function of
(seed, doc_index, params): the same spans are produced whether generated
driver-side (for the pure-Python oracle) or distributed (mapInPandas over
spark.range) — so oracle and engine always see the identical web.

Shape rules (FIXTURES.md §1): hosts h000.test…; 3-12 spans/doc interleaving
text/media kinds; text spans embed 0-8 outlinks in document order; ~70%
same-host / ~30% cross-host targets; a fraction dangling (404); rel sampled
from {none, nofollow, sponsored, ugc, "nofollow sponsored"}; some
mailto:/tel:/javascript: links (dropped by extraction); some relative hrefs;
one hot host holding ~30% of pages (north_rule skew); media spans reference
http://{host}/img/{n}.png.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd

WORDS = (
    "crawl link spark frontier page host data web graph index rank fetch "
    "queue depth seed robot delay batch shuffle join hash bloom filter span "
    "media text anchor domain profile edge node epoch state table column"
).split()


@dataclass(frozen=True)
class SynthParams:
    seed: int = 42
    n_hosts: int = 20  # includes the hot host (host 0)
    n_docs: int = 1000
    hot_frac: float = 0.30  # fraction of all pages on host 0
    p_dangling: float = 0.08  # outlink target beyond the host's page range (404)
    p_badscheme: float = 0.05  # mailto:/tel:/javascript: links (must be dropped)
    p_relative: float = 0.10  # relative hrefs (urljoin exercise)
    p_private: float = 0.04  # /private/ path targets (robots-disallowed hosts)
    p_canonical: float = 0.10  # docs carrying a <link rel="canonical"> tag
    flaky_host_mod: int = 7  # hosts with h % mod == 3 always return 503
    max_links: int = 8

    @property
    def hot_n(self) -> int:
        return int(round(self.n_docs * self.hot_frac))

    @property
    def n_cold_hosts(self) -> int:
        return max(1, self.n_hosts - 1)


def host_name(h: int) -> str:
    return f"h{h:03d}.test"


def page_url(h: int, page: int) -> str:
    return f"http://{host_name(h)}/p/{page:05d}"


def doc_index_to_host_page(i: int, p: SynthParams) -> tuple[int, int]:
    if i < p.hot_n:
        return 0, i
    j = i - p.hot_n
    return 1 + j % p.n_cold_hosts, j // p.n_cold_hosts


def pages_in_host(h: int, p: SynthParams) -> int:
    if h == 0:
        return p.hot_n
    cold = p.n_docs - p.hot_n
    base, rem = divmod(cold, p.n_cold_hosts)
    return base + (1 if (h - 1) < rem else 0)


def fetch_status(url: str, doc_urls: set[str] | None, h: int, p: SynthParams) -> int:
    """Deterministic fetch outcome: 404 if absent from docs, 503 if the host is
    flaky (retry-exhausting, reference retryable set crawl_service.py:514), else 200."""
    if p.flaky_host_mod and h % p.flaky_host_mod == 3:
        return 503
    if doc_urls is not None and url not in doc_urls:
        return 404
    return 200


_REL_CHOICES = [None, "nofollow", "sponsored", "ugc", "nofollow sponsored"]
_REL_PROBS = [0.55, 0.15, 0.10, 0.10, 0.10]
_BAD_SCHEMES = ["mailto:someone@example.com", "tel:+15551234567", "javascript:void(0)"]


def _gen_one_doc(i: int, p: SynthParams) -> tuple[str, list[tuple[str, str, str, int]]]:
    """Spans for doc index i. Pure function of (p.seed, i)."""
    rng = np.random.default_rng([p.seed, i])
    h, page = doc_index_to_host_page(i, p)
    url = page_url(h, page)

    n_spans = int(rng.integers(3, 13))
    kinds = ["text" if rng.random() < 0.7 else "media" for _ in range(n_spans)]
    if "text" not in kinds:
        kinds[0] = "text"
    text_span_ids = [k for k, kd in enumerate(kinds) if kd == "text"]

    n_links = int(rng.integers(0, p.max_links + 1))
    # assign links to text spans, preserving document order: sorted assignment
    link_spans = sorted(int(rng.integers(0, len(text_span_ids))) for _ in range(n_links))

    # build hrefs in document order
    hrefs: list[tuple[int, str]] = []  # (text_span_slot, markup)
    for slot in link_spans:
        r = rng.random()
        if r < p.p_badscheme:
            href = _BAD_SCHEMES[int(rng.integers(0, len(_BAD_SCHEMES)))]
        else:
            same_host = rng.random() < 0.70
            th = h if same_host else int(rng.integers(0, p.n_hosts))
            npages = pages_in_host(th, p)
            if rng.random() < p.p_private:
                tp = int(rng.integers(0, max(npages, 1)))
                href = f"http://{host_name(th)}/private/{tp:05d}"
            elif rng.random() < p.p_dangling:
                tp = npages + int(rng.integers(0, 50))
                href = page_url(th, tp)
            else:
                tp = int(rng.integers(0, max(npages, 1)))
                if th == h and rng.random() < p.p_relative:
                    href = f"/p/{tp:05d}"  # relative — resolves against doc_id
                else:
                    href = page_url(th, tp)
        rel = _REL_CHOICES[int(rng.choice(len(_REL_CHOICES), p=_REL_PROBS))]
        anchor = " ".join(
            WORDS[int(w)] for w in rng.integers(0, len(WORDS), int(rng.integers(1, 4)))
        )
        rel_attr = f' rel="{rel}"' if rel else ""
        hrefs.append((slot, f'<a href="{href}"{rel_attr}>{anchor}</a>'))

    canonical_markup = None
    if rng.random() < p.p_canonical:
        canonical_markup = f'<link rel="canonical" href="{page_url(h, page)}">'

    spans: list[tuple[str, str, str, int]] = []
    media_i = 0
    for k, kd in enumerate(kinds):
        if kd == "media":
            spans.append(("media", "", f"http://{host_name(h)}/img/{media_i}.png", k))
            media_i += 1
        else:
            slot = text_span_ids.index(k)
            words = " ".join(
                WORDS[int(w)] for w in rng.integers(0, len(WORDS), int(rng.integers(2, 9)))
            )
            parts = [words]
            for s, markup in hrefs:
                if s == slot:
                    parts.append(markup)
            if canonical_markup and slot == 0:
                parts.insert(0, canonical_markup)
            spans.append(("text", " ".join(parts), "", k))
    return url, spans


def gen_docs_pandas(indices: np.ndarray, p: SynthParams) -> pd.DataFrame:
    rows = [_gen_one_doc(int(i), p) for i in indices]
    return pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "spans": [
                [
                    {"kind": k, "text": t, "media_ref": m, "offset": o}
                    for (k, t, m, o) in r[1]
                ]
                for r in rows
            ],
        }
    )


def synth_docs_spark(spark, p: SynthParams, num_partitions: int | None = None):
    """Distributed generation: spark.range -> mapInPandas with the same pure
    per-doc function. Partition count scales with data, not driver memory."""
    from .schemas import DOCS

    if num_partitions is None:
        num_partitions = max(4, spark.sparkContext.defaultParallelism)

    def gen(it):
        for pdf in it:
            yield gen_docs_pandas(pdf["id"].to_numpy(), p)

    return (
        spark.range(0, p.n_docs, numPartitions=num_partitions)
        .mapInPandas(gen, schema=DOCS)
    )


def gen_all_docs(p: SynthParams) -> dict[str, list[tuple[str, str, str, int]]]:
    """Driver-side full corpus (oracle path; small scales only)."""
    return {
        url: spans
        for url, spans in (_gen_one_doc(i, p) for i in range(p.n_docs))
    }


def default_seeds(p: SynthParams, n_seeds: int = 3, job_id: str = "job-0") -> list[tuple[str, str, int]]:
    """Seed list: first page of the first n_seeds hosts, in host order
    (reference enqueues initial_seed_urls in list order, crawl_service.py:487-489)."""
    return [
        (job_id, page_url(h, 0), h)
        for h in range(min(n_seeds, p.n_hosts))
    ]


def robots_rows(p: SynthParams) -> list[dict]:
    """Per-host robots fixtures (FIXTURES.md §3): every 3rd host disallows
    /private/, every 5th host (offset 1) sets Crawl-delay: 2; one host in three
    has no robots row at all (=> allow-all, robots_parser.py:120-125)."""
    rows = []
    for h in range(p.n_hosts):
        if h % 3 == 2:
            continue  # no robots row -> allow-all
        rows.append(
            {
                "host": host_name(h),
                "user_agent": "*",
                "disallow": ["/private/"] if h % 3 == 1 else [],
                "allow": [],
                "crawl_delay": 2.0 if h % 5 == 1 else None,
                "sitemaps": [],
            }
        )
    return rows


def robots_spark(spark, p: SynthParams):
    from .functions.localdf import local_df
    from .schemas import ROBOTS

    return local_df(spark, robots_rows(p), ROBOTS)


def domain_info_expr(name_col):
    """Deterministic domain-info attributes derived from a host/domain name
    (FIXTURES.md-style identity rule, shared by run_job standalone inputs,
    the prospects gate query, and its DuckDB twin — which re-derives the
    same arithmetic from the same regex): k = first digit-run in the name,
    then fixed modular mixes. Pure Catalyst; returns a struct column."""
    import pyspark.sql.functions as F

    k = F.coalesce(
        F.nullif(F.regexp_extract(name_col, r"(\d+)", 1), F.lit("")), F.lit("0")
    ).cast("int")
    return F.struct(
        ((k * 37) % 100).cast("double").alias("authority_score"),
        (((k * 13) % 10) / 10.0).alias("trust_score"),
        (((k * 3) % 10) / 10.0).alias("spam_score"),
        (((k * 3) % 10) * 10.0).alias("spam_pct"),
        (200 + (k * 97) % 3000).cast("int").alias("age_days"),
        ((k % 5) == 0).alias("available"),
    )


def domain_info_from_hosts(hosts_df, name_col: str = "name"):
    """(name, authority_score, trust_score, spam_score, spam_pct, age_days,
    available) for each distinct name in hosts_df[name_col] — the stand-in
    for the reference's domain_service.get_domain_info store. spam_score is
    the 0-1 scale (link_building_service.py:85 max_spam_score=0.3 contract);
    spam_pct the 0-100 scale (domain_analyzer_service.py spam<=30 contract)."""
    import pyspark.sql.functions as F

    d = hosts_df.select(F.col(name_col).alias("name")).distinct()
    return d.select("name", domain_info_expr(F.col("name")).alias("i")).select(
        "name", "i.*"
    )


def synth_pages_spark(spark, p: SynthParams):
    """(url, content) page fixtures: the doc's span text plus
    deterministically injected title/meta/h1/img markup — the
    seo_metrics_sql gate fixture, shared with the technical_audit job so
    both exercise the same parser surface."""
    import pyspark.sql.functions as F

    from .functions.seo import page_text

    docs = synth_docs_spark(spark, p)
    did = F.regexp_extract(F.col("doc_id"), r"/p/(\d+)$", 1).cast("int")
    content = F.concat(
        F.lit("<title>Doc "), did.cast("string"), F.lit(" overview</title>"),
        F.when(did % 2 == 0,
               F.concat(F.lit('<meta name="description" content="desc '),
                        did.cast("string"), F.lit('">'))).otherwise(F.lit("")),
        F.when(did % 3 == 0, F.lit("<h1>Main</h1><h2>Sub</h2><h2>Sub2</h2>")).otherwise(F.lit("<h1>Only</h1>")),
        F.when(did % 4 == 0, F.lit('<img src="a.png" alt="a"><img src="b.png">')).otherwise(F.lit("")),
        page_text("spans"),
    )
    return docs.select(F.col("doc_id").alias("url"), content.alias("content"))
