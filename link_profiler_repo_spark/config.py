"""Crawl configuration — the single canonical config replacing the reference's
CrawlConfig dataclass (reference: core/models.py:77-116) and queue-system knobs
(config/config.yaml:333-343).

Defaults mirror the reference exactly:
  max_depth=3, max_pages=1000 (core/models.py:79-80), delay_seconds=1.0
  (core/models.py:81), respect_robots_txt=True (core/models.py:82),
  max_retries=3 / retry_delay_seconds=5.0 (core/models.py:86-87),
  host_budget=2 == queue_system.domain_max_concurrent (config/config.yaml:342),
  allowed_domains empty => all allowed (core/models.py:118-121).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    job_id: str = "job-0"
    max_depth: int = 3
    max_pages: int = 1000
    delay_seconds: float = 1.0
    respect_robots_txt: bool = True
    allowed_domains: frozenset[str] = field(default_factory=frozenset)
    disallowed_paths: tuple[str, ...] = ()
    max_retries: int = 3
    retry_delay_seconds: float = 5.0
    # P10 content-size guard (reference CrawlConfig size cap semantics,
    # crawlers/web_crawler.py response-size check): a 200 page whose total
    # text-span length exceeds this is counted as crawled but yields no
    # links. None = disabled (the reference default behavior).
    max_content_chars: int | None = None
    # queue_system.domain_max_concurrent (config.yaml:342): per-host admissions
    # per scheduling epoch in the scheduler mode.
    host_budget: int = 2
    # logical epoch duration in seconds for the politeness budget: a host with
    # crawl_delay d may be issued min(host_budget, floor(epoch_seconds/d))
    # fetches per epoch (reference gate: smart_crawler_queue.py:76-79 — wall
    # clock there, logical time here so runs are deterministic; the oracle
    # simulator applies the identical rule).
    epoch_seconds: float = 2.0
    # Sitemap discovery (robots_parser.py:149-171 get_sitemap_urls feeding
    # the crawl): robots `Sitemap:` URLs join the scheduler frontier as
    # depth-0 candidates after the user seeds, ordered by (host, position).
    sitemap_seeding: bool = True

    def is_domain_allowed(self, host: str) -> bool:
        # reference: core/models.py:118-121 — empty set allows all
        if not self.allowed_domains:
            return True
        return host in self.allowed_domains
