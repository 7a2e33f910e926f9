"""Crawler-trap detection (operators/frontier.py url_template/url_templates/
trap_hosts): template-normalization goldens, a python-twin sweep over a
random URL mix, duplicate-collapse and flag semantics, the approx mode, and
the pure-Catalyst plan lock."""

import re
from collections import Counter, defaultdict

import pyspark.sql.functions as F

from link_profiler_repo_spark.operators.frontier import (
    trap_hosts,
    url_template,
    url_templates,
)


def _templ(u):
    m = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://([^/?#]*)", u)
    host = m.group(1) if m else ""
    pm = re.match(r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*(/[^?#]*)", u)
    path = pm.group(1) if pm else ""
    qm = re.search(r"\?([^#]*)", u)
    q = qm.group(1) if qm else ""
    path_t = re.sub(r"[0-9]+", "{n}", re.sub(r"[0-9a-fA-F]{8,}", "{hex}", path))
    out = host + path_t
    if q != "":
        out += "?" + "&".join(sorted(re.sub(r"=[^&]*", "=*", q).split("&")))
    return host, out


def test_template_goldens(spark):
    cases = [
        ("https://a.com/cal/2020/7/15", "a.com/cal/{n}/{n}/{n}"),
        ("https://a.com/u/deadbeefcafe42/profile", "a.com/u/{hex}/profile"),
        ("https://a.com/s?b=2&a=99", "a.com/s?a=*&b=*"),
        ("https://a.com/s?a=99&b=2", "a.com/s?a=*&b=*"),
        ("https://a.com", "a.com"),
        ("https://a.com/?x=1#frag", "a.com/?x=*"),
        ("https://a.com/page?sid=s123x", "a.com/page?sid=*"),
        # 7 hex chars: below the {8,} run floor, digits still normalize
        ("https://a.com/u/beef123/x", "a.com/u/beef{n}/x"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r.url: r.t for r in df.select("url", url_template("url").alias("t")).collect()}
    for u, want in cases:
        assert got[u] == want, u
        assert _templ(u)[1] == want, u  # the twin agrees with the spec


def test_random_mix_matches_twin(spark):
    import random

    rng = random.Random(7)
    urls = []
    for _ in range(400):
        h = f"h{rng.randint(0, 3)}.test"
        kind = rng.randint(0, 3)
        if kind == 0:
            urls.append(f"https://{h}/cal/{rng.randint(1, 12)}/{rng.randint(1, 900)}")
        elif kind == 1:
            urls.append(f"https://{h}/page?sid=s{rng.randint(0, 10 ** 6)}x&p={rng.randint(0, 6)}")
        elif kind == 2:
            urls.append(f"https://{h}/article-{rng.randint(0, 30)}")
        else:
            urls.append(f"https://{h}")
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = {
        (r.host, r.template): (r.n_urls, r.host_urls)
        for r in url_templates(df).collect()
    }
    tw = defaultdict(set)
    for u in urls:
        tw[_templ(u)].add(u)
    host_tot = Counter()
    for (h, _), s in tw.items():
        host_tot[h] += len(s)
    assert got == {(h, t): (len(s), host_tot[h]) for (h, t), s in tw.items()}


def test_flag_semantics_and_dup_collapse(spark):
    urls = [f"https://t.test/cal/{i}" for i in range(10)] * 3  # dupes collapse
    urls += ["https://t.test/about"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    r = {x.host: x.asDict() for x in trap_hosts(df, min_urls=10, min_share=0.5).collect()}
    t = r["t.test"]
    assert (t["host_urls"], t["n_templates"], t["max_template_urls"]) == (11, 2, 10)
    assert t["trap_templates"] == 1 and t["is_trap"] == 1
    # same data, higher floor: not a trap
    r2 = trap_hosts(df, min_urls=11, min_share=0.5).collect()[0]
    assert r2.is_trap == 0 and r2.trap_templates == 0


def test_approx_mode_flags_the_same_host(spark):
    urls = [f"https://t.test/cal/{i}" for i in range(500)] + ["https://t.test/about"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    exact = trap_hosts(df, min_urls=100).collect()[0]
    approx = trap_hosts(df, min_urls=100, approx=True).collect()[0]
    assert exact.is_trap == 1 and approx.is_trap == 1
    assert abs(approx.max_template_urls - 500) / 500 < 0.1  # HLL default rsd


def test_plan_is_pure_catalyst(spark):
    df = spark.createDataFrame([("https://a.com/x?y=1",)], "url string")
    plan = trap_hosts(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_prune_trapped_caps_flagged_templates(spark):
    import hashlib

    from link_profiler_repo_spark.operators.frontier import prune_trapped

    cal = [f"https://trap.test/cal/{i % 12}/{i}" for i in range(150)]
    statics = [f"https://trap.test/{p}" for p in ("about", "contact")]
    healthy = [f"https://ok.test/article-{i}" for i in range(50)]
    urls = cal + statics + healthy
    df = spark.createDataFrame([(x,) for x in urls], "url string")
    kept = {r["url"] for r in prune_trapped(df, min_urls=100, cap=7).collect()}
    # healthy host + statics untouched
    assert set(statics) <= kept and set(healthy) <= kept
    # trap template capped at exactly the 7 smallest-md5 urls
    expect = set(sorted(cal, key=lambda x: (hashlib.md5(x.encode()).hexdigest(), x))[:7])
    assert kept & set(cal) == expect
    assert len(kept) == 50 + 2 + 7


def test_prune_trapped_noop_without_traps(spark):
    from link_profiler_repo_spark.operators.frontier import prune_trapped

    urls = [f"https://ok.test/p{i}" for i in range(30)]
    df = spark.createDataFrame([(x,) for x in urls], "url string")
    assert {r["url"] for r in prune_trapped(df).collect()} == set(urls)
