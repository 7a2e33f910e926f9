"""Checkpoint/resume (SURVEY §5.2-5): kill after epoch k, resume, final state
and ordering identical to an uninterrupted run. Resume reads the atomically
committed manifest; epochs re-run from the last commit (exactly-once, vs the
reference's at-least-once Redis persistence, smart_crawler_queue.py:229-254)."""

import tempfile

from link_profiler_repo_spark.config import CrawlConfig
from link_profiler_repo_spark.operators.crawl import CrawlEngine
from link_profiler_repo_spark.oracle_sim import build_fixture, simulate_bfs
from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

P = SynthParams(n_docs=100, n_hosts=6)
CFG = CrawlConfig(max_depth=3, max_pages=400)


class _StopAfter(Exception):
    pass


def test_bfs_resume_matches_uninterrupted(spark):
    docs, seeds = build_fixture(P, n_seeds=2)
    expected = simulate_bfs(docs, seeds, CFG, P)
    docs_df = synth_docs_spark(spark, P).persist()
    docs_df.count()

    wd = tempfile.mkdtemp()
    eng = CrawlEngine(spark, CFG, docs_df, wd, synth_params=P, bloom_bits=1 << 16, metrics_enabled=False)

    # crash mid-run: abort after the commit of epoch 2
    original_commit = eng.store.commit

    def crashing_commit(meta):
        original_commit(meta)
        if meta["epoch"] == 2:
            raise _StopAfter()

    eng.store.commit = crashing_commit
    try:
        eng.run_bfs(seeds)
        raise AssertionError("expected simulated crash")
    except _StopAfter:
        pass

    # resume with a fresh engine over the same workdir
    eng2 = CrawlEngine(spark, CFG, docs_df, wd, synth_params=P, bloom_bits=1 << 16, metrics_enabled=False)
    out = eng2.run_bfs(seeds, resume=True)
    got = [
        (int(r["crawl_order"]), r["url"], int(r["depth"]))
        for r in out["seen"].orderBy("crawl_order").select("crawl_order", "url", "depth").collect()
    ]
    assert got == expected.order
    assert {u for _, u, _ in got} == expected.seen
    docs_df.unpersist()
