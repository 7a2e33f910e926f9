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


def test_pause_and_cancel_job_control(spark):
    """Pause/cancel polled at epoch boundaries (job_coordinator.py:282-369):
    'paused' stops after the last committed epoch and a resume completes the
    crawl identically to an uninterrupted run; 'cancelled' stops for good."""
    docs, seeds = build_fixture(P, n_seeds=2)
    expected = simulate_bfs(docs, seeds, CFG, P)
    docs_df = synth_docs_spark(spark, P).persist()
    docs_df.count()

    wd = tempfile.mkdtemp()
    eng = CrawlEngine(spark, CFG, docs_df, wd, synth_params=P, use_bloom=False, metrics_enabled=False)
    eng.store.write_control("paused")
    out = eng.run_bfs(seeds)
    assert eng.stats.stopped == "paused"
    assert eng.stats.crawled == 0  # paused before the first epoch ran

    # resume after un-pausing: identical final state
    eng2 = CrawlEngine(spark, CFG, docs_df, wd, synth_params=P, use_bloom=False, metrics_enabled=False)
    eng2.store.write_control("running")
    out = eng2.run_bfs(seeds, resume=True)
    got = [
        (int(r["crawl_order"]), r["url"], int(r["depth"]))
        for r in out["seen"].orderBy("crawl_order").select("crawl_order", "url", "depth").collect()
    ]
    assert got == expected.order

    # cancel is honored the same way
    wd2 = tempfile.mkdtemp()
    eng3 = CrawlEngine(spark, CFG, docs_df, wd2, synth_params=P, use_bloom=False, metrics_enabled=False)
    eng3.store.write_control("cancelled")
    eng3.run_bfs(seeds)
    assert eng3.stats.stopped == "cancelled"
    docs_df.unpersist()


def _rows(df):
    return sorted((r["url_hash"], int(r["epoch"])) for r in df.collect())


def test_compaction_crash_safe(spark):
    """A crash at ANY point during compaction must leave exactly one complete
    generation readable (ADVICE r01: the old in-place compact deleted the
    deltas before installing the replacement)."""
    import pyspark.sql.functions as F

    from link_profiler_repo_spark.state import StateStore

    wd = tempfile.mkdtemp()
    store = StateStore(wd, "compact-crash")
    for e in range(1, 4):
        df = spark.range(3).select(
            F.concat(F.lit(f"h{e}-"), F.col("id").cast("string")).alias("url_hash")
        )
        store.write_epoch("seen", e, df)
    before = _rows(store.read_deltas(spark, "seen", 3))
    assert len(before) == 9

    # crash AFTER the new generation is written but BEFORE the pointer bump:
    # the old generation must still be fully readable
    real_set_gen = store._set_gen
    store._set_gen = lambda t, g: (_ for _ in ()).throw(RuntimeError("crash"))
    try:
        store.compact(spark, "seen", 3)
        raise AssertionError("expected simulated crash")
    except RuntimeError:
        pass
    store._set_gen = real_set_gen
    assert _rows(store.read_deltas(spark, "seen", 3)) == before

    # crash AFTER the pointer bump but BEFORE old-gen deletion: the NEW
    # generation must be live (rows identical modulo the folded epoch column)
    import shutil as _shutil

    old_dir = store._table_dir("seen")  # the generation about to be replaced
    real_rmtree = _shutil.rmtree

    def crash_on_old(path, *a, **k):
        if str(path) == old_dir:
            raise RuntimeError("crash")
        return real_rmtree(path, *a, **k)

    try:
        _shutil.rmtree = crash_on_old
        try:
            store.compact(spark, "seen", 3)
        except RuntimeError:
            pass
    finally:
        _shutil.rmtree = real_rmtree
    after = store.read_deltas(spark, "seen", 3)
    assert sorted(r["url_hash"] for r in after.collect()) == sorted(h for h, _ in before)
    # and a fresh store over the same dir resolves the same generation
    store2 = StateStore(wd, "compact-crash")
    assert sorted(r["url_hash"] for r in store2.read_deltas(spark, "seen", 3).collect()) == sorted(
        h for h, _ in before
    )


def test_fresh_run_ignores_prior_state(spark, tmp_path):
    """A fresh (resume=False) run against a workdir that already holds a
    previous run's state — including a COMPACTED seen generation, whose
    directory a new run's epoch writes would never overwrite — must produce
    exactly the same crawl as a run against a clean workdir."""
    from link_profiler_repo_spark.config import CrawlConfig
    from link_profiler_repo_spark.operators.crawl import CrawlEngine
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark
    from link_profiler_repo_spark.oracle_sim import build_fixture, simulate_bfs

    p = SynthParams(n_docs=80, n_hosts=5)
    cfg = CrawlConfig(job_id="freshjob", max_depth=3, max_pages=60)
    docs, seeds = build_fixture(p, n_seeds=2)
    expected = simulate_bfs(docs, seeds, cfg, p)
    docs_df = synth_docs_spark(spark, p).persist()
    workdir = str(tmp_path / "state")

    def run():
        eng = CrawlEngine(
            spark, cfg, docs_df, workdir, synth_params=p,
            use_bloom=False, compact_every=1, metrics_enabled=False,
        )
        out = eng.run_bfs(seeds)
        return [
            (int(r["crawl_order"]), r["url"])
            for r in out["seen"].orderBy("crawl_order").collect()
        ]

    first = run()
    second = run()  # same workdir + job_id, fresh run over compacted leftovers
    assert first == second
    assert {u for _, u in first} == expected.seen
    docs_df.unpersist()
