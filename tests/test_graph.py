"""PageRank operator: exact equality with a naive numpy twin (same fixed
iteration count, same dangling redistribution), structural sanity, and a
hypothesis sweep over small random graphs."""

import numpy as np
import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from link_profiler_repo_spark.operators.graph import pagerank


def _numpy_pagerank(edges, damping=0.85, iters=10):
    edges = sorted(set(edges))
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for a, b in edges:
        out.setdefault(a, set()).add(b)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        nr = np.full(n, (1 - damping) / n)
        dang = sum(r[idx[v]] for v in nodes if v not in out)
        nr += damping * dang / n
        for a, bs in out.items():
            for b in bs:
                nr[idx[b]] += damping * r[idx[a]] / len(bs)
        r = nr
    return {v: float(r[idx[v]]) for v in nodes}


def _spark_pagerank(spark, edges, iters=10):
    df = spark.createDataFrame(edges, schema="src string, dst string")
    return {
        r["node"]: r["rank"] for r in pagerank(df, iters=iters).collect()
    }


def _close(got, exp, tol=1e-9):
    assert got.keys() == exp.keys()
    return all(abs(got[k] - exp[k]) < tol for k in got)


def test_pagerank_matches_numpy_with_dangling_and_hub(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "c"),
             ("c", "e")]  # e dangling, c a hub
    got = _spark_pagerank(spark, edges)
    assert _close(got, _numpy_pagerank(edges))
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conserved
    assert max(got, key=got.get) == "c"


def test_pagerank_disconnected_components(spark):
    edges = [("a", "b"), ("b", "a"), ("x", "y")]  # y dangling
    got = _spark_pagerank(spark, edges)
    assert _close(got, _numpy_pagerank(edges))


def test_pagerank_duplicate_edges_count_once(spark):
    got = _spark_pagerank(spark, [("a", "b"), ("a", "b"), ("a", "c")])
    exp = _numpy_pagerank([("a", "b"), ("a", "c")])
    assert _close(got, exp)


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=25,
    ).filter(lambda es: any(a != b for a, b in es))
)
def test_pagerank_matches_numpy_random(spark, edges):
    named = [(f"n{a}", f"n{b}") for a, b in edges if a != b]
    got = _spark_pagerank(spark, named, iters=5)
    assert _close(got, _numpy_pagerank(named, iters=5))


def _numpy_hits(edges, iters=10):
    es = sorted(set(edges))
    nodes = sorted({x for e in es for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(iters):
        a = np.zeros(n)
        for s, d in es:
            a[idx[d]] += h[idx[s]]
        a /= a.sum() or 1.0
        h = np.zeros(n)
        for s, d in es:
            h[idx[s]] += a[idx[d]]
        h /= h.sum() or 1.0
    return {v: (float(h[idx[v]]), float(a[idx[v]])) for v in nodes}


def test_hits_matches_numpy(spark):
    from link_profiler_repo_spark.operators.graph import hits

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "c"),
             ("c", "e")]
    df = spark.createDataFrame(edges, schema="src string, dst string")
    got = {r["node"]: (r["hub"], r["authority"]) for r in hits(df).collect()}
    exp = _numpy_hits(edges)
    assert got.keys() == exp.keys()
    for k in got:
        assert abs(got[k][0] - exp[k][0]) < 1e-9
        assert abs(got[k][1] - exp[k][1]) < 1e-9
    # c is the authority (everyone links to it), a/d are hubs into it
    assert max(got, key=lambda k: got[k][1]) == "c"


def _numpy_trustrank(edges, seeds, a=0.85, iters=10):
    es = sorted(set(edges))
    nodes = sorted({x for e in es for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    s = [v for v in nodes if v in set(seeds)]
    d = np.zeros(n)
    for v in s:
        d[idx[v]] = 1.0 / len(s)
    deg = np.zeros(n)
    for u, _ in es:
        deg[idx[u]] += 1
    t = d.copy()
    for _ in range(iters):
        dangling = t[deg == 0].sum()
        c = np.zeros(n)
        for u, v in es:
            c[idx[v]] += t[idx[u]] / deg[idx[u]]
        t = (1 - a) * d + a * (c + dangling * d)
    return {v: float(t[idx[v]]) for v in nodes}


def test_trustrank_matches_numpy(spark):
    from link_profiler_repo_spark.operators.graph import trustrank

    edges = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c"), ("d", "c"),
             ("c", "e"), ("e", "f")]  # f dangling
    seeds = ["a", "d", "zz-not-in-graph"]
    edf = spark.createDataFrame(edges, schema="src string, dst string")
    sdf = spark.createDataFrame([(s,) for s in seeds], schema="node string")
    got = {r["node"]: r["trust"] for r in trustrank(edf, sdf).collect()}
    exp = _numpy_trustrank(edges, seeds)
    assert got.keys() == exp.keys()
    for k in got:
        assert abs(got[k] - exp[k]) < 1e-9
    # trust is a distribution (dangling re-teleports to seeds)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # b is reachable only through the graph, never a seed: less than seed a
    assert got["b"] < got["a"]


def test_trustrank_no_seeds_in_graph(spark):
    from link_profiler_repo_spark.operators.graph import trustrank

    edf = spark.createDataFrame([("a", "b")], schema="src string, dst string")
    sdf = spark.createDataFrame([("zz",)], schema="node string")
    got = {r["node"]: r["trust"] for r in trustrank(edf, sdf).collect()}
    assert got == {"a": 0.0, "b": 0.0}


def test_spam_mass_separates_trusted_from_spam(spark):
    from link_profiler_repo_spark.operators.graph import spam_mass

    # trusted clique a<->b, plus a spam farm s1..s4 all boosting "spam"
    # with no path from the trusted core
    edges = [("a", "b"), ("b", "a")] + [
        (f"s{i}", "spam") for i in range(1, 5)
    ] + [("spam", "s1")]
    edf = spark.createDataFrame(edges, schema="src string, dst string")
    sdf = spark.createDataFrame([("a",), ("b",)], schema="node string")
    got = {r["node"]: r["spam_mass"] for r in spam_mass(edf, sdf).collect()}
    # the farm target's rank owes ~nothing to the trusted core
    assert got["spam"] > 0.95
    # the trusted pair holds more trust than uniform rank -> negative mass
    assert got["a"] < 0 and got["b"] < 0


def test_resolve_redirects_doubling_matches_walk(spark):
    """Pointer doubling vs a naive Python walk on a random function graph
    (every node redirects somewhere -> plenty of cycles + long chains)."""
    from link_profiler_repo_spark.operators.graph import resolve_redirects

    import random as _r

    rng = _r.Random(7)
    n = 120
    m = {f"n{i}": f"n{rng.randrange(n + 30)}" for i in range(n)}
    max_hops = 16

    def walk(s):
        cur, hops = m[s], 1
        while cur in m and hops <= max_hops:
            cur = m[cur]
            hops += 1
        if cur in m or hops > max_hops:
            return (None, None, False)
        return (cur, hops, True)

    df = spark.createDataFrame(list(m.items()), "src string, dst string")
    got = {
        r["src"]: (r["final_url"], r["hops"], r["resolved"])
        for r in resolve_redirects(df, max_hops=max_hops).collect()
    }
    assert got == {s: walk(s) for s in m}


def test_resolve_redirects_rounds_are_logarithmic(spark):
    """A 16-hop chain resolves in ceil(log2(16)) = 4 self-joins — count the
    localCheckpoints as a proxy for rounds via the loop bound."""
    import math

    assert math.ceil(math.log2(16)) == 4  # the loop bound used for 16 hops
    from link_profiler_repo_spark.operators.graph import resolve_redirects

    chain = [(f"x{i}", f"x{i+1}") for i in range(16)]
    df = spark.createDataFrame(chain, "src string, dst string")
    got = {r["src"]: r for r in resolve_redirects(df, max_hops=16).collect()}
    assert got["x0"]["final_url"] == "x16" and got["x0"]["hops"] == 16
    assert got["x0"]["resolved"] is True


def test_pagerank_layout_joins_edges_without_reshuffle(spark):
    """The layout contract pagerank/trustrank rely on: a src-repartitioned
    CACHED edge table feeds the per-iteration contribution join with no
    edges-side Exchange — only the O(|V|) rank rows shuffle. (localCheckpoint
    loses outputPartitioning under AQE; the cache keeps it.)"""
    from link_profiler_repo_spark.plans.inspect import physical_plan

    e = spark.range(20000).select(
        F.concat(F.lit("h"), (F.col("id") % 500).cast("string")).alias("src"),
        F.concat(F.lit("h"), ((F.col("id") * 7 + 1) % 500).cast("string")).alias("dst"),
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    ed = e.join(deg, "src").repartition("src").persist()
    ed.count()
    ranks = spark.range(500).select(
        F.concat(F.lit("h"), F.col("id").cast("string")).alias("node"),
        F.lit(1.0).alias("rank"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum("rank").alias("s"))
        )
        j.collect()
        plan = physical_plan(j, "simple")
        # look only ABOVE the cached relation's stored build lineage
        head = plan.split("InMemoryRelation")[0]
        assert "InMemoryTableScan" in head, plan
        assert "Exchange hashpartitioning(src" not in head, head
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        ed.unpersist()


# --- link_networks (WCC + degree/reciprocity summary) ---


def test_link_networks_golden(spark):
    from link_profiler_repo_spark.operators.graph import link_networks

    # two components: a reciprocal triangle pair {a,b,c} (a<->b both ways,
    # b->c, c->a) and a chain {x -> y -> z}; one duplicate edge and one
    # self-loop that must vanish
    edges = [
        ("a", "b"), ("b", "a"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "z"),
        ("a", "b"),  # dupe
        ("z", "z"),  # self-loop
    ]
    df = spark.createDataFrame(edges, schema="src string, dst string")
    got = {
        r["node"]: (
            r["component"], r["comp_size"], r["out_deg"], r["in_deg"], r["recip_deg"]
        )
        for r in link_networks(df).collect()
    }
    assert got == {
        "a": ("a", 3, 1, 2, 1),
        "b": ("a", 3, 2, 1, 1),
        "c": ("a", 3, 1, 1, 0),
        "x": ("x", 3, 1, 0, 0),
        "y": ("x", 3, 1, 1, 0),
        "z": ("x", 3, 0, 1, 0),
    }


# --- kcore (dense-core link-farm detection) ---


def _naive_kcore(edges, k):
    """Textbook simultaneous peeling on Python sets."""
    adj = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    while True:
        drop = {n for n, ns in adj.items() if len(ns) < k}
        if not drop:
            break
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]
    return {n: len(ns) for n, ns in adj.items() if ns}


def _spark_kcore(spark, edges, k):
    from link_profiler_repo_spark.operators.graph import kcore

    df = spark.createDataFrame(edges, schema="src string, dst string")
    return {r["node"]: r["core_deg"] for r in kcore(df, k=k).collect()}


def test_kcore_clique_survives_chain_peels(spark):
    # K5 clique (degree 4) + a 4-node tail hanging off one clique member:
    # at k=3 the tail cascades away round by round, the clique stays intact
    clique = [(f"q{i}", f"q{j}") for i in range(5) for j in range(i + 1, 5)]
    tail = [("q0", "t0"), ("t0", "t1"), ("t1", "t2"), ("t2", "t3")]
    got = _spark_kcore(spark, clique + tail, k=3)
    assert got == {f"q{i}": 4 for i in range(5)}


def test_kcore_empty_when_k_exceeds_density(spark):
    ring = [(f"r{i}", f"r{(i + 1) % 6}") for i in range(6)]
    assert _spark_kcore(spark, ring, k=3) == {}


def test_kcore_matches_naive_on_random_graphs(spark):
    import random

    rng = random.Random(1234)
    for trial in range(3):
        n = 40
        edges = [
            (f"n{rng.randrange(n)}", f"n{rng.randrange(n)}") for _ in range(160)
        ]
        for k in (2, 3):
            assert _spark_kcore(spark, edges, k) == _naive_kcore(edges, k), (
                trial,
                k,
            )


def test_kcore_oracle_unroll_is_idempotent_past_fixpoint():
    """Extra unrolled rounds must be no-ops: the gate oracle's safety
    argument. DuckDB runs the same fixture at 8 and 14 rounds."""
    import duckdb

    from link_profiler_repo_spark.operators.graph import kcore_oracle_sql
    from link_profiler_repo_spark.queries import _KCORE_EDGES_SQL

    con = duckdb.connect()
    a = con.execute(
        kcore_oracle_sql(_KCORE_EDGES_SQL, k=4, rounds=8)
        + " ORDER BY node"
    ).fetchall()
    b = con.execute(
        kcore_oracle_sql(_KCORE_EDGES_SQL, k=4, rounds=14)
        + " ORDER BY node"
    ).fetchall()
    assert a == b and len(a) == 30


def test_hashed_id_helpers_roundtrip_and_gating(spark):
    """The rankers' long-key tier: _hashed_ids_ok accepts a collision-free
    string node set and rejects already-integral keys; _restore_node_keys
    maps a hashed result back to the original keys losslessly."""
    from link_profiler_repo_spark.operators.graph import (
        _hashed_ids_ok,
        _restore_node_keys,
    )

    nodes = spark.createDataFrame(
        [(f"host{i}.example",) for i in range(50)], schema="node string"
    )
    assert _hashed_ids_ok(nodes)
    assert not _hashed_ids_ok(
        spark.range(50).select(F.col("id").alias("node"))
    )
    hashed = nodes.select(
        F.xxhash64("node").alias("node"), (F.length("node") * 1.0).alias("score")
    )
    back = _restore_node_keys(hashed, nodes).collect()
    assert sorted(r["node"] for r in back) == sorted(
        f"host{i}.example" for i in range(50)
    )
    assert all(r["score"] == float(len(r["node"])) for r in back)


def test_pagerank_long_keys_skip_hashing_and_match(spark):
    """Integer node ids take the native-key path (no re-key) and still match
    the numpy twin — the fallback the collision guard relies on."""
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    df = spark.createDataFrame(edges, schema="src long, dst long")
    got = {r["node"]: r["rank"] for r in pagerank(df, iters=5).collect()}
    exp = _numpy_pagerank(edges, iters=5)
    assert _close(got, exp)
