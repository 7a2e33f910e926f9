"""Connected-components dedup clustering: goldens on known topologies, a
hypothesis property test against a naive union-find twin, and the
dedup_keep composition."""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from link_profiler_repo_spark.operators.components import (
    connected_components,
    dedup_clusters,
    dedup_keep,
)


def _cc(spark, edges, max_iter=50):
    df = spark.createDataFrame(edges, schema="a long, b long")
    rows = connected_components(df, max_iter=max_iter).collect()
    return {r["node"]: r["component"] for r in rows}


def _union_find(edges):
    """Naive twin: path-compressed union-find, min-id labels."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_chain_collapses_to_min(spark):
    # a 12-node chain: diameter >> round count — the case min-label
    # propagation is slow on and star-contraction solves in O(log n)
    got = _cc(spark, [(i, i + 1) for i in range(12)])
    assert got == {i: 0 for i in range(13)}


def test_two_components_and_star(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11), (10, 12), (10, 13)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_self_loops_and_duplicate_edges_ignored(spark):
    got = _cc(spark, [(5, 5), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}  # pure self-loop node never entered the graph


def test_empty_edges(spark):
    assert _cc(spark, []) == {}


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
def test_components_match_union_find(spark, edges):
    real = [(a, b) for a, b in edges if a != b]
    got = _cc(spark, edges)
    assert got == _union_find(real)


def test_dedup_keep_composition(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], schema="doc_id long, text string"
    )
    pairs = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], schema="a long, b long")
    rows = {r["doc_id"]: r for r in dedup_keep(docs, pairs).collect()}
    assert {d: r["cluster_id"] for d, r in rows.items()} == {
        0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4,
    }
    assert {d for d, r in rows.items() if r["keep"]} == {0, 3, 4}


def test_dedup_clusters_column_names(spark):
    pairs = spark.createDataFrame([(7, 9)], schema="a long, b long")
    df = dedup_clusters(pairs)
    assert df.columns == ["doc_id", "cluster_id"]
    assert {(r["doc_id"], r["cluster_id"]) for r in df.collect()} == {(7, 7), (9, 7)}


def test_chain_converges_in_log_rounds(spark):
    # O(log^2 n) convergence is the reason to use star-contraction over
    # min-label propagation (which needs diameter rounds): a 64-edge chain
    # must converge well under the 64 rounds propagation would take
    df = spark.createDataFrame([(i, i + 1) for i in range(64)], schema="a long, b long")
    rows = connected_components(df, max_iter=12).collect()
    assert {r["node"] for r in rows} == set(range(65))
    assert {r["component"] for r in rows} == {0}
