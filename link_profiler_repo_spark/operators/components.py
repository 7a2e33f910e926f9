"""Connected components over near-duplicate pair graphs (dedup clustering).

Pair detectors (MinHash/LSH, CDC containment, embedding cosine — dedup.py)
emit EDGES; what a training-data pipeline actually consumes is CLUSTERS: one
canonical document kept per connected component of the near-dup graph
(transitivity matters — A~B and B~C must collapse to ONE keeper even when
A~C was never emitted). The reference has no counterpart (its dedup is
whole-URL exact); this is one of the added LLM-pipeline operators.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi, Mirrokni,
Rastogi, Vassilvitskii — "Connected Components in MapReduce and Beyond",
SoCC 2014). Each round is ONE groupBy-shuffle rendered as an aggregate +
self-join (never collect_list — a hot node's neighborhood is aggregated with
min(), so a 10^8-degree spam hub costs the same as a degree-2 node);
converges in O(log² n) rounds regardless of component diameter — a
min-label-propagation loop would need O(diameter) rounds, unbounded on
chain-shaped duplicate runs (scraped pagination, boilerplate drift). Every
round ends in localCheckpoint to truncate lineage (on a cluster: a
checkpoint dir / intermediate table — same contract as the crawl loop's
epoch state tables).

Scale shape at 100 TB: the edge table shuffles on node id once per round;
star-contraction strictly shrinks (large-star points high nodes at their
neighborhood min, small-star flattens the remaining chains), so round cost
is non-increasing. No driver data beyond the per-round convergence checksum
(one count+hash agg row).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def _dedup_edges(edges: DataFrame) -> DataFrame:
    """Canonicalize an undirected edge list to distinct (hi u, lo v) pairs,
    self-loops dropped."""
    return (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star(E): for every node u, connect each STRICTLY LARGER neighbor
    v to m = min(Γ(u) ∪ {u}). One agg + one join, both keyed on u."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.first("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star(E): with edges oriented (u > v), connect each v ∈ Γ⁻(u) and
    u itself to m = min(Γ⁻(u)); emitted as (hi, lo), self-loops dropped."""
    e = _dedup_edges(edges)  # orient u > v
    mins = e.groupBy("u").agg(F.min("v").alias("m"))
    linked = e.join(mins, "u").select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    root = mins.select(F.col("u"), F.col("m").alias("v"))
    return _dedup_edges(linked.union(root))


def connected_components(
    edges: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components of the undirected graph given as (a_col, b_col)
    pairs → (node, component) rows, component = MIN node id in the component,
    one row per node that appears in any edge (isolated nodes are the
    caller's no-op — they never entered the pair graph).

    Alternates large-star/small-star until the edge set reaches its fixpoint
    (a forest of depth-1 stars rooted at each component's min). Convergence
    is detected with one count + order-insensitive hash-sum agg per round —
    the only driver-side data in the loop."""
    e = _dedup_edges(edges.select(F.col(a_col).alias("u"), F.col(b_col).alias("v")))
    e = e.localCheckpoint(eager=True)

    def _sig(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("n"),
            # decimal sum: order-insensitive and overflow-free under ANSI
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (row["n"], row["h"])

    sig = _sig(e)
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig2 = _sig(e2)
        e = e2
        if sig2 == sig:  # star fixpoint: every edge is (node, component-min)
            break
        sig = sig2
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    roots = e.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return e.select(
        F.col("u").alias("node"), F.col("v").alias("component")
    ).union(roots)


def dedup_clusters(
    pairs: DataFrame, a_col: str = "a", b_col: str = "b"
) -> DataFrame:
    """Near-dup pairs → (doc_id, cluster_id) with cluster_id = min doc_id of
    the transitive near-dup cluster."""
    return connected_components(pairs, a_col=a_col, b_col=b_col).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


def dedup_keep(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """The pipeline composition a 100 TB corpus build runs: docs + near-dup
    pairs → docs annotated with (cluster_id, keep). keep = the doc is its
    cluster's canonical representative (min id) or was never paired. One
    broadcast-or-shuffle left join on the doc id; the cluster table is
    |paired docs| rows — tiny next to the corpus."""
    clusters = dedup_clusters(pairs, a_col=a_col, b_col=b_col).withColumnRenamed(
        "doc_id", id_col
    )
    return docs.join(clusters, id_col, "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col(id_col))
    ).withColumn("keep", F.col("cluster_id") == F.col(id_col))
