"""Link-graph analytics: PageRank over the crawled edge graph.

The reference never computes authority itself — it fetches it from an
external API (`services/domain_service.py:149`:
openpagerank.com/api/v1.0/getPageRank, cached into
`Domain.authority_score`). This operator replaces that external dependency
with an in-engine computation over the edges the crawler already produces:
domain-level PageRank = the metric the API sells.

Scale shape: ranks live as a (node, rank) table partitioned by node; each
iteration is ONE shuffle (join ranks to edges on src, sum contributions by
dst) plus a single-row dangling-mass aggregate — no driver data beyond that
scalar. Out-degrees are computed once and carried WITH the edges so the loop
never re-aggregates them. Iterations are fixed-count (the openpagerank-style
0-10 score is a display transform; fixed k≈10 converges to ~1e-6 on web
graphs) which keeps the computation a pure dataflow — the same unrolled plan
DuckDB re-derives in the gate oracle. Lineage is truncated with
localCheckpoint every few rounds (cluster: checkpoint dir), same contract as
the crawl loop's epoch tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """PageRank over the directed graph given as (src_col, dst_col) rows →
    (node, rank). Parallel edges count once (the reference's edge store is
    keyed on the pair, so duplicates are upstream dedup's job — mirrored in
    the oracle). Dangling nodes (no out-edges) redistribute their mass
    uniformly, the standard correction, so sum(rank) == 1 every iteration."""
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    # out-degree carried with every edge: the loop's join then touches ONE
    # prebuilt table instead of re-aggregating degrees each iteration
    ed = e.join(deg, "src").localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        # materialize the iteration's input ONCE: the dangling aggregate and
        # the contribution join both read it, and lineage stays O(1)
        ranks = ranks.localCheckpoint(eager=True)
        # dangling mass: single-row aggregate, the loop's only driver value
        dangling = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = nodes.join(contrib, nodes["node"] == contrib["dst"], "left").select(
            "node",
            (
                F.lit(base)
                + F.lit(damping)
                * (F.coalesce(F.col("c"), F.lit(0.0)) + F.lit(damping_mass(dangling, n)))
            ).alias("rank"),
        )
    return ranks


def damping_mass(dangling: float, n: int) -> float:
    """Per-node share of the dangling mass (kept as a named helper so the
    Spark plan and the unrolled SQL oracle read the same formula)."""
    return dangling / n


def pagerank_oracle_sql(
    edges_sql: str,
    damping: float = 0.85,
    iters: int = 10,
    round_to: int = 6,
) -> str:
    """The SAME fixed-iteration dataflow as `pagerank`, unrolled into chained
    CTEs (standard SQL forbids aggregates in a recursive term, so the loop
    is unrolled — one CTE per iteration) for the DuckDB gate oracle.
    `edges_sql` must yield (src, dst) rows."""
    d = damping
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "pr0 AS (SELECT node, 1.0 / n.n AS rank FROM nodes, n)",
    ]
    for i in range(1, iters + 1):
        p = f"pr{i - 1}"
        # MATERIALIZED is load-bearing: each pr{{i}} references pr{{i-1}}
        # twice (dangling scalar + contribution join); inlined CTEs expand
        # the plan 2^iters-fold and hang the planner
        parts.append(
            f"""pr{i} AS MATERIALIZED (
  SELECT nodes.node,
         (1.0 - {d}) / n.n
         + {d} * (COALESCE(c.s, 0.0)
                  + (SELECT COALESCE(SUM(p.rank), 0.0) FROM {p} p
                     LEFT JOIN deg ON p.node = deg.src
                     WHERE deg.src IS NULL) / n.n) AS rank
  FROM nodes CROSS JOIN n
  LEFT JOIN (
    SELECT e.dst AS node, SUM(p.rank / deg.deg) AS s
    FROM e JOIN {p} p ON e.src = p.node JOIN deg ON deg.src = e.src
    GROUP BY e.dst
  ) c ON nodes.node = c.node
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, ROUND(rank, {round_to}) AS rank FROM pr{iters}"
    )
