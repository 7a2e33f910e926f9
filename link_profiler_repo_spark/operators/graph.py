"""Link-graph analytics: PageRank over the crawled edge graph.

The reference never computes authority itself — it fetches it from an
external API (`services/domain_service.py:149`:
openpagerank.com/api/v1.0/getPageRank, cached into
`Domain.authority_score`). This operator replaces that external dependency
with an in-engine computation over the edges the crawler already produces:
domain-level PageRank = the metric the API sells.

Scale shape: ranks live as a (node, rank) table partitioned by node; each
iteration is ONE shuffle (join ranks to edges on src, sum contributions by
dst) plus a single-row dangling-mass aggregate that is FOLDED INTO the
iteration's plan as a broadcast scalar (cross join with a 1-row aggregate)
— the loop runs one job per iteration with NO driver roundtrip between the
dangling sum and the rank update, so a 1000-executor cluster never idles on
a per-iteration scheduler barrier. Out-degrees are computed once, cached,
and carried WITH the edges so the loop never re-aggregates them. Iterations
are fixed-count (the openpagerank-style 0-10 score is a display transform;
fixed k≈10 converges to ~1e-6 on web graphs) which keeps the computation a
pure dataflow — the same unrolled plan DuckDB re-derives in the gate
oracle. Lineage is truncated with localCheckpoint every round (cluster:
checkpoint dir), same contract as the crawl loop's epoch tables.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def _hashed_ids_ok(nodes: DataFrame, id_col: str = "node") -> bool:
    """True when the iterative loops can re-key this node set to 8-byte
    xxhash64 longs: the key isn't already integral AND the hash is
    collision-free over the actual nodes (checked with one aggregate over
    the cached node table; expected collisions ~ n²/2^65). Longs through
    every per-iteration exchange instead of arbitrary-width host strings is
    standard web-graph practice (dictionary-encode once, iterate on ints) —
    measured ~15-22% on 16M-edge 5-iter PageRank at both bench levels."""
    if isinstance(nodes.schema[id_col].dataType, (T.LongType, T.IntegerType)):
        return False
    agg = nodes.agg(
        F.count("*").alias("n"),
        F.count_distinct(F.xxhash64(id_col)).alias("k"),
    ).first()
    return agg["k"] == agg["n"]


def _count_and_hash_check(nodes: DataFrame, id_col: str = "node") -> tuple[int, bool]:
    """(row count, _hashed_ids_ok) in ONE aggregate over the cached node
    table instead of a count job followed by the collision-check job — every
    ranker needs both, and the two separate passes were pure fixed overhead
    per call (ADVICE r05)."""
    if isinstance(nodes.schema[id_col].dataType, (T.LongType, T.IntegerType)):
        return nodes.count(), False
    agg = nodes.agg(
        F.count("*").alias("n"),
        F.count_distinct(F.xxhash64(id_col)).alias("k"),
    ).first()
    return agg["n"], agg["k"] == agg["n"]


def _restore_node_keys(
    df: DataFrame, node_map: DataFrame, id_col: str = "node"
) -> DataFrame:
    """Map a hashed-id result back to the caller-visible keys: one O(|V|)
    exchange total, after the whole iterative loop ran on longs."""
    others = [c for c in df.columns if c != id_col]
    return df.join(
        node_map.select(
            F.col(id_col).alias("_orig"), F.xxhash64(id_col).alias("_nid")
        ),
        df[id_col] == F.col("_nid"),
    ).select(F.col("_orig").alias(id_col), *others)


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
    from .order import track_persist

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    # node table cached PRE-PARTITIONED on the per-iteration join key: the
    # contribution aggregate arrives hash-partitioned on dst from its
    # groupBy, so the nodes-side join adds no Exchange
    nodes = track_persist(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition("node")
        .persist()
    )
    # Hashed-id tier (see _hashed_ids_ok): every per-iteration structure —
    # cached edges, rank state, the three O(|V|) exchanges per round —
    # carries 8-byte longs; output is identical (ranks map back through the
    # cached node table at the end; native-key path on the astronomically
    # rare hash collision). Count and collision check share one aggregate.
    n, hashed = _count_and_hash_check(nodes)
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    if hashed:
        e = e.select(
            F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
        )
        node_map = nodes
        nodes = track_persist(
            nodes.select(F.xxhash64("node").alias("node"))
            .repartition("node")
            .persist()
        )
    # out-degree table cached: the per-iteration dangling branch anti-joins
    # against it, and uncached that branch would re-derive
    # edges.distinct().groupBy(src) — an O(|E|) double shuffle — EVERY
    # iteration from the raw source (cache matching is by plan subtree, and
    # neither e nor deg is a subtree of the cached ed layout)
    deg = track_persist(
        e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    )
    deg.count()
    # out-degree carried with every edge, and the edge table cached
    # PRE-PARTITIONED on src: each iteration's contribution join then reads
    # the cache with NO edges-side Exchange (localCheckpoint would lose the
    # partitioning under AQE — LogicalRDD reports Unknown) — per-iteration
    # shuffle is O(|V|) rank rows, never O(|E|) edges, the difference
    # between feasible and not at web-graph scale. Cluster equivalent: a
    # bucketBy(src) edges table. Released at the caller's
    # unpersist_all() barrier.
    ed = track_persist(e.join(deg, "src").repartition("src").persist())
    ed.count()
    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    for _ in range(iters):
        # materialize the iteration's input ONCE: the dangling branch and
        # the contribution join both read it, and lineage stays O(1)
        ranks = ranks.localCheckpoint(eager=True)
        # dangling mass: a 1-row aggregate kept INSIDE the iteration's plan
        # as a broadcast scalar (cross join) — no .first() barrier; both
        # branches read the checkpointed ranks, so nothing recomputes
        dang = (
            ranks.join(deg, ranks["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dang"))
        )
        contrib = (
            ed.join(ranks, ed["src"] == ranks["node"])
            .select("dst", (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + damping_mass(F.col("_dang"), n)
                    )
                ).alias("rank"),
            )
        )
    if hashed:
        ranks = _restore_node_keys(ranks, node_map)
    return ranks


def damping_mass(dangling, n: int):
    """Per-node share of the dangling mass (kept as a named helper so the
    Spark plan and the unrolled SQL oracle read the same formula). Works on
    a float or a Column — the loop passes the broadcast scalar column."""
    return dangling / n


def _graph_base_parts(edges_sql: str) -> list:
    """Shared CTE prologue for every unrolled graph oracle: deduped edges,
    node set, out-degrees."""
    return [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
    ]


def _pagerank_chain_parts(damping: float, iters: int) -> list:
    """The pr0..pr{iters} CTE chain; assumes e/nodes/deg are in scope."""
    d = damping
    parts = [
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
    return parts


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
    parts = _graph_base_parts(edges_sql) + _pagerank_chain_parts(damping, iters)
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, ROUND(rank, {round_to}) AS rank FROM pr{iters}"
    )


def hits(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 10,
) -> DataFrame:
    """HITS (Kleinberg) hub/authority scores over the directed link graph →
    (node, hub, authority). The other classic link metric SEO tooling reports
    (the reference's source_domain_metrics JSONB blob is where API-bought
    values of this kind land, database/models.py:146).

    Fixed-iteration power method with L1 normalization each half-step (L1 —
    not the textbook L2 — so both engines normalize with a plain SUM; the
    fixpoint direction is the same and scores are comparable across graphs).
    Each iteration is two shuffles (authority: sum of hub over in-edges;
    hub: sum of authority over out-edges) and two single-row normalizer
    aggregates. Same scale shape as pagerank(); lineage truncated per round.
    """
    from .order import track_persist

    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = track_persist(
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition("node")
        .persist()
    )
    # hashed-id tier: both per-half-step score exchanges and BOTH cached
    # edge copies carry longs (see _hashed_ids_ok / pagerank); count and
    # collision check share one aggregate
    n, hashed = _count_and_hash_check(nodes)
    if n == 0:
        return nodes.withColumn("hub", F.lit(0.0)).withColumn(
            "authority", F.lit(0.0)
        )
    if hashed:
        e = e.select(
            F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
        )
        node_map = nodes
        nodes = track_persist(
            nodes.select(F.xxhash64("node").alias("node"))
            .repartition("node")
            .persist()
        )
    # HITS joins edges on BOTH keys (src in the authority step, dst in the
    # hub step), so one layout cannot serve both: cache TWO co-partitioned
    # copies — the classic 2x-storage-for-zero-edge-shuffle tradeoff; each
    # half-step then exchanges only O(|V|) score rows
    e_by_src = track_persist(e.repartition("src").persist())
    e_by_dst = track_persist(e.repartition("dst").persist())
    e_by_src.count()
    e_by_dst.count()
    hubs = nodes.select("node", F.lit(1.0 / n).alias("h"))
    auth = None

    def _l1_normalize(scores: DataFrame, col: str) -> DataFrame:
        # L1 normalizer folded into the plan as a broadcast scalar (cross
        # join with the 1-row sum) instead of a per-half-step .first()
        # driver barrier; `scores` is checkpointed, so both branches read
        # the cached rows and the normalized frame is cheap O(1) lineage —
        # no second checkpoint needed. Zero-sum guard mirrors the oracle's
        # CASE WHEN SUM = 0 THEN 1.0.
        norm = scores.agg(F.sum(col).alias("_n")).select(
            F.when(F.col("_n").isNull() | (F.col("_n") == 0), F.lit(1.0))
            .otherwise(F.col("_n"))
            .alias("_n")
        )
        return scores.crossJoin(F.broadcast(norm)).select(
            "node", (F.col(col) / F.col("_n")).alias(col)
        )

    for _ in range(iters):
        # authority(v) = sum of hub(u) over edges u -> v, L1-normalized
        # (hubs is O(1) lineage over the previous half-step's checkpoint)
        a_raw = (
            e_by_src.join(hubs, e_by_src["src"] == hubs["node"])
            .groupBy("dst")
            .agg(F.sum("h").alias("a"))
        )
        auth = nodes.join(a_raw, nodes["node"] == a_raw["dst"], "left").select(
            "node", F.coalesce(F.col("a"), F.lit(0.0)).alias("a")
        )
        auth = _l1_normalize(auth.localCheckpoint(eager=True), "a")
        # hub(u) = sum of authority(v) over edges u -> v, L1-normalized
        h_raw = (
            e_by_dst.join(auth, e_by_dst["dst"] == auth["node"])
            .groupBy("src")
            .agg(F.sum("a").alias("h"))
        )
        hubs = nodes.join(h_raw, nodes["node"] == h_raw["src"], "left").select(
            "node", F.coalesce(F.col("h"), F.lit(0.0)).alias("h")
        )
        hubs = _l1_normalize(hubs.localCheckpoint(eager=True), "h")
    out = (
        hubs.withColumnRenamed("h", "hub")
        .join(auth.withColumnRenamed("a", "authority"), "node")
    )
    if hashed:
        out = _restore_node_keys(out, node_map)
    return out


def hits_oracle_sql(edges_sql: str, iters: int = 10, round_to: int = 6) -> str:
    """The same fixed-iteration HITS dataflow unrolled into MATERIALIZED
    CTEs for the DuckDB gate oracle. `edges_sql` must yield (src, dst)."""
    parts = [
        f"e AS (SELECT DISTINCT src, dst FROM ({edges_sql}))",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes)",
        "h0 AS (SELECT node, 1.0 / n.n AS h FROM nodes, n)",
    ]
    for i in range(1, iters + 1):
        hp = f"h{i - 1}"
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT nodes.node, COALESCE(s.a, 0.0) AS a
  FROM nodes LEFT JOIN (
    SELECT e.dst AS node, SUM(p.h) AS a
    FROM e JOIN {hp} p ON e.src = p.node GROUP BY e.dst
  ) s ON nodes.node = s.node
)"""
        )
        parts.append(
            f"""a{i} AS MATERIALIZED (
  SELECT node, a / (SELECT CASE WHEN SUM(a) = 0 THEN 1.0 ELSE SUM(a) END
                    FROM ar{i}) AS a
  FROM ar{i}
)"""
        )
        parts.append(
            f"""hr{i} AS MATERIALIZED (
  SELECT nodes.node, COALESCE(s.h, 0.0) AS h
  FROM nodes LEFT JOIN (
    SELECT e.src AS node, SUM(p.a) AS h
    FROM e JOIN a{i} p ON e.dst = p.node GROUP BY e.src
  ) s ON nodes.node = s.node
)"""
        )
        parts.append(
            f"""h{i} AS MATERIALIZED (
  SELECT node, h / (SELECT CASE WHEN SUM(h) = 0 THEN 1.0 ELSE SUM(h) END
                    FROM hr{i}) AS h
  FROM hr{i}
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT h{iters}.node, ROUND(h{iters}.h, {round_to}) AS hub,"
        + f" ROUND(a{iters}.a, {round_to}) AS authority"
        + f"\nFROM h{iters} JOIN a{iters} ON h{iters}.node = a{iters}.node"
    )


def trustrank(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """TrustRank (Gyongyi, Garcia-Molina, Pedersen, VLDB'04) over the link
    graph → (node, trust): PageRank with the teleport vector biased to a
    trusted seed set instead of uniform. This is the in-engine computation
    of the metric class the reference buys as "trust_flow" from domain
    intelligence APIs (services/domain_service.py:410 fakes it with
    random.randint; database/models.py:73 stores it) — trust propagated
    from a vetted whitelist, attenuated by distance.

    t_{k+1}(v) = (1-a)*d(v) + a*(sum_{u->v} t_k(u)/deg(u) + dangling*d(v))

    where d is uniform over the seed nodes present in the graph. Dangling
    mass re-teleports to the seeds (the personalized-PageRank convention,
    keeping sum(trust)=1; the original paper lets it leak — same ordering,
    different normalization). Scale shape identical to pagerank(): one
    shuffle per iteration plus a single-row dangling aggregate folded into
    the plan as a broadcast scalar (no per-iteration driver barrier); the
    teleport column rides the checkpointed node table so the loop adds no
    join.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    from .order import track_persist

    s = seeds.select(F.col(seed_col).alias("node")).distinct()
    # teleport d(v): uniform over seeds that exist in the graph; cached
    # pre-partitioned on node (same layout rationale as pagerank's nodes)
    nd = nodes.join(s.withColumn("is_seed", F.lit(1)), "node", "left").select(
        "node", F.coalesce(F.col("is_seed"), F.lit(0)).alias("is_seed")
    )
    nd = nd.localCheckpoint(eager=True)
    # seed count + hash-collision check in ONE aggregate over the
    # checkpointed node table (two separate jobs were fixed overhead —
    # ADVICE r05; spam_mass pays this path twice per call)
    if isinstance(nd.schema["node"].dataType, (T.LongType, T.IntegerType)):
        ns = nd.agg(F.sum("is_seed")).first()[0] or 0
        hashed = False
    else:
        agg = nd.agg(
            F.sum("is_seed").alias("s"),
            F.count("*").alias("n"),
            F.count_distinct(F.xxhash64("node")).alias("k"),
        ).first()
        ns = agg["s"] or 0
        hashed = agg["k"] == agg["n"]
    if ns == 0:
        return nd.select("node", F.lit(0.0).alias("trust"))
    # hashed-id tier: the teleport column rides the hashed node table; the
    # loop and caches carry longs, keys restored at the end (see pagerank)
    if hashed:
        node_map = nd
        e = e.select(
            F.xxhash64("src").alias("src"), F.xxhash64("dst").alias("dst")
        )
        nd = nd.select(F.xxhash64("node").alias("node"), "is_seed")
    nd = track_persist(
        nd.select("node", (F.col("is_seed") / F.lit(float(ns))).alias("d"))
        .repartition("node")
        .persist()
    )
    nd.count()
    # cached for the per-iteration dangling anti-join (see pagerank: an
    # uncached deg re-derives the O(|E|) distinct+groupBy every iteration)
    deg = track_persist(
        e.groupBy("src").agg(F.count("*").alias("deg")).persist()
    )
    deg.count()
    # src-partitioned edge cache: zero edges-side Exchange per iteration
    # (see pagerank)
    ed = track_persist(e.join(deg, "src").repartition("src").persist())
    ed.count()
    a = damping
    trust = nd.select("node", F.col("d").alias("t"), "d")
    for _ in range(iters):
        trust = trust.localCheckpoint(eager=True)
        # dangling mass as an in-plan broadcast scalar (see pagerank)
        dang = (
            trust.join(deg, trust["node"] == deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("t"), F.lit(0.0)).alias("_dang"))
        )
        contrib = (
            ed.join(trust, ed["src"] == trust["node"])
            .select("dst", (F.col("t") / F.col("deg")).alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("c"))
        )
        trust = (
            nd.join(contrib, nd["node"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                (
                    F.lit(1.0 - a) * F.col("d")
                    + F.lit(a)
                    * (
                        F.coalesce(F.col("c"), F.lit(0.0))
                        + F.col("_dang") * F.col("d")
                    )
                ).alias("t"),
                "d",
            )
        )
    trust = trust.select("node", F.col("t").alias("trust"))
    if hashed:
        trust = _restore_node_keys(trust, node_map)
    return trust


def spam_mass(
    edges: DataFrame,
    seeds: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    seed_col: str = "node",
    damping: float = 0.85,
    iters: int = 10,
) -> DataFrame:
    """Relative spam mass (Gyongyi et al., "Link Spam Detection Based on
    Mass Estimation", VLDB'06) → (node, rank, trust, spam_mass): the
    fraction of a node's PageRank NOT attributable to trusted-core
    propagation, spam_mass = (rank - trust) / rank. High values (→1) mean
    the node's rank comes from outside the trusted region — the published
    estimator behind the spam_score the reference stores on every domain
    (database/models.py:74) and renders in link profiles. Negative values
    are the trusted core itself (more trust than uniform rank), kept as-is
    per the paper. rank > 0 always (teleport base), so the ratio is total.
    """
    pr = pagerank(edges, src_col, dst_col, damping=damping, iters=iters)
    tr = trustrank(
        edges, seeds, src_col, dst_col, seed_col, damping=damping, iters=iters
    )
    return pr.join(tr, "node").select(
        "node",
        "rank",
        "trust",
        ((F.col("rank") - F.col("trust")) / F.col("rank")).alias("spam_mass"),
    )


def _trustrank_chain_parts(seeds_sql: str, damping: float, iters: int) -> list:
    """The t0..t{iters} CTE chain; assumes e/nodes/deg are in scope.
    `seeds_sql` must yield (node) rows."""
    a = damping
    parts = [
        f"seeds AS (SELECT DISTINCT node FROM ({seeds_sql}) "
        "WHERE node IN (SELECT node FROM nodes))",
        "ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS ns FROM seeds)",
        """tv AS (
  SELECT nodes.node,
         CASE WHEN seeds.node IS NOT NULL THEN 1.0 / ns.ns ELSE 0.0 END AS d
  FROM nodes CROSS JOIN ns LEFT JOIN seeds ON nodes.node = seeds.node
)""",
        "t0 AS (SELECT node, d AS t FROM tv)",
    ]
    for i in range(1, iters + 1):
        p = f"t{i - 1}"
        parts.append(
            f"""t{i} AS MATERIALIZED (
  SELECT tv.node,
         (1.0 - {a}) * tv.d
         + {a} * (COALESCE(c.s, 0.0)
                  + (SELECT COALESCE(SUM(p.t), 0.0) FROM {p} p
                     LEFT JOIN deg ON p.node = deg.src
                     WHERE deg.src IS NULL) * tv.d) AS t
  FROM tv
  LEFT JOIN (
    SELECT e.dst AS node, SUM(p.t / deg.deg) AS s
    FROM e JOIN {p} p ON e.src = p.node JOIN deg ON deg.src = e.src
    GROUP BY e.dst
  ) c ON tv.node = c.node
)"""
        )
    return parts


def trustrank_oracle_sql(
    edges_sql: str,
    seeds_sql: str,
    damping: float = 0.85,
    iters: int = 10,
    round_to: int = 6,
) -> str:
    """The same fixed-iteration TrustRank dataflow unrolled for DuckDB."""
    parts = _graph_base_parts(edges_sql) + _trustrank_chain_parts(
        seeds_sql, damping, iters
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node, ROUND(t, {round_to}) AS trust FROM t{iters}"
    )


def spam_mass_oracle_sql(
    edges_sql: str,
    seeds_sql: str,
    damping: float = 0.85,
    iters: int = 10,
    round_to: int = 6,
) -> str:
    """PageRank + TrustRank chains in one WITH; spam mass from the
    UNROUNDED fixpoints, rounded only at the output (a ratio of rounded
    values would amplify cross-engine float drift past the hash)."""
    parts = (
        _graph_base_parts(edges_sql)
        + _pagerank_chain_parts(damping, iters)
        + _trustrank_chain_parts(seeds_sql, damping, iters)
    )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT p.node,
       ROUND(p.rank, {round_to}) AS rank,
       ROUND(t.t, {round_to}) AS trust,
       ROUND((p.rank - t.t) / p.rank, {round_to}) AS spam_mass
FROM pr{iters} p JOIN t{iters} t ON p.node = t.node"""
    )


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_hops: int = 16,
) -> DataFrame:
    """Resolve redirect chains to their final targets → (src, final_url,
    hops, resolved). The reference stores one redirect_url per fetched URL
    (database/models.py:108) and follows chains per-request at fetch time
    (link_health_service.py follow_redirects=True); over a stored crawl
    archive (e.g. the CDX source's 3xx records) the same question is a
    batch graph problem: for every redirect source, what is the final
    non-redirecting URL and how many hops away?

    Pointer doubling (path halving), NOT per-hop walking: round k rewrites
    every pointer to its 2^k-th successor by self-joining the state table,
    so max_hops-long chains settle in ceil(log2(max_hops)) shuffle joins
    instead of max_hops — the difference between 4 rounds and 16 at scale.
    hops accumulates exactly (terminal rows contribute their stored count).
    Chains longer than max_hops and redirect cycles never leave the mapping
    domain and are reported resolved=false with NULL final/hops — the batch
    analogue of ERR_TOO_MANY_REDIRECTS. Duplicate sources collapse to the
    lexicographically smallest target (deterministic; the reference's
    column is single-valued, so dupes are upstream noise).
    """
    import math

    m = (
        redirects.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .groupBy("src")
        .agg(F.min("dst").alias("dst"))
    )
    # state: src -> (cur = f^(2^k)(src), hops to cur)
    s = m.select("src", F.col("dst").alias("cur"), F.lit(1).alias("hops"))
    rounds = max(1, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        s = s.localCheckpoint(eager=True)
        t = s.select(
            F.col("src").alias("t_src"),
            F.col("cur").alias("t_cur"),
            F.col("hops").alias("t_hops"),
        )
        s = s.join(t, s["cur"] == t["t_src"], "left").select(
            "src",
            F.coalesce(F.col("t_cur"), F.col("cur")).alias("cur"),
            (
                F.col("hops") + F.coalesce(F.col("t_hops"), F.lit(0))
            ).alias("hops"),
        )
    # resolved = landed outside the mapping domain within the hop budget
    keys = m.select(F.col("src").alias("k"))
    out = s.join(keys, s["cur"] == keys["k"], "left").select(
        "src",
        ((F.col("k").isNull()) & (F.col("hops") <= max_hops)).alias("resolved"),
        "cur",
        "hops",
    )
    return out.select(
        "src",
        F.when(F.col("resolved"), F.col("cur")).alias("final_url"),
        F.when(F.col("resolved"), F.col("hops")).alias("hops"),
        "resolved",
    )


def resolve_redirects_oracle_sql(
    redirects_sql: str, max_hops: int = 16
) -> str:
    """Independent DuckDB twin: a per-hop recursive-CTE walk (the naive
    O(max_hops) algorithm the doubling operator replaces), same dedup and
    same unresolved semantics. `redirects_sql` must yield (src, dst)."""
    return f"""
WITH RECURSIVE m AS (
  SELECT src, MIN(dst) AS dst FROM ({redirects_sql}) GROUP BY src
),
walk AS (
  SELECT src AS start, dst AS cur, 1 AS hops FROM m
  UNION ALL
  SELECT w.start, m.dst, w.hops + 1
  FROM walk w JOIN m ON w.cur = m.src
  WHERE w.hops < {max_hops}
),
term AS (
  SELECT w.start, w.cur, w.hops, (m2.src IS NULL) AS terminal
  FROM walk w LEFT JOIN m m2 ON w.cur = m2.src
)
SELECT start AS src,
       MAX(CASE WHEN terminal THEN cur END) AS final_url,
       MAX(CASE WHEN terminal THEN hops END) AS hops,
       COALESCE(BOOL_OR(terminal), FALSE) AS resolved
FROM term GROUP BY start
"""


def link_networks(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Link-network structure per host → (node, component, comp_size,
    out_deg, in_deg, recip_deg). `component` is the weakly-connected
    component the host belongs to (labelled by its lexicographically
    smallest member), `comp_size` that component's host count, and
    recip_deg the number of distinct neighbors linked in BOTH directions —
    the classic link-exchange/PBN signal. The reference flags spam one
    domain at a time (stored spam_score; `domain_analyzer_service.py`
    heuristics); network-level structure — tightly reciprocal clusters
    disconnected from the main web — is only visible as a graph query over
    the edges the crawler already produces, so this operator has no
    reference counterpart (added link-analysis family, same class as
    PageRank/TrustRank above).

    Plan shape: the edge set is canonicalized once (distinct directed
    pairs, self-loops dropped) and localCheckpoint-materialized, then read
    by four independent branches — components (alternating
    large-star/small-star via operators/components.py, O(log²) one-shuffle
    rounds, hub-safe min() aggregation), two degree aggregates (one
    shuffle each on node), and the reciprocity self-join (equi-join on the
    swapped pair key, one shuffle per side). At web scale the size join is
    skewed by the giant WCC — a single hot `component` key — which is
    exactly the AQE skew-join case (the engine session enables it); the
    per-node joins are uniform.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    from .components import connected_components

    comp = connected_components(e, a_col="src", b_col="dst")
    sizes = comp.groupBy("component").agg(F.count("*").alias("comp_size"))
    out_deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_deg")
    )
    in_deg = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_deg")
    )
    recip = (
        e.alias("a")
        .join(
            e.alias("b"),
            (F.col("a.src") == F.col("b.dst"))
            & (F.col("a.dst") == F.col("b.src")),
        )
        .groupBy(F.col("a.src").alias("node"))
        .agg(F.count("*").alias("recip_deg"))
    )
    return (
        comp.join(sizes, "component")
        .join(out_deg, "node", "left")
        .join(in_deg, "node", "left")
        .join(recip, "node", "left")
        .select(
            "node",
            "component",
            "comp_size",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("recip_deg", F.lit(0)).alias("recip_deg"),
        )
    )


def link_networks_oracle_sql(edges_sql: str) -> str:
    """Independent DuckDB twin: recursive-CTE transitive closure for the
    components (a different algorithm than star-contraction, converging to
    the same fixpoint) plus plain GROUP BYs for the degree/reciprocity
    columns. `edges_sql` must yield (src, dst)."""
    return f"""
WITH RECURSIVE e AS (
  SELECT DISTINCT src, dst FROM ({edges_sql}) WHERE src != dst
),
sym AS (SELECT src AS u, dst AS v FROM e UNION SELECT dst, src FROM e),
reach(u, v) AS (
  SELECT u, v FROM sym
  UNION
  SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u WHERE s.v != r.u
),
comp AS (SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u),
sizes AS (SELECT component, COUNT(*) AS comp_size FROM comp GROUP BY component),
outd AS (SELECT src AS node, COUNT(*) AS out_deg FROM e GROUP BY src),
ind AS (SELECT dst AS node, COUNT(*) AS in_deg FROM e GROUP BY dst),
recip AS (
  SELECT a.src AS node, COUNT(*) AS recip_deg
  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src
  GROUP BY a.src
)
SELECT c.node, c.component, s.comp_size,
       COALESCE(o.out_deg, 0) AS out_deg,
       COALESCE(i.in_deg, 0) AS in_deg,
       COALESCE(r.recip_deg, 0) AS recip_deg
FROM comp c
JOIN sizes s USING (component)
LEFT JOIN outd o ON o.node = c.node
LEFT JOIN ind i ON i.node = c.node
LEFT JOIN recip r ON r.node = c.node
"""


def kcore(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 50,
) -> DataFrame:
    """k-core of the undirected link graph → (node, core_deg): the maximal
    subgraph where every host keeps >= k distinct neighbors after repeatedly
    peeling lower-degree hosts. Dense mutually-linked cores that SURVIVE
    peeling are the structural link-farm signal — individually each farm
    member looks like spam_mass's mid-range, but a high-k core of hundreds
    of hosts is near-impossible organically. The reference scores spam one
    domain at a time (stored spam_score, `domain_analyzer_service.py`);
    core decomposition needs the whole graph, so this has no reference
    counterpart (added link-analysis family).

    Peeling is simultaneous per round (all current-degree < k nodes leave
    together), which makes each round ONE degree aggregate + two left-semi
    joins on the endpoints, all keyed on node — and makes the round count
    the peel DEPTH (longest dependency cascade), not the node count. The
    edge set strictly shrinks until the fixpoint, so a plain count() is the
    convergence test; lineage is localCheckpoint-truncated per round (the
    same contract as connected_components above)."""
    e = (
        edges.select(
            F.greatest(F.col(src_col), F.col(dst_col)).alias("u"),
            F.least(F.col(src_col), F.col(dst_col)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = e.count()
    for _ in range(max_rounds):
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        keep = (
            sym.groupBy("u")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("u")
        )
        e2 = (
            e.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            # the second join moves its key first — restore (u, v) order,
            # the union() above pairs columns by POSITION
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
        cnt = e2.count()
        e = e2
        if cnt == prev:  # no node left the core this round: fixpoint
            break
        prev = cnt
    else:
        raise RuntimeError(f"kcore did not converge in {max_rounds} rounds")
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    return sym.groupBy("u").agg(F.count("*").alias("core_deg")).select(
        F.col("u").alias("node"), "core_deg"
    )


def kcore_oracle_sql(edges_sql: str, k: int = 3, rounds: int = 8) -> str:
    """The same simultaneous peeling unrolled into `rounds` MATERIALIZED CTE
    rounds (extra rounds past the fixpoint are no-ops, so `rounds` only
    needs to be >= the fixture's peel depth). `edges_sql` must yield
    (src, dst)."""
    parts = [
        f"""e0 AS MATERIALIZED (
  SELECT DISTINCT GREATEST(src, dst) AS u, LEAST(src, dst) AS v
  FROM ({edges_sql}) WHERE src != dst
)"""
    ]
    for i in range(1, rounds + 1):
        p = f"e{i - 1}"
        parts.append(
            f"""keep{i} AS MATERIALIZED (
  SELECT u AS node
  FROM (SELECT u FROM {p} UNION ALL SELECT v FROM {p}) s
  GROUP BY u HAVING COUNT(*) >= {k}
)"""
        )
        parts.append(
            f"""e{i} AS MATERIALIZED (
  SELECT e.u, e.v FROM {p} e
  JOIN keep{i} a ON e.u = a.node
  JOIN keep{i} b ON e.v = b.node
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT u AS node, COUNT(*) AS core_deg
FROM (SELECT u FROM e{rounds} UNION ALL SELECT v FROM e{rounds}) s
GROUP BY u"""
    )
