"""Incremental profile maintenance — delta-merge rollups that never
recompute the world.

The reference rebuilds a LinkProfile from ALL of a target's backlinks on
every request (`create_link_profile_from_backlinks`, core/models.py:449-491,
re-queried per call at services/crawl_service.py:656-707). The batch analog
`operators/profile.py` is likewise a full recompute. Neither shape survives
10^10 edges arriving epoch by epoch: the per-epoch cost must be proportional
to the DELTA, not the accumulated table.

This module maintains profiles as two state tables updated per batch:

- additive counters (counts, conditional counts, integer-cent sums): the
  batch is pre-aggregated per key (partial agg, map-side combine) and merged
  into the stored counters with one keyed full-outer join — an Iceberg
  `MERGE INTO ... WHEN MATCHED THEN UPDATE SET n = t.n + s.n` in table
  terms. Cost per epoch: O(|batch| + |touched keys|).
- distinct counts (unique referring domains): COUNT(DISTINCT) is not
  additive, so the state is the distinct PAIR table (key, member); a
  batch's NEW pairs are its distinct pairs anti-joined against the store
  (the same delta-anti-join shape as the crawl loop's seen-set), and the
  per-key count of new pairs increments the stored counter exactly. The
  pair table is the canonical exact-distinct state at scale — the sketch
  alternative (HLL) trades it for fixed size but loses exactness, which the
  profile contract requires (SURVEY §2.4 A1).

Both joins key on the profile key, so with the state tables bucketed by key
(sources/bucketed.py layout) the merge exchanges only the batch side.
The gate oracle is adversarial-by-construction: DuckDB computes the same
profiles as ONE full groupBy over the union of all batches — a different
algorithm whose fixpoint the incremental fold must hit exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def merge_counters(
    stored: DataFrame | None, delta: DataFrame, key_col: str
) -> DataFrame:
    """Merge a per-key pre-aggregated delta into the stored counter table:
    full-outer join on key_col (NULL-SAFE: a groupBy emits NULL keys as one
    group, so the merge must pair them too — plain equality would accumulate
    duplicate NULL-key rows), every other (numeric) column summed with
    null-as-zero over the UNION of both column sets (None = empty store,
    first batch)."""
    if stored is None:
        return delta
    # union of both column sets: the first batch's store lacks counters that
    # later deltas introduce (e.g. the distinct counter lands one merge after
    # the additive ones), and a delta never carries counters it didn't touch
    cols = [c for c in stored.columns if c != key_col]
    cols += [c for c in delta.columns if c != key_col and c not in cols]
    s = stored.alias("s")
    d = delta.alias("d")

    def side(alias: str, have: list[str], c: str):
        return F.col(f"{alias}.{c}") if c in have else F.lit(None)

    return s.join(d, F.col(f"s.{key_col}").eqNullSafe(F.col(f"d.{key_col}")), "full_outer").select(
        F.coalesce(F.col(f"s.{key_col}"), F.col(f"d.{key_col}")).alias(key_col),
        *[
            (
                F.coalesce(side("s", stored.columns, c), F.lit(0))
                + F.coalesce(side("d", delta.columns, c), F.lit(0))
            ).alias(c)
            for c in cols
        ],
    )


def new_distinct_pairs(
    stored_pairs: DataFrame | None, batch: DataFrame, key_col: str, member_col: str
) -> DataFrame:
    """The batch's distinct (key, member) pairs not yet in the store — the
    exact increment set for a distinct counter. Delta anti-join: cost scales
    with the batch, and with the pair table bucketed on key only the batch
    side exchanges. NULL members are dropped up front: COUNT(DISTINCT)
    ignores NULLs (the fold's oracle fixpoint), and the anti-join's non-null-
    safe equality would otherwise re-admit a NULL pair every batch."""
    bp = (
        batch.filter(F.col(member_col).isNotNull())
        .select(key_col, member_col)
        .distinct()
    )
    if stored_pairs is None:
        return bp
    # null-safe on the KEY: groupBy keeps a NULL-key group, so its pairs
    # must match the store too (plain equality would re-admit them forever)
    b = bp.alias("b")
    sp = stored_pairs.alias("sp")
    return b.join(
        sp,
        F.col(f"b.{key_col}").eqNullSafe(F.col(f"sp.{key_col}"))
        & (F.col(f"b.{member_col}") == F.col(f"sp.{member_col}")),
        "left_anti",
    )


def merge_counters_many(
    parts: list[DataFrame], key_col: str
) -> DataFrame:
    """N-way counter merge in ONE keyed aggregation: union the per-key
    counter tables (missing columns null-padded) and sum each counter with
    null-as-zero. Exactly merge_counters folded over `parts` — groupBy
    collapses NULL keys into one group just like the eqNullSafe join, sums
    of bigints are associative — but it costs one exchange total instead of
    one full-outer join per merge (measured: the 3-batch incremental gate
    fold dropped a third of its jobs). Column order: first appearance
    across `parts`, the same order the chained merge produces."""
    parts = [p for p in parts if p is not None]
    if len(parts) == 1:
        return parts[0]
    cols: list[str] = []
    dtypes: dict[str, str] = {}
    for p in parts:
        for c, t in zip(p.columns, [f.dataType.simpleString() for f in p.schema.fields]):
            if c != key_col and c not in cols:
                cols.append(c)
                dtypes[c] = t
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p, allowMissingColumns=True)
    # cast each summed counter back to its column's declared type so the
    # merged schema matches the chained two-way merge exactly
    return u.groupBy(key_col).agg(
        *[
            F.sum(F.coalesce(F.col(c), F.lit(0))).cast(dtypes[c]).alias(c)
            for c in cols
        ]
    )


def fold_profile_batch_delta(
    state: tuple[DataFrame | None, DataFrame | None],
    batch: DataFrame,
    key_col: str,
    member_col: str,
    agg_exprs: list,
    checkpoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """One incremental epoch, DELTA form: (counters, pairs) + batch ->
    (counters', new_pairs). `agg_exprs` are the additive per-key aggregates
    (aliased columns) computed over the batch; a `distinct_{member_col}`
    counter is maintained from the pair-table delta. Returns the NEW pairs
    only — an append-only pair store persists O(batch) per epoch (the
    streaming sink's shape), never rewriting the accumulated pair history.
    Both outputs are eagerly checkpointed (lineage truncation, the crawl
    loop's epoch-table contract); a caller that consumes the LAST epoch's
    counters exactly once may pass checkpoint=False to skip the final
    store materialization (the fold's values are unchanged — only whether
    the last merge is persisted or left lazy)."""
    counters, pairs = state
    delta = batch.groupBy(key_col).agg(*agg_exprs)
    # checkpoint the pair delta FIRST: the distinct counter below reads it,
    # so checkpointing counters first would evaluate the anti-join twice
    # (once inside the counters job, once for the pair checkpoint itself)
    new_pairs = new_distinct_pairs(pairs, batch, key_col, member_col).localCheckpoint(
        eager=True
    )
    uniq_delta = new_pairs.groupBy(key_col).agg(
        F.count("*").alias(f"distinct_{member_col}")
    )
    counters2 = merge_counters_many([counters, delta, uniq_delta], key_col)
    if checkpoint:
        counters2 = counters2.localCheckpoint(eager=True)
    return (counters2, new_pairs)


def fold_profile_batch(
    state: tuple[DataFrame | None, DataFrame | None],
    batch: DataFrame,
    key_col: str,
    member_col: str,
    agg_exprs: list,
    checkpoint: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """One incremental epoch: (counters, pairs) + batch -> (counters',
    pairs'), pairs' = the full accumulated pair table (in-memory fold
    convenience; see fold_profile_batch_delta for the O(batch)-persist
    form). pairs' stays a LAZY union of the per-batch checkpointed deltas —
    every piece is already materialized, so re-checkpointing the union would
    copy the accumulated O(total-pairs) state once per epoch for nothing."""
    counters, pairs = state
    counters2, new_pairs = fold_profile_batch_delta(
        state, batch, key_col, member_col, agg_exprs, checkpoint=checkpoint
    )
    if pairs is None:
        return (counters2, new_pairs)
    # toDF re-aliases the union's output with fresh expression ids: the lazy
    # union otherwise exposes the first checkpoint's original ids, which
    # collide with the next batch's scan of the same source relation and
    # break the anti-join's self-join column resolution
    pairs2 = pairs.unionByName(new_pairs).toDF(*new_pairs.columns)
    return (counters2, pairs2)


# ---------------------------------------------------------------------------
# Fixed-size alternative: mergeable HLL sketch state (monitoring tier)
# ---------------------------------------------------------------------------
# The exact pair table above is the PROFILE-contract path; for
# monitoring-grade distinct counters (A13 — the reference uses in-memory
# sets, monitoring/crawler_metrics.py:158) the pair table's O(distinct
# pairs) state can be traded for a fixed ~2^lgk bytes per key: Spark's
# Datasketches HLL aggregates are MERGEABLE (register-max is associative),
# so per-batch sketches fold into stored state with one keyed join, same
# MERGE shape as the counters, and estimates never require re-reading
# history. Not SQL-oracle-able (sketch bytes are engine-internal) —
# verified by pytest accuracy/determinism twins instead.


def sketch_delta(
    batch: DataFrame, key_col: str, member_col: str, lgk: int = 12
) -> DataFrame:
    """Per-key HLL sketch of the batch's members: (key, sketch binary)."""
    return batch.groupBy(key_col).agg(
        F.hll_sketch_agg(member_col, lgk).alias("sketch")
    )


def merge_sketches(
    stored: DataFrame | None, delta: DataFrame, key_col: str
) -> DataFrame:
    """Fold a per-batch sketch table into the stored sketch state: keyed
    full-outer join + register-wise union (null side passes the other
    through — hll_union propagates nulls, so one-sided keys keep their
    sketch)."""
    if stored is None:
        return delta
    s = stored.alias("s")
    d = delta.alias("d")
    return s.join(d, F.col(f"s.{key_col}") == F.col(f"d.{key_col}"), "full_outer").select(
        F.coalesce(F.col(f"s.{key_col}"), F.col(f"d.{key_col}")).alias(key_col),
        F.when(
            F.col("s.sketch").isNotNull() & F.col("d.sketch").isNotNull(),
            F.hll_union("s.sketch", "d.sketch"),
        )
        .otherwise(F.coalesce("s.sketch", "d.sketch"))
        .alias("sketch"),
    )


def sketch_estimates(state: DataFrame, key_col: str) -> DataFrame:
    """(key, approx_distinct) from the sketch state — no history re-read."""
    return state.select(
        key_col, F.hll_sketch_estimate("sketch").alias("approx_distinct")
    )
