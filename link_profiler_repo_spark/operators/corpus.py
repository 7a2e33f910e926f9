"""End-to-end training-corpus build — the composition of the LLM-pipeline
families as one reusable operator (and one deployable job type):

    quality filter  → exact-dedup keep → target-mixture sample → token-budget
    (textops bands)   (min-id per md5    (sampling.mixture_     pack
                       hash group — the   sample)               (sampling.
                       star special case                         token_budget_
                       of components)                            pack)

The quality threshold is held in exact INTEGER deci-points so no float
boundary exists between engines (the gate oracle re-derives every stage with
different algorithms — see queries.q_corpus_build). Shape: scan-side
filters, ONE window-min over the md5 hash for the dedup, a broadcast rates
join, and the two-level prefix-sum windows; the narrow kept table is
materialized once (localCheckpoint) so the text pipeline is evaluated a
single time however many downstream branches read it.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from . import textops
from .sampling import mixture_sample, token_budget_pack


def build_corpus(
    docs: DataFrame,
    targets: dict[str, float],
    total_rows: float,
    budget: int,
    id_col: str = "doc_id",
    strata_col: str = "lang",
    text_col: str = "text",
    min_quality_deci: int = 8,
    sample_salt: str = "cb",
    pack_salt: str = "cbp",
    redact_pii: bool = False,
    bench: DataFrame | None = None,
    decontam_n: int = 8,
    sem_keep: DataFrame | None = None,
) -> DataFrame:
    """docs(id, strata, text) → the kept corpus (id, strata, n_tokens,
    cum_tokens): quality-filtered, exact-deduped (one canonical doc per
    identical-text cluster), sampled to the target mixture, greedily packed
    to `budget` tokens per stratum in deterministic hash order.

    Optional scrub stages (defaults off keep the original contract):
    redact_pii=True replaces the text with textops.pii_redact BEFORE any
    token counting — downstream tokens/quality/dedup all operate on the
    scrubbed text, so two docs differing only in their PII become exact
    duplicates and collapse in the dedup stage. bench != None drops every
    quality-passing doc sharing a decontam_n word-gram with the benchmark
    table (textops.decontaminate_filter; the anti-join runs after the
    quality filter so only surviving docs are gram-ified, but the two row
    predicates commute so the kept set is order-independent). sem_keep !=
    None applies a SemDeDup verdict table (dedup.semdedup output: id, keep)
    as a doc-admission filter — only docs with a keep=True verdict pass
    (semdedup emits a verdict for every embedded doc, so an unlisted id
    means no embedding: not admitted); the stage runs before exact dedup so
    canonical minima are picked among semantic survivors, and is one
    co-partitioned left-semi join on the id (the verdict table is at most
    |corpus| rows and carries no text)."""
    if redact_pii:
        docs = docs.withColumn(text_col, textops.pii_redact(F.col(text_col)))
    t = F.col(text_col)
    d = docs.select(
        id_col, strata_col, text_col, textops.token_count(t).alias("n_tokens")
    )
    # materialize the projected (redacted text + token count) table BEFORE
    # the quality filter: predicate pushdown otherwise drags the entire
    # redact+tokenize tree below the scan-side exchange — inlined once per
    # quality clause (~7x) into the (often single-task) scan stage, then
    # recomputed above it for the survivors (measured as a 2.6 s one-task
    # stage at sf0.1). This is the quality-stage input boundary a real
    # pipeline persists; the checkpoint severs the pushdown path.
    d = d.localCheckpoint(eager=True)
    n = F.col("n_tokens")
    quality_deci = (
        F.when((n >= 20) & (n <= 2000), 4).when(n >= 5, 2).otherwise(0)
        + F.when(textops.punct_ratio(t) <= 0.2, 3).otherwise(1)
        + F.when(textops.stopword_ratio(t) >= 0.05, 3).otherwise(1)
    )
    filtered = d.filter(quality_deci >= min_quality_deci)
    if bench is not None:
        # the decontamination anti-join references `filtered` on BOTH sides
        # (gram explode + join left); materialize it once so the expensive
        # redact/tokenize/quality tree is evaluated a single time — on a
        # cluster this is the quality-stage boundary a pipeline would persist
        filtered = filtered.localCheckpoint(eager=True)
        filtered = textops.decontaminate_filter(
            filtered, bench, n=decontam_n, text_col=text_col, id_col=id_col
        )
    if sem_keep is not None:
        filtered = filtered.join(
            sem_keep.filter(F.col("keep")).select(id_col), id_col, "left_semi"
        )
    # exact dedup: one canonical (min-id) doc per identical-text hash group.
    # The md5 pair graph built here is a STAR (every pair anchors at the
    # group min), so its connected components ARE the hash groups and the
    # component min IS the per-hash min — one window over the hash computes
    # the identical keep set without the star-contraction rounds (checkpoint
    # + convergence-agg jobs per round) that general near-dup graphs need.
    from pyspark.sql import Window

    slim = filtered.select(
        id_col, strata_col, "n_tokens", F.md5(text_col).alias("_h")
    )
    unique = (
        slim.withColumn(
            "_cl", F.min(id_col).over(Window.partitionBy("_h"))
        )
        .filter(F.col(id_col) == F.col("_cl"))
        .select(id_col, strata_col, "n_tokens")
        # consumed by four downstream branches (mixture counts + join-back,
        # packing window + subtotal agg); materialized once — the text scan
        # and the dedup shuffle run a single time, every branch reads ~kept
        # rows of three narrow columns
        .localCheckpoint(eager=True)
    )
    mixed = mixture_sample(
        unique, id_col, strata_col,
        targets=targets, total_rows=total_rows, salt=sample_salt,
    )
    packed = token_budget_pack(
        mixed, id_col, strata_col, "n_tokens", budget, salt=pack_salt
    )
    return packed.filter(F.col("keep")).select(
        id_col, strata_col, "n_tokens", "cum_tokens"
    )
