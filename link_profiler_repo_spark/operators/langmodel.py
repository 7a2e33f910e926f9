"""In-engine n-gram language-model perplexity filter — the CCNet corpus-
quality stage (Wenzek et al., LREC 2020 §3.3: KenLM perplexity buckets;
also used by Laurencon et al. 2022 / Penedo et al. 2023) re-expressed as a
pure-Catalyst PySpark pipeline. No reference counterpart in
altommo/Link_Profiler_Repo (its quality surface is
utils/content_validator.py heuristics) — this is added LLM-training-
pipeline surface, like dedup/decontamination.

CCNet scores documents with a *pretrained* 5-gram KenLM; this operator is
the deterministic in-engine stand-in: a bigram Jelinek-Mercer LM

    p(w | v) = lam * c(vw)/c(v)  +  (1 - lam) * (c(w)+1)/(N+V+1)

trained relationally from a training slice (three groupBy counts — unigram,
bigram, and context totals derived from the bigram table itself so the two
sides are self-consistent), then applied to the scoring corpus with plain
equi-joins on the gram key. Every step is whole-stage-codegen Catalyst;
there is no Python anywhere.

Exactness contract (what lets the DuckDB gate oracle verify this
bit-for-bit): counts are integers; the probability arithmetic is a fixed
dag of IEEE-754 double ops (division / multiply / add are correctly rounded,
so both engines produce the identical double); only ln() is library-
dependent in the last ulp, so each position's log-prob is immediately
quantized to integer MICRO-NATS (round(ln(p) * 1e6) as BIGINT — the same
6-dp-ln precedent as operators/recrawl.py) and documents aggregate exact
integer sums, order-free. avg_logprob is then derived from the exact
integer, so the keep flag is deterministic.

Scale shape at 100 TB: the model tables are groupBy outputs (map-side
combined); scoring joins shuffle on the gram key — never on the document —
so the corpus side streams. In the CCNet deployment the LM is trained on a
bounded reference slice (Wikipedia), making uni/big/ctx broadcast-sized;
both plans work, AQE picks broadcast when the trained model is small.
Docs with zero tokens are not scorable (no positions) and are omitted,
matching CCNet which drops empty pages before scoring.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .textops import _words, word_ngrams

BOS = "<s>"


def _seq(text_col):
    """<s>-prepended word sequence: exactly len(words) scorable bigram
    positions, including the (<s>, first-word) start context."""
    return F.concat(F.array(F.lit(BOS)), _words(text_col))


def train_bigram_lm(train: DataFrame, text_col: str = "text") -> dict[str, DataFrame]:
    """Count tables of the bigram LM from a training corpus.

    Returns {"uni": (w, cw), "big": (g, cvw), "ctx": (v, cv),
    "totals": 1-row (n_tokens, vocab)}. The corpus is tokenized and exploded
    ONCE — into the bigram table, which is materialized (localCheckpoint:
    model tables are vocab-bounded, the CCNet deployment trains on a bounded
    reference slice) — and uni/ctx/totals are all derived from it: with <s>
    prepended, every real token is the SECOND element of exactly one bigram,
    so c(w) = sum_v c(vw); and c(v) = sum_w c(vw) keeps p_ml(w|v) summing to
    exactly 1 over the observed rows — the same derivations the oracle runs.
    """
    big = (
        train.select(_seq(F.col(text_col)).alias("_s"))
        .filter(F.size("_s") >= 2)
        .select(F.explode(word_ngrams(F.col("_s"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count("*").alias("cvw"))
        .localCheckpoint(eager=True)
    )
    uni = (
        big.select(F.substring_index("g", " ", -1).alias("w"), "cvw")
        .groupBy("w")
        .agg(F.sum("cvw").alias("cw"))
    )
    ctx = (
        big.select(F.substring_index("g", " ", 1).alias("v"), "cvw")
        .groupBy("v")
        .agg(F.sum("cvw").alias("cv"))
    )
    totals = uni.agg(
        F.coalesce(F.sum("cw"), F.lit(0)).alias("n_tokens"),
        F.count("*").alias("vocab"),
    )
    return {"uni": uni, "big": big, "ctx": ctx, "totals": totals}


def lm_score(
    docs: DataFrame,
    lm: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    keep_avg_logprob: float = -7.0,
) -> DataFrame:
    """Per-document LM score over the trained count tables.

    Output: (doc_id, n_tokens, logprob_micro BIGINT exact sum of
    round(ln(p)*1e6), avg_logprob = round(micro/1e6/n, 6), keep INT at
    avg_logprob >= keep_avg_logprob — the CCNet head/middle/tail cut
    collapsed to one bucket boundary; keep_avg_logprob = -ln(ppl_max)).
    Zero-token documents have no positions and are omitted.
    """
    pos = (
        docs.select(F.col(id_col), _seq(F.col(text_col)).alias("_s"))
        .filter(F.size("_s") >= 2)
        .select(id_col, F.explode(word_ngrams(F.col("_s"), 2)).alias("g"))
        .withColumn("w", F.substring_index("g", " ", -1))
    )
    # cv is consumed ONLY where cvw exists (unseen bigrams take the
    # otherwise(0.0) branch), so the ctx join happens on the MODEL side —
    # (g, cvw, cv) is one trained table and the corpus positions shuffle
    # twice (g, w), not three times (g, v, w)
    bigcv = lm["big"].withColumn("v", F.substring_index("g", " ", 1)).join(
        lm["ctx"], "v"
    ).select("g", "cvw", "cv")
    j = (
        pos.join(bigcv, "g", "left")
        .join(lm["uni"], "w", "left")
        .join(F.broadcast(lm["totals"].withColumnRenamed("n_tokens", "_N")), how="cross")
    )
    p_ml = F.when(
        F.col("cvw").isNotNull(),
        F.col("cvw").cast("double") / F.col("cv").cast("double"),
    ).otherwise(F.lit(0.0))
    p_uni = (F.coalesce(F.col("cw"), F.lit(0)).cast("double") + F.lit(1.0)) / (
        F.col("_N").cast("double") + F.col("vocab").cast("double") + F.lit(1.0)
    )
    p = F.lit(lam) * p_ml + F.lit(1.0 - lam) * p_uni
    lp_micro = F.round(F.log(p) * F.lit(1000000.0), 0).cast("long")
    out = (
        j.select(id_col, lp_micro.alias("_lp"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("_lp").cast("long").alias("logprob_micro"),
        )
    )
    avg = F.round(
        F.col("logprob_micro").cast("double")
        / F.lit(1000000.0)
        / F.col("n_tokens").cast("double"),
        6,
    )
    return out.select(
        id_col,
        "n_tokens",
        "logprob_micro",
        avg.alias("avg_logprob"),
        (avg >= F.lit(keep_avg_logprob)).cast("int").alias("keep"),
    )


def lm_perplexity(
    docs: DataFrame,
    train: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
    keep_avg_logprob: float = -7.0,
) -> DataFrame:
    """Train-and-score convenience: CCNet stage as one call. Adds a
    human-facing perplexity column (exp(-avg_logprob)); the gate row selects
    the exact integer/rounded columns only, because exp() is not
    correctly-rounded-guaranteed across engines."""
    scored = lm_score(
        docs,
        train_bigram_lm(train, text_col),
        text_col=text_col,
        id_col=id_col,
        lam=lam,
        keep_avg_logprob=keep_avg_logprob,
    )
    return scored.withColumn("perplexity", F.exp(-F.col("avg_logprob")))
