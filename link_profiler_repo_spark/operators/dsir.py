"""DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
2023) as a deterministic, fully-relational corpus-selection stage: score
every raw document by how target-like its hashed n-gram bag is, then draw a
k-document subset with the Gumbel-top-k trick. This is the *data selection*
stage of a pretraining pipeline (the DCLM / Pile-CC "pick web pages that
look like books+wiki" step), sitting between the cleaning filters
(textops.c4_clean, classifier.quality_classifier) and packing
(sampling.token_budget_pack). No reference counterpart in
altommo/Link_Profiler_Repo — added LLM-training-pipeline surface like
dedup/decontamination/perplexity.

Model (paper §3, hashed n-gram variant): unigram+bigram features hashed
into B buckets (paper uses B=10,000); bag-of-buckets categorical
distributions p (target) and q (raw) with add-one smoothing; importance
weight of document z with bucket counts c_b(z):

    log w(z) = sum_b c_b(z) * (ln p_b - ln q_b)
    p_b = (cnt_target(b) + 1) / (N_target + B)      (q_b likewise)

Selection: Gumbel-top-k — rank by log w(z) + g(z) where g is standard
Gumbel noise, take the top k. This samples k documents WITHOUT replacement
with probability proportional to w (Vieira 2014), in one pass, with no
sequential draw state — exactly the shape a distributed engine wants.

Determinism/exactness contract (sampling.py + classifier.py precedents):
- bucket(gram) = CAST(first 8 hex of md5(gram) AS int) % B — both engines
  compute identical buckets from the same string bytes, so hash collisions
  (the defining semantic of hashed features) are reproduced by the oracle.
- every ln() is immediately quantized to integer micro-nats
  (round(ln·1e6) BIGINT); log-weights are exact integer sums.
- the Gumbel draw is a pure function of the document id:
  u = (v + 0.5) / 2^52 with v = first 13 md5 hex chars of "salt|doc_id";
  t_micro = max(round(-ln(u)·1e6), 1)   (clamp: u within 2^-52 of 1.0
  would round t to 0 and -ln(0) diverges; both engines clamp identically);
  gumbel_micro = round(-ln(t_micro/1e6)·1e6).
  key_micro = logw_micro + gumbel_micro is an exact BIGINT, so the top-k
  cut and its doc_id tie-break are engine-independent.

Scale shape at 100 TB: the target corpus is small by nature (a quality
reference set — paper: Wikipedia+books) — its bucket counts collapse to
<= B rows. The raw corpus explodes to gram rows ONCE for q-estimation
(groupBy bucket, map-side combined into <= B rows) and once for scoring;
the per-bucket weight table is <= B rows and BROADCAST, so scoring never
shuffles the corpus on anything but doc_id (one partial-aggregated
groupBy). Top-k plans as TakeOrderedAndProject — no global sort. Zero
Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .textops import _words, word_ngrams_or_empty

MICRO = 1000000.0
# 13 hex chars = 52 bits; (v + 0.5) / 2^52 is an exact double in (0, 1)
GUMBEL_SCALE = float(1 << 52)


def _gram_buckets(df: DataFrame, text_col: str, keep_cols: list[str], buckets: int) -> DataFrame:
    """(keep_cols..., bucket) rows: unigram+bigram features hashed into
    `buckets` buckets via the first 8 hex chars of md5(gram). Grams stage
    through named columns before the explode (the repetition_profile /
    classifier rule)."""
    w = F.col("_ws")
    return (
        df.select(*keep_cols, _words(F.col(text_col)).alias("_ws"))
        .select(*keep_cols, F.concat(w, word_ngrams_or_empty(w, 2)).alias("_grams"))
        .select(*keep_cols, F.explode("_grams").alias("_g"))
        .select(
            *keep_cols,
            (F.conv(F.substring(F.md5("_g"), 1, 8), 16, 10).cast("long") % buckets).alias(
                "bucket"
            ),
        )
    )


def _ln_micro(x) -> F.Column:
    return F.round(F.log(x) * F.lit(MICRO), 0).cast("long")


def _bucket_counts(df: DataFrame, text_col: str, buckets: int, name: str) -> DataFrame:
    return (
        _gram_buckets(df.select(text_col), text_col, [], buckets)
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias(name))
    )


def dsir_weight_table(
    raw: DataFrame, target: DataFrame, text_col: str = "text", buckets: int = 10000
) -> DataFrame:
    """Per-bucket importance-weight table: (bucket, w_micro) with
    w_micro = ln_micro(p_b) - ln_micro(q_b), add-one smoothed. <= `buckets`
    rows — broadcast-sized by construction."""
    p = _bucket_counts(target, text_col, buckets, "cp")
    q = _bucket_counts(raw, text_col, buckets, "cq")
    return _weight_table_from_counts(p, q, buckets)


def _weight_table_from_counts(p: DataFrame, q: DataFrame, buckets: int) -> DataFrame:
    """Weight table from the two (bucket, count) aggregates: a full outer
    join so buckets seen on either side carry their exact weight; buckets
    seen on neither side never occur in scoring (a scored gram defines its
    bucket)."""
    joined = p.join(q, "bucket", "full").select(
        "bucket",
        F.coalesce("cp", F.lit(0)).cast("long").alias("cp"),
        F.coalesce("cq", F.lit(0)).cast("long").alias("cq"),
    )
    totals = joined.agg(
        F.coalesce(F.sum("cp"), F.lit(0)).cast("long").alias("np"),
        F.coalesce(F.sum("cq"), F.lit(0)).cast("long").alias("nq"),
    )
    b = F.lit(buckets).cast("long")
    return joined.join(F.broadcast(totals), how="cross").select(
        "bucket",
        (
            _ln_micro((F.col("cp") + 1).cast("double") / (F.col("np") + b).cast("double"))
            - _ln_micro((F.col("cq") + 1).cast("double") / (F.col("nq") + b).cast("double"))
        ).alias("w_micro"),
    )


def gumbel_micro(id_col: F.Column, salt: str = "dsir") -> F.Column:
    """Deterministic standard-Gumbel draw in integer micro-nats, a pure
    function of the id (see module docstring for the exactness contract)."""
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt + "|"), id_col.cast("string"))), 1, 13),
        16,
        10,
    ).cast("long")
    u = (v.cast("double") + F.lit(0.5)) / F.lit(GUMBEL_SCALE)
    t_micro = F.greatest(
        F.round(-F.log(u) * F.lit(MICRO), 0).cast("long"), F.lit(1).cast("long")
    )
    return F.round(-F.log(t_micro.cast("double") / F.lit(MICRO)) * F.lit(MICRO), 0).cast(
        "long"
    )


def dsir_scores(
    raw: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10000,
    salt: str = "dsir",
) -> DataFrame:
    """Score every raw document: (doc_id, n_grams, logw_micro,
    gumbel_micro, key_micro). Zero-gram documents carry no evidence and are
    omitted (the classifier/langmodel convention).

    The raw corpus is tokenized/hashed ONCE: its (doc_id, bucket) gram rows
    are materialized (two longs per gram — the lightweight proxy of the
    text; cheaper to store once than to re-scan and re-md5 the corpus) and
    the q-side bucket counts aggregate from that table instead of a second
    full text pass."""
    pos = _gram_buckets(
        raw.select(id_col, text_col), text_col, [id_col], buckets
    ).localCheckpoint(eager=True)
    q = pos.groupBy("bucket").agg(F.count("*").cast("long").alias("cq"))
    p = _bucket_counts(target, text_col, buckets, "cp")
    wt = _weight_table_from_counts(p, q, buckets)
    scored = (
        pos.join(F.broadcast(wt), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum("w_micro").cast("long").alias("logw_micro"),
        )
    )
    g = gumbel_micro(F.col(id_col), salt=salt)
    return scored.select(
        id_col,
        "n_grams",
        "logw_micro",
        g.alias("gumbel_micro"),
        (F.col("logw_micro") + g).alias("key_micro"),
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 10000,
    salt: str = "dsir",
) -> DataFrame:
    """The selection: top-k documents by key_micro (Gumbel-top-k ==
    weighted sampling without replacement, proportional to the importance
    weight). Plans as TakeOrderedAndProject — no global sort at 100 TB.
    doc_id breaks integer-key ties so the cut is total-ordered."""
    s = dsir_scores(
        raw, target, text_col=text_col, id_col=id_col, buckets=buckets, salt=salt
    )
    return s.orderBy(F.desc("key_micro"), F.asc(id_col)).limit(k)
