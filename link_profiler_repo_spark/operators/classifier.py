"""Hashed-feature quality classifier — the *classifier* stage of a corpus
pipeline (GPT-3 App. A "quality filtering" logistic classifier; CCNet §3.3
and DCLM use fastText), as a deterministic in-engine stand-in: Naive-Bayes
log-odds over hashing-trick word features, trained AND scored relationally.
Same framing as operators/langmodel.py (the KenLM stand-in): the published
pipelines load a pretrained model; here the model itself is a pair of
DataFrames produced by groupBy counts, so the whole stage — training
included — is pure Catalyst and bit-exact under the DuckDB gate. No
reference counterpart in altommo/Link_Profiler_Repo (its quality surface is
heuristic ratios); this is added LLM-training-pipeline surface like
dedup/decontamination/perplexity.

Model: multinomial Naive Bayes with add-one smoothing over hashed gram
features (unigrams + bigrams). The hashing trick uses the first 8 hex chars
of md5(gram) as the feature id — a 2^32-bucket hash both engines compute
identically from the same string bytes (the sampling.py md5 precedent), so
collisions (the defining semantic of hashed features) are reproduced
exactly by the oracle.

    w(f)  = ln((c_good(f)+1) / (N_good+V)) - ln((c_bad(f)+1) / (N_bad+V))
    score(doc) = bias + sum over gram positions of w(feat(gram))
    keep  = score >= 0

Exactness contract (langmodel.py precedent): counts are integers, each
ln() is immediately quantized to integer micro-nats (round(ln·1e6) BIGINT);
weights are differences of those integers, document scores are exact
integer sums — order-free, engine-independent. Positions score with
multiplicity (multinomial NB), so scoring needs no per-document distinct.

Scale shape at 100 TB: training is two groupBys over the labeled slice
(map-side combined; labeled slices are small by nature — the GPT-3
classifier trained on WebText-vs-CommonCrawl samples). Scoring explodes the
corpus into (doc_id, feat) rows and joins on the feat key — the model side
is broadcast-sized (V <= 2^32 but realistically millions), the corpus side
never shuffles on the document. Zero Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .textops import _words, word_ngrams_or_empty

MICRO = 1000000.0


def _feat_rows(df: DataFrame, text_col: str, keep_cols: list[str]) -> DataFrame:
    """(keep_cols..., feat) rows: unigram + bigram features hashed to the
    first 8 hex chars of md5(gram). Bigrams join words with a single space
    (the word_ngrams convention), so a bigram can never collide with a
    unigram by string identity — only by hash, which is the semantic under
    test. Words and grams stage through NAMED COLUMNS before the explode
    (the repetition_profile/_bench_gram_hits rule: exploding the inline
    expression re-evaluates the tokenize+zip_with tree per output gram)."""
    w = F.col("_ws")
    return (
        df.select(*keep_cols, _words(F.col(text_col)).alias("_ws"))
        .select(*keep_cols, F.concat(w, word_ngrams_or_empty(w, 2)).alias("_grams"))
        .select(*keep_cols, F.explode("_grams").alias("_g"))
        .select(*keep_cols, F.substring(F.md5("_g"), 1, 8).alias("feat"))
    )


def _ln_micro(x) -> F.Column:
    return F.round(F.log(x) * F.lit(MICRO), 0).cast("long")


def train_nb_classifier(
    labeled: DataFrame, text_col: str = "text", label_col: str = "label"
) -> dict[str, DataFrame]:
    """Train from (text, label int 1=good/0=bad) rows.

    Returns {"feats": (feat, w_micro), "totals": 1-row (w0_micro for
    unseen features, bias_micro from doc priors, v, n_good, n_bad)}.
    V counts DISTINCT HASHED features over both classes (the model's own
    vocabulary — collisions merge before smoothing, by construction)."""
    pos = _feat_rows(
        labeled.select(F.col(label_col).cast("int").alias("_y"), text_col),
        text_col,
        ["_y"],
    )
    counts = pos.groupBy("feat").agg(
        F.sum("_y").cast("long").alias("cg"),
        F.sum(1 - F.col("_y")).cast("long").alias("cb"),
    )
    totals = counts.agg(
        F.coalesce(F.sum("cg"), F.lit(0)).cast("long").alias("n_good"),
        F.coalesce(F.sum("cb"), F.lit(0)).cast("long").alias("n_bad"),
        F.count("*").cast("long").alias("v"),
    )
    docs = labeled.agg(
        F.sum(F.col(label_col).cast("int")).cast("long").alias("_dg"),
        F.sum(1 - F.col(label_col).cast("int")).cast("long").alias("_db"),
    )
    dg, db = F.col("_dg").cast("double"), F.col("_db").cast("double")
    totals = totals.join(docs, how="cross").select(
        (
            _ln_micro(F.lit(1.0) / (F.col("n_good") + F.col("v")).cast("double"))
            - _ln_micro(F.lit(1.0) / (F.col("n_bad") + F.col("v")).cast("double"))
        ).alias("w0_micro"),
        (_ln_micro(dg) - _ln_micro(db)).alias("bias_micro"),
        "v", "n_good", "n_bad",
    )
    gden = (F.col("n_good") + F.col("v")).cast("double")
    bden = (F.col("n_bad") + F.col("v")).cast("double")
    feats = counts.join(F.broadcast(totals.select("v", "n_good", "n_bad")), how="cross").select(
        "feat",
        (
            _ln_micro((F.col("cg") + 1).cast("double") / gden)
            - _ln_micro((F.col("cb") + 1).cast("double") / bden)
        ).alias("w_micro"),
    )
    return {"feats": feats, "totals": totals.select("w0_micro", "bias_micro")}


def nb_score(
    docs: DataFrame,
    model: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score: (doc_id, n_feats, score_micro BIGINT, avg_w = round(score/
    1e6/n_feats, 6), keep INT at score_micro >= 0). Zero-gram documents
    carry no evidence and are omitted (the langmodel convention — route
    them to the heuristic filters instead)."""
    pos = _feat_rows(docs.select(id_col, text_col), text_col, [id_col])
    j = pos.join(model["feats"], "feat", "left").join(
        F.broadcast(model["totals"]), how="cross"
    )
    w = F.coalesce(F.col("w_micro"), F.col("w0_micro"))
    out = (
        j.select(id_col, w.alias("_w"), "bias_micro")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_feats"),
            (F.sum("_w") + F.first("bias_micro")).cast("long").alias("score_micro"),
        )
    )
    avg = F.round(
        F.col("score_micro").cast("double") / F.lit(MICRO) / F.col("n_feats").cast("double"), 6
    )
    return out.select(
        id_col,
        "n_feats",
        "score_micro",
        avg.alias("avg_w"),
        (F.col("score_micro") >= 0).cast("int").alias("keep"),
    )


def quality_classifier(
    docs: DataFrame,
    labeled: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    label_col: str = "label",
) -> DataFrame:
    """Train-and-score convenience: the classifier stage as one call."""
    return nb_score(
        docs, train_nb_classifier(labeled, text_col, label_col),
        text_col=text_col, id_col=id_col,
    )
