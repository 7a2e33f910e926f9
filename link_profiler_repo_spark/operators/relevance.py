"""BM25 relevance scoring (Robertson & Zaragoza 2009, the Lucene
`1 + (N - n + 0.5)/(n + 0.5)` idf flavor) — the classic term-based ranker
behind the reference's keyword/SERP analysis surface
(services/serp_service.py keyword relevance; keyword_research job): given a
term list, score every document that matches at least one term.

Exactness contract (classifier/langmodel precedent): idf is quantized to
integer micro-nats immediately after the ln; the per-term saturation
fraction tf·(k1+1)/(tf + k1·(1-b+b·dl/avgdl)) is a pure function of
integer counts and the two driver constants, evaluated as the SAME
double-precision expression tree in both engines; each term contribution
rounds to an integer once, so document scores are exact integer sums.

Scale shape at 100 TB: the corpus tokenizes once; the exploded token rows
filter on term membership IMMEDIATELY (an isin over a driver-known list —
Catalyst pushes it below the shuffle), so only matching (doc, term) rows
ever move. Document frequencies collapse to |terms| rows and BROADCAST;
doc length joins on doc_id (the only corpus-side shuffle); the final agg
is one partial-combined groupBy. Zero Python anywhere.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .textops import _words

MICRO = 1000000.0


def _ln_micro(x) -> F.Column:
    return F.round(F.log(x) * F.lit(MICRO), 0).cast("long")


def bm25_scores(
    docs: DataFrame,
    terms: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """(doc_id, dl, n_terms_matched, score_micro) for every document
    matching >= 1 query term. Terms are matched on the _words tokenization
    (lowercased); duplicate query terms are deduped (a term scores once).

    Shape: the term list is driver-known and small (tens of terms — a
    query, not a vocabulary), so per-term tf becomes one COLUMN per term in
    a single tokenize pass, the corpus-wide stats (n_docs, total_dl, and
    every term's document frequency) collapse into ONE 1-row aggregate that
    broadcasts back, and the corpus is never shuffled at all — no token
    explode, no doc_id join. The per-term contribution expression is the
    identical double DAG as the exploded form, so scores are bit-equal."""
    terms = sorted(set(t.lower() for t in terms))
    toks = docs.select(id_col, _words(F.col(text_col)).alias("_ws"))
    # one narrow row per doc: (id, dl, tf per term); materialized once —
    # the stats aggregate and the scoring pass both read it
    def _tf(t: str) -> F.Column:
        # factory, not a default-arg lambda: F.filter dispatches on lambda
        # arity, and a (x, t=t) signature would be called as (element, index)
        return F.size(F.filter("_ws", lambda x: x == F.lit(t))).cast("long")

    pertf = toks.select(
        id_col,
        F.size("_ws").cast("long").alias("dl"),
        *[_tf(t).alias(f"_tf_{i}") for i, t in enumerate(terms)],
    ).localCheckpoint(eager=True)
    stats = pertf.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_dl"),
        *[
            F.sum((F.col(f"_tf_{i}") > 0).cast("long")).cast("long").alias(f"_nt_{i}")
            for i in range(len(terms))
        ],
    )
    idf = stats.select(
        "n_docs",
        "total_dl",
        *[
            _ln_micro(
                F.lit(1.0)
                + (F.col("n_docs") - F.col(f"_nt_{i}") + F.lit(0.5))
                / (F.col(f"_nt_{i}") + F.lit(0.5))
            ).alias(f"_idf_{i}")
            for i in range(len(terms))
        ],
    )
    j = pertf.join(F.broadcast(idf), how="cross")
    avgdl = F.col("total_dl").cast("double") / F.col("n_docs").cast("double")

    def _contrib(i: int) -> F.Column:
        tf = F.col(f"_tf_{i}")
        frac = (tf * F.lit(k1 + 1.0)) / (
            tf
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * (F.col("dl").cast("double") / avgdl))
        )
        return F.when(
            tf > 0, F.round(F.col(f"_idf_{i}") * frac, 0).cast("long")
        ).otherwise(F.lit(0).cast("long"))

    matched = sum(
        ((F.col(f"_tf_{i}") > 0).cast("long") for i in range(len(terms))),
        F.lit(0).cast("long"),
    )
    score = sum((_contrib(i) for i in range(len(terms))), F.lit(0).cast("long"))
    return j.filter(matched > 0).select(
        id_col,
        "dl",
        matched.cast("long").alias("n_terms_matched"),
        score.cast("long").alias("score_micro"),
    )


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k by score (doc_id tie-break) — plans as TakeOrderedAndProject,
    never a global sort."""
    s = bm25_scores(docs, terms, text_col=text_col, id_col=id_col, k1=k1, b=b)
    return s.orderBy(F.desc("score_micro"), F.asc(id_col)).limit(k)
