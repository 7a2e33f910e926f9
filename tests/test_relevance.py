"""BM25 relevance scoring: exact equality vs a naive Python twin
(math.log dict walk), ranking direction, and edge cases."""

import math
import re

from link_profiler_repo_spark.operators.relevance import bm25_scores, bm25_topk

K1, B = 1.2, 0.75

DOCS = [
    (1, "spark shuffle join hash join broadcast join"),
    (2, "hash table hash map hash set hash hash"),
    (3, "completely unrelated prose about rivers and trees"),
    (4, "a longer document that mentions join exactly once amid many many other words to dilute it"),
    (5, ""),
]
TERMS = ["join", "hash", "absentterm"]


def _words(t):
    return [w for w in re.sub(r"[^a-zA-Z0-9']+", " ", t).lower().split() if w]


def _twin(docs, terms, k1=K1, b=B):
    toks = {d: _words(t) for d, t in docs}
    n = len(toks)
    total = sum(len(w) for w in toks.values())
    avgdl = total / n
    tset = sorted(set(terms))
    nt = {t: sum(1 for ws in toks.values() if t in ws) for t in tset}
    out = {}
    for d, ws in toks.items():
        sc, matched = 0, 0
        for t in tset:
            tf = ws.count(t)
            if not tf:
                continue
            idf = round(math.log(1.0 + (n - nt[t] + 0.5) / (nt[t] + 0.5)) * 1e6)
            frac = (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * (len(ws) / avgdl)))
            sc += round(idf * frac)
            matched += 1
        if matched:
            out[d] = (len(ws), matched, sc)
    return out


def test_scores_match_python_twin_exactly(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["dl"], r["n_terms_matched"], r["score_micro"])
        for r in bm25_scores(df, TERMS).collect()
    }
    assert got == _twin(DOCS, TERMS)
    assert 3 not in got and 5 not in got  # non-matching docs omitted


def test_ranking_direction_and_topk(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = bm25_topk(df, TERMS, k=2).collect()
    tw = sorted(_twin(DOCS, TERMS).items(), key=lambda kv: (-kv[1][2], kv[0]))
    assert [r["doc_id"] for r in top] == [d for d, _ in tw[:2]]
    # doc 2 (5x hash) must outrank doc 4 (single diluted join)
    scores = _twin(DOCS, TERMS)
    assert scores[2][2] > scores[4][2]


def test_topk_plan_is_take_ordered(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = bm25_topk(df, TERMS, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
