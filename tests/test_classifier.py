"""Hashed-NB quality classifier: exact equality vs a naive Python twin
(hashlib + math.log dict walk), class-separation sanity, and edge cases."""

import hashlib
import math
import re

import pytest

from link_profiler_repo_spark.operators.classifier import (
    nb_score,
    quality_classifier,
    train_nb_classifier,
)

GOOD = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a well written article about science and careful measurement today",
    "readers enjoy clear prose with varied vocabulary and honest sourcing",
    "the library catalog lists every book by author title and subject",
]
BAD = [
    "click here buy now cheap pills casino bonus win win win",
    "free money casino jackpot click click subscribe now now now",
    "cheap cheap pills pills casino casino bonus bonus click here",
    "win big jackpot free bonus buy cheap pills now click here",
]


def _words(t):
    return [w for w in re.sub(r"[^a-zA-Z0-9']+", " ", t).lower().split() if w]


def _feats(t):
    ws = _words(t)
    grams = ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return [hashlib.md5(g.encode()).hexdigest()[:8] for g in grams]


def _twin(labeled, docs):
    """Naive multinomial NB with add-one smoothing, integer micro-nats."""
    cg, cb = {}, {}
    dg = db = 0
    for text, y in labeled:
        (dg, db) = (dg + 1, db) if y else (dg, db + 1)
        for f in _feats(text):
            d = cg if y else cb
            d[f] = d.get(f, 0) + 1
    v = len(set(cg) | set(cb))
    ng, nb = sum(cg.values()), sum(cb.values())
    lnm = lambda x: round(math.log(x) * 1e6)  # noqa: E731
    w0 = lnm(1.0 / (ng + v)) - lnm(1.0 / (nb + v))
    bias = lnm(float(dg)) - lnm(float(db))
    out = {}
    for doc_id, text in docs:
        fs = _feats(text)
        if not fs:
            continue
        s = bias
        for f in fs:
            if f in cg or f in cb:
                s += lnm((cg.get(f, 0) + 1.0) / (ng + v)) - lnm(
                    (cb.get(f, 0) + 1.0) / (nb + v)
                )
            else:
                s += w0
        out[doc_id] = (len(fs), s, int(s >= 0))
    return out


def test_matches_python_twin_exactly(spark):
    labeled = [(t, 1) for t in GOOD] + [(t, 0) for t in BAD]
    docs = [(f"d{i}", t) for i, t in enumerate(
        GOOD + BAD + ["quick brown science casino", "zzz unseen gibberish words only"]
    )]
    ldf = spark.createDataFrame(labeled, "text string, label int")
    ddf = spark.createDataFrame(docs, "doc_id string, text string")
    got = {
        r["doc_id"]: (r["n_feats"], r["score_micro"], r["keep"])
        for r in quality_classifier(ddf, ldf).collect()
    }
    assert got == _twin(labeled, docs)


def test_separates_held_out_classes(spark):
    ldf = spark.createDataFrame(
        [(t, 1) for t in GOOD[:3]] + [(t, 0) for t in BAD[:3]],
        "text string, label int",
    )
    ddf = spark.createDataFrame(
        [("g", GOOD[3]), ("b", BAD[3])], "doc_id string, text string"
    )
    rows = {r["doc_id"]: r for r in quality_classifier(ddf, ldf).collect()}
    assert rows["g"]["keep"] == 1 and rows["b"]["keep"] == 0
    assert rows["g"]["score_micro"] > 0 > rows["b"]["score_micro"]


def test_zero_gram_docs_omitted_and_unseen_w0(spark):
    ldf = spark.createDataFrame(
        [("good words here", 1), ("bad spam words", 0)], "text string, label int"
    )
    model = train_nb_classifier(ldf)
    ddf = spark.createDataFrame(
        [("empty", ""), ("punct", "!!! ..."), ("unseen", "qqq www eee")],
        "doc_id string, text string",
    )
    rows = {r["doc_id"]: r for r in nb_score(ddf, model).collect()}
    assert set(rows) == {"unseen"}
    # all-unseen doc: score = bias + n*w0; bias = ln(1/1) diff = 0
    t = model["totals"].collect()[0]
    n = rows["unseen"]["n_feats"]
    assert rows["unseen"]["score_micro"] == t["bias_micro"] + n * t["w0_micro"]


def test_single_class_training_rejected_by_math(spark):
    """All-good training: ln(0) on the bad side would be the failure mode;
    the math yields a NULL bias (log of 0 docs) — assert the operator
    surfaces that loudly rather than silently keeping everything."""
    ldf = spark.createDataFrame([("only good docs", 1)], "text string, label int")
    t = train_nb_classifier(ldf)["totals"].collect()[0]
    assert t["bias_micro"] is None  # ln(0) -> NULL: visibly unusable model
