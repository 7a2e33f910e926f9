"""DSIR importance resampling (operators/dsir.py): exact equality vs a
naive Python twin (hashlib + math.log dict walk), importance-weight
direction, Gumbel-top-k selection semantics, and plan shape."""

import hashlib
import math
import re

import pyspark.sql.functions as F

from link_profiler_repo_spark.operators.dsir import (
    dsir_scores,
    dsir_select,
    dsir_weight_table,
)

B = 64  # tiny bucket count so hash collisions actually occur in-fixture

TARGET = [
    "stellar parallax measures the distance to nearby stars precisely",
    "the telescope resolves binary stars and faint distant galaxies",
    "astronomers chart stellar spectra to classify stars by temperature",
]
RAW = [
    (1, "stellar spectra classify stars and the telescope resolves galaxies"),
    (2, "click here buy now cheap pills casino bonus win big today"),
    (3, "the quick brown fox jumps over the lazy dog near the river"),
    (4, "astronomers chart distant galaxies with the telescope nightly"),
    (5, ""),
    (6, "casino casino casino bonus bonus click click buy buy now"),
]


def _words(t):
    return [w for w in re.sub(r"[^a-zA-Z0-9']+", " ", t).lower().split() if w]


def _buckets(t, b=B):
    ws = _words(t)
    grams = ws + [f"{x} {y}" for x, y in zip(ws, ws[1:])]
    return [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % b for g in grams]


def _twin(raw, target, b=B, salt="dsir"):
    """Naive DSIR: smoothed bucket distributions, integer micro-nats,
    md5-seeded Gumbel, per-doc (n_grams, logw, gumbel, key)."""
    cp, cq = {}, {}
    for t in target:
        for k in _buckets(t, b):
            cp[k] = cp.get(k, 0) + 1
    for _, t in raw:
        for k in _buckets(t, b):
            cq[k] = cq.get(k, 0) + 1
    np_, nq = sum(cp.values()), sum(cq.values())
    lnm = lambda x: round(math.log(x) * 1e6)  # noqa: E731
    w = {
        k: lnm((cp.get(k, 0) + 1.0) / (np_ + b)) - lnm((cq.get(k, 0) + 1.0) / (nq + b))
        for k in set(cp) | set(cq)
    }
    out = {}
    for doc_id, t in raw:
        ks = _buckets(t, b)
        if not ks:
            continue
        logw = sum(w[k] for k in ks)
        v = int(hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:13], 16)
        u = (v + 0.5) / float(1 << 52)
        t_micro = max(round(-math.log(u) * 1e6), 1)
        g = round(-math.log(t_micro / 1e6) * 1e6)
        out[doc_id] = (len(ks), logw, g, logw + g)
    return out


def _frames(spark):
    raw = spark.createDataFrame(RAW, "doc_id long, text string")
    target = spark.createDataFrame([(t,) for t in TARGET], "text string")
    return raw, target


def test_scores_match_python_twin_exactly(spark):
    raw, target = _frames(spark)
    got = {
        r["doc_id"]: (r["n_grams"], r["logw_micro"], r["gumbel_micro"], r["key_micro"])
        for r in dsir_scores(raw, target, buckets=B).collect()
    }
    assert got == _twin(RAW, TARGET)


def test_target_like_docs_outweigh_off_target(spark):
    raw, target = _frames(spark)
    lw = {
        r["doc_id"]: r["logw_micro"] / r["n_grams"]
        for r in dsir_scores(raw, target, buckets=B).collect()
    }
    # per-gram log-weight: astronomy docs above both spam and neutral prose
    assert min(lw[1], lw[4]) > max(lw[2], lw[3], lw[6])


def test_zero_gram_doc_omitted_and_k_truncates(spark):
    raw, target = _frames(spark)
    all_rows = dsir_select(raw, target, k=100, buckets=B).collect()
    assert sorted(r["doc_id"] for r in all_rows) == [1, 2, 3, 4, 6]  # 5 is empty
    top2 = dsir_select(raw, target, k=2, buckets=B).collect()
    expected = sorted(_twin(RAW, TARGET).items(), key=lambda kv: (-kv[1][3], kv[0]))[:2]
    assert [r["doc_id"] for r in top2] == [d for d, _ in expected]


def test_weight_table_bounded_and_plan_shape(spark):
    raw, target = _frames(spark)
    wt = dsir_weight_table(raw, target, buckets=B)
    assert wt.count() <= B
    plan = dsir_select(raw, target, k=3, buckets=B)._jdf.queryExecution().executedPlan().toString()
    # scoring joins the <=B-row weight table broadcast; top-k never global-sorts
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
