"""LM perplexity filter (operators/langmodel.py) — hand-computed golden on a
tiny corpus, a randomized python-twin equality sweep, and the edge-case
contracts (empty doc omitted, one-word doc scores the <s> context, OOV docs
take the pure-backoff path, perplexity column = exp(-avg))."""

import math
import random
import re
from collections import Counter

import pyspark.sql.functions as F
import pytest

from link_profiler_repo_spark.operators.langmodel import (
    lm_perplexity,
    lm_score,
    train_bigram_lm,
)

TRAIN = ["the cat sat on the mat", "the dog sat on the log", "a cat and a dog"]


def _words(t):
    return [w for w in re.sub(r"[^a-zA-Z0-9']+", " ", t).lower().split() if w]


def _twin(train_txt, score_pairs, lam=0.7):
    """Per-row python reference: identical count tables + IEEE dag +
    micro-nat quantization (ties away from zero, matching round HALF_UP)."""
    uni, big, ctx = Counter(), Counter(), Counter()
    for t in train_txt:
        ws = _words(t)
        uni.update(ws)
        seq = ["<s>"] + ws
        big.update(zip(seq, seq[1:]))
    for (v, _), c in big.items():
        ctx[v] += c
    n_total, vocab = sum(uni.values()), len(uni)
    out = {}
    for did, t in score_pairs:
        ws = _words(t)
        if not ws:
            continue
        seq = ["<s>"] + ws
        tot = 0
        for v, w in zip(seq, seq[1:]):
            pml = big[(v, w)] / ctx[v] if (v, w) in big else 0.0
            puni = (uni.get(w, 0) + 1.0) / (n_total + vocab + 1.0)
            x = math.log(lam * pml + (1.0 - lam) * puni) * 1000000.0
            tot += int(math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1))
        out[did] = (len(ws), tot)
    return out


def _run(spark, train_txt, score_pairs, lam=0.7, thr=-7.0):
    train = spark.createDataFrame([(t,) for t in train_txt], "text string")
    docs = spark.createDataFrame(score_pairs, "doc_id string, text string")
    got = lm_score(docs, train_bigram_lm(train), lam=lam, keep_avg_logprob=thr)
    return {r.doc_id: r.asDict() for r in got.collect()}


def test_golden_tiny_corpus(spark):
    score = [("d1", "the cat sat"), ("d2", "zzq unk wds here"), ("d3", "cat"), ("d4", "")]
    rows = _run(spark, TRAIN, score)
    exp = _twin(TRAIN, score)
    assert set(rows) == set(exp) == {"d1", "d2", "d3"}  # d4 empty -> omitted
    for d, (n, micro) in exp.items():
        assert rows[d]["n_tokens"] == n
        assert rows[d]["logprob_micro"] == micro
        assert rows[d]["avg_logprob"] == round(micro / 1e6 / n, 6)
    # known bigram "the cat" beats the fully-OOV doc per token
    assert rows["d1"]["avg_logprob"] > rows["d2"]["avg_logprob"]
    # one-word doc scores exactly the (<s>, cat) position
    assert rows["d3"]["n_tokens"] == 1
    assert rows["d2"]["keep"] == 1 and rows["d1"]["keep"] == 1
    strict = _run(spark, TRAIN, score, thr=-3.0)
    assert strict["d1"]["keep"] == 1 and strict["d2"]["keep"] == 0


def test_random_corpus_matches_twin(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)] + ["don't", "x9"]
    mk = lambda: " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))  # noqa: E731
    train_txt = [mk() for _ in range(40)]
    score = [(f"d{i}", mk()) for i in range(60)]
    rows = _run(spark, train_txt, score, lam=0.5)
    exp = _twin(train_txt, score, lam=0.5)
    assert set(rows) == set(exp)
    for d, (n, micro) in exp.items():
        assert (rows[d]["n_tokens"], rows[d]["logprob_micro"]) == (n, micro), d


def test_ctx_counts_derive_from_bigrams(spark):
    # c(v) = sum_w c(vw): doc-final tokens are not contexts. 'mat', 'log',
    # 'dog'(final in doc 3) end documents; 'the' appears 4x as a context.
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    lm = train_bigram_lm(train)
    ctx = {r.v: r.cv for r in lm["ctx"].collect()}
    assert ctx["<s>"] == 3  # one start per nonempty doc
    assert ctx["the"] == 4
    assert "mat" not in ctx and "log" not in ctx
    tot = lm["totals"].collect()[0]
    assert tot.n_tokens == sum(len(_words(t)) for t in TRAIN)
    assert tot.vocab == len({w for t in TRAIN for w in _words(t)})


def test_perplexity_column_is_exp_of_avg(spark):
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    docs = spark.createDataFrame([("d1", "the cat sat")], "doc_id string, text string")
    row = lm_perplexity(docs, train).collect()[0]
    assert row.perplexity == pytest.approx(math.exp(-row.avg_logprob))
    assert row.perplexity > 1.0


def test_score_join_is_gram_keyed(spark):
    """Scale contract: the scoring plan joins on the gram/word keys and
    aggregates per doc — no crossJoin with a non-singleton side, no UDFs."""
    train = spark.createDataFrame([(t,) for t in TRAIN], "text string")
    docs = spark.createDataFrame([("d1", "the cat sat")], "doc_id string, text string")
    plan = lm_score(docs, train_bigram_lm(train))._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the only nested-loop join is the 1-row totals broadcast
    assert plan.count("CartesianProduct") == 0
