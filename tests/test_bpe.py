"""In-engine BPE tokenizer: distributed training equals the pure-python
twin merge-for-merge, encoding matches the twin per doc, and the classic
greedy/tie-break semantics hold on hand-computed fixtures."""

import pyspark.sql.functions as F

from link_profiler_repo_spark.operators.bpe import (
    EOW,
    _apply_merge,
    _encode_word,
    bpe_encode,
    bpe_train,
    py_bpe_encode,
    py_bpe_train,
)


def test_apply_merge_greedy_leftmost():
    assert _apply_merge(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _apply_merge(["a", "a", "a", "a"], "a", "a") == ["aa", "aa"]
    assert _apply_merge(["x", "y", EOW], "y", EOW) == ["x", "y" + EOW]
    assert _apply_merge(["x"], "a", "b") == ["x"]


def test_bpe_train_hand_golden(spark):
    """'low lower lowest' x freqs: the first merges are hand-derivable."""
    docs = spark.createDataFrame(
        [(1, "low low low lower lowest")], schema="doc_id long, text string"
    )
    merges = {r["step"]: (r["left"], r["right"], r["pair_freq"])
              for r in bpe_train(docs, num_merges=3).collect()}
    # 'lo' appears in all 5 word tokens; ties at 5 resolve lexicographically:
    # (l,o) < (o,w) so step 1 = l+o, step 2 = lo+w
    assert merges[1] == ("l", "o", 5)
    assert merges[2] == ("lo", "w", 5)
    # step 3: 'low</w>' occurs 3x (the three 'low' tokens) — the top pair
    assert merges[3] == ("low", EOW, 3)


def test_bpe_train_equals_python_twin(spark):
    from link_profiler_repo_spark.synth import SynthParams, synth_docs_spark

    docs = synth_docs_spark(spark, SynthParams(n_docs=40, n_hosts=4))
    texts = [r["text"] for r in docs.select(
        F.concat_ws(" ", F.transform(
            F.filter("spans", lambda s: s["kind"] == F.lit("text")),
            lambda s: s["text"])).alias("text")).collect()]
    flat = docs.sparkSession.createDataFrame(
        list(enumerate(texts)), schema="doc_id long, text string"
    )
    got = [
        (r["step"], r["left"], r["right"], r["merged"], r["pair_freq"])
        for r in bpe_train(flat, num_merges=12).orderBy("step").collect()
    ]
    assert got == py_bpe_train(texts, num_merges=12)
    assert len(got) == 12


def test_bpe_encode_matches_twin_and_counts(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cats sat"),
        (3, ""),
        (4, None),
    ]
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    merges = bpe_train(docs, num_merges=6)
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["segmented"])
        for r in bpe_encode(docs, merges).collect()
    }
    ml = [(r["left"], r["right"]) for r in merges.orderBy("step").collect()]
    expect = py_bpe_encode({i: t for i, t, in rows}, ml)
    assert got == expect
    # merging never increases length: chars+1 per word is the upper bound
    assert got[1][1] <= sum(len(w) + 1 for w in "the cat sat on the mat".split())
    # 'the' (freq 3 here) should have merged below its 4-symbol char form
    the_toks = _encode_word("the", ml)
    assert len(the_toks) < 4


def test_bpe_round_plan_lock(spark):
    """Plan lock for the training round: map-side partial_sum combine, one
    exchange on the pair key, TakeOrderedAndProject(limit=1) — never a
    global sort, never the pair table to the driver."""
    from link_profiler_repo_spark.operators.bpe import EOW, _pair_argmax, word_counts

    docs = spark.createDataFrame(
        [(1, "low low lower lowest")], schema="doc_id long, text string"
    )
    chars = F.transform(
        F.sequence(F.lit(0), F.length("word") - 1),
        lambda i: F.col("word").substr(i + 1, F.lit(1)),
    )
    state = word_counts(docs).select(
        "freq", F.concat(chars, F.array(F.lit(EOW))).alias("syms")
    )
    plan = _pair_argmax(state)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject(limit=1" in plan
    assert "partial_sum" in plan
    assert "Sort " not in plan  # no global sort node — the limit is pushed
