"""ExactSubstr dedup (Lee et al. 2022): golden span-removal semantics, a
randomized naive-Python twin, and edge cases (short docs, whole-doc
removal, intra-doc repetition)."""

import random
import re

from link_profiler_repo_spark.operators.dedup import (
    exact_substr_dedup,
    exact_substr_spans,
)

L = 5

PASSAGE = "one two three four five six seven"  # 7 words > L


def _words(t):
    return [w for w in re.sub(r"[^a-zA-Z0-9']+", " ", t).lower().split() if w]


def _twin(docs, min_len=L):
    """Naive ExactSubstr: dict walk over every window, first occurrence by
    (doc_id, p), coverage by per-token scan."""
    occ = {}
    toks = {d: _words(t) for d, t in docs}
    for d in sorted(toks):
        ws = toks[d]
        for p in range(len(ws) - min_len + 1):
            occ.setdefault(" ".join(ws[p : p + min_len]), []).append((d, p))
    removed = {d: set() for d in toks}
    for hits in occ.values():
        if len(hits) < 2:
            continue
        for d, p in sorted(hits)[1:]:
            removed[d].update(range(p, p + min_len))
    out = {}
    for d, ws in toks.items():
        kept = [w for i, w in enumerate(ws) if i not in removed[d]]
        ndup = sum(
            1
            for hits in occ.values()
            if len(hits) > 1
            for dd, _ in sorted(hits)[1:]
            if dd == d
        )
        out[d] = (len(ws), ndup, len(ws) - len(kept), " ".join(kept))
    return out


def _run(spark, docs, min_len=L):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_dup_windows"], r["n_removed"], r["text_clean"])
        for r in exact_substr_dedup(df, min_len=min_len).collect()
    }


def test_golden_cross_doc_span_removed_keep_first(spark):
    docs = [
        (1, f"intro words here {PASSAGE} outro words"),
        (2, f"different opening {PASSAGE} different closing"),
        (3, "no shared content in this document at all"),
    ]
    got = _run(spark, docs)
    # doc 1 is the global first occurrence: untouched
    assert got[1][2] == 0 and got[1][3] == _run_text(docs[0][1])
    # doc 2 loses exactly the passage tokens (7 words), nothing else
    assert got[2][2] == 7
    assert got[2][3] == "different opening different closing"
    assert got[3][2] == 0


def _run_text(t):
    return " ".join(_words(t))


def test_intra_doc_repeat_and_whole_doc_removal(spark):
    docs = [
        (1, f"{PASSAGE} and then {PASSAGE}"),  # second copy removed
        (2, PASSAGE),  # entire doc duplicated elsewhere -> fully removed
        (3, "tiny doc"),  # under the window: never touched
        (4, ""),
    ]
    got = _run(spark, docs)
    assert got[1][3] == f"{PASSAGE} and then"
    assert got[2] == (7, 3, 7, "")  # 3 windows of 5 over 7 words, all dup
    assert got[3] == (2, 0, 0, "tiny doc")
    assert got[4] == (0, 0, 0, "")


def test_randomized_matches_python_twin(spark):
    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(30)]
    shared = " ".join(rng.choice(vocab) for _ in range(9))
    docs = []
    for d in range(20):
        n = rng.randint(0, 40)
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.4 and n > 4:
            at = rng.randint(0, n - 1)
            words[at:at] = shared.split()
        docs.append((d, " ".join(words)))
    assert _run(spark, docs) == _twin(docs)


def test_spans_table_first_occurrence_excluded(spark):
    docs = [(7, PASSAGE), (9, PASSAGE)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    spans = {(r["doc_id"], r["p"]) for r in exact_substr_spans(df, min_len=L).collect()}
    assert spans == {(9, 0), (9, 1), (9, 2)}  # doc 7 (smaller id) kept
