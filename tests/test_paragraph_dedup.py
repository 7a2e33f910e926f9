"""Cross-corpus paragraph dedup (CCNet §3.1): keep-first golden, python
twin on a randomized corpus, blank-structure and empty-doc edges."""

import random
import re

from link_profiler_repo_spark.operators.textops import paragraph_dedup


def _twin(docs):
    norm = lambda p: re.sub(r"[^a-z]+", "", p.lower())  # noqa: E731
    first = {}
    for doc_id, text in sorted(docs):
        for pos, para in enumerate(text.split("\n")):
            k = norm(para)
            if k and k not in first:
                first[k] = (doc_id, pos)
    out = {}
    for doc_id, text in docs:
        paras = text.split("\n")
        kept = [
            p
            for pos, p in enumerate(paras)
            if norm(p) == "" or first[norm(p)] == (doc_id, pos)
        ]
        out[doc_id] = (len(paras), len(paras) - len(kept), "\n".join(kept))
    return out


def _run(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_paras"], r["n_dropped"], r["clean_text"])
        for r in paragraph_dedup(df).collect()
    }


def test_keep_first_golden(spark):
    docs = [
        (1, "Cookie banner here.\nUnique alpha text.\n\nNAV menu"),
        (2, "Cookie banner here.\nUnique beta text.\nNAV menu"),
        (3, "cookie BANNER here!!\nUnique beta text."),  # normalizes equal
    ]
    got = _run(spark, docs)
    assert got[1] == (4, 0, "Cookie banner here.\nUnique alpha text.\n\nNAV menu")
    assert got[2] == (3, 2, "Unique beta text.")
    assert got[3] == (2, 2, "")


def test_within_doc_repeat_drops_later_copy(spark):
    got = _run(spark, [(7, "same para twice.\nmiddle bit.\nSAME para twice")])
    assert got[7] == (3, 1, "same para twice.\nmiddle bit.")


def test_matches_python_twin_random(spark):
    rng = random.Random(42)
    pool = [f"sentence number {k} appears here." for k in range(12)] + ["", "  ", "123"]
    docs = [
        (i, "\n".join(rng.choice(pool) for _ in range(rng.randint(1, 8))))
        for i in range(40)
    ]
    assert _run(spark, docs) == _twin(docs)


def test_empty_doc_and_blank_only(spark):
    got = _run(spark, [(1, ""), (2, "\n\n"), (3, "real content line.")])
    assert got[1] == (1, 0, "")
    assert got[2] == (3, 0, "\n\n")
    assert got[3] == (1, 0, "real content line.")
