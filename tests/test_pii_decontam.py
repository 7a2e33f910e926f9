"""PII scan/redaction + benchmark decontamination tests (textops additions).

Python twins use the `re` module: for the engine-portable pattern subset
(char classes, bounded repetition, \\b — no lookaround/backrefs/ambiguity)
Python, Java (Spark) and RE2 (DuckDB) all define the identical match set,
so `re` is a fair third implementation.
"""

import random
import re

import pyspark.sql.functions as F

from link_profiler_repo_spark.operators.textops import (
    PII_PATTERNS,
    decontaminate,
    pii_profile,
)


def test_pii_golden(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.co.uk or call 555-123-4567 now"),
            (2, "ssn 123-45-6789 from host 10.0.0.1 and 192.168.1.255"),
            (3, "no pii here at all"),
            (4, None),
            (5, "phone 555-123-4567 is not an ssn; 1234.5.6.7 is not an ip"),
        ],
        schema="doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_profile(df).collect()}
    assert (rows[1]["n_email"], rows[1]["n_phone"]) == (1, 1)
    assert rows[1]["redacted"] == "mail <EMAIL> or call <PHONE> now"
    assert (rows[2]["n_ssn"], rows[2]["n_ipv4"]) == (1, 2)
    assert rows[2]["redacted"] == "ssn <SSN> from host <IPV4> and <IPV4>"
    assert rows[3]["n_pii"] == 0 and rows[3]["has_pii"] == 0
    assert rows[3]["redacted"] == "no pii here at all"
    assert rows[4]["n_pii"] == 0 and rows[4]["redacted"] == ""
    # the hyphenated patterns never cross-match, and a 4-digit first octet
    # kills the whole dotted-quad (\b anchoring)
    assert (rows[5]["n_phone"], rows[5]["n_ssn"], rows[5]["n_ipv4"]) == (1, 0, 0)


def test_pii_python_twin(spark):
    rng = random.Random(7)
    frags = [
        "hello world",
        "a@b.io",
        "555-000-1111",
        "999-11-2222",
        "8.8.8.8",
        "not555-000-1111",  # 't'|'5' are both word chars: no \b, so no phone match
        "x.y",
        "12.34",
        "user.name%tag@mail.example.com",
        "1.2.3.4.5",
    ]
    docs = [
        (i, " ".join(rng.choice(frags) for _ in range(rng.randint(1, 12))))
        for i in range(60)
    ]
    rows = {
        r["doc_id"]: r
        for r in pii_profile(
            spark.createDataFrame(docs, schema="doc_id long, text string")
        ).collect()
    }
    for i, text in docs:
        red = text
        for name, pat, repl in PII_PATTERNS:
            assert rows[i][f"n_{name}"] == len(re.findall(pat, text)), (name, text)
            red = re.sub(pat, repl, red)
        assert rows[i]["redacted"] == red, text


def test_decontaminate_golden(spark):
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta tail one"),
            (2, "zz alpha beta gamma yy"),  # shares the bench 3-gram
            (3, "beta gamma alpha"),  # same words, different order: clean
            (4, "two words"),  # shorter than n: never flagged
            (5, "alpha beta gamma alpha beta gamma"),  # gram appears twice, counted once
        ],
        schema="doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [("alpha beta gamma",), ("unrelated nonce words here",)], schema="text string"
    )
    rows = {r["doc_id"]: r for r in decontaminate(docs, bench, n=3).collect()}
    assert rows[1]["contaminated"] == 1 and rows[1]["n_overlap"] == 1
    assert rows[2]["contaminated"] == 1
    assert rows[3]["contaminated"] == 0 and rows[3]["n_overlap"] == 0
    assert rows[4]["contaminated"] == 0
    assert rows[5]["n_overlap"] == 1  # distinct grams, not occurrences


def test_decontaminate_python_twin(spark):
    rng = random.Random(13)
    vocab = [f"w{k}" for k in range(12)]
    mk = lambda n: " ".join(rng.choice(vocab) for _ in range(n))  # noqa: E731
    docs = [(i, mk(rng.randint(0, 25))) for i in range(80)]
    bench = [(mk(rng.randint(2, 15)),) for _ in range(10)]
    n = 4

    def grams(text):
        ws = [w for w in re.split(r"\s+", re.sub(r"[^a-zA-Z0-9']+", " ", text.lower())) if w]
        return {" ".join(ws[j : j + n]) for j in range(len(ws) - n + 1)}

    bset = set().union(*(grams(t) for (t,) in bench))
    out = decontaminate(
        spark.createDataFrame(docs, schema="doc_id long, text string"),
        spark.createDataFrame(bench, schema="text string"),
        n=n,
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    for i, text in docs:
        expect = len(grams(text) & bset)
        assert rows[i]["n_overlap"] == expect, (i, text)
        assert rows[i]["contaminated"] == int(expect > 0)


def test_decontaminate_broadcasts_bench_grams(spark):
    docs = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.lit("a b c d e f g h i j"), F.col("id").cast("string")).alias(
            "text"
        ),
    )
    bench = spark.createDataFrame([("a b c d e f g h",)], schema="text string")
    plan = decontaminate(docs, bench, n=8)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_build_corpus_scrub_stages(spark):
    from link_profiler_repo_spark.operators.corpus import build_corpus

    base = (
        "the quick brown fox jumps over the lazy dog and runs to the barn "
        "for it is warm in there today again"
    )
    docs = spark.createDataFrame(
        [
            # PII twins: identical after redaction -> dedup keeps doc 1 only
            (1, "en", base + " mail a@x.io now"),
            (2, "en", base + " mail b@y.io now"),
            # contaminated: shares an 8-gram with the bench row
            (3, "en", base + " extra tail words here"),
            # clean keeper
            (4, "en", "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                      "the and of to in is it that for a plus more words here now"),
        ],
        schema="doc_id long, lang string, text string",
    )
    bench = spark.createDataFrame([(base,)], schema="text string")
    out = build_corpus(
        docs,
        targets={"en": 1.0},
        total_rows=100.0,
        budget=10_000,
        redact_pii=True,
        bench=bench,
        decontam_n=8,
    )
    kept = sorted(r["doc_id"] for r in out.collect())
    # 1 and 2 are contaminated TOO (they contain base verbatim) -> all of
    # 1,2,3 drop via the anti-join; only 4 survives
    assert kept == [4]

    # without the bench, redaction-created twins collapse to the canonical min
    out2 = build_corpus(
        docs, targets={"en": 1.0}, total_rows=100.0, budget=10_000, redact_pii=True
    )
    kept2 = sorted(r["doc_id"] for r in out2.collect())
    assert 1 in kept2 and 2 not in kept2 and 3 in kept2 and 4 in kept2


def test_c4_clean_golden(spark):
    from link_profiler_repo_spark.operators.textops import c4_clean

    doc = "\n".join(
        [
            "A proper sentence with exactly enough words.",  # kept
            "Short line.",  # <5 words
            "no terminal punctuation on this line at all",  # no [.!?"]
            "Please enable JavaScript to continue reading this.",  # javascript
            'He said "this quoted line has enough words."',  # ends with "
            "Another complete sentence finishes the page properly!",
        ]
    )
    docs = spark.createDataFrame(
        [
            (1, doc),
            (2, doc + "\nvar x = { a: 1 };"),  # '{' -> page dropped
            (3, doc.replace("quoted", "lorem ipsum")),  # page dropped
            (4, "One good sentence with enough words here."),  # <3 sentences
            (5, None),
        ],
        schema="doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in c4_clean(docs).collect()}
    assert rows[1]["n_lines"] == 6 and rows[1]["n_kept"] == 3
    assert rows[1]["clean_text"].splitlines() == [
        "A proper sentence with exactly enough words.",
        'He said "this quoted line has enough words."',
        "Another complete sentence finishes the page properly!",
    ]
    # the quoted line contributes its inner '.' to the sentence count
    assert rows[1]["n_sentences"] == 3 and rows[1]["c4_keep"] == 1
    assert rows[2]["c4_keep"] == 0  # '{'
    assert rows[3]["c4_keep"] == 0  # lorem ipsum (case-insensitive)
    assert rows[4]["n_kept"] == 1 and rows[4]["c4_keep"] == 0  # <3 sentences
    assert rows[5]["n_kept"] == 0 and rows[5]["clean_text"] == ""


def test_c4_clean_python_twin(spark):
    import re as _re

    from link_profiler_repo_spark.operators.textops import c4_clean

    rng = random.Random(29)
    line_pool = [
        "a full sentence with plenty of words today.",
        "short one.",
        "unterminated line with several words in it",
        "javascript required for this widget to render.",
        "every rule gets exercised by this long line!",
        "brace { here",
        "lorem ipsum filler sentence appears right here.",
        'quoted "ending line with enough words here."',
        "",
        "   padded line with enough words to pass.   ",
    ]
    docs = [
        (i, "\n".join(rng.choice(line_pool) for _ in range(rng.randint(1, 9))))
        for i in range(60)
    ]
    rows = {
        r["doc_id"]: r
        for r in c4_clean(
            spark.createDataFrame(docs, schema="doc_id long, text string")
        ).collect()
    }
    for i, text in docs:
        lines = [ln.strip() for ln in text.split("\n")]
        kept = [
            ln
            for ln in lines
            if _re.search(r'[.!?"]$', ln)
            and len(ln.split()) >= 5
            and "javascript" not in ln.lower()
        ]
        clean = "\n".join(kept)
        n_sent = len(_re.findall(r"[.!?]", clean))
        keep = int(
            "lorem ipsum" not in text.lower() and "{" not in text and n_sent >= 3
        )
        r = rows[i]
        assert (r["n_lines"], r["n_kept"], r["n_sentences"]) == (
            len(lines),
            len(kept),
            n_sent,
        ), (i, text)
        assert r["clean_text"] == clean and r["c4_keep"] == keep, (i, text)


def test_build_corpus_sem_keep_stage(spark):
    """sem_keep composes as a doc-admission filter: docs whose SemDeDup
    verdict is keep=False never reach the corpus, keep=True and unlisted
    docs are unaffected, and the result equals build_corpus over the
    pre-filtered doc set (the stage is exactly one semi-join)."""
    import pyspark.sql.functions as F

    from link_profiler_repo_spark.operators.corpus import build_corpus

    filler = (
        "the quick brown fox jumps over the lazy dog and runs to the barn "
        "for it is warm in there today again"
    )
    docs = spark.createDataFrame(
        [(i, "en", f"{filler} document number {i} speaks") for i in range(1, 7)],
        schema="doc_id long, lang string, text string",
    )
    verdict = spark.createDataFrame(
        [(1, True), (2, False), (3, True), (4, False)],  # 5,6 unlisted
        schema="doc_id long, keep boolean",
    )
    kw = dict(targets={"en": 1.0}, total_rows=100.0, budget=10_000)
    out = sorted(r["doc_id"] for r in build_corpus(docs, sem_keep=verdict, **kw).collect())
    assert out == [1, 3]  # 2/4 sem-dropped; 5/6 unlisted -> also absent:
    # the verdict table enumerates the embedded corpus; absence = no verdict
    # row = not admitted (left-semi), matching semdedup's full-coverage output
    twin = build_corpus(
        docs.join(verdict.filter(F.col("keep")).select("doc_id"), "doc_id", "left_semi"),
        **kw,
    )
    assert sorted(r["doc_id"] for r in twin.collect()) == out
