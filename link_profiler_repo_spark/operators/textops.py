"""Text-analysis operators over a documents table — the reference's content
quality/NLP surface (utils/content_validator.py:39-230; A10 in SURVEY §2.4),
generalized into training-data-pipeline primitives.

Everything here is pure Catalyst (regexp/split/aggregate expressions inside
whole-stage codegen) — no Python in the hot path — and every operator is
deliberately SQL-expressible so the DuckDB oracle can verify it exactly.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# small stopword list shared with the oracle SQL (language-ID heuristic)
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for")


def _words(text: Column) -> Column:
    w = F.split(F.lower(F.regexp_replace(text, r"[^a-zA-Z0-9']+", " ")), r"\s+")
    return F.filter(w, lambda x: F.length(x) > 0)


def token_count(text: Column) -> Column:
    """Whitespace token count (content_validator word_count analog)."""
    return F.size(_words(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token estimate: alnum runs + punctuation marks counted
    separately (a deterministic, regex-only stand-in for BPE length)."""
    alnum_runs = F.size(F.filter(F.split(text, r"[^a-zA-Z0-9]+"), lambda x: F.length(x) > 0))
    puncts = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return alnum_runs + puncts


def punct_ratio(text: Column) -> Column:
    p = F.length(F.regexp_replace(text, r"[a-zA-Z0-9\s]", ""))
    return p.cast("double") / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column) -> Column:
    w = _words(text)
    sw = F.size(F.filter(w, lambda x: x.isin(*EN_STOPWORDS)))
    return sw.cast("double") / F.greatest(F.size(w), F.lit(1))


def quality_score(text: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: length band + moderate punct
    + stopword presence (content_validator.py:103-230 spirit: word-count and
    readability bands)."""
    n = token_count(text)
    length_ok = F.when((n >= 20) & (n <= 2000), 0.4).when(n >= 5, 0.2).otherwise(0.0)
    punct_ok = F.when(punct_ratio(text) <= 0.2, 0.3).otherwise(0.1)
    sw_ok = F.when(stopword_ratio(text) >= 0.05, 0.3).otherwise(0.1)
    return (length_ok + punct_ok + sw_ok).cast("double")


def lang_id(text: Column) -> Column:
    """Tiny n-gram-free language ID: English if stopword ratio clears a bar,
    else 'unk'. (A real pipeline swaps in fasttext via mapInPandas; the
    Spark-side shape — one scan, one derived column — is identical.)"""
    return F.when(stopword_ratio(text) >= 0.03, F.lit("en")).otherwise(F.lit("unk"))


def flesch_reading_ease(text: Column) -> Column:
    """Exact Flesch reading-ease formula (content_validator.py:103-150):
    206.835 - 1.015*(words/sentences) - 84.6*(syllables/words), clamped to
    [0,100]; 0 when no sentences or words. Syllables per word = vowel-group
    count ([aeiouy]+ runs) on the letters-only word, minus one for a trailing
    silent 'e' when >1 group, minimum 1; empty-after-cleaning words
    contribute 0 (the reference's `continue`). Pure Catalyst: one
    split + transform + aggregate, no UDF."""
    raw_words = F.filter(F.split(F.lower(text), r"\s+"), lambda x: F.length(x) > 0)
    n_words = F.size(raw_words)
    n_sentences = F.regexp_count(text, F.lit(r"[.!?]+"))
    cleaned = F.transform(raw_words, lambda w: F.regexp_replace(w, "[^a-z]", ""))
    syl_of = lambda w: F.when(F.length(w) == 0, F.lit(0)).otherwise(  # noqa: E731
        F.greatest(
            F.lit(1),
            F.regexp_count(w, F.lit("[aeiouy]+"))
            - F.when(w.rlike("e$") & (F.regexp_count(w, F.lit("[aeiouy]+")) > 1), 1).otherwise(0),
        )
    )
    n_syllables = F.aggregate(cleaned, F.lit(0), lambda acc, w: acc + syl_of(w))
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sentences.cast("double"))
        - F.lit(84.6) * (n_syllables.cast("double") / n_words.cast("double"))
    )
    return F.when((n_sentences == 0) | (n_words == 0), F.lit(0.0)).otherwise(
        F.greatest(F.lit(0.0), F.least(F.lit(100.0), score))
    )


def doc_fingerprint(text: Column) -> Column:
    """Stable document fingerprint: md5 of the normalized word sequence
    (whitespace/case-insensitive content identity)."""
    return F.md5(F.concat_ws(" ", _words(text)))


def word_ngrams(words: Column, n: int) -> Column:
    """Word n-grams of a words ARRAY COLUMN, built as chained zip_with over n
    shifted slices — the linear form. Do NOT build grams with
    transform(sequence, slice/element_at) over an inline words expression or
    explode them from a separate projection: both shapes re-evaluate the
    expensive subtree per element/output row (measured 15-27s vs <1s on 5k
    docs at sf0.1 — see repetition_profile's bigram note). Callers guard
    size(words) < n."""
    m = F.size(words) - (n - 1)
    g = F.slice(words, 1, m)
    for k in range(2, n + 1):
        g = F.zip_with(
            g, F.slice(words, k, m), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return g


def word_ngrams_or_empty(words: Column, n: int) -> Column:
    """word_ngrams with the short-array guard built in: arrays with fewer
    than n words yield an empty gram array (slice with a non-positive length
    would otherwise error). Use this unless the caller wants different
    short-doc semantics (dedup's Jaccard keeps a whole-doc partial gram)."""
    return F.when(F.size(words) >= n, word_ngrams(words, n)).otherwise(
        F.array().cast("array<string>")
    )


def text_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One scan, all derived metrics as plain columns.

    The shared subtrees — the tokenized words array, the punct-stripped
    length, then the token/stopword counts — are staged through NAMED
    columns across projections instead of inlined per metric: the scalar
    helpers above re-derive _words per call, and higher-order expressions
    (filter/transform lambdas) sit outside whole-stage-codegen subexpression
    elimination, so the inline form re-tokenizes every row once per metric
    (7x here). Each staged column is built once per row; every metric
    expression below is value-identical to its scalar helper."""
    t = F.col(text_col)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        t.alias("_t"),
        _words(t).alias("_w"),
        F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", "")).alias("_p"),
    )
    w = F.col("_w")
    m = base.select(
        "doc_id",
        "_t",
        "_w",
        "_p",
        F.size(w).alias("_n"),
        F.size(F.filter(w, lambda x: x.isin(*EN_STOPWORDS))).alias("_sw"),
    )
    tt = F.col("_t")
    n = F.col("_n")
    swr = F.col("_sw").cast("double") / F.greatest(n, F.lit(1))
    pr = F.col("_p").cast("double") / F.greatest(F.length(tt), F.lit(1))
    alnum_runs = F.size(
        F.filter(F.split(tt, r"[^a-zA-Z0-9]+"), lambda x: F.length(x) > 0)
    )
    length_ok = F.when((n >= 20) & (n <= 2000), 0.4).when(n >= 5, 0.2).otherwise(0.0)
    punct_ok = F.when(pr <= 0.2, 0.3).otherwise(0.1)
    sw_ok = F.when(swr >= 0.05, 0.3).otherwise(0.1)
    return m.select(
        "doc_id",
        n.alias("n_tokens"),
        (alnum_runs + F.col("_p")).alias("n_subtokens"),
        F.round(pr, 6).alias("punct_ratio"),
        F.round(swr, 6).alias("stopword_ratio"),
        F.round((length_ok + punct_ok + sw_ok).cast("double"), 6).alias("quality"),
        F.round(flesch_reading_ease(tt), 4).alias("flesch"),
        F.when(swr >= 0.03, F.lit("en")).otherwise(F.lit("unk")).alias("lang_pred"),
        F.md5(F.concat_ws(" ", F.col("_w"))).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# Repetition-based quality filters (Gopher rules — Rae et al. 2021,
# "Scaling Language Models: ...", Table A1: duplicate-line fraction and
# top-n-gram fraction are the published corpus filters for boilerplate and
# degenerate repetition). No reference counterpart — added LLM-pipeline
# family alongside quality_score above.
# ---------------------------------------------------------------------------

def _lines(text: Column) -> Column:
    ls = F.transform(F.split(text, r"\n"), lambda x: F.trim(x))
    return F.filter(ls, lambda x: F.length(x) > 0)


def dup_line_fraction(text: Column) -> Column:
    """Fraction of non-empty lines that are duplicates of an earlier line:
    1 - distinct/total (0.0 for line-less docs). Gopher drops docs > 0.30."""
    ls = _lines(text)
    return F.when(F.size(ls) == 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(ls)).cast("double") / F.size(ls)
    )


def repetition_profile(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_line: float = 0.30,
    max_top_bigram: float = 0.20,
) -> DataFrame:
    """Per-doc repetition metrics + the Gopher-style keep flag:
    (id, dup_line_frac, top_bigram_frac, repetition_ok).

    top_bigram_frac (share of all word bigrams taken by the most frequent
    one) is computed the scale way — explode bigrams, count per (doc, gram),
    max/sum per doc: two keyed shuffles that partition by document, never an
    O(words²) per-row array scan. Docs with <2 words have no bigrams and
    read 0.0. Fractions are exact double divisions of integer counts, so the
    DuckDB oracle reproduces them bit-for-bit."""
    t = F.col(text_col)
    base = df.select(
        F.col(id_col),
        dup_line_fraction(t).alias("dup_line_frac"),
        _words(t).alias("_w"),
    )
    # bigrams via word_ngrams (zip_with form) — NOT transform(sequence,
    # element_at): measured 52s vs 2.8s on 5k docs at sf0.1 (see word_ngrams)
    grams = base.select(
        id_col,
        word_ngrams_or_empty(F.col("_w"), 2).alias("_grams"),
    )
    counts = (
        grams.select(id_col, F.explode("_grams").alias("gram"))
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("n"))
    )
    frac = counts.groupBy(id_col).agg(
        (F.max("n").cast("double") / F.sum("n")).alias("top_bigram_frac")
    )
    return (
        base.drop("_w")
        .join(frac, id_col, "left")
        .withColumn("top_bigram_frac", F.coalesce("top_bigram_frac", F.lit(0.0)))
        .withColumn(
            "repetition_ok",
            (F.col("dup_line_frac") <= max_dup_line)
            & (F.col("top_bigram_frac") <= max_top_bigram),
        )
    )


# ---------------------------------------------------------------------------
# PII detection / redaction (training-data pipeline step; no reference
# counterpart — the reference stores raw crawled text verbatim,
# database/models.py CrawledPage). Pure Catalyst regexp so the scan stays in
# whole-stage codegen and the DuckDB oracle can re-derive it exactly.
#
# The pattern set is deliberately restricted to the regex subset where Java
# (Spark) and RE2 (DuckDB) agree: character classes, bounded repetition,
# \b word boundaries — no lookaround, no backreferences, and no
# match-length ambiguity (leftmost-first vs leftmost-longest resolve
# identically for every pattern below). A production run extends the set;
# the plan shape (one scan, per-pattern count + chained replace) is fixed.
PII_PATTERNS = (
    ("email", r"[0-9A-Za-z._%+-]+@[0-9A-Za-z.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "<PHONE>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IPV4>"),
)


def pii_redact(text: Column) -> Column:
    """The redaction column alone: patterns applied in PII_PATTERNS order,
    each over the previous output; NULL text behaves as empty."""
    red = F.coalesce(text, F.lit(""))
    for _name, pat, repl in PII_PATTERNS:
        red = F.regexp_replace(red, pat, repl)
    return red


def pii_profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document PII scan + redaction in one pass.

    Counts are per-pattern over the RAW text (independent, so adding a
    pattern never changes existing counts); redaction applies the patterns
    in PII_PATTERNS order, each over the previous output (phone before ssn
    matters: 555-123-4567 must become <PHONE>, and the hyphenated patterns
    are constructed so neither matches inside the other — see tests).
    NULL text behaves as empty. One projection, zero shuffles, zero UDFs.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    cols = [F.col(id_col).alias("doc_id")]
    counts = []
    red = t
    for name, pat, repl in PII_PATTERNS:
        c = F.regexp_count(t, F.lit(pat))
        counts.append(c)
        cols.append(c.alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, repl)
    total = counts[0]
    for c in counts[1:]:
        total = total + c
    cols.append(total.alias("n_pii"))
    cols.append((total > 0).cast("int").alias("has_pii"))
    cols.append(red.alias("redacted"))
    return df.select(*cols)


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination: flag training documents that share any
    word n-gram with any benchmark/eval document (the published procedure —
    Brown et al. 2020 Appendix C use 13-grams; Lee et al. 2022 §6).

    Scale shape: the benchmark side is SMALL by nature (eval suites are
    ~1e5-1e7 grams), so its distinct gram set is broadcast — the 100 TB
    training corpus is never shuffled; its grams explode narrowly per
    partition, the broadcast hash semi-join filters them in place, and the
    only shuffle is the per-doc overlap count over the (tiny) surviving
    hits. Tokenization and gram construction reuse _words/word_ngrams so
    contamination is judged on the same normalized content identity as the
    rest of the text family.

    Returns one row per training doc: n_overlap = number of DISTINCT doc
    n-grams that occur anywhere in the benchmark, contaminated = n_overlap
    > 0. Docs shorter than n words have no grams and are never flagged.
    """
    hits = (
        _bench_gram_hits(docs, bench, n, text_col, id_col)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) > 0).cast("int").alias("contaminated"),
        )
    )


def _bench_gram_hits(
    docs: DataFrame, bench: DataFrame, n: int, text_col: str, id_col: str
) -> DataFrame:
    """(doc_id, gram) rows for every DISTINCT doc n-gram that occurs in the
    benchmark — the shared core of decontaminate (counts) and
    decontaminate_filter (anti-join). Bench gram set broadcast; the corpus
    side only explodes (narrow) and probes the hash in place.

    Words and grams are staged through named columns (words -> grams ->
    explode of the column REFERENCE) exactly like repetition_profile —
    exploding the inline expression re-evaluates the whole tokenize+zip_with
    tree per OUTPUT gram (measured 56s -> 3.4s for the decontaminate gate
    query on 5k docs at sf0.1)."""
    bench_grams = (
        bench.select(_words(F.col(text_col)).alias("_w"))
        .select(word_ngrams_or_empty(F.col("_w"), n).alias("_grams"))
        .select(F.explode("_grams").alias("gram"))
        .distinct()
    )
    doc_grams = (
        docs.select(F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("_w"))
        .select(
            "doc_id", F.array_distinct(word_ngrams_or_empty(F.col("_w"), n)).alias("_grams")
        )
        .select("doc_id", F.explode("_grams").alias("gram"))
    )
    return doc_grams.join(F.broadcast(bench_grams), "gram")


def decontaminate_filter(
    docs: DataFrame,
    bench: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop contaminated docs (the pipeline form of decontaminate): left-anti
    join of the corpus against the distinct hit-id set. Same broadcast shape;
    returns docs with its original columns."""
    hit_ids = (
        _bench_gram_hits(docs, bench, n, text_col, id_col)
        .select(F.col("doc_id").alias("_hit_id"))
        .distinct()
    )
    return docs.join(hit_ids, docs[id_col] == hit_ids["_hit_id"], "left_anti")


# ---------------------------------------------------------------------------
# C4 cleaning rules (Raffel et al. 2020 §2.2, "Exploring the Limits of
# Transfer Learning..."): the published line-level corpus cleaner that
# complements the doc-level Gopher repetition rules above. Implemented
# subset (the deterministic, language-independent rules): keep only lines
# ending in a terminal punctuation mark; drop lines with fewer than 5
# words; drop lines containing the word "javascript"; drop whole pages
# containing "{" (code) or "lorem ipsum" (boilerplate); retain only pages
# with at least 3 sentences after line cleaning. (C4's bad-word list and
# langdetect gate are corpus-policy choices, not engine semantics — the
# lang gate already exists as textops.lang_id.)
# ---------------------------------------------------------------------------


def c4_clean(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Per-doc C4 line cleaning in one projection (array ops inside
    whole-stage codegen, zero shuffles, zero UDFs): returns (doc_id,
    n_lines, n_kept, n_sentences, c4_keep, clean_text) where clean_text is
    the retained trimmed lines re-joined by newlines and c4_keep applies
    the page-level rules to the cleaned page."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.transform(F.split(t, r"\n"), lambda x: F.trim(x))
    line_words = lambda l: F.size(  # noqa: E731
        F.filter(F.split(l, r"\s+"), lambda x: F.length(x) > 0)
    )
    kept = F.filter(
        lines,
        lambda l: l.rlike(r'[.!?"]$')
        & (line_words(l) >= min_words_per_line)
        & ~F.contains(F.lower(l), F.lit("javascript")),
    )
    clean = F.array_join(kept, "\n")
    n_sentences = F.regexp_count(clean, F.lit(r"[.!?]"))
    keep = (
        ~F.contains(F.lower(t), F.lit("lorem ipsum"))
        & ~F.contains(t, F.lit("{"))
        & (n_sentences >= min_sentences)
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        n_sentences.alias("n_sentences"),
        keep.cast("int").alias("c4_keep"),
        clean.alias("clean_text"),
    )


def paragraph_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Cross-corpus paragraph deduplication — the CCNet boilerplate-removal
    stage (Wenzek et al. LREC 2020 §3.1: documents are split into
    paragraphs, each normalized and hashed, and duplicated paragraphs are
    removed corpus-wide — killing cookie banners / nav bars that per-DOC
    dedup can never see). Deterministic keep rule: the globally FIRST
    occurrence (min (doc_id, pos)) of each normalized paragraph survives;
    every other copy — including later copies inside the same document —
    drops. Paragraphs that normalize to '' (blank / punctuation-only lines)
    are structure, not content: always kept, never joined.

    Normalization = CCNet's: lowercase, strip everything but letters (their
    sha1 is over exactly this; we key on the normalized string itself, so
    the oracle needs no hash at all).

    Output: (doc_id, n_paras, n_dropped, clean_text) — one row per input
    document, clean_text = surviving paragraphs rejoined in original order
    ('' when everything dropped).

    Scale shape at 100 TB: the paragraph table shuffles twice on the
    normalized key (one groupBy min+count, one join back) and once on
    doc_id (the rebuild) — never a global sort, never a window over the
    corpus; winners are a keyed aggregate so the hot key (the empty-ish
    boilerplate paragraph that appears on every page) is one combiner-
    reduced row, not a skewed join (the join fans that row back OUT, which
    AQE handles as the classic skew-broadcast case)."""
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "pos", "para"
        ),
    )
    keyed = paras.withColumn(
        "k", F.regexp_replace(F.lower(F.col("para")), r"[^a-z]+", "")
    )
    # the paragraph table feeds four consumers (winner agg, join back, the
    # blank-paragraph union branch, totals): materialize the split+normalize
    # once — the CCNet paragraph table is the materialization boundary of
    # the published pipeline anyway (plan audit r06: 8 scans before, 2 after)
    keyed = keyed.localCheckpoint(eager=False)
    content = keyed.filter(F.col("k") != "")
    winners = content.groupBy("k").agg(
        F.min(F.struct(id_col, "pos")).alias("w")
    )
    tagged = content.join(winners, "k").withColumn(
        "_keep",
        (F.col(f"w.{id_col}") == F.col(id_col)) & (F.col("w.pos") == F.col("pos")),
    )
    kept = tagged.filter(F.col("_keep")).select(id_col, "pos", "para").unionByName(
        keyed.filter(F.col("k") == "").select(id_col, "pos", "para")
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.count("*").cast("long").alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "para"))),
                lambda s: s["para"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    # derived from the checkpointed keyed table (same rows as paras plus the
    # key column) so the split+posexplode never re-runs
    totals = keyed.groupBy(id_col).agg(F.count("*").cast("long").alias("n_paras"))
    return totals.join(rebuilt, id_col, "left").select(
        id_col,
        "n_paras",
        (F.col("n_paras") - F.coalesce("_n_kept", F.lit(0))).cast("long").alias(
            "n_dropped"
        ),
        F.coalesce("clean_text", F.lit("")).alias("clean_text"),
    )
