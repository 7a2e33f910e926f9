"""In-engine BPE tokenizer — train byte-pair-encoding merges on the corpus
and encode documents with them (Sennrich et al. 2016, ACL "Neural Machine
Translation of Rare Words with Subword Units").

The engine's token counts elsewhere are regex-level (textops.token_count /
bpe_ish_token_count); this module is the real thing: a learned subword
vocabulary, trained distributed and applied in one Arrow-batched pass —
the "train a tokenizer on the corpus" stage of a training-data pipeline.

Training (bpe_train) is the textbook loop re-shaped for Spark:
- the corpus collapses ONCE to a (word, freq) vocabulary table — the only
  pass over raw text; at 100 TB this is one shuffle on the word and the
  vocabulary (not the corpus) is what the merge loop touches;
- each merge round counts adjacent symbol pairs weighted by word freq
  (slice+zip_with adjacency, one partial-agg shuffle on the pair key) and
  takes the argmax to the driver — ONE row per round (cnt DESC, then
  lexicographic (left, right) so ties are deterministic);
- the winning pair is merged into every word's symbol array by an
  Arrow-batched UDF (greedy leftmost, non-overlapping — "aaa" under merge
  (a,a) becomes ["aa","a"]); the state localCheckpoints per round so the
  k-round lineage never stacks.
The k-round driver loop is the algorithm (each merge depends on the last);
everything inside a round is distributed and the driver sees k single-row
argmaxes, never the vocabulary.

Encoding (bpe_encode) broadcasts the k-row merge list and applies it IN
TRAINING ORDER to each word (identical greedy-leftmost application), one
mapInPandas projection over the corpus with a per-batch word cache — no
shuffle; token ids are not materialized, the pipeline-relevant outputs are
the subword sequence lengths and the segmented forms.

Words are textops._words tokens (lower, [a-zA-Z0-9'] runs); a word's
symbol sequence is its characters plus the classic end-of-word marker
"</w>" (merges may absorb it, yielding whole-word tokens).

Both halves are verified against a zero-Spark pure-python twin
(tests + the exported-twin gate rows, the oracle_sim pattern)."""

from __future__ import annotations

import re

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

EOW = "</w>"
_WORD_SPLIT = re.compile(r"[^a-zA-Z0-9']+")


def _py_words(text: str) -> list[str]:
    """Python twin of textops._words (same regex, same lowering)."""
    return [w for w in _WORD_SPLIT.split(text.lower()) if w]


def _apply_merge(syms: list[str], left: str, right: str) -> list[str]:
    """Greedy leftmost non-overlapping merge of (left, right) in one pass —
    the shared application rule of training, encoding, and the twin."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) vocabulary — the single pass over raw text."""
    from .textops import _words

    return (
        docs.select(F.explode(_words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_argmax(state: DataFrame) -> DataFrame:
    """One training round's distributed half: adjacent-pair counts over the
    (freq, syms) vocabulary state, argmax-of-one. Plans as partial_sum →
    one exchange on the pair key → TakeOrderedAndProject(limit=1) — the
    driver receives a single row, never the counted pairs."""
    adj = F.zip_with(
        F.slice("syms", 1, F.size("syms") - 1),
        F.slice("syms", 2, F.size("syms") - 1),
        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
    )
    return (
        state.filter(F.size("syms") >= 2)
        .select("freq", F.explode(adj).alias("p"))
        .groupBy("p.l", "p.r")
        .agg(F.sum("freq").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("l"), F.asc("r"))
        .limit(1)
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 20,
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Learn `num_merges` BPE merges from the corpus (or a precomputed
    (word, freq) `vocab`). Returns the merge table (step, left, right,
    merged, pair_freq) — step is 1-based training order."""
    spark = docs.sparkSession
    v = vocab if vocab is not None else word_counts(docs, text_col)
    chars = F.transform(
        F.sequence(F.lit(0), F.length("word") - 1),
        lambda i: F.col("word").substr(i + 1, F.lit(1)),
    )
    state = v.select(
        "freq", F.concat(chars, F.array(F.lit(EOW))).alias("syms")
    ).localCheckpoint(eager=True)

    def _merge_udf(left: str, right: str):
        @F.pandas_udf(T.ArrayType(T.StringType()))
        def merged(syms: pd.Series) -> pd.Series:
            return syms.map(lambda s: _apply_merge(list(s), left, right))

        return merged

    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, num_merges + 1):
        best = _pair_argmax(state).collect()
        if not best:  # every word fully merged: nothing left to learn
            break
        left, right, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((step, left, right, left + right, cnt))
        state = state.select(
            "freq", _merge_udf(left, right)("syms").alias("syms")
        ).localCheckpoint(eager=True)
    from ..functions.localdf import local_df

    return local_df(
        spark, merges,
        "step int, left string, right string, merged string, pair_freq bigint",
    )


def py_bpe_train(
    texts: list[str], num_merges: int = 20
) -> list[tuple[int, str, str, str, int]]:
    """Pure-python twin of bpe_train (zero Spark; Counter-based) — the
    exported-table gate oracle and the pytest reference."""
    from collections import Counter

    wc = Counter(w for t in texts if t for w in _py_words(t))
    state = {w: [*w, EOW] for w in wc}
    merges = []
    for step in range(1, num_merges + 1):
        pairs: Counter = Counter()
        for w, syms in state.items():
            f = wc[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        # max count, lexicographic pair tie-break — same rule as the engine
        (left, right), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, left, right, left + right, int(cnt)))
        state = {w: _apply_merge(s, left, right) for w, s in state.items()}
    return merges


def _encode_word(word: str, merge_list: list[tuple[str, str]]) -> list[str]:
    syms = [*word, EOW]
    for left, right in merge_list:
        if len(syms) < 2:
            break
        syms = _apply_merge(syms, left, right)
    return syms


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode each doc with the learned merges, applied in training order
    (identical greedy-leftmost rule). Returns (id, n_words, n_bpe_tokens,
    segmented) where segmented is the space-joined subword rendering of the
    first 8 words (a human-auditable sample; counts are the pipeline
    signal). One mapInPandas projection with a per-batch word cache — the
    merge list broadcasts via closure capture (k rows), the corpus never
    shuffles."""
    merge_list = [
        (r["left"], r["right"])
        for r in merges.orderBy("step").select("left", "right").collect()
    ]
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("n_words", T.IntegerType(), False),
            T.StructField("n_bpe_tokens", T.IntegerType(), False),
            T.StructField("segmented", T.StringType(), False),
        ]
    )

    def run(batches):
        cache: dict[str, list[str]] = {}

        def enc(w: str) -> list[str]:
            got = cache.get(w)
            if got is None:
                got = cache[w] = _encode_word(w, merge_list)
            return got

        for pdf in batches:
            rows = {k: [] for k in (id_col, "n_words", "n_bpe_tokens", "segmented")}
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = _py_words(text) if text else []
                toks = [enc(w) for w in words]
                rows[id_col].append(did)
                rows["n_words"].append(len(words))
                rows["n_bpe_tokens"].append(sum(len(t) for t in toks))
                rows["segmented"].append(
                    " ".join("|".join(t) for t in toks[:8])
                )
            yield pd.DataFrame(rows).astype(
                {"n_words": "int32", "n_bpe_tokens": "int32"}
            )

    return docs.select(id_col, text_col).mapInPandas(run, schema=out_schema)


def py_bpe_encode(
    texts: dict[int, str], merge_list: list[tuple[str, str]]
) -> dict[int, tuple[int, int, str]]:
    """Pure-python twin of bpe_encode over {id: text}."""
    out = {}
    for did, text in texts.items():
        words = _py_words(text) if text else []
        toks = [_encode_word(w, merge_list) for w in words]
        out[did] = (
            len(words),
            sum(len(t) for t in toks),
            " ".join("|".join(t) for t in toks[:8]),
        )
    return out
