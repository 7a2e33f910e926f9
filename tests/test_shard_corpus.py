"""Equal-token output sharding: python-twin exactness, balance bound,
partitioning invariance, degenerate totals."""

import hashlib

from link_profiler_repo_spark.operators.sampling import shard_corpus


def _twin(docs, n_shards, salt=""):
    key = lambda i: hashlib.md5(f"{salt}|{i}".encode()).hexdigest()[:8]  # noqa: E731
    ordered = sorted(docs, key=lambda d: (key(d[0]), d[0]))
    total = sum(t for _, t in docs)
    size = max(1, -(-total // n_shards))
    out, cum = {}, 0
    for i, t in ordered:
        out[i] = (cum + t, (cum) // size)
        cum += t
    return out


def _docs(n):
    return [(i, (i * 37) % 90 + 1) for i in range(n)]


def test_matches_python_twin(spark):
    docs = _docs(200)
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: (r["cum_tokens"], r["shard"])
        for r in shard_corpus(df, "doc_id", "n_tokens", 8, salt="s").collect()
    }
    assert got == _twin(docs, 8, "s")


def test_shards_balanced_and_dense(spark):
    docs = _docs(300)
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    rows = shard_corpus(df, "doc_id", "n_tokens", 6).collect()
    per = {}
    for r in rows:
        per[r["shard"]] = per.get(r["shard"], 0) + r["n_tokens"]
    assert sorted(per) == list(range(6))  # every shard used, ids dense
    max_doc = max(t for _, t in docs)
    assert max(per.values()) - min(per.values()) <= 2 * max_doc


def test_partitioning_invariance(spark):
    docs = _docs(150)
    df = spark.createDataFrame(docs, "doc_id long, n_tokens long")
    a = {r["doc_id"]: r["shard"]
         for r in shard_corpus(df, "doc_id", "n_tokens", 5).collect()}
    b = {r["doc_id"]: r["shard"]
         for r in shard_corpus(df.repartition(13), "doc_id", "n_tokens", 5).collect()}
    assert a == b


def test_zero_token_corpus(spark):
    df = spark.createDataFrame([(i, 0) for i in range(10)], "doc_id long, n_tokens long")
    rows = shard_corpus(df, "doc_id", "n_tokens", 4).collect()
    assert {r["shard"] for r in rows} == {0}
