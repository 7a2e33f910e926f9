"""Dedup + similarity operators: golden expectations on constructed fixtures,
plus recall of the LSH/IVF approximations against their exact baselines."""

import pyspark.sql.functions as F

from link_profiler_repo_spark.operators.dedup import (
    embedding_near_dup,
    exact_dedup,
    minhash_lsh_dup,
    ngram_jaccard_pairs,
    simhash_dup,
)
from link_profiler_repo_spark.operators.similarity import brute_force_topk, ivf_topk

BASE_TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps near "
    "the warm fire and the birds sing in the morning light of early spring"
)


def _docs(spark):
    rows = [
        (1, BASE_TEXT),
        (2, BASE_TEXT),  # exact dup of 1
        (3, BASE_TEXT.replace("morning", "evening")),  # near dup
        (4, "completely different content about spark dataframes and shuffles"),
        (5, "another unrelated text mentioning bloom filters and politeness"),
    ]
    return spark.createDataFrame(rows, schema="doc_id long, text string")


def test_exact_dedup(spark):
    groups = {r["keeper"]: r["n_docs"] for r in exact_dedup(_docs(spark)).collect()}
    assert groups[1] == 2  # docs 1,2 identical
    assert sum(groups.values()) == 5


def test_minhash_lsh_finds_near_dup(spark):
    pairs = {(r["a"], r["b"]): r["est_jaccard"] for r in minhash_lsh_dup(_docs(spark), threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0  # identical docs
    assert (1, 3) in pairs and pairs[(1, 3)] >= 0.5  # one-word edit
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_simhash_groups_exact_dups(spark):
    groups = {r["keeper"]: r["n_docs"] for r in simhash_dup(_docs(spark)).collect()}
    assert groups.get(1, 0) >= 2


def test_ngram_jaccard_exact_values(spark):
    pairs = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard_pairs(_docs(spark), threshold=0.4).collect()}
    assert pairs[(1, 2)] == 1.0
    assert 0.4 <= pairs[(1, 3)] < 1.0
    assert (1, 4) not in pairs


def test_embedding_near_dup_and_ann_recall(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 64)).astype("float32")
    vecs = [(i, base[i].tolist()) for i in range(40)]
    # vector 40 = near-copy of vector 0
    vecs.append((40, (base[0] + rng.standard_normal(64).astype("float32") * 0.01).tolist()))
    df = spark.createDataFrame(vecs, schema="vec_id long, embedding array<float>")

    dups = {(r["a"], r["b"]) for r in embedding_near_dup(df, threshold=0.98).collect()}
    assert (0, 40) in dups

    qs = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = [r["vec_id"] for r in brute_force_topk(df, qs, k=5).orderBy("rank").collect()]
    assert exact[0] == 0 and exact[1] == 40  # self, then the near-copy

    approx = [r["vec_id"] for r in ivf_topk(df, qs, k=5, nlist=4, nprobe=2).orderBy("rank").collect()]
    # IVF with nprobe=2/4 cells must still find the top hit
    assert approx[0] == 0
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.6


def test_ivf_trained_recall_sf01(spark):
    """VERDICT r01 #10 acceptance: trained-centroid IVF (sampled spherical
    k-means, nlist ~ sqrt(N), multi-assignment) reaches recall@10 >= 0.9 vs
    brute force on the sf0.1 embeddings table — which is near-uniform
    gaussian, the WORST case for IVF."""
    sf_dir = "/root/testdata/sf0.1"
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qs = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    base = e.filter(F.col("vec_id") >= 20).persist()
    exact: dict[int, set] = {}
    for r in brute_force_topk(base, qs, k=10).collect():
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])
    approx: dict[int, set] = {}
    for r in ivf_topk(base, qs, k=10).collect():
        approx.setdefault(r["q_id"], set()).add(r["vec_id"])
    recall = sum(
        len(exact[q] & approx.get(q, set())) / len(exact[q]) for q in exact
    ) / len(exact)
    base.unpersist()
    assert recall >= 0.9, f"recall@10 = {recall:.3f}"


def test_ivf_clustered_small_nprobe(spark):
    """The 100 TB scale path for IVF: on a CLUSTERED corpus (real embedding
    distributions), a small nprobe — here 8 of 32 cells, 25% — already
    reaches recall@10 >= 0.9 against brute force, because trained centroids
    align with the clusters and neighbors co-locate. (The gate's uniform
    fixture needs the defensive ~36% default; this asserts the favorable
    regime actually works so the small-nprobe claim isn't hand-waving.)"""
    import numpy as np

    from link_profiler_repo_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(11)
    centers = rng.standard_normal((16, 64)).astype("float32") * 4
    rows = []
    for i in range(1200):
        c = centers[i % 16]
        rows.append((i, (c + rng.standard_normal(64).astype("float32") * 0.3).tolist()))
    df = spark.createDataFrame(rows, schema="vec_id long, embedding array<float>")
    qs = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {
        (r["q_id"], r["vec_id"])
        for r in brute_force_topk(df, qs, k=10).collect()
    }
    approx = {
        (r["q_id"], r["vec_id"])
        for r in ivf_topk(df, qs, k=10, nlist=32, nprobe=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"clustered-corpus recall@10 {recall} with nprobe=25%"
