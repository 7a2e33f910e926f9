"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k for a set of query vectors — the
  correctness baseline. Queries broadcast; similarity is computed with
  Catalyst array expressions (zip_with/aggregate — whole-stage codegen, no
  Python); top-k per query via keyed sort_array(collect_list) (no global
  window).
- ivf_topk: the scale path — k-means-lite (fixed random centroids, one
  assignment pass) partitions vectors into nlist cells; queries probe only
  nprobe cells. At 100 TB the cell assignment is the only full scan and the
  probe join touches ~nprobe/nlist of the data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame


def _cos(col_a, col_b):
    dot = F.aggregate(
        F.zip_with(col_a, col_b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    na = F.sqrt(F.aggregate(col_a, F.lit(0.0), lambda a, x: a + x * x))
    nb = F.sqrt(F.aggregate(col_b, F.lit(0.0), lambda a, x: a + x * x))
    return dot / (na * nb)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    round_to: int | None = None,
) -> DataFrame:
    """Exact cosine top-k per query. queries is small -> broadcast cross join;
    top-k via two-stage agg. Output: (q_id, vec_id, cosine, rank).

    round_to=N makes the k-boundary cross-engine stable: candidates are ranked
    by (round(cosine, N) DESC, vec_id ASC) so two cosines that differ only past
    N decimals cannot yield different top-k membership in engines that
    accumulate the dot product in a different order."""
    q = F.broadcast(queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q_vec")))
    scored = vectors.crossJoin(q).select(
        "q_id",
        F.col(id_col).alias("vec_id"),
        _cos(F.col(vec_col), F.col("q_vec")).alias("cosine"),
    )
    if round_to is not None:
        # sort desc on (rounded cosine, -vec_id) == (rounded DESC, vec_id ASC)
        key = F.struct(
            F.round("cosine", round_to).alias("cosine"),
            (-F.col("vec_id")).alias("negid"),
        )
        packed = scored.groupBy("q_id").agg(
            F.slice(F.sort_array(F.collect_list(key), asc=False), 1, k).alias("top")
        )
        return packed.select("q_id", F.posexplode("top").alias("r", "t")).select(
            "q_id",
            (-F.col("t.negid")).alias("vec_id"),
            F.col("t.cosine").alias("cosine"),
            (F.col("r") + 1).alias("rank"),
        )
    packed = scored.groupBy("q_id").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct(F.col("cosine"), F.col("vec_id"))), asc=False
            ),
            1, k,
        ).alias("top")
    )
    return packed.select(
        "q_id", F.posexplode("top").alias("r", "t")
    ).select(
        "q_id",
        F.col("t.vec_id").alias("vec_id"),
        F.col("t.cosine").alias("cosine"),
        (F.col("r") + 1).alias("rank"),
    )


def make_centroids(dim: int, nlist: int, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((nlist, dim)).astype(np.float32)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """IVF-style ANN: assign every vector to its nearest centroid (one
    vectorized numpy pass over Arrow batches), probe the nprobe nearest cells
    per query. Recall < 1 by design; brute_force_topk is the oracle."""
    centroids = make_centroids(dim, nlist)

    @F.pandas_udf(T.IntegerType())
    def cell_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float32)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(m @ centroids.T, axis=1).astype(np.int32), index=vecs.index)

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def probe_udf(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float32)
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(m @ centroids.T), axis=1)[:, :nprobe].astype(np.int32)
        return pd.Series(list(order), index=vecs.index, dtype=object)

    assigned = vectors.withColumn("cell", cell_udf(F.col(vec_col)))
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        F.col(q_vec_col).alias("q_vec"),
        F.explode(probe_udf(F.col(q_vec_col))).alias("cell"),
    )
    scored = assigned.join(F.broadcast(q), "cell").select(
        "q_id",
        F.col(id_col).alias("vec_id"),
        _cos(F.col(vec_col), F.col("q_vec")).alias("cosine"),
    )
    packed = scored.groupBy("q_id").agg(
        F.slice(
            F.sort_array(F.collect_list(F.struct("cosine", "vec_id")), asc=False), 1, k
        ).alias("top")
    )
    return packed.select("q_id", F.posexplode("top").alias("r", "t")).select(
        "q_id", F.col("t.vec_id").alias("vec_id"),
        F.col("t.cosine").alias("cosine"), (F.col("r") + 1).alias("rank"),
    )
