"""Similarity search over an embedding column (array<float>).

* ``brute_force_topk`` — exact cosine top-k of every query vector against
  the corpus: JVM-side higher-order functions (zip_with + aggregate) for the
  dot product, window row_number for the top-k. The correctness baseline.
* ``lsh_topk`` — the scale path: sign-random-projection (SimHash-for-
  vectors) buckets computed in a vectorized Arrow UDF; candidates are only
  corpus vectors sharing a bucket with the query (multi-probe via several
  independent hash tables), exact cosine re-rank inside buckets. At 10^12
  rows the bucket join replaces the cross join; recall tunes with
  n_tables/n_bits.

Hyperplanes are deterministic (seeded via a fixed linear-congruential
sequence), so results are stable across runs and engines.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["cosine_col", "brute_force_topk", "lsh_topk"]


def cosine_col(a, b):
    """Cosine similarity of two array<float> columns via JVM higher-order
    functions (no Python)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame, queries: DataFrame, k: int = 5
) -> DataFrame:
    """queries(query_id, embedding) x embeddings(vec_id, embedding) ->
    (query_id, vec_id, cosine, rank<=k). The query side is broadcast (small
    dim table); ties break on vec_id for determinism."""
    q = queries.select(
        F.col("query_id"), F.col("embedding").alias("q_emb")
    )
    joined = embeddings.crossJoin(F.broadcast(q)).select(
        "query_id",
        "vec_id",
        cosine_col(F.col("q_emb"), F.col("embedding")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(dim: int, n_bits: int, table: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes: LCG-seeded, no RNG state."""
    n = dim * n_bits
    seed = 0x9E3779B97F4A7C15 ^ (table * 0xBF58476D1CE4E5B9)
    vals = np.empty(n, dtype=np.float64)
    x = seed & 0xFFFFFFFFFFFFFFFF
    for i in range(n):
        x = (6364136223846793005 * x + 1442695040888963407) & 0xFFFFFFFFFFFFFFFF
        vals[i] = ((x >> 11) / float(1 << 53)) * 2.0 - 1.0
    return vals.reshape(n_bits, dim)


def _bucket_udf(dim: int, n_bits: int, table: int):
    planes = _hyperplanes(dim, n_bits, table)

    @F.pandas_udf(T.IntegerType())
    def bucket(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy())  # (batch, dim)
        bits = (mat @ planes.T) > 0  # (batch, n_bits)
        keys = np.zeros(len(embs), dtype=np.int64)
        for b in range(n_bits):
            keys |= bits[:, b].astype(np.int64) << b
        return pd.Series(keys.astype(np.int32))

    return bucket


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    dim: int,
    n_bits: int = 8,
    n_tables: int = 4,
) -> DataFrame:
    """Approximate top-k: sign-random-projection buckets x n_tables, exact
    cosine re-rank within candidate union."""
    corpus = embeddings
    cand = None
    for t in range(n_tables):
        bu = _bucket_udf(dim, n_bits, t)
        c = corpus.select("vec_id", "embedding", bu("embedding").alias("bkt"))
        q = queries.select(
            "query_id",
            F.col("embedding").alias("q_emb"),
            bu("embedding").alias("bkt"),
        )
        hits = c.join(F.broadcast(q), "bkt").select(
            "query_id", "vec_id", "q_emb", "embedding"
        )
        cand = hits if cand is None else cand.unionByName(hits)
    cand = cand.dropDuplicates(["query_id", "vec_id"])
    scored = cand.select(
        "query_id",
        "vec_id",
        cosine_col(F.col("q_emb"), F.col("embedding")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
