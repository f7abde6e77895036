"""Similarity search: exact brute-force baseline + LSH scale path."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgpipe.simsearch import (
    brute_force_topk,
    cosine_col,
    embedding_dup_pairs,
    ivf_topk,
    lsh_topk,
)

DIM = 16


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.RandomState(0)
    base = rng.randn(40, DIM).astype("float32")
    base[1] = base[0] + 0.001 * rng.randn(DIM)  # planted near-dup of vec 0
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(len(base))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_bruteforce_matches_numpy(emb):
    df, base = emb
    q = df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = brute_force_topk(df, q, k=5).toPandas()
    norms = base / np.linalg.norm(base, axis=1, keepdims=True)
    sims = norms @ norms.T
    for qid in (0, 1):
        order = np.lexsort((np.arange(len(base)), -sims[qid]))[:5]
        mine = got[got.query_id == qid].sort_values("rank").vec_id.tolist()
        assert mine == list(order)
    # planted near-dup is rank 2 for query 0 (rank 1 = itself)
    r = got[(got.query_id == 0) & (got["rank"] == 2)]
    assert r.vec_id.iloc[0] == 1


def test_cosine_col_exact(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])],
        "a array<float>, b array<float>",
    )
    vals = [r.c for r in df.select(cosine_col(F.col("a"), F.col("b")).alias("c")).collect()]
    assert abs(vals[0] - 1.0) < 1e-6 and abs(vals[1]) < 1e-6


def test_lsh_finds_planted_near_dup(emb):
    df, _ = emb
    q = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = lsh_topk(df, q, k=3, dim=DIM, n_bits=4, n_tables=8).toPandas()
    # near-identical vectors land in the same bucket in every table
    assert got[got["rank"] == 1].vec_id.iloc[0] == 0
    assert 1 in set(got.vec_id)
    # LSH scores are exact cosines (re-ranked), so they match brute force
    bf = brute_force_topk(df, q, k=3).toPandas()
    merged = got.merge(bf, on=["query_id", "vec_id"], suffixes=("_l", "_b"))
    assert (abs(merged.cosine_l - merged.cosine_b) < 1e-9).all()


def test_ivf_full_probe_equals_bruteforce(emb):
    """Probing every list makes IVF exact — must equal the brute-force
    baseline row for row."""
    df, _ = emb
    q = df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    n_list = 8
    got = (
        ivf_topk(df, q, k=5, n_list=n_list, n_probe=n_list)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    bf = (
        brute_force_topk(df, q, k=5)
        .toPandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    assert got.vec_id.tolist() == bf.vec_id.tolist()
    assert (abs(got.cosine - bf.cosine) < 1e-9).all()


def test_ivf_partial_probe_finds_planted_dup(emb):
    df, _ = emb
    q = df.where(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = ivf_topk(df, q, k=3, n_list=8, n_probe=3).toPandas()
    # vec 0 and its near-identical copy share a coarse list
    assert got[got["rank"] == 1].vec_id.iloc[0] == 0
    assert 1 in set(got.vec_id)


def test_embedding_dup_pairs_exact_and_lsh(emb):
    df, base = emb
    exact = embedding_dup_pairs(df, threshold=0.99, method="exact").toPandas()
    # the only pair above 0.99 in the fixture is the planted (0, 1)
    assert set(map(tuple, exact[["vec_a", "vec_b"]].values)) == {(0, 1)}
    assert (exact.cosine >= 0.99).all()
    lsh = embedding_dup_pairs(
        df, threshold=0.99, method="lsh", dim=DIM, n_bits=4, n_tables=8
    ).toPandas()
    assert (0, 1) in set(map(tuple, lsh[["vec_a", "vec_b"]].values))
    # LSH candidates are a subset of all pairs -> results subset of exact
    assert set(map(tuple, lsh[["vec_a", "vec_b"]].values)) <= set(
        map(tuple, exact[["vec_a", "vec_b"]].values)
    )


def test_ivf_index_partition_pruning(spark, tmp_path):
    """The materialized IVF layout: probe results equal the in-memory IVF,
    and the probe scan is dynamically partition-pruned to the probed lists."""
    import numpy as np
    from pyspark.sql import functions as F

    from kgpipe.simsearch import build_ivf_index, ivf_topk, ivf_topk_indexed

    rng = np.random.RandomState(7)
    emb = spark.createDataFrame(
        [(i, rng.randn(16).astype(float).tolist()) for i in range(200)],
        "vec_id long, embedding array<double>",
    )
    q = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    path = str(tmp_path / "ivf")
    centroids = build_ivf_index(emb, path, n_list=8)
    got = ivf_topk_indexed(spark, path, centroids, q, k=4, n_probe=3)
    want = ivf_topk(emb, q, k=4, n_list=8, n_probe=3)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # the probe plan prunes partitions via DPP on list_id
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters: [isnotnull(list_id" in plan


def test_kmeans_centroids_balance_and_determinism(spark):
    """Sampled-Lloyd quantizer: on a clustered corpus the inverted lists
    stay balanced (max list <= 3x the ideal share), unlike first-n seeding
    which can funnel a whole cluster into one list; and training is
    deterministic (same centroids on re-run)."""
    import numpy as np

    from kgpipe.simsearch import _assign_lists_udf, kmeans_centroids

    rng = np.random.RandomState(7)
    rows = []
    # 4 tight clusters of 50 vectors, dim 16
    for c in range(4):
        center = rng.randn(16) * 2
        for j in range(50):
            v = center + rng.randn(16) * 0.05
            rows.append((c * 50 + j, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cents1 = kmeans_centroids(emb, n_list=4, sample_mod=2)
    cents2 = kmeans_centroids(emb, n_list=4, sample_mod=2)
    assert np.array_equal(cents1, cents2)

    assign = _assign_lists_udf(cents1, 1)
    lists = (
        emb.select((assign("embedding")[0]).alias("list_id"))
        .groupBy("list_id").count().collect()
    )
    sizes = {r.list_id: r["count"] for r in lists}
    assert max(sizes.values()) <= 3 * (200 / 4), sizes
    # every cluster of the data landed in SOME list, none starved to zero
    assert len(sizes) == 4


# ------------------------------------------------------ quantize_embeddings ---

def test_quantize_embeddings_exact(spark):
    from kgpipe.simsearch import quantize_embeddings

    rows = [
        (1, [1.0, -0.5, 0.25, 0.0]),     # max_abs 1.0
        (2, [0.0, 0.0, 0.0, 0.0]),       # all-zero vector
        (3, [-2.0, 1.0, 0.5, -1.0]),     # max_abs 2.0, negative extreme
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {}
    for r in quantize_embeddings(df).collect():
        got.setdefault(r.vec_id, {})[r.i] = r
    # vec 1: q = floor(x * 127 / 1.0)
    assert [got[1][i].q for i in (1, 2, 3, 4)] == [127, -64, 31, 0]
    assert got[1][1].scale_e6 == 127_000_000
    # vec 2: zero vector -> all zeros, scale 0
    assert all(got[2][i].q == 0 and got[2][i].scale_e6 == 0 for i in (1, 2, 3, 4))
    # vec 3: max_abs 2 -> extremes hit exactly -127 and floor(63.5) = 63
    assert [got[3][i].q for i in (1, 2, 3, 4)] == [-127, 63, 31, -64]
    assert got[3][1].scale_e6 == 63_500_000


def test_quantize_embeddings_subnormal_guard(spark):
    """max_abs below 1e-9 must behave like the all-zero case in BOTH
    engines: 127e6 / max_abs would otherwise leave int64 range and Spark
    (clamp/null) and DuckDB (raise) diverge on the cast."""
    import duckdb

    from kgpipe.simsearch import quantize_embeddings

    rows = [(1, [1e-12, -5e-13, 0.0]), (2, [1.0, -0.5, 0.25])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.vec_id, r.i): (r.q, r.scale_e6)
           for r in quantize_embeddings(df).collect()}
    assert got[(1, 1)] == (0, 0) and got[(1, 2)] == (0, 0)
    assert got[(2, 1)] == (127, 127_000_000)

    from __spark_entry__ import oracle_sql
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM (VALUES "
        "(1, [CAST(1e-12 AS FLOAT), CAST(-5e-13 AS FLOAT), CAST(0.0 AS FLOAT)]), "
        "(2, [CAST(1.0 AS FLOAT), CAST(-0.5 AS FLOAT), CAST(0.25 AS FLOAT)])"
        ") t(vec_id, embedding)"
    )
    oracle = {
        (vid, i): (q, s)
        for vid, i, q, s in con.execute(oracle_sql()["sim_quantize"]).fetchall()
    }
    assert oracle == got


def test_quantize_embeddings_bounds_and_error(spark):
    from kgpipe.simsearch import quantize_embeddings

    rows = [(i, [((i * 37 + j * 17) % 200 - 100) / 50.0 for j in range(16)])
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    by_vec = {}
    for r in quantize_embeddings(df).collect():
        by_vec.setdefault(r.vec_id, []).append(r)
    for vid, comps in by_vec.items():
        emb = rows[vid][1]
        ma = max(abs(v) for v in emb)
        for r in comps:
            assert -127 <= r.q <= 127
            # one-step dequantization error bound
            assert abs(emb[r.i - 1] - r.q * ma / 127) <= ma / 127 + 1e-9


def test_bucket_all_udf_matches_per_table_buckets(spark):
    # the one-pass multi-table bucket UDF must emit, per table t, exactly
    # the bucket id the original per-table UDF computed — the LSH blocking
    # (and its DuckDB oracle twin) depend on bit-identical keys
    from kgpipe.simsearch import _bucket_all_udf, _bucket_udf

    dim, n_bits, n_tables = 16, 8, 4
    rows = [(i, [((i * 31 + j * 13) % 97 - 48) / 24.0 for j in range(dim)])
            for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    from pyspark.sql import functions as F

    combined = {
        r.vec_id: r.bks
        for r in df.select(
            "vec_id", _bucket_all_udf(dim, n_bits, n_tables)("embedding").alias("bks")
        ).collect()
    }
    for t in range(n_tables):
        per_table = {
            r.vec_id: r.bkt
            for r in df.select(
                "vec_id", _bucket_udf(dim, n_bits, t)("embedding").alias("bkt")
            ).collect()
        }
        for vid, bkt in per_table.items():
            assert combined[vid][t] == bkt, (t, vid)
