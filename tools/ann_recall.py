"""ANN quality report: recall@k of the approximate similarity-search paths
(LSH sign-projection, IVF) against the exact brute-force top-k.

Correctness of each path is already oracle-gated (sim_topk_* driver rows
hash-match DuckDB twins); THIS measures the quality trade the approximate
paths make — the number a user tuning n_tables/n_probe actually needs.

Two corpora:
* the driver's sf0.1 embeddings fixture (2k x 64) — the oracle-covered
  surface;
* a 100k x 64 deterministic clustered corpus (64 centers on coordinate
  axes + seeded Gaussian jitter, numpy RandomState(7) — reproducible) —
  the regime where the inverted lists actually separate.

Recall@k = |approx top-k ∩ exact top-k| / k, averaged over queries (ties
broken on vec_id on both sides, so the comparison is exact).

Usage: python tools/ann_recall.py [--out reports/ann_recall.json]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

K = 10
N_QUERIES = 50


def _topk_sets(df) -> dict:
    rows = df.select("query_id", "vec_id").collect()
    out: dict = {}
    for r in rows:
        out.setdefault(r["query_id"], set()).add(r["vec_id"])
    return out


def _recall(approx: dict, exact: dict) -> float:
    vals = [
        len(approx.get(q, set()) & hits) / len(hits)
        for q, hits in exact.items()
    ]
    return round(float(np.mean(vals)), 4)


def synth_embeddings(spark, n: int = 100_000, dim: int = 64, centers: int = 64):
    rng = np.random.RandomState(7)
    c = rng.normal(0, 1, (centers, dim)).astype("float64")
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    assign = np.arange(n) % centers
    vecs = c[assign] + rng.normal(0, 0.25, (n, dim))
    import pandas as pd

    pdf = pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": list(vecs),
    })
    return spark.createDataFrame(pdf)


def measure(spark, emb, dim: int, label: str) -> dict:
    from kgpipe.simsearch import brute_force_topk, ivf_topk, lsh_topk

    qs = emb.orderBy("vec_id").limit(N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    t0 = time.time()
    exact = _topk_sets(brute_force_topk(emb, qs, k=K))
    t_exact = time.time() - t0

    out = {"k": K, "n_queries": N_QUERIES, "exact_wall_sec": round(t_exact, 2),
           "lsh": {}, "ivf": {}}
    # sweep BOTH knobs: fewer bits -> bigger buckets -> more candidates
    # scanned -> higher recall (the recall/cost dial)
    for n_bits, n_tables in ((8, 2), (8, 4), (8, 8), (6, 8), (4, 4), (4, 8)):
        t0 = time.time()
        approx = _topk_sets(
            lsh_topk(emb, qs, k=K, dim=dim, n_bits=n_bits, n_tables=n_tables)
        )
        out["lsh"][f"bits={n_bits},tables={n_tables}"] = {
            "recall": _recall(approx, exact),
            "wall_sec": round(time.time() - t0, 2),
        }
    for n_probe in (2, 4, 8):
        t0 = time.time()
        approx = _topk_sets(
            ivf_topk(emb, qs, k=K, n_list=16, n_probe=n_probe)
        )
        out["ivf"][f"probe={n_probe}/16"] = {
            "recall": _recall(approx, exact),
            "wall_sec": round(time.time() - t0, 2),
        }
    print(label, json.dumps(out))
    return out


def main() -> int:
    argv = sys.argv[1:]
    out_path = (
        argv[argv.index("--out") + 1]
        if "--out" in argv
        else "reports/ann_recall.json"
    )

    from kgpipe.session import get_spark

    spark = get_spark(
        "ann-recall", master="local[16]", shuffle_partitions=16,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    report = {}
    emb_fix = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    emb_fix = emb_fix.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    report["fixture_sf0.1_2k_x64"] = measure(spark, emb_fix, 64, "fixture:")

    emb_big = synth_embeddings(spark)
    emb_big.write.mode("overwrite").parquet("/tmp/kgpipe_ann_big")
    emb_big = spark.read.parquet("/tmp/kgpipe_ann_big")
    report["synthetic_100k_x64_clustered"] = measure(spark, emb_big, 64, "synthetic:")

    with open(out_path, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report: {out_path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
