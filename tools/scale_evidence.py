"""Off-sandbox-scale evidence run for the dedup/graph suite.

The per-round bench (sf0.1, 100k turns / 5k docs) verifies correctness and
headline throughput; THIS script stresses the two operators whose scale
story rests on structural bounds rather than raw wall:

* ``dedup_clusters`` on a synthetic 1.2M-document corpus — the claim is
  that the banded MinHash equi-join never goes all-pairs: candidate pairs
  and the hottest band bucket stay proportional to planted duplication, not
  to corpus size squared.
* ``connected_components`` on a synthetic 1.5M-node graph with a planted
  320k-node giant component — the claim is that hash-to-min + pointer
  doubling converges in the fixed 6 rounds with no driver-side state, and
  the result is EXACTLY right (component memberships asserted).

Both inputs are synthesized deterministically inside Spark (no external
data, no RNG): doc text spells the group id in digit words, graph edges are
arithmetic on ``spark.range``. Results are committed as a table in
BASELINE.md (same protocol as the bench --skew table).

Usage: python tools/scale_evidence.py [--docs N] [--nodes N] [--out report.json]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def synth_documents(spark, n_docs: int):
    """1.2M-doc corpus, zero Python rows: half the 4-doc groups are planted
    near-duplicate quadruples (a 15-word base shared by the group + one
    member-specific trailing word -> ~86% shingle overlap), the other half
    are fully distinct. Every base word embeds the GROUP id and every
    unique-doc word embeds the DOC id, so shingle sets never overlap across
    groups — the measured candidate volume is then a pure read on the LSH
    blocking, not on accidental vocabulary collisions."""
    d = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    group = (F.col("doc_id") / 4).cast("long")
    member = F.col("doc_id") % 4

    def gw(j):  # group-scoped word j
        return F.concat(F.lit("x"), group.cast("string"), F.lit(f"w{j}"))

    def uw(j):  # doc-scoped word j
        return F.concat(
            F.lit("u"), F.col("doc_id").cast("string"), F.lit(f"w{j}")
        )

    near_dup_text = F.concat_ws(
        " ", *[gw(j) for j in range(15)],
        F.concat(F.lit("v"), member.cast("string")),
    )
    unique_text = F.concat_ws(" ", *[uw(j) for j in range(9)])
    return d.select(
        "doc_id",
        F.when(group % 2 == 0, near_dup_text).otherwise(unique_text).alias("text"),
    )


def synth_graph(spark, n_nodes: int, block: int = 32, giant_blocks: int = 10_000):
    """1.5M-node edge list: chains of ``block`` nodes (components of size
    32), plus a star joining the first ``giant_blocks`` block-heads to node
    0 -> one planted giant component of giant_blocks*block nodes with
    diameter <= block+2 (inside pointer-doubling's 2^6 reach)."""
    ids = spark.range(n_nodes)
    chain = ids.where((F.col("id") % block) != block - 1).select(
        F.col("id").cast("string").alias("src"),
        (F.col("id") + 1).cast("string").alias("dst"),
    )
    star = (
        spark.range(1, giant_blocks)
        .select(
            (F.col("id") * block).cast("string").alias("src"),
            F.lit("0").alias("dst"),
        )
    )
    return chain.unionByName(star)


def main() -> int:
    argv = sys.argv[1:]

    def opt(name, default):
        return int(argv[argv.index(name) + 1]) if name in argv else default

    n_docs = opt("--docs", 1_200_000)
    n_nodes = opt("--nodes", 1_500_000)
    giant_blocks = min(10_000, n_nodes // 64)
    out = (
        argv[argv.index("--out") + 1]
        if "--out" in argv
        else "reports/scale_evidence.json"
    )

    from kgpipe.session import get_spark
    from kgpipe.textops import (
        dedup_clusters,
        doc_minhash_signatures,
        doc_shingles,
        minhash_dup_pairs,
    )
    from kgpipe.graph import connected_components

    spark = get_spark(
        "scale-evidence", master="local[32]", shuffle_partitions=64,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    report: dict = {"n_docs": n_docs, "n_nodes": n_nodes}

    # ---- dedup_clusters at 1.2M docs ------------------------------------
    docs_path = "/tmp/kgpipe_scale_docs"
    synth_documents(spark, n_docs).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)

    t0 = time.time()
    clusters = dedup_clusters(docs, n=3, k=8, bands=4, rounds=6)
    agg = clusters.agg(
        F.count("*").alias("rows"),
        F.sum(F.col("is_canonical").cast("long")).alias("n_clusters"),
        F.max("cluster_size").alias("max_cluster"),
    ).first()
    wall_clusters = time.time() - t0

    # structural bounds: candidate volume + hottest band bucket
    pairs = minhash_dup_pairs(docs, n=3, k=8, bands=4)
    n_pairs = pairs.count()
    sigs = doc_minhash_signatures(doc_shingles(docs, n=3), k=8)
    r = 8 // 4
    hot = 0
    for b in range(4):
        cols = [F.col(f"sig_{i}").cast("string") for i in range(b * r, (b + 1) * r)]
        m = (
            sigs.select(F.md5(F.concat_ws("|", *cols)).alias("key"))
            .groupBy("key").count().agg(F.max("count")).first()[0]
        )
        hot = max(hot, int(m))

    # planted truth: even groups are 4-dup quadruples -> every such doc in a
    # cluster of >=4; candidate pairs ~ 6 per dup group, never ~n^2/2
    n_dup_groups = sum(1 for g in range((n_docs + 3) // 4) if g % 2 == 0)
    report["dedup_clusters"] = {
        "rows": int(agg["rows"]),
        "n_clusters": int(agg["n_clusters"]),
        "max_cluster_size": int(agg["max_cluster"]),
        "candidate_pairs": int(n_pairs),
        "planted_dup_groups": n_dup_groups,
        "all_pairs_would_be": n_docs * (n_docs - 1) // 2,
        "max_band_bucket": hot,
        "wall_sec": round(wall_clusters, 2),
    }
    assert agg["rows"] == n_docs, "every doc must get a cluster row"
    print(json.dumps(report["dedup_clusters"]))

    # ---- connected_components at 1.5M nodes ------------------------------
    edges_path = "/tmp/kgpipe_scale_edges"
    synth_graph(spark, n_nodes, giant_blocks=giant_blocks).write.mode(
        "overwrite").parquet(edges_path)
    edges = spark.read.parquet(edges_path)
    n_edges = edges.count()

    # rounds sized to the graph: convergence needs ~log2(diameter) rounds
    # PER min-label attractor — a lexicographic minimum sitting mid-chain
    # (e.g. "10000" inside block 9984..10015) forms a competing attractor
    # that absorbs its neighborhood first and only then drains toward the
    # true minimum, so the fixed 6-round unroll of the sandbox-scale oracle
    # is one round short at diameter ~33; 8 gives margin (7 is exact here)
    t0 = time.time()
    comp = connected_components(edges, rounds=8)
    stats = comp.agg(
        F.count("*").alias("nodes"),
        F.countDistinct("component").alias("n_components"),
        F.max("component_size").alias("giant"),
    ).first()
    wall_cc = time.time() - t0

    giant_expected = giant_blocks * 32
    report["connected_components"] = {
        "nodes": int(stats["nodes"]),
        "edges": int(n_edges),
        "n_components": int(stats["n_components"]),
        "giant_component_size": int(stats["giant"]),
        "giant_expected": giant_expected,
        "rounds": 8,
        "wall_sec": round(wall_cc, 2),
    }
    # exact correctness at scale, not just survival: the planted giant
    # component and the chain-block component count must both be exact
    assert int(stats["giant"]) == giant_expected, stats
    # ceil: a trailing partial block still forms one chain component
    n_blocks = -(-n_nodes // 32)
    expected_components = n_blocks - giant_blocks + 1
    assert int(stats["n_components"]) == expected_components, (
        stats, expected_components,
    )
    print(json.dumps(report["connected_components"]))

    with open(out, "w") as f:
        json.dump(report, f, indent=2)
    print(f"report: {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
