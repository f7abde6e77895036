"""Noop-sink stage isolation for the headline queries (guide §1.4).

bench.py is frozen for measurement; this file holds the extra
instrumentation: per-stage walls of the structured triples path, fused /
cross-turn / dedup walls, all against the SAME materialized parquet input
shape bench.py times, each labeled via setJobDescription and computed with
the noop sink so the numbers are engine cost, not sink cost.

Usage: python bench_extra.py   (runs the per-stage sweep)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _session():
    from kgpipe.session import get_spark

    return get_spark(
        "kgpipe-bench-extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=max(2 * CPUS, 8),
        extra_conf={"spark.sql.files.maxPartitionBytes": "32m"},
    )


def _materialized(spark):
    import tempfile

    from kgpipe.fixtures import derive_transcripts

    path = tempfile.mkdtemp(prefix="kg_benchx_") + "/transcripts"
    derive_transcripts(spark, SF_DIR).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def _noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def timed(spark, label, build, runs=2) -> float:
    best = None
    for _ in range(runs):
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(label)
        sec = _noop(build())
        best = sec if best is None else min(best, sec)
    spark.sparkContext.setJobDescription(None)
    print(f"{label:42s} {best:7.3f}s", flush=True)
    return best


def run_stages() -> None:
    from pyspark import StorageLevel

    import __spark_entry__ as E
    from kgpipe.config import DEFAULT_CONFIG
    from kgpipe.extract import annotate_union, assign_union_ids, filter_union
    from kgpipe.graph import cross_turn_event_edges
    from kgpipe.pair import pair_window, tlink_triples_from_pairs
    from kgpipe.pipeline import build_annotations, build_triples
    from pyspark.sql import functions as F

    spark = _session()
    t = _materialized(spark)
    gaz, bl = E._GAZ, E._BLACKLIST

    timed(spark, "structured: annotate_union only",
          lambda: annotate_union(t, gaz, bl, DEFAULT_CONFIG))
    timed(spark, "structured: +filter_union",
          lambda: filter_union(
              annotate_union(t, gaz, bl, DEFAULT_CONFIG), bl, DEFAULT_CONFIG))
    timed(spark, "structured: +W1 window (no persist)",
          lambda: assign_union_ids(filter_union(
              annotate_union(t, gaz, bl, DEFAULT_CONFIG), bl, DEFAULT_CONFIG)))

    def full_from_cache():
        u = assign_union_ids(filter_union(
            annotate_union(t, gaz, bl, DEFAULT_CONFIG), bl, DEFAULT_CONFIG)
        ).persist(StorageLevel.MEMORY_AND_DISK)
        u.count()  # materialize the cache; timing below reads it
        t0 = time.time()
        mentions_id = u.where(F.col("kind_rank") == 0)
        timexes_id = u.where(F.col("kind_rank") == 1)
        toks = u.where(F.col("kind_rank") == 2)
        pairs = pair_window(mentions_id, timexes_id)
        tl = tlink_triples_from_pairs(pairs, toks, DEFAULT_CONFIG)
        tl.write.format("noop").mode("overwrite").save()
        sec = time.time() - t0
        u.unpersist()
        print(f"{'structured: pair+score from warm cache':42s} {sec:7.3f}s",
              flush=True)

    spark.sparkContext.setJobDescription("structured: pair+score from cache")
    full_from_cache()
    timed(spark, "structured: FULL build_triples",
          lambda: build_triples(t, gaz, bl, DEFAULT_CONFIG, fused=False))
    timed(spark, "fused: FULL build_triples",
          lambda: build_triples(t, gaz, bl, DEFAULT_CONFIG, fused=True))

    def ct():
        ann = build_annotations(t, gaz, bl, DEFAULT_CONFIG,
                                persist=False, timexes=False)
        return cross_turn_event_edges(ann["mentions_f"], DEFAULT_CONFIG)

    timed(spark, "cross_turn_edges", ct)
    timed(spark, "dedup_minhash",
          lambda: E._q_dedup_minhash(spark, SF_DIR))
    timed(spark, "sim_topk_bruteforce",
          lambda: E._q_topk_bruteforce(spark, SF_DIR))
    spark.stop()


if __name__ == "__main__":
    run_stages()
