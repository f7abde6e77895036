"""Scale evidence for the streaming-store snapshot compaction.

The pytest suite proves correctness on 2-4 micro-batches; THIS script
measures the shape the operator exists for: a long-running stream that has
accumulated HUNDREDS of per-micro-batch snapshot partitions (the
exactly-once layout's cost), folded into one generation.

Claims measured:
* the fold is one job over the live batches (O(new data)), and the reader
  view before/after is row-identical (count + per-bucket checksum);
* file/partition count collapses from N snapshot dirs to 1;
* a second run is a no-op (nothing live to fold).

The store is synthesized deterministically inside Spark — ``spark.range``
rows written under N snapshot partitions directly (building it through N
real ``availableNow`` micro-batches would measure Structured Streaming
trigger latency, not compaction) — and the lineage/manifest mechanics are
the real ones from kgpipe.materialize.

Usage: python tools/compaction_evidence.py [--snapshots N] [--rows-per N]
       [--out report.json]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--snapshots", type=int, default=192)
    ap.add_argument("--rows-per", type=int, default=10_000)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--out", default="reports/compaction_evidence.json")
    args = ap.parse_args()

    from kgpipe.materialize import (
        TableSink, append_lineage, compact_snapshots, read_triples,
    )
    from kgpipe.session import get_spark

    spark = get_spark(
        "compaction-evidence",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="compact_ev_")
    out_dir = f"{base}/out"
    sink = TableSink(spark, out_dir=out_dir, table_prefix=None)

    # synthesize the accumulated store: N snapshot partitions of triple-ish
    # rows, written the way the streaming materializer lays them out
    n, per = args.snapshots, args.rows_per
    rows = (
        spark.range(n * per)
        .select(
            F.concat(F.lit("s"), (F.col("id") % 1000).cast("string")).alias("subj"),
            F.lit("pred:mention").alias("pred"),
            F.concat(F.lit("o"), F.col("id").cast("string")).alias("obj"),
            F.concat(F.lit("c"), (F.col("id") % 5000).cast("string")).alias("conv_id"),
            (F.col("id") % 50).cast("int").alias("turn_idx"),
            F.pmod(F.xxhash64("id"), F.lit(args.buckets)).cast("int").alias("bucket"),
            F.concat(
                F.lit("stream-batch-"), (F.col("id") % n).cast("string")
            ).alias("source_snapshot_id"),
        )
    )
    t0 = time.monotonic()
    # co-locate each (snapshot, bucket) group into one task before the
    # partitioned write — without this every task emits a file per group
    # (tasks x snapshots x buckets small files) and the build measures the
    # filesystem, not the layout
    (
        rows.repartition(64, "source_snapshot_id", "bucket")
        .write.partitionBy("source_snapshot_id", "bucket")
        .parquet(f"{out_dir}/triples")
    )
    build_sec = time.monotonic() - t0
    # lineage rows so the redelivery-gate bookkeeping is realistic
    append_lineage(
        sink, run_id="synth", source_snapshot_id="synth-all",
        bucket_counts=[(b, per * n // args.buckets) for b in range(args.buckets)],
        stage_timings={},
    )

    def view_checksum():
        df = read_triples(sink)
        # XOR-fold the row hashes: order-independent and overflow-free
        # (a SUM of 5M xxhash64 values overflows long under ANSI mode)
        r = df.select(
            F.xxhash64("subj", "pred", "obj", "conv_id", "turn_idx").alias("rh")
        ).agg(
            F.count(F.lit(1)).alias("n"), F.expr("bit_xor(rh)").alias("h")
        ).first()
        return int(r.n), int(r.h)

    n_before, h_before = view_checksum()
    import os

    dirs_before = sum(
        1 for d in os.listdir(f"{out_dir}/triples")
        if d.startswith("source_snapshot_id=")
    )

    t0 = time.monotonic()
    res = compact_snapshots(sink)
    fold_sec = time.monotonic() - t0
    n_after, h_after = view_checksum()
    dirs_after = sum(
        1 for d in os.listdir(f"{out_dir}/triples")
        if d.startswith("source_snapshot_id=")
    )

    t0 = time.monotonic()
    res2 = compact_snapshots(sink)
    noop_sec = time.monotonic() - t0

    # ------------------------------------------------------------------
    # manifest scaling: the compactor's only driver-side state is the
    # compactions manifest (one row per (generation, source), one FILE per
    # generation — each run's commit point is a coalesce(1) append).
    # Synthesize a 1000-generation manifest with the PRODUCTION file
    # layout — one file per generation (each real run's commit point is a
    # coalesce(1) append): one writer task, rows sorted by generation,
    # maxRecordsPerFile = the per-generation row count, so file boundaries
    # land exactly on generation boundaries. Then time the exact
    # driver-side reads the maintenance path performs: the manifest scan
    # + distinct source/target collects.
    # ------------------------------------------------------------------
    gens, srcs_per = 1000, 16
    man_dir = f"{base}/manifest_scale/compactions"
    (
        spark.range(gens * srcs_per)
        .select(
            F.concat(F.lit("compact-"), (F.col("id") % gens).cast("string"))
            .alias("target_sid"),
            F.concat(F.lit("stream-batch-"), F.col("id").cast("string"))
            .alias("source_sid"),
            F.lit(None).cast("timestamp").alias("compacted_at"),
        )
        .coalesce(1)
        .sortWithinPartitions("target_sid")
        .write.option("maxRecordsPerFile", srcs_per)
        .parquet(man_dir)
    )
    import glob

    n_man_files = len(glob.glob(f"{man_dir}/*.parquet"))
    assert n_man_files == gens, (
        f"expected one manifest file per generation, got {n_man_files}"
    )
    scale_sink = TableSink(spark, out_dir=f"{base}/manifest_scale",
                           table_prefix=None)
    from kgpipe.materialize import _manifest

    t0 = time.monotonic()
    man = _manifest(scale_sink)
    man_sources = {r.source_sid for r in man.select("source_sid").distinct().collect()}
    man_targets = {r.target_sid for r in man.select("target_sid").distinct().collect()}
    manifest_read_sec = time.monotonic() - t0
    assert len(man_targets) == gens and len(man_sources) == gens * srcs_per

    # ------------------------------------------------------------------
    # manifest SELF-compaction (the escape hatch before the ~10^6-
    # generation horizon): fold the per-source rows to one sentinel row
    # per committed generation and measure the shrink — rows gens*srcs ->
    # gens, files gens -> 1 — plus the post-fold read the next
    # maintenance run pays.
    # ------------------------------------------------------------------
    from kgpipe.materialize import compact_manifest

    t0 = time.monotonic()
    fold_res = compact_manifest(scale_sink)
    manifest_fold_sec = time.monotonic() - t0
    n_files_after = len(glob.glob(f"{man_dir}/*.parquet"))
    t0 = time.monotonic()
    man2 = _manifest(scale_sink)
    targets_after = {
        r.target_sid for r in man2.select("target_sid").distinct().collect()
    }
    manifest_read_after_fold_sec = time.monotonic() - t0
    assert fold_res["rows_before"] == gens * srcs_per
    assert fold_res["rows_after"] == gens
    assert targets_after == man_targets, "fold lost a committed generation"
    assert n_files_after == 1, n_files_after

    assert (n_before, h_before) == (n_after, h_after), "reader view changed!"
    assert dirs_after == 1, dirs_after
    assert res2["target_sid"] is None, "second run must no-op"

    report = {
        "snapshots": n,
        "rows_per_snapshot": per,
        "total_rows": n * per,
        "snapshot_dirs_before": dirs_before,
        "snapshot_dirs_after": dirs_after,
        "reader_rows_before": n_before,
        "reader_rows_after": n_after,
        "reader_checksum_equal": h_before == h_after,
        "folded_sources": len(res["source_sids"]),
        "target_sid": res["target_sid"],
        "build_sec": round(build_sec, 2),
        "fold_sec": round(fold_sec, 2),
        "noop_rerun_sec": round(noop_sec, 2),
        "manifest_generations": gens,
        "manifest_rows": gens * srcs_per,
        "manifest_files": n_man_files,
        "manifest_read_sec": round(manifest_read_sec, 2),
        "manifest_fold_rows_after": fold_res["rows_after"],
        "manifest_fold_files_after": n_files_after,
        "manifest_fold_sec": round(manifest_fold_sec, 2),
        "manifest_read_after_fold_sec": round(manifest_read_after_fold_sec, 2),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))
    shutil.rmtree(base, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
