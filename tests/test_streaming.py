"""Structured Streaming ingest: stream == batch on the same input, and the
checkpoint makes a second availableNow run process ONLY newly-landed files
(incremental exactly-once)."""

from __future__ import annotations

import os

from kgpipe.config import DEFAULT_CONFIG
from kgpipe.fixtures import synthetic_transcripts_df
from kgpipe.pipeline import build_triples
from kgpipe.schemas import TRIPLE_SCHEMA
from kgpipe.streaming import run_stream


def _rows(df):
    return sorted(map(tuple, df.select(*TRIPLE_SCHEMA.fieldNames()).collect()))


def test_stream_equals_batch_and_resumes(spark, gazetteer, blacklist, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    batch1 = synthetic_transcripts_df(spark, n_conv=4, turns_per_conv=5, seed=1,
                                      hot_conv_factor=1)
    batch1.write.mode("append").parquet(in_dir)

    q = run_stream(spark, in_dir, out_dir, ckpt, gazetteer, blacklist,
                   DEFAULT_CONFIG, timeout_sec=120.0)
    assert not q.isActive
    got1 = _rows(spark.read.schema(TRIPLE_SCHEMA).parquet(out_dir))
    want1 = _rows(build_triples(batch1, gazetteer, blacklist, DEFAULT_CONFIG, fused=True))
    assert got1 == want1 and len(got1) > 0

    # land a second batch of files; rerun with the same checkpoint: only the
    # new files are processed, output becomes the union (no duplicates)
    batch2 = synthetic_transcripts_df(spark, n_conv=3, turns_per_conv=4, seed=2,
                                      hot_conv_factor=1)
    # distinct conv ids so union counting is unambiguous
    from pyspark.sql import functions as F

    batch2 = batch2.withColumn("conv_id", F.concat(F.lit("b2-"), "conv_id"))
    batch2.write.mode("append").parquet(in_dir)

    q2 = run_stream(spark, in_dir, out_dir, ckpt, gazetteer, blacklist,
                    DEFAULT_CONFIG, timeout_sec=120.0)
    assert not q2.isActive
    got2 = _rows(spark.read.schema(TRIPLE_SCHEMA).parquet(out_dir))
    want2 = sorted(
        want1
        + _rows(build_triples(batch2, gazetteer, blacklist, DEFAULT_CONFIG, fused=True))
    )
    assert got2 == want2
    assert os.path.isdir(ckpt)


def test_stateful_conversation_state_across_batches(spark, tmp_path):
    """applyInPandasWithState: state carries across micro-batches; the final
    snapshot per conversation equals the batch aggregate over all input."""
    from pyspark.sql import functions as F

    from kgpipe.streaming import run_stateful_stream

    in_dir = str(tmp_path / "sin")
    out_dir = str(tmp_path / "sout")
    ckpt = str(tmp_path / "sckpt")
    t = synthetic_transcripts_df(spark, n_conv=5, turns_per_conv=6, seed=3,
                                 hot_conv_factor=1)
    # 4 input files + maxFilesPerTrigger=1 -> 4 micro-batches
    t.repartition(4).write.mode("append").parquet(in_dir)

    q = run_stateful_stream(spark, in_dir, out_dir, ckpt,
                            max_files_per_trigger=1, timeout_sec=180.0)
    assert not q.isActive
    snaps = spark.read.parquet(out_dir)
    n_convs = t.select("conv_id").distinct().count()
    # cumulative snapshots from >1 batch: more rows than conversations
    assert snaps.count() > n_convs

    from pyspark.sql import Window
    w = Window.partitionBy("conv_id").orderBy(F.col("n_turns").desc())
    final = (
        snaps.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("conv_id", "n_turns", "n_roles", "first_date", "last_date",
                "total_chars")
    )
    want = t.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("role").cast("int").alias("n_roles"),
        F.min(F.to_date("ts")).alias("first_date"),
        F.max(F.to_date("ts")).alias("last_date"),
        F.sum(F.length("text")).alias("total_chars"),
    )
    got_rows = sorted(map(tuple, final.collect()))
    want_rows = sorted(map(tuple, want.collect()))
    assert got_rows == want_rows
