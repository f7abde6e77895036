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
