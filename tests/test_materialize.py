"""Bucketed materialization, lineage, checkpoint-resume (A6, north_star)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from kgpipe.config import PipelineConfig
from kgpipe.fixtures import synthetic_transcripts_df
from kgpipe.materialize import completed_buckets, run_with_resume, with_bucket
from kgpipe.pipeline import build_triples

KEY = ["subj", "pred", "obj", "conv_id", "turn_idx"]


def _sorted(pdf):
    return pdf[KEY].fillna("_").sort_values(KEY).reset_index(drop=True)


def test_resume_produces_identical_output(spark, gazetteer, blacklist, tmp_path):
    """Kill-after-K-partitions simulation: partial run + resume ==
    single-shot run, and a third run is a no-op (SURVEY.md §5 resume test)."""
    cfg = PipelineConfig()
    tr = synthetic_transcripts_df(spark, n_conv=12, turns_per_conv=4, hot_conv_factor=2)
    fn = lambda df: build_triples(df, gazetteer, blacklist, cfg, fused=True)

    out = str(tmp_path / "kg")
    r1 = run_with_resume(spark, tr, out, fn, run_id="r1", source_snapshot_id="s1",
                         n_buckets=8, only_buckets=[0, 1, 2])
    assert set(r1["written_buckets"]) <= {0, 1, 2}
    r2 = run_with_resume(spark, tr, out, fn, run_id="r2", source_snapshot_id="s1", n_buckets=8)
    assert set(r1["written_buckets"]).isdisjoint(r2["written_buckets"])
    r3 = run_with_resume(spark, tr, out, fn, run_id="r3", source_snapshot_id="s1", n_buckets=8)
    assert r3["written_buckets"] == []

    materialized = spark.read.parquet(os.path.join(out, "triples")).toPandas()
    direct = build_triples(tr, gazetteer, blacklist, cfg, fused=True).toPandas()
    assert _sorted(materialized).equals(_sorted(direct))


def test_lineage_rows_and_counts(spark, gazetteer, blacklist, tmp_path):
    cfg = PipelineConfig()
    tr = synthetic_transcripts_df(spark, n_conv=6, turns_per_conv=3, hot_conv_factor=1)
    out = str(tmp_path / "kg2")
    run_with_resume(
        spark, tr, out,
        lambda df: build_triples(df, gazetteer, blacklist, cfg, fused=True),
        run_id="rA", source_snapshot_id="sA", n_buckets=4,
    )
    lineage = spark.read.parquet(os.path.join(out, "lineage")).toPandas()
    triples = spark.read.parquet(os.path.join(out, "triples"))
    per_bucket = {
        r.bucket: r.cnt
        for r in triples.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()
    }
    total = triples.count()
    for _, row in lineage.iterrows():
        assert row.run_id == "rA" and row.source_snapshot_id == "sA"
        assert per_bucket.get(row.partition_hash, 0) == row.triple_count
        assert "build_and_write_sec" in row.stage_timings
        # observed metrics (computed inline during the write) land in lineage
        assert row.stage_timings["n_triples"] == total
        assert {"n_tlink", "n_entity", "n_convs_approx"} <= set(row.stage_timings)
    assert completed_buckets(spark, os.path.join(out, "lineage"), "sA") == set(lineage.partition_hash)
    # a different snapshot id sees nothing completed
    assert completed_buckets(spark, os.path.join(out, "lineage"), "sB") == set()


def test_bucket_assignment_is_conv_stable(spark):
    tr = synthetic_transcripts_df(spark, n_conv=5, turns_per_conv=3, hot_conv_factor=1)
    b = with_bucket(tr, 8).select("conv_id", "bucket").distinct().toPandas()
    assert b.groupby("conv_id").bucket.nunique().max() == 1
