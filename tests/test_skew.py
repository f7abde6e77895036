"""Skew controls are exact: chunk+halo cross-turn edges and salted
repartition produce byte-identical results to the unpartitioned plans on a
hot-conversation fixture (SURVEY.md §7.4 risk 6)."""

from __future__ import annotations

import dataclasses

from kgpipe.config import DEFAULT_CONFIG
from kgpipe.fixtures import synthetic_transcripts_df
from kgpipe.graph import cross_turn_event_edges
from kgpipe.pipeline import build_annotations, build_triples
from kgpipe.skew import spread_by_turn, with_conv_chunks


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_with_conv_chunks_halo_shape(spark):
    t = spark.createDataFrame(
        [("c", i) for i in range(25)], "conv_id string, turn_idx int"
    )
    out = with_conv_chunks(t, chunk_turns=10, halo=3).collect()
    base = [(r.turn_idx, r.chunk) for r in out if not r.is_halo]
    halo = [(r.turn_idx, r.chunk) for r in out if r.is_halo]
    assert len(base) == 25
    # rows 10,11,12 -> chunk 0; rows 20,21,22 -> chunk 1; nothing below 0
    assert sorted(halo) == [(10, 0), (11, 0), (12, 0), (20, 1), (21, 1), (22, 1)]


def test_chunked_cross_turn_edges_exact(spark, gazetteer, blacklist):
    # one hot conversation (100 turns) + normal ones; chunk of 7 with gap 8
    # forces halo look-ahead across many chunk boundaries (halo == gap > 0,
    # and 7 < gap ensures some leads resolve entirely inside the halo)
    t = synthetic_transcripts_df(spark, n_conv=6, turns_per_conv=10, hot_conv_factor=10)
    mentions = build_annotations(t, gazetteer, blacklist, DEFAULT_CONFIG)["mentions"]
    mentions = mentions.cache()
    unchunked = dataclasses.replace(DEFAULT_CONFIG, conv_chunk_turns=0)
    chunked = dataclasses.replace(DEFAULT_CONFIG, conv_chunk_turns=7)
    a = _rows(cross_turn_event_edges(mentions, unchunked))
    b = _rows(cross_turn_event_edges(mentions, chunked))
    assert a == b and len(a) > 0
    mentions.unpersist()


def test_salted_triples_exact(spark, gazetteer, blacklist):
    t = synthetic_transcripts_df(spark, n_conv=4, turns_per_conv=6, hot_conv_factor=8)
    plain = dataclasses.replace(DEFAULT_CONFIG, salt_partitions=0)
    salted = dataclasses.replace(DEFAULT_CONFIG, salt_partitions=16)
    for fused in (True, False):
        a = _rows(build_triples(t, gazetteer, blacklist, plain, fused=fused))
        b = _rows(build_triples(t, gazetteer, blacklist, salted, fused=fused))
        assert a == b and len(a) > 0


def test_spread_by_turn_partition_count(spark):
    t = synthetic_transcripts_df(spark, n_conv=2, turns_per_conv=40, hot_conv_factor=1)
    assert spread_by_turn(t, 16).rdd.getNumPartitions() == 16
