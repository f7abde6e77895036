"""Golden end-to-end tests: the distributed pipeline (both plans) vs the
single-process reference-style oracle (SURVEY.md §5):

* triple P/R >= 0.95 gate (expected exactly 1.0: shared deterministic
  scorer, so any deviation is a dataflow bug);
* structured plan == fused plan row-for-row;
* per-turn text equality under stable (conv_id, turn_idx) ordering
  (the north-rule per-row invariant);
* annotation-id stability across runs.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from kgpipe.config import PipelineConfig
from kgpipe.fixtures import synthetic_transcripts, synthetic_transcripts_df
from kgpipe.pipeline import build_annotations, build_triples

from .oracle_ref import process_corpus

KEY = ["subj", "pred", "obj", "conv_id", "turn_idx", "subj_text", "obj_text", "instance"]


def _canon_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    # anchor_date is compared too (as string): the structured path's column
    # expression and the fused/oracle paths' anchor_for must agree, including
    # the X3 Principal-Date fallback on ts-less turns
    out = pdf[KEY + ["anchor_date"]].copy()
    out["anchor_date"] = out["anchor_date"].astype(str)
    return (
        out.fillna("_").astype({"turn_idx": int}).sort_values(KEY).reset_index(drop=True)
    )


def _pr(system: set, gold: set):
    tp = len(system & gold)
    p = tp / len(system) if system else 1.0
    r = tp / len(gold) if gold else 1.0
    return p, r


@pytest.fixture(scope="module")
def corpus_pdf():
    return synthetic_transcripts(n_conv=25, turns_per_conv=6, seed=7, hot_conv_factor=5)


@pytest.fixture(scope="module")
def corpus_df(spark, corpus_pdf):
    from kgpipe.schemas import TRANSCRIPTS_SCHEMA

    return spark.createDataFrame(corpus_pdf, schema=TRANSCRIPTS_SCHEMA).repartition(8)


@pytest.mark.parametrize("use_dtr,use_conmod", [(False, False), (True, True)])
def test_golden_pr_vs_oracle(spark, corpus_pdf, corpus_df, gazetteer, blacklist, use_dtr, use_conmod):
    cfg = PipelineConfig(use_dtr=use_dtr, use_conmod=use_conmod)
    sys_pdf = build_triples(corpus_df, gazetteer, blacklist, cfg, fused=False).toPandas()
    gold = pd.DataFrame(process_corpus(corpus_pdf, gazetteer, blacklist, cfg))

    sys_triples = set(map(tuple, sys_pdf[["subj", "pred", "obj"]].itertuples(index=False)))
    gold_triples = set(map(tuple, gold[["subj", "pred", "obj"]].itertuples(index=False)))
    p, r = _pr(sys_triples, gold_triples)
    assert p >= 0.95 and r >= 0.95, (p, r)
    assert p == 1.0 and r == 1.0, (
        sorted(sys_triples - gold_triples)[:5],
        sorted(gold_triples - sys_triples)[:5],
    )
    # full-row equality including instances (debug contract)
    assert _canon_frame(sys_pdf).equals(_canon_frame(gold))


def test_structured_equals_fused(corpus_df, gazetteer, blacklist):
    cfg = PipelineConfig(use_dtr=True, use_conmod=True)
    s = build_triples(corpus_df, gazetteer, blacklist, cfg, fused=False).toPandas()
    f = build_triples(corpus_df, gazetteer, blacklist, cfg, fused=True).toPandas()
    assert _canon_frame(s).equals(_canon_frame(f))


def test_per_turn_text_equality_invariant(spark, corpus_pdf, corpus_df, gazetteer, blacklist):
    """Per-row invariant: the annotated table preserves every turn's text
    byte-for-byte under stable (conv_id, turn_idx) ordering."""
    cfg = PipelineConfig()
    tables = build_annotations(corpus_df, gazetteer, blacklist, cfg)
    out = (
        tables["annotated"]
        .select("conv_id", "turn_idx", "text")
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    inp = corpus_pdf[["conv_id", "turn_idx", "text"]].sort_values(
        ["conv_id", "turn_idx"]
    ).reset_index(drop=True)
    assert out["text"].tolist() == inp["text"].tolist()
    assert list(zip(out.conv_id, out.turn_idx)) == list(zip(inp.conv_id, inp.turn_idx))


def test_annotation_id_stability(corpus_df, gazetteer, blacklist):
    """Ids are a pure function of the turn content — two runs agree."""
    cfg = PipelineConfig()
    a = build_annotations(corpus_df, gazetteer, blacklist, cfg)["mentions"]
    b = build_annotations(corpus_df, gazetteer, blacklist, cfg)["mentions"]
    ka = a.select("conv_id", "turn_idx", "begin", "annotation_id").toPandas()
    kb = b.select("conv_id", "turn_idx", "begin", "annotation_id").toPandas()
    cols = ["conv_id", "turn_idx", "begin", "annotation_id"]
    assert ka.sort_values(cols).reset_index(drop=True).equals(
        kb.sort_values(cols).reset_index(drop=True)
    )


def test_id_format_and_window_tie_break(spark, gazetteer, blacklist):
    """Mentions precede timexes on equal begin; format {i}@e@{note}@system."""
    import datetime as dt

    from kgpipe.schemas import TRANSCRIPTS_SCHEMA

    rows = [("cT", 0, "user", "cisplatin 3/5/2024 then folfox", None, dt.datetime(2024, 3, 1))]
    df = spark.createDataFrame(rows, TRANSCRIPTS_SCHEMA)
    t = build_triples(df, gazetteer, blacklist, PipelineConfig(), fused=False).toPandas()
    em = t[t.pred == "entity-mention"].sort_values("subj")
    assert set(em.subj) == {"0@e@cT_0@system", "2@e@cT_0@system"}
    tl = t[t.pred.str.startswith("tlink:")]
    assert set(tl.obj) == {"1@e@cT_0@system"}


def test_empty_and_degenerate_inputs(spark, gazetteer, blacklist):
    from kgpipe.schemas import TRANSCRIPTS_SCHEMA

    empty = spark.createDataFrame([], TRANSCRIPTS_SCHEMA)
    assert build_triples(empty, gazetteer, blacklist, PipelineConfig(), fused=False).count() == 0
    assert build_triples(empty, gazetteer, blacklist, PipelineConfig(), fused=True).count() == 0


def test_ntriples_serialization_and_escaping(spark):
    from kgpipe.pipeline import ntriples_view

    rows = [
        ("m1", "entity-mention", "C101", "c1"),
        ("t1", "speaker-attribution", 'he said "hi" \\ bye', "c1"),
        ("t2", "tool-invocation", "line1\nline2\rtab\there", "c1"),
    ]
    t = spark.createDataFrame(rows, "subj string, pred string, obj string, conv_id string")
    got = sorted(r.ntriple for r in ntriples_view(t).collect())
    assert got == [
        '<urn:kg:id:m1> <urn:kg:pred:entity-mention> <urn:kg:id:C101> .',
        '<urn:kg:id:t1> <urn:kg:pred:speaker-attribution> '
        '"he said \\"hi\\" \\\\ bye" .',
        '<urn:kg:id:t2> <urn:kg:pred:tool-invocation> '
        '"line1\\nline2\\rtab\\there" .',
    ]
