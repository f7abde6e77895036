"""S6 Anafora XML export: well-formed, reference id scheme (events from 1,
TIMEX after a one-id gap, DOCTIME last), spans and A4 CUI join correct."""

from __future__ import annotations

import dataclasses
import xml.etree.ElementTree as ET

from kgpipe.anafora import anafora_documents
from kgpipe.config import DEFAULT_CONFIG
from kgpipe.fixtures import synthetic_transcripts_df
from kgpipe.pipeline import build_annotations

CFG = dataclasses.replace(DEFAULT_CONFIG, use_dtr=True, use_conmod=True)


def test_anafora_xml_structure(spark, gazetteer, blacklist):
    t = synthetic_transcripts_df(spark, n_conv=3, turns_per_conv=4, hot_conv_factor=1)
    ann = build_annotations(t, gazetteer, blacklist, CFG)
    docs = anafora_documents(ann["mentions"], ann["timexes"]).collect()
    assert docs

    mentions = {
        (r.conv_id, r.turn_idx): r
        for r in ann["mentions"]
        .groupBy("conv_id", "turn_idx")
        .count()
        .collect()
    }
    checked_gap = False
    for row in docs:
        root = ET.fromstring(row.xml)  # well-formed
        assert root.tag == "data"
        entities = root.find("annotations").findall("entity")
        evs = [e for e in entities if e.findtext("type") == "EVENT"]
        tms = [e for e in entities if e.findtext("type") == "TIMEX3"]
        dct = [e for e in entities if e.findtext("type") == "DOCTIME"]
        assert evs, row.doc_name
        assert len(dct) <= 1
        # id scheme: events 1..n; timexes start at n+2 (reference quirk)
        ev_ids = [int(e.findtext("id").split("@")[0]) for e in evs]
        assert ev_ids == list(range(1, len(evs) + 1))
        if tms:
            tm_ids = [int(e.findtext("id").split("@")[0]) for e in tms]
            assert tm_ids == list(range(len(evs) + 2, len(evs) + 2 + len(tms)))
            checked_gap = True
        for e in evs:
            b, en = map(int, e.findtext("span").split(","))
            assert 0 <= b < en
            props = e.find("properties")
            assert props.findtext("Polarity") == "POS"
            assert props.findtext("CUI")
        # doc name embedded in every id
        assert all(
            e.findtext("id").endswith(f"@e@{row.doc_name}@system") for e in entities
        )
    assert checked_gap
    # distinct spans in mentions == EVENT entities per doc
    some = docs[0]
    span_count = (
        ann["mentions"]
        .where(
            (ann["mentions"].conv_id == some.conv_id)
            & (ann["mentions"].turn_idx == some.turn_idx)
        )
        .select("begin", "end")
        .distinct()
        .count()
    )
    root = ET.fromstring(some.xml)
    n_ev = len(
        [e for e in root.find("annotations").findall("entity") if e.findtext("type") == "EVENT"]
    )
    assert n_ev == span_count
