"""A2 per-conversation timeline rollup (entity_timeline_summary)."""

from __future__ import annotations

import datetime as dt

from kgpipe.graph import entity_timeline_summary


def test_timeline_summary_rollup(spark):
    d = dt.date
    rows = [
        # conv, turn, anchor, cui, term
        ("c1", 0, d(2021, 1, 1), "C101", "spark"),
        ("c1", 0, d(2021, 1, 1), "C101", "spark"),
        ("c1", 2, d(2021, 1, 3), "C101", "apache spark"),
        ("c1", 2, d(2021, 1, 3), "C102", "hash join"),
        ("c2", 5, d(2020, 6, 6), "C101", "spark"),
    ]
    m = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, anchor_date date, cui string, term string"
    )
    got = {
        (r.conv_id, r.cui): r
        for r in entity_timeline_summary(m).collect()
    }
    assert len(got) == 3
    r = got[("c1", "C101")]
    assert r.n_mentions == 3
    assert r.n_turns == 2
    assert r.first_seen == d(2021, 1, 1) and r.last_seen == d(2021, 1, 3)
    # distinct terms, sorted, comma-joined (A4 string-agg semantics)
    assert r.terms == "apache spark,spark"
    assert got[("c1", "C102")].n_mentions == 1
    assert got[("c2", "C101")].terms == "spark"
