"""Unit tests for per-turn text primitives (SURVEY.md §2.2/2.3 operators
F6-F9, J4, W2, X10)."""

from kgpipe.resources import Gazetteer
from kgpipe.text import (
    covering_sentence,
    invert_token_map,
    match_gazetteer,
    section_spans,
    sentence_spans,
    tokenize,
)


def test_tokenize_offsets_roundtrip():
    text = "patient received cisplatin on 3/5/2024 ."
    tokens, tmap, nl = tokenize(text)
    for tok, (b, e), is_nl in zip(tokens, tmap, nl):
        assert text[b:e] == tok
        assert not is_nl
    assert tokens[:3] == ["patient", "received", "cisplatin"]
    assert "/" in tokens  # punctuation is its own token


def test_tokenize_newlines_and_sorted_order():
    text = "a\nb\n\nc"
    tokens, tmap, nl = tokenize(text)
    assert tokens == ["a", "\n", "b", "\n", "\n", "c"]
    assert nl == [False, True, False, True, True, False]
    begins = [b for b, _ in tmap]
    assert begins == sorted(begins)


def test_invert_map_last_wins():
    # duplicate begins collapse last-wins (timeline_delegator.py:98-118)
    tmap = [(0, 1), (0, 2), (3, 4)]
    b2t, e2t = invert_token_map(tmap)
    assert b2t[0] == 1  # later entry overwrote
    assert e2t[4] == 2


def test_sentence_spans_and_covering():
    text = "first one. second one!\nthird"
    spans = sentence_spans(text)
    assert [text[b:e] for b, e in spans] == ["first one", "second one", "third"]
    assert covering_sentence(spans, 11, 17) == spans[1]
    assert covering_sentence(spans, 0, 25) is None


def test_section_spans():
    text = '[start section id="HPI"]body here[end section id="HPI"]'
    secs = section_spans(text)
    assert secs == [("HPI", 24, 33)]
    assert text[24:33] == "body here"
    assert section_spans("no tags")[0][0] == "SIMPLE_SEGMENT"


def _gaz():
    return Gazetteer.from_rows(
        [
            ("C1", "T061", "cisplatin"),
            ("C2", "T061", "liposomal doxorubicin"),
            ("C2", "T061", "doxorubicin"),
            ("C3", "T061", "ac"),
        ]
    )


def test_gazetteer_all_spans_semantics():
    # DefaultTermConsumer: overlapping matches all emitted
    text = "gave liposomal doxorubicin today"
    tokens, tmap, nl = tokenize(text)
    hits = match_gazetteer(tokens, tmap, nl, _gaz())
    terms = sorted(h["term"] for h in hits)
    assert terms == ["doxorubicin", "liposomal doxorubicin"]
    longest = match_gazetteer(tokens, tmap, nl, _gaz(), all_spans=False)
    assert [h["term"] for h in longest] == ["liposomal doxorubicin"]


def test_gazetteer_min_span_and_newline_break():
    text = "ac given"
    tokens, tmap, nl = tokenize(text)
    assert [h["term"] for h in match_gazetteer(tokens, tmap, nl, _gaz())] == ["ac"]
    assert match_gazetteer(tokens, tmap, nl, _gaz(), min_span=3) == []
    # a newline inside a candidate n-gram breaks the term
    text2 = "liposomal\ndoxorubicin"
    tokens2, tmap2, nl2 = tokenize(text2)
    terms2 = [h["term"] for h in match_gazetteer(tokens2, tmap2, nl2, _gaz())]
    assert terms2 == ["doxorubicin"]


def test_gazetteer_case_insensitive():
    text = "Cisplatin GIVEN"
    tokens, tmap, nl = tokenize(text)
    hits = match_gazetteer(tokens, tmap, nl, _gaz())
    assert hits[0]["term"] == "cisplatin"
    assert text[hits[0]["begin"]:hits[0]["end"]] == "Cisplatin"
