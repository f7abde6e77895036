"""Per-turn text primitives: tokenization with char offsets, newline
sentinels, sentence spans, section segmentation, and gazetteer span matching.

These are pure functions over a single turn's text. They run inside Arrow
batches (``mapInPandas``) on executors — never as row-at-a-time Spark UDFs —
and double as the building blocks of the doc-at-a-time test oracle.

Reference semantics reproduced:
* token stream with (begin, end) char offsets and a newline sentinel token
  (``<cr>`` for conmod instances, ``<newline>`` otherwise)
  — timeline_delegator.py:82-119 (tokens_and_map)
* last-wins dedup of tokens sharing a begin offset, emitted in sorted-begin
  order — timeline_delegator.py:98-118
* begin->token-index / end->token-index inverse maps
  — timeline_delegator.py:122-149 (invert_map)
* gazetteer lookup emits ALL matching spans (DefaultTermConsumer,
  gazetteer.xml:53-62), candidate spans must cover >= minimumSpan chars
  (Timelines.piper:14), matching is case-insensitive on space-joined tokens
* section segmentation via bracketed tags
  — SegmentsFromBracketedSectionTagsAnnotator.java:13-35
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

__all__ = [
    "tokenize",
    "invert_token_map",
    "sentence_spans",
    "section_spans",
    "match_gazetteer",
    "NEWLINE_SENTINEL",
    "CONMOD_NEWLINE_SENTINEL",
]

NEWLINE_SENTINEL = "<newline>"
CONMOD_NEWLINE_SENTINEL = "<cr>"

# words (letters/digits, internal hyphens/apostrophes), or any single
# non-space symbol; newlines are their own token class
_TOKEN_RE = re.compile(r"[A-Za-z0-9]+(?:[-'][A-Za-z0-9]+)*|\n|[^\sA-Za-z0-9]")

_SENT_SPLIT_RE = re.compile(r"[.!?\n]")

_SECTION_RE = re.compile(
    r'\[start section id="?(.*?)"?\](.*?)\[end section id="?(.*?)"?\]',
    re.DOTALL,
)


def tokenize(text: str):
    """Tokenize one turn.

    Returns (tokens, token_map, is_newline) where tokens[i] is the token text
    (newline chars kept verbatim here; sentinel substitution happens at
    instance-build time so both <cr> and <newline> modes share one token
    stream), token_map[i] = (begin, end) char offsets, is_newline[i] marks
    newline tokens.

    W2 semantics (duplicate-begin last-wins, sorted-begin emission,
    tokens_and_map timeline_delegator.py:98-118) hold vacuously here: a
    single finditer pass yields non-overlapping matches in strictly
    increasing begin order, so no dict/sort pass is needed (the reference
    needed one because multiple UIMA annotators could emit colliding
    tokens). invert_token_map keeps the real last-wins behavior for callers
    that merge token streams.
    """
    ms = list(_TOKEN_RE.finditer(text))
    tokens = [m.group(0) for m in ms]
    spans = [m.span() for m in ms]
    newline_flags = [t == "\n" for t in tokens]
    return tokens, spans, newline_flags


def invert_token_map(token_map):
    """begin->token-index and end->token-index maps (invert_map,
    timeline_delegator.py:122-149). Later entries overwrite on collision,
    matching the reference's dict-assignment semantics."""
    begin_map: Dict[int, int] = {}
    end_map: Dict[int, int] = {}
    for idx, (begin, end) in enumerate(token_map):
        begin_map[begin] = idx
        end_map[end] = idx
    return begin_map, end_map


def sentence_spans(text: str):
    """Sentence (begin, end) spans: maximal runs split on [.!?\\n].

    The reference consumes cTAKES ``Sentence`` annotations only to bound the
    conmod instance window (timeline_delegator.py:154-156); a deterministic
    punctuation splitter reproduces that contract.
    """
    spans: List[Tuple[int, int]] = []
    start = 0
    for m in _SENT_SPLIT_RE.finditer(text):
        seg = text[start : m.start()]
        if seg.strip():
            b = start + (len(seg) - len(seg.lstrip()))
            e = start + len(seg.rstrip())
            spans.append((b, e))
        start = m.end()
    seg = text[start:]
    if seg.strip():
        b = start + (len(seg) - len(seg.lstrip()))
        e = start + len(seg.rstrip())
        spans.append((b, e))
    return spans


def covering_sentence(spans, begin: int, end: int) -> Optional[Tuple[int, int]]:
    """First sentence span containing [begin, end) — select_covering
    semantics (timeline_delegator.py:155)."""
    for b, e in spans:
        if b <= begin and end <= e:
            return (b, e)
    return None


def section_spans(text: str):
    """Bracketed-section segmentation (Segments annotator): list of
    (section_id, body_begin, body_end); falls back to one SIMPLE_SEGMENT
    covering the whole text when no tags are present
    (SegmentsFromBracketedSectionTagsAnnotator.java:22-35)."""
    out = []
    for m in _SECTION_RE.finditer(text):
        out.append((m.group(1), m.start(2), m.end(2)))
    if not out:
        out.append(("SIMPLE_SEGMENT", 0, len(text)))
    return out


def match_gazetteer(
    tokens,
    token_map,
    newline_flags,
    gazetteer,
    *,
    min_span: int = 2,
    all_spans: bool = True,
):
    """Dictionary lookup over the token stream (J4).

    For each start token, probe n-grams of 1..gazetteer.max_tokens lowercased
    space-joined word tokens against the broadcast dict; newline tokens never
    participate in a term. Emits ALL matching spans by default
    (DefaultTermConsumer); ``all_spans=False`` keeps only the longest match
    per start token (PrecisionTermConsumer). Spans shorter than ``min_span``
    chars are skipped (minimumSpan=2, Timelines.piper:14).

    Returns list of dicts: begin, end, tok_begin, tok_end (inclusive), term,
    cui, tui.
    """
    n = len(tokens)
    out = []
    terms = gazetteer.terms
    max_len = gazetteer.max_tokens
    first_words = gazetteer.first_words
    lowered = [t.lower() for t in tokens]
    for i in range(n):
        if newline_flags[i]:
            continue
        if first_words and lowered[i] not in first_words:
            continue  # rare-word-index fast path: token opens no term
        parts: List[str] = []
        matches_here = []
        for j in range(i, min(i + max_len, n)):
            if newline_flags[j]:
                break
            parts.append(lowered[j])
            cand = " ".join(parts)
            hit = terms.get(cand)
            if hit is None:
                continue
            begin = token_map[i][0]
            end = token_map[j][1]
            if end - begin < min_span:
                continue
            matches_here.append(
                {
                    "begin": begin,
                    "end": end,
                    "tok_begin": i,
                    "tok_end": j,
                    "term": cand,
                    "cui": hit[0],
                    "tui": hit[1],
                }
            )
        out.extend(matches_here)
    if not all_spans:
        # PrecisionTermConsumer: drop any span contained in a longer match
        out = [
            m
            for m in out
            if not any(
                (o["begin"] <= m["begin"] and m["end"] <= o["end"] and o is not m)
                for o in out
            )
        ]
    return out
