"""Deterministic replacement scorers for the reference's three HF classifiers
plus the exact instance-string builders they consume.

The reference scores tagged token windows with pubmedbert_{tlink,dtr,conmod}
(timeline_delegator.py:68-72,310-317); the model weights are stripped from
the repo (.MISSING_LARGE_BLOBS), so the deterministic scorer below IS the
spec: the same rules run inside the Spark pipeline and inside the
single-process test oracle, making P/R a test of the dataflow (windows,
filters, inversion, ids, ordering) exactly as SURVEY.md §7.4 prescribes.

Instance builders reproduce the reference token-window assembly verbatim,
including its Python slicing quirks:
* get_dtr_instance — timeline_delegator.py:236-252 (note: a negative
  ``event_begin - radius`` slice start wraps from the end of the token list;
  reproduced as-is for instance-string parity);
* get_tlink_instance — timeline_delegator.py:180-233 (2-token pad, tagged
  first/second spans sorted by position, final slice bounded by
  ``min(len(tokens)-1, ...)`` which drops the last token — reproduced as-is);
* get_conmod_instance — timeline_delegator.py:154-168 (covering sentence,
  ``<cr>`` newline sentinel).

All scorers are pure and vectorization-friendly (no I/O, no model state); in
Spark they run inside Arrow batches.
"""

from __future__ import annotations

import datetime as dt
from typing import List, Optional, Sequence, Tuple

from .config import LABEL_TO_INVERTED_LABEL
from .text import CONMOD_NEWLINE_SENTINEL, NEWLINE_SENTINEL
from .timex import timeml_interval

__all__ = [
    "tokens_for_mode",
    "get_dtr_instance",
    "get_tlink_instance",
    "get_conmod_instance",
    "tlink_label",
    "apply_inversion",
    "dtr_label",
    "conmod_label",
    "confidence_score",
]

DTR_WINDOW_RADIUS = 10
TLINK_PAD_LENGTH = 2

_PAST_MARKERS = frozenset(
    {"received", "completed", "finished", "was", "were", "had", "prior", "previous"}
)
_FUTURE_MARKERS = frozenset(
    {"will", "plan", "planned", "scheduled", "upcoming", "start", "starting", "begin"}
)
_HYPO_MARKERS = frozenset({"if", "consider", "considering", "possible", "possibly", "may", "might", "option"})
_NEG_MARKERS = frozenset({"no", "not", "denies", "denied", "without", "never"})
_GENERIC_MARKERS = frozenset({"patients", "typically", "generally", "usually"})


def tokens_for_mode(tokens: Sequence[str], newline_flags: Sequence[bool], mode: str) -> List[str]:
    """Substitute the per-mode newline sentinel (<cr> for conmod, <newline>
    otherwise) — tokens_and_map mode switch (timeline_delegator.py:87)."""
    sentinel = CONMOD_NEWLINE_SENTINEL if mode == "conmod" else NEWLINE_SENTINEL
    return [sentinel if nl else t for t, nl in zip(tokens, newline_flags)]


def get_dtr_instance(tok_begin: int, tok_end_excl: int, tokens: Sequence[str]) -> str:
    str_builder = (
        list(tokens[tok_begin - DTR_WINDOW_RADIUS : tok_begin])
        + ["<e>"]
        + list(tokens[tok_begin:tok_end_excl])
        + ["</e>"]
        + list(tokens[tok_end_excl : tok_end_excl + DTR_WINDOW_RADIUS])
    )
    return " ".join(str_builder)


def get_tlink_instance(
    event_span: Tuple[int, int],
    timex_span: Tuple[int, int],
    tokens: Sequence[str],
) -> str:
    """event/timex spans are (tok_begin, tok_end_exclusive) token indices."""
    event_packet = (event_span[0], event_span[1], ("<e>", "</e>"))
    timex_packet = (timex_span[0], timex_span[1], ("<t>", "</t>"))
    first_packet, second_packet = sorted(
        (event_packet, timex_packet), key=lambda s: s[0]
    )
    first_begin, first_end, (first_open, first_close) = first_packet
    second_begin, second_end, (second_open, second_close) = second_packet
    start_token_idx = max(0, first_begin - TLINK_PAD_LENGTH)
    end_token_idx = min(len(tokens) - 1, second_end + TLINK_PAD_LENGTH)
    str_builder = (
        list(tokens[start_token_idx:first_begin])
        + [first_open]
        + list(tokens[first_begin:first_end])
        + [first_close]
        + list(tokens[first_end:second_begin])
        + [second_open]
        + list(tokens[second_begin:second_end])
        + [second_close]
        + list(tokens[second_end:end_token_idx])
    )
    return " ".join(str_builder)


def get_conmod_instance(
    tok_begin: int, tok_end_excl: int, sent_tok_begin: int, sent_tok_end_excl: int,
    tokens: Sequence[str],
) -> str:
    """Covering-sentence window with the event tagged; token indices are
    absolute, sentence bounds select the sub-window."""
    rel_begin = tok_begin - sent_tok_begin
    rel_end = tok_end_excl - sent_tok_begin
    sent = list(tokens[sent_tok_begin:sent_tok_end_excl])
    str_builder = (
        sent[:rel_begin] + ["<e>"] + sent[rel_begin:rel_end] + ["</e>"] + sent[rel_end:]
    )
    return " ".join(str_builder)


def tlink_label(normed_value: str, anchor: Optional[dt.date]) -> str:
    """Canonical (event REL timex) label from the timex's TimeML interval vs
    the event's anchor date (the turn date ≙ DCT — the deterministic analog
    of the reference's contextual classifier).

    Rules (documented spec, shared with the oracle):
      REF pseudo-values: PAST_REF -> 'after', FUTURE_REF -> 'before',
        PRESENT_REF -> 'overlap'.
      interval [s, e]: anchor < s -> 'before'; anchor > e -> 'after';
        single-day interval -> 'overlap';
        anchor == s -> 'begins-on'; anchor == e -> 'ends-on';
        strictly inside a multi-day interval -> 'contains-1'
        (the timex interval contains the event).
      unparseable value or missing anchor -> 'none'.
    """
    interval = timeml_interval(normed_value)
    if interval is None:
        return {
            "PAST_REF": "after",
            "FUTURE_REF": "before",
            "PRESENT_REF": "overlap",
        }.get(normed_value, "none")
    if anchor is None:
        return "none"
    start, end = interval
    if anchor < start:
        return "before"
    if anchor > end:
        return "after"
    if start == end:
        return "overlap"
    if anchor == start:
        return "begins-on"
    if anchor == end:
        return "ends-on"
    return "contains-1"


def apply_inversion(label: str, timex_begin: int, event_begin: int) -> str:
    """Invert the label when the timex precedes the event in text
    (timeline_delegator.py:449-455)."""
    if timex_begin < event_begin:
        return LABEL_TO_INVERTED_LABEL[label]
    return label


def dtr_label(context_tokens: Sequence[str]) -> str:
    """Document-time relation from the ±10-token context window: future
    markers -> AFTER, else past markers -> BEFORE, else OVERLAP."""
    toks = {t.lower() for t in context_tokens}
    if toks & _FUTURE_MARKERS:
        return "AFTER"
    if toks & _PAST_MARKERS:
        return "BEFORE"
    return "OVERLAP"


def conmod_label(sentence_tokens: Sequence[str], rel_event_begin: int) -> str:
    """Contextual modality from the covering sentence: hypothetical markers
    anywhere -> HYPOTHETICAL; negation within the 3 tokens immediately before
    the event -> NEGATED; generic markers -> GENERIC; else ACTUAL."""
    toks = [t.lower() for t in sentence_tokens]
    tok_set = set(toks)
    if tok_set & _HYPO_MARKERS:
        return "HYPOTHETICAL"
    lead = toks[max(0, rel_event_begin - 3) : rel_event_begin]
    if set(lead) & _NEG_MARKERS:
        return "NEGATED"
    if tok_set & _GENERIC_MARKERS:
        return "GENERIC"
    return "ACTUAL"


def confidence_score(token_texts: Sequence[str]) -> float:
    """Mention confidence, the deterministic analog of
    AnnotationConfidencer.java:45-86: ``max(1, 100 - posDeficit -
    lengthDeficit) / 100`` where posDeficit = 20 iff the mention is a single
    short (ambiguous) token, and lengthDeficit grows as the shortest
    component token shrinks."""
    lens = [len(t) for t in token_texts] or [0]
    pos_deficit = 20 if (len(lens) == 1 and lens[0] < 4) else 0
    length_deficit = max(0, 8 - min(lens)) * 2
    return max(1, 100 - pos_deficit - length_deficit) / 100.0
