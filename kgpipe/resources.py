"""Broadcastable side data: gazetteer (entity dictionary) and blacklist.

Mirrors the reference's dictionary-lookup inputs:
* gazetteer: ``CUI|TUI|term`` BSV rows (unified_gold_dev.bsv via
  Unified_Gold_Dev.xml, BsvRareWordDictionary) — here a plain loader plus a
  deterministic built-in fixture; any ``CUI|TUI|term`` file loads the same way
  (one dictionary abstraction, two loaders — covers the HSQLDB alt source S4).
* blacklist: newline-separated terms, trimmed + lowercased, exact-equality
  filter semantics (EventFilter.java:100-134).

Both are tiny dimensions -> shipped as broadcast variables / broadcast join
sides, never shuffled (SURVEY.md §2.1 S2/S3).
"""

from __future__ import annotations

import io
from dataclasses import dataclass

__all__ = [
    "Gazetteer",
    "load_gazetteer_bsv",
    "load_blacklist",
    "builtin_gazetteer_rows",
    "builtin_blacklist_terms",
    "BUILTIN_KEEP_TUI",
]

BUILTIN_KEEP_TUI = "T061"


@dataclass(frozen=True)
class Gazetteer:
    """Immutable term dictionary keyed by lowercased, space-joined token text.

    ``terms`` maps normalized term -> (cui, tui). ``max_tokens`` bounds the
    n-gram candidate length during lookup (the reference's rare-word index
    bounds probes the same way; a broadcast dict probe is O(1) so a plain
    bound suffices).
    """

    terms: dict  # str -> tuple[str, str]
    max_tokens: int
    first_words: frozenset = frozenset()
    # first_words is the matcher's fast path — the analog of the reference's
    # rare-word index (BsvRareWordDictionary, gazetteer.xml:26-31): a token
    # not opening any term skips the n-gram probe loop entirely, so lookup
    # cost is one set test per token for the overwhelmingly common miss case.

    @staticmethod
    def from_rows(rows):
        terms = {}
        max_tokens = 1
        for cui, tui, term in rows:
            norm = " ".join(term.lower().split())
            if not norm:
                continue
            terms[norm] = (cui, tui)
            max_tokens = max(max_tokens, len(norm.split()))
        first = frozenset(t.split(" ", 1)[0] for t in terms)
        return Gazetteer(terms=terms, max_tokens=max_tokens, first_words=first)


def load_gazetteer_bsv(path_or_text: str, *, is_text: bool = False) -> Gazetteer:
    """Load ``CUI|TUI|term`` rows (comment lines starting with ``#`` skipped)."""
    if is_text:
        fh = io.StringIO(path_or_text)
    else:
        fh = open(path_or_text, "r", encoding="utf-8")
    rows = []
    with fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("|")
            if len(parts) < 3:
                continue
            rows.append((parts[0], parts[1], parts[2]))
    return Gazetteer.from_rows(rows)


def load_blacklist(path_or_text: str, *, is_text: bool = False):
    """Newline-separated filter terms -> frozenset of trimmed lowercase terms
    (EventFilter.java:114-134 semantics)."""
    if is_text:
        lines = path_or_text.splitlines()
    else:
        with open(path_or_text, "r", encoding="utf-8") as fh:
            lines = fh.readlines()
    return frozenset(t.strip().lower() for t in lines if t.strip())


def builtin_gazetteer_rows():
    """Deterministic built-in dictionary fixture.

    Shape mirrors the reference BSV (single shared CUI per cluster is allowed;
    the reference uses '000' for every row): multi-word terms, misspellings,
    surface variants of one concept (canonicalization fixture), and a few
    non-T061 rows to exercise the TUI filter (F1). Domain-neutral: a clinical
    cluster (parity with the reference's chemo gazetteer) plus a
    data-engineering cluster (matches the synthetic driver corpus vocabulary).
    """
    rows = [
        # concept C001: fluorouracil surface variants (canonicalization test)
        ("C001", "T061", "5fu"),
        ("C001", "T061", "5-fu"),
        ("C001", "T061", "5-fluorouracil"),
        ("C001", "T061", "fluorouracil"),
        # concept C002: multi-word + misspelling variants
        ("C002", "T061", "liposomal doxorubicin"),
        ("C002", "T061", "doxorubicin"),
        ("C002", "T061", "doxorubicine"),
        # other single-concept terms
        ("C003", "T061", "cisplatin"),
        ("C004", "T061", "carboplatin"),
        ("C005", "T061", "oxaliplatin"),
        ("C006", "T061", "eloxatin"),
        ("C007", "T061", "folfox"),
        ("C008", "T061", "folfiri"),
        ("C009", "T061", "xelox"),
        ("C010", "T061", "capecitabine"),
        ("C011", "T061", "gemcitabine"),
        ("C012", "T061", "paclitaxel"),
        ("C013", "T061", "taxol"),
        ("C014", "T061", "docetaxel"),
        ("C015", "T061", "irinotecan"),
        ("C016", "T061", "cpt-11"),
        ("C017", "T061", "etoposide"),
        ("C018", "T061", "ipilimumab"),
        ("C019", "T061", "panitumumab"),
        ("C020", "T061", "interferon"),
        ("C020", "T061", "alpha interferon"),
        ("C020", "T061", "alpha 2b interferon"),
        ("C021", "T061", "interleukin"),
        ("C021", "T061", "interleukin-2"),
        ("C021", "T061", "interleukin 2"),
        ("C022", "T061", "chemotherapy"),
        ("C022", "T061", "chemo"),
        ("C022", "T061", "chmeo"),  # misspelling variant (reference-style)
        ("C022", "T061", "chemotherapies"),
        ("C023", "T061", "radiochemotherapy"),
        ("C023", "T061", "chemort"),
        # blacklist collisions: terms the gazetteer matches but the
        # blacklist removes again (F2 must fire after J4)
        ("C024", "T061", "ac"),
        ("C025", "T061", "ice"),
        ("C026", "T061", "cap"),
        # non-T061 rows: matched by the dictionary, dropped by F1
        ("C900", "T121", "aspirin"),
        ("C901", "T109", "glucose"),
        ("C902", "T047", "diabetes"),
        # data-engineering cluster (driver-corpus vocabulary)
        ("C101", "T061", "spark"),
        ("C102", "T061", "hash join"),
        ("C103", "T061", "sort merge"),
        ("C104", "T061", "window"),
        ("C105", "T061", "vector"),
        ("C106", "T061", "table scan"),
        ("C900", "T121", "batch"),  # non-T061 in driver vocab too
    ]
    return rows


def builtin_blacklist_terms():
    """Built-in filter-list fixture (EventFilter semantics: exact equality on
    trimmed lowercase covered text)."""
    return frozenset(
        {
            "ac",
            "ca",
            "ice",
            "cap",
            "pt",
            "echo",
            "av",
            "bid",
            "cat",
            "calf",
            "cc",
            "bp",
        }
    )
