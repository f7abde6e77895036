"""Timenorm-style component accuracy report (Evaluator.scala:8-42 analog).

The reference ships an evaluator that normalizes a TSV of timexes against
gold values and prints count/accuracy statistics; this is the same harness
for the rule library: a gold TSV (surface <TAB> anchor date <TAB> expected
TimeML value, empty value = expected normalization failure) is run through
``detect_timexes`` + ``normalize_timex`` and the per-kind + overall accuracy
lands as a JSON artifact (default ``reports/timenorm_accuracy.json``).

Wired into CI via tests/test_timenorm_eval.py (accuracy must be 1.0 on the
curated gold — every deviation is a rule regression, since the gold encodes
the documented spec).

Usage: python tools/timenorm_eval.py [gold.tsv] [--out report.json]
"""

from __future__ import annotations

import datetime as dt
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from kgpipe.timex import detect_timexes, normalize_timex  # noqa: E402

DEFAULT_GOLD = os.path.join(REPO, "tests", "data", "timenorm_gold.tsv")
DEFAULT_OUT = os.path.join(REPO, "reports", "timenorm_accuracy.json")


def load_gold(path: str):
    rows = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            surface, anchor, value = line.split("\t")
            # a "T" in the anchor marks a FULL timestamp (sub-day kinds
            # normalize against the turn's time of day)
            parsed = (
                dt.datetime.fromisoformat(anchor)
                if "T" in anchor
                else dt.date.fromisoformat(anchor)
            )
            rows.append((surface, parsed, value or None))
    return rows


def evaluate(gold_rows):
    per_kind: dict[str, dict] = {}
    details = []
    correct = 0
    for surface, anchor, want in gold_rows:
        dets = detect_timexes(surface)
        if not dets:
            kind, got = "(undetected)", None
        else:
            # evaluate the span that covers the surface (longest)
            d = max(dets, key=lambda x: x["end"] - x["begin"])
            kind = d["kind"]
            got = normalize_timex(d["surface"], d["kind"], anchor)
        ok = got == want
        correct += ok
        bucket = per_kind.setdefault(kind, {"n": 0, "correct": 0})
        bucket["n"] += 1
        bucket["correct"] += ok
        if not ok:
            details.append(
                {"surface": surface, "anchor": anchor.isoformat(),
                 "kind": kind, "gold": want, "system": got}
            )
    for b in per_kind.values():
        b["accuracy"] = b["correct"] / b["n"]
    return {
        "n_timexes": len(gold_rows),
        "n_correct": correct,
        "n_errors": len(gold_rows) - correct,
        "accuracy": correct / len(gold_rows) if gold_rows else 1.0,
        "by_kind": dict(sorted(per_kind.items())),
        "errors": details,
    }


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    out = DEFAULT_OUT
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i:i + 2]
    gold = argv[0] if argv else DEFAULT_GOLD
    report = evaluate(load_gold(gold))
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w", encoding="utf-8") as f:
        json.dump(report, f, indent=2)
    print(
        f"timexes: {report['n_timexes']}  correct: {report['n_correct']}  "
        f"errors: {report['n_errors']}  accuracy: {report['accuracy']:.4f}"
    )
    print(f"report: {out}")
    return 0 if report["n_errors"] == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
