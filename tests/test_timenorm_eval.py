"""CI wiring for the timenorm-style accuracy report (Evaluator.scala
analog): the curated gold TSV must normalize at accuracy 1.0 — the gold
encodes the documented rule spec, so any miss is a regression — and the
JSON artifact must land with the per-kind breakdown."""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_accuracy_report(tmp_path):
    from timenorm_eval import DEFAULT_GOLD, evaluate, load_gold, main

    gold = load_gold(DEFAULT_GOLD)
    assert len(gold) >= 60  # every implemented kind represented
    report = evaluate(gold)
    assert report["accuracy"] == 1.0, report["errors"]
    # per-kind coverage: all round-1 + round-2 kinds appear in the gold
    kinds = set(report["by_kind"])
    assert {
        "slash_date", "iso_date", "month_day_year", "month_year",
        "bare_year", "quarter_year", "rel_unit", "rel_weekday", "weekday",
        "rel_day", "ago", "in_n", "past_ref", "future_ref", "present_ref",
        "season_year", "rel_season", "decade", "week_of", "time_of_day",
        "period_set", "month_day", "holiday", "day_offset", "clock_time",
        "word_year", "frac_period", "span_set",
    } <= kinds, kinds

    out = tmp_path / "acc.json"
    assert main([DEFAULT_GOLD, "--out", str(out)]) == 0
    data = json.loads(out.read_text())
    assert data["n_errors"] == 0 and data["by_kind"]
