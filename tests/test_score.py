"""Deterministic scorers + instance builders (U1-U3, X8, X9, W3-W5)."""

import datetime as dt

from hypothesis import given
from hypothesis import strategies as st

from kgpipe.config import LABEL_TO_INVERTED_LABEL
from kgpipe.score import (
    apply_inversion,
    confidence_score,
    conmod_label,
    dtr_label,
    get_dtr_instance,
    get_tlink_instance,
    tlink_label,
)


def test_inversion_involution():
    """X8 property: the inversion map composed with itself is the identity
    on its domain (timeline_delegator.py:53-66)."""
    for label, inv in LABEL_TO_INVERTED_LABEL.items():
        assert LABEL_TO_INVERTED_LABEL[inv] == label


def test_apply_inversion_only_when_timex_precedes():
    assert apply_inversion("before", timex_begin=0, event_begin=10) == "after"
    assert apply_inversion("before", timex_begin=10, event_begin=0) == "before"


def test_tlink_label_cases():
    a = dt.date(2024, 3, 15)
    assert tlink_label("2024-03-20", a) == "before"
    assert tlink_label("2024-03-10", a) == "after"
    assert tlink_label("2024-03-15", a) == "overlap"
    assert tlink_label("2024-W11", a) == "contains-1"   # mid-week anchor
    assert tlink_label("2024-W11", dt.date(2024, 3, 11)) == "begins-on"
    assert tlink_label("2024-W11", dt.date(2024, 3, 17)) == "ends-on"
    assert tlink_label("PAST_REF", a) == "after"
    assert tlink_label("FUTURE_REF", a) == "before"
    assert tlink_label("PRESENT_REF", a) == "overlap"
    assert tlink_label("2024-03-20", None) == "none"


def test_tlink_instance_exact_reference_shape():
    # tokens: 0..9; event at [3,4), timex at [6,7); pad 2
    toks = [f"t{i}" for i in range(10)]
    inst = get_tlink_instance((3, 4), (6, 7), toks)
    # reference slices: [1:3] <e> [3:4] </e> [4:6] <t> [6:7] </t> [7:min(9, 9)]
    assert inst == "t1 t2 <e> t3 </e> t4 t5 <t> t6 </t> t7 t8"


def test_tlink_instance_tail_clamp_quirk():
    # min(len-1, second_end+2) drops the final token when the window would
    # reach the end — reproduced from timeline_delegator.py:214
    toks = ["a", "b", "c", "d", "e"]
    inst = get_tlink_instance((0, 1), (2, 3), toks)
    assert inst == "<e> a </e> b <t> c </t> d"  # 'e' clamped away


def test_tlink_instance_order_independent_tagging():
    toks = [f"t{i}" for i in range(10)]
    # timex first in text: tags swap positions but <e>/<t> stay with spans
    inst = get_tlink_instance((6, 7), (3, 4), toks)
    assert "<t> t3 </t>" in inst and "<e> t6 </e>" in inst


def test_dtr_instance_negative_slice_quirk():
    # event_begin < radius: reference's tokens[eb-10:eb] wraps to the END of
    # the list (Python slice semantics) — reproduced bit-for-bit
    toks = [f"t{i}" for i in range(30)]
    inst = get_dtr_instance(3, 4, toks)
    # 3-10 = -7 -> tokens[-7:3] is empty for len 30
    assert inst.startswith("<e> t3 </e>")


def test_dtr_and_conmod_labels():
    assert dtr_label(["received", "cisplatin"]) == "BEFORE"
    assert dtr_label(["will", "start"]) == "AFTER"
    assert dtr_label(["cisplatin", "stable"]) == "OVERLAP"
    assert conmod_label(["if", "tolerated", "x"], 2) == "HYPOTHETICAL"
    assert conmod_label(["no", "evidence", "x"], 2) == "NEGATED"
    assert conmod_label(["patients", "respond", "x"], 2) == "GENERIC"
    assert conmod_label(["gave", "x"], 1) == "ACTUAL"


def test_confidence_bounds():
    assert 0.01 <= confidence_score(["ac"]) <= 1.0
    assert confidence_score(["liposomal", "doxorubicin"]) == 1.0
    assert confidence_score(["ac"]) < confidence_score(["cisplatin"])


@given(st.sampled_from(sorted(LABEL_TO_INVERTED_LABEL)), st.integers(0, 100), st.integers(0, 100))
def test_apply_inversion_total(label, tb, eb):
    # never raises, output stays in the label algebra
    out = apply_inversion(label, tb, eb)
    assert out in LABEL_TO_INVERTED_LABEL
