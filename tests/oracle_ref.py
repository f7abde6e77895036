"""Single-process, doc-at-a-time oracle mirroring the REFERENCE dataflow
shape (timeline_delegator.py process/_write_actual_proc_mentions: explicit
loops, dict-based id assignment, generator windowing) — deliberately NOT the
vectorized/distributed code paths under test.

Shared with the pipeline are only the per-turn primitives that ARE the spec
(tokenizer, gazetteer matcher, timex detect/normalize, scorers); everything
the Spark code distributes — filters, id enumeration, char-window pairing,
inversion, row assembly — is re-implemented here in reference style so the
golden P/R test exercises the dataflow, not a tautology (SURVEY.md §7.4.1).
"""

from __future__ import annotations

from itertools import chain

from kgpipe.annotate import anchor_for, full_anchor_for
from kgpipe.config import LABEL_TO_INVERTED_LABEL, PipelineConfig
from kgpipe.score import (
    confidence_score,
    conmod_label,
    dtr_label,
    get_conmod_instance,
    get_dtr_instance,
    get_tlink_instance,
    tlink_label,
    tokens_for_mode,
)
from kgpipe.text import (
    covering_sentence,
    match_gazetteer,
    sentence_spans,
    tokenize,
)
from kgpipe.timex import detect_timexes, normalize_timex


def _invert_map(token_map):
    begin_map, end_map = {}, {}
    for idx, (b, e) in enumerate(token_map):
        begin_map[b] = idx
        end_map[e] = idx
    return begin_map, end_map


def _window_timexes(event, relevant_timexes, begin2token, end2token, token2char, max_dist):
    """get_tlink_window_mentions re-implemented verbatim
    (timeline_delegator.py:255-280)."""
    ev_b = begin2token[event["begin"]]
    ev_e = end2token[event["end"]]
    wb = max(0, ev_b - max_dist)
    we = min(len(token2char) - 1, ev_e + max_dist)
    cb = token2char[wb][0]
    ce = token2char[we][1]
    for t in relevant_timexes:
        if cb <= t["begin"] <= ce and cb <= t["end"] <= ce:
            yield t


def process_turn(conv_id, turn_idx, role, tool, ts, text, gazetteer, blacklist, cfg: PipelineConfig):
    """One turn -> list of triple dicts, reference-style."""
    text = text or ""
    note = f"{conv_id}_{turn_idx}"
    anchor = anchor_for(ts, text)
    anchor_full = full_anchor_for(ts, anchor)
    rows = []

    def emit(subj, pred, obj, subj_text=None, obj_text=None, instance=None):
        rows.append(
            dict(subj=subj, pred=pred, obj=obj, anchor_date=anchor,
                 conv_id=conv_id, turn_idx=turn_idx, subj_text=subj_text,
                 obj_text=obj_text, instance=instance)
        )

    if role is not None:
        emit(f"turn@{note}", "speaker-attribution", role)
    if tool:
        emit(f"turn@{note}", "tool-invocation", tool)

    tokens_raw, token_map, nl_flags = tokenize(text)
    begin2token, end2token = _invert_map(token_map)
    sents = sentence_spans(text)
    dtr_tokens = tokens_for_mode(tokens_raw, nl_flags, "dtr")
    conmod_tokens = tokens_for_mode(tokens_raw, nl_flags, "conmod")

    # mention detection + F1/F2 (+F4) — reference process() loop shape
    proc_mentions = []
    for m in sorted(
        match_gazetteer(tokens_raw, token_map, nl_flags, gazetteer,
                        min_span=cfg.min_term_span, all_spans=cfg.all_spans),
        key=lambda m: (m["begin"], m["end"]),
    ):
        if m["tui"] != cfg.keep_tui:
            continue  # F1
        covered = text[m["begin"]:m["end"]]
        if covered.strip().lower() in blacklist:
            continue  # F2 (EventFilter exact equality)
        if cfg.use_conmod:
            sent = covering_sentence(sents, m["begin"], m["end"])
            if sent is not None:
                sb = begin2token.get(sent[0], 0)
                se = end2token.get(sent[1], len(tokens_raw) - 1) + 1
            else:
                sb, se = 0, len(tokens_raw)
            if conmod_label(conmod_tokens[sb:se], m["tok_begin"] - sb) != "ACTUAL":
                continue  # F4
        proc_mentions.append(m)

    if len(proc_mentions) == 0:
        return rows  # F3 skip

    # F5: relevant timexes
    relevant_timexes = []
    for t in detect_timexes(text):
        normed = normalize_timex(t["surface"], t["kind"], anchor_full)
        if normed is not None:
            t = dict(t, normed=normed)
            relevant_timexes.append(t)

    # W1: annotation id dict over chain(mentions, timexes) sorted by begin
    annotation_ids = {}
    for index, annotation in enumerate(
        sorted(
            chain.from_iterable((proc_mentions, relevant_timexes)),
            key=lambda a: a["begin"],
        )
    ):
        annotation_ids[id(annotation)] = f"{index}@e@{note}@system"

    for chemo in proc_mentions:
        chemo_text = text[chemo["begin"]:chemo["end"]].replace("\n", "")
        emit(annotation_ids[id(chemo)], "entity-mention", chemo["cui"],
             subj_text=chemo_text, obj_text=chemo["term"])
        if cfg.use_dtr:
            inst = get_dtr_instance(chemo["tok_begin"], chemo["tok_end"] + 1, dtr_tokens)
            ctx = dtr_tokens[max(0, chemo["tok_begin"] - cfg.dtr_window_radius):
                             chemo["tok_end"] + 1 + cfg.dtr_window_radius]
            emit(annotation_ids[id(chemo)], "doc-time-rel", dtr_label(ctx),
                 subj_text=chemo_text, instance=inst)
        for timex in _window_timexes(
            chemo, relevant_timexes, begin2token, end2token, token_map,
            cfg.max_tlink_distance,
        ):
            inst = get_tlink_instance(
                (chemo["tok_begin"], chemo["tok_end"] + 1),
                (begin2token[timex["begin"]], end2token[timex["end"]] + 1),
                dtr_tokens,
            )
            label = tlink_label(timex["normed"], anchor)
            if timex["begin"] < chemo["begin"]:
                label = LABEL_TO_INVERTED_LABEL[label]
            emit(annotation_ids[id(chemo)], "tlink:" + label,
                 annotation_ids[id(timex)],
                 subj_text=chemo_text, obj_text=timex["normed"], instance=inst)
    return rows


def process_corpus(transcripts_pdf, gazetteer, blacklist, cfg: PipelineConfig):
    """pandas transcripts -> list of triple dicts (whole corpus)."""
    import pandas as pd

    out = []
    for r in transcripts_pdf.itertuples(index=False):
        ts = None if pd.isna(r.ts) else r.ts
        out.extend(
            process_turn(r.conv_id, r.turn_idx, r.role, r.tool, ts, r.text,
                         gazetteer, blacklist, cfg)
        )
    return out
