"""J1 windowed pairing + TLINK scoring -> tlink triples.

Structured path: the pairing is an equi+band join — equi on
(conv_id, turn_idx), band on the mention's precomputed ±60-token char window
(both timex ends inside the window, get_tlink_window_mentions semantics,
timeline_delegator.py:255-280). Because every upstream stage is keyed on the
same (conv_id, turn_idx), the join reuses the existing exchange; the O(n·m)
cross product is clamped by the band predicate exactly as the reference's
token-window clamp (O4).

Instance strings need the turn's token stream, so pairs are joined back to
the annotated turns (same key again) and assembled in one ``mapInPandas``
over Arrow batches together with the deterministic TLINK scorer + the
inversion rule (X8, timeline_delegator.py:449-455).

``turn_triples`` is the fused per-turn equivalent (zero-shuffle path): one
call produces ALL triples for a turn — tlink, entity-mention, doc-time-rel
(opt-in), speaker-attribution, tool-invocation — with identical results to
the structured path (equality-tested).
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .annotate import annotate_turn
from .config import DEFAULT_CONFIG, PipelineConfig
from .schemas import TRIPLE_SCHEMA
from .score import (
    TLINK_PAD_LENGTH,
    apply_inversion,
    get_tlink_instance,
    tlink_label,
    tokens_for_mode,
)

__all__ = [
    "pair_window",
    "tlink_triples_from_pairs",
    "nearest_anchor_timex",
    "event_event_triples",
    "turn_triples",
]


def pair_window(
    mentions_f: DataFrame,
    timexes_f: DataFrame,
) -> DataFrame:
    """J1: band join of filtered+id'd mentions against normalized+id'd
    timexes within the mention's char window. Returns one row per (mention,
    timex) pair with both spans and ids."""
    m = mentions_f.select(
        "conv_id", "turn_idx", "anchor_date",
        F.col("begin").alias("m_begin"), F.col("end").alias("m_end"),
        F.col("tok_begin").alias("m_tok_begin"), F.col("tok_end").alias("m_tok_end"),
        F.col("surface").alias("m_surface"), F.col("cui").alias("m_cui"),
        F.col("dtr").alias("m_dtr"), F.col("dtr_inst").alias("m_dtr_inst"),
        F.col("annotation_id").alias("m_annotation_id"),
        "win_char_begin", "win_char_end",
    )
    # the uninverted tlink label is a function of the TIMEX row alone
    # (normed value vs the turn anchor), so it is computed here on the
    # timex side — one narrow vectorized UDF over |timexes| rows — and
    # rides the join, instead of running over the ~5x larger pair set
    t = timexes_f.select(
        "conv_id", "turn_idx",
        F.col("begin").alias("t_begin"), F.col("end").alias("t_end"),
        F.col("tok_begin").alias("t_tok_begin"), F.col("tok_end").alias("t_tok_end"),
        F.col("normed").alias("t_normed"),
        F.col("annotation_id").alias("t_annotation_id"),
        _tlink_label_udf()("normed", "anchor_date").alias("t_lab0"),
    )
    return m.join(t, ["conv_id", "turn_idx"]).where(
        F.col("t_begin").between(F.col("win_char_begin"), F.col("win_char_end"))
        & F.col("t_end").between(F.col("win_char_begin"), F.col("win_char_end"))
    )


def _py_slice(arr, a, b):
    """Python-style ``arr[a:b]`` (0-based, end-exclusive, clamped) as a
    Spark slice expression — Spark's slice is 1-based with a non-negative
    length."""
    return F.slice(arr, a + F.lit(1), F.greatest(F.lit(0), b - a))


def _tlink_instance_col(tokens):
    """get_tlink_instance as a pure JVM column expression over the turn's
    token array: identical string algebra (packet sort by begin with the
    event winning ties — Python's stable sort —, pad clamping, and the
    reference's end-exclusive final slice), no Python boundary."""
    e_b, e_e = F.col("m_tok_begin"), F.col("m_tok_end") + F.lit(1)
    t_b, t_e = F.col("t_tok_begin"), F.col("t_tok_end") + F.lit(1)
    event_first = e_b <= t_b
    fb = F.when(event_first, e_b).otherwise(t_b)
    fe = F.when(event_first, e_e).otherwise(t_e)
    fo = F.when(event_first, F.lit("<e>")).otherwise(F.lit("<t>"))
    fc = F.when(event_first, F.lit("</e>")).otherwise(F.lit("</t>"))
    sb = F.when(event_first, t_b).otherwise(e_b)
    se = F.when(event_first, t_e).otherwise(e_e)
    so = F.when(event_first, F.lit("<t>")).otherwise(F.lit("<e>"))
    sc = F.when(event_first, F.lit("</t>")).otherwise(F.lit("</e>"))
    pad = F.lit(TLINK_PAD_LENGTH)
    start = F.greatest(F.lit(0), fb - pad)
    end_i = F.least(F.size(tokens) - F.lit(1), se + pad)
    return F.array_join(
        F.concat(
            _py_slice(tokens, start, fb), F.array(fo),
            _py_slice(tokens, fb, fe), F.array(fc),
            _py_slice(tokens, fe, sb), F.array(so),
            _py_slice(tokens, sb, se), F.array(sc),
            _py_slice(tokens, se, end_i),
        ),
        " ",
    )


def _tlink_label_udf():
    """tlink_label over (normed, anchor) as a vectorized UDF: the
    TimeML-interval parse runs once per DISTINCT (normed, anchor) in the
    Arrow batch (values repeat heavily — a few hundred distinct anchors
    over ~1M pairs at sf0.1), exactly the per-distinct memo shape of the
    event-event scorer."""

    @F.pandas_udf("string")
    def lab(normed: pd.Series, anchor: pd.Series) -> pd.Series:
        cache: dict = {}
        out = []
        for n, a in zip(normed, anchor):
            if n is None:
                # unfiltered timex frames carry normed=NULL for
                # normalization failures; the label stage runs pre-join
                # now, so tolerate them (the pipeline filters them out
                # before pairing — F5 — and 'none' matches tlink_label's
                # unparseable-value arm)
                out.append("none")
                continue
            a2 = None if a is None or a != a else a
            key = (n, a2)
            v = cache.get(key)
            if v is None:
                v = tlink_label(n, a2)
                cache[key] = v
            out.append(v)
        return pd.Series(out)

    return lab


_INVERT_MAP_COL = None


def _invert_map_col():
    from .config import LABEL_TO_INVERTED_LABEL

    global _INVERT_MAP_COL
    if _INVERT_MAP_COL is None:
        _INVERT_MAP_COL = F.create_map(
            *[F.lit(x) for kv in LABEL_TO_INVERTED_LABEL.items() for x in kv]
        )
    return _INVERT_MAP_COL


def tlink_triples_from_pairs(
    pairs: DataFrame,
    toks: DataFrame,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Pairs + turn token streams -> scored tlink triples (TRIPLE_SCHEMA).

    ``toks`` is one row per turn: (conv_id, turn_idx, tok_stream) — the
    kind_rank=2 split of the union frame; tok_stream is the turn's
    \\x1f-joined, <newline>-substituted token stream (tokens_for_mode
    mode="dtr", precomputed at annotate time).

    Everything here is JVM whole-stage codegen except one narrow
    ArrowEvalPython for the label (two columns in, one out, per-distinct
    memoized): the token stream is split ONCE per turn on the toks side,
    the co-partitioned join attaches the array to each pair, and the
    instance string is built by a slice/concat/array_join expression
    (value-identical to get_tlink_instance — pytest-pinned). The previous
    shape collected pair structs per turn and assembled instances in a
    row-at-a-time Python loop; moving the string algebra into codegen
    removed the whole mapInPandas stage (~1.6 s of the structured path at
    sf0.1, plan: MapInPandas -> none)."""
    tok_arr = toks.select(
        "conv_id", "turn_idx",
        F.when(F.col("tok_stream") == "", F.array().cast("array<string>"))
        .otherwise(F.split("tok_stream", "\x1f")).alias("toks_arr"),
    )
    joined = pairs.join(tok_arr, ["conv_id", "turn_idx"])
    label = F.when(
        F.col("t_begin") < F.col("m_begin"),
        F.element_at(_invert_map_col(), F.col("t_lab0")),
    ).otherwise(F.col("t_lab0"))
    out = joined.select(
        F.col("m_annotation_id").alias("subj"),
        F.concat(F.lit("tlink:"), label).alias("pred"),
        F.col("t_annotation_id").alias("obj"),
        "anchor_date", "conv_id", "turn_idx",
        F.col("m_surface").alias("subj_text"),
        F.col("t_normed").alias("obj_text"),
        _tlink_instance_col(F.col("toks_arr")).alias("instance"),
    )
    # exact schema contract (types included) with the previous shape
    return out.select(
        *[F.col(f.name).cast(f.dataType) for f in TRIPLE_SCHEMA.fields]
    )


def nearest_anchor_timex(mentions_f: DataFrame, timexes_f: DataFrame) -> DataFrame:
    """Per mention, the nearest normalized timex inside its ±60-token char
    window (W7 nearest-anchor applied to in-window candidates): smallest
    |timex.begin - mention.begin|, ties to the earlier timex then the lower
    timex_idx. Returns (conv_id, turn_idx, annotation_id, anchor_normed) —
    one row per mention that HAS an in-window timex."""
    m = mentions_f.select(
        "conv_id", "turn_idx",
        F.col("begin").alias("m_begin"),
        "annotation_id", "win_char_begin", "win_char_end",
    )
    t = timexes_f.select(
        "conv_id", "turn_idx",
        F.col("begin").alias("t_begin"), F.col("end").alias("t_end"),
        F.col("timex_idx").alias("t_idx"),
        F.col("normed").alias("anchor_normed"),
    )
    j = m.join(t, ["conv_id", "turn_idx"]).where(
        F.col("t_begin").between(F.col("win_char_begin"), F.col("win_char_end"))
        & F.col("t_end").between(F.col("win_char_begin"), F.col("win_char_end"))
    )
    w = Window.partitionBy("conv_id", "turn_idx", "annotation_id").orderBy(
        F.abs(F.col("t_begin") - F.col("m_begin")), "t_begin", "t_idx"
    )
    return (
        j.withColumn("nr", F.row_number().over(w))
        .where(F.col("nr") == 1)
        .select("conv_id", "turn_idx", "annotation_id", "anchor_normed")
    )


def _ee_label_udf():
    """Interval-algebra label between two TimeML values (the event-event
    analog of the U1 scorer; documented spec, shared with the oracle):
    either side unparseable/missing -> 'none'; disjoint -> 'before'/'after'
    by order; identical -> 'overlap'; one containing the other ->
    'contains' / 'contains-1'; partial overlap -> 'overlap'.

    The regex+date parse (``timeml_interval``) runs ONCE per distinct
    TimeML value in the Arrow batch, not once per pair — anchor values
    repeat heavily (175k pairs over a few hundred distinct anchors at
    sf0.1), so the parse cost is O(distinct), and the interval algebra
    itself is vectorized int64 ordinal comparisons via ``np.select``."""
    import numpy as np  # noqa: F811 (worker-side import)
    import pandas as pd  # noqa: F811 (worker-side import)

    from .timex import timeml_interval

    @F.pandas_udf("string")
    def ee_label(na: pd.Series, nb: pd.Series) -> pd.Series:
        uniq = pd.unique(pd.concat([na, nb], ignore_index=True).dropna())
        cache = {}
        for v in uniq:
            iv = timeml_interval(v) if isinstance(v, str) else None
            # proleptic ordinals: int64-comparable, no Timestamp range limit
            cache[v] = (iv[0].toordinal(), iv[1].toordinal()) if iv else None
        ia = na.map(cache)
        ib = nb.map(cache)
        ok = ia.notna() & ib.notna()
        out = pd.Series(np.full(len(na), "none", dtype=object))
        if ok.any():
            s1 = ia[ok].str[0].to_numpy(dtype=np.int64)
            e1 = ia[ok].str[1].to_numpy(dtype=np.int64)
            s2 = ib[ok].str[0].to_numpy(dtype=np.int64)
            e2 = ib[ok].str[1].to_numpy(dtype=np.int64)
            lab = np.select(
                [
                    e1 < s2,
                    s1 > e2,
                    (s1 == s2) & (e1 == e2),
                    (s1 <= s2) & (e1 >= e2),
                    (s2 <= s1) & (e2 >= e1),
                ],
                ["before", "after", "overlap", "contains", "contains-1"],
                default="overlap",
            )
            out[ok.to_numpy()] = lab
        return out

    return ee_label


def event_event_triples(
    mentions_id: DataFrame, timexes_id: DataFrame
) -> DataFrame:
    """J6: within-turn event-event TLINKs.

    Deleted-neighborhood pairing (timeline_delegator.py:283-288 — every
    OTHER mention of the turn) clamped by the subject's ±60-token char
    window (O4, same clamp as J1): the pair (a, b) is emitted once with
    a = the textually-first mention (mention_idx order, which IS the
    (begin, end) sort), b fully inside a's window. Each side is anchored to
    its nearest in-window timex (W7 nearest-anchor), and the label compares
    the two anchors' TimeML intervals with the interval algebra; the
    subject is textually first, so X8 inversion is the identity by
    construction. All joins key on (conv_id, turn_idx) — the same exchange
    every other stage uses."""
    anchors = nearest_anchor_timex(mentions_id, timexes_id)
    m = mentions_id.join(
        anchors, ["conv_id", "turn_idx", "annotation_id"], "left"
    ).select(
        "conv_id", "turn_idx", "annotation_id", "anchor_date",
        "mention_idx", "begin", "end", "surface",
        "win_char_begin", "win_char_end", "anchor_normed",
    )
    a = m.alias("a")
    b = m.alias("b")
    pairs = a.join(b, ["conv_id", "turn_idx"]).where(
        (F.col("a.mention_idx") < F.col("b.mention_idx"))
        & F.col("b.begin").between(
            F.col("a.win_char_begin"), F.col("a.win_char_end")
        )
        & F.col("b.end").between(
            F.col("a.win_char_begin"), F.col("a.win_char_end")
        )
    )
    label = _ee_label_udf()
    out = pairs.select(
        F.col("a.annotation_id").alias("subj"),
        F.concat(
            F.lit("ee-tlink:"),
            label(F.col("a.anchor_normed"), F.col("b.anchor_normed")),
        ).alias("pred"),
        F.col("b.annotation_id").alias("obj"),
        F.col("a.anchor_date").alias("anchor_date"),
        "conv_id", "turn_idx",
        F.col("a.surface").alias("subj_text"),
        F.col("b.surface").alias("obj_text"),
        F.lit(None).cast("string").alias("instance"),
    )
    return out


# --------------------------------------------------------------------------
# fused path: transcripts -> triples in one narrow pass
# --------------------------------------------------------------------------

def turn_triples(
    conv_id: str,
    turn_idx: int,
    role,
    tool,
    ts,
    text: str,
    gazetteer,
    blacklist,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> List[dict]:
    """All triples for one turn (fused path). Mirrors the structured
    DataFrame algebra exactly; the equality of the two paths is a pytest
    invariant."""
    anchor, (toks_raw, nl_raw), mention_rows, timex_rows = annotate_turn(
        conv_id, turn_idx, text, ts, gazetteer, blacklist, cfg,
        with_token_rows="raw",
    )
    note = f"{conv_id}_{turn_idx}"
    out: List[dict] = []

    def triple(subj, pred, obj, subj_text=None, obj_text=None, instance=None):
        out.append(
            {
                "subj": subj, "pred": pred, "obj": obj,
                "anchor_date": anchor, "conv_id": conv_id, "turn_idx": turn_idx,
                "subj_text": subj_text, "obj_text": obj_text, "instance": instance,
            }
        )

    # speaker-attribution / tool-invocation (graph predicates, column-level)
    if role is not None:
        triple(f"turn@{note}", "speaker-attribution", role)
    if tool:
        triple(f"turn@{note}", "tool-invocation", tool)

    # F1 + F2 + optional F4
    positive = [
        m
        for m in mention_rows
        if m["tui"] == cfg.keep_tui
        and m["surface"].strip().lower() not in blacklist
        and (not cfg.use_conmod or m["conmod"] == "ACTUAL")
    ]
    if not positive:  # F3 empty-doc skip
        return out
    relevant = [t for t in timex_rows if t["normed"] is not None]  # F5

    # W1 annotation ids: mentions ∪ timexes, stable sort by begin
    ann = [(m["begin"], 0, i) for i, m in enumerate(positive)] + [
        (t["begin"], 1, i) for i, t in enumerate(relevant)
    ]
    ann.sort()
    ids = {}
    for rank, (_, kind, i) in enumerate(ann):
        ids[(kind, i)] = f"{rank}@e@{note}@system"

    tokens = tokens_for_mode(toks_raw, nl_raw, "dtr")
    # the (normed, anchor) -> label map is per-TIMEX, not per-pair: compute
    # once per turn instead of once per (mention, timex) combination
    label_by_timex = [tlink_label(t["normed"], anchor) for t in relevant]
    for mi, m in enumerate(positive):
        m_id = ids[(0, mi)]
        triple(
            m_id, "entity-mention", m["cui"],
            subj_text=m["surface"], obj_text=m["term"], instance=None,
        )
        if cfg.use_dtr:
            triple(
                m_id, "doc-time-rel", m["dtr"],
                subj_text=m["surface"], instance=m["dtr_inst"],
            )
        for ti, t in enumerate(relevant):
            inside = (
                m["win_char_begin"] <= t["begin"] <= m["win_char_end"]
                and m["win_char_begin"] <= t["end"] <= m["win_char_end"]
            )
            if not inside:
                continue
            inst = get_tlink_instance(
                (m["tok_begin"], m["tok_end"] + 1),
                (t["tok_begin"], t["tok_end"] + 1),
                tokens,
            )
            label = apply_inversion(
                label_by_timex[ti], t["begin"], m["begin"]
            )
            triple(
                m_id, "tlink:" + label, ids[(1, ti)],
                subj_text=m["surface"], obj_text=t["normed"], instance=inst,
            )
    return out


def fused_triples(
    transcripts: DataFrame,
    gazetteer,
    blacklist,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """transcripts -> triples in ONE narrow mapInPandas pass (no shuffle
    anywhere). This is the 100-TB scale path: throughput is bounded only by
    scan + CPU, partitions never exchange."""
    spark = transcripts.sparkSession
    bc = spark.sparkContext.broadcast((gazetteer, blacklist, cfg))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gaz, bl, c = bc.value
        for pdf in batches:
            rows: List[dict] = []
            for r in pdf.itertuples(index=False):
                ts = None if pd.isna(r.ts) else r.ts
                rows.extend(
                    turn_triples(
                        r.conv_id, r.turn_idx, r.role, r.tool, ts, r.text, gaz, bl, c
                    )
                )
            yield pd.DataFrame(
                rows, columns=TRIPLE_SCHEMA.fieldNames()
            ) if rows else pd.DataFrame(
                {k: [] for k in TRIPLE_SCHEMA.fieldNames()}
            )

    cols = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    return transcripts.select(*cols).mapInPandas(gen, schema=TRIPLE_SCHEMA)
