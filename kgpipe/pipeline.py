"""End-to-end composition: transcripts -> triples / nodes / edges.

Two equivalent execution plans (equality-tested):

* ``build_triples(..., fused=False)`` — structured: every SURVEY.md §2
  operator is a visible DataFrame op, in the one-pass union shape (the
  annotate stage emits mention/timex/token rows directly in the merged W1
  schema). Plan shape — ONE hash exchange total (plan-asserted in PLANS.md):

      scan -> mapInPandas(annotate -> union rows)         [narrow]
        -> F1 predicate, F2 broadcast anti-join, F5       [narrow]
        -> W1 row_number window   ── one exchange on (conv_id, turn_idx)
        -> persist; kind splits are co-partitioned views of the cache
        -> J1 band join + pair groupBy + token join       [zero exchanges]
        -> instance/score mapInPandas
        -> union with attribution/entity/dtr projections

* ``build_triples(..., fused=True)`` — one narrow mapInPandas, zero
  shuffles; the 10^12-turn scale path (scan-bound, embarrassingly parallel).

The O1 semi-join gate (normalize timexes only for turns that have a
surviving entity mention — TimeMentionNormalizer.java:104-117,
Timelines.piper:32-35) is inherent here: annotation runs in one fused pass
per turn, and downstream joins are inner on turns with mentions, so
timex-only turns never reach pairing/scoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .config import DEFAULT_CONFIG, PipelineConfig
from .extract import (
    annotate_transcripts,
    assign_annotation_ids,
    filter_mentions,
    filter_timexes,
    mentions_table,
    timexes_table,
)
from .graph import (
    attribution_triples,
    cross_turn_event_edges,
    dtr_triples,
    entity_mention_triples,
)
from .pair import fused_triples, pair_window, tlink_triples_from_pairs

__all__ = [
    "build_annotations",
    "build_triples",
    "build_graph",
    "summarized_timelines",
    "ntriples_view",
]


def build_annotations(
    transcripts: DataFrame,
    gazetteer,
    blacklist,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    persist: bool = True,
    timexes: bool = True,
):
    """Structured intermediate tables. Returns dict with annotated /
    mentions_raw / mentions / timexes (filtered+id'd).

    ``annotated`` is the expensive Arrow-UDF stage and the DAG diamonds off
    it (mentions, timexes, and the pair->token join all consume it), so it is
    persisted MEMORY_AND_DISK by default — otherwise Spark re-runs the
    annotation pass once per branch (measured 5x wall on the structured
    plan at sf0.1).

    ``timexes=False`` is the mentions-only fast path: timex detection is
    skipped inside the Arrow UDF and the returned dict carries ONLY
    annotated / mentions_raw / mentions_f — no timex tables and no
    annotation ids (the W1 id window ranks mentions and timexes together,
    so ids from a timex-free pass would disagree with the full pipeline's;
    omitting the keys makes that misuse impossible)."""
    if not timexes:
        # flat mentions-only annotate (MENTION_ROWS_SCHEMA): value-identical
        # rows to mentions_table(annotated) with ~5x less Arrow payload (no
        # token structs / text / passthroughs cross the Python boundary).
        # ``annotated`` stays available as a lazy plan for callers that
        # genuinely want the nested frame in this mode.
        from .extract import annotate_mention_rows

        annotated = annotate_transcripts(
            transcripts, gazetteer, blacklist, cfg, with_timexes=False
        )
        mentions_raw = annotate_mention_rows(
            transcripts, gazetteer, blacklist, cfg
        )
        if persist:
            from pyspark import StorageLevel

            mentions_raw = mentions_raw.persist(StorageLevel.MEMORY_AND_DISK)
        return {
            "annotated": annotated,
            "mentions_raw": mentions_raw,
            "mentions_f": filter_mentions(mentions_raw, blacklist, cfg),
        }
    annotated = annotate_transcripts(
        transcripts, gazetteer, blacklist, cfg, with_timexes=timexes
    )
    if persist:
        from pyspark import StorageLevel

        annotated = annotated.persist(StorageLevel.MEMORY_AND_DISK)
    mentions_raw = mentions_table(annotated)
    timexes_raw = timexes_table(annotated)
    mentions_f = filter_mentions(mentions_raw, blacklist, cfg)
    timexes_f = filter_timexes(timexes_raw)
    # cache=persist: the W1 id window (union -> exchange -> sort -> window)
    # otherwise re-executes once per consumer — entity triples, both pairing
    # sides (measured 3x subtree wall at sf0.1)
    mentions_id, timexes_id = assign_annotation_ids(
        mentions_f, timexes_f, cache=persist
    )
    return {
        "annotated": annotated,
        "mentions_raw": mentions_raw,
        "timexes_raw": timexes_raw,
        # pre-id filtered mentions: consumers that never read annotation_id
        # (rollups, cross-turn edges, canonicalization) take this and skip
        # the W1 window exchange entirely
        "mentions_f": mentions_f,
        "timexes_f": timexes_f,
        "mentions": mentions_id,
        "timexes": timexes_id,
    }


def build_triples(
    transcripts: DataFrame,
    gazetteer,
    blacklist,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    fused: bool = False,
) -> DataFrame:
    """transcripts -> all triples (tlink + entity-mention + doc-time-rel
    (opt-in) + speaker-attribution + tool-invocation)."""
    if cfg.salt_partitions > 0:
        # salted repartition on hash(conv_id, turn_idx): a hot conversation's
        # turns scatter across all executors before the (embarrassingly
        # parallel) annotation stage instead of staying in one input split
        from .skew import spread_by_turn

        transcripts = spread_by_turn(transcripts, cfg.salt_partitions)
    if fused:
        return fused_triples(transcripts, gazetteer, blacklist, cfg)

    # One-pass structured shape: annotate emits mention/timex/token rows in
    # the merged union schema, filters (F1/F2/F4/F5) and the W1 window stay
    # visible operators, and the path pays exactly ONE exchange (the window)
    # and ONE persist. All downstream joins key on (conv_id, turn_idx) and
    # read co-partitioned splits of the same cached frame, so the band join,
    # the pair groupBy and the token join add zero exchanges.
    from pyspark import StorageLevel

    from .extract import annotate_union, assign_union_ids, filter_union

    union = assign_union_ids(
        filter_union(annotate_union(transcripts, gazetteer, blacklist, cfg),
                     blacklist, cfg)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    mentions_id = union.where(F.col("kind_rank") == 0)
    timexes_id = union.where(F.col("kind_rank") == 1)
    toks = union.where(F.col("kind_rank") == 2)

    # F3 (empty-doc skip) + O1 (entity gate on timex work) fall out of the
    # inner equi-join in pair_window: timexes of mention-less turns never
    # reach instance assembly or scoring.
    pairs = pair_window(mentions_id, timexes_id)
    tlink = tlink_triples_from_pairs(pairs, toks, cfg)

    out = attribution_triples(transcripts).unionByName(
        entity_mention_triples(mentions_id)
    )
    if cfg.use_dtr:
        out = out.unionByName(dtr_triples(mentions_id))
    return out.unionByName(tlink)


def build_graph(
    transcripts: DataFrame,
    gazetteer,
    blacklist,
    cfg: PipelineConfig = DEFAULT_CONFIG,
):
    """Full graph materialization inputs: triples + cross-turn edges +
    canonical nodes. Returns dict of DataFrames."""
    from .canon import canonical_nodes  # local import: optional stage

    tables = build_annotations(transcripts, gazetteer, blacklist, cfg)
    triples = build_triples(transcripts, gazetteer, blacklist, cfg)
    edges = cross_turn_event_edges(tables["mentions"], cfg)
    nodes = canonical_nodes(tables["mentions"])
    return {"triples": triples, "edges": edges, "nodes": nodes, **tables}


_NT_LITERAL_PREDS = ("speaker-attribution", "tool-invocation")


def ntriples_view(triples: DataFrame) -> DataFrame:
    """RDF N-Triples serialization of the triple table — the
    standards-facing KG export (the Anafora XML sink's graph-world
    sibling). One output column ``ntriple`` per input row, plus the
    conv_id for partitioned writes.

    Mapping (documented spec): subjects and predicates live under a
    ``urn:kg:`` namespace; objects of the attribution predicates
    (speaker/tool) are string literals with full N-Triples escaping
    (backslash first, then quote, newline, carriage return, tab — the
    spec's required literal escapes), every other object is an id -> URI.
    Pure JVM string algebra (concat/regexp_replace), zero UDFs —
    serialization stays in whole-stage codegen and scales with the scan.
    """
    esc = F.col("obj")
    for raw, escaped in (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
                         ("\r", "\\r"), ("\t", "\\t")):
        esc = F.replace(esc, F.lit(raw), F.lit(escaped))
    obj_term = (
        F.when(
            F.col("pred").isin(*_NT_LITERAL_PREDS),
            F.concat(F.lit('"'), esc, F.lit('"')),
        )
        .otherwise(F.concat(F.lit("<urn:kg:id:"), F.col("obj"), F.lit(">")))
    )
    return triples.select(
        "conv_id",
        F.concat(
            F.lit("<urn:kg:id:"), F.col("subj"), F.lit("> "),
            F.lit("<urn:kg:pred:"), F.col("pred"), F.lit("> "),
            obj_term, F.lit(" ."),
        ).alias("ntriple"),
    )


def summarized_timelines(triples: DataFrame) -> DataFrame:
    """The reference's END PRODUCT: per-patient summarized timelines.

    The unsummarized TSV (triples_output_view) carries one row per scored
    (mention, timex) pair; the shared task's deliverable is the
    DEDUPLICATED (patient, chemo, tlink, normed_timex) tuple set
    (/root/reference/README.md:17-19,40 — "summarized gold timelines";
    the reference delegates this dedup to an external consumer of its
    annotation ids, timeline_delegator.py:468-477 — here it is a
    first-class operator). ``n_evidence`` counts the supporting pairs and
    ``first_dct``/``last_dct`` bound the provenance dates.

    One hash aggregate keyed on the 4-tuple; lower-cased chemo surface so
    casing variants of one mention collapse, mirroring the gold files'
    normalized surfaces.
    """
    return (
        triples.where(F.col("pred").startswith("tlink:"))
        .groupBy(
            F.col("conv_id").alias("patient_id"),
            F.lower("subj_text").alias("chemo_text"),
            F.regexp_replace("pred", "^tlink:", "").alias("tlink"),
            F.col("obj_text").alias("normed_timex"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_evidence"),
            F.min(F.date_format("anchor_date", "yyyy-MM-dd")).alias("first_dct"),
            F.max(F.date_format("anchor_date", "yyyy-MM-dd")).alias("last_dct"),
        )
    )


def triples_output_view(triples: DataFrame) -> DataFrame:
    """Reference-TSV-compatible projection of the tlink triples
    (NO_DTR_OUTPUT_COLUMNS, timeline_delegator.py:42-52) for golden
    comparison: DCT, patient_id, chemo_text, chemo_annotation_id,
    normed_timex, timex_annotation_id, tlink, note_name, tlink_inst."""
    return (
        triples.where(F.col("pred").startswith("tlink:"))
        .select(
            F.date_format("anchor_date", "yyyy-MM-dd").alias("DCT"),
            F.col("conv_id").alias("patient_id"),
            F.col("subj_text").alias("chemo_text"),
            F.col("subj").alias("chemo_annotation_id"),
            F.col("obj_text").alias("normed_timex"),
            F.col("obj").alias("timex_annotation_id"),
            F.regexp_replace("pred", "^tlink:", "").alias("tlink"),
            F.format_string("%s_%d", "conv_id", "turn_idx").alias("note_name"),
            F.col("instance").alias("tlink_inst"),
        )
        .orderBy("patient_id", "note_name", "chemo_annotation_id", "timex_annotation_id")
    )
