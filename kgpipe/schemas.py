"""StructType schemas for every stage boundary (SURVEY.md §1.3 Spark mapping).

All primitive columns; spans are two ints, concepts plain strings — never
UDTs. The annotated-turn schema carries per-turn annotation arrays so the
extraction stage stays a narrow (zero-shuffle) map; the exploded views give
the relational mentions/timexes/tokens tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)

TOKEN_STRUCT = T.StructType(
    [
        T.StructField("tok_idx", T.IntegerType()),
        T.StructField("begin", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("is_newline", T.BooleanType()),
    ]
)

MENTION_STRUCT = T.StructType(
    [
        T.StructField("mention_idx", T.IntegerType()),
        T.StructField("begin", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("tok_begin", T.IntegerType()),
        T.StructField("tok_end", T.IntegerType()),  # inclusive token index
        T.StructField("surface", T.StringType()),   # newline-stripped covered text
        T.StructField("term", T.StringType()),      # normalized matched term
        T.StructField("cui", T.StringType()),
        T.StructField("tui", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("conmod", T.StringType()),
        T.StructField("conmod_inst", T.StringType()),
        T.StructField("dtr", T.StringType()),
        T.StructField("dtr_inst", T.StringType()),
        # precomputed ±60-token pairing window as char offsets (J1/O4)
        T.StructField("win_char_begin", T.IntegerType()),
        T.StructField("win_char_end", T.IntegerType()),
    ]
)

TIMEX_STRUCT = T.StructType(
    [
        T.StructField("timex_idx", T.IntegerType()),
        T.StructField("begin", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("tok_begin", T.IntegerType()),
        T.StructField("tok_end", T.IntegerType()),  # inclusive token index
        T.StructField("surface", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("normed", T.StringType()),    # null => dropped by F5
    ]
)

ANNOTATED_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("anchor_date", T.DateType()),
        T.StructField("text", T.StringType()),
        T.StructField("tokens", T.ArrayType(TOKEN_STRUCT)),
        T.StructField("mentions", T.ArrayType(MENTION_STRUCT)),
        T.StructField("timexes", T.ArrayType(TIMEX_STRUCT)),
    ]
)

# Mentions-only fast path (build_annotations timexes=False): flat mention
# rows straight out of the annotate pass. Field set matches
# mentions_table(annotated) exactly — (conv_id, turn_idx, anchor_date) +
# MENTION_STRUCT — but the Arrow transfer carries ONLY these columns: no
# token array, no text, no per-turn passthroughs (those were ~80% of the
# no-timex annotate stage's serialized bytes and none of its consumers
# read them).
MENTION_ROWS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("anchor_date", T.DateType()),
    ]
    + list(MENTION_STRUCT.fields)
)

# One-pass structured path (build_triples fused=False): the annotate stage
# emits mention rows (kind_rank 0), timex rows (kind_rank 1) and ONE
# token-stream row per turn (kind_rank 2) directly in the merged W1 union
# shape, so the whole path needs a single exchange and a single persist —
# filters (F1/F2/F4/F5) and the W1 window stay visible DataFrame operators
# over this frame. Column names match MENTION_STRUCT/TIMEX_STRUCT so the
# splits are drop-in for the per-kind relations.
ANNOTATION_UNION_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("anchor_date", T.DateType()),
        T.StructField("kind_rank", T.IntegerType()),    # 0 mention / 1 timex / 2 tokens
        T.StructField("in_kind_idx", T.IntegerType()),
        T.StructField("begin", T.IntegerType()),
        T.StructField("end", T.IntegerType()),
        T.StructField("tok_begin", T.IntegerType()),
        T.StructField("tok_end", T.IntegerType()),
        T.StructField("surface", T.StringType()),
        T.StructField("term", T.StringType()),
        T.StructField("cui", T.StringType()),
        T.StructField("tui", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("conmod", T.StringType()),
        T.StructField("conmod_inst", T.StringType()),
        T.StructField("dtr", T.StringType()),
        T.StructField("dtr_inst", T.StringType()),
        T.StructField("win_char_begin", T.IntegerType()),
        T.StructField("win_char_end", T.IntegerType()),
        T.StructField("kind", T.StringType()),          # timex kind
        T.StructField("normed", T.StringType()),
        # the turn's token stream, already <newline>-substituted
        # (tokens_for_mode mode="dtr" — the only mode pair scoring uses),
        # joined with \x1f: ONE Arrow string per turn instead of ~180
        # per-token strings + flags, which halves the annotate stage's
        # Arrow transfer cost at sf0.1
        T.StructField("tok_stream", T.StringType()),
    ]
)

TRIPLE_SCHEMA = T.StructType(
    [
        T.StructField("subj", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("obj", T.StringType()),
        T.StructField("anchor_date", T.DateType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("subj_text", T.StringType()),
        T.StructField("obj_text", T.StringType()),
        T.StructField("instance", T.StringType()),
    ]
)

NODE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("canonical_cui", T.StringType()),
        T.StructField("surfaces", T.ArrayType(T.StringType())),
        T.StructField("conv_id", T.StringType()),
    ]
)

EDGE_SCHEMA = T.StructType(
    [
        T.StructField("src", T.StringType()),
        T.StructField("dst", T.StringType()),
        T.StructField("pred", T.StringType()),
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("weight", T.DoubleType()),
    ]
)

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("source_snapshot_id", T.StringType()),
        T.StructField("partition_hash", T.IntegerType()),
        T.StructField("triple_count", T.LongType()),
        T.StructField("stage_timings", T.MapType(T.StringType(), T.DoubleType())),
        T.StructField("completed_at", T.TimestampType()),
    ]
)
