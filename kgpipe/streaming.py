"""Structured Streaming ingest: transcripts landing as files -> triples,
incrementally and exactly-once.

The reference is batch-only (TSV at collection end, timeline_delegator.py:
385-399); the batch pipeline here is Structured-Streaming-ready because the
fused extraction is stateless per turn (SURVEY.md §2.9). This module is that
claim made real: the SAME ``turn_triples`` logic runs under
``spark.readStream`` with a file source, so a directory where transcript
parquet files keep landing becomes a continuously-materializing triple
store.

* source: ``readStream.schema(TRANSCRIPTS_SCHEMA).parquet(input_dir)`` —
  file-source bookkeeping (plus ``maxFilesPerTrigger``) gives incremental,
  replay-safe input batching.
* transform: ``fused_triples`` — mapInPandas is fully streaming-compatible;
  zero stateful operators, so no watermark is required (token windows are
  intra-turn, not event-time windows).
* sink: parquet + checkpointLocation -> exactly-once file sink; the
  checkpoint is the streaming analog of the lineage table's partition-
  granular resume (kgpipe.materialize).

``run_stream(trigger_available_now=True)`` drains everything currently in
the directory and stops — the pattern for incremental backfill jobs; with a
processing-time trigger it runs as a live service.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .config import DEFAULT_CONFIG, PipelineConfig
from .pair import fused_triples
from .schemas import TRANSCRIPTS_SCHEMA

__all__ = ["stream_triples", "run_stream"]


def stream_triples(
    spark: SparkSession,
    input_dir: str,
    gazetteer,
    blacklist,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of triples over a transcript parquet directory."""
    reader = spark.readStream.schema(TRANSCRIPTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    transcripts = reader.parquet(input_dir)
    return fused_triples(transcripts, gazetteer, blacklist, cfg)


def run_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gazetteer,
    blacklist,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    trigger_available_now: bool = True,
    timeout_sec: float | None = 300.0,
):
    """Start (and with availableNow, drain) the stream. Returns the query."""
    triples = stream_triples(spark, input_dir, gazetteer, blacklist, cfg)
    writer = (
        triples.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    query = writer.start()
    if trigger_available_now:
        query.awaitTermination(timeout_sec)
    return query
