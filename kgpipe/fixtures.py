"""Deterministic synthetic inputs (FIXTURES.md).

* ``synthetic_transcripts`` — seeded generator of the input_hint table
  (conv_id, turn_idx, role, text, tool, ts). Plants gazetteer terms
  (multi-word, misspellings, surface variants), the full timex variety
  (slash dates incl. 2-digit years, Month DD YYYY, bare years, relative,
  unparseable noise), blacklist collisions, newlines, bracketed sections,
  and one hot (skewed) conversation. Pure function of its arguments.

* ``derive_transcripts`` / ``DERIVE_TRANSCRIPTS_SQL`` — the same table shape
  derived deterministically from the driver's parquet tables
  (events ⋈ documents), expressed identically as a DataFrame plan and as
  ANSI SQL so the DuckDB oracle can replay it (used by __spark_entry__).
"""

from __future__ import annotations

import datetime as dt
import random
from typing import List

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "synthetic_transcripts",
    "synthetic_transcripts_df",
    "derive_transcripts",
    "DERIVE_TRANSCRIPTS_SQL",
]

_ROLES = ["user", "assistant", "system", "tool"]
_TOOLS = ["search", "calculator", "browser", "python"]

_TERMS = [
    "cisplatin", "carboplatin", "5-fu", "5fu", "5-fluorouracil",
    "liposomal doxorubicin", "doxorubicin", "folfox", "xelox", "taxol",
    "paclitaxel", "gemcitabine", "interleukin-2", "alpha 2b interferon",
    "chemo", "chmeo", "chemotherapy", "aspirin", "glucose",  # last two non-T061
    "ac", "ice", "cap",  # blacklist collisions
]

_NOISE_TIMEX = ["the day of the thing", "some point", "q3ish", "around then"]


def _timex_surfaces(anchor: dt.date, rng: random.Random) -> List[str]:
    """Deterministic pool of timex surfaces around an anchor date."""
    d1 = anchor - dt.timedelta(days=rng.randint(1, 400))
    d2 = anchor + dt.timedelta(days=rng.randint(1, 200))
    return [
        f"{d1.month}/{d1.day}/{d1.year}",
        f"{d2.month}/{d2.day}/{str(d2.year)[2:]}",  # 2-digit year -> +2000
        d1.strftime("%B %d, %Y").replace(" 0", " "),
        d2.strftime("%b %Y"),
        str(d1.year),
        "yesterday", "today", "tomorrow",
        "last week", "next month", "this year",
        "3 days ago", "two weeks ago", "in 5 days",
        "last monday", "next friday",
        "recently", "soon", "currently",
        # round-2 grammar: seasons, decades, week-of, time-of-day, SET
        f"summer {d1.year}", "last winter", "this fall",
        "the 1990s", "the '80s",
        f"the week of {d2.month}/{d2.day}/{d2.year}",
        "every 2 weeks", "daily",
        "this morning", "last night", "tomorrow evening",
        "at 3 pm", "10:30 am",
        "the day before yesterday", "day after tomorrow",
        "2 decades ago", f"march {d2.day}", "christmas",
        # round-3 grammar: centuries, weekends, WithModifier prefixes
        "the 19th century", "next weekend", "last weekend",
        f"early {d1.year}", "the mid 1990s", "late last year",
        f"around {d2.strftime('%B')} {d2.year}",
        # round-3b: earlier/coming synonyms, month-of-relative-year,
        # word decades, noon, following/preceding
        "3 years earlier", "coming friday", "the coming week",
        "january last year", "the nineties", "at noon",
        "the following day", "the preceding month",
        "13/45/2020",  # fails calendar validation -> silently dropped
        rng.choice(_NOISE_TIMEX),
    ]


_SENTENCE_TEMPLATES = [
    "patient received {term} on {timex} .",
    "we will start {term} {timex} , pending labs .",
    "plan : begin {term} after imaging , maybe {timex} .",
    "no evidence {term} was given {timex} .",
    "if tolerated , consider {term} {timex} .",
    "completed {term} cycle {n} {timex} without issues .",
    "patients typically respond to {term} within weeks .",
    "discussed {term} and {term2} options {timex} .",
    "tool output : dosage table for {term} generated {timex} .",
    "follow-up {timex} showed stable disease after {term} .",
]

_FILLER = (
    "vitals stable . labs reviewed . continue monitoring . "
    "assessment and plan discussed with team ."
)


def synthetic_transcripts(
    n_conv: int = 20,
    turns_per_conv: int = 10,
    seed: int = 42,
    hot_conv_factor: int = 10,
) -> pd.DataFrame:
    """Seeded transcript corpus. Conversation 0 gets ``hot_conv_factor``×
    the average turns (skew fixture)."""
    rng = random.Random(seed)
    rows = []
    base = dt.datetime(2023, 1, 2, 9, 0, 0)
    for c in range(n_conv):
        conv_id = f"conv{c:04d}"
        n_turns = turns_per_conv * (hot_conv_factor if c == 0 else 1)
        t0 = base + dt.timedelta(days=rng.randint(0, 300))
        for i in range(n_turns):
            ts = t0 + dt.timedelta(hours=6 * i, minutes=rng.randint(0, 59))
            anchor = ts.date()
            role = _ROLES[rng.randrange(len(_ROLES))]
            tool = _TOOLS[rng.randrange(len(_TOOLS))] if role == "tool" else None
            pool = _timex_surfaces(anchor, rng)
            n_sent = rng.randint(1, 3)
            sents = []
            for _ in range(n_sent):
                tpl = _SENTENCE_TEMPLATES[rng.randrange(len(_SENTENCE_TEMPLATES))]
                sents.append(
                    tpl.format(
                        term=_TERMS[rng.randrange(len(_TERMS))],
                        term2=_TERMS[rng.randrange(len(_TERMS))],
                        timex=pool[rng.randrange(len(pool))],
                        n=rng.randint(1, 6),
                    )
                )
            if rng.random() < 0.3:
                sents.append(_FILLER)
            joiner = "\n" if rng.random() < 0.4 else " "
            text = joiner.join(sents)
            if rng.random() < 0.15:
                text = f'[start section id="HPI"]{text}[end section id="HPI"]'
            if rng.random() < 0.05:
                # X3 fixture: header-scan DCT fallback, ts withheld
                text = f"Principal Date: {anchor.strftime('%Y%m%d')}\n" + text
                ts_out = None
            else:
                ts_out = ts
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": i,
                    "role": role,
                    "text": text,
                    "tool": tool,
                    "ts": ts_out,
                }
            )
    return pd.DataFrame(rows)


def synthetic_transcripts_df(
    spark: SparkSession, n_conv: int = 20, turns_per_conv: int = 10, seed: int = 42,
    hot_conv_factor: int = 10, partitions: int | None = None,
) -> DataFrame:
    from .schemas import TRANSCRIPTS_SCHEMA

    pdf = synthetic_transcripts(n_conv, turns_per_conv, seed, hot_conv_factor)
    df = spark.createDataFrame(pdf, schema=TRANSCRIPTS_SCHEMA)
    if partitions:
        df = df.repartition(partitions, "conv_id", "turn_idx")
    return df


# --------------------------------------------------------------------------
# derivation from the driver's tables (events ⋈ documents) — used by
# __spark_entry__ so the DuckDB oracle can replay the exact same derivation.
# --------------------------------------------------------------------------

# role from event_type, tool only for error events, text = document text plus
# a planted slash date ("on M/D/YYYY") for the timex fast path AND a second
# planted timex cycling through the round-2/3 grammar kinds (seasons,
# decades, week-of, period sets, times of day, year-less month-day, holidays
# — the last two exercising W7 nearest-year resolution — plus round 3's
# centuries, weekends and WithModifier prefixes, plus round 4's spelled
# tens, spelled-out years, fractional periods, TimeSpanSets, bound units,
# time-of-day sets and of-phrasings, plus round 5's vague-quantifier
# periods (couple/few), ordinal day-of-month, hyphenated modifiers with
# bare-month W7, first-[Int]-[Unit] periods and every-other sets, plus the
# late-round-5 Partial compositions: bare quarters (W7 nearest Q1 start),
# year-less week-of (W7 day pick -> enclosing ISO week), singular
# weekday+part-of-day, relative-year possessive quarters, and the
# [Partial] this/last/next [Unit] compositions, plus round 6's sub-day
# units on the turn's FULL timestamp — hour/minute relatives, the bare
# 24-hour clock and the hourly period set — and round 6's date+clock
# compositions (date-first "tomorrow at 19:30" AND the clock-first
# "19:30 yesterday" that previously mis-anchored), the modified bare
# part-of-day ("mid-morning") and the "[Period] from now" mirror) keyed on
# event_id % 38 — every kind gets driver-corpus coverage with
# DuckDB-replayable normalization. All suffix words are outside the
# gazetteer and the DTR/conmod marker sets, so mention extraction and the
# marker scorers are unaffected ("year's" is one engine token — the
# apostrophe is a joiner in _TOKEN_RE, like the hyphen).
DERIVE_TRANSCRIPTS_SQL = """
SELECT
  'c' || CAST(e.user_id AS {str_type}) AS conv_id,
  CAST(ROW_NUMBER() OVER (PARTITION BY e.user_id ORDER BY e.ts, e.event_id) - 1 AS INT) AS turn_idx,
  CASE e.event_type
    WHEN 'click' THEN 'user'
    WHEN 'view' THEN 'user'
    WHEN 'signup' THEN 'assistant'
    WHEN 'purchase' THEN 'assistant'
    ELSE 'tool'
  END AS role,
  d.text || ' on ' || {date_expr} ||
  CASE CAST(e.event_id % 38 AS INT)
    WHEN 0 THEN ' revisit summer ' || CAST(year(e.ts) - 1 AS {str_type})
    WHEN 1 THEN ' revisit the 1990s'
    WHEN 2 THEN ' revisit week of ' || {date_expr}
    WHEN 3 THEN ' revisit every 2 weeks'
    WHEN 4 THEN ' revisit this morning'
    WHEN 5 THEN ' revisit last summer'
    WHEN 6 THEN ' revisit march 5'
    WHEN 7 THEN ' revisit christmas'
    WHEN 8 THEN ' revisit the 19th century'
    WHEN 9 THEN ' revisit next weekend'
    WHEN 10 THEN ' revisit early ' || CAST(year(e.ts) - 1 AS {str_type})
    WHEN 11 THEN ' revisit twenty-one days ago'
    WHEN 12 THEN ' revisit nineteen ninety seven'
    WHEN 13 THEN ' revisit two and a half weeks'
    WHEN 14 THEN ' revisit every monday'
    WHEN 15 THEN ' revisit the end of the month'
    WHEN 16 THEN ' revisit every morning'
    WHEN 17 THEN ' revisit june of ' || CAST(year(e.ts) AS {str_type})
    WHEN 18 THEN ' revisit a couple of days ago'
    WHEN 19 THEN ' revisit the past few weeks'
    WHEN 20 THEN ' revisit the 5th of june ' || CAST(year(e.ts) AS {str_type})
    WHEN 21 THEN ' revisit mid-june'
    WHEN 22 THEN ' revisit the first nine months'
    WHEN 24 THEN ' revisit the first quarter'
    WHEN 25 THEN ' revisit the week of march 5'
    WHEN 26 THEN ' revisit monday morning'
    WHEN 27 THEN ' revisit this year''s third quarter'
    WHEN 28 THEN ' revisit monday last week'
    WHEN 23 THEN ' revisit every other week'
    WHEN 29 THEN ' revisit the third quarter last year'
    WHEN 30 THEN ' revisit three hours ago'
    WHEN 31 THEN ' revisit in 20 minutes'
    WHEN 32 THEN ' revisit at 19:30'
    WHEN 33 THEN ' revisit hourly'
    WHEN 34 THEN ' revisit tomorrow at 19:30'
    WHEN 35 THEN ' revisit mid-morning'
    WHEN 36 THEN ' revisit 30 minutes from now'
    WHEN 37 THEN ' revisit 19:30 yesterday'
    ELSE ' revisit every other week'
  END AS text,
  CASE WHEN e.event_type = 'error' THEN 'logger' ELSE NULL END AS tool,
  e.ts AS ts
FROM events e
JOIN documents d ON d.doc_id = e.event_id % 500
WHERE d.doc_id < 500
"""
# The WHERE is implied by the join condition (event_id % 500 < 500) but
# stating it lets Spark push a doc_id predicate into the documents scan and
# guarantees the dimension side stays broadcastable at any sf.


def _derive_partitions(spark: SparkSession, events: DataFrame) -> int:
    """Output partitioning for the derived transcript table: enough splits
    to feed every core downstream (the table is re-read by every consumer,
    and parquet row-group granularity caps scan parallelism at the file
    count), but size-driven once the corpus outgrows the cores so files
    stay near the 64 MB class rather than multiplying without bound."""
    import os

    cores = spark.sparkContext.defaultParallelism
    try:
        in_bytes = sum(
            os.path.getsize(f.removeprefix("file:"))
            for f in events.inputFiles()
        )
    except OSError:
        in_bytes = 0
    # derived text ≈ 4x the compressed event bytes (doc text join fan-in)
    return max(3 * cores, (4 * in_bytes) // (64 << 20) + 1)


def derive_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataFrame twin of DERIVE_TRANSCRIPTS_SQL over the driver parquet.

    The result is round-robin repartitioned (content unchanged; every
    consumer is keyed or order-insensitive): the AQE-coalesced join output
    otherwise lands in ~cores/2 partitions, and materializing THAT caps
    every later scan of the table at that file count (single-row-group
    files split no further) — measured 2.1x wall on the fused pass at
    sf0.1/local[32]."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    documents = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events.createOrReplaceTempView("events")
    documents.createOrReplaceTempView("documents")
    sql = DERIVE_TRANSCRIPTS_SQL.format(
        date_expr="date_format(e.ts, 'M/d/yyyy')", str_type="STRING"
    )
    return spark.sql(sql).repartition(_derive_partitions(spark, events))


def derive_transcripts_duckdb_sql() -> str:
    """The identical derivation in DuckDB dialect (strftime month/day without
    zero padding)."""
    return DERIVE_TRANSCRIPTS_SQL.format(date_expr="strftime(e.ts, '%-m/%-d/%Y')", str_type="VARCHAR")
