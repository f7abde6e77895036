"""S6: Anafora-style XML export of events + timexes, one document per turn.

Reference: NormalizedEventTimeAnaforaWriter.java:104-449 (debug/alt sink
wired by TimelinesDefault.piper:9). Structure reproduced:

* ``<data><info/><schema/><annotations>...`` envelope (:114-152); the
  reference stamps a wall-clock ``<savetime>`` — replaced by the turn's
  anchor date so output is deterministic (a run artifact, not semantics).
* one ``<entity>`` per EVENT, sorted by (begin, end) (:169-171), ids
  ``{i}@e@{doc}@system`` starting at 1 (:406-411); the writer's loop returns
  ``idNumber + 1`` after the last event (:184), so TIMEX ids start with a
  one-id gap — quirk reproduced.
* EVENT properties DocTimeRel / Polarity=POS / Degree=N/A / Type=N/A /
  ContextualModality / ContextualAspect=UNDETERMINED /
  Permanence=UNDETERMINED / CUI / Text (:203-273); CUI is the distinct
  comma-joined concept set per span (A4, :207-214).
* one ``<entity>`` per TIMEX3 with the normalized value, then a DOCTIME
  node carrying the DCT (:419-449).

Everything is JVM-side column algebra: groupBy + sort_array + transform +
concat_ws — no Python UDF; per-turn XML assembly is embarrassingly parallel
and shuffles only on the (conv_id, turn_idx) keys the pipeline already
uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["anafora_documents"]

_EVENT_TMPL = (
    "<entity><id>%d@e@%s@system</id><span>%d,%d</span><type>EVENT</type>"
    "<parentsType>TemporalEntities</parentsType><properties>"
    "<DocTimeRel>%s</DocTimeRel><Polarity>POS</Polarity><Degree>N/A</Degree>"
    "<Type>N/A</Type><ContextualModality>%s</ContextualModality>"
    "<ContextualAspect>UNDETERMINED</ContextualAspect>"
    "<Permanence>UNDETERMINED</Permanence><CUI>%s</CUI><Text>%s</Text>"
    "</properties></entity>"
)

_TIMEX_TMPL = (
    "<entity><id>%d@e@%s@system</id><span>%d,%d</span><type>TIMEX3</type>"
    "<parentsType>TemporalEntities</parentsType><properties>"
    "<Class>DATE</Class><normalizedExpression>%s</normalizedExpression>"
    "</properties></entity>"
)

_DOCTIME_TMPL = (
    "<entity><id>%d@e@%s@system</id><type>DOCTIME</type>"
    "<parentsType>TemporalEntities</parentsType><properties>"
    "<normalizedExpression>%s</normalizedExpression></properties></entity>"
)


def _xml_escape(col):
    return F.regexp_replace(
        F.regexp_replace(F.regexp_replace(col, "&", "&amp;"), "<", "&lt;"), ">", "&gt;"
    )


def anafora_documents(mentions_f: DataFrame, timexes_f: DataFrame) -> DataFrame:
    """Filtered mentions + normalized timexes -> one row per turn:
    (conv_id, turn_idx, doc_name, xml)."""
    doc = F.format_string("%s_%d", "conv_id", "turn_idx")

    # A4: distinct comma-joined CUIs per event span (AnaforaWriter.java:207-214)
    ev_spans = (
        mentions_f.groupBy("conv_id", "turn_idx", "begin", "end")
        .agg(
            F.array_join(F.array_distinct(F.sort_array(F.collect_list("cui"))), ",").alias("cuis"),
            F.first("dtr", ignorenulls=True).alias("dtr"),
            F.first("conmod", ignorenulls=True).alias("conmod"),
            F.first("surface", ignorenulls=True).alias("surface"),
            F.first("anchor_date", ignorenulls=True).alias("anchor_date"),
        )
    )
    evs = ev_spans.groupBy("conv_id", "turn_idx").agg(
        F.sort_array(
            F.collect_list(F.struct("begin", "end", "dtr", "conmod", "cuis", "surface"))
        ).alias("evs"),
        F.first("anchor_date", ignorenulls=True).alias("anchor_date"),
    )
    tms = timexes_f.groupBy("conv_id", "turn_idx").agg(
        F.sort_array(F.collect_list(F.struct("begin", "end", "normed"))).alias("tms")
    )

    joined = evs.join(tms, ["conv_id", "turn_idx"], "left").select(
        "conv_id",
        "turn_idx",
        "anchor_date",
        F.col("evs"),
        F.coalesce("tms", F.array()).alias("tms"),
    )

    d = doc
    event_xml = F.array_join(
        F.transform(
            "evs",
            lambda e, i: F.format_string(
                _EVENT_TMPL,
                (i + F.lit(1)).cast("int"),
                d,
                e["begin"],
                e["end"],
                F.coalesce(e["dtr"], F.lit("Overlap")),
                F.coalesce(e["conmod"], F.lit("UNDETERMINED")),
                e["cuis"],
                _xml_escape(e["surface"]),
            ),
        ),
        "",
    )
    # TIMEX ids start at size(evs) + 2 — the reference's idNumber+1 gap
    t_base = F.size("evs") + F.lit(2)
    timex_xml = F.array_join(
        F.transform(
            "tms",
            lambda t, i: F.format_string(
                _TIMEX_TMPL,
                (t_base + i).cast("int"),
                d,
                t["begin"],
                t["end"],
                _xml_escape(t["normed"]),
            ),
        ),
        "",
    )
    doctime_xml = F.when(
        F.col("anchor_date").isNotNull(),
        F.format_string(
            _DOCTIME_TMPL,
            (t_base + F.size("tms")).cast("int"),
            d,
            F.date_format("anchor_date", "yyyy-MM-dd"),
        ),
    ).otherwise(F.lit(""))

    xml = F.concat(
        F.lit("<data><info><savetime>"),
        F.coalesce(F.date_format("anchor_date", "yyyy-MM-dd"), F.lit("")),
        F.lit("</savetime><progress>completed</progress></info>"),
        F.lit('<schema path="./" protocol="file">temporal-schema_NORM.xml</schema>'),
        F.lit("<annotations>"),
        event_xml,
        timex_xml,
        doctime_xml,
        F.lit("</annotations></data>"),
    )
    return joined.select(
        "conv_id", "turn_idx", d.alias("doc_name"), xml.alias("xml")
    )
