"""Hot-conversation skew controls (north_star: "salted repartitioning on
conv_id hash to defuse hot-conversation skew and AQE-managed shuffles").

Two mechanisms, both exact (result-equality is pytest-asserted):

* ``spread_by_turn`` — salted repartition for the narrow annotation /
  fused-extraction stages: partition on ``hash(conv_id, turn_idx) % N`` so a
  conversation with 10^6 turns spreads over all executors instead of
  whichever input split it landed in. Deterministic (no rand()), so reruns
  produce identical partition assignment — lineage/resume stays stable.
  Per-turn annotation is embarrassingly parallel, so scattering turns of one
  conversation is free.

* ``with_conv_chunks`` — chunk+halo decomposition for per-conversation
  *ordered* stages (the cross-turn lead window): a conversation is split
  into fixed-size turn chunks; rows within ``halo`` turns past each chunk
  boundary are duplicated into the previous chunk (flagged ``is_halo``) so a
  window bounded by ``halo`` look-ahead computes exactly the same result per
  base row, while the shuffle key becomes (conv_id, chunk) — a hot
  conversation now occupies ceil(turns/chunk) tasks instead of one
  (SURVEY.md §7.4 risk 6: halo = window radius ⇒ exact results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["spread_by_turn", "with_conv_chunks"]


def spread_by_turn(df: DataFrame, n_partitions: int) -> DataFrame:
    """Deterministic salted repartition on hash(conv_id, turn_idx)."""
    return df.repartition(
        n_partitions, F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(n_partitions))
    )


def with_conv_chunks(
    turns: DataFrame, chunk_turns: int, halo: int
) -> DataFrame:
    """Add (chunk, is_halo) to a per-turn DataFrame.

    Base rows go to chunk = floor(turn_idx / chunk_turns). Rows whose
    turn_idx lies within ``halo`` turns of a chunk start are ALSO emitted
    into the preceding chunk with is_halo = true: a look-ahead window of at
    most ``halo`` turns, evaluated within (conv_id, chunk), then restricted
    to is_halo = false rows, equals the same window over the whole
    conversation.
    """
    # Single-pass explode rather than a base ∪ halo union: a union reads
    # (and recomputes) the whole upstream subtree once per branch — for the
    # cross-turn path that subtree is the annotation scan itself, so the
    # union shape doubled the most expensive stage whenever the input was
    # not persisted. One explode emits the same rows in one pass.
    chunk = F.floor(F.col("turn_idx") / F.lit(chunk_turns)).cast("long")
    in_halo = (chunk >= 1) & (
        F.col("turn_idx") % F.lit(chunk_turns) < F.lit(halo)
    )
    emitted = F.explode(
        F.when(in_halo, F.array(chunk, chunk - 1)).otherwise(F.array(chunk))
    )
    return (
        turns.withColumn("_base_chunk", chunk)
        .withColumn("chunk", emitted)
        .withColumn("is_halo", F.col("chunk") != F.col("_base_chunk"))
        .drop("_base_chunk")
    )
