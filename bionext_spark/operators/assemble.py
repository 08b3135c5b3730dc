"""Stage 0 — conversation assembly (SURVEY.md F7/W1/F12).

The reference concatenates title + ' ' + abstract per document
(src/data.py:34); here a conversation document is its turns joined with a
single space in stable (conv_id, turn_idx) order, with the per-turn char
offset map kept alongside so spans map back to turns (per-turn text
equality invariant).

Fully relational: one shuffle (groupBy conv_id), everything else is
higher-order array functions inside whole-stage codegen. No Python runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assemble_conversations(transcripts: DataFrame, segment_size: int = 0) -> DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) → CONVERSATIONS schema.

    The single groupBy(conv_id) shuffle here establishes the partitioning
    every later per-conversation stage reuses.

    ``segment_size > 0`` enables the **salted two-phase** variant for
    skewed inputs (north-rule requirement): turns first combine into
    ordered segments keyed by (conv_id, turn_idx div segment_size) — a
    salt that spreads a 10^6-turn conversation over many reducers — then
    a second, much smaller shuffle concatenates the segments. Output is
    identical to the one-phase plan (tested)."""
    if segment_size > 0:
        seg = (
            transcripts.groupBy(
                "conv_id", (F.col("turn_idx") / segment_size).cast("int").alias("seg_id")
            )
            .agg(F.array_sort(F.collect_list(F.struct("turn_idx", "text"))).alias("seg_turns"))
        )
        df = (
            seg.groupBy("conv_id")
            .agg(
                F.flatten(
                    F.expr("transform(array_sort(collect_list(struct(seg_id, seg_turns))), x -> x.seg_turns)")
                ).alias("turns")
            )
        )
    else:
        ordered = F.array_sort(F.collect_list(F.struct("turn_idx", "text")))
        df = transcripts.groupBy("conv_id").agg(ordered.alias("turns"))
    texts = F.col("turns.text")
    return df.select(
        "conv_id",
        F.array_join(texts, " ").alias("doc_text"),
        F.size("turns").alias("n_turns"),
        # offsets[i] = cumulative length of previous turns + separators;
        # computed as a running fold over turn lengths.
        F.expr(
            """
            aggregate(
                turns.text,
                struct(0 as pos, cast(array() as array<int>) as offs),
                (acc, t) -> struct(cast(acc.pos + length(t) + 1 as int) as pos,
                                   array_append(acc.offs, acc.pos) as offs),
                acc -> acc.offs
            )
            """
        ).cast("array<int>").alias("turn_offsets"),
        F.transform(texts, lambda t: F.length(t)).cast("array<int>").alias("turn_lengths"),
    )


def turn_of_span(conversations_cols: str = "turn_offsets", start_col: str = "start"):
    """Column expr mapping a char offset to its turn index (F12): the last
    turn whose offset ≤ start."""
    return F.expr(f"size(filter({conversations_cols}, o -> o <= {start_col})) - 1").cast("int")
