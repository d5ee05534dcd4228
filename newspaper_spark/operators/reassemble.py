"""Conversation reassembly: per-conv turn texts concatenated in stable
turn order (the north-rule ordering made visible as an operator).

Two forms:

* ``reassemble_conversations`` — groupBy(conv_id) +
  array_sort(collect_list(struct(turn_idx, text))). One shuffle; the
  whole conversation materializes in one aggregation buffer, which is
  fine for bounded conversations but a memory hazard for mega-convs.
* ``reassemble_conversations_segmented`` — two-level aggregation:
  turns first fold into fixed-size SEGMENTS keyed by
  (conv_id, turn_idx // segment), then segments fold into the
  conversation. Peak per-buffer memory is O(segment), not O(turns);
  the extra shuffle is on (conv_id, segment) — still uniform. Output
  is IDENTICAL to the single-level form (same order, same separator),
  so the same SQL oracle covers both.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEPARATOR = "\n===\n"


def reassemble_conversations(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
) -> DataFrame:
    per_turn = df.select(
        F.col(conv_col).alias("conv_id"),
        F.struct(F.col(turn_col).alias("turn_idx"), F.col(text_col).alias("text")).alias("t"),
    )
    agg = per_turn.groupBy("conv_id").agg(
        F.array_sort(F.collect_list("t")).alias("ts")
    )
    return agg.select(
        "conv_id",
        F.size("ts").alias("n_turns"),
        F.array_join(F.transform("ts", lambda x: x["text"]), SEPARATOR).alias(
            "conversation_text"
        ),
    )


def reassemble_conversations_segmented(
    df: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    segment: int = 1024,
) -> DataFrame:
    """Same output as reassemble_conversations with O(segment) buffers.

    Stage 1 groups on (conv_id, turn_idx // segment): each buffer holds
    ≤ segment turns. Stage 2 groups on conv_id over one pre-joined
    string per segment — a mega-conversation of T turns costs
    T/segment strings in the final buffer instead of T structs."""
    per_turn = df.select(
        F.col(conv_col).alias("conv_id"),
        (F.col(turn_col).cast("long") / segment).cast("long").alias("seg"),
        F.struct(F.col(turn_col).alias("turn_idx"), F.col(text_col).alias("text")).alias("t"),
    )
    segs = per_turn.groupBy("conv_id", "seg").agg(
        F.count("*").alias("n"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("t")), lambda x: x["text"]),
            SEPARATOR,
        ).alias("seg_text"),
    )
    per_seg = segs.select(
        "conv_id",
        "n",
        F.struct(F.col("seg"), F.col("seg_text").alias("text")).alias("t"),
    )
    agg = per_seg.groupBy("conv_id").agg(
        F.sum("n").cast("int").alias("n_turns"),
        F.array_join(
            F.transform(F.array_sort(F.collect_list("t")), lambda x: x["text"]),
            SEPARATOR,
        ).alias("conversation_text"),
    )
    return agg.select("conv_id", "n_turns", "conversation_text")
