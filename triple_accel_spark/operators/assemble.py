"""Turns -> documents assembly with stable (conv_id, turn_idx) ordering.

The graft input is an Iceberg/parquet table of multi-turn transcripts
``(conv_id, turn_idx, role, text, tool, ts)``. Entity resolution scores
whole conversations, so turns are assembled into one document per
conversation. Ordering is made explicit — ``sort_array`` over
``struct(turn_idx, text)`` — so per-turn text equality is preserved
regardless of scan/shuffle order (BASELINE.json input_hint invariant).

This is a single map-side-combinable aggregation: one shuffle on
conv_id, no UDF, fully whole-stage-codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# unit separator: cannot appear in the printable-ASCII transcript
# alphabet (33-126), so joining is injective per turn
TURN_SEP = "\x1f"


def assemble_documents(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    turn_col: str = "turn_idx",
    text_col: str = "text",
    out_col: str = "doc",
) -> DataFrame:
    """One row per conversation: ``(conv_id, doc, n_turns, doc_len)``.

    ``doc`` is the turn texts joined in (turn_idx) order with an
    out-of-alphabet separator.

    Scale note: the per-conversation turn list is materialized in the
    aggregation buffer, which is the right trade for conversations
    (bounded, typically tens of turns — BASELINE.json input model). A
    table where one conv_id could carry millions of rows should be
    capped or quarantined upstream; an aggregation-buffer bound is the
    same guarantee every groupBy-collect carries.
    """
    turns = F.array_sort(
        F.collect_list(F.struct(F.col(turn_col).alias("i"), F.col(text_col).alias("t")))
    )
    return transcripts.groupBy(conv_col).agg(
        F.concat_ws(
            TURN_SEP, F.transform(turns, lambda s: s["t"])
        ).alias(out_col),
        F.count(F.lit(1)).alias("n_turns"),
    ).withColumn("doc_len", F.length(out_col))
