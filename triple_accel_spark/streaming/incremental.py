"""Incremental entity resolution over a transcript stream.

The batch pipeline's blocking and scoring stages re-expressed for
Structured Streaming: new conversations arrive as turn rows, get
watermarked on ``ts``, assembled per conversation window, blocked with
the SAME MinHash key expressions as the batch path (key compatibility
is what makes stream-vs-index joins correct), and matched against a
static blocked index via stream-static join + the vectorized scoring
UDF.

Stream-static joins need no state store; the watermark bounds the
assembly state. This mirrors how a 10^12-turn deployment would ingest
deltas: block keys are deterministic, so yesterday's index and today's
stream agree on buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from triple_accel_spark.operators.blocking import with_minhash_blocks_expr
from triple_accel_spark.operators.scoring import score_pairs


def stream_block_keys(
    turns_stream: DataFrame,
    watermark: str = "10 minutes",
    q: int = 4,
    num_hashes: int = 16,
    num_bands: int = 8,
) -> DataFrame:
    """Assemble streaming turns into per-conversation docs and attach
    block keys. Append-mode compatible: one result row per
    (conversation, band) once the watermark closes the conversation."""
    docs = (
        turns_stream.withWatermark("ts", watermark)
        .groupBy(
            F.col("conv_id"),
            F.session_window("ts", watermark).alias("w"),
        )
        .agg(
            F.concat_ws(
                "\x1f",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("turn_idx").alias("i"), F.col("text").alias("t")))
                    ),
                    lambda s: s["t"],
                ),
            ).alias("doc")
        )
        .select("conv_id", "doc")
    )
    # expression-path keys: a streaming query permits one aggregation
    # (the session-window assembly above), so block keys must be pure
    # projections — with_minhash_blocks_expr emits keys bit-identical
    # to the batch aggregation path, which is what makes the
    # stream-vs-static-index join below correct
    return with_minhash_blocks_expr(
        docs, "doc", q=q, num_hashes=num_hashes, num_bands=num_bands
    )


def stream_match_against_index(
    blocked_stream: DataFrame,
    static_index: DataFrame,
    k: int = 64,
    sim_threshold: float = 0.88,
) -> DataFrame:
    """Join streaming blocked docs against a static blocked index on
    block_key and score the candidate pairs (stream-static equi-join —
    stateless, scales with the static side's bucket sizes)."""
    left = blocked_stream.select(
        F.col("conv_id").alias("id_a"),
        F.col("doc").alias("doc_a"),
        "block_key",
    )
    right = static_index.select(
        F.col("conv_id").alias("id_b"),
        F.col("doc").alias("doc_b"),
        "block_key",
    )
    pairs = left.join(right, "block_key").where(F.col("id_a") != F.col("id_b")).drop(
        "block_key"
    )
    return score_pairs(pairs, "doc_a", "doc_b", k=k, sim_threshold=sim_threshold)
