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

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from triple_accel_spark.operators.blocking import with_minhash_blocks_expr
from triple_accel_spark.operators.scoring import score_pairs

ASSIGN_SCHEMA = (
    "block_key string, conv_id string, cluster_id string, sim double"
)
_ASSIGN_STATE_SCHEMA = "ids array<string>, docs array<string>"


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


def stream_assign_clusters(
    blocked_stream: DataFrame,
    sim_threshold: float = 0.88,
    max_reps_per_block: int = 64,
    state_timeout_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """CUSTOM STATEFUL streaming operator (``applyInPandasWithState``):
    incremental per-block cluster assignment.

    Per block key, the state store holds the block's cluster
    REPRESENTATIVES (id + doc, capped at ``max_reps_per_block``). Each
    arriving doc is scored against the current representatives with the
    batch edit-distance kernel (one vectorized kernel call per doc, not
    per pair); if the best normalized similarity clears
    ``sim_threshold`` the doc is assigned that representative's
    cluster, otherwise it becomes a NEW representative. Emits
    ``(block_key, conv_id, cluster_id, sim)`` in append mode.

    This is the streaming analogue of pair-join + threshold + CC for
    the common case where clusters are representative-shaped
    (duplicates of a canonical doc): state is O(representatives), not
    O(stream), arrival order inside a micro-batch is made deterministic
    by sorting on conv_id, and idle blocks expire after
    ``state_timeout_ms`` of processing time (bounded state at
    10^12-turn scale; an expired block simply re-seeds on its next
    arrival). ``state_timeout_ms=0`` disables expiry (NoTimeout) — note
    a timeout-enabled query keeps scheduling no-data batches to service
    expirations, so it will not self-terminate under ``availableNow``
    triggers; stop it explicitly (or use 0 in run-to-completion
    harnesses). Cross-block consolidation — a doc assigned in several
    bands — is a downstream batch concern (min-cluster aggregation /
    connected components), same as the batch pipeline.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    thr = float(sim_threshold)
    cap = int(max_reps_per_block)
    ttl = int(state_timeout_ms)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl > 0
        else GroupStateTimeout.NoTimeout
    )

    def assign(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        from triple_accel_spark.kernels.banded import lev_batch

        ids, docs = state.get if state.exists else ([], [])
        ids, docs = list(ids), list(docs)
        out_id, out_cl, out_sim = [], [], []
        # concatenate the group's Arrow chunks BEFORE sorting: a block
        # larger than one Arrow batch arrives as several DataFrames,
        # and chunk-local sorts would leave arrival order dependent on
        # upstream partitioning (group size is bounded by the blocking
        # design + representative cap, so materializing is safe)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            allpdf = pd.concat(chunks) if len(chunks) > 1 else chunks[0]
            for _, row in allpdf.sort_values("conv_id").iterrows():
                doc = row["doc"]
                best_i, best_sim = -1, -1.0
                if docs and doc is not None:
                    # per-pair k from the threshold: sim >= thr needs
                    # d <= (1-thr)*max(len). Representatives beyond the
                    # bound can never win an assignment (all-below-thr
                    # routes to a new representative regardless of
                    # which one was closest), so the k-bounded call is
                    # semantics-identical and turns on the kernel's
                    # reject pruning. ceil mirrors relative_k_col's
                    # safe-side rounding: when (1-thr)*L lands exactly
                    # on an integer boundary in floats, a k at most 1
                    # larger never pre-rejects a pair whose float sim
                    # compare below would accept it.
                    ks = np.array(
                        [
                            math.ceil((1.0 - thr) * max(len(doc), len(r), 1))
                            for r in docs
                        ],
                        dtype=np.int64,
                    )
                    d, ok, _ = lev_batch([doc] * len(docs), docs, ks)
                    for i in range(len(docs)):
                        if not ok[i]:
                            continue
                        sim = 1.0 - float(d[i]) / max(len(doc), len(docs[i]), 1)
                        if sim > best_sim:
                            best_i, best_sim = i, sim
                if best_sim >= thr:
                    cluster = ids[best_i]
                elif doc is not None and len(ids) < cap:
                    ids.append(row["conv_id"])
                    docs.append(doc)
                    cluster, best_sim = row["conv_id"], 1.0
                else:
                    # NULL doc, or the block's representative budget is
                    # exhausted (uninformative hot block): self-cluster
                    cluster, best_sim = row["conv_id"], 1.0
                out_id.append(row["conv_id"])
                out_cl.append(cluster)
                out_sim.append(best_sim)
        state.update((ids, docs))
        if ttl > 0:
            state.setTimeoutDuration(ttl)
        yield pd.DataFrame(
            {
                "block_key": [str(key[0])] * len(out_id),
                "conv_id": out_id,
                "cluster_id": out_cl,
                "sim": out_sim,
            }
        )

    return blocked_stream.groupBy("block_key").applyInPandasWithState(
        assign,
        outputStructType=ASSIGN_SCHEMA,
        stateStructType=_ASSIGN_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )


def stream_dedup_exact(
    docs_stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup: keep the FIRST-arrived document per
    content digest within the watermark window
    (``dropDuplicatesWithinWatermark`` on ``md5(text)`` — state is one
    digest row per distinct document, expired by the watermark, so
    state size tracks distinct-content volume per window, not stream
    length).

    Semantics vs the batch ``dedup_exact``: the batch operator keeps
    the MIN-id representative (deterministic under any scan order); a
    stream has an arrival order, so the representative is the first
    arrival — the digest SET of survivors is identical, the chosen ids
    may differ (asserted in tests). NULL policy matches batch: a NULL
    document is never a duplicate of anything — Spark's dropDuplicates
    treats NULLs as equal, so NULL-text rows get a per-row surrogate
    key and all survive."""
    digest = F.coalesce(
        F.md5(F.col(text_col)),
        F.concat(F.lit("null:"), F.col(id_col).cast("string")),
    )
    return (
        docs_stream.withColumn("_dg", digest)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_dg"])
        .drop("_dg")
    )


def consolidate_assignments(assigned: DataFrame) -> DataFrame:
    """Batch post-pass over ``stream_assign_clusters`` output
    (periodic, e.g. per checkpoint window): a doc assigned in several
    bands may name different representatives; connected components over
    the (doc, representative) edges merge them into one global
    ``(id, cluster_id)`` labeling with the component-minimum id as the
    label — the same convention as the batch pipeline, so streamed and
    batch cluster ids are directly comparable."""
    from triple_accel_spark.operators.clustering import connected_components

    edges = (
        assigned.select(
            F.col("conv_id").alias("id_a"), F.col("cluster_id").alias("id_b")
        )
        .where(F.col("id_a") != F.col("id_b"))
        .distinct()
        # eager barrier: CC's star passes reference their input 4x per
        # round and its internal lazy checkpoints only truncate after
        # first materialization — without this, the first CC action
        # re-evaluates the upstream (sink scan + distinct) lineage
        # ~4^rounds times (the dedup_near lesson, dedup.py)
        .localCheckpoint(eager=True)
    )
    labels = connected_components(edges)
    all_ids = assigned.select(F.col("conv_id").alias("id")).distinct()
    return all_ids.join(labels, "id", "left").select(
        "id", F.coalesce("cluster_id", F.col("id")).alias("cluster_id")
    )
