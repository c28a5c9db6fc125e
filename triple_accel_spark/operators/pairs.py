"""Candidate-pair self-join with explicit skew handling.

The quadratic danger in blocking-based ER is the hot block: a block of
``n`` records yields ``n(n-1)/2`` pairs, all landing on ONE shuffle
key. At 10^12-turn scale a single viral block would pin one reducer for
hours. Two explicit mechanisms (on top of Spark AQE skew-join
splitting, which cannot split a self-join key that explodes
quadratically):

* **salted sharding** — records in blocks above ``salt_threshold`` are
  deterministically sharded by ``xxhash64(id) % s``; the self-join key
  becomes ``(block, shard_i, shard_j)`` with each record replicated
  into its row/column of the shard triangle, splitting one hot key into
  ``s(s+1)/2`` balanced keys while producing every pair exactly once.
* **block cap** — blocks above ``max_block_size`` are dropped entirely
  (an over-populated key is an uninformative blocking key; standard ER
  practice). Dropped-block counts surface in the metrics sink.

Output pairs are canonicalized ``id_a < id_b`` and de-duplicated across
bands with one id-only ``distinct``; payload columns are re-attached
afterwards so no document/vector bytes ever cross the quadratic part
of the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def candidate_pairs(
    blocked: DataFrame,
    id_col: str = "conv_id",
    block_col: str = "block_key",
    payload_cols: tuple[str, ...] = ("doc",),
    max_block_size: int | None = 2000,
    salt_threshold: int = 64,
    salt_shards: int = 8,
    dedupe: bool = True,
) -> DataFrame:
    """Self-join records sharing a block key into scored-pair candidates.

    Returns one row per unordered pair: ``id_a, id_b, <payload>_a,
    <payload>_b`` with ``id_a < id_b``.

    Shuffle width: the self-join and the cross-band dedupe carry ONLY
    ``(block, shard, id)`` / ``(id_a, id_b)`` rows — payloads (full
    documents, embeddings) never ride the quadratic part of the plan.
    They are re-attached afterwards by two equi-joins against a
    per-record frame (one row per id, built with a map-side-combinable
    ``first`` aggregation), so the widest payload-bearing shuffle is
    linear in the record count, not the pair count. Payload columns
    must be functionally dependent on the id (record attributes
    repeated per band), which every caller satisfies.

    Persist lifecycle: the projected input (and the per-record payload
    frame, consumed by both attach joins) is persisted. The handles are
    exposed as ``result._persisted_frames`` so callers that materialize
    the pairs (e.g. ``pipeline.resolve_entities``) can unpersist them;
    long-lived drivers calling this repeatedly should do so.
    """
    # ONE persisted projection feeds every consumer (size census + both
    # join roles + the payload frame), so the upstream blocking lineage
    # is evaluated exactly once. The cache is in-memory COLUMNAR, so
    # the id/key-only reads below prune the payload columns at the
    # cache scan — payload bytes still never enter the quadratic
    # self-join's shuffles.
    base = blocked.select(
        F.col(id_col).alias("rid"),
        F.col(block_col).alias("bk"),
        *[F.col(c) for c in payload_cols],
    ).persist()
    # round-6: materialize the cache EAGERLY. The consumers below fan
    # out into concurrent AQE stages, and Spark's block-level cache does
    # not serialize concurrent cold computes — profiled runs showed the
    # whole blocking lineage evaluated 2-4x in racing branches ("Block
    # rdd_X already exists" churn). One cheap count pins the cache warm
    # before the fan-out; the pass itself is work every consumer needed
    # anyway.
    base.count()
    persisted = [base]
    recs = base.select("rid", "bk")
    payloads = None
    if payload_cols:
        payloads = (
            base.groupBy("rid")
            .agg(*[F.first(c).alias(c) for c in payload_cols])
            .persist()
        )
        persisted.append(payloads)

    # block sizes: one aggregation, joined back (AQE handles the join)
    sizes = recs.groupBy("bk").agg(F.count(F.lit(1)).alias("bsz"))
    recs = recs.join(sizes, "bk")
    if max_block_size is not None:
        recs = recs.where(F.col("bsz") <= max_block_size)
    # singleton blocks can't produce pairs — prune before the explode
    recs = recs.where(F.col("bsz") >= 2)

    # shard assignment: 1 for cold blocks, hash-mod for hot ones
    hot = F.col("bsz") > salt_threshold
    shard = F.when(
        hot, F.pmod(F.xxhash64(F.col("rid")), F.lit(salt_shards))
    ).otherwise(F.lit(0))
    recs = recs.withColumn("shard", shard).withColumn(
        "nsh", F.when(hot, F.lit(salt_shards)).otherwise(F.lit(1))
    )

    # left role: record in shard s joins shard pairs (s, j) for j >= s
    left = recs.withColumn(
        "other", F.explode(F.sequence(F.col("shard"), F.col("nsh") - 1))
    ).select(
        F.col("bk"),
        F.col("shard").alias("si"),
        F.col("other").alias("sj"),
        F.col("rid").alias("rid_l"),
    )
    # right role: record in shard s joins shard pairs (i, s) for i <= s
    right = recs.withColumn(
        "other", F.explode(F.sequence(F.lit(0), F.col("shard")))
    ).select(
        F.col("bk"),
        F.col("other").alias("si"),
        F.col("shard").alias("sj"),
        F.col("rid").alias("rid_r"),
    )

    joined = left.join(right, ["bk", "si", "sj"])
    same_shard = F.col("si") == F.col("sj")
    joined = joined.where(
        # same shard: strict ordering avoids self-pairs and double emits;
        # cross shard: every pair appears exactly once (l in si, r in sj)
        (same_shard & (F.col("rid_l") < F.col("rid_r")))
        | (~same_shard & (F.col("rid_l") != F.col("rid_r")))
    )

    # canonicalize id_a < id_b (cross-shard pairs may arrive either way)
    flip = F.col("rid_l") > F.col("rid_r")
    pairs = joined.select(
        F.when(flip, F.col("rid_r")).otherwise(F.col("rid_l")).alias("id_a"),
        F.when(flip, F.col("rid_l")).otherwise(F.col("rid_r")).alias("id_b"),
    )

    if dedupe:
        # a pair found by several bands must be scored once — the
        # distinct shuffles (id_a, id_b) rows only.
        # round-6: pin the dedupe exchange's parallelism with a keyed
        # repartition. The ids-only rows are tiny (16 B/pair), so AQE's
        # byte-based coalescing collapsed this exchange to 1-2
        # partitions — and the payload re-attach (broadcast joins) plus
        # the caller's kernel UDF inherit that near-serial partitioning
        # (measured: link_records scoring 17.9-21.9s starved vs
        # 9.3-16.0s pinned on 1.58M pairs; defaultParallelism beat 2x
        # and unpinned across the q4b/q8 shapes in alternating A/Bs and
        # is neutral on the small q2 shape). The keyed repartition
        # satisfies the distinct's distribution requirement, so it
        # REPLACES the implicit exchange rather than adding one; the
        # count is cluster-proportional, not a local constant.
        n_out = blocked.sparkSession.sparkContext.defaultParallelism
        pairs = pairs.repartition(n_out, "id_a", "id_b").dropDuplicates()

    if payloads is not None:
        pa = payloads.select(
            F.col("rid").alias("id_a"),
            *[F.col(c).alias(f"{c}_a") for c in payload_cols],
        )
        pb = payloads.select(
            F.col("rid").alias("id_b"),
            *[F.col(c).alias(f"{c}_b") for c in payload_cols],
        )
        pairs = (
            pairs.join(pa, "id_a")
            .join(pb, "id_b")
            .select(
                "id_a", "id_b",
                *[f"{c}_{s}" for c in payload_cols for s in ("a", "b")],
            )
        )
    pairs._persisted_frames = persisted
    return pairs


def block_stats(blocked: DataFrame, block_col: str = "block_key") -> DataFrame:
    """Block-size distribution for skew diagnostics / metrics sink."""
    sizes = blocked.groupBy(block_col).agg(F.count(F.lit(1)).alias("bsz"))
    return sizes.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.max("bsz").alias("max_block"),
        F.expr("percentile_approx(bsz, 0.99)").alias("p99_block"),
        F.sum(F.expr("bsz * (bsz - 1) / 2")).alias("naive_pairs"),
    )


def blocking_quality(
    cand_pairs: DataFrame,
    truth_pairs: DataFrame,
    total_possible_pairs: int,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Standard blocking diagnostics as one row: **pair completeness**
    (fraction of ground-truth matching pairs that survive blocking —
    the recall ceiling of everything downstream) and **reduction
    ratio** (1 − candidates / total possible pairs — what blocking
    bought). Tuning blocking IS trading these two; the pipeline's
    headline F1 cannot exceed the pair completeness measured here.

    Both inputs carry ``(id_a, id_b)`` under the caller's pair
    convention (canonicalized ``id_a < id_b`` for self-join dedup,
    table-role order for two-table linkage). ``total_possible_pairs``
    is ``n(n-1)/2`` or ``|L|·|R|`` respectively — a driver-side scalar
    the caller already has. One semi-join and two counts; no payloads
    shuffled."""
    cand = cand_pairs.select(id_a, id_b)
    truth = truth_pairs.select(id_a, id_b)
    covered = truth.join(cand, [id_a, id_b], "left_semi")
    row = (
        truth.agg(F.count(F.lit(1)).alias("n_truth"))
        .crossJoin(covered.agg(F.count(F.lit(1)).alias("n_covered")))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
    )
    return row.select(
        F.col("n_candidates").cast("long").alias("n_candidates"),
        F.col("n_truth").cast("long").alias("n_truth"),
        F.col("n_covered").cast("long").alias("n_covered"),
        (
            F.col("n_covered").cast("double")
            / F.greatest(F.col("n_truth"), F.lit(1)).cast("double")
        ).alias("pair_completeness"),
        (
            F.lit(1.0)
            - F.col("n_candidates").cast("double")
            / F.lit(float(max(total_possible_pairs, 1)))
        ).alias("reduction_ratio"),
    )
