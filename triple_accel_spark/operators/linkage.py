"""Two-table record linkage: block -> candidate A x B join -> score ->
best-match assignment.

The self-join pipeline (``pipeline.resolve_entities``) deduplicates ONE
table; this module links records ACROSS two tables (the other classic
entity-resolution shape: match new/incoming records against a reference
corpus, reconcile two independently-collected datasets). Reference
parity: the scoring kernels are the same triple_accel edit-distance
family (levenshtein.rs / hamming.rs); the two-table plumbing is the
graft axis.

Scale design mirrors ``operators.pairs.candidate_pairs``:

* the block join carries ONLY ``(block, shard, id)`` rows — payloads are
  re-attached per side after the cross-band dedupe, so the widest
  payload shuffle is linear in each table's record count, never the
  candidate-pair count;
* hot blocks (candidate volume ``|L_b| * |R_b|`` above
  ``salt_threshold``) are split by deterministically sharding the RIGHT
  side on ``xxhash64(id) % s`` and replicating LEFT rows across the
  ``s`` shards — one hot key becomes ``s`` balanced keys and every
  (left, right) pair still appears exactly once per block. (A two-table
  join only needs one salted side — unlike the self-join's shard
  triangle — because there is no canonicalization collapsing mirrored
  pairs.)
* blocks whose candidate volume exceeds ``max_block_pairs`` are dropped
  entirely (an uninformative key; standard ER practice), surfaced in
  the metrics.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from triple_accel_spark.kernels.costs import EditCosts, LEVENSHTEIN_COSTS
from triple_accel_spark.operators.blocking import (
    with_minhash_blocks,
    with_prefix_blocks,
)
from triple_accel_spark.operators.scoring import relative_k_col, score_pairs


def candidate_links(
    blocked_left: DataFrame,
    blocked_right: DataFrame,
    id_col: str = "id",
    block_col: str = "block_key",
    payload_cols: tuple[str, ...] = ("text",),
    max_block_pairs: int | None = 1_000_000,
    salt_threshold: int = 4096,
    salt_shards: int = 8,
    dedupe: bool = True,
    prune_threshold: float | None = None,
    prune_text_col: str | None = None,
    prune_costs: EditCosts = LEVENSHTEIN_COSTS,
    payload_left: DataFrame | None = None,
    payload_right: DataFrame | None = None,
) -> DataFrame:
    """Join left x right records sharing a block key into candidate
    links: one row per (left, right) pair — ``id_l, id_r,
    <payload>_l..., <payload>_r...``.

    Both inputs carry ``id_col``, ``block_col`` and the payload columns
    (payloads functionally dependent on the id — attributes repeated
    per band). Ids need not be disjoint across tables: the pair keeps
    table roles, no cross-table canonicalization.

    Early length prune (``prune_threshold`` + ``prune_text_col``): a
    pair can only reach similarity ``t`` on column ``c`` if
    ``gap_cost * |len_l - len_r| + start_gap <= (1-t) *
    greatest(len_l, len_r)`` — exactly the bound
    ``scoring.score_pairs`` applies via ``length_prefilter`` +
    ``relative_k_col``, so pruning here changes nothing downstream
    when the caller scores with a per-pair relative k. Applying it on
    fixed-width length ints BEFORE the cross-band dedupe and the
    payload re-attach keeps length-incompatible pairs (the bulk of LSH
    false candidates on a mixed-length corpus) out of the distinct
    shuffle and the payload joins entirely.

    Persist lifecycle: the per-side projections (feeding the size
    census, the join, and — without ``payload_left``/``payload_right``
    — the payload re-attach) are persisted and exposed as
    ``result._persisted_frames`` for callers that materialize the pairs
    to release.

    ``payload_left``/``payload_right`` (round-6): one-row-per-id frames
    carrying ``(id_col, payload_cols...)`` — normally the caller's raw
    input tables. When given, payloads re-attach from them directly and
    the per-side ``groupBy(rid).first(...)`` dedup aggregations (one
    full pass over each band table) are skipped; results are identical
    because the blocked payloads are the same attributes repeated per
    band.
    """
    prune = prune_threshold is not None and prune_text_col is not None
    ext_payloads = payload_left is not None and payload_right is not None
    sides = []
    persisted = []
    for side, blocked in (("l", blocked_left), ("r", blocked_right)):
        cols = [
            F.col(id_col).alias("rid"),
            F.col(block_col).alias("bk"),
            *([] if ext_payloads else [F.col(c) for c in payload_cols]),
        ]
        if prune:
            cols.append(F.length(prune_text_col).alias("_len"))
        base = blocked.select(*cols).persist()
        # eager: the volume census and both join roles fan out into
        # concurrent cold-cache branches otherwise (see
        # pairs.candidate_pairs)
        base.count()
        persisted.append(base)
        sides.append(base)
    left, right = sides

    # per-block candidate volume |L_b| * |R_b| from ONE aggregation
    # over the tagged union of both sides (round-6: the former
    # per-side aggs + inner join cost two extra shuffles/barriers for
    # the same numbers; blocks missing on a side have a zero count and
    # are dropped by the > 0 filter exactly as the inner join dropped
    # them)
    tagged = left.select("bk", F.lit(1).alias("_l")).unionByName(
        right.select("bk", F.lit(0).alias("_l"))
    )
    vol = (
        tagged.groupBy("bk")
        .agg(
            F.sum("_l").alias("lsz"),
            F.sum(F.lit(1) - F.col("_l")).alias("rsz"),
        )
        .where((F.col("lsz") > 0) & (F.col("rsz") > 0))
        .select("bk", (F.col("lsz") * F.col("rsz")).alias("vol"))
    )
    if max_block_pairs is not None:
        vol = vol.where(F.col("vol") <= max_block_pairs)

    hot = F.col("vol") > salt_threshold
    lens = ["_len"] if prune else []
    # right role: each record lands in its own shard (hot) or shard 0
    r = (
        right.select("rid", "bk", *lens)
        .join(vol, "bk")
        .select(
            "bk",
            F.when(hot, F.pmod(F.xxhash64(F.col("rid")), F.lit(salt_shards)))
            .otherwise(F.lit(0))
            .alias("shard"),
            F.col("rid").alias("rid_r"),
            *[F.col(c).alias(f"{c}_r") for c in lens],
        )
    )
    # left role: replicate across all live shards of the block
    l = (
        left.select("rid", "bk", *lens)
        .join(vol, "bk")
        .select(
            "bk",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.when(hot, F.lit(salt_shards - 1)).otherwise(F.lit(0)),
                )
            ).alias("shard"),
            F.col("rid").alias("rid_l"),
            *[F.col(c).alias(f"{c}_l") for c in lens],
        )
    )
    joined = l.join(r, ["bk", "shard"])
    if prune:
        # same bound as scoring's length_prefilter(relative_k_col(t)),
        # on the precomputed ints: prune BEFORE dedupe + payload joins
        k_pair = F.ceil(
            F.lit(1.0 - prune_threshold)
            * F.greatest(F.col("_len_l"), F.col("_len_r"), F.lit(1)).cast(
                "double"
            )
        ).cast("int")
        unit_k = F.floor(
            F.greatest(k_pair - F.lit(prune_costs.start_gap_cost), F.lit(0))
            / F.lit(prune_costs.gap_cost)
        )
        joined = joined.where(
            F.abs(F.col("_len_l") - F.col("_len_r")) <= unit_k
        )
    pairs = joined.select(
        F.col("rid_l").alias("id_l"), F.col("rid_r").alias("id_r")
    )
    if dedupe:
        # a pair found by several bands must be scored once.
        # round-6: keyed repartition pins the dedupe exchange's
        # parallelism (same rationale and measurement as
        # pairs.candidate_pairs — AQE coalesced the 16 B/row ids-only
        # exchange to 1-2 partitions and the downstream payload attach
        # + scoring kernel inherited the starvation).
        n_out = pairs.sparkSession.sparkContext.defaultParallelism
        pairs = pairs.repartition(n_out, "id_l", "id_r").dropDuplicates()

    if payload_cols:
        if ext_payloads:
            pl = payload_left.select(
                F.col(id_col).alias("id_l"),
                *[F.col(c).alias(f"{c}_l") for c in payload_cols],
            )
            pr = payload_right.select(
                F.col(id_col).alias("id_r"),
                *[F.col(c).alias(f"{c}_r") for c in payload_cols],
            )
        else:
            pl = left.groupBy("rid").agg(
                *[F.first(c).alias(c) for c in payload_cols]
            ).select(
                F.col("rid").alias("id_l"),
                *[F.col(c).alias(f"{c}_l") for c in payload_cols],
            )
            pr = right.groupBy("rid").agg(
                *[F.first(c).alias(c) for c in payload_cols]
            ).select(
                F.col("rid").alias("id_r"),
                *[F.col(c).alias(f"{c}_r") for c in payload_cols],
            )
        pairs = (
            pairs.join(pl, "id_l")
            .join(pr, "id_r")
            .select(
                "id_l", "id_r",
                *[f"{c}_{s}" for c in payload_cols for s in ("l", "r")],
            )
        )
    pairs._persisted_frames = persisted
    return pairs


@dataclass
class LinkConfig:
    """Configuration for ``link_records`` (defaults match
    ``pipeline.ResolveConfig`` where the stages are shared)."""

    q: int = 3
    num_hashes: int = 32
    num_bands: int = 16
    blocking: str = "minhash"  # or "prefix" (SQL-expressible, oracle-able)
    prefix_len: int = 16
    sim_threshold: float = 0.88
    per_pair_k: bool = True
    costs: EditCosts = field(default_factory=lambda: LEVENSHTEIN_COSTS)
    # "edit" (normalized edit similarity, k-prunable) or "jaro_winkler"
    # (the name-field comparator; per-pair k does not apply — the
    # Catalyst-native prune becomes the JW length-ratio bound)
    scorer: str = "edit"
    max_block_pairs: int | None = 1_000_000
    salt_threshold: int = 4096
    salt_shards: int = 8
    # "right": best left partner per right record (match incoming
    # records against a reference corpus); "left": the converse;
    # None skips the assignment stage
    best_per: str | None = "right"


@dataclass
class LinkResult:
    pairs_scored: DataFrame
    matches: DataFrame
    best: DataFrame | None
    metrics: dict

    def unpersist(self, blocking: bool = True) -> None:
        self.pairs_scored.unpersist(blocking=blocking)

    def __enter__(self) -> "LinkResult":
        return self

    def __exit__(self, *exc) -> bool:
        self.unpersist()
        return False


def link_records(
    left: DataFrame,
    right: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    cfg: LinkConfig | None = None,
) -> LinkResult:
    """Link two record tables on fuzzy text similarity.

    Inputs carry ``(id_col, text_col)``; blocking keys are generated
    identically on both sides (two tables only collide when their keys
    agree, so the blocking function must be shared). Returns all scored
    candidate pairs, the pairs at/above ``sim_threshold``, and — when
    ``cfg.best_per`` is set — the single best partner per record of
    that side (deterministic: max ``sim``, then min ``dist``, then min
    partner id), the standard one-to-many assignment for matching
    incoming records against a reference corpus.
    """
    cfg = cfg or LinkConfig()
    metrics: dict = {}

    def block(df):
        if cfg.blocking == "prefix":
            return with_prefix_blocks(df, text_col, prefix_len=cfg.prefix_len)
        return with_minhash_blocks(
            df, text_col, q=cfg.q, num_hashes=cfg.num_hashes,
            num_bands=cfg.num_bands, id_col=id_col,
        )

    pairs = candidate_links(
        block(left),
        block(right),
        id_col=id_col,
        block_col="block_key",
        payload_cols=(text_col,),
        # raw inputs are one row per id, so payloads re-attach from
        # them directly (skips one groupBy-dedup pass per side)
        payload_left=left,
        payload_right=right,
        max_block_pairs=cfg.max_block_pairs,
        salt_threshold=cfg.salt_threshold,
        salt_shards=cfg.salt_shards,
        # with per-pair k the scoring stage filters on exactly this
        # bound anyway (length_prefilter + relative_k_col), so the
        # early prune is a pure plan optimization; without per-pair k
        # the caller wants every candidate scored — skip it. The prune
        # bound is edit-distance-specific: under the jaro_winkler
        # scorer it stays off and jw_length_bound prunes at scoring.
        prune_threshold=(
            cfg.sim_threshold
            if cfg.per_pair_k and cfg.scorer == "edit"
            else None
        ),
        prune_text_col=(
            text_col if cfg.per_pair_k and cfg.scorer == "edit" else None
        ),
        prune_costs=cfg.costs,
    )
    tl, tr = f"{text_col}_l", f"{text_col}_r"
    k = (
        relative_k_col(cfg.sim_threshold, tl, tr)
        if cfg.per_pair_k and cfg.scorer == "edit"
        else None
    )
    scored = score_pairs(
        pairs, tl, tr, k=k, costs=cfg.costs, sim_threshold=None,
        scorer=cfg.scorer,
        # mirror the edit path's threshold-implied prune (there, k
        # NULLs out beyond-budget pairs even with the final filter
        # deferred): bound JW candidates by the length-ratio prune
        prune_threshold=(
            cfg.sim_threshold if cfg.scorer == "jaro_winkler" else None
        ),
    ).cache()
    row = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("sim") >= cfg.sim_threshold, 1)).alias("m"),
    ).collect()[0]
    metrics["n_pairs_scored"] = row["n"]
    metrics["n_matches"] = row["m"]
    for fr in getattr(pairs, "_persisted_frames", []):
        fr.unpersist()

    matches = scored.where(F.col("sim") >= cfg.sim_threshold)

    best = None
    if cfg.best_per:
        keep, other = (
            ("id_r", "id_l") if cfg.best_per == "right" else ("id_l", "id_r")
        )
        # groups are candidate lists per record — bounded by the block
        # cap, so the per-group sort is small; the shuffle is one
        # hash-partition on the kept id (linear in match count)
        w = Window.partitionBy(keep).orderBy(
            F.col("sim").desc(), F.col("dist").asc(), F.col(other).asc()
        )
        best = (
            matches.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    return LinkResult(scored, matches, best, metrics)


def assign_to_clusters(
    clustered: DataFrame,
    new_records: DataFrame,
    text_col: str = "text",
    id_col: str = "id",
    cluster_col: str = "cluster_id",
    cfg: LinkConfig | None = None,
) -> DataFrame:
    """Incrementally assign NEW records to an EXISTING clustering —
    the batch twin of ``streaming.stream_assign_clusters``: link each
    new record against the clustered corpus (blocking + scoring +
    best-match), inherit the best partner's cluster id above the
    threshold, and open a singleton cluster (labeled with the record's
    own id — callers keep id spaces disjoint) otherwise.

    ``clustered`` carries ``(id_col, text_col, cluster_col)`` — every
    member row, so a new record can match ANY member of a cluster, not
    only its representative. Returns one row per new record:
    ``(id, cluster_id, matched_id, dist, sim, is_new)``.

    Like the streaming operator, this is representative-shaped
    assignment, not a re-resolution: two new records that match each
    other but no existing cluster become two singletons. When that
    matters, run ``pipeline.resolve_entities`` on the union instead —
    incremental assignment is the O(new × corpus-candidates) path for
    appending to a settled clustering without touching it."""
    cfg = cfg or LinkConfig(best_per="right")
    res = link_records(
        clustered.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")),
        new_records.select(F.col(id_col).alias("id"), F.col(text_col).alias("text")),
        cfg=LinkConfig(
            q=cfg.q, num_hashes=cfg.num_hashes, num_bands=cfg.num_bands,
            blocking=cfg.blocking, prefix_len=cfg.prefix_len,
            sim_threshold=cfg.sim_threshold, per_pair_k=cfg.per_pair_k,
            costs=cfg.costs, max_block_pairs=cfg.max_block_pairs,
            salt_threshold=cfg.salt_threshold, salt_shards=cfg.salt_shards,
            best_per="right", scorer=cfg.scorer,
        ),
    )
    labels = clustered.select(
        F.col(id_col).alias("id_l"), F.col(cluster_col).alias("_cl")
    )
    best = res.best.join(labels, "id_l")
    out = (
        new_records.select(F.col(id_col).alias("id"))
        .join(best.withColumnRenamed("id_r", "id"), "id", "left")
        .select(
            "id",
            F.coalesce(F.col("_cl"), F.col("id")).alias(cluster_col),
            F.col("id_l").alias("matched_id"),
            "dist", "sim",
            F.col("id_l").isNull().alias("is_new"),
        )
    )
    # the scored cache only backed the best-match computation here:
    # materialize the (narrow) assignment frame, then release it. The
    # result's own persist handle is exposed via _persisted_frames,
    # matching the candidate_pairs/candidate_links convention.
    out = out.persist()
    out.count()
    res.unpersist()
    out._persisted_frames = [out]
    return out
