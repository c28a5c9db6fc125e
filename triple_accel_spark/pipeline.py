"""End-to-end entity resolution over transcript tables.

    scan -> assemble docs -> MinHash blocking -> salted pair self-join
    -> length-prune -> vectorized edit-distance scoring -> threshold
    -> connected components (checkpointed) -> clusters + metrics

The stages are the Spark-native re-expression of the reference's
kernel family (BASELINE.json north_star); each stage is independently
importable from ``triple_accel_spark.operators``.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from triple_accel_spark.kernels.costs import EditCosts, LEVENSHTEIN_COSTS
from triple_accel_spark.operators.assemble import assemble_documents
from triple_accel_spark.operators.blocking import (
    with_minhash_blocks,
    with_prefix_blocks,
)
from triple_accel_spark.operators.clustering import (
    attach_singletons,
    connected_components,
)
from triple_accel_spark.operators.pairs import candidate_pairs
from triple_accel_spark.operators.scoring import relative_k_col, score_pairs


@dataclass
class ResolveConfig:
    # blocking defaults tuned on the mutation-stress corpus: 16 bands
    # of 2 hashes with 3-gram shingles holds pairwise F1 = 1.0 at 8%
    # edit budget and 0.993 at 12% (8x2/q=4 dropped to 0.991/0.966),
    # at identical candidate-pair volume
    q: int = 3
    num_hashes: int = 32
    num_bands: int = 16
    # "minhash" (LSH bands — the recall-tuned default) or "prefix"
    # (normalized-prefix key: cheaper, deterministic, SQL-expressible —
    # also what the DuckDB-oracled driver queries use)
    blocking: str = "minhash"
    prefix_len: int = 16
    sim_threshold: float = 0.88
    k_frac: float = 0.2  # distance budget as a fraction of doc length
    # per-pair k = ceil((1-sim_threshold) * max(len_a, len_b)) — the
    # reference's per-call k semantics; False falls back to one
    # corpus-global k from max doc_len (an outlier-long doc then widens
    # every pair's band, and costs an extra driver action)
    per_pair_k: bool = True
    max_block_size: int | None = 5000
    salt_threshold: int = 64
    salt_shards: int = 8
    costs: EditCosts = field(default_factory=lambda: LEVENSHTEIN_COSTS)
    checkpoint_dir: str | None = None
    cc_max_iter: int = 25
    cc_checkpoint_interval: int = 2
    # match graphs at or below this edge count cluster driver-locally
    # (union-find over one bounded collect); above it, the distributed
    # star contraction runs. n_matches is already counted for metrics,
    # so the routing costs nothing. 0 disables the local path.
    cc_local_threshold: int = 100_000
    metrics_dir: str | None = None  # per-partition lineage sink
    run_id: str = "run0"


@dataclass
class ResolveResult:
    docs: DataFrame
    pairs_scored: DataFrame
    matches: DataFrame
    clusters: DataFrame
    metrics: dict

    def unpersist(self, blocking: bool = True) -> None:
        """Release the caches backing the returned frames (``docs``,
        ``pairs_scored``, ``clusters``; ``matches`` is a filter over
        ``pairs_scored``). Call when done consuming the result —
        repeated ``resolve_entities`` invocations in one long-lived
        driver otherwise accumulate executor storage. Blocking by
        default so storage is verifiably flat on return. Also usable as
        a context manager: ``with resolve_entities(t) as res: ...``."""
        for df in (self.docs, self.pairs_scored, self.clusters):
            df.unpersist(blocking=blocking)

    def __enter__(self) -> "ResolveResult":
        return self

    def __exit__(self, *exc) -> bool:
        self.unpersist()
        return False


def resolve_entities(transcripts: DataFrame, cfg: ResolveConfig | None = None) -> ResolveResult:
    """Run the full pipeline; returns intermediate and final frames plus
    a driver-side metrics dict (stage row counts)."""
    cfg = cfg or ResolveConfig()
    metrics: dict = {}
    import time as _time

    _t0 = _time.time()

    def commit(df, stage, **kw):
        if cfg.metrics_dir:
            from triple_accel_spark.operators.lineage import commit_stage_metrics

            metrics[f"lineage_{stage}"] = commit_stage_metrics(
                df, stage, cfg.metrics_dir, run_id=cfg.run_id, **kw
            )

    docs = assemble_documents(transcripts).cache()
    commit(docs, "docs", size_col="doc", id_col="conv_id")

    if cfg.per_pair_k:
        # per-pair distance budget (reference per-call k semantics).
        # Round-6: the docs cache is materialized HERE (one count, which
        # also provides the n_docs metric) — blocking, the candidate
        # machinery and the payload re-attach all fan out from `docs`,
        # and with a cold cache those concurrent branches each re-ran
        # the assemble aggregation (profiled: 4 duplicate evaluations
        # inside one pipeline run; Spark's block cache does not
        # serialize concurrent cold computes).
        metrics["n_docs"] = docs.count()
        k = relative_k_col(cfg.sim_threshold, "doc_a", "doc_b")
        metrics["k_cutoff"] = "per_pair"
    else:
        # corpus-global budget: k such that sim_threshold is reachable
        # for the longest docs (the per-pair normalized threshold is
        # still enforced exactly afterwards). The max-length probe is
        # the ONE pre-blocking action in this mode, fused with the
        # n_docs census so it is not a separate pass
        row = docs.agg(
            F.count(F.lit(1)).alias("n"), F.max("doc_len").alias("m")
        ).collect()[0]
        metrics["n_docs"] = row["n"]
        max_len = row["m"] or 1
        k = max(1, int((1.0 - cfg.sim_threshold) * max_len) + 1)
        metrics["k_cutoff"] = k

    if cfg.blocking == "prefix":
        blocked = with_prefix_blocks(docs, "doc", prefix_len=cfg.prefix_len)
    else:
        blocked = with_minhash_blocks(
            docs, "doc", q=cfg.q, num_hashes=cfg.num_hashes, num_bands=cfg.num_bands
        )
    pairs = candidate_pairs(
        blocked,
        id_col="conv_id",
        block_col="block_key",
        payload_cols=("doc",),
        max_block_size=cfg.max_block_size,
        salt_threshold=cfg.salt_threshold,
        salt_shards=cfg.salt_shards,
    )

    scored = score_pairs(
        pairs,
        "doc_a",
        "doc_b",
        k=k,
        costs=cfg.costs,
        sim_threshold=None,
    ).cache()
    # one action materializes the cache AND yields both stage counts
    # (map-side-combinable conditional count instead of a second pass)
    row = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.count(F.when(F.col("sim") >= cfg.sim_threshold, 1)).alias("m"),
    ).collect()[0]
    metrics["n_pairs_scored"] = row["n"]
    metrics["n_matches"] = row["m"]
    # stage wall times (driver action boundaries): scaling diagnostics
    # — which stage stops scaling with cores shows up here, not in
    # the end-to-end wall alone
    metrics["t_score_action"] = round(_time.time() - _t0, 3)
    _t0 = _time.time()
    if "n_docs" not in metrics:
        metrics["n_docs"] = docs.count()
    commit(scored, "pairs_scored", size_col="doc_a", id_col="id_a")
    if cfg.metrics_dir:
        # lineage mode pays one extra census pass per stage anyway;
        # the pre-cutoff candidate census makes the PRUNE count a
        # recorded lineage fact (north-rule metric rows: pairs scored,
        # prunes, cluster merges) instead of prose. n_pruned counts
        # candidates dropped by the k cutoff end to end — the Catalyst
        # length prefilter plus the kernel's bound/band rejects.
        commit(pairs, "candidates", size_col="doc_a", id_col="id_a")
        metrics["n_candidates"] = metrics["lineage_candidates"]["n_rows"]
        metrics["n_pruned"] = metrics["n_candidates"] - metrics["n_pairs_scored"]
    # scored is materialized in its own cache now — release the pair
    # join's internal persist (ADVICE: no unbounded cache accumulation
    # across repeated invocations in one driver)
    for fr in getattr(pairs, "_persisted_frames", []):
        fr.unpersist()

    matches = scored.where(F.col("sim") >= cfg.sim_threshold)
    commit(matches, "matches", id_col="id_a")

    if metrics["n_matches"] <= cfg.cc_local_threshold and not cfg.checkpoint_dir:
        # bounded small-graph fast path (see local_connected_components);
        # checkpointed jobs always take the resumable distributed path
        from triple_accel_spark.operators.clustering import (
            local_connected_components,
        )

        labels = local_connected_components(matches.select("id_a", "id_b"))
        metrics["cc_path"] = "local"
    else:
        labels = connected_components(
            matches.select("id_a", "id_b"),
            checkpoint_dir=cfg.checkpoint_dir,
            max_iter=cfg.cc_max_iter,
            checkpoint_interval=cfg.cc_checkpoint_interval,
        )
        metrics["cc_path"] = "distributed"
    metrics["t_cc_label"] = round(_time.time() - _t0, 3)
    _t0 = _time.time()
    clusters = attach_singletons(labels, docs, "conv_id").cache()
    crow = clusters.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("cluster_id").alias("c"),
    ).collect()[0]
    metrics["n_records"] = crow["n"]
    metrics["n_clusters"] = crow["c"]
    metrics["t_cluster_action"] = round(_time.time() - _t0, 3)
    commit(clusters, "clusters", id_col="id")

    return ResolveResult(docs, scored, matches, clusters, metrics)
