"""Transitive clustering: connected components over the match-edge
graph, via alternating large-star / small-star contraction (Kiveris et
al., "Connected Components in MapReduce and Beyond" — the standard
shuffle-bounded CC for web-scale graphs; converges in O(log^2 n) rounds
vs O(diameter) for plain label propagation).

Each round is two aggregation+join passes expressed purely in
DataFrame ops (no collect_list — hot nodes stay scalable because the
per-node minimum is an aggregation, not a materialized neighbor list).

Checkpoint/resume: every iteration writes the current edge set to
``{checkpoint_dir}/iter_NNNN`` plus a ``manifest.json``; a restarted
job resumes from the highest committed iteration (north-rule
requirement: resumable from checkpoint). Parquet round-trips also cut
lineage so plans don't grow across iterations. Per-iteration metric
rows (edge counts, checksum, converged flag) append to
``{checkpoint_dir}/metrics``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to u's neighborhood
    minimum (including u itself).

    Plan shape (round-6 rewrite): the per-node minimum is a window over
    the SAME partitioning the old groupBy+join pair needed three
    exchanges for (guide §2.4 — operations keyed alike share one
    exchange), and both edge directions come from one explode instead
    of a union that scanned the edge RDD twice. One shuffle per star
    pass; output identical. The output is NOT deduplicated here: the
    following ``_small_star`` dedupes its own output, so a round stays
    distinct while saving one exchange per round (duplicate (v, m)
    rows only thicken the next window's input marginally)."""
    w = Window.partitionBy("u")
    bid = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("a"), F.col("v").alias("b")),
                F.struct(F.col("v").alias("a"), F.col("u").alias("b")),
            )
        ).alias("_e")
    ).select(F.col("_e.a").alias("u"), F.col("_e.b").alias("v"))
    return (
        bid.withColumn("m", F.least(F.min("v").over(w), F.col("u")))
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's smaller-or-equal neighborhood, point everything
    at the minimum.

    Same one-exchange window form as ``_large_star``; the (u, m)
    self-rows the old formulation emitted once per node via the
    ``mins`` frame are emitted once per edge row here and collapsed by
    the final ``distinct`` (which the round needs anyway), so the
    output set is identical."""
    w = Window.partitionBy("u")
    dir_e = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    r = dir_e.withColumn("m", F.min("v").over(w))
    return (
        r.select(F.explode(F.array("v", "u")).alias("n"), "m")
        .where(F.col("n") != F.col("m"))
        .distinct()
        .select(F.col("n").alias("u"), F.col("m").alias("v"))
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        # xor-fold is order-insensitive and cannot overflow (edges are
        # distinct after _small_star, so xor cancellation is safe)
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _manifest_path(d: str) -> str:
    return os.path.join(d, "manifest.json")


def _read_manifest(d: str) -> dict | None:
    p = _manifest_path(d)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return None


def _write_manifest(d: str, payload: dict) -> None:
    tmp = _manifest_path(d) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    os.replace(tmp, _manifest_path(d))


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    checkpoint_dir: str | None = None,
    max_iter: int = 25,
    checkpoint_interval: int = 2,
) -> DataFrame:
    """Return ``(id, cluster_id)`` where ``cluster_id`` is the minimum
    id in each component (deterministic — reruns are idempotent).

    Ids may be any orderable type (strings work). Nodes appearing only
    as singletons must be unioned in by the caller (see
    ``attach_singletons``).

    ``checkpoint_interval`` star rounds run between driver ACTIONS
    (convergence checksum / durable checkpoint): every round is still
    lazily local-checkpointed — a LogicalRDD barrier that keeps the
    logical plan constant-size (each star pass references its input
    4x, so un-truncated lineage grows ~4^rounds and planning time
    explodes) — but only interval rounds pay a job: the checksum
    action materializes everything since the last one. The contraction
    is monotone, so a fixed point reached mid-interval is still
    detected at the next checkpoint, trading at most ``interval-1``
    extra cheap rounds for half (at 2) the actions and durable
    checkpoint writes. Resume granularity is the checkpointed round."""
    spark = edges.sparkSession
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).where(
        F.col("u") != F.col("v")
    )

    start_iter = 0
    prev_sig: tuple[int, int] | None = None
    if checkpoint_dir:
        man = _read_manifest(checkpoint_dir)
        if man and man.get("iterations"):
            last = man["iterations"][-1]
            e = spark.read.parquet(last["path"])
            start_iter = last["iteration"] + 1
            prev_sig = (last["n_edges"], last["checksum"])

    manifest = _read_manifest(checkpoint_dir) if checkpoint_dir else None
    manifest = manifest or {"iterations": []}

    checkpoint_interval = max(1, checkpoint_interval)
    for it in range(start_iter, max_iter):
        e = _small_star(_large_star(e))
        at_cp = (
            (it - start_iter + 1) % checkpoint_interval == 0
            or it == max_iter - 1
        )
        if checkpoint_dir and at_cp:
            path = os.path.join(checkpoint_dir, f"iter_{it:04d}")
            e.write.mode("overwrite").parquet(path)
            e = spark.read.parquet(path)
        else:
            # lazy barrier: plan becomes a LogicalRDD (constant size);
            # the RDD materializes with the next action, so deferred
            # rounds cost no job of their own
            e = e.localCheckpoint(eager=False)
        if not at_cp:
            continue
        sig = _checksum(e)
        converged = sig == prev_sig
        if checkpoint_dir:
            manifest["iterations"].append(
                {
                    "iteration": it,
                    "path": path,
                    "n_edges": sig[0],
                    "checksum": sig[1],
                    "converged": converged,
                }
            )
            _write_manifest(checkpoint_dir, manifest)
            spark.createDataFrame(
                [(it, sig[0], sig[1], converged)],
                "iteration int, n_edges long, checksum long, converged boolean",
            ).write.mode("append").parquet(os.path.join(checkpoint_dir, "metrics"))
        if converged:
            break
        prev_sig = sig

    # after convergence every edge is (node, component-min)
    labels = e.select(F.col("u").alias("id"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("id")).distinct().join(
        labels.select("id"), "id", "left_anti"
    ).withColumn("cluster_id", F.col("id"))
    return labels.union(roots)


def local_connected_components(edges: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Driver-local union-find over a SMALL edge set: same
    ``(id, cluster_id=min id of component)`` contract as
    ``connected_components``, in one collect + one createDataFrame.

    This is the bounded small-graph fast path: an iterative star
    contraction costs ~10 Spark stages per round regardless of size,
    which dominates end-to-end wall time when the match graph is tiny
    (thousands of edges). Callers that already know the edge count
    (``resolve_entities`` counts matches for its metrics) route here
    below ``cc_local_threshold`` and to the distributed algorithm
    above it — at 10^12-turn scale the threshold never triggers; this
    is strictly a small-job latency optimization, never a scalability
    crutch (the collect is bounded by the caller's threshold)."""
    spark = edges.sparkSession
    rows = edges.select(src, dst).collect()
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in rows:
        u, v = r[0], r[1]
        if u == v:
            continue
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    # min id per component (deterministic, matches the distributed path)
    comp_min: dict = {}
    for x in parent:
        rx = find(x)
        if rx not in comp_min or x < comp_min[rx]:
            comp_min[rx] = x
    out = [(x, comp_min[find(x)]) for x in parent]
    id_type = edges.schema[src].dataType
    from pyspark.sql.types import StructField, StructType

    schema = StructType(
        [StructField("id", id_type), StructField("cluster_id", id_type)]
    )
    return spark.createDataFrame(out, schema)


def attach_singletons(
    labels: DataFrame, all_ids: DataFrame, id_col: str = "conv_id"
) -> DataFrame:
    """Union in self-labeled clusters for records that produced no
    match edge."""
    ids = all_ids.select(F.col(id_col).alias("id")).distinct()
    singles = ids.join(labels.select("id"), "id", "left_anti").withColumn(
        "cluster_id", F.col("id")
    )
    return labels.union(singles)
