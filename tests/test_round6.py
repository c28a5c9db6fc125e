"""Round-6 optimization invariants: plan shapes the round's measured
wins depend on (see OPTIMIZATION_r06.md for the A/B evidence)."""

from __future__ import annotations

import re

import pyspark.sql.functions as F

from triple_accel_spark.operators.linkage import candidate_links
from triple_accel_spark.operators.pairs import candidate_pairs
from triple_accel_spark.operators.similarity import lsh_all_pairs_topk


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pair_dedupe_exchange_is_pinned(spark):
    """The cross-band dedupe's exchange must be the user-specified
    keyed repartition (exempt from AQE byte-based coalescing, which
    collapsed the 16 B/row ids-only exchange to 1-2 partitions and
    starved the downstream payload attach + scoring kernel) — and it
    must REPLACE the distinct's implicit exchange, not stack under it."""
    blocked = spark.range(40).select(
        F.col("id").alias("rid"),
        (F.col("id") % 5).alias("bk"),
        F.concat(F.lit("doc"), F.col("id").cast("string")).alias("doc"),
    )
    cp = candidate_pairs(
        blocked, id_col="rid", block_col="bk", payload_cols=("doc",),
        max_block_size=100,
    )
    try:
        plan = _plan(cp)
        pinned = re.findall(
            r"hashpartitioning\(id_a[^)]*id_b[^)]*\), REPARTITION_BY_NUM", plan
        )
        implicit = re.findall(
            r"hashpartitioning\(id_a[^)]*id_b[^)]*\), ENSURE_REQUIREMENTS", plan
        )
        assert len(pinned) == 1, f"expected one pinned dedupe exchange:\n{plan}"
        assert not implicit, (
            "the keyed repartition must satisfy the distinct's "
            f"distribution (no second pair exchange):\n{plan}"
        )
    finally:
        for fr in cp._persisted_frames:
            fr.unpersist()


def test_link_dedupe_exchange_is_pinned(spark):
    """Two-table twin of the pin above (id_l, id_r keys)."""
    bl = spark.range(20).select(
        F.col("id").alias("id"), (F.col("id") % 4).alias("block_key"),
        F.lit("x").alias("text"),
    )
    br = spark.range(20).select(
        (F.col("id") + 100).alias("id"), (F.col("id") % 4).alias("block_key"),
        F.lit("x").alias("text"),
    )
    pairs = candidate_links(bl, br, id_col="id", block_col="block_key",
                            payload_cols=("text",))
    try:
        plan = _plan(pairs)
        pinned = re.findall(
            r"hashpartitioning\(id_l[^)]*id_r[^)]*\), REPARTITION_BY_NUM", plan
        )
        implicit = re.findall(
            r"hashpartitioning\(id_l[^)]*id_r[^)]*\), ENSURE_REQUIREMENTS", plan
        )
        assert len(pinned) == 1
        assert not implicit
    finally:
        for fr in pairs._persisted_frames:
            fr.unpersist()


def test_allpairs_expands_without_union(spark):
    """The bidirectional neighbor expansion must be ONE explode over
    the computed cosine attribute — the old two-branch union duplicated
    the candidate-join + cosine-UDF subtree (the nondeterministic UDF
    blocks Catalyst from collapsing the copies), executing the
    distinct, payload attach and Arrow cosine twice per corpus pass."""
    corpus = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.rand(i) for i in range(4)]).alias("embedding"),
    )
    ap = lsh_all_pairs_topk(corpus, k=3, n_planes=3, n_tables=2)
    try:
        plan = _plan(ap)
        assert "Union" not in plan, f"union-free expansion expected:\n{plan}"
        assert plan.count("Generate explode") >= 1
    finally:
        for fr in getattr(ap, "_persisted_frames", []):
            fr.unpersist()


def test_allpairs_explode_rows_match_union_form(spark):
    """Equivalence of the rewrite: the exploded both-direction frame
    must contain exactly the rows the union form produced (every
    unordered candidate pair once in each direction), so ranks and the
    ann_allpairs oracle are unchanged."""
    corpus = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 1)).cast("double") for i in range(3)]).alias(
            "embedding"
        ),
    )
    out = lsh_all_pairs_topk(corpus, k=50, n_planes=2, n_tables=2,
                             max_block_size=1000)
    try:
        rows = out.select("query_id", "vec_id").collect()
        got = {(r["query_id"], r["vec_id"]) for r in rows}
        # with k >= candidate count, top-k keeps every candidate: the
        # result must be direction-symmetric and self-pair-free
        assert got, "expected candidates on a dense 2-plane bucketing"
        assert all((b, a) in got for (a, b) in got)
        assert all(a != b for (a, b) in got)
    finally:
        for fr in getattr(out, "_persisted_frames", []):
            fr.unpersist()
