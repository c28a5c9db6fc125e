"""Structured Streaming coverage: the incremental blocking/matching
path and its key-compatibility invariant with the batch path."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from triple_accel_spark.operators.assemble import assemble_documents
from triple_accel_spark.operators.blocking import (
    with_minhash_blocks,
    with_minhash_blocks_expr,
)
from triple_accel_spark.sources.transcripts import generate_transcripts
from triple_accel_spark.streaming.incremental import (
    stream_block_keys,
    stream_match_against_index,
)

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx long, role string, text string, tool string, "
    "ts timestamp"
)


@pytest.fixture(scope="module")
def corpus(spark):
    tdf, truth = generate_transcripts(n_entities=40, seed=7)
    return spark.createDataFrame(tdf), truth


def test_expr_and_agg_block_keys_identical(spark, corpus):
    """The streaming (expression) and batch (aggregation) minhash paths
    must emit the same (id, block_key) set — the invariant that makes a
    streamed delta joinable against yesterday's static index."""
    t, _ = corpus
    docs = assemble_documents(t)
    agg_keys = with_minhash_blocks(docs).select("conv_id", "block_key")
    expr_keys = with_minhash_blocks_expr(docs).select("conv_id", "block_key")
    assert agg_keys.exceptAll(expr_keys).count() == 0
    assert expr_keys.exceptAll(agg_keys).count() == 0


def test_stream_block_keys_end_to_end(spark, corpus, tmp_path):
    t, _ = corpus
    src = str(tmp_path / "turns")
    # sentinel far in the future: the watermark only passes a session
    # window once LATER events arrive, so the conversation holding the
    # max event time would otherwise never close in append mode
    sentinel = t.limit(1).select(
        F.lit("zz_sentinel").alias("conv_id"), "turn_idx", "role", "text",
        "tool", (F.col("ts") + F.expr("INTERVAL 365 DAYS")).alias("ts"),
    )
    t.union(sentinel).write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    blocked = stream_block_keys(stream, watermark="1 minute")
    q = (
        blocked.writeStream.format("memory")
        .queryName("blocked_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "select * from blocked_stream where conv_id != 'zz_sentinel'"
    )
    # every conversation surfaces with its full band set
    n_convs = t.select("conv_id").distinct().count()
    assert got.select("conv_id").distinct().count() == n_convs
    # streamed keys == batch keys for conversations whose turns all
    # landed in one session window (sanity on a sample)
    batch_keys = with_minhash_blocks(assemble_documents(t)).select(
        "conv_id", "block_key"
    )
    joined = got.select("conv_id", "block_key").exceptAll(batch_keys)
    assert joined.count() == 0


def test_stream_assign_clusters_stateful(spark, tmp_path):
    """applyInPandasWithState incremental assignment: planted
    near-duplicates sharing a block must land in their original's
    cluster; originals become representatives."""
    from triple_accel_spark.streaming.incremental import stream_assign_clusters

    d0 = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").where(
        F.col("doc_id") < 120
    )
    # keep only docs whose 12-char block is UNIQUE among the originals:
    # two similar originals in one block would legitimately co-cluster
    # and make the per-pair assertion ambiguous
    from pyspark.sql import Window

    d = (
        d0.withColumn("_bk", F.substring("text", 1, 12))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy("_bk")))
        .where(F.col("_n") == 1)
        .drop("_bk", "_n")
    )
    base = d.select(
        F.concat(F.lit("c"), F.lpad(F.col("doc_id").cast("string"), 6, "0"))
        .alias("conv_id"),
        F.col("text").alias("doc"),
    )
    # duplicate with one substituted char past the blocking prefix;
    # 'd' > 'c' so the original is processed first (conv_id order) and
    # seeds the representative set
    dups = d.where(F.col("doc_id") % 2 == 0).select(
        F.concat(F.lit("d"), F.lpad(F.col("doc_id").cast("string"), 6, "0"))
        .alias("conv_id"),
        F.concat(F.substring("text", 1, 40), F.lit("Q"),
                 F.expr("substring(text, 42)")).alias("doc"),
    )
    blocked = base.union(dups).withColumn(
        "block_key", F.substring("doc", 1, 12)
    )
    src = str(tmp_path / "blocked")
    # one file -> one micro-batch: arrival order inside a batch is
    # conv_id-sorted by the operator, but order ACROSS micro-batches is
    # the file source's choice and would make rep seeding nondeterministic
    blocked.coalesce(1).write.parquet(src)

    stream = spark.readStream.schema(
        "conv_id string, doc string, block_key string"
    ).parquet(src)
    assigned = stream_assign_clusters(stream, sim_threshold=0.88)
    q = (
        assigned.writeStream.format("memory")
        .queryName("assigned_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # the stateful query keeps scheduling no-data batches to service
    # processing-time timeouts, so it neither self-terminates under
    # availableNow nor returns from processAllAvailable — poll the
    # sink for the expected row count, then stop explicitly
    import time as _time

    expected = blocked.count()
    deadline = _time.time() + 240
    while _time.time() < deadline:
        if (
            spark.sql("select count(*) from assigned_stream").collect()[0][0]
            >= expected
        ):
            break
        _time.sleep(2)
    q.stop()
    q.awaitTermination(60)
    got = {
        (r.conv_id, r.block_key): r.cluster_id
        for r in spark.sql("select * from assigned_stream").collect()
    }
    n_base = base.count()
    n_dups = dups.count()
    assert len(got) == n_base + n_dups
    # every dup shares its original's block (mutation is past the
    # prefix) and must land in the original's cluster there; blocks
    # are unique among originals, so the original is its own rep
    for r in dups.collect():
        orig = "c" + r.conv_id[1:]
        bk = r.doc[:12]
        assert got[(orig, bk)] == orig
        assert got[(r.conv_id, bk)] == orig

    # cross-band consolidation: global labels use the component-min id,
    # so every dup consolidates onto its original
    from triple_accel_spark.streaming.incremental import consolidate_assignments

    labels = {
        r.id: r.cluster_id
        for r in consolidate_assignments(
            spark.sql("select * from assigned_stream")
        ).collect()
    }
    for r in dups.collect():
        assert labels[r.conv_id] == "c" + r.conv_id[1:]
    assert len(labels) == expected


def test_stream_assign_clusters_resumes_from_checkpoint(spark, tmp_path):
    """North-rule resumability, streaming form: stop the stateful query
    and START A NEW one on the same checkpoint — state (the per-block
    representative set) must survive the restart, so a duplicate
    arriving AFTER the restart is still assigned to the ORIGINAL's
    cluster seeded before it."""
    from triple_accel_spark.streaming.incremental import stream_assign_clusters

    src = str(tmp_path / "resume_src")
    ckpt = str(tmp_path / "resume_ckpt")
    schema = "conv_id string, doc string, block_key string"
    base_doc = "the quick brown fox jumps over the lazy dog again and again ok"

    import os

    os.makedirs(src, exist_ok=True)
    # phase 1: the original seeds the representative set
    spark.createDataFrame(
        [("c000001", base_doc, base_doc[:12])], schema
    ).coalesce(1).write.mode("append").parquet(src)

    out = str(tmp_path / "resume_out")

    def run_pass(name):
        # each restart is a NEW query on the SAME checkpoint; a FILE
        # sink (memory sinks don't support checkpoint recovery)
        # accumulates exactly-once output across restarts
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            stream_assign_clusters(stream, sim_threshold=0.85,
                                   state_timeout_ms=0)
            .writeStream.format("parquet")
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        return spark.read.parquet(out).collect()

    got1 = run_pass("resume_pass1")
    assert {(r.conv_id, r.cluster_id) for r in got1} == {("c000001", "c000001")}

    # phase 2: new file, NEW query, same checkpoint — the dup differs
    # by one char and must land in the pre-restart representative's
    # cluster (state restored), not self-cluster (state lost)
    dup = base_doc[:40] + "Q" + base_doc[41:]
    spark.createDataFrame(
        [("d000001", dup, dup[:12])], schema
    ).coalesce(1).write.mode("append").parquet(src)
    got2 = run_pass("resume_pass2")
    labels = {r.conv_id: r.cluster_id for r in got2}
    assert labels["d000001"] == "c000001"


def test_stream_match_against_static_index(spark, corpus, tmp_path):
    t, truth = corpus
    docs = assemble_documents(t)
    index = with_minhash_blocks(docs)  # "yesterday's" full index

    src = str(tmp_path / "turns2")
    t.write.parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    blocked = stream_block_keys(stream, watermark="1 minute")
    matches = stream_match_against_index(
        blocked, index, k=200, sim_threshold=0.88
    )
    q = (
        matches.writeStream.format("memory")
        .queryName("stream_matches")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        "select least(id_a, id_b) id_a, greatest(id_a, id_b) id_b "
        "from stream_matches"
    ).distinct()
    truth_pairs = spark.createDataFrame(truth).select("id_a", "id_b")
    # every labeled duplicate pair must be matched by the stream
    missed = truth_pairs.join(got, ["id_a", "id_b"], "left_anti").count()
    assert missed == 0
