"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric (BASELINE.json): candidate-pairs-scored/sec — the
Arrow-batched Myers/banded kernel scoring stage over documents
assembled from the deterministic synthetic transcript corpus.

Every run measures N->4N scaling in-run (the scoring stage at local[2]
vs local[8] on identical input — the sandbox stand-in for N vs 4N
executors; see BASELINE.md for methodology). SPARK_GRAFT_SCALING=1
adds the local[32] point (single-socket LLC/DRAM ceiling).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from triple_accel_spark.operators.assemble import assemble_documents  # noqa: E402
from triple_accel_spark.operators.dedup import minhash_lsh_duplicates  # noqa: E402
from triple_accel_spark.operators.scoring import score_pairs  # noqa: E402
from triple_accel_spark.operators.similarity import brute_force_topk  # noqa: E402
from triple_accel_spark.session import get_spark  # noqa: E402
from triple_accel_spark.sources.transcripts import generate_transcripts  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
# transcript corpus sized to the scale factor (sf0.1 -> 1500 entities)
N_ENTITIES = max(100, int(15000 * SF))
# scoring-stage pair generation: each doc vs the next 60 in id order.
# Sized so the timed stage runs several seconds — at fanout 20 the
# ~2s measurement was dominated by fixed job overhead and swung +-25%
# run to run; the metric is steady-state pairs/sec
PAIR_FANOUT = 60


def progress(msg: str) -> None:
    """Stage marker on STDERR (the driver consumes only the stdout
    JSON line); makes slow stages attributable when a run is watched."""
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def timed(fn):
    t0 = time.time()
    out = fn()
    return time.time() - t0, out


def timed_best2(fn):
    """Best-of-2: the sandbox VM sees host-level noise windows that can
    inflate a single run 2-4x; the metric is steady-state wall time."""
    s1, out = timed(fn)
    s2, out = timed(fn)
    return min(s1, s2), out


def build_docs(spark, n_entities: int | None = None):
    tdf, _ = generate_transcripts(n_entities=n_entities or N_ENTITIES, seed=42)
    t = spark.createDataFrame(tdf).repartition(CPUS)
    docs = assemble_documents(t).persist()
    docs.count()
    return docs


def scoring_pairs(docs):
    """Dense deterministic candidate-pair frame: every doc vs the next
    PAIR_FANOUT docs in id order (bounded fanout, shuffle-balanced)."""
    from pyspark.sql.window import Window

    d = docs.select(
        F.row_number().over(Window.orderBy("conv_id")).alias("seq"),
        "conv_id", "doc",
    )
    a = d.select(F.col("seq").alias("sa"), F.col("conv_id").alias("id_a"),
                 F.col("doc").alias("doc_a"))
    b = d.select(F.col("seq").alias("sb"), F.col("conv_id").alias("id_b"),
                 F.col("doc").alias("doc_b"))
    j = a.join(
        b,
        (F.col("sb") > F.col("sa")) & (F.col("sb") <= F.col("sa") + PAIR_FANOUT),
    )
    return j.select("id_a", "id_b", "doc_a", "doc_b")


def run_scoring_stage(spark, docs, k, pairs_df=None):
    # the generator uses a global row_number (one partition); spread the
    # materialized pair frame across the cluster before timing so the
    # measurement is the scoring stage, not a single-task bottleneck
    cpus = spark.sparkContext.defaultParallelism
    if pairs_df is None:
        pairs_df = scoring_pairs(docs).repartition(cpus * 2)
    pairs = pairs_df.persist()
    n_pairs = pairs.count()  # materialize: timing below isolates scoring
    # warm the Python worker pool (fork + numpy/pandas import happens
    # once per worker; steady-state throughput is the metric)
    score_pairs(pairs.limit(200), "doc_a", "doc_b", k=k).count()
    best, n_scored = None, 0
    for _ in range(2):  # best-of-2: JVM/GC noise, not warmup, is the enemy
        sec, n_scored = timed(
            lambda: score_pairs(pairs, "doc_a", "doc_b", k=k,
                                sim_threshold=None).count()
        )
        best = sec if best is None else min(best, sec)
    pairs.unpersist()
    return n_pairs, n_scored, best


def main() -> None:
    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    queries: dict[str, float] = {}
    extra: dict = {"sf": SF, "cpus": CPUS, "n_entities": N_ENTITIES}

    progress("build_docs")
    docs = build_docs(spark)
    n_docs = docs.count()
    max_len = docs.agg(F.max("doc_len")).collect()[0][0] or 1
    k = max(1, int(0.12 * max_len) + 1)
    extra["n_docs"] = n_docs

    progress("q1")
    # q1: headline — bulk pair scoring (Myers bit-parallel kernel)
    n_pairs, _, sec = run_scoring_stage(spark, docs, k)
    queries["q1_pair_scoring"] = round(sec, 3)
    pairs_per_sec = n_pairs / sec if sec > 0 else 0.0
    extra["pairs_scored"] = n_pairs
    extra["pairs_per_sec"] = round(pairs_per_sec, 1)

    progress("q2")
    # q2: full ER pipeline — the actual pipeline operator
    # (resolve_entities: assemble -> block -> pair -> per-pair-k score
    # -> threshold -> CC with the bounded small-graph fast path)
    spark.catalog.clearCache()  # drop q1's persisted frames

    def er(**cfg_kw):
        from triple_accel_spark.pipeline import ResolveConfig, resolve_entities

        tdf, _ = generate_transcripts(n_entities=N_ENTITIES, seed=42)
        t = spark.createDataFrame(tdf).repartition(CPUS)
        with resolve_entities(t, ResolveConfig(sim_threshold=0.88, **cfg_kw)) as res:
            return res.clusters.count()

    sec, n_clustered = timed_best2(er)
    queries["q2_er_pipeline"] = round(sec, 3)
    extra["er_records"] = n_clustered

    progress("q2b")
    # q2b: the same pipeline with the bounded-local-graph fast path
    # DISABLED, so the distributed star-contraction CC is always
    # exercised and tracked (the default routing would otherwise hide
    # star-contraction regressions at bench scale; labels are asserted
    # identical local-vs-distributed in tests)
    spark.catalog.clearCache()
    # single timed run: q2b is a regression tracker for the distributed
    # CC path, not a headline metric — q2 (best-of-2) carries the
    # pipeline number, and a second full pipeline run here costs more
    # bench wall time than the tracker is worth
    sec, _ = timed(lambda: er(cc_local_threshold=0))
    queries["q2b_cc_distributed"] = round(sec, 3)

    progress("q3")
    # q3: minhash LSH dedup over the sf documents table
    spark.catalog.clearCache()
    sf_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sec, _ = timed_best2(lambda: minhash_lsh_duplicates(
        sf_docs, "text", "doc_id", jaccard_threshold=0.5).count())
    queries["q3_minhash_dedup"] = round(sec, 3)

    progress("q4")
    # q4: brute-force cosine top-k over the sf embeddings table
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    qs = emb.where(F.col("vec_id") < 20).withColumnRenamed("vec_id", "query_id")
    corpus = emb.where(F.col("vec_id") >= 20)
    sec, _ = timed_best2(lambda: brute_force_topk(corpus, qs, k=10).count())
    queries["q4_ann_topk"] = round(sec, 3)

    progress("q4b")
    # q4b: corpus x corpus approximate top-k (LSH buckets + batched
    # matmul/einsum vector math — the large-query-set ANN scale path)
    from triple_accel_spark.operators.similarity import lsh_all_pairs_topk

    def allpairs():
        out = lsh_all_pairs_topk(emb, k=5, n_planes=6, n_tables=8)
        n = out.count()
        for fr in getattr(out, "_persisted_frames", []):
            fr.unpersist()
        return n

    sec, n_nbrs = timed_best2(allpairs)
    queries["q4b_ann_allpairs_lsh"] = round(sec, 3)
    extra["allpairs_neighbors"] = n_nbrs

    progress("q5")
    # q5: hamming kernel over fixed-width prefixes of sf documents
    from triple_accel_spark.functions import hamming

    d1 = sf_docs.select(F.col("doc_id").alias("id_a"),
                        F.rpad(F.substring("text", 1, 64), 64, "x").alias("pa"))
    d2 = sf_docs.select((F.col("doc_id") - 1).alias("id_a"),
                        F.rpad(F.substring("text", 1, 64), 64, "x").alias("pb"))
    sec, _ = timed_best2(lambda: d1.join(d2, "id_a")
                   .select(hamming(F.col("pa"), F.col("pb")).alias("d"))
                   .agg(F.sum("d")).collect())
    queries["q5_hamming"] = round(sec, 3)

    progress("q6")
    # q6: long-needle ANCHORED fuzzy search (the Myers prescan's
    # anchored global-boundary mode): does each doc's own 96-char
    # middle occur at the start of the doc within k=9 edits?
    from triple_accel_spark.functions import edit_search

    needle = F.substring("text", 81, 96)
    sec, _ = timed_best2(
        lambda: sf_docs.select(
            F.size(
                edit_search(needle, F.col("text"), k=9, search_type="best",
                            anchored=True)
            ).alias("n")
        ).agg(F.sum("n")).collect()
    )
    queries["q6_anchored_search"] = round(sec, 3)

    total = round(sum(queries.values()), 3)

    # North-rule scaling evidence, measured IN-RUN (never copied from a
    # previous run): the identical scoring stage at local[2] vs
    # local[8] — N vs 4N parallelism with per-core memory resources
    # unconstrained at both ends, the sandbox analogue of adding
    # executor NODES (which bring their own LLC/DRAM).
    # SPARK_GRAFT_SCALING=1 adds the local[32] point, which shares one
    # socket's LLC/DRAM across all 32 workers — a single-box hardware
    # ceiling that a no-Spark multiprocessing control experiment hits
    # identically (methodology + control data: BASELINE.md).
    # The pair frame is materialized ONCE here (full parallelism) and
    # read back byte-identically by every scaling session: corpus
    # construction is not the measured stage, and rebuilding ~1M pairs
    # inside a 2-core session tripled the block's wall time.
    progress("scaling: materialize shared pair frame")
    global PAIR_FANOUT
    PAIR_FANOUT = 300  # with the floored corpus below: ~670k pairs. Each
    # point needs enough kernel work that fixed per-job/stage costs are
    # noise — a 254k-pair point finished in <4s on local[8] and
    # scheduling overhead capped the measured speedup; at sf<0.1 the
    # corpus itself is floored to the sf0.1 size for the same reason
    # (the scaling points are compared against EACH OTHER on identical
    # input, so the corpus size only needs to be honest across points)
    scaling_entities = max(N_ENTITIES, 1500)
    spark.catalog.clearCache()
    sdocs = build_docs(spark, scaling_entities)
    # unique per-run path: a fixed name would let concurrent benches
    # clobber each other's shared frame mid-read
    scratch = tempfile.mkdtemp(prefix="spark_graft_bench_")
    pairs_path = f"{scratch}/pairs.parquet"
    scoring_pairs(sdocs).repartition(64).write.mode("overwrite").parquet(pairs_path)
    spark.stop()

    points = (2, 8, 32) if os.environ.get("SPARK_GRAFT_SCALING") == "1" else (2, 8)
    scaling = {}
    for n in points:
        progress(f"scaling local[{n}]")
        # small scan splits (engine default 256m would coalesce the
        # ~1 GB pair file into ~5 splits and starve the read), then
        # repartition to the SAME 2x-cores layout the in-session flow
        # used: the timed stage must see identical partition/Arrow-
        # batch geometry per core at both points, or per-task fixed
        # costs skew the ratio (70 small cached partitions measured
        # 0.70-1.07 run-to-run; the 2x-cores layout is stable)
        s = get_spark(f"bench-scale-{n}", master=f"local[{n}]",
                      shuffle_partitions=n,
                      extra_conf={"spark.sql.files.maxPartitionBytes": "16m"})
        np_, _, best = run_scoring_stage(
            s, None, k, pairs_df=s.read.parquet(pairs_path).repartition(n * 2)
        )
        scaling[f"local[{n}]"] = {
            "pairs": np_, "sec": round(best, 3),
            "pairs_per_sec": round(np_ / best, 1),
        }
        s.stop()
    shutil.rmtree(scratch, ignore_errors=True)
    eff28 = (scaling["local[8]"]["pairs_per_sec"]
             / (4 * scaling["local[2]"]["pairs_per_sec"]))
    scaling["efficiency_2_to_8"] = round(eff28, 3)
    if "local[32]" in scaling:
        eff832 = (scaling["local[32]"]["pairs_per_sec"]
                  / (4 * scaling["local[8]"]["pairs_per_sec"]))
        scaling["efficiency_8_to_32"] = round(eff832, 3)
    scaling["note"] = ("measured this run; local[2]->local[8] is the "
                       "N->4N cluster analogue — see BASELINE.md for "
                       "methodology and the multiprocessing control")
    extra["scaling"] = scaling

    print(json.dumps({
        "metric": "candidate_pairs_scored_per_sec",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/sec",
        "total_sec": total,
        "queries": queries,
        **extra,
    }))


if __name__ == "__main__":
    main()
