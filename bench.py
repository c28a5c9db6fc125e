"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Headline metric (BASELINE.json): candidate-pairs-scored/sec — the
Arrow-batched Myers/banded kernel scoring stage over documents
assembled from the deterministic synthetic transcript corpus.

Measurement design (round-4 verdict):
- Timed regions contain ONLY the operator under test. Corpus synthesis
  (driver pandas + createDataFrame) is materialized to scratch parquet
  BEFORE the clock starts — q2 previously timed generation + pickling
  + the pipeline, and host noise on the serial part dominated the
  round-over-round swings.
- Every run measures N->4N scaling in-run (the scoring stage at
  local[2] vs local[8] on identical input — the sandbox stand-in for N
  vs 4N executors; BASELINE.md has the methodology + multiprocessing
  control). Each point is MEDIAN-of-3 with per-run spread recorded,
  and the 2->8 ratio is self-validating: outside [0.7, 1.05] the pair
  is re-measured once; still outside -> flagged "contended" (a
  superlinear ratio is impossible as a software property; it means the
  host interfered). SPARK_GRAFT_SCALING=1 adds the local[32] point
  (single-socket LLC/DRAM ceiling).
- A 10x scale point (SPARK_GRAFT_SF1=0 to skip): scoring stage, LSH
  dedup, and distributed-CC pipeline once on a 15k-entity corpus, with
  sf0.1->sf1 growth factors — fixed costs dominate sub-second queries,
  so "survives 100x?" needs at least one order of magnitude in-run.
- ANN recall@k vs the exact baseline for the LSH, IVF and all-pairs
  configurations ships in the artifact (approximate operators without
  recorded recall are unfalsifiable).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from triple_accel_spark.operators.assemble import assemble_documents  # noqa: E402
from triple_accel_spark.operators.dedup import minhash_lsh_duplicates  # noqa: E402
from triple_accel_spark.operators.scoring import score_pairs  # noqa: E402
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
SF1_ENTITIES = 15000  # the 10x point (sf1-equivalent corpus)


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


def scoring_pairs(docs, fanout: int = None):
    """Dense deterministic candidate-pair frame: every doc vs the next
    ``fanout`` docs in id order (bounded fanout, shuffle-balanced)."""
    from pyspark.sql.window import Window

    fanout = fanout or PAIR_FANOUT
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
        (F.col("sb") > F.col("sa")) & (F.col("sb") <= F.col("sa") + fanout),
    )
    return j.select("id_a", "id_b", "doc_a", "doc_b")


def run_scoring_stage(spark, docs, k, pairs_df=None, runs: int = 2,
                      agg: str = "min", scorer: str = "edit"):
    """Time the scoring stage over a materialized pair frame.

    Returns ``(n_pairs, n_scored, stat_sec, all_secs)`` where stat is
    min (best-of-N, steady-state metric for the headline) or median
    (scaling points — a median is robust to one noisy run in EITHER
    direction, where best-of-N only guards against slow outliers and
    can ship an impossibly-fast one)."""
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
    score_pairs(pairs.limit(200), "doc_a", "doc_b", k=k, scorer=scorer).count()
    secs, n_scored = [], 0
    for _ in range(runs):
        sec, n_scored = timed(
            lambda: score_pairs(pairs, "doc_a", "doc_b", k=k,
                                sim_threshold=None, scorer=scorer).count()
        )
        secs.append(sec)
    pairs.unpersist()
    stat = min(secs) if agg == "min" else statistics.median(secs)
    return n_pairs, n_scored, stat, secs


def materialize_transcripts(spark, path: str, n_entities: int) -> None:
    """Corpus synthesis OUT of every timed region: driver-pandas
    generation + createDataFrame + one parquet write, done once; timed
    pipeline runs scan this parquet (the pipeline's real input shape)."""
    tdf, _ = generate_transcripts(n_entities=n_entities, seed=42)
    spark.createDataFrame(tdf).repartition(CPUS).write.mode(
        "overwrite"
    ).parquet(path)


def er_from_parquet(spark, path: str, **cfg_kw) -> int:
    from triple_accel_spark.pipeline import ResolveConfig, resolve_entities

    t = spark.read.parquet(path).repartition(
        spark.sparkContext.defaultParallelism
    )
    with resolve_entities(t, ResolveConfig(sim_threshold=0.88, **cfg_kw)) as res:
        return res.clusters.count()


def measure_scaling_point(n: int, k, pairs_path: str):
    """One scaling point: fresh local[n] session, identical input and
    partition/Arrow-batch geometry per core (16m scan splits, 2x-cores
    repartition — see BASELINE.md), median-of-3."""
    s = get_spark(f"bench-scale-{n}", master=f"local[{n}]",
                  shuffle_partitions=n,
                  extra_conf={"spark.sql.files.maxPartitionBytes": "16m"})
    np_, _, med, secs = run_scoring_stage(
        s, None, k, pairs_df=s.read.parquet(pairs_path).repartition(n * 2),
        runs=3, agg="median",
    )
    s.stop()
    return {
        "pairs": np_, "sec": round(med, 3),
        "pairs_per_sec": round(np_ / med, 1),
        "runs_sec": [round(x, 3) for x in secs],
    }


def main() -> None:
    spark = get_spark("bench", master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    queries: dict[str, float] = {}
    extra: dict = {"sf": SF, "cpus": CPUS, "n_entities": N_ENTITIES}
    scratch = tempfile.mkdtemp(prefix="spark_graft_bench_")

    progress("build_docs")
    docs = build_docs(spark)
    n_docs = docs.count()
    max_len = docs.agg(F.max("doc_len")).collect()[0][0] or 1
    k = max(1, int(0.12 * max_len) + 1)
    extra["n_docs"] = n_docs

    progress("q1")
    # q1: headline — bulk pair scoring (Myers bit-parallel kernel)
    n_pairs, _, sec, _ = run_scoring_stage(spark, docs, k)
    queries["q1_pair_scoring"] = round(sec, 3)
    pairs_per_sec = n_pairs / sec if sec > 0 else 0.0
    extra["pairs_scored"] = n_pairs
    extra["pairs_per_sec"] = round(pairs_per_sec, 1)

    progress("q9")
    # q9: the same candidate-pair generator scored with the round-5
    # Jaro-Winkler comparator (kernels/jaro.py) on 40-char name-like
    # prefixes — JW's intended field shape (the kernel is O(la*lb) per
    # pair; long documents stay on the edit-distance kernels)
    cpus = spark.sparkContext.defaultParallelism
    pairs9 = scoring_pairs(docs).repartition(cpus * 2).select(
        F.substring("doc_a", 1, 40).alias("doc_a"),
        F.substring("doc_b", 1, 40).alias("doc_b"),
    )
    n_pairs9, _, sec, _ = run_scoring_stage(
        spark, docs, None, pairs_df=pairs9, scorer="jaro_winkler"
    )
    queries["q9_jw_scoring"] = round(sec, 3)
    extra["jw_pairs_per_sec"] = round(n_pairs9 / sec, 1) if sec > 0 else 0.0

    progress("q2 prep: materialize transcript corpus (untimed)")
    spark.catalog.clearCache()  # drop q1's persisted frames
    tpath = f"{scratch}/transcripts.parquet"
    materialize_transcripts(spark, tpath, N_ENTITIES)

    progress("q2")
    # q2: full ER pipeline — resolve_entities over the pre-materialized
    # parquet corpus (assemble -> block -> pair -> per-pair-k score ->
    # threshold -> CC with the bounded small-graph fast path). The
    # timed region is the PIPELINE alone.
    sec, n_clustered = timed_best2(lambda: er_from_parquet(spark, tpath))
    queries["q2_er_pipeline"] = round(sec, 3)
    extra["er_records"] = n_clustered

    progress("q2b")
    # q2b: the same pipeline with the bounded-local-graph fast path
    # DISABLED, so the distributed star-contraction CC is always
    # exercised and tracked (the default routing would otherwise hide
    # star-contraction regressions at bench scale; labels are asserted
    # identical local-vs-distributed in tests). Single timed run: a
    # regression tracker, not a headline metric.
    spark.catalog.clearCache()
    sec, _ = timed(lambda: er_from_parquet(spark, tpath, cc_local_threshold=0))
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
    from triple_accel_spark.operators.similarity import brute_force_topk

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

    progress("q4c")
    # q4c: the RECALL-TUNED all-pairs config (3 planes x 16 tables —
    # recall@5 0.99 in the ann_recall block, vs 0.36 for q4b's
    # historical perf config): the price of recall is a bench line, not
    # prose. q4b keeps the historical config for round-over-round
    # comparability.
    def allpairs_tuned():
        out = lsh_all_pairs_topk(emb, k=5, n_planes=3, n_tables=16)
        n = out.count()
        for fr in getattr(out, "_persisted_frames", []):
            fr.unpersist()
        return n

    sec, _ = timed_best2(allpairs_tuned)
    queries["q4c_ann_allpairs_tuned"] = round(sec, 3)

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

    progress("q7")
    # q7: the composite training-corpus cleanse over the sf documents
    # table (validity -> quality -> lang -> exact dedup -> near dedup)
    # — the flagship LLM-data-curation endpoint as one bench line
    from triple_accel_spark.operators.corpus import (
        CleanseConfig,
        prepare_training_corpus,
    )

    def cleanse():
        res = prepare_training_corpus(
            sf_docs, cfg=CleanseConfig(
                min_tokens=5, quality_threshold=0.5, langs=None,
                jaccard_threshold=0.5, num_bands=8,
            ),
        )
        n = res.metrics["n_near"]
        res.unpersist()
        return n

    sec, n_clean = timed_best2(cleanse)
    queries["q7_corpus_cleanse"] = round(sec, 3)
    extra["cleanse_survivors"] = n_clean

    progress("q8")
    # q8: TWO-TABLE record linkage — match a perturbed copy of half the
    # corpus back against it (minhash blocking on both sides -> A x B
    # candidate join with one-sided salting -> per-pair-k scoring ->
    # best-per-right assignment): the cross-dataset ER shape, end to end
    from triple_accel_spark.operators.linkage import LinkConfig, link_records

    link_left = sf_docs.select(F.col("doc_id").alias("id"), "text")
    link_right = sf_docs.where(F.col("doc_id") % 2 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("id"),
        F.concat(
            F.substring("text", 1, 39), F.expr("substring(text, 41)")
        ).alias("text"),
    )

    def linkage():
        res = link_records(
            link_left, link_right, cfg=LinkConfig(sim_threshold=0.85)
        )
        n = res.best.count()
        res.unpersist()
        return n

    sec, n_linked = timed_best2(linkage)
    queries["q8_linkage"] = round(sec, 3)
    extra["linked_records"] = n_linked

    progress("ann recall")
    # Approximate-ANN recall@k vs the exact baseline, recorded in the
    # artifact with the settings used. Disjoint query/corpus split for
    # the query-set operators (no self-match ambiguity); the all-pairs
    # config is scored on a deterministic 10% query-id sample.
    from triple_accel_spark.operators.similarity import (
        cosine_arrow,
        ivf_topk,
        lsh_topk,
        topk_per_key,
    )

    spark.catalog.clearCache()
    rq = emb.where(F.col("vec_id") < 200).withColumnRenamed("vec_id", "query_id")
    rc = emb.where(F.col("vec_id") >= 200).persist()
    rc.count()

    def _recall(approx, exact):
        a = approx.select("query_id", "vec_id")
        e = exact.select("query_id", "vec_id").persist()
        r = a.join(e, ["query_id", "vec_id"]).count() / max(e.count(), 1)
        e.unpersist()
        return round(r, 4)

    lsh_cfg = {"n_planes": 4, "n_tables": 8}  # the pytest-asserted config
    ivf_cfg = {"n_centroids": 64, "n_probe": 16}
    ap_cfg = {"k": 5, "n_planes": 6, "n_tables": 8}  # q4b's perf config
    ap_tuned_cfg = {"k": 5, "n_planes": 3, "n_tables": 16}  # recall-tuned
    exact10 = brute_force_topk(rc, rq, k=10).persist()
    exact10.count()
    recall = {
        "k": 10,
        "n_queries": rq.count(),
        "lsh": _recall(lsh_topk(rc, rq, k=10, **lsh_cfg), exact10),
        "ivf": _recall(ivf_topk(rc, rq, k=10, **ivf_cfg), exact10),
        "ivf_refined": _recall(
            ivf_topk(rc, rq, k=10, refine_iters=2, **ivf_cfg), exact10
        ),
        # IVF recall/cost curve (r4 verdict #5): multi-assignment
        # (assign_replicas) is the recall lever on this near-uniform
        # corpus — cost_multiple is the structural candidate-volume
        # bound n_probe/n_centroids * replicas (the dedupe makes the
        # realized volume slightly lower)
        "ivf_replicated": _recall(
            ivf_topk(rc, rq, k=10, refine_iters=2, assign_replicas=2,
                     **ivf_cfg), exact10
        ),
        "ivf_wide": _recall(
            ivf_topk(rc, rq, k=10, refine_iters=2, assign_replicas=2,
                     n_centroids=64, n_probe=24), exact10
        ),
        "lsh_cfg": lsh_cfg, "ivf_cfg": ivf_cfg, "ivf_refine_iters": 2,
        "ivf_replicated_cfg": {**ivf_cfg, "assign_replicas": 2,
                               "refine_iters": 2,
                               "cost_multiple": 2 * 16 / 64},
        "ivf_wide_cfg": {"n_centroids": 64, "n_probe": 24,
                         "assign_replicas": 2, "refine_iters": 2,
                         "cost_multiple": 2 * 24 / 64},
    }
    exact10.unpersist()
    # all-pairs config (q4b settings), sampled query ids: exact top-5
    # neighbor lists for the sample via broadcast join, self excluded
    sample = emb.where(F.col("vec_id") % 10 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    scored = (
        emb.select("vec_id", F.col("embedding").alias("cvec"))
        .join(F.broadcast(sample), F.col("query_id") != F.col("vec_id"))
        .withColumn("cosine", cosine_arrow("qvec", "cvec"))
    )
    exact_ap = topk_per_key(scored, "query_id", ap_cfg["k"]).select(
        "query_id", "vec_id"
    )
    exact_ap = exact_ap.persist()
    exact_ap.count()
    # both the q4b perf config (recall of the artifact being TIMED) and
    # the recall-tuned config (the recall/cost trade as data)
    for name, cfg in (("allpairs", ap_cfg), ("allpairs_tuned", ap_tuned_cfg)):
        ap = lsh_all_pairs_topk(emb, **cfg)
        recall[name] = _recall(
            ap.join(sample.select("query_id"), "query_id"), exact_ap
        )
        recall[f"{name}_cfg"] = cfg
        for fr in getattr(ap, "_persisted_frames", []):
            fr.unpersist()
    exact_ap.unpersist()
    rc.unpersist()
    extra["ann_recall"] = recall

    # ------------------------------------------------------- sf1 block
    # One order of magnitude up (15k entities ~ sf1), best-of-2 per
    # point: growth factors are the product of this block, and a single
    # noisy run distorts them as badly as the q2 generation noise the
    # round-3 verdict flagged (observed: a single sf1 scoring run
    # measured 30.5s in one session and 9.8s in another).
    if os.environ.get("SPARK_GRAFT_SF1", "1") == "1":
        progress("sf1 prep: materialize 15k-entity corpus (untimed)")
        spark.catalog.clearCache()
        t1path = f"{scratch}/transcripts_sf1.parquet"
        materialize_transcripts(spark, t1path, SF1_ENTITIES)
        docs1 = assemble_documents(
            spark.read.parquet(t1path).repartition(CPUS)
        ).persist()
        n_docs1 = docs1.count()
        max_len1 = docs1.agg(F.max("doc_len")).collect()[0][0] or 1
        k1 = max(1, int(0.12 * max_len1) + 1)

        progress("sf1 scoring stage")
        n_pairs1, _, sec_s1, _ = run_scoring_stage(
            spark, docs1, k1, runs=2, agg="min"
        )
        progress("sf1 q3 dedup")
        docs1_tbl = docs1.select(
            F.col("conv_id").alias("doc_id"), F.col("doc").alias("text")
        )
        sec_d1, _ = timed_best2(lambda: minhash_lsh_duplicates(
            docs1_tbl, "text", "doc_id", jaccard_threshold=0.5).count())

        # q7/q8 growth (r4 verdict #4): the two newest end-to-end
        # endpoints measured at 1x and 10x WITHIN the same corpus
        # family (assembled transcript docs), so the factor is a clean
        # like-for-like 10x — the sf0.1 q7/q8 lines time the parquet
        # documents table, a different text-length distribution.
        progress("sf1 q7 cleanse growth (1x and 10x)")
        base_tbl = docs.select(
            F.col("conv_id").alias("doc_id"), F.col("doc").alias("text")
        ).persist()
        n_base_docs = base_tbl.count()

        def cleanse_on(tbl):
            res = prepare_training_corpus(
                tbl, cfg=CleanseConfig(
                    min_tokens=5, quality_threshold=0.5, langs=None,
                    jaccard_threshold=0.5, num_bands=8,
                ),
            )
            n = res.metrics["n_near"]
            res.unpersist()
            return n

        sec_q7_base, _ = timed_best2(lambda: cleanse_on(base_tbl))
        sec_q7_sf1, _ = timed_best2(lambda: cleanse_on(docs1_tbl))

        progress("sf1 q8 linkage growth (1x and 10x)")

        def linkage_on(tbl):
            ll = tbl.select(F.col("doc_id").alias("id"), "text")
            lr = tbl.where(
                F.xxhash64("doc_id") % 2 == 0
            ).select(
                F.concat(F.lit("r_"), F.col("doc_id")).alias("id"),
                F.concat(
                    F.substring("text", 1, 39), F.expr("substring(text, 41)")
                ).alias("text"),
            )
            res = link_records(ll, lr, cfg=LinkConfig(sim_threshold=0.85))
            n = res.best.count()
            res.unpersist()
            return n

        sec_q8_base, _ = timed_best2(lambda: linkage_on(base_tbl))
        sec_q8_sf1, _ = timed_best2(lambda: linkage_on(docs1_tbl))
        base_tbl.unpersist()
        docs1.unpersist()
        progress("sf1 q2b distributed CC")
        spark.catalog.clearCache()
        sec_c1, _ = timed_best2(
            lambda: er_from_parquet(spark, t1path, cc_local_threshold=0)
        )

        def growth(sf1_sec, base_sec):
            return round(sf1_sec / base_sec, 2) if base_sec > 0 else None

        extra["sf1"] = {
            "n_entities": SF1_ENTITIES, "n_docs": n_docs1,
            "scale_vs_sf01": round(SF1_ENTITIES / N_ENTITIES, 1),
            "scoring": {
                "pairs": n_pairs1, "sec": round(sec_s1, 3),
                "pairs_per_sec": round(n_pairs1 / sec_s1, 1),
                "pairs_ratio": round(n_pairs1 / max(n_pairs, 1), 2),
                "growth_vs_q1": growth(sec_s1, queries["q1_pair_scoring"]),
            },
            "minhash_dedup": {
                "n_docs": n_docs1, "sec": round(sec_d1, 3),
                "growth_vs_q3": growth(sec_d1, queries["q3_minhash_dedup"]),
            },
            "cc_distributed": {
                "sec": round(sec_c1, 3),
                "growth_vs_q2b": growth(sec_c1, queries["q2b_cc_distributed"]),
            },
            "corpus_cleanse": {
                "n_docs_base": n_base_docs, "n_docs_sf1": n_docs1,
                "sec_base": round(sec_q7_base, 3),
                "sec_sf1": round(sec_q7_sf1, 3),
                "growth_10x": growth(sec_q7_sf1, sec_q7_base),
            },
            "linkage": {
                "n_docs_base": n_base_docs, "n_docs_sf1": n_docs1,
                "sec_base": round(sec_q8_base, 3),
                "sec_sf1": round(sec_q8_sf1, 3),
                "growth_10x": growth(sec_q8_sf1, sec_q8_base),
            },
            "note": ("best-of-2 at 10x input; scoring/dedup/CC growth "
                     "vs the sf0.1 queries; cleanse/linkage growth is "
                     "1x-vs-10x WITHIN the assembled-transcript corpus "
                     "family (like-for-like input) — sub-quadratic "
                     "growth expected everywhere (scoring/dedup ~linear "
                     "in pairs/docs, CC ~rounds x linear)"),
        }

    total = round(sum(queries.values()), 3)

    # ---------------------------------------------------- scaling block
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
    scaling_entities = max(N_ENTITIES, 1500)
    spark.catalog.clearCache()
    sdocs = build_docs(spark, scaling_entities)
    # fanout 300 -> ~670k pairs: each point needs enough kernel work
    # that fixed per-job/stage costs are noise (a 254k-pair point
    # finished <4s on local[8] and scheduling overhead capped the
    # measured speedup); at sf<0.1 the corpus is floored to the sf0.1
    # size — the scaling points are compared against EACH OTHER on
    # identical input, so the corpus only needs to be honest per run
    pairs_path = f"{scratch}/pairs.parquet"
    scoring_pairs(sdocs, fanout=300).repartition(64).write.mode(
        "overwrite"
    ).parquet(pairs_path)

    # skew corpus (measured below in its own local[8] session): 10% of
    # the documents table forced into ONE blocking key — the adversarial
    # hot block explicit skew handling exists for
    skew_path = f"{scratch}/skew_docs.parquet"
    sf_docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 == 0,
            F.concat(F.lit("HOTBLOCKKEY."), F.expr("substring(text, 13)")),
        ).otherwise(F.col("text")).alias("text"),
    ).repartition(8).write.mode("overwrite").parquet(skew_path)
    spark.stop()

    points = (2, 8, 32) if os.environ.get("SPARK_GRAFT_SCALING") == "1" else (2, 8)
    scaling: dict = {}
    for attempt in range(2):
        for n in points:
            progress(f"scaling local[{n}] (attempt {attempt + 1})")
            scaling[f"local[{n}]"] = measure_scaling_point(n, k, pairs_path)
        eff28 = (scaling["local[8]"]["pairs_per_sec"]
                 / (4 * scaling["local[2]"]["pairs_per_sec"]))
        scaling["efficiency_2_to_8"] = round(eff28, 3)
        if 0.7 <= eff28 <= 1.05:
            scaling["contended"] = False
            break
        # a ratio outside the physically-plausible band means a point
        # ran against host interference — re-measure the whole set once
        scaling["contended"] = True
        progress(f"scaling ratio {eff28:.3f} outside [0.7, 1.05] — retrying")
    if "local[32]" in scaling:
        eff832 = (scaling["local[32]"]["pairs_per_sec"]
                  / (4 * scaling["local[8]"]["pairs_per_sec"]))
        scaling["efficiency_8_to_32"] = round(eff832, 3)
    scaling["note"] = ("median-of-3 per point, measured this run; "
                       "local[2]->local[8] is the N->4N cluster "
                       "analogue — BASELINE.md has the methodology and "
                       "the multiprocessing control. contended=true "
                       "marks a ratio outside [0.7, 1.05] that "
                       "persisted through one full re-measure.")
    extra["scaling"] = scaling

    # ------------------------------------------------------- skew block
    # Adversarial-skew evidence (r4 verdict #6): 10% of the corpus
    # shares ONE blocking prefix (a 500-doc hot block -> ~125k pairs on
    # one key). Three plans over the identical corpus at local[8], AQE
    # disabled (AQE skew-join cannot split a self-join key that
    # explodes quadratically — pairs.py docstring), full-DP scoring
    # (k=None) so every pair carries real kernel work:
    #   naive_fused    — the textbook ER plan: payloads ride the block
    #                    self-join and scoring fuses onto its output,
    #                    so the hot key pins the KERNEL work on one task;
    #   engine (x2)    — candidate_pairs + score_pairs, salting off/on:
    #                    the ids-only quadratic edge + pair-distinct +
    #                    payload-reattach shuffles rebalance the kernel
    #                    work in BOTH configurations, so the engine is
    #                    flat under the hot key with or without salting.
    # Salting's remaining role is capping the per-task OUTPUT of the
    # enumeration edge (the 10^12-pairs-on-one-key regime; at sandbox
    # scale enumeration is distinct-shuffle-bound — measured flat at
    # 18M hot pairs). Outputs asserted identical across all three.
    progress("skew: naive vs engine (salted/unsalted) hot block at local[8]")
    from triple_accel_spark.operators.blocking import with_prefix_blocks
    from triple_accel_spark.operators.pairs import candidate_pairs

    # auto-broadcast disabled: at sandbox scale the 1.5MB corpus side
    # broadcasts and the hot key never shuffles — a 100 TB corpus side
    # cannot broadcast, and THAT is the regime explicit skew handling
    # exists for; the session emulates it
    sk = get_spark(
        "bench-skew", master="local[8]", shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false",
                    "spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    skd = sk.read.parquet(skew_path).persist()
    n_skew_docs = skd.count()

    def _chk(scored):
        row = scored.agg(
            F.count(F.lit(1)).alias("n"), F.sum("dist").alias("chk")
        ).collect()[0]
        return row["n"], row["chk"]

    def skew_naive():
        b = with_prefix_blocks(skd, "text", prefix_len=12)
        lft = b.select(F.col("doc_id").alias("id_a"),
                       F.col("text").alias("text_a"), "block_key")
        rgt = b.select(F.col("doc_id").alias("id_b"),
                       F.col("text").alias("text_b"), "block_key")
        p = lft.join(rgt, "block_key").where(F.col("id_a") < F.col("id_b"))
        return _chk(score_pairs(p, "text_a", "text_b", k=None,
                                sim_threshold=None))

    def skew_engine(salted: bool):
        blocked = with_prefix_blocks(skd, "text", prefix_len=12)
        pairs = candidate_pairs(
            blocked, id_col="doc_id", block_col="block_key",
            payload_cols=("text",), max_block_size=None,
            salt_threshold=(64 if salted else 1 << 40),
        )
        out = _chk(score_pairs(pairs, "text_a", "text_b", k=None,
                               sim_threshold=None))
        for fr in getattr(pairs, "_persisted_frames", []):
            fr.unpersist()
        return out

    # cheap Python-worker warm-up (not a full skew run)
    score_pairs(
        skd.limit(50).select(F.col("text").alias("text_a"),
                             F.col("text").alias("text_b")),
        "text_a", "text_b", k=None,
    ).count()
    sec_es, (n_es, chk_es) = timed_best2(lambda: skew_engine(True))
    sec_eu, (n_eu, chk_eu) = timed_best2(lambda: skew_engine(False))
    sec_nv, (n_nv, chk_nv) = timed(skew_naive)  # one run: it is the slow case
    assert (n_es, chk_es) == (n_eu, chk_eu) == (n_nv, chk_nv), (
        f"skew outputs diverged: {(n_es, chk_es)} {(n_eu, chk_eu)} "
        f"{(n_nv, chk_nv)}"
    )
    extra["skew"] = {
        "n_docs": n_skew_docs, "hot_fraction": 0.1, "n_pairs": n_es,
        "naive_fused_sec": round(sec_nv, 3),
        "engine_unsalted_sec": round(sec_eu, 3),
        "engine_salted_sec": round(sec_es, 3),
        "speedup_vs_naive": round(sec_nv / sec_es, 2) if sec_es > 0 else None,
        "outputs_identical": True,
        "note": ("10% of docs share one 12-char blocking prefix; "
                 "local[8], AQE off, k=None full-DP scoring; identical "
                 "(count, dist-checksum) across all three plans. The "
                 "naive fused plan pins the hot block's kernel work on "
                 "one task; the engine's ids-only edge + reattach "
                 "shuffles keep kernel work balanced with or without "
                 "salting, and salting bounds the enumeration task's "
                 "output for blocks too hot for one task to emit."),
    }
    sk.stop()
    shutil.rmtree(scratch, ignore_errors=True)

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
