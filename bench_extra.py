"""Round-6 optimization harness: per-query isolation, per-stage timing
and plan capture for the frozen bench.py queries.

NOT a replacement for bench.py (which is frozen for measurement): this
file exists so optimization work can time one query at a time with a
noop sink (guide §1.4), label jobs (§1.5), and dump
``.explain("formatted")`` for plans/r06/. Numbers cited in
OPTIMIZATION_r06.md come from here unless marked as full-bench runs.

Usage:
  python bench_extra.py q2b q3 q8          # time selected queries
  python bench_extra.py --explain q3 q8    # also dump plans
  python bench_extra.py --suffix after q3  # plans/r06/<q>_after.txt
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from bench import (  # noqa: E402
    CPUS,
    N_ENTITIES,
    SF_DIR,
    build_docs,
    er_from_parquet,
    materialize_transcripts,
    run_scoring_stage,
    scoring_pairs,
)
from triple_accel_spark.operators.dedup import minhash_lsh_duplicates  # noqa: E402
from triple_accel_spark.session import get_spark  # noqa: E402

PLAN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plans", "r06")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def timed_best2(fn):
    s1, out = timed(fn)
    s2, out = timed(fn)
    return min(s1, s2), out


def dump_plan(df, name: str, suffix: str) -> None:
    os.makedirs(PLAN_DIR, exist_ok=True)
    with open(os.path.join(PLAN_DIR, f"{name}_{suffix}.txt"), "w") as f:
        f.write(df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_explain = "--explain" in sys.argv
    suffix = "before"
    if "--suffix" in sys.argv:
        suffix = sys.argv[sys.argv.index("--suffix") + 1]
        args.remove(suffix)
    want = set(args) or {"q1", "q2", "q2b", "q3", "q4b", "q4c", "q7", "q8"}

    spark = get_spark("bench-extra", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    sc = spark.sparkContext
    out: dict = {"sf_dir": SF_DIR, "cpus": CPUS}
    scratch = tempfile.mkdtemp(prefix="spark_graft_bx_")
    sf_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    if want & {"q1", "q2", "q2b"}:
        docs = build_docs(spark)
        docs.count()
        max_len = docs.agg(F.max("doc_len")).collect()[0][0] or 1
        k = max(1, int(0.12 * max_len) + 1)

    if "q1" in want:
        sc.setJobDescription("q1 pair scoring")
        n_pairs, _, sec, secs = run_scoring_stage(spark, docs, k)
        out["q1"] = {"sec": sec, "secs": secs, "pairs": n_pairs,
                     "pairs_per_sec": round(n_pairs / sec, 1)}
        if do_explain:
            from triple_accel_spark.operators.scoring import score_pairs
            p = scoring_pairs(docs).repartition(CPUS * 2)
            dump_plan(score_pairs(p, "doc_a", "doc_b", k=k,
                                  sim_threshold=None), "q1_scoring", suffix)

    if want & {"q2", "q2b"}:
        spark.catalog.clearCache()
        tpath = f"{scratch}/transcripts.parquet"
        materialize_transcripts(spark, tpath, N_ENTITIES)

    if "q2" in want:
        sc.setJobDescription("q2 er pipeline")
        sec, n = timed_best2(lambda: er_from_parquet(spark, tpath))
        out["q2"] = {"sec": sec, "n": n}

    if "q2b" in want:
        sc.setJobDescription("q2b cc distributed")
        # stage split comes from resolve_entities' own metrics
        from triple_accel_spark.pipeline import ResolveConfig, resolve_entities

        def q2b():
            t = spark.read.parquet(tpath).repartition(
                spark.sparkContext.defaultParallelism)
            with resolve_entities(
                t, ResolveConfig(sim_threshold=0.88, cc_local_threshold=0)
            ) as res:
                n = res.clusters.count()
                return n, {m: res.metrics[m] for m in
                           ("t_score_action", "t_cc_label",
                            "t_cluster_action", "n_matches")}

        spark.catalog.clearCache()
        sec, (n, m) = timed(q2b)
        spark.catalog.clearCache()
        sec2, (n, m2) = timed(q2b)
        out["q2b"] = {"sec": min(sec, sec2), "secs": [sec, sec2], "n": n,
                      "stages_run1": m, "stages_run2": m2}

    if "q3" in want:
        sc.setJobDescription("q3 minhash dedup")
        spark.catalog.clearCache()

        def q3():
            d = minhash_lsh_duplicates(sf_docs, "text", "doc_id",
                                       jaccard_threshold=0.5)
            n = d.count()
            for fr in getattr(d, "_persisted_frames", []):
                fr.unpersist()
            return n

        sec, n = timed_best2(q3)
        out["q3"] = {"sec": sec, "n": n}
        if do_explain:
            dump_plan(minhash_lsh_duplicates(sf_docs, "text", "doc_id",
                                             jaccard_threshold=0.5),
                      "q3_minhash", suffix)

    if want & {"q4b", "q4c"}:
        from triple_accel_spark.operators.similarity import lsh_all_pairs_topk

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double")).alias(
                "embedding"),
        )

        def allpairs(n_planes, n_tables):
            o = lsh_all_pairs_topk(emb, k=5, n_planes=n_planes,
                                   n_tables=n_tables)
            n = o.count()
            for fr in getattr(o, "_persisted_frames", []):
                fr.unpersist()
            return n

        if "q4b" in want:
            sc.setJobDescription("q4b allpairs lsh")
            sec, n = timed_best2(lambda: allpairs(6, 8))
            out["q4b"] = {"sec": sec, "n": n}
        if "q4c" in want:
            sc.setJobDescription("q4c allpairs tuned")
            sec, n = timed_best2(lambda: allpairs(3, 16))
            out["q4c"] = {"sec": sec, "n": n}
            if do_explain:
                dump_plan(lsh_all_pairs_topk(emb, k=5, n_planes=3,
                                             n_tables=16),
                          "q4c_allpairs", suffix)

    if "q7" in want:
        from triple_accel_spark.operators.corpus import (
            CleanseConfig,
            prepare_training_corpus,
        )

        sc.setJobDescription("q7 corpus cleanse")
        spark.catalog.clearCache()

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

        sec, n = timed_best2(cleanse)
        out["q7"] = {"sec": sec, "n": n}

    if "q8" in want:
        from triple_accel_spark.operators.linkage import LinkConfig, link_records

        sc.setJobDescription("q8 linkage")
        spark.catalog.clearCache()
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

        sec, n = timed_best2(linkage)
        out["q8"] = {"sec": sec, "n": n}
        if do_explain:
            res = link_records(link_left, link_right,
                               cfg=LinkConfig(sim_threshold=0.85))
            dump_plan(res.best, "q8_linkage_best", suffix)
            res.unpersist()

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
