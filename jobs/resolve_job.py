"""Cluster entry point: run the transcript ER pipeline end-to-end.

Launch (the north-rule deployment shape)::

    spark-submit --py-files triple_accel_spark.zip jobs/resolve_job.py \
        --input  /path/to/transcripts.parquet \
        --output /path/to/out \
        [--format parquet|table|iceberg|<datasource>] \
        [--checkpoint-dir /path/to/ckpt] [--sim-threshold 0.88] \
        [--synth N]   # no --input: synthesize N entities (dev/demo)

``--format table``/``iceberg`` treats ``--input`` as a catalog table
identifier (``spark.table``; see ``sources.transcripts.load_transcripts``
for the Iceberg session-config keys) — the north-rule input shape.

Writes ``{output}/clusters`` (parquet: id, cluster_id) and
``{output}/metrics.json``; CC iterations checkpoint under
``--checkpoint-dir`` and resume from the committed manifest on
restart.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", default=None)
    p.add_argument("--format", dest="source_format", default="parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--metrics-dir", default=None)
    p.add_argument("--run-id", default="run0")
    p.add_argument("--sim-threshold", type=float, default=0.88)
    p.add_argument("--synth", type=int, default=200)
    args = p.parse_args()

    from triple_accel_spark.pipeline import ResolveConfig, resolve_entities
    from triple_accel_spark.session import get_submit_session

    spark = get_submit_session("triple_accel_spark.resolve")

    if args.input:
        from triple_accel_spark.sources.transcripts import load_transcripts

        transcripts = load_transcripts(spark, args.input, args.source_format)
    else:
        from triple_accel_spark.sources.transcripts import generate_transcripts

        tdf, _ = generate_transcripts(n_entities=args.synth, seed=42)
        transcripts = spark.createDataFrame(tdf)

    t0 = time.time()
    res = resolve_entities(
        transcripts,
        ResolveConfig(
            sim_threshold=args.sim_threshold,
            checkpoint_dir=args.checkpoint_dir,
            metrics_dir=args.metrics_dir,
            run_id=args.run_id,
        ),
    )
    t_w = time.time()
    res.clusters.write.mode("overwrite").parquet(f"{args.output}/clusters")
    res.metrics["t_write"] = round(time.time() - t_w, 3)
    res.metrics["wall_sec"] = round(time.time() - t0, 3)
    with open(f"{args.output}/metrics.json", "w") as f:
        json.dump(res.metrics, f, indent=2)
    print(json.dumps(res.metrics))
    res.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
