"""Job-level N->4N scaling evidence: the FULL resolve_entities pipeline
(scan -> assemble -> block -> pair -> score -> threshold -> CC) at
local[2] vs local[8] on an identical pre-materialized transcript corpus.

The per-round bench measures the scoring STAGE's scaling (the compute
kernel, the part that grows with data); this script measures the whole
job — the north rule's literal object ("throughput scaling efficiency
between N and 4N executors" for the spark-submit pipeline). Run at a
corpus size where compute dominates fixed per-stage costs (default 15k
entities, the sf1-scale corpus): at toy sizes the pipeline is
driver/stage-scheduling bound and a low ratio would measure Amdahl
fixed costs, not the engine.

Usage:  python scripts/scaling_pipeline.py
Env:    SCALING_PIPELINE_ENTITIES (default 15000), SCALING_PIPELINE_RUNS
        (default 2, best-of)
Prints one JSON line; record results in BASELINE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import er_from_parquet, materialize_transcripts, progress  # noqa: E402
from triple_accel_spark.session import get_spark  # noqa: E402

N_ENTITIES = int(os.environ.get("SCALING_PIPELINE_ENTITIES", "15000"))
RUNS = int(os.environ.get("SCALING_PIPELINE_RUNS", "2"))


def main() -> None:
    scratch = tempfile.mkdtemp(prefix="spark_graft_scalepipe_")
    tpath = f"{scratch}/transcripts.parquet"
    progress(f"materialize {N_ENTITIES}-entity corpus (untimed)")
    s = get_spark("scalepipe-prep", master="local[32]", shuffle_partitions=32)
    materialize_transcripts(s, tpath, N_ENTITIES)
    s.stop()

    out: dict = {"n_entities": N_ENTITIES, "runs_per_point": RUNS}
    docs = None
    for n in (2, 8):
        progress(f"pipeline at local[{n}]")
        s = get_spark(
            f"scalepipe-{n}", master=f"local[{n}]", shuffle_partitions=n * 2,
            extra_conf={"spark.sql.files.maxPartitionBytes": "16m"},
        )
        secs = []
        for _ in range(RUNS):
            t0 = time.time()
            docs = er_from_parquet(s, tpath)
            secs.append(time.time() - t0)
        s.stop()
        best = min(secs)
        out[f"local[{n}]"] = {
            "sec": round(best, 3),
            "runs_sec": [round(x, 3) for x in secs],
            "records_per_sec": round(docs / best, 1),
        }
    out["records"] = docs
    out["efficiency_2_to_8"] = round(
        out["local[8]"]["records_per_sec"]
        / (4 * out["local[2]"]["records_per_sec"]), 3,
    )
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
