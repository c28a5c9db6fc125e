#!/usr/bin/env bash
# North-rule deployment-shape scaling evidence: the ACTUAL
# `spark-submit --py-files` job at two cluster sizes (local[2] vs
# local[8] — N vs 4N parallelism) on one identical pre-materialized
# transcript corpus. Best-of-2 per size; prints one JSON line.
#
# This complements scripts/scaling_pipeline.py (same measurement inside
# one driver process): here the unit is the real deployment artifact —
# zip + spark-submit + parquet input + metrics.json — so the number is
# end-to-end job wall time including JVM/session startup amortized out
# by best-of-2. Corpus size: $1 (default 15000 entities; see
# BASELINE.md for the Amdahl fixed-vs-compute decomposition — small
# corpora measure fixed costs, not the engine).
set -euo pipefail
cd "$(dirname "$0")/.."
ENTITIES="${1:-15000}"
WORK="$(mktemp -d /tmp/spark_graft_submit_XXXX)"
trap 'rm -rf "$WORK"' EXIT

python - "$ENTITIES" "$WORK/transcripts.parquet" <<'EOF'
import sys
from triple_accel_spark.session import get_spark
from bench import materialize_transcripts
spark = get_spark("scalesubmit-prep", master="local[32]", shuffle_partitions=32)
materialize_transcripts(spark, sys.argv[2], int(sys.argv[1]))
spark.stop()
EOF

zip -qr "$WORK/tas.zip" triple_accel_spark

for N in 2 8; do
  best=""
  for run in 1 2; do
    out="$WORK/out_${N}_${run}"
    spark-submit --master "local[$N]" \
      --driver-memory "${SPARK_GRAFT_SUBMIT_MEM:-24g}" \
      --conf spark.sql.shuffle.partitions=$((N * 2)) \
      --conf spark.sql.files.maxPartitionBytes=16m \
      --py-files "$WORK/tas.zip" \
      jobs/resolve_job.py \
      --input "$WORK/transcripts.parquet" --output "$out" \
      >"$WORK/log_${N}_${run}" 2>&1
    sec=$(python -c "import json; print(json.load(open('$out/metrics.json'))['wall_sec'])")
    recs=$(python -c "import json; print(json.load(open('$out/metrics.json'))['n_records'])")
    if [ -z "$best" ] || python -c "exit(0 if $sec < $best else 1)"; then best="$sec"; fi
  done
  eval "SEC_$N=$best"
  eval "REC_$N=$recs"
done

python - <<EOF
import json
s2, s8, recs = $SEC_2, $SEC_8, $REC_2
print(json.dumps({
    "n_entities": $ENTITIES, "records": recs,
    "local[2]": {"sec": s2, "records_per_sec": round(recs / s2, 1)},
    "local[8]": {"sec": s8, "records_per_sec": round(recs / s8, 1)},
    "efficiency_2_to_8": round((recs / s8) / (4 * recs / s2), 3),
    "note": "spark-submit --py-files deployment shape, best-of-2 per size, identical parquet input",
}))
EOF
