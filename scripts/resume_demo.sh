#!/usr/bin/env bash
# End-to-end checkpoint/resume evidence (north rule: resumable from
# checkpoint). Runs the spark-submit job to completion, simulates a
# crash by truncating the committed checkpoint state to iteration 0,
# re-runs with the same checkpoint dir, and verifies the resumed run
# continues from the manifest and emits bit-identical clusters.
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=$(mktemp -d)
trap 'rm -rf "$WORK"' EXIT
zip -qr "$WORK/tas.zip" triple_accel_spark

spark-submit --master 'local[8]' --py-files "$WORK/tas.zip" \
  jobs/resolve_job.py --output "$WORK/out1" \
  --checkpoint-dir "$WORK/ckpt" --synth 400 > "$WORK/run1.log" 2>&1

python - "$WORK" <<'EOF'
import json, shutil, sys
w = sys.argv[1]
m = json.load(open(f"{w}/ckpt/manifest.json"))
assert m["iterations"], "no committed iterations"
m["iterations"] = m["iterations"][:1]  # crash after the first commit
json.dump(m, open(f"{w}/ckpt/manifest.json", "w"))
# wipe everything after the kept commit (its iteration number depends
# on the checkpoint interval — read it from the manifest)
kept = m["iterations"][0]["iteration"]
for it in range(kept + 1, 100):
    shutil.rmtree(f"{w}/ckpt/iter_{it:04d}", ignore_errors=True)
EOF

spark-submit --master 'local[8]' --py-files "$WORK/tas.zip" \
  jobs/resolve_job.py --output "$WORK/out2" \
  --checkpoint-dir "$WORK/ckpt" --synth 400 > "$WORK/run2.log" 2>&1

python - "$WORK" <<'EOF'
import sys, duckdb
w = sys.argv[1]
a = duckdb.sql(f"select * from read_parquet('{w}/out1/clusters/*.parquet') order by id").fetchall()
b = duckdb.sql(f"select * from read_parquet('{w}/out2/clusters/*.parquet') order by id").fetchall()
assert a == b and a, f"cluster mismatch after resume ({len(a)} vs {len(b)} rows)"
print(f"OK: resumed run produced identical clusters ({len(a)} rows)")
EOF
