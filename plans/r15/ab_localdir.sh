#!/bin/bash
# A/B: tmpfs scratch defaults (r14) vs Spark/repo defaults (pre-r14), under
# the DRIVER protocol: one fresh `python bench.py` process per measurement,
# local[32], sf0.1, default reps. Alternating order, steal% recorded around
# each run from /proc/stat.
set -u
cd /root/repo
OUT=/root/repo/plans/r15/ab_localdir_results.jsonl
: > "$OUT"

steal_snap() { awk '/^cpu /{print $2+$3+$4+$5+$6+$7+$8+$9, $9}' /proc/stat; }

run_one() {
  local label="$1"; shift
  read t0 s0 < <(steal_snap)
  local wall0=$(date +%s.%N)
  env "$@" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench.py 2>/dev/null | tail -1 > /tmp/ab_line.json
  local rc=$?
  local wall1=$(date +%s.%N)
  read t1 s1 < <(steal_snap)
  local steal=$(python3 -c "print(round(100*($s1-$s0)/max(1,($t1-$t0)),2))")
  python3 - "$label" "$rc" "$steal" "$wall0" "$wall1" >> "$OUT" <<'EOF'
import json, sys
label, rc, steal, w0, w1 = sys.argv[1:6]
try:
    line = json.load(open("/tmp/ab_line.json"))
except Exception:
    line = None
print(json.dumps({"label": label, "rc": int(rc), "steal_pct": float(steal),
                  "wall_sec": round(float(w1)-float(w0),1), "bench": line}))
EOF
}

for i in 1 2 3 4; do
  run_one "disk_$i" SPARK_GRAFT_LOCAL_DIR= SPARK_GRAFT_SCRATCH=/root/repo/.tmp
  run_one "tmpfs_$i"
done
echo DONE >> "$OUT"
