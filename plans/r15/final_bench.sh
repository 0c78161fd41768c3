#!/bin/bash
# r15 HEAD driver-protocol bench: 3 fresh default runs + 1 cold-mode run.
set -u
cd /root/repo
OUT=/root/repo/plans/r15/final_bench_results.jsonl
: > "$OUT"
steal_snap() { awk '/^cpu /{print $2+$3+$4+$5+$6+$7+$8+$9, $9}' /proc/stat; }
run_one() {
  local label="$1"; shift
  read t0 s0 < <(steal_snap)
  env "$@" SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
      python bench.py 2>/dev/null | tail -1 > /tmp/fb_line.json
  read t1 s1 < <(steal_snap)
  local steal=$(python3 -c "print(round(100*($s1-$s0)/max(1,($t1-$t0)),2))")
  python3 - "$label" "$steal" >> "$OUT" <<'EOF'
import json, sys
label, steal = sys.argv[1:3]
try:
    line = json.load(open("/tmp/fb_line.json"))
except Exception:
    line = None
print(json.dumps({"label": label, "steal_pct": float(steal), "bench": line}))
EOF
}
run_one default_1
run_one default_2
run_one default_3
run_one cold_1 SPARK_GRAFT_BENCH_COLD=1
echo DONE >> "$OUT"
