#!/bin/bash
# Quiet-window sf0.1 full-suite bench orchestrator (VERDICT r16 #1).
# Samples /proc/stat hypervisor steal and launches the full Bench suite
# only under a threshold; after each run, checks the protocol acceptance
# fields (anchors_out_of_band, in-run steal_pct) and retries if the box
# degraded mid-run. Logs every decision to evidence/.
set -u
cd /root/repo
SF_DIR="${SF_DIR:-/root/testdata/sf0.1}"
# Attempts write to a scratch copy seeded with the committed record:
# Bench reads its retime-fence priors from the out file, so seeding
# keeps the fence baselines, while an UNACCEPTED degraded attempt never
# clobbers the committed BENCH_FULL.json (it only replaces the scratch).
FINAL_OUT="${FINAL_OUT:-BENCH_FULL.json}"
OUT="${OUT:-/tmp/bench_attempt.json}"
[ -f "$FINAL_OUT" ] && cp "$FINAL_OUT" "$OUT"
LOG="${LOG:-evidence/r17_sf01_attempts.log}"
MAX_ATTEMPTS="${MAX_ATTEMPTS:-5}"
PRE_STEAL_MAX="${PRE_STEAL_MAX:-0.8}"     # % over the 30s pre-sample
export RUN_STEAL_MAX="${RUN_STEAL_MAX:-1.0}"  # % over the whole run
WAIT_BETWEEN="${WAIT_BETWEEN:-180}"       # s between gate polls

steal_sample() {  # $1 = seconds
  python3 - "$1" <<'EOF'
import sys, time
def snap():
    v=[int(x) for x in open('/proc/stat').readline().split()[1:]]
    return v[7], sum(v)
s0,t0=snap(); time.sleep(int(sys.argv[1])); s1,t1=snap()
print(f"{100*(s1-s0)/(t1-t0):.2f}")
EOF
}

attempt=0
while [ "$attempt" -lt "$MAX_ATTEMPTS" ]; do
  attempt=$((attempt+1))
  st=$(steal_sample 30)
  load=$(cut -d' ' -f1 /proc/loadavg)
  quiet=$(python3 -c "print(1 if $st <= $PRE_STEAL_MAX else 0)")
  echo "$(date +%H:%M:%S) attempt=$attempt steal=$st load=$load quiet=$quiet" >> "$LOG"
  if [ "$quiet" != "1" ]; then
    attempt=$((attempt-1))   # a failed gate poll doesn't burn an attempt
    sleep "$WAIT_BETWEEN"
    continue
  fi
  SPARK_GRAFT_SF_DIR="$SF_DIR" SPARK_GRAFT_BENCH_OUT="$OUT" \
    sbt -batch "runMain graft.Bench" > /tmp/quiet_bench_att${attempt}.out 2>&1
  oob=$(python3 - "$OUT" <<'EOF'
import json,sys
try:
    d=json.load(open(sys.argv[1]))
    ok = (not d.get("anchors_out_of_band", True)) and float(d.get("steal_pct", 99)) <= float(__import__('os').environ.get('RUN_STEAL_MAX','1.0'))
    print(f'anchors={d.get("anchor_cpu")}/{d.get("anchor_shuffle")} steal_pct={d.get("steal_pct")} n={d.get("n")} n_failed={d.get("n_failed")} total={d.get("value")} suspects={len(d.get("suspect_vs_upper_rung",{}))} accepted={1 if ok else 0}')
except Exception as e:
    print(f"parse_error={e} accepted=0")
EOF
)
  echo "$(date +%H:%M:%S) RUN attempt=$attempt $oob" >> "$LOG"
  if echo "$oob" | grep -q 'accepted=1'; then
    cp "$OUT" "evidence/r17_sf01_accepted.json"
    cp "$OUT" "$FINAL_OUT"
    echo "$(date +%H:%M:%S) ACCEPTED attempt=$attempt -> $FINAL_OUT + evidence/r17_sf01_accepted.json" >> "$LOG"
    exit 0
  fi
  sleep "$WAIT_BETWEEN"
done
echo "$(date +%H:%M:%S) EXHAUSTED after $MAX_ATTEMPTS run attempts" >> "$LOG"
exit 1
