#!/bin/bash
# Same-window paired epoch attribution (VERDICT r16 #5): for each
# recurring suspect query, run the CURRENT tree and the exact R14 TREE
# back-to-back, isolated-JVM each, inside one quiet window — turning
# the "residual quiet-window tax" hypothesis into per-query fact.
# r14 tree: git archive a174f8c, pre-compiled at $R14.
set -u
cd /root/repo
R14="${R14:-/tmp/r14tree}"
LOG="${LOG:-evidence/r17_epoch_pairs.log}"
QUERIES="${QUERIES:-q328_stream_prewhiten q267_stream_periodogram q91_stream_file_sink q414_kruskal_wallis q407_cramer_von_mises q339_stream_wasserstein}"
PRE_STEAL_MAX="${PRE_STEAL_MAX:-0.8}"

steal_sample() {
  python3 - "$1" <<'EOF'
import sys, time
def snap():
    v=[int(x) for x in open('/proc/stat').readline().split()[1:]]
    return v[7], sum(v)
s0,t0=snap(); time.sleep(int(sys.argv[1])); s1,t1=snap()
print(f"{100*(s1-s0)/(t1-t0):.2f}")
EOF
}

run_one() {  # $1=tree $2=label $3=query
  local out
  out=$(cd "$1" && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
    SPARK_GRAFT_BENCH_ONLY="$3" SPARK_GRAFT_BENCH_OUT=/tmp/epoch_pair_scratch.json \
    SPARK_GRAFT_CPUS=32 /root/repo/scripts/run_main.sh -d "$1" graft.Bench 2>/dev/null \
    | grep -o '{"metric":"total".*}' | head -1)
  echo "$(date +%H:%M:%S) $3 $2 $out" >> "$LOG"
}

for q in $QUERIES; do
  for att in 1 2 3; do
    st=$(steal_sample 20)
    quiet=$(python3 -c "print(1 if $st <= $PRE_STEAL_MAX else 0)")
    echo "$(date +%H:%M:%S) $q att=$att pre_steal=$st quiet=$quiet" >> "$LOG"
    if [ "$quiet" = "1" ]; then
      cp BENCH_FULL.json /tmp/epoch_pair_scratch.json
      run_one /root/repo current "$q"
      cp "$R14/BENCH_FULL.json" /tmp/epoch_pair_scratch.json
      run_one "$R14" r14tree "$q"
      break
    fi
    sleep 120
  done
done
echo "$(date +%H:%M:%S) DONE" >> "$LOG"
