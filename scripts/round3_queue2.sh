#!/bin/bash
# Round-3 continuation queue (replaces round3_queue.sh mid-flight).
#
# Context: the first bench capture's remote compiles ran ~25 min per new
# jit signature, so the original plan's stage budget was off ~3x. This
# queue (a) waits for the in-flight bench to exit instead of re-running
# it, (b) orders stages so expensive new-signature compiles buy the most
# VERDICT value, (c) keeps every stage behind the R3_DEADLINE guard so
# the relay is free before the driver's end-of-round bench.
#
# ONE TPU process at a time (CLAUDE.md). Never kill a stage mid-compile.
set -u
cd "$(dirname "$0")/.."
Q=runs/r3_queue_status.txt
DEADLINE=${R3_DEADLINE:-$(( $(date +%s) + 6000 ))}
mark() { echo "$(date +%H:%M:%S) $*" | tee -a "$Q"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

run_train() {  # name iterations min-seconds-needed extra-args...
  local name=$1 iters=$2 need=$3; shift 3
  local l; l=$(left)
  if [ "$l" -lt "$need" ]; then mark "SKIP $name (left=${l}s < ${need}s)"; return 1; fi
  mark "START $name (left=${l}s)"
  mkdir -p "runs/$name"
  timeout $(( l - 120 )) python scripts/train.py --iterations "$iters" \
      --logdir "runs/$name" "$@" > "runs/$name/queue.log" 2>&1
  mark "END $name rc=$?"
  return 0
}

mark "=== round-3 queue2 start (deadline in $(left)s) ==="

# 0. wait for the in-flight bench process to exit (natural end or its
#    3600s timeout); do NOT touch it — killing mid-compile wedges the claim
while ps -o args= -C python 2>/dev/null | grep -q "bench.py"; do
  sleep 15
done
mark "bench process gone (left=$(left)s)"

# 1. entropy A/B on round-3 physics (VERDICT items 1+2): ent001 is the
#    reference value AND the flagship parity attempt. 1200 iters covers
#    the @990 parity marks; the 4000-env rollout jit is cached from the
#    bench capture, only the entropy-0.01 update recompiles.
run_train r3_ent001 1200 2400 --entropy-coef 0.01

# 2. control arm: entropy 0.0, 700 iters (the round-2 death spiral hit
#    at it ~780; matched-iteration comparison against stage 1)
run_train r3_ent000 700 1500 --entropy-coef 0.0

# 3. Go1 at scale (VERDICT item 6; new-signature compile)
run_train go1_r3 1000 2400 --robot go1

# 4. substeps x implicit-PD A/B at 400 iters (VERDICT item 4);
#    each cell is a new rollout signature -> budget the compile
run_train ab_s1_ipd1 400 1800 --substeps 1 --implicit-pd 1
run_train ab_s1_ipd0 400 1800 --substeps 1 --implicit-pd 0
run_train ab_s2_ipd0 400 1800 --substeps 2 --implicit-pd 0

# 5. final bench pass: XLA signatures are now cached, so this mostly
#    measures + compiles the two pallas variants
l=$(left)
if [ "$l" -ge 1200 ]; then
  mark "START bench2 (left=${l}s)"
  timeout $(( l - 120 )) python bench.py > BENCH_r03_self.json 2> bench_r03_self2.log
  mark "END bench2 rc=$? $(cat BENCH_r03_self.json 2>/dev/null)"
else
  mark "SKIP bench2 (left=${l}s)"
fi

mark "=== round-3 queue2 done (left=$(left)s) ==="
