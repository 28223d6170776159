#!/bin/bash
# Round-4 TPU queue, stage 1: the flagship physics/LR A/B.
#
# Arm A = round-3 flagship physics + the sigma-floor LR fix (--min-std 0.2,
#         EXPERIMENTS.md §13: caps the sigma^2 adaptive-KL ratchet).
# Arm B = arm A + calf hull sphere-chain + 2 cm torsional patch
#         (EXPERIMENTS.md §14 geometry hypothesis).
# Both run the teacher/student eval split (VERDICT round-3 item 7):
# num_envs 4100 with 100 eval envs keeps 4000 TRAIN envs for curve
# comparability with the reference example run.
#
# The winner is continued to >=2500 iterations in a separate stage (its
# jit signatures are then warm). ONE TPU process at a time (CLAUDE.md);
# never kill a stage mid-compile.
set -u
cd "$(dirname "$0")/.."
Q=runs/r4_queue_status.txt
mark() { echo "$(date +%H:%M:%S) $*" | tee -a "$Q"; }

mark "=== round-4 queue stage 1 start ==="

# 0. wait for any in-flight TPU python (bench) to exit; never kill it
while ps -o args= -C python 2>/dev/null | grep -v JAX_PLATFORMS=cpu \
      | grep -Eq "bench\.py|scripts/train\.py"; do
  sleep 20
done
mark "TPU free"

run_train() {  # name iterations timeout extra-args...
  local name=$1 iters=$2 tmo=$3; shift 3
  mark "START $name"
  mkdir -p "runs/$name"
  timeout "$tmo" python scripts/train.py --iterations "$iters" \
      --logdir "runs/$name" "$@" > "runs/$name/queue.log" 2>&1
  mark "END $name rc=$?"
}

run_train r4_armA_minstd 800 7200 \
  --min-std 0.2 --num-envs 4100 --num-eval-envs 100

run_train r4_armB_hull 800 7200 \
  --min-std 0.2 --num-envs 4100 --num-eval-envs 100 \
  --mesh-sphere-fit hull --torsional-patch-radius 0.02

mark "=== round-4 queue stage 1 done ==="
