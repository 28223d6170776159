#!/bin/bash
# Round-4 TPU queue v2 (replaces round4_queue.sh, which was retired before
# any TPU stage started — the physics forensics changed the arm design).
#
# Stage 1: resume runs/r3_flagship (it 750) with the sigma-floor LR fix
#          (--min-std 0.2) to >=2800 iterations — VERDICT items 1(a)+4.
# Stage 2: Go1 at scale (VERDICT item 5).
# Stage 3: HLP goal navigation on the stage-1 policy (VERDICT item 6).
#
# ONE TPU process at a time; never kill a stage mid-compile (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
Q=runs/r4_queue_status.txt
mark() { echo "$(date +%H:%M:%S) $*" | tee -a "$Q"; }

mark "=== round-4 queue v2 start ==="

while ps -o args= -C python 2>/dev/null \
      | grep -Eq "bench\.py|scripts/(train|high_level_play)\.py"; do
  sleep 20
done
mark "TPU free"

mark "START r4_flagship_resume"
mkdir -p runs/r4_flagship_resume
timeout 7200 python scripts/train.py --iterations 2800 \
    --resume runs/r3_flagship/checkpoints/train_state_last.pkl \
    --min-std 0.2 --logdir runs/r4_flagship_resume \
    > runs/r4_flagship_resume/queue.log 2>&1
mark "END r4_flagship_resume rc=$?"

mark "START r4_go1"
mkdir -p runs/r4_go1
timeout 5400 python scripts/train.py --robot go1 --iterations 800 \
    --logdir runs/r4_go1 > runs/r4_go1/queue.log 2>&1
mark "END r4_go1 rc=$?"

mark "START r4_hlp"
mkdir -p runs/r4_hlp
timeout 5400 python scripts/high_level_play.py \
    --ll-run runs/r4_flagship_resume --iterations 500 --num-envs 1024 \
    --logdir runs/r4_hlp > runs/r4_hlp/queue.log 2>&1
mark "END r4_hlp rc=$?"

mark "=== round-4 queue v2 done ==="
