#!/bin/bash
# Round-5 queue stage B (waits for stage A to free the TPU):
#   1. r5_warmup — the entropy-warmup flagship arm (VERDICT r4 task 3):
#      entropy_coef 0.01 ramped in over 300 iters + min_std 0.2. Constant
#      0.01 death-spirals (r5_refhp: NaN by it 1250); constant 0 pins
#      sigma at the floor and drags the adaptive LR to 1e-4 by it 400
#      (r4 flagship: tracking 2.7 @ it 400 vs reference 12.7 @ 390).
#      Target: command_area >= 0.10 by it ~1000, tracking >= 13.
#   2. Rollout-phase profile (VERDICT r4 task 4).
#   3. r5_hlp_visible — HLP goal-reaching demo (VERDICT r4 task 1).
#   4. Go1 DR eval sweep on the finished r5_go1 run (VERDICT r4 task 7).
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }

while ! grep -q "queue A done" runs/r5_queue_status.txt; do sleep 30; done

mark "=== round-5 queue B start ==="

mark "START r5_warmup"
mkdir -p runs/r5_warmup
timeout 7200 python scripts/train.py --iterations 1300 \
    --entropy-coef 0.01 --entropy-warmup 300 --min-std 0.2 \
    --logdir runs/r5_warmup \
    > runs/r5_warmup/queue.log 2>&1
mark "END r5_warmup rc=$?"

mark "START profile_ablate"
timeout 3600 python scripts/profile_rollout.py --num-envs 4000 --iters 10 \
    > runs/r5_profile_ablate.log 2>&1
mark "END profile_ablate rc=$?"

mark "START r5_hlp_visible"
mkdir -p runs/r5_hlp_visible
timeout 7200 python scripts/high_level_play.py \
    --ll-run runs/r4_flagship_4000 --iterations 1500 --min-std 0.2 \
    --zero-reward-on-reset 0 --progress-scale 1.0 \
    --logdir runs/r5_hlp_visible \
    > runs/r5_hlp_visible/queue.log 2>&1
mark "END r5_hlp_visible rc=$?"

mark "START go1_eval_sweep"
timeout 3600 python scripts/eval_sweep.py --logdir runs/r5_go1 \
    --num-envs 256 --steps 250 \
    > runs/r5_go1/eval_sweep.log 2>&1
mark "END go1_eval_sweep rc=$?"

mark "=== round-5 queue B done ==="
