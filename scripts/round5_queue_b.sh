#!/bin/bash
# Round-5 queue stage B (waits for stage A to free the TPU):
#   1. Rollout-phase profile (VERDICT r4 task 4): attribute the ~690 ms
#      rollout at 4000 envs to physics kernel / obs-reward epilogue /
#      policy / storage+GAE.
#   2. r5_hlp_visible — the HLP goal-reaching demo arm (VERDICT r4 task
#      1): terminal rewards visible (quirk off) + potential-based
#      progress shaping + sigma floor, 1500 iters on the r4 flagship
#      checkpoint. r4_hlp2 (quirk on) is the A/B contrast arm.
#   3. Go1 DR eval sweep on the finished r5_go1 run (VERDICT r4 task 7).
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }

while ! grep -q "queue A done" runs/r5_queue_status.txt; do sleep 30; done

mark "=== round-5 queue B start ==="

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
