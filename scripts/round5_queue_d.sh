#!/bin/bash
# Round-5 queue stage D (waits for stage C):
#   r5_hlp2 — the corrected HLP goal-reaching arm. r5_hlp_visible learned
#   saturated bang-bang commands (raw logits ~300, adaptive LR pegged at
#   1e-2; goals only by chance, deterministic eval 0/20). This arm adds
#   the two fixes: LR cap 1e-3 and a small action-magnitude penalty, on
#   top of visible terminals + progress shaping + sigma floor. The mm
#   terrain path makes HLP iterations ~4x faster than stage B's arm.
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }

while ! grep -q "queue C done" runs/r5_queue_status.txt; do sleep 30; done

mark "=== round-5 queue D start ==="

mark "START r5_hlp2"
mkdir -p runs/r5_hlp2
timeout 7200 python scripts/high_level_play.py \
    --ll-run runs/r4_flagship_4000 --iterations 2000 --min-std 0.2 \
    --zero-reward-on-reset 0 --progress-scale 1.0 \
    --action-magnitude-scale -0.01 --max-lr 1e-3 \
    --logdir runs/r5_hlp2 \
    > runs/r5_hlp2/queue.log 2>&1
mark "END r5_hlp2 rc=$?"

mark "=== round-5 queue D done ==="
