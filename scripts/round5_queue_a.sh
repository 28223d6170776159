#!/bin/bash
# Round-5 queue stage A (code-unchanged runs first, so the warm .jax_cache
# and the round-4 checkpoints stay usable):
#   1. r5_refhp — VERDICT r4 task 2: the flagship arm with REFERENCE
#      hyperparameters (entropy_coef 0.01, no min_std floor) on the
#      round-4 physics. Decision rule: survives to it>=800 with a rising
#      curve -> reference hparams become the default; else a fresh A/B
#      re-confirms the documented deviation (EXPERIMENTS.md).
#   2. r5_go1 — VERDICT r4 task 7: promote Go1 to first-class. Resume
#      r4_go1 (it 790, rew 5.9, lr ratcheted to 5.5e-5, sigma 0.14) with
#      the proven --min-std 0.2 fix for +810 iters -> 1600 total.
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }

mark "=== round-5 queue A start ==="

mark "START r5_refhp"
mkdir -p runs/r5_refhp
timeout 9000 python scripts/train.py --iterations 1500 \
    --entropy-coef 0.01 --logdir runs/r5_refhp \
    > runs/r5_refhp/queue.log 2>&1
mark "END r5_refhp rc=$?"

mark "START r5_go1"
mkdir -p runs/r5_go1
timeout 7200 python scripts/train.py --robot go1 --iterations 810 \
    --resume runs/r4_go1/checkpoints/train_state_last.pkl \
    --min-std 0.2 --logdir runs/r5_go1 \
    > runs/r5_go1/queue.log 2>&1
mark "END r5_go1 rc=$?"

mark "=== round-5 queue A done ==="
