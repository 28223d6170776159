#!/bin/bash
# Round-4 queue v4 (runs after v3's HLP stage frees the TPU):
#   1. Go1 continued with the sigma floor (the r4_go1 curve plateaued with
#      lr ratcheted to 5.9e-5 — the same adaptive-KL sigma^2 ratchet the
#      MC flagship hit; --min-std 0.2 is the proven fix).
#   2. Final driver-scenario bench confirmation: fresh process, headline
#      arm only, must HIT the compile cache and emit the JSON in minutes.
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r4_queue_status.txt; }

# wait for v3 to release the TPU
while ! grep -q "queue v3 done" runs/r4_queue_status.txt; do sleep 30; done

mark "=== round-4 queue v4 start ==="

mark "START r4_go1_cont"
mkdir -p runs/r4_go1_cont
timeout 3600 python scripts/train.py --robot go1 --iterations 800 \
    --resume runs/r4_go1/checkpoints/train_state_last.pkl \
    --min-std 0.2 --logdir runs/r4_go1_cont \
    > runs/r4_go1_cont/queue.log 2>&1
mark "END r4_go1_cont rc=$?"

mark "START bench_confirm"
BENCH_SIZES=4000 BENCH_PALLAS=0 timeout 1500 python bench.py \
    > /tmp/bench_r4_confirm.out 2> /tmp/bench_r4_confirm.err
mark "END bench_confirm rc=$?"

mark "=== round-4 queue v4 done ==="
