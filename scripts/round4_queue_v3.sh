#!/bin/bash
# Round-4 queue v3: bench cache verification -> flagship to it 4000 ->
# HLP continued to 1500. One TPU process at a time; everything under
# timeout so a hang can't wedge the axon claim past its window.
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r4_queue_status.txt; }

mark "=== round-4 queue v3 start ==="

# 1. Fresh-process bench exactly as the driver runs it. A warm cache must
#    emit the headline JSON within a couple of minutes.
mark "START bench_verify"
timeout 2700 python bench.py > /tmp/bench_r4_verify.out 2> /tmp/bench_r4_verify.err
mark "END bench_verify rc=$?"

# 2. Flagship 3199 -> 4000 (signatures cache-warm from the v2 resume).
mark "START r4_flagship_4000"
mkdir -p runs/r4_flagship_4000
timeout 3600 python scripts/train.py --iterations 800 \
    --resume runs/r4_flagship_resume/checkpoints/train_state_last.pkl \
    --min-std 0.2 --logdir runs/r4_flagship_4000 \
    > runs/r4_flagship_4000/queue.log 2>&1
mark "END r4_flagship_4000 rc=$?"

# 3. HLP continued +1000 iters (reference trains 1000 total).
mark "START r4_hlp_cont"
mkdir -p runs/r4_hlp_cont
timeout 3600 python scripts/high_level_play.py \
    --ll-run runs/r4_flagship_resume --iterations 1000 --num-envs 1024 \
    --resume runs/r4_hlp2/checkpoints/train_state_last.pkl \
    --logdir runs/r4_hlp_cont > runs/r4_hlp_cont/queue.log 2>&1
mark "END r4_hlp_cont rc=$?"

mark "=== round-4 queue v3 done ==="
