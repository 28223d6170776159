#!/bin/bash
# Round-5 queue stage F (waits for stage E): evidence artifacts that the
# workspace reset destroyed, regenerated at the new (gather-free sensing)
# speed — plus the terrain-strategy decision bench for EXPERIMENTS.md.
#   1. r5_refhp — the reference-hyperparameter A/B (entropy 0.01 constant,
#      min_std 0): EXPERIMENTS.md §24 documents the death spiral from the
#      lost run; this re-creates the runs/ artifact past the 800-iter
#      decision bar.
#   2. terrain micro-bench — mm vs take vs direct vs plane (§26 decision).
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }

while ! grep -q "queue E done" runs/r5_queue_status.txt 2>/dev/null; do
    sleep 60
done

mark "=== round-5 queue F start ==="

mark "START r5_refhp"
mkdir -p runs/r5_refhp
timeout 5400 python scripts/train.py --iterations 1200 \
    --entropy-coef 0.01 --entropy-warmup 0 --min-std 0.0 \
    --logdir runs/r5_refhp \
    > runs/r5_refhp/queue.log 2>&1
mark "END r5_refhp rc=$?"

mark "START terrain_bench"
timeout 2700 python scripts/bench_terrain.py --num-envs 4000 --iters 10 \
    > runs/r5_terrain_bench.log 2>&1
mark "END terrain_bench rc=$?"

mark "=== round-5 queue F done ==="
