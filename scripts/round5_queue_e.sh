#!/bin/bash
# Round-5 queue stage E (this session): regenerate the round-5 run
# artifacts lost in the workspace reset and land the remaining VERDICT
# items. Serialized — one TPU process at a time (CLAUDE.md).
#   1. r5_hlp2     — HLP goal-reaching arm with the saturation fixes
#                    (visible terminals + progress shaping + LR cap 1e-3
#                    + action-magnitude penalty). VERDICT r4 task 1.
#   2. r5_go1      — resume r4_go1 (it 790) +810 iters -> 1600 total with
#                    the min-std fix. VERDICT r4 task 7.
#   3. r5_flagship — full-length flagship on the NEW defaults (entropy
#                    0.01 w/ 300-iter warmup, min_std 0.2, mm terrain).
#                    Regenerates the r5_warmup evidence at full length.
#   4. evals       — DR sweep + GIFs for flagship/go1, HLP navigation GIF.
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }

# wait for the in-flight bench process to release the TPU claim
if [ -n "$WAIT_PID" ]; then
    while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
fi

mark "=== round-5 queue E start ==="

mark "START bench_v2"
BENCH_SIZES=4000,1024,8192 BENCH_PALLAS=0 BENCH_BUDGET_S=1200 \
    timeout 1800 python bench.py \
    > /tmp/bench_r5e2.out 2> /tmp/bench_r5e2.err
mark "END bench_v2 rc=$?"

mark "START r5_hlp2"
mkdir -p runs/r5_hlp2
timeout 7200 python scripts/high_level_play.py \
    --ll-run runs/r4_flagship_4000 --iterations 2000 --min-std 0.2 \
    --zero-reward-on-reset 0 --progress-scale 1.0 \
    --action-magnitude-scale -0.01 --max-lr 1e-3 \
    --logdir runs/r5_hlp2 \
    > runs/r5_hlp2/queue.log 2>&1
mark "END r5_hlp2 rc=$?"

mark "START r5_go1"
mkdir -p runs/r5_go1
timeout 5400 python scripts/train.py --robot go1 --iterations 810 \
    --resume runs/r4_go1/checkpoints/train_state_last.pkl \
    --min-std 0.2 --logdir runs/r5_go1 \
    > runs/r5_go1/queue.log 2>&1
mark "END r5_go1 rc=$?"

mark "START r5_flagship"
mkdir -p runs/r5_flagship
timeout 12600 python scripts/train.py --iterations 4000 \
    --logdir runs/r5_flagship \
    > runs/r5_flagship/queue.log 2>&1
mark "END r5_flagship rc=$?"

mark "START hlp_gif"
timeout 2700 python scripts/hlp_play.py --hlp-run runs/r5_hlp2 \
    --ll-run runs/r4_flagship_4000 --num-envs 16 --steps 500 \
    --gif runs/r5_hlp2/navigation.gif \
    > runs/r5_hlp2/play.log 2>&1
mark "END hlp_gif rc=$?"

mark "START go1_eval"
timeout 2700 python scripts/eval_sweep.py --logdir runs/r5_go1 \
    > runs/r5_go1/eval_sweep.log 2>&1
mark "END go1_eval rc=$?"

mark "START go1_gif"
timeout 2700 python scripts/play.py --logdir runs/r5_go1 --steps 400 \
    --gif runs/r5_go1/play.gif > runs/r5_go1/play.log 2>&1
mark "END go1_gif rc=$?"

mark "START flagship_eval"
timeout 2700 python scripts/eval_sweep.py --logdir runs/r5_flagship \
    > runs/r5_flagship/eval_sweep.log 2>&1
mark "END flagship_eval rc=$?"

mark "=== round-5 queue E done ==="
