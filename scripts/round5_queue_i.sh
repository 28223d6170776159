#!/bin/bash
# Round-5 queue stage I: r5_hlp4 — drop the action-magnitude penalty.
# r5_hlp3 (entropy 0) fixed the sigma ratchet but 98.5% of episodes
# timed out ~1.2 m short: the magnitude penalty had pushed mean |cmd| to
# ~0.13 m/s, inside the reference's small-command dead zone (commands
# with ||xy|| <= 0.2 are zeroed, hlp.py step()). Then the remaining
# training slate + eval artifacts.
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }

mark "=== round-5 queue I start ==="

mark "START r5_hlp4"
mkdir -p runs/r5_hlp4
timeout 7200 python scripts/high_level_play.py \
    --ll-run runs/r4_flagship_4000 --iterations 2000 --min-std 0.2 \
    --entropy-coef 0.0 \
    --zero-reward-on-reset 0 --progress-scale 1.0 \
    --max-lr 1e-3 \
    --logdir runs/r5_hlp4 \
    > runs/r5_hlp4/queue.log 2>&1
mark "END r5_hlp4 rc=$?"

mark "START r5_go1"
mkdir -p runs/r5_go1
timeout 5400 python scripts/train.py --robot go1 --iterations 810 \
    --resume runs/r4_go1/checkpoints/train_state_last.pkl \
    --min-std 0.2 --logdir runs/r5_go1 \
    > runs/r5_go1/queue.log 2>&1
mark "END r5_go1 rc=$?"

mark "START r5_refhp"
mkdir -p runs/r5_refhp
timeout 5400 python scripts/train.py --iterations 1200 \
    --entropy-coef 0.01 --entropy-warmup 0 --min-std 0.0 \
    --logdir runs/r5_refhp \
    > runs/r5_refhp/queue.log 2>&1
mark "END r5_refhp rc=$?"

mark "START hlp_gif"
timeout 2700 python scripts/hlp_play.py --hlp-run runs/r5_hlp4 \
    --ll-run runs/r4_flagship_4000 --num-envs 16 --steps 500 \
    --gif runs/r5_hlp4/navigation.gif \
    > runs/r5_hlp4/play.log 2>&1
mark "END hlp_gif rc=$?"

mark "START flagship_eval"
timeout 2700 python scripts/eval_sweep.py --logdir runs/r5_flagship \
    > runs/r5_flagship/eval_sweep.log 2>&1
mark "END flagship_eval rc=$?"

mark "START flagship_gif"
timeout 2700 python scripts/play.py --logdir runs/r5_flagship --steps 400 \
    --gif runs/r5_flagship/play.gif > runs/r5_flagship/play.log 2>&1
mark "END flagship_gif rc=$?"

mark "START go1_eval"
timeout 2700 python scripts/eval_sweep.py --logdir runs/r5_go1 \
    > runs/r5_go1/eval_sweep.log 2>&1
mark "END go1_eval rc=$?"

mark "START go1_gif"
timeout 2700 python scripts/play.py --logdir runs/r5_go1 --steps 400 \
    --gif runs/r5_go1/play.gif > runs/r5_go1/play.log 2>&1
mark "END go1_gif rc=$?"

mark "START terrain_bench"
timeout 2700 python scripts/bench_terrain.py --num-envs 4000 --iters 10 \
    > runs/r5_terrain_bench.log 2>&1
mark "END terrain_bench rc=$?"

mark "=== round-5 queue I done ==="
