#!/bin/bash
# Round-5 queue stage J (final): the dead-zone fix for HLP goal-reaching.
# The round-5 probe (EXPERIMENTS.md §28) showed r5_hlp4 learns a
# proportional approach controller (|cmd| ~ 0.15*dist) that the
# reference's 0.2 xy-command dead zone freezes at ~1.1 m from the goal.
# r5_hlp5 resumes the hlp4 policy with the dead zone off (documented
# deviation arm), then renders the navigation GIF and the flagship
# eval artifacts. Every stage checks an absolute DEADLINE so the TPU is
# free before the driver's end-of-round bench.
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }
DEADLINE=${DEADLINE:-$(( $(date +%s) + 2400 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }
gate() { if [ "$(left)" -lt "$1" ]; then mark "SKIP $2 (only $(left)s left)"; return 1; fi; }

mark "=== round-5 queue J start (deadline in $(left)s) ==="

if gate 300 tpu_sanity; then
  mark "START tpu_sanity"
  timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('tpu ok', float((x @ x).sum()), jax.devices())" \
      > runs/r5_tpu_sanity.log 2>&1
  mark "END tpu_sanity rc=$?"
fi

if gate 600 r5_hlp5; then
  mark "START r5_hlp5"
  mkdir -p runs/r5_hlp5
  timeout $(( $(left) - 420 > 2100 ? 2100 : $(left) - 420 )) \
    python scripts/high_level_play.py \
      --ll-run runs/r4_flagship_4000 --iterations 1200 --min-std 0.2 \
      --entropy-coef 0.0 --zero-reward-on-reset 0 --progress-scale 1.0 \
      --max-lr 1e-3 --dead-zone 0 \
      --resume runs/r5_hlp4/checkpoints/train_state_last.pkl \
      --logdir runs/r5_hlp5 \
      > runs/r5_hlp5/queue.log 2>&1
  mark "END r5_hlp5 rc=$?"
fi

if gate 360 hlp_gif; then
  mark "START hlp_gif"
  timeout $(( $(left) - 60 )) python scripts/hlp_play.py \
      --hlp-run runs/r5_hlp5 --ll-run runs/r4_flagship_4000 \
      --num-envs 16 --steps 500 --dead-zone 0 \
      --gif runs/r5_hlp5/navigation.gif \
      > runs/r5_hlp5/play.log 2>&1
  mark "END hlp_gif rc=$?"
fi

if gate 420 flagship_eval; then
  mark "START flagship_eval"
  timeout $(( $(left) - 60 )) python scripts/eval_sweep.py \
      --logdir runs/r5_flagship \
      > runs/r5_flagship/eval_sweep.log 2>&1
  mark "END flagship_eval rc=$?"
fi

if gate 360 flagship_gif; then
  mark "START flagship_gif"
  timeout $(( $(left) - 30 )) python scripts/play.py \
      --logdir runs/r5_flagship --steps 400 \
      --gif runs/r5_flagship/play.gif \
      > runs/r5_flagship/play.log 2>&1
  mark "END flagship_gif rc=$?"
fi

mark "=== round-5 queue J done ($(left)s to spare) ==="
