#!/bin/bash
# Round-3 TPU experiment queue. STRICTLY sequential: the axon relay allows
# ONE TPU process at a time (CLAUDE.md). Run after scripts/tpu_watch.sh has
# flagged /tmp/tpu_up. Each stage logs to runs/<name>/queue.log; a stage
# failure does not stop the queue (later stages are independent).
set -u
cd "$(dirname "$0")/.."
Q=runs/r3_queue_status.txt
mark() { echo "$(date +%H:%M:%S) $*" | tee -a "$Q"; }

run_train() {  # name iterations extra-args...
  local name=$1 iters=$2; shift 2
  mark "START $name"
  mkdir -p "runs/$name"
  timeout 10800 python scripts/train.py --iterations "$iters" \
      --logdir "runs/$name" "$@" > "runs/$name/queue.log" 2>&1
  mark "END $name rc=$?"
}

mark "=== round-3 queue start ==="

# 0. bench capture on the committed defaults (VERDICT missing #2) —
#    includes the Pallas fused-kernel side-measurement
mark "START bench"
timeout 5400 python bench.py > BENCH_r03_self.json 2> bench_r03_self.log
rc=$?
mark "END bench rc=$rc $(cat BENCH_r03_self.json 2>/dev/null)"
if [ "$rc" -eq 3 ] || [ "$rc" -eq 124 ]; then
  # relay went down again (preflight abort / hang): bail out so the
  # auto-launcher can re-arm the watcher instead of burning stage timeouts
  mark "=== relay unreachable, queue aborted ==="
  exit 3
fi

# 1. substeps x implicit-PD A/B at 400 iters (VERDICT item 4)
run_train ab_s2_ipd1 400 --substeps 2 --implicit-pd 1
run_train ab_s1_ipd1 400 --substeps 1 --implicit-pd 1
run_train ab_s1_ipd0 400 --substeps 1 --implicit-pd 0
run_train ab_s2_ipd0 400 --substeps 2 --implicit-pd 0

# 2. entropy A/B on round-3 physics at 1500 iters (VERDICT item 2).
#    These double as flagship candidates: resume the winner for +2500
#    iters into runs/flagship_r3 (stage 3).
run_train r3_ent001 1500 --entropy-coef 0.01
run_train r3_ent000 1500 --entropy-coef 0.0

# 3. flagship continuation to 4000 iters from the entropy winner —
#    pick by rew_tracking_lin_vel at it 1490; default to ent001 (the
#    reference value) unless it NaN'd (builder normally does this step
#    manually with the curve in hand)
WINNER=runs/r3_ent001
python - <<'EOF' || WINNER=runs/r3_ent000
import pickle, math, sys
rows = pickle.load(open("runs/r3_ent001/metrics.pkl", "rb"))
key = "train/episode/rew_tracking_lin_vel/mean"
vals = [r[key] for r in rows if key in r]
ok = bool(vals) and not math.isnan(vals[-1]) and vals[-1] > 3.0
sys.exit(0 if ok else 1)
EOF
mark "flagship resumes from $WINNER"
run_train flagship_r3 2500 --resume "$WINNER/checkpoints/train_state_last.pkl"

# 3b. CPU post-analysis of the flagship (no TPU claim)
mark "START flagship analysis"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 600 \
    python scripts/compare_baseline.py runs/flagship_r3 \
    > runs/flagship_r3/baseline_compare.txt 2>&1
mark "END flagship analysis rc=$?"

# 4. Go1 at flagship scale (VERDICT item 6)
run_train go1_r3 1500 --robot go1

# 5. HLP at reference scale against the newest flagship checkpoint
mark "START hlp_r3"
mkdir -p runs/hlp_r3
timeout 10800 python scripts/high_level_play.py --num-envs 1024 \
    --iterations 1000 --ll-run runs/flagship_r3 --logdir runs/hlp_r3 \
    > runs/hlp_r3/queue.log 2>&1
mark "END hlp_r3 rc=$?"

mark "=== round-3 queue done ==="
