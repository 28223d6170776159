#!/bin/bash
# Round-3 TPU experiment queue. STRICTLY sequential: the axon relay allows
# ONE TPU process at a time (CLAUDE.md). Run after scripts/tpu_watch.sh has
# flagged /tmp/tpu_up. Each stage logs to runs/<name>/queue.log; a stage
# failure does not stop the queue (later stages are independent).
#
# DEADLINE-AWARE: every stage checks R3_DEADLINE (epoch seconds; default
# now+9000) and is skipped if too little time remains; per-stage timeouts
# are clamped so NOTHING holds the TPU claim past the deadline — the
# driver's end-of-round bench needs the relay free (round-2 lost its
# BENCH capture to exactly this).
set -u
cd "$(dirname "$0")/.."
Q=runs/r3_queue_status.txt
DEADLINE=${R3_DEADLINE:-$(( $(date +%s) + 9000 ))}
mark() { echo "$(date +%H:%M:%S) $*" | tee -a "$Q"; }
left() { echo $(( DEADLINE - $(date +%s) )); }

run_train() {  # name iterations min-seconds-needed extra-args...
  local name=$1 iters=$2 need=$3; shift 3
  local l; l=$(left)
  if [ "$l" -lt "$need" ]; then mark "SKIP $name (left=${l}s < ${need}s)"; return 1; fi
  mark "START $name (left=${l}s)"
  mkdir -p "runs/$name"
  timeout $(( l - 120 )) python scripts/train.py --iterations "$iters" \
      --logdir "runs/$name" "$@" > "runs/$name/queue.log" 2>&1
  mark "END $name rc=$?"
  return 0
}

mark "=== round-3 queue start (deadline in $(left)s) ==="

# 0. bench capture on the committed defaults (VERDICT missing #2) —
#    includes the Pallas fused-kernel side-measurement
mark "START bench (left=$(left)s)"
timeout 3600 python bench.py > BENCH_r03_self.json 2> bench_r03_self.log
rc=$?
mark "END bench rc=$rc $(cat BENCH_r03_self.json 2>/dev/null)"
if [ "$rc" -eq 3 ] || [ "$rc" -eq 124 ]; then
  # relay went down again (preflight abort / hang): bail out so the
  # auto-launcher can re-arm the watcher instead of burning stage timeouts
  mark "=== relay unreachable, queue aborted ==="
  exit 3
fi

# 1. entropy A/B on round-3 physics at 1500 iters (VERDICT items 1+2 —
#    the parity attempt itself; done = tracking_lin >= 10 & command_area
#    >= 0.10 @ it 990 with +vx expansion). ent001 is the reference value.
run_train r3_ent001 1500 2000 --entropy-coef 0.01
run_train r3_ent000 1500 2000 --entropy-coef 0.0

# 2. substeps x implicit-PD A/B at 400 iters (VERDICT item 4).
#    {s2,ipd1} is the committed default == first 400 iters of r3_ent000,
#    so only the three non-default cells run.
run_train ab_s1_ipd1 400 900 --substeps 1 --implicit-pd 1
run_train ab_s1_ipd0 400 900 --substeps 1 --implicit-pd 0
run_train ab_s2_ipd0 400 900 --substeps 2 --implicit-pd 0

# 3. Go1 at flagship scale (VERDICT item 6)
run_train go1_r3 1500 2000 --robot go1

# 4. flagship continuation toward 4000 iters from the entropy winner —
#    pick by rew_tracking_lin_vel at the end of r3_ent001; default to
#    ent001 (the reference value) unless it NaN'd / stalled.
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
if run_train flagship_r3 2500 2200 --resume "$WINNER/checkpoints/train_state_last.pkl"; then
  # CPU post-analysis (no TPU claim)
  mark "START flagship analysis"
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 600 \
      python scripts/compare_baseline.py runs/flagship_r3 \
      > runs/flagship_r3/baseline_compare.txt 2>&1
  mark "END flagship analysis rc=$?"
  HLP_LL=runs/flagship_r3
else
  HLP_LL=$WINNER
fi

# 5. HLP at reference scale against the newest flagship checkpoint
l=$(left)
if [ "$l" -ge 1800 ]; then
  mark "START hlp_r3 (left=${l}s, ll=$HLP_LL)"
  mkdir -p runs/hlp_r3
  timeout $(( l - 120 )) python scripts/high_level_play.py --num-envs 1024 \
      --iterations 1000 --ll-run "$HLP_LL" --logdir runs/hlp_r3 \
      > runs/hlp_r3/queue.log 2>&1
  mark "END hlp_r3 rc=$?"
else
  mark "SKIP hlp_r3 (left=${l}s)"
fi

mark "=== round-3 queue done (left=$(left)s) ==="
