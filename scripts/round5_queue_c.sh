#!/bin/bash
# Round-5 queue stage C (waits for stage B):
#   1. Bench with the terrain-patch sampling optimization (faf1b6e) —
#      fresh 4000-env compile, then the headline JSON. The pre-patch
#      headline was 127.8k env-steps/s; the go1 plane config's 640k
#      suggests trimesh gathers dominate, so this is the targeted fix.
#   2. Pallas block-shape TPU spot check (VERDICT r4 task 5): 8192 envs
#      with requested sublanes=4 (now rounds to 8) must lower and run.
#   3. Bench confirm at 1024/8192 to refresh the scaling table + warm the
#      driver-scenario compile cache for BENCH_r05.
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }

while ! grep -q "queue B done" runs/r5_queue_status.txt; do sleep 30; done

mark "=== round-5 queue C start ==="

mark "START bench_patch"
BENCH_SIZES=4000 BENCH_PALLAS=0 BENCH_BUDGET_S=1500 timeout 1800 \
    python bench.py > /tmp/bench_r5_patch.out 2> /tmp/bench_r5_patch.err
mark "END bench_patch rc=$?"

mark "START pallas_sublane_spotcheck"
timeout 1800 python - > /tmp/sublane_check.log 2>&1 <<'EOF'
import sys
sys.path.insert(0, '.')
from bench import _bench_size
v = _bench_size(8192, 24, n_iter=3, log=lambda s: print(s, flush=True),
                block_sublanes=4)
print(f"sublanes=4 @ 8192 envs: {v:,.0f} env-steps/s (lowered OK)")
EOF
mark "END pallas_sublane_spotcheck rc=$?"

mark "START bench_scaling"
BENCH_SIZES=1024,8192 BENCH_PALLAS=0 BENCH_BUDGET_S=1500 timeout 1800 \
    python bench.py > /tmp/bench_r5_scaling.out 2> /tmp/bench_r5_scaling.err
mark "END bench_scaling rc=$?"

mark "=== round-5 queue C done ==="
