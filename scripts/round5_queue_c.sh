#!/bin/bash
# Round-5 queue stage C v2 (waits for stage B):
#   1. Terrain-strategy micro-bench: mm (gather-free einsum bilinear) vs
#      take vs direct vs plane — the profile found terrain sampling at
#      ~97% of the trimesh rollout; this decides the default.
#   2. Full bench headline with the winning code path.
#   3. Pallas sublane spot check at 8192 envs with requested sublanes=4.
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }

while ! grep -q "queue B done" runs/r5_queue_status.txt; do sleep 30; done

mark "=== round-5 queue C start ==="

mark "START terrain_bench"
timeout 3600 python scripts/bench_terrain.py --num-envs 4000 --iters 10 \
    > runs/r5_terrain_bench.log 2>&1
mark "END terrain_bench rc=$?"

mark "START bench_patch"
BENCH_SIZES=4000 BENCH_PALLAS=0 BENCH_BUDGET_S=1500 timeout 1800 \
    python bench.py > /tmp/bench_r5_patch.out 2> /tmp/bench_r5_patch.err
mark "END bench_patch rc=$?"

mark "START pallas_sublane_spotcheck"
timeout 1800 python - > /tmp/sublane_check.log 2>&1 <<'PYEOF'
import sys
sys.path.insert(0, '.')
from bench import _bench_size
v = _bench_size(8192, 24, n_iter=3, log=lambda s: print(s, flush=True),
                block_sublanes=4)
print(f"sublanes=4 @ 8192 envs: {v:,.0f} env-steps/s (lowered OK)")
PYEOF
mark "END pallas_sublane_spotcheck rc=$?"

mark "=== round-5 queue C done ==="
