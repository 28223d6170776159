#!/bin/bash
# Poll the axon TPU relay; exit and leave a flag file once it answers.
# Probe pattern mirrors bench.py's preflight (kill a hung claim attempt).
FLAG=/tmp/tpu_up
rm -f "$FLAG"
while true; do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
(jnp.ones((64,64)) @ jnp.ones((64,64))).block_until_ready()
print(jax.devices()[0].platform)
" >/tmp/tpu_probe.log 2>&1; then
    date > "$FLAG"
    cat /tmp/tpu_probe.log >> "$FLAG"
    echo "TPU is up"
    exit 0
  fi
  sleep 480
done
