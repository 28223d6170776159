"""Golden-trajectory smoke check (BASELINE config 1: '64 envs, fixed-seed
step trajectory'): a fixed seed + zero actions must reproduce the same
trajectory statistics on CPU (within float-accumulation tolerance:
rtol 2e-4 / atol 2e-3) across code changes that do not intend to alter
physics/env semantics.

If a change INTENDS to alter semantics, regenerate via
`python tests/test_golden.py regen`.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden_smoke.json")


def _run(num_envs=64, steps=50):
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv

    cfg = config_mini_cheetah()
    cfg.env.num_envs = num_envs
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.border_size = 5.0
    env = LeggedRobotEnv(cfg)
    state = env.initial_state(jax.random.PRNGKey(1234))
    step = jax.jit(env.step)
    sums = []
    for i in range(steps):
        state, res = step(state, jnp.zeros((num_envs, 12)))
        sums.append([float(jnp.sum(res.rew)),
                     float(jnp.sum(state.sim.base_pos)),
                     float(jnp.sum(state.sim.q)),
                     float(jnp.sum(res.done))])
    return np.asarray(sums)


def test_golden_trajectory():
    assert os.path.exists(GOLDEN_PATH), \
        "golden file missing; run `python tests/test_golden.py regen`"
    with open(GOLDEN_PATH) as f:
        golden = np.asarray(json.load(f))
    got = _run()
    np.testing.assert_allclose(got, golden, rtol=2e-4, atol=2e-3)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        data = _run()
        with open(GOLDEN_PATH, "w") as f:
            json.dump(data.tolist(), f)
        print(f"golden regenerated -> {GOLDEN_PATH}")
