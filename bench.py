"""Throughput benchmark: full PPO training iterations at the reference's
flagship configuration (Mini Cheetah, 4000 envs, 24 steps/env/iter,
5x4 minibatch PPO — BASELINE.md).

Prints ONE JSON line on stdout:
  {"metric": "env_steps_per_sec", "value": N, "unit": "env-steps/s",
   "vs_baseline": N / 50000}
Supplementary detail (rollout/update phase split, per-size sweep) goes to
stderr so the driver's single-line contract holds.
"""

import json
import os
import sys
import time

import jax

_T_START = time.time()


def _bench_size(num_envs, steps_per_env, n_iter=20, log=lambda s: None,
                physics_impl=None, block_sublanes=None):
    from rapid_locomotion_rl_tpu.config import config_mini_cheetah
    from rapid_locomotion_rl_tpu.envs.legged_robot import LeggedRobotEnv
    from rapid_locomotion_rl_tpu.learn.ppo import (PPOArgs, init_ppo_state,
                                                   make_train_functions)
    from rapid_locomotion_rl_tpu.models.networks import ACArgs, ActorCritic

    cfg = config_mini_cheetah()
    cfg.env.num_envs = num_envs
    if physics_impl is not None:
        cfg.sim.physics_impl = physics_impl
    if block_sublanes is not None:
        cfg.sim.pallas_block_sublanes = block_sublanes
    env = LeggedRobotEnv(cfg)
    ac = ActorCritic(env.num_obs, env.num_privileged_obs,
                     env.num_obs_history, env.num_actions, ACArgs())
    ppo_args = PPOArgs()
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    ppo_state = init_ppo_state(k1, ac, ppo_args, env.num_obs,
                               env.num_privileged_obs, env.num_obs_history)
    env_state = env.initial_state(k2)
    rollout_gae, update = make_train_functions(env, ac, ppo_args,
                                               steps_per_env)
    rollout_gae = jax.jit(rollout_gae)
    update = jax.jit(update)

    def one_iter(env_state, ppo_state, k):
        k_r, k_u = jax.random.split(k)
        env_state, traj, adv, ret, _ = rollout_gae(
            env_state, ppo_state.params, k_r)
        ppo_state, metrics = update(ppo_state, traj, adv, ret, k_u)
        return env_state, ppo_state, traj, adv, ret, metrics

    # warmup/compile: two iterations, so any signature change after the
    # first call (weak-type promotion) has also been compiled
    t_warm = time.time()
    for _ in range(2):
        k3, k = jax.random.split(k3)
        env_state, ppo_state, traj, adv, ret, metrics = one_iter(
            env_state, ppo_state, k)
    jax.block_until_ready(metrics["kl"])
    dt_warm = time.time() - t_warm
    # a warm persistent .jax_cache makes this seconds; a miss is minutes
    log(f"[bench] {num_envs} envs warmup+compile {dt_warm:.1f}s "
        f"(compile cache {'HIT' if dt_warm < 120 else 'MISS'})")

    t0 = time.time()
    for _ in range(n_iter):
        k3, k = jax.random.split(k3)
        env_state, ppo_state, traj, adv, ret, metrics = one_iter(
            env_state, ppo_state, k)
    jax.block_until_ready(metrics["kl"])
    dt_total = (time.time() - t0) / n_iter

    # phase split (timed separately on the same state)
    k3, k = jax.random.split(k3)
    k_r, k_u = jax.random.split(k)
    t0 = time.time()
    for _ in range(5):
        out = rollout_gae(env_state, ppo_state.params, k_r)
    jax.block_until_ready(out[0].obs)
    dt_roll = (time.time() - t0) / 5
    t0 = time.time()
    for _ in range(5):
        ps, m = update(ppo_state, traj, adv, ret, k_u)
    jax.block_until_ready(m["kl"])
    dt_upd = (time.time() - t0) / 5

    steps = num_envs * steps_per_env
    log(f"[bench] {num_envs} envs: {steps / dt_total:,.0f} env-steps/s "
        f"(iter {dt_total * 1e3:.1f} ms = rollout {dt_roll * 1e3:.1f} "
        f"+ update {dt_upd * 1e3:.1f} ms)")
    return steps / dt_total


def _probe(q):
    import jax
    import jax.numpy as jnp
    (jnp.ones((4, 4)) @ jnp.ones((4, 4))).block_until_ready()
    q.put(jax.devices()[0].platform)


def _preflight(log, timeout_s=180):
    """Fail fast with a clear message if the TPU relay is unreachable
    (the axon claim otherwise blocks indefinitely)."""
    import multiprocessing as mp

    ctx = mp.get_context("spawn")
    q = ctx.Queue()
    p = ctx.Process(target=_probe, args=(q,))
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.kill()
        log(f"[bench] TPU unreachable within {timeout_s}s (axon relay "
            "down?) — aborting instead of hanging. Last measured: "
            "118-132k env-steps/s SoA / 76k AoS at 4000 envs "
            "(EXPERIMENTS.md §9).")
        sys.exit(3)
    log(f"[bench] device: {q.get()}")


def _emit(flagship):
    baseline = 50_000.0  # BASELINE.md north-star (~45-50k env-steps/s, 1 GPU)
    print(json.dumps({
        "metric": "env_steps_per_sec",
        "value": round(flagship),
        "unit": "env-steps/s",
        "vs_baseline": round(flagship / baseline, 3),
    }), flush=True)


def main():
    log = lambda s: print(s, file=sys.stderr, flush=True)  # noqa: E731
    _preflight(log)
    # Flagship size FIRST, and the JSON line the moment it exists: each
    # distinct env count is a fresh jit signature (~minutes of remote
    # compile each), and the driver runs this under a timeout — the
    # headline must not be hostage to the sweep's long tail. The
    # 4000-env signature is the one the training runs keep warm in the
    # compile cache.
    sizes = tuple(int(s) for s in
                  os.environ.get("BENCH_SIZES", "4000,1024,8192").split(","))
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    # a post-headline arm costs up to ~250 s compile (cache MISS) + ~120 s
    # measurement; only start one if it can FINISH inside the budget —
    # r04's bench emitted its headline but was killed (rc=124) by the
    # driver timeout during the sweep tail
    arm_cost_s = 400.0
    sweep = {}
    emitted = False
    for n in sizes:
        if emitted and time.time() - _T_START > budget_s - arm_cost_s:
            log(f"[bench] budget {budget_s:.0f}s nearly exhausted "
                f"({time.time() - _T_START:.0f}s elapsed) — skipping "
                f"{n}-env arm (headline already emitted)")
            continue
        try:
            sweep[n] = _bench_size(n, 24, log=log)
        except Exception as e:  # noqa: BLE001 - sweep sizes are best-effort
            log(f"[bench] {n} envs failed: {e}")
            continue
        if n == 4000:
            _emit(sweep[n])
            emitted = True
    if not emitted:
        if not sweep:
            log("[bench] every sweep size failed")
            return 4
        # 4000-env run failed (e.g. OOM) but another size succeeded:
        # report the largest working size rather than crash the JSON line
        n = max(sweep)
        log(f"[bench] 4000-env size unavailable; reporting {n}-env figure")
        _emit(sweep[n])
    # SoA XLA-path comparison at the flagship size (stderr detail; "auto"
    # picks the fused Pallas substep kernel on TPU since round 4 — this
    # arm tracks what the pure-XLA path would do so regressions in either
    # stay visible). sublanes=4 is a known TPU lowering failure (last two
    # block dims must tile (8,128)) — not re-measured.
    if (jax.default_backend() not in ("cpu",)
            and os.environ.get("BENCH_PALLAS", "1") != "0"):
        if time.time() - _T_START > budget_s - arm_cost_s:
            log("[bench] budget exhausted — skipping soa comparison arm")
        else:
            try:
                v = _bench_size(4000, 24, log=log, physics_impl="soa")
                log(f"[bench] soa(xla): {v:,.0f} env-steps/s")
            except Exception as e:  # noqa: BLE001
                log(f"[bench] soa(xla) failed: {e}")
    log(f"[bench] total wall time {time.time() - _T_START:.0f}s")


if __name__ == "__main__":
    sys.exit(main())
