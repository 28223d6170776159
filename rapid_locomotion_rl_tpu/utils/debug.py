"""Numerics debugging & profiling hooks (SURVEY.md §5.1-5.2).

The reference has no sanitizers or profilers (single CUDA stream, wall-clock
timers only); here JAX purity buys stronger tools:

- :func:`checked_step` wraps ``env.step`` with ``checkify`` NaN/div checks —
  the first bad op is reported with its location instead of silent NaN
  propagation;
- :func:`state_health` gives a cheap all-finite / magnitude summary usable
  every iteration on live training state;
- :func:`trace_iterations` records a ``jax.profiler`` trace of N train
  iterations for the TensorBoard profiler / xprof.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp


def checked_step(env) -> Callable:
    """env.step with float checks; returns (errors, (state, result))."""
    from jax.experimental import checkify

    return checkify.checkify(env.step,
                             errors=checkify.float_checks)


def state_health(state: Any) -> Dict[str, jnp.ndarray]:
    """All-finite flags and max magnitudes per top-level EnvState field."""
    out: Dict[str, jnp.ndarray] = {}
    for name, leaf_tree in state._asdict().items():
        leaves = [x for x in jax.tree.leaves(leaf_tree)
                  if hasattr(x, "dtype") and jnp.issubdtype(x.dtype,
                                                            jnp.floating)]
        if not leaves:
            continue
        out[f"{name}/finite"] = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(x)) for x in leaves]))
        out[f"{name}/max_abs"] = jnp.max(jnp.stack(
            [jnp.max(jnp.abs(x)) for x in leaves]))
    return out


def nan_env_mask(state) -> jnp.ndarray:
    """[N] bool — envs whose sim state contains non-finite values."""
    sim = state.sim
    flags = [jnp.all(jnp.isfinite(x), axis=tuple(range(1, x.ndim)))
             for x in sim]
    return ~jnp.stack(flags, axis=0).all(axis=0)


def trace_iterations(train_iter: Callable, carry_args: tuple, n: int,
                     logdir: str = "/tmp/jax-trace"):
    """Profile n train iterations; open with TensorBoard's profile plugin."""
    out = None
    with jax.profiler.trace(logdir):
        for _ in range(n):
            out = train_iter(*carry_args)
            jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"[debug] profiler trace -> {logdir}")
    return out
