"""Offline visualization — the TPU-native replacement for the IsaacGym
viewer/camera pipeline (reference base_task.py:79-137,
legged_robot.py:1332-1355; SURVEY.md §2.1 N8).

Rendering is decoupled from the TPU step by design: the sim logs compact
state trajectories (base pose + joint angles of one env) and this module
re-runs forward kinematics on the host to draw a stick-figure animation
(matplotlib, GIF via pillow — no GPU, no ffmpeg dependency). Videos land in
``<logdir>/videos/{it:05d}.gif`` like the reference's
``videos/{it:05d}.mp4`` (ppo/__init__.py:267-286).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np


def rollout_states(env, ac, params, env_state, steps: int = 250,
                   env_index: int = 0):
    """Roll the deterministic student policy and collect env-`env_index`
    poses. Purely functional: the caller's state is not advanced."""
    import jax
    import jax.numpy as jnp

    from ..models.networks import ActorCritic

    def step_fn(carry, _):
        state = carry
        actions = ac.apply(params, state.obs, state.obs_history,
                           method=ActorCritic.act_student)
        state, _ = env.step(state, actions)
        pose = (state.sim.base_pos[env_index],
                state.sim.base_quat[env_index],
                state.sim.q[env_index],
                state.env_origins[env_index])
        return state, pose

    _, (pos, quat, q, origin) = jax.lax.scan(
        step_fn, env_state, None, length=steps)
    return (np.asarray(pos), np.asarray(quat), np.asarray(q),
            np.asarray(origin))


def _fk_lines(model, base_pos, base_quat, q):
    """Host-side FK -> list of line segments (one per joint link)."""
    import jax.numpy as jnp

    from ..ops.dynamics import SimState, fk

    state = SimState(
        base_pos=jnp.asarray(base_pos), base_quat=jnp.asarray(base_quat),
        base_lin_vel=jnp.zeros(3), base_ang_vel=jnp.zeros(3),
        q=jnp.asarray(q), qd=jnp.zeros(model.nv))
    frames = fk(model, state)
    p = np.asarray(frames.p)
    segs = []
    for i in range(1, model.nb):
        segs.append((p[int(model.parent[i])], p[i]))
    # foot extensions: draw to the lowest geom of each body
    R = np.asarray(frames.R)
    for g in range(model.ng):
        b = int(model.geom_body[g])
        tip = p[b] + R[b] @ np.asarray(model.geom_offset[g])
        if np.asarray(model.geom_offset[g])[2] < -0.15:
            segs.append((p[b], tip))
    return segs


def render_trajectory(model, pos, quat, q, origin, out_path: str,
                      fps: int = 25, stride: int = 2,
                      title: Optional[str] = None) -> Optional[str]:
    """Render a stick-figure GIF of the logged trajectory."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.animation as animation
        import matplotlib.pyplot as plt
    except Exception as e:  # noqa: BLE001
        print(f"[render] matplotlib unavailable: {e}")
        return None

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    idx = np.arange(0, len(pos), stride)
    fig = plt.figure(figsize=(6, 4))
    ax = fig.add_subplot(projection="3d")

    def draw(k):
        ax.cla()
        i = idx[k]
        segs = _fk_lines(model, pos[i], quat[i], q[i])
        for a, b in segs:
            ax.plot([a[0], b[0]], [a[1], b[1]], [a[2], b[2]],
                    "-", color="tab:blue", lw=2)
        c = pos[i]
        ax.scatter(*c, color="tab:red", s=25)
        ax.set_xlim(c[0] - 0.6, c[0] + 0.6)
        ax.set_ylim(c[1] - 0.6, c[1] + 0.6)
        ax.set_zlim(origin[i][2] if origin.ndim > 1 else 0.0,
                    (origin[i][2] if origin.ndim > 1 else 0.0) + 0.8)
        if title:
            ax.set_title(title)

    anim = animation.FuncAnimation(fig, draw, frames=len(idx))
    try:
        anim.save(out_path, writer=animation.PillowWriter(fps=fps))
    except Exception as e:  # noqa: BLE001
        print(f"[render] save failed: {e}")
        plt.close(fig)
        return None
    plt.close(fig)
    return out_path
