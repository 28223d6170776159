"""Offline renderer (utils/render.py — the N8 viewer/camera replacement,
reference legged_robot.py:1332-1355): stick figure + collision spheres +
terrain surface must render to a GIF without an interactive backend."""

import os

import numpy as np

from rapid_locomotion_rl_tpu import RLTPU_ROOT_DIR
from rapid_locomotion_rl_tpu.models import load_urdf

MC_URDF = f"{RLTPU_ROOT_DIR}/resources/robots/mini_cheetah/urdf/mini_cheetah.urdf"


def test_render_trajectory_with_terrain(tmp_path):
    from rapid_locomotion_rl_tpu.ops.contact import TerrainGrid
    from rapid_locomotion_rl_tpu.utils.render import render_trajectory

    m = load_urdf(MC_URDF)
    T = 4
    pos = np.tile([0.0, 0.0, 0.3], (T, 1))
    pos[:, 0] = np.linspace(0, 0.2, T)
    quat = np.tile([0, 0, 0, 1.0], (T, 1))
    q = np.tile([0.0, -0.8, 1.62] * 4, (T, 1))
    origin = np.zeros((T, 3))
    h = np.zeros((40, 40), np.float32)
    h[20:, :] = 0.08                      # a step edge in frame
    grid = TerrainGrid(height=h, horizontal_scale=0.05, border_size=1.0,
                       static_friction=1.0, dynamic_friction=1.0,
                       restitution=0.0)
    out = str(tmp_path / "clip.gif")
    got = render_trajectory(m, pos, quat, q, origin, out, stride=1,
                            terrain=grid)
    assert got == out and os.path.getsize(out) > 4_000


def test_render_trajectory_no_terrain(tmp_path):
    from rapid_locomotion_rl_tpu.utils.render import render_trajectory

    m = load_urdf(MC_URDF)
    pos = np.tile([0.0, 0.0, 0.3], (3, 1))
    quat = np.tile([0, 0, 0, 1.0], (3, 1))
    q = np.tile([0.0, -0.8, 1.62] * 4, (3, 1))
    origin = np.zeros((3, 3))
    out = str(tmp_path / "clip.gif")
    got = render_trajectory(m, pos, quat, q, origin, out, stride=1)
    assert got == out and os.path.getsize(out) > 2_000


def test_raster_rgb_frame_and_gif(tmp_path):
    """The z-buffered software rasterizer (utils/raster.py — the RGB
    camera-sensor analogue of reference legged_robot.py:1301-1355):
    a frame must contain terrain, robot, and background pixels with
    correct occlusion ordering, and the GIF writer must produce a file."""
    from rapid_locomotion_rl_tpu.ops.contact import TerrainGrid
    from rapid_locomotion_rl_tpu.utils.raster import (
        render_frame_rgb, render_trajectory_rgb)

    m = load_urdf(MC_URDF)
    h = np.zeros((60, 60), np.float32)
    h[30:, :] = 0.08
    grid = TerrainGrid(height=h, horizontal_scale=0.05, border_size=1.0,
                       static_friction=1.0, dynamic_friction=1.0,
                       restitution=0.0)
    q = np.array([0.0, -0.8, 1.62] * 4)
    img = render_frame_rgb(m, [0.3, 0.3, 0.3], [0, 0, 0, 1.0], q,
                           terrain=grid, width=160, height=120)
    assert img.shape == (120, 160, 3) and img.dtype == np.uint8
    # sky background present (top rows), terrain browns below, and the
    # robot's orange spheres somewhere in frame
    assert img.std() > 10.0
    orange = ((img[..., 0] > 140) & (img[..., 1] > 60)
              & (img[..., 2] < 120)).sum()
    assert orange > 30, f"robot pixels missing ({orange})"
    T = 3
    pos = np.tile([0.3, 0.3, 0.3], (T, 1))
    pos[:, 0] += np.linspace(0, 0.2, T)          # frames must differ
    quat = np.tile([0, 0, 0, 1.0], (T, 1))
    qs = np.tile(q, (T, 1))
    out = str(tmp_path / "rgb.gif")
    got = render_trajectory_rgb(m, pos, quat, qs, out, terrain=grid,
                                stride=1, width=160, height=120)
    assert got == out and os.path.getsize(out) > 2_000
