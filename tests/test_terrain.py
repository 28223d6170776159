"""Terrain generators (NumPy + native C++), Terrain builder, trimesh export."""

import numpy as np
import pytest

from rapid_locomotion_rl_tpu.config import config_mini_cheetah
from rapid_locomotion_rl_tpu.envs import terrain as T
from rapid_locomotion_rl_tpu.envs import terrain_native as TN


def _sub(w=80):
    return T.SubTerrain(w, w, vertical_scale=0.005, horizontal_scale=0.1)


def test_random_uniform_range():
    rng = np.random.RandomState(0)
    t = T.random_uniform_terrain(_sub(), -0.05, 0.05, rng=rng)
    h = t.height_field_raw * 0.005
    assert h.min() >= -0.051 and h.max() <= 0.051
    assert h.std() > 0.01


def test_pyramid_slope_geometry():
    t = T.pyramid_sloped_terrain(_sub(), slope=0.4, platform_size=3.0)
    h = t.height_field_raw
    # apex at the center, zero at the border
    assert h[40, 40] == h.max()
    assert h[0, 0] == 0
    # center platform flat
    assert h[30:50, 30:50].std() == 0
    # max height ~ slope * half width
    np.testing.assert_allclose(h.max() * 0.005, 0.4 * 4.0, rtol=0.15)


def test_stairs_monotone():
    t = T.pyramid_stairs_terrain(_sub(), step_width=0.31, step_height=0.1,
                                 platform_size=3.0)
    h = t.height_field_raw
    assert h[40, 40] == h.max()
    # step quantization: heights are multiples of 20 (0.1 / 0.005)
    assert set(np.unique(h) % 20) == {0}


def test_stepping_stones_has_pit():
    rng = np.random.RandomState(0)
    t = T.stepping_stones_terrain(_sub(), stone_size=0.8, stone_distance=0.1,
                                  max_height=0.0, platform_size=2.0, rng=rng)
    h = t.height_field_raw
    assert h.min() < -1000  # pit at -10m / 0.005
    assert (h == 0).sum() > 100  # stones + platform


def test_terrain_builder_flat_mc():
    """MC config: proportions select branch 8 with magnitude 0 -> flat."""
    cfg = config_mini_cheetah()
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.border_size = 5.0
    t = T.Terrain(cfg.terrain, num_robots=16, seed=0)
    assert t.height_field_raw.shape == (2 * 80 + 100, 2 * 80 + 100)
    assert t.height_field_raw.max() == 0
    origins = cfg.terrain.env_origins
    assert origins.shape == (2, 2, 3)
    np.testing.assert_allclose(origins[0, 0], [4.0, 4.0, 0.0])


def test_native_matches_semantics():
    if not TN.available():
        pytest.skip("native lib unavailable")
    lib = TN._load()
    hf = np.zeros((80, 80), np.int16)
    lib.pyramid_sloped_terrain(hf, 80, 80, 0.4, 3.0, 0.005, 0.1)
    ref = T.pyramid_sloped_terrain(_sub(), slope=0.4, platform_size=3.0)
    np.testing.assert_allclose(hf, ref.height_field_raw, atol=1)


def test_trimesh_export():
    hf = np.zeros((50, 50), np.int16)
    hf[20:30, 20:30] = 100  # 0.5 m plateau
    v, tri = TN.convert_heightfield_to_trimesh(hf, 0.1, 0.005, 0.75)
    assert v.shape == (2500, 3)
    assert tri.shape == (2 * 49 * 49, 3)
    assert v[:, 2].max() == pytest.approx(0.5)
    assert tri.max() < 2500


def test_selected_terrain():
    """Reference selected_terrain path (terrain.py:104-117): one chosen
    generator with kwargs for every sub-terrain."""
    cfg = config_mini_cheetah()
    cfg.terrain.num_rows = 2
    cfg.terrain.num_cols = 2
    cfg.terrain.border_size = 5.0
    cfg.terrain.curriculum = False
    cfg.terrain.selected = True
    cfg.terrain.terrain_kwargs = {
        "type": "pyramid_stairs_terrain",
        "step_width": 0.31, "step_height": 0.1, "platform_size": 3.0}
    t = T.Terrain(cfg.terrain, num_robots=16, seed=0)
    hf = t.height_field_raw
    assert hf.max() > 0          # stairs rise above the border plane
    # the config dict is not mutated (reference pops 'type' destructively)
    assert cfg.terrain.terrain_kwargs["type"] == "pyramid_stairs_terrain"


def test_patch_sampling_matches_direct():
    """sample_patch + patch_height_and_normal == terrain_height_and_normal
    (bit-level) for lookups within the patch's coverage — the round-5 TPU
    fast path replacing per-geom random gathers into the full grid."""
    import jax
    import jax.numpy as jnp
    from rapid_locomotion_rl_tpu.ops.contact import (
        TerrainGrid, patch_height_and_normal, sample_patch,
        terrain_height_and_normal)
    rng = np.random.default_rng(0)
    h = rng.normal(0, 0.2, (64, 80)).astype(np.float32)
    grid = TerrainGrid(height=jnp.asarray(h), horizontal_scale=0.1,
                       border_size=1.0, static_friction=1.0,
                       dynamic_friction=1.0, restitution=0.0)
    N, ng, P = 12, 7, 16
    base_x = jnp.asarray(rng.uniform(0.0, 4.0, N), jnp.float32)
    base_y = jnp.asarray(rng.uniform(0.0, 5.0, N), jnp.float32)
    # geom offsets within +-0.6 m of the base (inside the 0.75 m coverage)
    gx = base_x[:, None] + jnp.asarray(rng.uniform(-0.6, 0.6, (N, ng)),
                                       jnp.float32)
    gy = base_y[:, None] + jnp.asarray(rng.uniform(-0.6, 0.6, (N, ng)),
                                       jnp.float32)
    patch, ix0, iy0 = sample_patch(grid, base_x, base_y, P)
    hp, np_ = patch_height_and_normal(grid, patch, ix0, iy0, gx, gy)
    hd, nd = terrain_height_and_normal(grid, gx, gy)
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hd))
    np.testing.assert_array_equal(np.asarray(np_), np.asarray(nd))
    # out-of-coverage lookups clamp to the patch edge (no crash, finite)
    far = patch_height_and_normal(grid, patch, ix0, iy0,
                                  gx + 5.0, gy - 5.0)
    assert np.all(np.isfinite(np.asarray(far[0])))


def test_patch_mm_matches_direct():
    """The gather-free einsum bilinear (patch_height_and_normal_mm) agrees
    with the direct 4-corner formula to fp-reassociation tolerance."""
    import jax.numpy as jnp
    from rapid_locomotion_rl_tpu.ops.contact import (
        TerrainGrid, patch_height_and_normal_mm, sample_patch,
        terrain_height_and_normal)
    rng = np.random.default_rng(3)
    h = rng.normal(0, 0.2, (64, 80)).astype(np.float32)
    grid = TerrainGrid(height=jnp.asarray(h), horizontal_scale=0.1,
                       border_size=1.0, static_friction=1.0,
                       dynamic_friction=1.0, restitution=0.0)
    N, ng, P = 12, 7, 16
    base_x = jnp.asarray(rng.uniform(0.0, 4.0, N), jnp.float32)
    base_y = jnp.asarray(rng.uniform(0.0, 5.0, N), jnp.float32)
    gx = base_x[:, None] + jnp.asarray(rng.uniform(-0.6, 0.6, (N, ng)),
                                       jnp.float32)
    gy = base_y[:, None] + jnp.asarray(rng.uniform(-0.6, 0.6, (N, ng)),
                                       jnp.float32)
    patch, ix0, iy0 = sample_patch(grid, base_x, base_y, P)
    hp, np_ = patch_height_and_normal_mm(grid, patch, ix0, iy0, gx, gy)
    hd, nd = terrain_height_and_normal(grid, gx, gy)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(np_), np.asarray(nd),
                               rtol=1e-4, atol=1e-5)


def test_min3_patch_matches_direct():
    """terrain_height_min3_patch (one-hot einsum taps, zero element
    gathers) is bit-identical to terrain_height_min3 for points inside
    the patch coverage — the observation height sensor's TPU fast path."""
    import jax.numpy as jnp
    from rapid_locomotion_rl_tpu.ops.contact import (
        TerrainGrid, terrain_height_min3, terrain_height_min3_patch)
    rng = np.random.default_rng(7)
    h = rng.normal(0, 0.2, (64, 80)).astype(np.float32)
    grid = TerrainGrid(height=jnp.asarray(h), horizontal_scale=0.1,
                       border_size=1.0, static_friction=1.0,
                       dynamic_friction=1.0, restitution=0.0)
    N, npts, P = 12, 33, 24
    base_x = jnp.asarray(rng.uniform(0.0, 4.0, N), jnp.float32)
    base_y = jnp.asarray(rng.uniform(0.0, 5.0, N), jnp.float32)
    # sensed points within +-0.95 m (MC sample-grid radius) of the base;
    # P=24 covers +-1.1 m after the floor offset
    px = base_x[:, None] + jnp.asarray(rng.uniform(-0.95, 0.95, (N, npts)),
                                       jnp.float32)
    py = base_y[:, None] + jnp.asarray(rng.uniform(-0.95, 0.95, (N, npts)),
                                       jnp.float32)
    hp = terrain_height_min3_patch(grid, base_x, base_y, px, py, P)
    hd = terrain_height_min3(grid, px, py)
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hd))
    # bases at the grid border still produce finite (edge-clamped) taps
    hb = terrain_height_min3_patch(grid, base_x * 0.0 - 1.0,
                                   base_y * 0.0 - 1.0, px, py, P)
    assert np.all(np.isfinite(np.asarray(hb)))


def test_blocked_patch_matches_direct():
    """sample_patch_blocked (overlapped column blocks, one contiguous
    DMA fragment per env) + the rectangular col-first mm lookup must
    agree with the direct grid formula — including bases sitting right
    at block-stride boundaries."""
    import jax.numpy as jnp
    from rapid_locomotion_rl_tpu.ops.contact import (
        TerrainGrid, make_col_blocks, patch_height_and_normal,
        patch_height_and_normal_mm, sample_patch_blocked,
        terrain_height_and_normal)
    rng = np.random.default_rng(5)
    h = rng.normal(0, 0.2, (64, 200)).astype(np.float32)
    grid = TerrainGrid(height=jnp.asarray(h), horizontal_scale=0.1,
                       border_size=1.0, static_friction=1.0,
                       dynamic_friction=1.0, restitution=0.0)
    blocks = make_col_blocks(grid)
    assert blocks is not None and blocks.shape[2] == 128
    N, ng = 16, 7
    base_x = jnp.asarray(rng.uniform(0.5, 4.5, N), jnp.float32)
    # include exact stride-boundary bases (col offsets 0/64/128 of the
    # grid = world y of -1.0 + 6.4k) among random ones
    base_y = jnp.asarray(
        np.concatenate([rng.uniform(0.0, 17.0, N - 4),
                        [5.4, 11.8, 0.2, 12.0]]), jnp.float32)
    gx = base_x[:, None] + jnp.asarray(rng.uniform(-0.9, 0.9, (N, ng)),
                                       jnp.float32)
    gy = base_y[:, None] + jnp.asarray(rng.uniform(-0.9, 0.9, (N, ng)),
                                       jnp.float32)
    patch, ix0, iy0 = sample_patch_blocked(blocks, grid, base_x, base_y)
    assert patch.shape == (N, 32, 128)
    hp, np_ = patch_height_and_normal_mm(grid, patch, ix0, iy0, gx, gy)
    hd, nd = terrain_height_and_normal(grid, gx, gy)
    np.testing.assert_allclose(np.asarray(hp), np.asarray(hd),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(np_), np.asarray(nd),
                               rtol=1e-4, atol=1e-5)
    # the take-variant must also handle the rectangular patch
    ht, nt = patch_height_and_normal(grid, patch, ix0, iy0, gx, gy)
    np.testing.assert_array_equal(np.asarray(ht), np.asarray(hd))
