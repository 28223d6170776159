"""The vectorized legged-robot velocity-tracking task — pure functions over
an :class:`EnvState` PyTree.

TPU-native redesign of the reference task env (reference
mini_gym/envs/base/legged_robot.py; layer L2 of SURVEY.md §1): the entire
class hierarchy collapses into

    env.step(state, actions, ...) -> (state', StepResult)

which is traced once and fused into the training step. Key mappings:

- every buffer of `BaseTask.__init__`/`_init_buffers` (base_task.py:56-63,
  legged_robot.py:935-1030) is a field of :class:`EnvState`;
- sparse indexed resets (`reset_idx`, legged_robot.py:227-290) become masked
  `jnp.where` merges over the dense env axis;
- the decimated PD control loop (legged_robot.py:116-126) is an unrolled
  static loop around the batched physics step;
- command resampling + the Grid Adaptive Curriculum (legged_robot.py:595-626)
  run on-device with folded RNG keys;
- the *working upstream* semantics are restored: per-step auto-resets,
  timeout termination, command resampling — the dhruvmetha fork disables
  them for its HLP use-case (SURVEY.md §0) but the baseline run needs them;
- episode metric flushes (`extras['train/episode']`, legged_robot.py:260-290)
  become masked sum/count reductions returned in :class:`StepResult.info`.

The observation history of the reference HistoryWrapper
(mini_gym/envs/wrappers/history_wrapper.py:18-41) lives in-state here; note
that during reference training `reset_idx` of the wrapper is never invoked,
so history deliberately persists across auto-resets (parity).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import RLTPU_ROOT_DIR
from ..config import Cfg, Derived, derive
from ..models import RobotModel, load_urdf
from ..ops import quat as Q
from ..ops.contact import TerrainGrid, terrain_height_min3
from ..ops.dynamics import PhysParams, SimState
from ..ops.physics import physics_step
from . import curriculum as curr
from . import rewards as R
from .terrain import Terrain


def get_scale_shift(rng):
    """(scale, shift) mapping a range to [-1, 1] (math_utils.py:35-38)."""
    scale = 2.0 / (rng[1] - rng[0])
    shift = (rng[0] + rng[1]) / 2.0
    return scale, shift


class DRState(NamedTuple):
    """Per-env domain-randomization tensors (legged_robot.py:1032-1054)."""
    friction: jnp.ndarray          # [N]
    restitution: jnp.ndarray       # [N]
    payloads: jnp.ndarray          # [N]
    com_displacements: jnp.ndarray  # [N,3]
    motor_strengths: jnp.ndarray   # [N,nv]
    Kp_factors: jnp.ndarray        # [N,nv]
    Kd_factors: jnp.ndarray        # [N,nv]


class EnvState(NamedTuple):
    sim: SimState                  # batched [N,...]
    dr: DRState
    commands: jnp.ndarray          # [N, num_commands]
    env_command_bins: jnp.ndarray  # [N] int32
    actions: jnp.ndarray           # [N,na]
    last_actions: jnp.ndarray      # [N,na]
    last_dof_vel: jnp.ndarray      # [N,nv]
    torques: jnp.ndarray           # [N,nv] last applied
    joint_pos_target: jnp.ndarray  # [N,nv]
    episode_length: jnp.ndarray    # [N] int32
    reset_buf: jnp.ndarray         # [N] bool (this step's dones)
    time_out_buf: jnp.ndarray      # [N] bool
    feet_air_time: jnp.ndarray     # [N,4]
    last_contacts: jnp.ndarray     # [N,4] bool
    contact_report: jnp.ndarray    # [N,nr,3] last step's contact forces
    measured_heights: jnp.ndarray  # [N,nhp] (nhp=1 when height sensing off)
    episode_sums: Dict[str, jnp.ndarray]   # {name: [N]}
    command_sums: Dict[str, jnp.ndarray]   # {name: [N]}
    curriculum: curr.CurriculumState
    env_origins: jnp.ndarray       # [N,3]
    terrain_levels: jnp.ndarray    # [N] int32
    terrain_types: jnp.ndarray     # [N] int32
    obs: jnp.ndarray               # [N,num_obs]
    privileged_obs: jnp.ndarray    # [N,num_priv]
    obs_history: jnp.ndarray       # [N, hist*num_obs]
    key: jnp.ndarray               # PRNG key
    common_step_counter: jnp.ndarray  # [] int32


class StepResult(NamedTuple):
    obs: jnp.ndarray
    privileged_obs: jnp.ndarray
    obs_history: jnp.ndarray
    rew: jnp.ndarray               # [N]
    done: jnp.ndarray              # [N] bool
    info: Dict[str, Any]


def _uniform(key, shape, lo, hi):
    return jax.random.uniform(key, shape, minval=lo, maxval=hi)


class LeggedRobotEnv:
    """Static task container; all methods are pure and jittable.

    Construction parses the URDF, builds the terrain grid and precomputes
    every trace-time constant (the analogue of `create_sim` + `_create_envs`
    + `_init_buffers`, reference legged_robot.py:419-441, :1162-1319,
    :935-1030 — with no per-env Python loop anywhere).
    """

    def __init__(self, cfg: Cfg, eval_cfg: Optional[Cfg] = None):
        self.cfg = cfg
        self.eval_cfg = eval_cfg
        self.derived: Derived = derive(cfg)
        self.num_envs = cfg.env.num_envs
        self.num_train_envs = self.derived.num_train_envs
        self.num_eval_envs = self.derived.num_eval_envs
        self.dt = self.derived.dt

        asset_path = cfg.asset.file.format(ROOT=RLTPU_ROOT_DIR)
        if asset_path.endswith(".xml"):
            # MJCF path (reference gym.load_asset accepts both formats;
            # resources/robots/go1/xml/go1.xml:1-14)
            from ..models.mjcf import load_mjcf
            self.model: RobotModel = load_mjcf(
                asset_path, armature=cfg.asset.armature)
        else:
            self.model: RobotModel = load_urdf(
                asset_path, armature=cfg.asset.armature,
                mesh_sphere_fit=cfg.asset.mesh_sphere_fit)
        m = self.model
        self.num_dof = m.nv
        self.num_actions = cfg.env.num_actions
        self.num_obs = cfg.env.num_observations
        self.num_privileged_obs = cfg.env.num_privileged_obs
        self.num_obs_history = cfg.env.num_observation_history * self.num_obs

        # ---- body index groups (legged_robot.py:1283-1300) -------------
        self.feet_indices = tuple(m.match_report_bodies([cfg.asset.foot_name]))
        self.termination_contact_indices = tuple(
            m.match_report_bodies(cfg.asset.terminate_after_contacts_on))
        self.penalised_contact_indices = tuple(
            m.match_report_bodies(cfg.asset.penalize_contacts_on))
        self.num_feet = len(self.feet_indices)

        # ---- default pose & PD gains (legged_robot.py:1011-1028) -------
        default_q = np.zeros(m.nv)
        p_gains = np.zeros(m.nv)
        d_gains = np.zeros(m.nv)
        for i, name in enumerate(m.joint_names):
            default_q[i] = cfg.init_state.default_joint_angles[name]
            found = False
            for key_, kp in cfg.control.stiffness.items():
                if key_ in name:
                    p_gains[i] = kp
                    d_gains[i] = cfg.control.damping[key_]
                    found = True
            if not found and cfg.control.control_type in ("P", "V"):
                print(f"PD gain of joint {name} not defined, setting to zero")
        self.default_dof_pos = jnp.asarray(default_q, jnp.float32)
        self.p_gains = jnp.asarray(p_gains, jnp.float32)
        self.d_gains = jnp.asarray(d_gains, jnp.float32)
        self.torque_limits = jnp.asarray(m.dof_effort, jnp.float32)
        self.dof_vel_limits = jnp.asarray(m.dof_velocity, jnp.float32)
        self.hip_mask = jnp.asarray(
            np.array(["hip" in n for n in m.joint_names], dtype=np.float32))

        # soft dof position limits (legged_robot.py:506-515)
        lo = np.asarray(m.dof_lower)
        hi = np.asarray(m.dof_upper)
        mid = 0.5 * (lo + hi)
        rng_ = hi - lo
        soft = cfg.rewards.soft_dof_pos_limit
        self.dof_pos_limits = jnp.asarray(
            np.stack([mid - 0.5 * rng_ * soft, mid + 0.5 * rng_ * soft], -1),
            jnp.float32)

        # ---- terrain ----------------------------------------------------
        self.custom_origins = cfg.terrain.mesh_type in ("heightfield", "trimesh")
        if self.custom_origins:
            self.terrain = Terrain(cfg.terrain, self.num_train_envs,
                                   eval_cfg.terrain if eval_cfg else None,
                                   self.num_eval_envs, seed=cfg.seed)
            self.terrain_grid: Optional[TerrainGrid] = self.terrain.as_grid(
                cfg.terrain.static_friction, cfg.terrain.dynamic_friction,
                cfg.terrain.restitution)
            # contact collides the slope-corrected surface (trimesh parity:
            # steep faces are walls, terrain.py:36-40); height sensing keeps
            # the raw grid like the reference's heightsamples
            if cfg.terrain.mesh_type == "trimesh":
                self.collision_grid: Optional[TerrainGrid] = \
                    self.terrain.as_collision_grid(
                        cfg.terrain.static_friction,
                        cfg.terrain.dynamic_friction,
                        cfg.terrain.restitution,
                        upsample=getattr(cfg.terrain, "collision_upsample", 1),
                        slope_threshold=cfg.terrain.slope_treshold)
            else:
                self.collision_grid = self.terrain_grid
            self.terrain_origins = np.asarray(cfg.terrain.env_origins)  # [rows,cols,3]
        else:
            self.terrain = None
            self.terrain_grid = None
            self.collision_grid = None
            self.terrain_origins = None

        # height-sensing points (legged_robot.py:1453-1467)
        if cfg.terrain.measure_heights:
            gx, gy = np.meshgrid(np.asarray(cfg.terrain.measured_points_x),
                                 np.asarray(cfg.terrain.measured_points_y),
                                 indexing="ij")
            pts = np.stack([gx.ravel(), gy.ravel(), np.zeros(gx.size)], -1)
            self.height_points = jnp.asarray(pts, jnp.float32)  # [nhp,3]
            self.num_height_points = gx.size
            # patch size for the gather-free sensing path: cover the
            # yaw-rotated sample grid (max radius) plus slack, rounded to
            # a sublane multiple
            r = float(np.max(np.linalg.norm(pts[:, :2], axis=-1)))
            cells = int(np.ceil(r / cfg.terrain.horizontal_scale)) + 3
            self._sense_patch_P = max(8, -(-2 * cells // 8) * 8)
        else:
            self.height_points = None
            self.num_height_points = 1   # placeholder column (zeros)
            self._sense_patch_P = 0

        # ---- obs scaling & noise ---------------------------------------
        os_ = cfg.normalization.obs_scales
        self.commands_scale = jnp.asarray(
            [os_.lin_vel, os_.lin_vel, os_.ang_vel], jnp.float32)
        self.noise_scale_vec = jnp.asarray(self._make_noise_vec(), jnp.float32)

        # ---- reward bookkeeping ----------------------------------------
        self.reward_scales = dict(self.derived.reward_scales)  # already * dt
        self.reward_names = [n for n in self.reward_scales if n != "termination"]
        for name in self.reward_names:
            assert name in R.REWARD_REGISTRY, f"unknown reward term {name}"
        self.episode_sum_keys = list(self.reward_scales.keys()) + ["total"]
        self.command_sum_keys = (list(self.reward_scales.keys())
                                 + ["lin_vel_raw", "ang_vel_raw",
                                    "lin_vel_residual", "ang_vel_residual",
                                    "ep_timesteps"])

        # ---- curriculum -------------------------------------------------
        self.curriculum_grid = curr.make_grid(cfg)
        self.resample_interval = self.derived.resample_interval
        ep_len_norm = min(self.derived.max_episode_length,
                          self.resample_interval)
        self.curr_ep_len = float(ep_len_norm)
        self.lin_vel_threshold = (cfg.commands.forward_curriculum_threshold
                                  * self.reward_scales.get("tracking_lin_vel", 0.0))
        self.ang_vel_threshold = (cfg.commands.yaw_curriculum_threshold
                                  * self.reward_scales.get("tracking_ang_vel", 0.0))

        # batched physics step: fused Pallas kernel (TPU), direct-batched
        # SoA (XLA fast path) or vmapped AoS (CPU: LLVM compiles the big
        # SoA/Pallas traces in minutes, CLAUDE.md)
        from ..ops.limb_dynamics import layout_for
        impl = getattr(cfg.sim, "physics_impl", "auto")
        if impl == "auto":
            # TPU: fused Pallas substep kernel (127k vs 116k SoA env-steps/s
            # at the 4000-env flagship, round-4 bench); CPU: AoS (LLVM takes
            # minutes on the big SoA/Pallas traces, CLAUDE.md)
            impl = "pallas" if jax.default_backend() != "cpu" else "aos"
        if impl in ("soa", "pallas") and layout_for(self.model) is None:
            impl = "aos"
        # world obstacles (reference mini_gym/envs/world/world.py:14-121):
        # analytic per-env boxes on every physics path — penalty forces on
        # the collision spheres (AoS: extra_contact hook; SoA/Pallas:
        # _box_forces_soa inside the substep chain)
        self.world_boxes = None
        if cfg.world.enabled:
            from .world import box_sphere_forces, default_corridor
            self.world_boxes = default_corridor(
                cfg.world.length, cfg.world.width, cfg.world.wall_height,
                cfg.world.wall_thickness)
            geom_radius = jnp.asarray(self.model.geom_radius, jnp.float32)

            def _world_contact(origin, pos, vel, m_eff, dt,
                               _boxes=self.world_boxes, _r=geom_radius):
                return box_sphere_forces(
                    _boxes, origin, pos, vel, _r, m_eff,
                    stiffness=cfg.sim.contact_stiffness,
                    damping=cfg.sim.contact_damping,
                    friction=cfg.terrain.static_friction,
                    friction_vel_eps=cfg.sim.friction_vel_eps, dt=dt)
            self._world_contact = _world_contact
        _wb = self.world_boxes
        _wmu = cfg.terrain.static_friction
        # SoA/Pallas accept a hoisted terrain patch (sampled once per env
        # step in step(), reused across the decimation substeps — the
        # patch gather costs one DMA fragment per row per env, so calls
        # are the dominant factor)
        self._phys_takes_patch = impl in ("soa", "pallas")
        # overlapped column-block grid view: makes the per-env patch ONE
        # contiguous DMA fragment (contact.make_col_blocks; mm lookups
        # handle the rectangular [32, 128] patch)
        self._col_blocks = None
        if (self._phys_takes_patch and self.collision_grid is not None
                and getattr(cfg.sim, "terrain_lookup", "mm") == "mm"
                and int(getattr(cfg.sim, "terrain_patch_size", 0) or 0) > 0
                and self.collision_grid.height.shape[0] >= 32):
            from ..ops.contact import make_col_blocks
            self._col_blocks = make_col_blocks(self.collision_grid)
        if impl == "pallas":
            from ..ops.pallas_physics import physics_step_pallas

            def _phys(sim, tau, pp, imp, origin=None, patch=None):
                return physics_step_pallas(
                    self.model, cfg.sim, sim, tau, pp,
                    terrain=self.collision_grid,
                    fixed_base=cfg.asset.fix_base_link,
                    implicit_damp=imp,
                    block_sublanes=getattr(cfg.sim, "pallas_block_sublanes",
                                           4),
                    interpret=jax.default_backend() == "cpu",
                    world_boxes=_wb, env_origin=origin,
                    world_friction=_wmu, terrain_patch=patch)
            self._phys = _phys
        elif impl == "soa":
            from ..ops.soa_physics import physics_step_soa

            def _phys(sim, tau, pp, imp, origin=None, patch=None):
                return physics_step_soa(
                    self.model, cfg.sim, sim, tau, pp,
                    terrain=self.collision_grid,
                    fixed_base=cfg.asset.fix_base_link,
                    implicit_damp=imp,
                    world_boxes=_wb, env_origin=origin,
                    world_friction=_wmu, terrain_patch=patch)
            self._phys = _phys
        elif self.world_boxes is not None:
            self._phys = jax.vmap(lambda s, t, p, i, o: physics_step(
                self.model, cfg.sim, s, t, p,
                terrain=self.collision_grid,
                fixed_base=cfg.asset.fix_base_link,
                implicit_damp=i,
                extra_contact=self._world_contact, env_origin=o))
        else:
            self._phys = jax.vmap(lambda s, t, p, i: physics_step(
                self.model, cfg.sim, s, t, p,
                terrain=self.collision_grid,
                fixed_base=cfg.asset.fix_base_link,
                implicit_damp=i))
        self._dt_sub = cfg.sim.dt / max(int(cfg.sim.num_substeps), 1)

    # ------------------------------------------------------------------
    def _make_noise_vec(self) -> np.ndarray:
        """Reference `_get_noise_scale_vec` (legged_robot.py:882-932)."""
        cfg = self.cfg
        ns = cfg.noise.noise_scales
        os_ = cfg.normalization.obs_scales
        lvl = cfg.noise.noise_level
        parts = [np.ones(3) * ns.gravity * lvl]
        if cfg.env.observe_command:
            parts.append(np.zeros(3))
        parts.append(np.ones(self.num_dof) * ns.dof_pos * lvl * os_.dof_pos)
        parts.append(np.ones(self.num_dof) * ns.dof_vel * lvl * os_.dof_vel)
        parts.append(np.zeros(self.num_actions))
        vec = np.concatenate(parts)
        if cfg.env.observe_vel:
            vec = np.concatenate([np.ones(3) * ns.lin_vel * lvl * os_.lin_vel,
                                  np.ones(3) * ns.ang_vel * lvl * os_.ang_vel,
                                  vec])
        if cfg.env.observe_only_lin_vel:
            vec = np.concatenate([np.ones(3) * ns.lin_vel * lvl * os_.lin_vel,
                                  vec])
        if cfg.env.observe_only_ang_vel:
            vec = np.concatenate([np.ones(3) * ns.ang_vel * lvl * os_.ang_vel,
                                  vec])
        if cfg.env.observe_yaw:
            vec = np.concatenate([vec, np.zeros(1)])
        if cfg.terrain.measure_heights:
            vec = np.concatenate([
                vec, np.ones(self.num_height_points)
                * ns.height_measurements * lvl * os_.height_measurements])
        assert vec.shape[0] == self.num_obs, \
            f"obs layout {vec.shape[0]} != num_observations {self.num_obs}"
        return vec

    # ------------------------------------------------------------------
    # initial state
    # ------------------------------------------------------------------
    def _env_origins(self, key) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Reference `_get_env_origins` (legged_robot.py:1385-1415)."""
        N = self.num_envs
        cfg = self.cfg
        if self.custom_origins:
            max_lvl = cfg.terrain.max_init_terrain_level
            min_lvl = cfg.terrain.min_init_terrain_level
            if not cfg.terrain.curriculum:
                min_lvl, max_lvl = 0, cfg.terrain.num_rows - 1
            levels = jax.random.randint(key, (N,), min_lvl, max_lvl + 1)
            types = (jnp.arange(N) // max(N / cfg.terrain.num_cols, 1)
                     ).astype(jnp.int32) % cfg.terrain.num_cols
            origins = jnp.asarray(self.terrain_origins, jnp.float32)[levels, types]
            return origins, levels.astype(jnp.int32), types
        spacing = cfg.env.env_spacing
        cols = int(np.floor(np.sqrt(N)))
        rows = int(np.ceil(N / cols))
        xx, yy = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
        origins = np.zeros((N, 3), np.float32)
        origins[:, 0] = spacing * xx.ravel()[:N]
        origins[:, 1] = spacing * yy.ravel()[:N]
        return (jnp.asarray(origins), jnp.zeros(N, jnp.int32),
                jnp.zeros(N, jnp.int32))

    def _sample_rigid_body_props(self, key, n) -> Tuple[jnp.ndarray, ...]:
        """friction/restitution/payload/CoM draw
        (reference `_randomize_rigid_body_props`, legged_robot.py:519-541)."""
        dr = self.cfg.domain_rand
        k1, k2, k3, k4 = jax.random.split(key, 4)
        friction = (_uniform(k1, (n,), *dr.friction_range)
                    if dr.randomize_friction
                    else jnp.full((n,), self.cfg.terrain.static_friction))
        restitution = (_uniform(k2, (n,), *dr.restitution_range)
                       if dr.randomize_restitution
                       else jnp.full((n,), self.cfg.terrain.restitution))
        payload = (_uniform(k3, (n,), *dr.added_mass_range)
                   if dr.randomize_base_mass else jnp.zeros(n))
        com = (_uniform(k4, (n, 3), *dr.com_displacement_range)
               if dr.randomize_com_displacement else jnp.zeros((n, 3)))
        return friction, restitution, payload, com

    def _sample_dof_props(self, key, n) -> Tuple[jnp.ndarray, ...]:
        """motor strength / Kp / Kd factors
        (reference `_randomize_dof_props`, legged_robot.py:544-560; note the
        per-env scalar broadcast over DOFs)."""
        dr = self.cfg.domain_rand
        k1, k2, k3 = jax.random.split(key, 3)
        ones = jnp.ones((n, self.num_dof))
        motor = (_uniform(k1, (n, 1), *dr.motor_strength_range) * ones
                 if dr.randomize_motor_strength else ones)
        kp = (_uniform(k2, (n, 1), *dr.Kp_factor_range) * ones
              if dr.randomize_Kp_factor else ones)
        kd = (_uniform(k3, (n, 1), *dr.Kd_factor_range) * ones
              if dr.randomize_Kd_factor else ones)
        return motor, kp, kd

    def initial_state(self, key: jnp.ndarray) -> EnvState:
        N = self.num_envs
        cfg = self.cfg
        keys = jax.random.split(key, 8)
        origins, levels, types = self._env_origins(keys[0])
        friction, restitution, payload, com = \
            self._sample_rigid_body_props(keys[1], N)
        motor, kpf, kdf = self._sample_dof_props(keys[2], N)
        dr = DRState(friction, restitution, payload, com, motor, kpf, kdf)

        cstate = curr.init_state(self.curriculum_grid, cfg)
        cmds, bins = curr.sample(self.curriculum_grid, cstate, keys[3], N)
        cmds = self._zero_small_commands(cmds)
        commands = jnp.zeros((N, cfg.commands.num_commands))
        commands = commands.at[:, :3].set(cmds)

        sim = self._reset_sim_states(
            jnp.ones(N, bool), None, origins, keys[4])

        zeros_nv = jnp.zeros((N, self.num_dof))
        state = EnvState(
            sim=sim, dr=dr, commands=commands,
            env_command_bins=bins.astype(jnp.int32),
            actions=jnp.zeros((N, self.num_actions)),
            last_actions=jnp.zeros((N, self.num_actions)),
            last_dof_vel=zeros_nv, torques=zeros_nv,
            joint_pos_target=jnp.zeros((N, self.num_dof)) + self.default_dof_pos,
            episode_length=jnp.zeros(N, jnp.int32),
            reset_buf=jnp.zeros(N, bool),
            time_out_buf=jnp.zeros(N, bool),
            feet_air_time=jnp.zeros((N, self.num_feet)),
            last_contacts=jnp.zeros((N, self.num_feet), bool),
            contact_report=jnp.zeros((N, self.model.nr, 3)),
            measured_heights=jnp.zeros((N, self.num_height_points)),
            episode_sums={k: jnp.zeros(N) for k in self.episode_sum_keys},
            command_sums={k: jnp.zeros(N) for k in self.command_sum_keys},
            curriculum=cstate,
            env_origins=origins, terrain_levels=levels, terrain_types=types,
            obs=jnp.zeros((N, self.num_obs)),
            privileged_obs=jnp.zeros((N, self.num_privileged_obs)),
            obs_history=jnp.zeros((N, self.num_obs_history)),
            key=keys[5],
            common_step_counter=jnp.zeros((), jnp.int32),
        )
        # fill obs/privileged obs for step 0
        obs, priv = self._observe(state, keys[6])
        state = state._replace(obs=obs, privileged_obs=priv)
        # strip weak types so the first jitted step has the same input
        # signature as every later one (avoids a full recompile at iter 1)
        return jax.tree.map(
            lambda x: jnp.asarray(x, x.dtype) if hasattr(x, "dtype") else x,
            state)

    # ------------------------------------------------------------------
    def _reset_sim_states(self, mask, sim: Optional[SimState],
                          origins, key) -> SimState:
        """Masked re-initialization of the dynamics state
        (reference `_reset_dofs`/`_reset_root_states`,
        legged_robot.py:690-755, with the upstream randomizations)."""
        N = self.num_envs
        cfg = self.cfg
        k1, k2, k3 = jax.random.split(key, 3)

        base_pos = (jnp.asarray(cfg.init_state.pos, jnp.float32) + origins)
        if self.custom_origins:
            xy = jnp.stack(
                [_uniform(k1, (N,), -cfg.terrain.x_init_range,
                          cfg.terrain.x_init_range) + cfg.terrain.x_init_offset,
                 _uniform(jax.random.fold_in(k1, 1), (N,),
                          -cfg.terrain.y_init_range,
                          cfg.terrain.y_init_range) + cfg.terrain.y_init_offset],
                axis=-1)
            base_pos = base_pos.at[:, :2].add(xy)
        base_quat = jnp.broadcast_to(
            jnp.asarray(cfg.init_state.rot, jnp.float32), (N, 4))

        lo, hi = cfg.init_state.dof_init_range
        q = self.default_dof_pos * _uniform(k2, (N, self.num_dof), lo, hi)

        if cfg.init_state.randomize_root_vel:
            vel6 = _uniform(k3, (N, 6), -0.5, 0.5)
        else:
            vel6 = jnp.zeros((N, 6))

        new = SimState(
            base_pos=base_pos, base_quat=base_quat,
            base_lin_vel=vel6[:, :3], base_ang_vel=vel6[:, 3:],
            q=q, qd=jnp.zeros((N, self.num_dof)))
        if sim is None:
            return new
        m = mask
        return SimState(
            base_pos=jnp.where(m[:, None], new.base_pos, sim.base_pos),
            base_quat=jnp.where(m[:, None], new.base_quat, sim.base_quat),
            base_lin_vel=jnp.where(m[:, None], new.base_lin_vel, sim.base_lin_vel),
            base_ang_vel=jnp.where(m[:, None], new.base_ang_vel, sim.base_ang_vel),
            q=jnp.where(m[:, None], new.q, sim.q),
            qd=jnp.where(m[:, None], new.qd, sim.qd))

    # ------------------------------------------------------------------
    def _compute_torques(self, actions, sim: SimState, dr: DRState,
                         last_dof_vel=None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """PD torque controller (reference `_compute_torques`,
        legged_robot.py:653-688; control types 'P', 'V', 'T')."""
        cfg = self.cfg
        scaled = actions[:, : self.num_dof] * cfg.control.action_scale
        scaled = scaled * (1.0 + (cfg.control.hip_scale_reduction - 1.0)
                           * self.hip_mask)
        ct = cfg.control.control_type
        if ct == "P":
            target = scaled + self.default_dof_pos
            tau = (self.p_gains * dr.Kp_factors * (target - sim.q)
                   - self.d_gains * dr.Kd_factors * sim.qd)
        elif ct == "V":
            # velocity PD (legged_robot.py:671-673); the derivative term
            # differentiates dof_vel against the last control step's value
            target = sim.q
            if last_dof_vel is None:
                last_dof_vel = sim.qd
            tau = (self.p_gains * (scaled - sim.qd)
                   - self.d_gains * (sim.qd - last_dof_vel)
                   / self.cfg.sim.dt)
        elif ct == "T":
            target = sim.q
            tau = scaled
        else:
            raise NotImplementedError(f"control_type {ct}")
        tau = tau * dr.motor_strengths
        return jnp.clip(tau, -self.torque_limits, self.torque_limits), target

    # ------------------------------------------------------------------
    def _get_heights(self, sim: SimState) -> jnp.ndarray:
        """Terrain height sensing (reference `_get_heights`,
        legged_robot.py:1469-1503): yaw-rotated sample grid, min-of-3 rule."""
        if not self.cfg.terrain.measure_heights or self.terrain_grid is None:
            return jnp.zeros((self.num_envs, self.num_height_points))
        pts = Q.quat_apply_yaw(sim.base_quat[:, None, :],
                               self.height_points[None, :, :])
        pts = pts + sim.base_pos[:, None, :]
        # gather-free patch path (TPU lowers element gathers to scalar
        # loads — see contact.terrain_height_min3_patch); direct gathers
        # only when the patch scheme is disabled
        if (getattr(self.cfg.sim, "terrain_patch_size", 0)
                and getattr(self.cfg.sim, "terrain_lookup", "mm") == "mm"
                and self._sense_patch_P
                and min(self.terrain_grid.height.shape)
                >= self._sense_patch_P):
            from ..ops.contact import terrain_height_min3_patch
            return terrain_height_min3_patch(
                self.terrain_grid, sim.base_pos[:, 0], sim.base_pos[:, 1],
                pts[..., 0], pts[..., 1], self._sense_patch_P)
        return terrain_height_min3(self.terrain_grid,
                                   pts[..., 0], pts[..., 1])

    # ------------------------------------------------------------------
    def _observe(self, state: EnvState, noise_key) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Observations + privileged observations
        (reference compute_observations, legged_robot.py:342-417)."""
        cfg = self.cfg
        sim = state.sim
        os_ = cfg.normalization.obs_scales
        gvec = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
        projected_gravity = Q.quat_rotate_inverse(
            sim.base_quat, jnp.broadcast_to(gvec, sim.base_pos.shape))

        parts = [projected_gravity]
        if cfg.env.observe_command:
            parts.append(state.commands[:, :3] * self.commands_scale)
        parts.append((sim.q - self.default_dof_pos) * os_.dof_pos)
        parts.append(sim.qd * os_.dof_vel)
        parts.append(state.actions)
        obs = jnp.concatenate(parts, axis=-1)

        if cfg.env.observe_vel:
            base_lin = Q.quat_rotate_inverse(sim.base_quat, sim.base_lin_vel)
            base_ang = Q.quat_rotate_inverse(sim.base_quat, sim.base_ang_vel)
            obs = jnp.concatenate(
                [base_lin * os_.lin_vel, base_ang * os_.ang_vel, obs], axis=-1)
        if cfg.env.observe_only_lin_vel:
            base_lin = Q.quat_rotate_inverse(sim.base_quat, sim.base_lin_vel)
            obs = jnp.concatenate([base_lin * os_.lin_vel, obs], axis=-1)
        if cfg.env.observe_only_ang_vel:
            base_ang = Q.quat_rotate_inverse(sim.base_quat, sim.base_ang_vel)
            obs = jnp.concatenate([base_ang * os_.ang_vel, obs], axis=-1)
        if cfg.env.observe_yaw:
            heading = Q.yaw_from_quat(sim.base_quat)
            err = jnp.clip(0.5 * Q.wrap_to_pi(heading), -1.0, 1.0)
            obs = jnp.concatenate([obs, err[:, None]], axis=-1)
        if cfg.terrain.measure_heights:
            heights = jnp.clip(
                sim.base_pos[:, 2:3] - 0.5 - state.measured_heights,
                -1.0, 1.0) * os_.height_measurements
            obs = jnp.concatenate([obs, heights], axis=-1)

        if cfg.noise.add_noise:
            noise = _uniform(noise_key, obs.shape, -1.0, 1.0)
            obs = obs + noise * self.noise_scale_vec

        clip_obs = cfg.normalization.clip_observations
        obs = jnp.clip(obs, -clip_obs, clip_obs)

        # privileged observations: scale-shifted DR params (18-d,
        # legged_robot.py:394-417)
        nrm = cfg.normalization
        fs, fsh = get_scale_shift(nrm.friction_range)
        rs, rsh = get_scale_shift(nrm.restitution_range)
        ps, psh = get_scale_shift(nrm.added_mass_range)
        cs, csh = get_scale_shift(nrm.com_displacement_range)
        ms, msh = get_scale_shift(nrm.motor_strength_range)
        if not cfg.env.priv_observe_friction:
            fs = 0.0
        if not cfg.env.priv_observe_restitution:
            rs = 0.0
        if not cfg.env.priv_observe_base_mass:
            ps = 0.0
        if not cfg.env.priv_observe_com_displacement:
            cs = 0.0
        if not cfg.env.priv_observe_motor_strength:
            ms = 0.0
        dr = state.dr
        priv = jnp.concatenate([
            (dr.friction[:, None] - fsh) * fs,
            (dr.restitution[:, None] - rsh) * rs,
            (dr.payloads[:, None] - psh) * ps,
            (dr.com_displacements - csh) * cs,
            (dr.motor_strengths - msh) * ms,
        ], axis=-1)
        priv = jnp.clip(priv, -clip_obs, clip_obs)
        return obs, priv

    # ------------------------------------------------------------------
    def _zero_small_commands(self, cmds):
        """commands with |v_xy| <= 0.2 are zeroed (legged_robot.py:622)."""
        keep = (jnp.linalg.norm(cmds[:, :2], axis=-1) > 0.2)[:, None]
        return cmds.at[:, :2].multiply(keep.astype(cmds.dtype))

    # ------------------------------------------------------------------
    # the step
    # ------------------------------------------------------------------
    def step(self, state: EnvState, actions: jnp.ndarray
             ) -> Tuple[EnvState, StepResult]:
        cfg = self.cfg
        N = self.num_envs
        key = state.key
        (key, k_push, k_dof, k_resample, k_reset, k_noise,
         k_terrain) = jax.random.split(key, 7)

        clip_a = cfg.normalization.clip_actions
        actions = jnp.clip(actions, -clip_a, clip_a)

        # ---- decimated PD control + physics (legged_robot.py:116-126) --
        phys_params = PhysParams(
            friction=state.dr.friction, restitution=state.dr.restitution,
            payload=state.dr.payloads,
            com_displacement=state.dr.com_displacements)
        sim = state.sim
        torques = state.torques
        target = state.joint_pos_target
        report = state.contact_report

        # implicit-PD drive impedance (dynamics.aba joint_impedance): the
        # TGS-like damping PhysX's implicitly-solved joint drives provide
        ct = cfg.control.control_type
        if not getattr(cfg.sim, "implicit_pd", True):
            imp = jnp.zeros((N, self.num_dof))
        elif ct == "P":
            imp = (self.d_gains * state.dr.Kd_factors
                   + self._dt_sub * self.p_gains * state.dr.Kp_factors
                   ) * state.dr.motor_strengths
        elif ct == "V":
            imp = (self.p_gains + self.d_gains / cfg.sim.dt
                   ) * state.dr.motor_strengths
        else:
            imp = jnp.zeros((N, self.num_dof))

        # hoisted terrain patch: ONE contiguous slice gather per env step
        # instead of one per control substep (the gather's cost is per
        # row-fragment DMA, so call count dominates). +8 cells of slack
        # cover base drift over the decimated step (<= 6 cm) on top of
        # the geom-reach coverage argument in config.terrain_patch_size.
        patch3 = None
        if self._col_blocks is not None:
            from ..ops.contact import sample_patch_blocked
            patch3 = sample_patch_blocked(self._col_blocks,
                                          self.collision_grid,
                                          sim.base_pos[:, 0],
                                          sim.base_pos[:, 1])
        elif (self._phys_takes_patch and self.collision_grid is not None
                and int(getattr(cfg.sim, "terrain_patch_size", 0) or 0) > 0):
            from ..ops.contact import sample_patch
            P_h = int(cfg.sim.terrain_patch_size) + 8
            if min(self.collision_grid.height.shape) >= P_h:
                patch3 = sample_patch(self.collision_grid,
                                      sim.base_pos[:, 0], sim.base_pos[:, 1],
                                      P_h)

        def decim_body(carry, _):
            sim, torques, target, report = carry
            torques, target = self._compute_torques(
                actions, sim, state.dr, last_dof_vel=state.last_dof_vel)
            if self.world_boxes is not None and patch3 is not None:
                out = self._phys(sim, torques, phys_params, imp,
                                 state.env_origins, patch=patch3)
            elif self.world_boxes is not None:
                out = self._phys(sim, torques, phys_params, imp,
                                 state.env_origins)
            elif patch3 is not None:
                out = self._phys(sim, torques, phys_params, imp,
                                 patch=patch3)
            else:
                out = self._phys(sim, torques, phys_params, imp)
            return (out.state, torques, target, out.contact_report), None

        # unrolled on TPU (marginally better fusion); a real loop on CPU,
        # where LLVM compile time of the unrolled physics graph is minutes
        decim = cfg.control.decimation
        unroll = decim if jax.default_backend() != "cpu" else 1
        (sim, torques, target, report), _ = jax.lax.scan(
            decim_body, (sim, torques, target, report), None,
            length=decim, unroll=unroll)

        episode_length = state.episode_length + 1
        common_step = state.common_step_counter + 1

        base_lin_vel = Q.quat_rotate_inverse(sim.base_quat, sim.base_lin_vel)
        base_ang_vel = Q.quat_rotate_inverse(sim.base_quat, sim.base_ang_vel)
        gvec = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
        projected_gravity = Q.quat_rotate_inverse(
            sim.base_quat, jnp.broadcast_to(gvec, sim.base_pos.shape))

        # ---- teleport (legged_robot.py:768-791) ------------------------
        if cfg.terrain.teleport_robots and self.custom_origins:
            sim = self._teleport(sim)

        # ---- push robots (legged_robot.py:757-766) ---------------------
        if cfg.domain_rand.push_robots:
            push_mask = (episode_length % self.derived.push_interval == 0)
            mv = cfg.domain_rand.max_push_vel_xy
            push_vel = _uniform(k_push, (N, 2), -mv, mv)
            sim = sim._replace(base_lin_vel=sim.base_lin_vel.at[:, :2].set(
                jnp.where(push_mask[:, None], push_vel,
                          sim.base_lin_vel[:, :2])))

        # ---- re-randomize dof props (legged_robot.py:590-593) ----------
        dr = state.dr
        rand_mask = (episode_length % self.derived.rand_interval == 0)
        motor, kpf, kdf = self._sample_dof_props(k_dof, N)
        dr = dr._replace(
            motor_strengths=jnp.where(rand_mask[:, None], motor,
                                      dr.motor_strengths),
            Kp_factors=jnp.where(rand_mask[:, None], kpf, dr.Kp_factors),
            Kd_factors=jnp.where(rand_mask[:, None], kdf, dr.Kd_factors))

        # ---- height sensing --------------------------------------------
        measured_heights = (self._get_heights(sim)
                            if cfg.terrain.measure_heights
                            else state.measured_heights)

        # ---- termination (legged_robot.py:190-202, upstream semantics) -
        term_f = report[:, list(self.termination_contact_indices), :]
        reset_buf = jnp.any(jnp.linalg.norm(term_f, axis=-1) > 1.0, axis=-1)
        if cfg.env.auto_reset:
            time_out_buf = episode_length > self.derived.max_episode_length
            reset_buf = reset_buf | time_out_buf
        else:
            # HLP low-level mode (fork legged_robot.py:196-198): report
            # contact terminations only; never time out or self-reset
            time_out_buf = jnp.zeros_like(reset_buf)
        base_height = jnp.mean(
            sim.base_pos[:, 2:3] - measured_heights, axis=-1)
        if cfg.rewards.use_terminal_body_height:
            reset_buf = reset_buf | (base_height
                                     < cfg.rewards.terminal_body_height)

        # ---- feet air time bookkeeping (legged_robot.py:1619-1631) -----
        feet_z = report[:, list(self.feet_indices), 2]
        contact = feet_z > 1.0
        contact_filt = contact | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        feet_air_time = state.feet_air_time + self.dt
        rew_air = jnp.sum((feet_air_time - 0.5) * first_contact, axis=-1)
        rew_air = rew_air * (jnp.linalg.norm(state.commands[:, :2], axis=-1)
                             > 0.1)
        feet_air_time = feet_air_time * ~contact_filt
        last_contacts = contact

        # ---- rewards (compute_reward, legged_robot.py:314-340) ---------
        ctx = R.RewardContext(
            base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            projected_gravity=projected_gravity, base_height=base_height,
            dof_pos=sim.q, default_dof_pos=self.default_dof_pos,
            dof_vel=sim.qd, last_dof_vel=state.last_dof_vel,
            torques=torques, dof_pos_limits=self.dof_pos_limits,
            dof_vel_limits=self.dof_vel_limits,
            torque_limits=self.torque_limits,
            actions=actions, last_actions=state.last_actions,
            commands=state.commands, contact_forces=report,
            feet_indices=self.feet_indices,
            penalised_contact_indices=self.penalised_contact_indices,
            feet_air_time_reward=rew_air,
            reset_buf=reset_buf, time_out_buf=time_out_buf,
            tracking_sigma=cfg.rewards.tracking_sigma,
            tracking_sigma_yaw=cfg.rewards.tracking_sigma_yaw,
            base_height_target=cfg.rewards.base_height_target,
            soft_dof_vel_limit=cfg.rewards.soft_dof_vel_limit,
            soft_torque_limit=cfg.rewards.soft_torque_limit,
            max_contact_force=cfg.rewards.max_contact_force,
            dt=self.dt, global_reference=cfg.commands.global_reference,
            root_lin_vel_world=sim.base_lin_vel,
        )
        rew_buf = jnp.zeros(N)
        episode_sums = dict(state.episode_sums)
        command_sums = dict(state.command_sums)
        rew_term_gauges = {}
        for name in self.reward_names:
            term = R.REWARD_REGISTRY[name](ctx) * self.reward_scales[name]
            rew_buf = rew_buf + term
            episode_sums[name] = episode_sums[name] + term
            command_sums[name] = command_sums[name] + term
            rew_term_gauges[f"rew_terms/{name}"] = jnp.mean(term)
        raw_reward_mean = jnp.mean(rew_buf)
        if cfg.rewards.only_positive_rewards:
            rew_buf = jnp.clip(rew_buf, 0.0, None)
        episode_sums["total"] = episode_sums["total"] + rew_buf
        if "termination" in self.reward_scales:
            term = (R.termination(ctx) * self.reward_scales["termination"])
            rew_buf = rew_buf + term
            episode_sums["termination"] = episode_sums["termination"] + term
            command_sums["termination"] = command_sums["termination"] + term
        command_sums["lin_vel_raw"] = (command_sums["lin_vel_raw"]
                                       + base_lin_vel[:, 0])
        command_sums["ang_vel_raw"] = (command_sums["ang_vel_raw"]
                                       + base_ang_vel[:, 2])
        command_sums["lin_vel_residual"] = (
            command_sums["lin_vel_residual"]
            + (base_lin_vel[:, 0] - state.commands[:, 0]) ** 2)
        command_sums["ang_vel_residual"] = (
            command_sums["ang_vel_residual"]
            + (base_ang_vel[:, 2] - state.commands[:, 2]) ** 2)
        command_sums["ep_timesteps"] = command_sums["ep_timesteps"] + 1.0

        # ---- command resampling + curriculum ---------------------------
        # auto_reset=False (HLP mode) reports dones but applies no resets
        apply_reset = (reset_buf if cfg.env.auto_reset
                       else jnp.zeros_like(reset_buf))
        # mid-episode resample (legged_robot.py:578-581) OR reset resample
        # (upstream reset_idx -> _resample_commands)
        resample_mask = ((episode_length % self.resample_interval == 0)
                         | apply_reset)
        if not cfg.env.auto_reset:
            resample_mask = jnp.zeros_like(apply_reset)
        train_mask = jnp.arange(N) < self.num_train_envs
        cstate = state.curriculum
        commands = state.commands
        env_bins = state.env_command_bins
        if cfg.commands.command_curriculum:
            lin_rew = command_sums["tracking_lin_vel"] / self.curr_ep_len
            ang_rew = command_sums["tracking_ang_vel"] / self.curr_ep_len
            ts = jnp.maximum(command_sums["ep_timesteps"], 1.0)
            cstate = curr.update(
                self.curriculum_grid, cstate, env_bins, lin_rew, ang_rew,
                resample_mask & train_mask,
                self.lin_vel_threshold, self.ang_vel_threshold,
                lin_vel_raw=command_sums["lin_vel_raw"] / ts,
                ang_vel_raw=command_sums["ang_vel_raw"] / ts,
                ep_duration=command_sums["ep_timesteps"])
            new_cmds, new_bins = curr.sample(
                self.curriculum_grid, cstate, k_resample, N)
            new_cmds = self._zero_small_commands(new_cmds)
            commands = commands.at[:, :3].set(
                jnp.where(resample_mask[:, None], new_cmds, commands[:, :3]))
            env_bins = jnp.where(resample_mask, new_bins.astype(jnp.int32),
                                 env_bins)
        # zero command_sums for resampled envs (legged_robot.py:624-626)
        for k in command_sums:
            command_sums[k] = jnp.where(resample_mask, 0.0, command_sums[k])

        # ---- terrain curriculum (legged_robot.py:793-818) --------------
        env_origins = state.env_origins
        terrain_levels = state.terrain_levels
        if cfg.terrain.curriculum and self.custom_origins:
            dist = jnp.linalg.norm(
                sim.base_pos[:, :2] - env_origins[:, :2], axis=-1)
            move_up = dist > cfg.terrain.terrain_length / 2
            req = (jnp.linalg.norm(commands[:, :2], axis=-1)
                   * cfg.env.episode_length_s * 0.5)
            move_down = (dist < req) & ~move_up
            lvl = terrain_levels + move_up.astype(jnp.int32) \
                - move_down.astype(jnp.int32)
            rand_lvl = jax.random.randint(
                k_terrain, (N,), 0, cfg.terrain.num_rows)
            lvl = jnp.where(lvl >= cfg.terrain.num_rows, rand_lvl,
                            jnp.clip(lvl, 0, None))
            new_levels = jnp.where(apply_reset, lvl, terrain_levels)
            terrain_levels = new_levels
            t_origins = jnp.asarray(self.terrain_origins, jnp.float32)
            new_origin = t_origins[terrain_levels, state.terrain_types]
            env_origins = jnp.where(apply_reset[:, None], new_origin,
                                    env_origins)

        # ---- episode metric flush (reset_idx extras,
        # legged_robot.py:260-290) as masked reductions -------------------
        reset_train = apply_reset & train_mask
        reset_eval = apply_reset & ~train_mask
        info: Dict[str, Any] = {}
        n_rt = jnp.sum(reset_train)
        n_re = jnp.sum(reset_eval)
        info["train_reset_count"] = n_rt
        info["eval_reset_count"] = n_re
        for k in self.episode_sum_keys:
            info[f"train/episode/rew_{k}/sum"] = jnp.sum(
                jnp.where(reset_train, episode_sums[k], 0.0))
            info[f"eval/episode/rew_{k}/sum"] = jnp.sum(
                jnp.where(reset_eval, episode_sums[k], 0.0))
        if cfg.terrain.curriculum:
            info["train/episode/terrain_level"] = jnp.mean(
                terrain_levels[: self.num_train_envs].astype(jnp.float32))
        if cfg.commands.command_curriculum:
            info["train/episode/command_area"] = (
                jnp.sum(cstate.weights) / cstate.weights.shape[0])
        info["env_bins"] = env_bins
        info["time_outs"] = time_out_buf
        info["raw_reward_mean"] = raw_reward_mean
        info.update(rew_term_gauges)
        info["done_rate"] = jnp.mean(reset_buf.astype(jnp.float32))
        info["ep_len_mean"] = jnp.mean(episode_length.astype(jnp.float32))
        info["cmd_norm_mean"] = jnp.mean(
            jnp.linalg.norm(commands[:, :2], axis=-1))

        # zero episode sums of reset envs
        for k in episode_sums:
            episode_sums[k] = jnp.where(apply_reset, 0.0, episode_sums[k])

        # ---- DR resample on reset (reset_idx -> _randomize_dof_props +
        # rigid-body props; per-env tensors make the latter free) ---------
        k_r1, k_r2, k_r3 = jax.random.split(k_reset, 3)
        motor, kpf, kdf = self._sample_dof_props(k_r1, N)
        fric, rest, payl, com = self._sample_rigid_body_props(k_r2, N)
        rb = apply_reset[:, None]
        dr = DRState(
            friction=jnp.where(apply_reset, fric, dr.friction),
            restitution=jnp.where(apply_reset, rest, dr.restitution),
            payloads=jnp.where(apply_reset, payl, dr.payloads),
            com_displacements=jnp.where(rb, com, dr.com_displacements),
            motor_strengths=jnp.where(rb, motor, dr.motor_strengths),
            Kp_factors=jnp.where(rb, kpf, dr.Kp_factors),
            Kd_factors=jnp.where(rb, kdf, dr.Kd_factors))

        # ---- masked state reset (reset_idx, legged_robot.py:227-259) ----
        sim = self._reset_sim_states(apply_reset, sim, env_origins, k_r3)
        last_actions = jnp.where(rb, 0.0, actions)
        last_dof_vel = jnp.where(rb, 0.0, sim.qd)
        feet_air_time = jnp.where(rb, 0.0, feet_air_time)
        new_episode_length = jnp.where(apply_reset, 0, episode_length)

        new_state = state._replace(
            sim=sim, dr=dr, commands=commands, env_command_bins=env_bins,
            actions=actions, last_actions=last_actions,
            last_dof_vel=last_dof_vel, torques=torques,
            joint_pos_target=target,
            episode_length=new_episode_length,
            reset_buf=reset_buf, time_out_buf=time_out_buf,
            feet_air_time=feet_air_time, last_contacts=last_contacts,
            contact_report=report, measured_heights=measured_heights,
            episode_sums=episode_sums, command_sums=command_sums,
            curriculum=cstate, env_origins=env_origins,
            terrain_levels=terrain_levels,
            key=key, common_step_counter=common_step)

        # ---- observations (post-reset state; legged_robot.py:179) ------
        obs, priv = self._observe(new_state, k_noise)
        obs_history = jnp.concatenate(
            [state.obs_history[:, self.num_obs:], obs], axis=-1)
        new_state = new_state._replace(obs=obs, privileged_obs=priv,
                                       obs_history=obs_history)

        result = StepResult(obs=obs, privileged_obs=priv,
                            obs_history=obs_history, rew=rew_buf,
                            done=reset_buf, info=info)
        return new_state, result

    # ------------------------------------------------------------------
    def reward_terms(self, state: EnvState) -> Dict[str, jnp.ndarray]:
        """Instantaneous per-term scaled rewards evaluated on the CURRENT
        state buffers — the analogue of the reference `auxiliary_rewards`
        eval probe calling `env.reward_functions[i]()` on live buffers
        (reference mini_gym_learn/eval_metrics/metrics.py:66-72). Like the
        reference probe this reads post-step buffers (feet_air_time has
        already been zeroed on contact), so the air-time term is an
        instantaneous approximation of the in-step value."""
        sim = state.sim
        base_lin_vel = Q.quat_rotate_inverse(sim.base_quat, sim.base_lin_vel)
        base_ang_vel = Q.quat_rotate_inverse(sim.base_quat, sim.base_ang_vel)
        gvec = jnp.asarray([0.0, 0.0, -1.0], jnp.float32)
        projected_gravity = Q.quat_rotate_inverse(
            sim.base_quat, jnp.broadcast_to(gvec, sim.base_pos.shape))
        base_height = jnp.mean(
            sim.base_pos[:, 2:3] - state.measured_heights, axis=-1)
        report = state.contact_report
        feet_z = report[:, list(self.feet_indices), 2]
        contact = feet_z > 1.0
        contact_filt = contact | state.last_contacts
        first_contact = (state.feet_air_time > 0.0) & contact_filt
        rew_air = jnp.sum((state.feet_air_time - 0.5) * first_contact,
                          axis=-1)
        rew_air = rew_air * (jnp.linalg.norm(state.commands[:, :2], axis=-1)
                             > 0.1)
        ctx = R.RewardContext(
            base_lin_vel=base_lin_vel, base_ang_vel=base_ang_vel,
            projected_gravity=projected_gravity, base_height=base_height,
            dof_pos=sim.q, default_dof_pos=self.default_dof_pos,
            dof_vel=sim.qd, last_dof_vel=state.last_dof_vel,
            torques=state.torques, dof_pos_limits=self.dof_pos_limits,
            dof_vel_limits=self.dof_vel_limits,
            torque_limits=self.torque_limits,
            actions=state.actions, last_actions=state.last_actions,
            commands=state.commands, contact_forces=report,
            feet_indices=self.feet_indices,
            penalised_contact_indices=self.penalised_contact_indices,
            feet_air_time_reward=rew_air,
            reset_buf=state.reset_buf, time_out_buf=state.time_out_buf,
            tracking_sigma=self.cfg.rewards.tracking_sigma,
            tracking_sigma_yaw=self.cfg.rewards.tracking_sigma_yaw,
            base_height_target=self.cfg.rewards.base_height_target,
            soft_dof_vel_limit=self.cfg.rewards.soft_dof_vel_limit,
            soft_torque_limit=self.cfg.rewards.soft_torque_limit,
            max_contact_force=self.cfg.rewards.max_contact_force,
            dt=self.dt, global_reference=self.cfg.commands.global_reference,
            root_lin_vel_world=sim.base_lin_vel,
        )
        return {name: R.REWARD_REGISTRY[name](ctx) * self.reward_scales[name]
                for name in self.reward_names}

    # ------------------------------------------------------------------
    def _teleport(self, sim: SimState) -> SimState:
        """Edge teleport (legged_robot.py:768-791)."""
        cfg = self.cfg.terrain
        thresh = cfg.teleport_thresh
        x_off = int(getattr(cfg, "x_offset", 0) * cfg.horizontal_scale)
        span_x = cfg.terrain_length * (cfg.num_rows - 1)
        span_y = cfg.terrain_width * (cfg.num_cols - 1)
        x = sim.base_pos[:, 0]
        y = sim.base_pos[:, 1]
        x = jnp.where(x < thresh + x_off, x + span_x, x)
        x = jnp.where(x > cfg.terrain_length * cfg.num_rows - thresh + x_off,
                      x - span_x, x)
        y = jnp.where(y < thresh, y + span_y, y)
        y = jnp.where(y > cfg.terrain_width * cfg.num_cols - thresh,
                      y - span_y, y)
        return sim._replace(base_pos=jnp.stack(
            [x, y, sim.base_pos[:, 2]], axis=-1))

    # ------------------------------------------------------------------
    def reset_envs(self, state: EnvState, mask: jnp.ndarray) -> EnvState:
        """Explicit masked reset (used by reset_evaluation_envs and the
        HLP wrapper; reference reset_idx / reset_evaluation_envs,
        legged_robot.py:204-290)."""
        key, k1, k2, k3 = jax.random.split(state.key, 4)
        sim = self._reset_sim_states(mask, state.sim, state.env_origins, k1)
        m1 = mask[:, None]
        motor, kpf, kdf = self._sample_dof_props(k2, self.num_envs)
        fric, rest, payl, com = self._sample_rigid_body_props(
            k3, self.num_envs)
        dr = DRState(
            friction=jnp.where(mask, fric, state.dr.friction),
            restitution=jnp.where(mask, rest, state.dr.restitution),
            payloads=jnp.where(mask, payl, state.dr.payloads),
            com_displacements=jnp.where(m1, com, state.dr.com_displacements),
            motor_strengths=jnp.where(m1, motor, state.dr.motor_strengths),
            Kp_factors=jnp.where(m1, kpf, state.dr.Kp_factors),
            Kd_factors=jnp.where(m1, kdf, state.dr.Kd_factors))
        episode_sums = {k: jnp.where(mask, 0.0, v)
                        for k, v in state.episode_sums.items()}
        return state._replace(
            sim=sim, dr=dr,
            last_actions=jnp.where(m1, 0.0, state.last_actions),
            last_dof_vel=jnp.where(m1, 0.0, state.last_dof_vel),
            feet_air_time=jnp.where(m1, 0.0, state.feet_air_time),
            episode_length=jnp.where(mask, 0, state.episode_length),
            episode_sums=episode_sums,
            key=key)
