"""Fused physics substep as ONE Pallas TPU kernel.

:func:`physics_step_pallas` runs the identical elementwise substep chain
as :func:`.soa_physics.physics_step_soa` (same trace —
:func:`.soa_physics.substep_chain`), but inside a single ``pallas_call``:
each env block's entire control step (FK, OSIM apparent inertia, TGS
contact, three ABA sweeps, integration, ``num_substeps`` times) executes
out of VMEM with exactly one HBM read of the packed inputs and one HBM
write of the packed outputs per block.

Under plain XLA the SoA chain fuses well but still materializes
intermediates at fusion boundaries; the Pallas form removes every
intermediate HBM round-trip, which is the remaining bandwidth cost of the
physics (the reference's equivalent is the closed-source PhysX GPU solver
invoked via gym.simulate, reference legged_robot.py:119-121).

Terrain sampling (the only gather) and the channel pack/unpack stay in
XLA: heights/normals under each geom are sampled once per control step at
the entry state, exactly like the SoA path.

Layout: envs ride the TPU lanes. Every per-env scalar becomes a channel
row of a ``[C, N/128, 128]`` f32 array; a grid step processes a
``(C, S, 128)`` block = ``S*128`` envs, so each scalar in the chain is an
(S, 128) VPU tile.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .contact import TerrainGrid
from .dynamics import PhysParams, SimState
from .limb_dynamics import layout_for
from .physics import StepOutput
from .soa_physics import _v3, _stack_v3, substep_chain

LANES = 128


def round_sublanes(block_sublanes: int) -> int:
    """Mosaic requires the last two block dims to tile (8, 128) for f32; a
    sublane count that is not a multiple of 8 (e.g. 4) fails to lower
    ("last two dimensions of your block shape divisible by 8 and 128" —
    seen at 8192 envs in bench_r04_self.log). Padded envs are
    edge-replicated and sliced away, so rounding up is always legal."""
    return max(-(-int(block_sublanes) // 8), 1) * 8


def _out_channels(model):
    # state (3+4+3+3+2*nv) + report nr*3 + geom_pos ng*3
    return 13 + 2 * model.nv + 3 * model.nr + 3 * model.ng


def _kernel(x_ref, o_ref, *, model, sim_cfg, layout, fixed_base,
            has_imp, has_terrain, world_boxes=None, world_friction=1.0):
    """One env block: unpack channel rows -> substep_chain -> pack."""
    nv, ng, nr = model.nv, model.ng, model.nr
    idx = [0]

    def nxt():
        c = idx[0]
        idx[0] = c + 1
        return x_ref[c]

    def nxt_v3():
        return (nxt(), nxt(), nxt())

    comps = dict(
        base_pos=nxt_v3(),
        base_quat=(nxt(), nxt(), nxt(), nxt()),
        base_v=nxt_v3(),
        base_w=nxt_v3(),
        q=[nxt() for _ in range(nv)],
        qd=[nxt() for _ in range(nv)],
        tau=[nxt() for _ in range(nv)],
        payload=nxt(),
        com_disp=nxt_v3(),
        restitution=nxt(),
        mu=nxt(),
    )
    if has_imp:
        comps["imp"] = [nxt() for _ in range(nv)]
    if has_terrain:
        comps["g_h"] = [nxt() for _ in range(ng)]
        comps["g_n"] = [nxt_v3() for _ in range(ng)]
    if world_boxes is not None:
        comps["origin"] = nxt_v3()

    out = substep_chain(model, sim_cfg, layout, comps, fixed_base=fixed_base,
                        world_boxes=world_boxes,
                        world_friction=world_friction)

    oidx = [0]

    def put(val):
        o_ref[oidx[0]] = val
        oidx[0] += 1

    for v in out["base_pos"]:
        put(v)
    for v in out["base_quat"]:
        put(v)
    for v in out["base_v"]:
        put(v)
    for v in out["base_w"]:
        put(v)
    for v in out["q"]:
        put(v)
    for v in out["qd"]:
        put(v)
    for r_ in out["report"]:
        for v in r_:
            put(v)
    for p_ in out["geom_pos"]:
        for v in p_:
            put(v)


def physics_step_pallas(
    model,
    sim_cfg,
    state: SimState,               # batched [N,...]
    tau: jnp.ndarray,              # [N,nv]
    params: PhysParams,            # batched
    terrain: Optional[TerrainGrid],
    fixed_base: bool = False,
    implicit_damp: Optional[jnp.ndarray] = None,
    block_sublanes: int = 4,       # envs per grid step = block_sublanes*128
    interpret: bool = False,
    world_boxes=None,              # envs.world.WorldBoxes (static consts)
    env_origin: Optional[jnp.ndarray] = None,      # [N,3] for world_boxes
    world_friction: float = 1.0,
    terrain_patch=None,            # optional hoisted (patch, ix0, iy0)
) -> StepOutput:
    """Drop-in replacement for :func:`.soa_physics.physics_step_soa` that
    executes the substep chain as one fused Pallas kernel per env block."""
    layout = layout_for(model)
    assert layout is not None, "Pallas path requires a limb-decomposable tree"
    nv, ng, nr = model.nv, model.ng, model.nr
    N = state.q.shape[0]
    # Mosaic requires the last two block dims to tile (8, 128) for f32;
    # a requested sublane count that is not a multiple of 8 (e.g. 4) fails
    # to lower ("last two dimensions of your block shape divisible by 8
    # and 128"), so round it up — padded envs are edge-replicated and
    # sliced away below, so any (num_envs, block_sublanes) combination is
    # legal.
    block_sublanes = max(-(-block_sublanes // 8), 1) * 8
    blk = block_sublanes * LANES
    npad = max(-(-N // blk), 1) * blk

    base_pos = _v3(state.base_pos)
    base_quat = tuple(state.base_quat[:, i] for i in range(4))
    q = [state.q[:, j] for j in range(nv)]

    chans = []
    chans += list(base_pos)
    chans += list(base_quat)
    chans += list(_v3(state.base_lin_vel))
    chans += list(_v3(state.base_ang_vel))
    chans += q
    chans += [state.qd[:, j] for j in range(nv)]
    chans += [tau[:, j] for j in range(nv)]
    chans.append(params.payload)
    chans += list(_v3(params.com_displacement))
    chans.append(params.restitution)
    chans.append(0.5 * (params.friction
                        + (terrain.static_friction
                           if terrain is not None else 1.0)))
    if implicit_damp is not None:
        chans += [implicit_damp[:, j] for j in range(nv)]
    if terrain is not None:
        from .soa_physics import _sample_geom_terrain
        g_h, g_n = _sample_geom_terrain(model, layout, sim_cfg, terrain,
                                        base_pos, base_quat, q,
                                        patch3=terrain_patch)
        # order must mirror _kernel's reads: all heights, then all normals
        chans += g_h
        for n3 in g_n:
            chans += [n3[0], n3[1], n3[2]]
    if world_boxes is not None:
        chans += list(_v3(env_origin))

    C = len(chans)
    C_out = _out_channels(model)
    # pad env axis by edge-replication (padded lanes run real, in-range
    # values through the chain; results are sliced away)
    x = jnp.stack([jnp.pad(c.astype(jnp.float32), (0, npad - N),
                           mode="edge") for c in chans])
    x = x.reshape(C, npad // LANES, LANES)

    kern = functools.partial(
        _kernel, model=model, sim_cfg=sim_cfg, layout=layout,
        fixed_base=fixed_base, has_imp=implicit_damp is not None,
        has_terrain=terrain is not None, world_boxes=world_boxes,
        world_friction=world_friction)
    y = pl.pallas_call(
        kern,
        grid=(npad // blk,),
        in_specs=[pl.BlockSpec((C, block_sublanes, LANES),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((C_out, block_sublanes, LANES),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C_out, npad // LANES, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(x)

    y = y.reshape(C_out, npad)[:, :N]
    o = [0]

    def take(k):
        v = y[o[0]:o[0] + k]
        o[0] += k
        return v

    new_state = SimState(
        base_pos=take(3).T,
        base_quat=take(4).T,
        base_lin_vel=take(3).T,
        base_ang_vel=take(3).T,
        q=take(nv).T,
        qd=take(nv).T)
    report0 = take(3 * nr).T.reshape(N, nr, 3)
    geom_pos = take(3 * ng).T.reshape(N, ng, 3)
    return StepOutput(new_state, report0, geom_pos)
