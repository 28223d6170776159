"""Live peek at a (possibly still-running) training run: latest learning
curve channels plus the curriculum expansion DIRECTION from the dumped
weight grid — the round-2 failure mode was expansion into the
negative-vx/high-yaw spin corner (VERDICT.md "What's missing" #1), so the
direction, not just command_area, is the health signal.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/run_peek.py runs/r3_ent001
"""

import json
import pickle
import sys

import numpy as np

GRID_SHAPE = (51, 2, 51)                 # (vx, vy, yaw) — mini cheetah cfg
VX = np.linspace(-10.0, 10.0, 51)        # limit_vel_x (config.py:142)
YAW = np.linspace(-10.0, 10.0, 51)       # limit_vel_yaw (config.py:144)


def expansion_stats(weights):
    w = np.asarray(weights, dtype=np.float64).reshape(GRID_SHAPE)
    tot = w.sum()
    if tot <= 0:
        return "no unlocked bins"
    wx = w.sum(axis=(1, 2)) / tot        # marginal over vx bins
    wyaw = w.sum(axis=(0, 1)) / tot
    mean_vx = float((wx * VX).sum())
    pos = float(wx[VX > 0.02].sum())
    neg = float(wx[VX < -0.02].sum())
    unlocked = w > 1e-9
    vx_span = VX[unlocked.any(axis=(1, 2))]
    yaw_span = YAW[unlocked.any(axis=(0, 1))]
    mean_absyaw = float((wyaw * np.abs(YAW)).sum())
    return (f"mean_vx={mean_vx:+.3f}  weight(vx>0)={pos:.2f} "
            f"weight(vx<0)={neg:.2f}  mean|yaw|={mean_absyaw:.2f}  "
            f"vx_span=[{vx_span.min():+.2f},{vx_span.max():+.2f}]  "
            f"yaw_span=[{yaw_span.min():+.2f},{yaw_span.max():+.2f}]  "
            f"area={unlocked.mean():.4f}")


def main(logdir):
    rows = []
    try:
        rows = [json.loads(l) for l in open(f"{logdir}/metrics.jsonl")]
    except FileNotFoundError:
        print("no metrics.jsonl yet")
    chans = ["train/episode/rew_total/mean",
             "train/episode/rew_tracking_lin_vel/mean",
             "train/episode/rew_tracking_ang_vel/mean",
             "train/episode/command_area/mean",
             "train/episode/ep_length/mean",
             "time_iter/mean"]
    marks = (90, 190, 390, 690, 990, 1190, 1490, 2490, 3990)
    for r in rows:
        it = r.get("iterations")
        if it in marks or r is rows[-1]:
            vals = "  ".join(f"{c.split('/')[-2]}={r[c]:.3f}"
                             for c in chans if c in r)
            print(f"it {it:5d}  {vals}")
    # latest curriculum dump
    try:
        dumps = []
        with open(f"{logdir}/curriculum/info.pkl", "rb") as f:
            while True:
                d = pickle.load(f)
                dumps.extend(d if isinstance(d, list) else [d])
    except (FileNotFoundError, EOFError):
        pass
    if dumps:
        d = dumps[-1]
        print(f"\ncurriculum @ it {d.get('iteration')}: "
              f"{expansion_stats(d['weights'])}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/r3_ent001")
