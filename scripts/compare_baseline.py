"""Compare a run's learning curve against the reference example run at
matched iterations (BASELINE.md rows; reference
runs/rapid-locomotion/example/train/201852.132488/metrics.pkl).

Usage: python scripts/compare_baseline.py runs/flagship_r2
"""

import json
import pickle
import sys

REF_PKL = ("/root/reference/runs/rapid-locomotion/example/train/"
           "201852.132488/metrics.pkl")
CHANNELS = [
    "train/episode/rew_total/mean",
    "train/episode/rew_tracking_lin_vel/mean",
    "train/episode/rew_tracking_ang_vel/mean",
    "train/episode/command_area/mean",
]


def main(logdir):
    ours = [json.loads(l) for l in open(f"{logdir}/metrics.jsonl")]
    ref = []
    try:
        with open(REF_PKL, "rb") as f:
            while True:
                ref.append(pickle.load(f))
    except (EOFError, FileNotFoundError):
        pass
    ref_by_it = {r.get("iterations"): r for r in ref}
    ours_by_it = {r.get("iterations"): r for r in ours}

    its = [it for it in (100, 200, 400, 700, 990, 1490, 2000, 3000, 3990)
           if any(abs(it - i) <= 10 for i in ours_by_it)]

    def near(d, it):
        k = min(d, key=lambda i: abs(i - it))
        return d[k] if abs(k - it) <= 10 else {}

    for ch in CHANNELS:
        short = ch.split("/")[-2]
        print(f"\n{short}:")
        print("  iter      ours       ref      ratio")
        for it in its:
            o = near(ours_by_it, it).get(ch)
            r = near(ref_by_it, it).get(ch)
            if o is None:
                continue
            ratio = (o / r) if (r not in (None, 0)) else float("nan")
            print(f"  {it:5d}  {o:8.3f}  "
                  f"{r if r is not None else float('nan'):8.3f}  {ratio:6.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "runs/flagship_r2")
