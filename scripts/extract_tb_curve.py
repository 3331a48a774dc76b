"""Extract scalar curves from a TensorBoard event dir as markdown rows.

Used to record learning-curve tables in BASELINE.md from long RL runs
(reference analogue: the reference logs the same scalars via SB3's
TensorBoard writer, utils/callbacks.py:136-151).

Usage: python scripts/extract_tb_curve.py /tmp/runs/sac_fake_r2e \
           rollout/ep_rew_mean rollout/success_rate [--every N]
"""
from __future__ import annotations

import argparse
import sys


def load_scalars(logdir: str, tags: list[str]) -> dict[str, list[tuple[int, float]]]:
    # keep libtensorflow out of the process (see utils/loggers.py)
    import types

    sys.modules.setdefault("tensorboard.compat.notf", types.ModuleType("tensorboard.compat.notf"))
    from tensorboard.backend.event_processing.event_accumulator import EventAccumulator

    acc = EventAccumulator(logdir, size_guidance={"scalars": 0})
    acc.Reload()
    out = {}
    avail = acc.Tags().get("scalars", [])
    for tag in tags:
        if tag not in avail:
            print(f"# tag {tag!r} not in {avail}", file=sys.stderr)
            continue
        out[tag] = [(ev.step, ev.value) for ev in acc.Scalars(tag)]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("logdir")
    ap.add_argument("tags", nargs="+")
    ap.add_argument("--every", type=int, default=1, help="print every Nth point")
    args = ap.parse_args()
    curves = load_scalars(args.logdir, args.tags)
    steps = sorted({s for pts in curves.values() for s, _ in pts})
    by_tag = {t: dict(pts) for t, pts in curves.items()}
    print("| env steps | " + " | ".join(args.tags) + " |")
    print("|---" * (len(args.tags) + 1) + "|")
    for i, s in enumerate(steps):
        if i % args.every and s != steps[-1]:
            continue
        row = [f"{by_tag[t].get(s, float('nan')):.2f}" if t in by_tag else "-" for t in args.tags]
        print(f"| {s} | " + " | ".join(row) + " |")


if __name__ == "__main__":
    main()
