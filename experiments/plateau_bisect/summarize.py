#!/usr/bin/env python
"""Summarise the plateau seed-sweep JSONLs into one table.

Each file is scripts/overfit_map.py stdout for one (env, seed) cell of
the round-5 bisection of VERDICT weak-2: the same seed-0 ARKit recipe
plateauing at 0.90 (TPU) / 0.93 (1-CPU) / 0.50 (8-virtual-device CPU).
Run: python experiments/plateau_bisect/summarize.py
"""

import glob
import json
import os
import re

HERE = os.path.dirname(os.path.abspath(__file__))


def load(path):
    hist = []
    for line in open(path):
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "mAP_0.25" in rec:
            hist.append(rec)
    return hist


def main():
    rows = []
    for path in sorted(glob.glob(os.path.join(HERE, "*seed*.jsonl"))):
        m = re.match(r"(\w+)_seed(\d+)", os.path.basename(path))
        env, seed = m.group(1), int(m.group(2))
        hist = load(path)
        if not hist:
            continue
        final = hist[-1]["mAP_0.25"]
        best = max(h["mAP_0.25"] for h in hist)
        rows.append((env, seed, final, best, best - final))
    envs = sorted({r[0] for r in rows})
    print(f"{'env':8} {'seed':4} {'final':>7} {'best':>7} {'drawdown':>9}")
    for env, seed, final, best, dd in rows:
        print(f"{env:8} {seed:4d} {final:7.3f} {best:7.3f} {dd:9.3f}")
    print()
    for env in envs:
        vals = [r[2] for r in rows if r[0] == env]
        if vals:
            print(f"{env:8} n={len(vals)} final mAP: min={min(vals):.3f} "
                  f"max={max(vals):.3f} mean={sum(vals)/len(vals):.3f}")


if __name__ == "__main__":
    main()
