#!/usr/bin/env python
"""Render loss / LR / eval-metric curves from a train_log.jsonl.

The reference gets scalar curves for free from its TensorBoard vis
backend (ref: projects/NeRF-Det/configs/mvsdet_res50_2x_low_res.py:174-176);
here `tools/train.py` writes JSONL and this script turns a run directory
into PNG curves (matplotlib if available, else a pure-numpy PNG via
mvsdet_tpu.utils.imageio) plus a plain-text summary — dependency-light
observability for long runs between epoch evals.

Usage:
  python scripts/plot_train_log.py work_dirs/mvsdet          # -> curves/
  python scripts/plot_train_log.py work_dirs/mvsdet/train_log.jsonl
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_log(path):
    steps, evals = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            rec = json.loads(line)
            (evals if "eval" in rec else steps).append(rec)
    return steps, evals


def _series(records, key):
    xs, ys = [], []
    for r in records:
        if key in r and np.isfinite(r[key]):
            xs.append(r["step"])
            ys.append(float(r[key]))
    return np.asarray(xs), np.asarray(ys)


def _fallback_curve_png(path, xs, ys, h=240, w=640):
    """Tiny dependency-free line plot (white-on-dark) via write_png."""
    from mvsdet_tpu.utils.imageio import write_png

    img = np.full((h, w, 3), 0.12, np.float32)
    if len(xs) >= 2 and np.ptp(ys) >= 0:
        x0, x1 = float(xs.min()), float(xs.max())
        y0, y1 = float(ys.min()), float(ys.max())
        span_x = max(x1 - x0, 1e-9)
        span_y = max(y1 - y0, 1e-9)
        px = ((xs - x0) / span_x * (w - 9) + 4).astype(int)
        py = (h - 5 - (ys - y0) / span_y * (h - 9)).astype(int)
        for i in range(len(px) - 1):
            n = max(abs(px[i + 1] - px[i]), abs(py[i + 1] - py[i]), 1)
            xi = np.linspace(px[i], px[i + 1], n + 1).astype(int)
            yi = np.linspace(py[i], py[i + 1], n + 1).astype(int)
            img[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)] = (0.3, 0.8, 1.0)
    write_png(path, img)


def plot_all(log_path, out_dir):
    steps, evals = load_log(log_path)
    os.makedirs(out_dir, exist_ok=True)
    scalar_keys = sorted({k for r in steps for k in r
                          if k not in ("step", "time")})
    eval_keys = sorted({k for r in evals for k in r["eval"]
                        if k.startswith(("mAP", "mAR", "psnr", "ssim"))})
    eval_flat = [{"step": r["step"], **r["eval"]} for r in evals]

    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        have_mpl = True
    except Exception:
        have_mpl = False

    summary = []
    for keys, records, tag in ((scalar_keys, steps, "train"),
                               (eval_keys, eval_flat, "eval")):
        for key in keys:
            xs, ys = _series(records, key)
            if len(xs) < 2:
                continue
            fname = os.path.join(out_dir, f"{tag}_{key}.png")
            if have_mpl:
                fig, ax = plt.subplots(figsize=(7, 3))
                ax.plot(xs, ys, lw=1.2)
                ax.set_xlabel("step")
                ax.set_title(f"{tag}/{key}")
                ax.grid(alpha=0.3)
                fig.tight_layout()
                fig.savefig(fname, dpi=110)
                plt.close(fig)
            else:
                _fallback_curve_png(fname, xs, ys)
            summary.append(f"{tag}/{key}: first={ys[0]:.5g} "
                           f"last={ys[-1]:.5g} min={ys.min():.5g} "
                           f"max={ys.max():.5g} n={len(ys)}")
    with open(os.path.join(out_dir, "summary.txt"), "w") as f:
        f.write("\n".join(summary) + "\n")
    return summary


def main():
    p = argparse.ArgumentParser()
    p.add_argument("run", help="run dir (containing train_log.jsonl) or "
                               "a .jsonl path")
    p.add_argument("--out", default=None, help="output dir "
                                               "(default <run>/curves)")
    args = p.parse_args()
    log = (args.run if args.run.endswith(".jsonl")
           else os.path.join(args.run, "train_log.jsonl"))
    out = args.out or os.path.join(os.path.dirname(log), "curves")
    for line in plot_all(log, out):
        print(line)
    print("curves ->", out)


if __name__ == "__main__":
    main()
