"""Detection-learning tests: mAP@0.25 must rise AND stay risen.

Overfits two fixed synthetic scenes with scripts/overfit_map.py's
harness and asserts the full chain — FCOS-3D target assignment,
focal/BCE/IoU (or rotated-IoU) losses, AdamW groups, box decode, NMS,
greedy-AP eval — learns to a STABLE plateau.  The recipe mirrors the
reference's training protocol shape (MultiStepLR x0.1 at 8/12 and
11/12 of the run, mvsdet_res50_2x_low_res_depth.py:185-193), which
fixed the round-3 oscillation (0.8 at step 50 -> 0.21 at step 100 with
constant lr 1e-3): the decayed phase locks in the solution, so the
FINAL step is gated, not the best eval.

Calibration (seed 0; the plateau HEIGHT is env-sensitive but the
rise-and-hold shape is not):
  single CPU device, 150 steps:  aligned final 0.79 (drawdown 0.015),
                                 arkit final 0.93 (drawdown 0.0)
  TPU v5e, 200 steps:            aligned final 0.83, arkit final 0.90
  8-virtual-device CPU (the pytest env), 200 steps:
                                 arkit 0, 0, .53, .41, .50, .54, .52,
                                 .50, .50 — final 0.50, drawdown 0.04
Why the height varies (round-5 bisection,
experiments/plateau_bisect/README.md): the single-device overfit path
has no device-count-dependent computation; the cross-env spread equals
the within-env across-seed spread (TPU seeds 0-2: 0.90/1.00/0.75;
8-dev CPU seeds: 0.52-1.00), i.e. the 2-scene overfit is chaotic and
each (env, seed) lands in its own basin — environment differences act
only as seed-sized fp perturbations, not as a numerics defect.  Gates
are set below the weakest observed basin; the drawdown assert is the
stability claim.
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from overfit_map import run  # noqa: E402


def _assert_stable_climb(history, final_min):
    by_step = {h["step"]: h for h in history}
    final = history[-1]
    assert by_step[0]["mAP_0.25"] < 0.3, json.dumps(history)
    # gate the FINAL step (round-3 VERDICT item 2), not the best eval
    assert final["mAP_0.25"] > final_min, json.dumps(history)
    assert final["mAR_0.25"] > final_min, json.dumps(history)
    # no collapse after the plateau: final within 0.2 of the best
    best = max(h["mAP_0.25"] for h in history)
    assert final["mAP_0.25"] >= best - 0.2, json.dumps(history)


def test_map_rises_when_overfitting():
    history = run(steps=150, eval_every=50, n_scenes=2, lr=1e-3, seed=0,
                  log_fn=lambda s: None)
    _assert_stable_climb(history, final_min=0.6)


def test_rotated_map_rises_when_overfitting():
    """ARKit yaw head learns end to end with the rotated-IoU box loss
    (rotated assignment -> soft rotated-IoU loss -> rotated NMS ->
    rotated-IoU eval).  Also the regression test for the corner-loss
    size-collapse bug (mAP pinned at 0).

    Seed 1 is the basin-stable seed: 1.000 final in all three
    environments of the round-5 plateau sweep
    (experiments/plateau_bisect/README.md), so the gate sits 0.4 below
    the expected plateau.  Seed 0's cpu8 basin is 0.52, which had
    forced the old 0.4 gate.
    """
    history = run(steps=200, eval_every=50, n_scenes=2, lr=1e-3, seed=1,
                  log_fn=lambda s: None, arkit=True)
    _assert_stable_climb(history, final_min=0.6)
