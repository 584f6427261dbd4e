"""Legacy NeRF-Det learning test: the second model family must learn.

Mirrors tests/test_learning.py for `tools/train.py --model nerfdet`
(ref: the reference trains NerfDet via its configs,
projects/NeRF-Det/nerfdet/nerfdet.py:20).  TPU calibration (300 steps,
evals every 50): 0, 0, 0.40, 0.58, 0.72, 0.72, 0.72 — plateau from
step 200, zero drawdown (experiments/overfit_map_nerfdet.jsonl).
Learning is slower than MVSDet because the detection volume is scaled
by the NeRF density (alpha starts near 0 and must be learned first —
the nerf_density path, nerfdet.py:281-318), so this runs 300 steps and
is marked slow.
"""

import json
import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from overfit_map import run  # noqa: E402


def test_nerfdet_map_rises_when_overfitting():
    history = run(steps=300, eval_every=100, n_scenes=2, lr=1e-3, seed=0,
                  log_fn=lambda s: None, model_family="nerfdet")
    by_step = {h["step"]: h for h in history}
    final = history[-1]
    assert by_step[0]["mAP_0.25"] < 0.3, json.dumps(history)
    assert final["mAP_0.25"] > 0.4, json.dumps(history)
    assert final["mAR_0.25"] > 0.5, json.dumps(history)
    best = max(h["mAP_0.25"] for h in history)
    assert final["mAP_0.25"] >= best - 0.2, json.dumps(history)
