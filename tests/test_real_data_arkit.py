"""Round-trip tests on the real-format ARKit (CN-RMA) fixture.

ARKit analogue of tests/test_real_data.py: raw CN-RMA pkl →
tools/prepare_infos.py --dataset arkit --reverse-yaw → load_infos →
ScenePipeline (per-view intrinsics, 7-dim yaw boxes) → finite
MVSDet.loss with the yaw head → evaluate_scenes with finite rotated
mAP (ref: nerfdet/scannet_multiview_dataset.py:206-366,
nerfdet_head.py:634-1243).
"""

import dataclasses
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from fixtures.arkit_fixture import ARKIT_CLASSES, make_raw_arkit_fixture

from mvsdet_tpu.config import tiny_test_config
from mvsdet_tpu.data.infos import load_infos
from mvsdet_tpu.data.pipeline import ScenePipeline


def _arkit_tiny_config():
    base = tiny_test_config()
    model = dataclasses.replace(
        base.model,
        head=dataclasses.replace(base.model.head,
                                 n_classes=len(ARKIT_CLASSES),
                                 n_reg_outs=7, with_yaw=True))
    data = dataclasses.replace(base.data, classes=ARKIT_CLASSES,
                               n_views_train=5, n_views_test=5)
    return dataclasses.replace(base, model=model, data=data)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("arkit"))
    raw_pkl = make_raw_arkit_fixture(root, n_scenes=2, n_frames=10)
    out_dir = os.path.join(root, "converted")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "prepare_infos.py"),
         "--input", raw_pkl, "--out-dir", out_dir,
         "--dataset", "arkit", "--reverse-yaw"],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 0, res.stderr
    new_pkl = os.path.join(out_dir, "arkit_infos_train.pkl")
    cfg = _arkit_tiny_config()
    scenes = load_infos(new_pkl, data_root=root, classes=cfg.data.classes)
    return root, raw_pkl, new_pkl, cfg, scenes


class TestArkitPrepareAndLoad:
    def test_converted_schema_and_reverse_yaw(self, dataset):
        root, raw_pkl, new_pkl, _, _ = dataset
        with open(new_pkl, "rb") as f:
            d = pickle.load(f)
        assert d["metainfo"]["dataset"] == "arkit"
        rec = d["data_list"][0]
        assert np.asarray(rec["cam2img"]).shape == (10, 3, 3)
        assert len(rec["depth_paths"]) == 10
        assert tuple(rec["original_hw"]) == (192, 256)
        # --reverse-yaw negated every 7th component
        with open(raw_pkl, "rb") as f:
            raw = pickle.load(f)
        raw_yaws = np.asarray(
            raw[0]["annos"]["gt_boxes_upright_depth"])[:, 6]
        new_yaws = np.asarray([i["bbox_3d"] for i in rec["instances"]])[:, 6]
        np.testing.assert_allclose(new_yaws, -raw_yaws, atol=1e-6)

    def test_scene_has_per_view_intrinsics_and_yaw_boxes(self, dataset):
        _, _, _, _, scenes = dataset
        s = scenes[0]
        assert s.intrinsic.shape == (10, 4, 4)   # per-view Ks
        assert s.gt_boxes.shape[1] == 7
        assert s.gt_boxes.shape[0] == 3          # out-of-vocab dropped
        # extrinsic round trip
        eye = np.einsum("nij,njk->nik", s.w2c, s.c2w)
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(4), eye.shape), atol=1e-4)

    def test_pipeline_batch_per_view_intrinsics(self, dataset):
        _, _, _, cfg, scenes = dataset
        pipe = ScenePipeline(cfg, training=True)
        batch = pipe(scenes[0], np.random.RandomState(0))
        h, w = cfg.model.image_size
        n_src = cfg.data.n_src_train
        assert batch["images"].shape == (n_src, h, w, 3)
        assert batch["intrinsic"].shape == (n_src, 4, 4)
        assert batch["tgt_intrinsic"].ndim == 3
        assert batch["gt_boxes"].shape[-1] == 7
        # per-view K rescaled from the ARKit capture resolution
        from fixtures.arkit_fixture import FX, ORI_W
        assert abs(batch["intrinsic"][0, 0, 0] - FX * w / ORI_W) < 2.0

    def test_loss_and_rotated_eval_finite(self, dataset):
        import jax
        import jax.numpy as jnp

        from mvsdet_tpu.evaluation.harness import evaluate_scenes
        from mvsdet_tpu.models.mvsdet import MVSDet

        _, _, _, cfg, scenes = dataset
        pipe = ScenePipeline(cfg, training=True)
        batch_np = pipe(scenes[1], np.random.RandomState(1))
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        model = MVSDet(cfg.model, sweep_chunk=1)
        variables = model.init(jax.random.PRNGKey(0), batch,
                               method=MVSDet.loss)
        (total, aux), _ = model.apply(variables, batch, method=MVSDet.loss,
                                      mutable=["batch_stats"])
        assert np.isfinite(float(total))

        @jax.jit
        def predict(vars_, b):
            return model.apply(vars_, b, False, method=MVSDet.predict)

        results = evaluate_scenes(lambda b: predict(variables, b),
                                  [batch_np],
                                  num_classes=cfg.model.head.n_classes)
        assert np.isfinite(results["mAP_0.25"])
        assert np.isfinite(results["mAP_0.50"])
