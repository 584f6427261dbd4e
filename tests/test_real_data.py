"""Round-trip tests on the real-format ScanNet fixture.

Covers what VERDICT r1 item 5 asked for: raw pkl (the format
`prepare_infos.py` consumes) → tools/prepare_infos.py conversion →
`load_infos` → `ScenePipeline` batches → one finite `MVSDet.loss` —
the exact path a real ScanNet download takes (ref:
projects/NeRF-Det/prepare_infos.py:22-103,
nerfdet/scannet_multiview_dataset.py:100-168).
"""

import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from fixtures.scannet_fixture import (CX, CY, FX, ORI_H, ORI_W,
                                      make_raw_fixture)

from mvsdet_tpu.config import tiny_test_config
from mvsdet_tpu.data.infos import load_infos
from mvsdet_tpu.data.pipeline import ScenePipeline, sample_views_gap


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scannet"))
    raw_pkl = make_raw_fixture(root, n_scenes=2, n_frames=12)
    out_dir = os.path.join(root, "converted")
    res = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "prepare_infos.py"),
         "--input", raw_pkl, "--out-dir", out_dir],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert res.returncode == 0, res.stderr
    new_pkl = os.path.join(out_dir, "scannet_infos_train.pkl")
    cfg = tiny_test_config()
    scenes = load_infos(new_pkl, data_root=root, classes=cfg.data.classes)
    return root, new_pkl, cfg, scenes


class TestPrepareAndLoad:
    def test_converted_schema(self, dataset):
        _, new_pkl, _, _ = dataset
        with open(new_pkl, "rb") as f:
            d = pickle.load(f)
        assert set(d) == {"metainfo", "data_list"}
        assert len(d["data_list"]) == 2
        rec = d["data_list"][0]
        for key in ("cam2img", "lidar2cam", "img_paths",
                    "axis_align_matrix", "instances"):
            assert key in rec, key
        assert len(rec["img_paths"]) == 12
        # out-of-vocab instance converted with label -1
        labels = [i["bbox_label_3d"] for i in rec["instances"]]
        assert -1 in labels

    def test_scene_geometry_roundtrip(self, dataset):
        _, _, _, scenes = dataset
        assert len(scenes) == 2
        s = scenes[0]
        assert s.w2c.shape == (12, 4, 4) and s.c2w.shape == (12, 4, 4)
        # w2c really inverts c2w
        eye = np.einsum("nij,njk->nik", s.w2c, s.c2w)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(4), eye.shape),
                                   atol=1e-4)
        # aligned-frame camera centres sit on the generation orbit
        centres = s.c2w[:, :3, 3]
        np.testing.assert_allclose(np.linalg.norm(centres[:, :2], axis=-1),
                                   2.2, atol=1e-3)
        # -1-labelled instance was dropped by the class filter
        assert s.gt_boxes.shape == (3, 6)
        assert s.gt_labels.min() >= 0

    def test_pipeline_batch_shapes_and_intrinsics(self, dataset):
        _, _, cfg, scenes = dataset
        pipe = ScenePipeline(cfg, training=True)
        batch = pipe(scenes[0], np.random.RandomState(0))
        h, w = cfg.model.image_size
        ht, wt = cfg.model.target_size
        n_src = cfg.data.n_src_train
        assert batch["images"].shape == (n_src, h, w, 3)
        assert batch["denorm_images"].shape == (n_src, h, w, 3)
        assert batch["gt_images"].shape == (2, ht, wt, 3)
        assert batch["w2c"].shape == (n_src, 4, 4)
        # intrinsics rescaled from the true capture resolution 968x1296
        np.testing.assert_allclose(batch["intrinsic"][0, 0], FX * w / ORI_W,
                                   rtol=1e-5)
        np.testing.assert_allclose(batch["intrinsic"][1, 2], CY * h / ORI_H,
                                   rtol=1e-5)
        assert batch["gt_mask"].sum() == 3
        # images normalised: roughly zero-mean after ImageNet stats
        assert abs(batch["images"].mean()) < 2.0
        assert batch["denorm_images"].min() >= 0.0
        assert batch["denorm_images"].max() <= 1.0

    def test_loss_finite_on_real_format_batch(self, dataset):
        import jax
        import jax.numpy as jnp

        from mvsdet_tpu.models.mvsdet import MVSDet

        _, _, cfg, scenes = dataset
        pipe = ScenePipeline(cfg, training=True)
        batch_np = pipe(scenes[1], np.random.RandomState(1))
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        model = MVSDet(cfg.model, sweep_chunk=2)
        variables = model.init(jax.random.PRNGKey(0), batch,
                               method=MVSDet.loss)
        (total, aux), _ = model.apply(variables, batch, method=MVSDet.loss,
                                      mutable=["batch_stats"])
        assert np.isfinite(float(total))
        for k in ("center_loss", "bbox_loss", "cls_loss", "loss_nvs"):
            assert np.isfinite(float(aux[k])), k


class TestGapSamplerGuard:
    def test_short_scene_falls_back_to_random(self):
        rng = np.random.RandomState(0)
        # n_total=4 would crash the reference's randint bounds
        src, tgt = sample_views_gap(rng, n_total=4, n_images=6, n_targets=2)
        assert len(tgt) == 2
        assert len(src) >= 1
        assert set(src).isdisjoint(set(tgt))

    def test_normal_scene_keeps_gap_semantics(self):
        rng = np.random.RandomState(0)
        src, tgt = sample_views_gap(rng, n_total=40, n_images=12,
                                    n_targets=2)
        assert len(tgt) == 2
        # each target is flanked by its run's boundary sources
        for t in tgt:
            assert t - 1 in src and t + 1 in src
