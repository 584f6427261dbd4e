"""Eval harness, predict-time diagnostics, and vis/export utilities.

Covers the reference's eval-time observability suite: GT-depth lift
diagnostics (mvsdet.py:1436-1492 -> weight_gap/src_rmse :1053-1058),
rendered target depth (GaussianDepthMetric, Indoor_NVS.py:231-283),
the shared evaluate_scenes harness, PLY gaussian export
(gs_src/model/ply_export.py:28-96), and the PNG dumper
(nerf_utils/save_rendered_img.py:17-45).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsdet_tpu.config import tiny_test_config
from mvsdet_tpu.data.synthetic import make_synthetic_scene
from mvsdet_tpu.models.mvsdet import MVSDet


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    batch_np = make_synthetic_scene(cfg, seed=0, n_views=4, n_targets=2)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = MVSDet(cfg.model, sweep_chunk=2)
    variables = model.init(jax.random.PRNGKey(0), batch, method=MVSDet.loss)
    return cfg, model, variables, batch


class TestLiftDiagnostics:
    def _inputs(self, seed=0):
        from mvsdet_tpu.geometry.cameras import full_projection
        from mvsdet_tpu.geometry.voxels import voxel_points

        cfg = tiny_test_config()
        scene = make_synthetic_scene(cfg, seed=seed, n_views=3, n_targets=1)
        h, w = cfg.model.feature_size
        n = 3
        rng = np.random.default_rng(seed)
        k_feat = np.asarray(scene["intrinsic"], np.float64).copy()
        k_feat[:2] /= cfg.model.feature_stride
        proj = np.asarray(full_projection(
            jnp.asarray(scene["w2c"]), jnp.asarray(k_feat)))[:, :3, :4]
        points = np.asarray(voxel_points(
            cfg.model.n_voxels, cfg.model.voxel_size,
            jnp.asarray(scene["origin"]))).reshape(3, -1).T
        gt = rng.uniform(0.5, 3.0, (n, h, w)).astype(np.float32)
        return cfg, proj, points, gt

    def test_perfect_depth_beats_wrong_depth(self):
        from mvsdet_tpu.ops.voxel_lift import lift_diagnostics

        cfg, proj, points, gt = self._inputs()
        k = cfg.model.topk
        # hypotheses centred exactly on GT with all mass on the first
        est_good = np.stack([gt + 0.0] + [gt + 10.0] * (k - 1), axis=-1)
        prob = np.zeros(est_good.shape, np.float32)
        prob[..., 0] = 1.0
        wg_good, sr_good = lift_diagnostics(
            jnp.asarray(proj), jnp.asarray(est_good), jnp.asarray(prob),
            jnp.asarray(points), cfg.model.voxel_size[2],
            jnp.asarray(gt), jnp.asarray(gt))
        # hypotheses far from GT
        est_bad = est_good + 2.5
        wg_bad, sr_bad = lift_diagnostics(
            jnp.asarray(proj), jnp.asarray(est_bad), jnp.asarray(prob),
            jnp.asarray(points), cfg.model.voxel_size[2],
            jnp.asarray(gt), jnp.asarray(gt + 2.5))
        assert float(sr_good) == pytest.approx(0.0, abs=1e-6)
        assert float(sr_bad) == pytest.approx(2.5**2, rel=1e-4)
        assert float(wg_good) < float(wg_bad)
        # perfect hypotheses: weight==1 exactly where gt_valid==1
        assert float(wg_good) < 1e-6

    def test_masked_src_rmse_ignores_invalid(self):
        from mvsdet_tpu.ops.voxel_lift import lift_diagnostics

        cfg, proj, points, gt = self._inputs(1)
        gt[:, ::2] = 0.0                        # half the pixels invalid
        est = np.stack([gt] * cfg.model.topk, -1)
        prob = np.ones_like(est) / cfg.model.topk
        pred = gt + 1.0                          # off by 1 everywhere
        _, sr = lift_diagnostics(
            jnp.asarray(proj), jnp.asarray(est), jnp.asarray(prob),
            jnp.asarray(points), cfg.model.voxel_size[2],
            jnp.asarray(gt), jnp.asarray(pred))
        assert float(sr) == pytest.approx(1.0, rel=1e-5)


class TestPredictDiagnostics:
    def test_predict_returns_diagnostics(self, setup):
        cfg, model, variables, batch = setup
        pred = model.apply(variables, batch, True, method=MVSDet.predict)
        t = batch["tgt_c2w"].shape[0]
        ht, wt = cfg.model.target_size
        assert pred["rendered_depth"].shape == (t, ht, wt)
        assert np.isfinite(float(pred["weight_gap"]))
        assert np.isfinite(float(pred["src_rmse"]))
        assert 0.0 <= float(pred["weight_gap"]) <= 1.0
        assert pred["gs_means"].ndim == 2 and pred["gs_means"].shape[1] == 3

    def test_rendered_depth_in_scene_range(self, setup):
        cfg, model, variables, batch = setup
        pred = model.apply(variables, batch, True, method=MVSDet.predict)
        d = np.asarray(pred["rendered_depth"])
        assert np.all(np.isfinite(d))
        # composited z-depth stays within the modelled depth range
        assert d.max() <= cfg.model.near_far_range[1] + 1.0


class TestEvaluateScenes:
    def test_metrics_dict_complete(self, setup, tmp_path):
        from mvsdet_tpu.evaluation.harness import (evaluate_scenes,
                                                   make_predict_fn)

        cfg, model, variables, _ = setup
        scenes = [make_synthetic_scene(cfg, seed=s, n_views=4, n_targets=2)
                  for s in range(2)]
        predict = make_predict_fn(model, variables, diagnostics=True)
        calls = []
        results = evaluate_scenes(
            predict, scenes, num_classes=cfg.model.head.n_classes,
            vis_hook=lambda si, sc, out: calls.append(si))
        for key in ("mAP_0.25", "mAP_0.50", "psnr", "ssim", "depth_rmse",
                    "mvs_rmse", "weight_gap", "src_rmse"):
            assert key in results, (key, sorted(results))
            assert np.isfinite(results[key])
        assert calls == [0, 1]

    def test_sharded_eval_matches_single_device(self, setup):
        """--data-parallel analogue of the reference's dist_test.sh:
        metrics from the ('data',)-mesh sharded predict must equal the
        single-device path exactly (3 scenes over 2 shards exercises the
        repeat-last-scene padding)."""
        from mvsdet_tpu.evaluation.harness import (evaluate_scenes,
                                                   make_predict_fn,
                                                   make_sharded_predict_fn)
        from mvsdet_tpu.parallel.mesh import make_mesh

        cfg, model, variables, _ = setup
        scenes = [make_synthetic_scene(cfg, seed=s, n_views=4, n_targets=2)
                  for s in range(3)]
        single = evaluate_scenes(
            make_predict_fn(model, variables), scenes,
            num_classes=cfg.model.head.n_classes)
        mesh = make_mesh(data=2, view=1)
        sharded = evaluate_scenes(
            make_sharded_predict_fn(model, variables, mesh), scenes,
            num_classes=cfg.model.head.n_classes, group_size=2)
        for key, v in single.items():
            if key.startswith("predict_s"):
                continue
            assert sharded[key] == pytest.approx(v, abs=1e-5), key


class TestPrefetch:
    """The background staging thread (data/prefetch.py) must change
    timing only, never values or order."""

    def test_prefetch_iterator_order_and_exhaustion(self):
        from mvsdet_tpu.data.prefetch import prefetch_iterator

        assert list(prefetch_iterator(range(7), depth=2)) == list(range(7))
        assert list(prefetch_iterator([], depth=1)) == []

    def test_prefetcher_callable_order(self):
        import itertools

        from mvsdet_tpu.data.prefetch import Prefetcher

        c = itertools.count()
        p = Prefetcher(lambda: next(c), depth=2)
        got = [p() for _ in range(6)]
        p.close()
        assert got == list(range(6))

    def test_evaluate_scenes_matches_unprefetched_loop(self, setup):
        """Prefetched evaluate_scenes == a plain synchronous loop over
        the same predict_fn feeding the same metric functions."""
        import jax.numpy as jnp

        from mvsdet_tpu.evaluation.harness import (evaluate_scenes,
                                                   make_predict_fn)
        from mvsdet_tpu.evaluation.indoor_eval import indoor_map

        cfg, model, variables, _ = setup
        scenes = [make_synthetic_scene(cfg, seed=s, n_views=4, n_targets=2)
                  for s in range(3)]
        predict = make_predict_fn(model, variables)

        results = evaluate_scenes(predict, scenes,
                                  num_classes=cfg.model.head.n_classes)

        preds, gts = [], []
        for scene in scenes:
            out = {k: np.asarray(v) for k, v in predict(
                {k: jnp.asarray(v) for k, v in scene.items()}).items()}
            m = out["mask"]
            preds.append({"boxes": out["boxes"][m], "scores": out["scores"][m],
                          "labels": out["labels"][m]})
            gm = np.asarray(scene["gt_mask"])
            gts.append({"boxes": np.asarray(scene["gt_boxes"])[gm],
                        "labels": np.asarray(scene["gt_labels"])[gm]})
        golden = indoor_map(preds, gts, num_classes=cfg.model.head.n_classes)
        for key, v in golden.items():
            assert results[key] == pytest.approx(v, abs=1e-12), key


class TestBoxVis:
    """Projected 3D-box overlays (ref visualize_bbox, mvsdet.py:976-982)."""

    def test_corner_projection_and_drawing(self):
        from mvsdet_tpu.utils.box_vis import (box_corners,
                                              draw_boxes_on_image)

        # unit cube at origin seen by a camera at z=-3 looking +z
        box = np.array([[0.0, 0, 0, 1, 1, 1]])
        corners = box_corners(box)
        assert corners.shape == (1, 8, 3)
        np.testing.assert_allclose(np.abs(corners).max(), 0.5)

        w2c = np.eye(4)
        w2c[2, 3] = 3.0                                  # camera z=-3
        k = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        img = np.zeros((96, 128, 3), np.float32)
        out = draw_boxes_on_image(img, box, w2c, k, (0, 1, 0))
        assert out.shape == img.shape
        painted = np.argwhere(out[..., 1] > 0)
        assert len(painted) > 50
        # wireframe spans the projected extents: +-0.5 m at z in
        # [2.5, 3.5] -> x in 64 +- [14.3, 20]
        ys, xs = painted[:, 0], painted[:, 1]
        assert 40 <= xs.min() <= 52 and 76 <= xs.max() <= 88
        assert 24 <= ys.min() <= 36 and 60 <= ys.max() <= 72
        # behind-camera boxes draw nothing
        behind = np.array([[0.0, 0, -10.0, 1, 1, 1]])
        out2 = draw_boxes_on_image(img, behind, w2c, k, (0, 1, 0))
        assert np.all(out2 == 0)

    def test_yaw_box_rotates_corners(self):
        from mvsdet_tpu.utils.box_vis import box_corners

        b0 = np.array([[0.0, 0, 0, 2, 1, 1, 0.0]])
        b90 = np.array([[0.0, 0, 0, 2, 1, 1, np.pi / 2]])
        c0 = box_corners(b0)[0]
        c90 = box_corners(b90)[0]
        # 90-degree yaw swaps the x/y extents
        assert abs(c0[:, 0].max() - 1.0) < 1e-6
        assert abs(c90[:, 1].max() - 1.0) < 1e-6
        assert abs(c90[:, 0].max() - 0.5) < 1e-6

    def test_score_threshold_filters(self):
        from mvsdet_tpu.utils.box_vis import draw_boxes_on_image

        w2c = np.eye(4)
        w2c[2, 3] = 3.0
        k = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]])
        img = np.zeros((96, 128, 3), np.float32)
        box = np.array([[0.0, 0, 0, 1, 1, 1]])
        out = draw_boxes_on_image(img, box, w2c, k, (0, 1, 0),
                                  scores=np.array([0.1]), score_thr=0.5)
        assert np.all(out == 0)


class TestVisExport:
    def test_png_roundtrip_header(self, tmp_path):
        from mvsdet_tpu.utils.imageio import colorize_depth, write_png

        p = str(tmp_path / "x.png")
        write_png(p, np.random.rand(8, 12, 3))
        raw = open(p, "rb").read()
        assert raw[:8] == b"\x89PNG\r\n\x1a\n"
        assert b"IHDR" in raw and b"IEND" in raw
        d = np.zeros((8, 12))
        d[4:] = 2.0
        rgb = colorize_depth(d)
        assert rgb.shape == (8, 12, 3) and rgb.dtype == np.uint8
        assert np.all(rgb[:4] == 0)              # invalid painted black

    def test_ply_scale_rot_roundtrip(self):
        from mvsdet_tpu.utils.ply_export import covariance_to_scale_rot

        rng = np.random.default_rng(0)
        g = 64
        q = rng.normal(size=(g, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        w, x, y, z = q.T
        r = np.stack([
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                      2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                      2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                      1 - 2 * (x * x + y * y)], -1)], -2)
        s = rng.uniform(0.1, 2.0, (g, 3))
        cov = np.einsum("gij,gj,gkj->gik", r, s**2, r)
        s2, q2 = covariance_to_scale_rot(cov)
        w, x, y, z = q2.T.astype(np.float64)
        r2 = np.stack([
            np.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                      2 * (x * z + w * y)], -1),
            np.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                      2 * (y * z - w * x)], -1),
            np.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                      1 - 2 * (x * x + y * y)], -1)], -2)
        cov2 = np.einsum("gij,gj,gkj->gik", r2, s2.astype(np.float64)**2, r2)
        assert np.abs(cov - cov2).max() < 1e-5

    def test_export_ply_counts_and_header(self, tmp_path):
        from mvsdet_tpu.utils.ply_export import export_ply

        rng = np.random.default_rng(1)
        g = 40
        means = rng.normal(size=(g, 3)).astype(np.float32)
        eye = np.broadcast_to(np.eye(3, dtype=np.float32) * 0.01, (g, 3, 3))
        sh = rng.normal(size=(g, 3, 4)).astype(np.float32)
        op = np.linspace(0.0, 0.9, g).astype(np.float32)
        p = str(tmp_path / "g.ply")
        n = export_ply(p, means, eye, sh, op, min_opacity=0.5)
        assert n == int(np.sum(op > 0.5))
        raw = open(p, "rb").read()
        header = raw.split(b"end_header")[0].decode()
        assert f"element vertex {n}" in header
        n_props = header.count("property float")
        body = raw.split(b"end_header\n")[1]
        assert len(body) == n * n_props * 4
