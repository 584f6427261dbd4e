"""Shape and semantics tests for the flax model components."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsdet_tpu.config import HeadConfig
from mvsdet_tpu.models import head as head_lib
from mvsdet_tpu.models.cost_reg import CostRegNet
from mvsdet_tpu.models.fpn import FPN
from mvsdet_tpu.models.neck3d import IndoorImVoxelNeck
from mvsdet_tpu.models.resnet import ResNet50


class TestResNetFPN:
    def test_resnet_output_strides(self):
        model = ResNet50()
        x = jnp.zeros((1, 64, 96, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        outs = model.apply(variables, x)
        assert len(outs) == 4
        assert outs[0].shape == (1, 16, 24, 256)
        assert outs[1].shape == (1, 8, 12, 512)
        assert outs[2].shape == (1, 4, 6, 1024)
        assert outs[3].shape == (1, 2, 3, 2048)

    def test_frozen_collection_has_no_params_gradient_path(self):
        model = ResNet50()
        x = jnp.zeros((1, 32, 32, 3))
        variables = model.init(jax.random.PRNGKey(0), x)
        assert "frozen" in variables
        # all BN tensors live in frozen, none in params
        flat = jax.tree_util.tree_leaves_with_path(variables["params"])
        for path, _ in flat:
            assert "bn" not in str(path).lower()

    def test_fpn_shapes(self):
        fpn = FPN(out_channels=32)
        ins = [jnp.zeros((1, 16, 24, 64)), jnp.zeros((1, 8, 12, 128)),
               jnp.zeros((1, 4, 6, 256)), jnp.zeros((1, 2, 3, 512))]
        variables = fpn.init(jax.random.PRNGKey(0), ins)
        outs = fpn.apply(variables, ins)
        assert len(outs) == 4
        assert outs[0].shape == (1, 16, 24, 32)
        assert outs[3].shape == (1, 2, 3, 32)


class TestCostReg:
    def test_output_shape_and_train_stats(self):
        net = CostRegNet(in_channels=8, base=4)
        x = jnp.zeros((2, 4, 8, 12, 8))
        variables = net.init(jax.random.PRNGKey(0), x)
        # default norm is GroupNorm (scan-safe): no mutable batch stats
        out, mutated = net.apply(variables, x, train=True,
                                 mutable=["batch_stats"])
        assert out.shape == (2, 4, 8, 12, 2)
        assert mutated == {}
        # the reference-style BN variant does carry batch stats
        net_bn = CostRegNet(in_channels=8, base=4, norm="batch")
        variables_bn = net_bn.init(jax.random.PRNGKey(0), x)
        out_bn, mutated_bn = net_bn.apply(variables_bn, x, train=True,
                                          mutable=["batch_stats"])
        assert out_bn.shape == (2, 4, 8, 12, 2)
        assert "batch_stats" in mutated_bn
        out_eval = net.apply(variables, x, train=False)
        assert out_eval.shape == (2, 4, 8, 12, 2)


class TestNeck3D:
    def test_three_levels(self):
        neck = IndoorImVoxelNeck(in_channels=16, out_channels=8)
        x = jnp.zeros((1, 8, 8, 4, 16))
        variables = neck.init(jax.random.PRNGKey(0), x)
        outs = neck.apply(variables, x)
        assert len(outs) == 3
        assert outs[0].shape == (1, 8, 8, 4, 8)
        assert outs[1].shape == (1, 4, 4, 2, 8)
        assert outs[2].shape == (1, 2, 2, 1, 8)


def _tiny_head_cfg():
    return HeadConfig(n_classes=4, n_levels=2, n_channels=8,
                      pts_assign_threshold=4, pts_center_threshold=3,
                      max_boxes=4, nms_pre=32, max_detections=16)


def _head_inputs(cfg, rng):
    levels = [jnp.asarray(rng.rand(4, 4, 2, 8), jnp.float32),
              jnp.asarray(rng.rand(2, 2, 1, 8), jnp.float32)]
    return levels


class TestDetectionHead:
    def test_forward_shapes(self):
        cfg = _tiny_head_cfg()
        rng = np.random.RandomState(0)
        head = head_lib.DetectionHead(cfg)
        levels = _head_inputs(cfg, rng)
        variables = head.init(jax.random.PRNGKey(0), levels)
        outs = head.apply(variables, levels)
        assert len(outs) == 2
        c, r, k = outs[0]
        assert c.shape == (32, 1) and r.shape == (32, 6) and k.shape == (32, 4)
        assert np.all(np.asarray(r) > 0)  # exp-activated distances

    def test_loss_and_predict_run(self):
        cfg = _tiny_head_cfg()
        rng = np.random.RandomState(1)
        head = head_lib.DetectionHead(cfg)
        levels = _head_inputs(cfg, rng)
        variables = head.init(jax.random.PRNGKey(0), levels)
        outs = head.apply(variables, levels)
        pts = [jnp.asarray(rng.rand(32, 3) * 2, jnp.float32),
               jnp.asarray(rng.rand(4, 3) * 2, jnp.float32)]
        valid = [jnp.ones(32, bool), jnp.ones(4, bool)]
        gt_boxes = jnp.asarray(
            [[1.0, 1.0, 1.0, 1.5, 1.5, 1.5], [0.5, 0.5, 0.5, 1, 1, 1],
             [0, 0, 0, 0, 0, 0], [0, 0, 0, 0, 0, 0]], jnp.float32)
        gt_labels = jnp.asarray([1, 2, 0, 0])
        gt_mask = jnp.asarray([True, True, False, False])
        losses, aux = head_lib.head_loss(outs, pts, valid, gt_boxes,
                                         gt_labels, gt_mask, cfg)
        for v in losses.values():
            assert np.isfinite(float(v)) and float(v) >= 0
        pred = head_lib.head_predict(outs, pts, valid, cfg)
        assert pred["boxes"].shape == (16, 6)
        assert pred["mask"].dtype == bool

    def test_assignment_matches_reference_semantics(self):
        """Naive numpy transcription of _get_targets (nerfdet_head.py:473-562)."""
        cfg = _tiny_head_cfg()
        rng = np.random.RandomState(2)
        p1, p2 = 48, 12
        pts = np.concatenate([rng.rand(p1, 3) * 4, rng.rand(p2, 3) * 4])
        scales = np.concatenate([np.zeros(p1, int), np.ones(p2, int)])
        boxes = np.array([[2.0, 2.0, 2.0, 2.5, 2.5, 2.5],
                          [1.0, 1.0, 1.0, 1.2, 1.2, 1.2],
                          [3.0, 3.0, 3.0, 1.8, 1.8, 1.8]], np.float32)
        labels = np.array([0, 1, 2])
        n_b = 3

        c_t, b_t, l_t = head_lib.assign_targets(
            jnp.asarray(pts, jnp.float32), jnp.asarray(scales),
            jnp.asarray(np.pad(boxes, ((0, 1), (0, 0)))),
            jnp.asarray(np.pad(labels, (0, 1))),
            jnp.asarray([True] * 3 + [False]), cfg)
        c_t, b_t, l_t = map(np.asarray, (c_t, b_t, l_t))

        # ---- naive reference ----
        def fd_np(p, b):
            out = np.zeros((len(p), len(b), 6))
            for i, pt in enumerate(p):
                for j, bx in enumerate(b):
                    c, h = bx[:3], bx[3:6] / 2
                    lo, hi = pt - (c - h), (c + h) - pt
                    out[i, j] = [lo[0], hi[0], lo[1], hi[1], lo[2], hi[2]]
            return out

        fd = fd_np(pts, boxes)
        inside = fd.min(-1) > 0
        n_pos = np.stack([inside[scales == s].sum(0) for s in range(2)])
        lower = n_pos < cfg.pts_assign_threshold
        extra = np.arange(2, 0, -1)[:, None] * np.ones((2, n_b), int)
        lower_index = np.argmax(lower.astype(int) * extra, 0) - 1
        lower_index = np.maximum(lower_index, 0)
        all_upper = np.all(~lower, 0)
        best = np.where(all_upper, 1, lower_index)
        inside_best = best[None, :] == scales[:, None]

        def cness_np(f):
            xm = np.minimum(f[..., 0], f[..., 1]) / np.maximum(
                np.maximum(f[..., 0], f[..., 1]), 1e-12)
            ym = np.minimum(f[..., 2], f[..., 3]) / np.maximum(
                np.maximum(f[..., 2], f[..., 3]), 1e-12)
            zm = np.minimum(f[..., 4], f[..., 5]) / np.maximum(
                np.maximum(f[..., 4], f[..., 5]), 1e-12)
            return np.sqrt(np.maximum(xm * ym * zm, 0))

        cness = cness_np(fd)
        cness_m = np.where(inside & inside_best, cness, -1.0)
        kk = cfg.pts_center_threshold + 1
        thr = np.sort(cness_m, axis=0)[::-1][kk - 1]
        inside_top = cness_m > thr[None, :]
        vols = boxes[:, 3:6].prod(-1)
        volm = np.where(inside & inside_best & inside_top,
                        np.broadcast_to(vols, inside.shape), 1e8)
        min_inds = volm.argmin(1)
        min_vol = volm.min(1)
        want_labels = np.where(min_vol >= 1e8, -1, labels[min_inds])
        np.testing.assert_array_equal(l_t, want_labels)
        fd_sel = fd[np.arange(len(pts)), min_inds]
        np.testing.assert_allclose(c_t, cness_np(fd_sel), rtol=1e-4,
                                   atol=1e-5)
