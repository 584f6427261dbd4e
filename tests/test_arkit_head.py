"""Tests for the ARKit (yaw) detection-head path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsdet_tpu.config import HeadConfig
from mvsdet_tpu.models import head as head_lib


def _cfg():
    return HeadConfig(n_classes=4, n_levels=2, n_channels=8, n_reg_outs=7,
                      with_yaw=True, pts_assign_threshold=4,
                      pts_center_threshold=3, max_boxes=4, nms_pre=32,
                      max_detections=16)


class TestRotatedGeometry:
    def test_rotate_z_quarter_turn(self):
        p = jnp.asarray([[1.0, 0.0, 2.0]])
        out = np.asarray(head_lib.rotate_z(p, jnp.pi / 2))
        np.testing.assert_allclose(out[0], [0, 1, 2], atol=1e-6)

    def test_decode_zero_yaw_matches_aligned(self):
        pts = jnp.asarray([[1.0, 2.0, 3.0]])
        pred = jnp.asarray([[0.5, 0.5, 0.2, 0.2, 0.1, 0.1, 0.0]])
        out = np.asarray(head_lib.decode_bbox_rotated(pts, pred))[0]
        np.testing.assert_allclose(out, [1, 2, 3, 1.0, 0.4, 0.2, 0],
                                   atol=1e-6)

    def test_decode_asymmetric_shifts_center_in_box_frame(self):
        pts = jnp.asarray([[0.0, 0.0, 0.0]])
        # dx_min=1, dx_max=0 -> local shift (-0.5, 0, 0); yaw=pi/2 rotates
        # it to (0, -0.5, 0)
        pred = jnp.asarray([[1.0, 0.0, 0.5, 0.5, 0.5, 0.5, np.pi / 2]])
        out = np.asarray(head_lib.decode_bbox_rotated(pts, pred))[0]
        np.testing.assert_allclose(out[:3], [0, -0.5, 0], atol=1e-6)

    def test_corners_of_rotated_box(self):
        b = jnp.asarray([[0.0, 0, 0, 2, 1, 1, np.pi / 2]])
        corners = np.asarray(head_lib.box7_corners(b))[0]
        assert corners.shape == (8, 3)
        # after 90deg rotation the x-extent comes from dy=1
        assert abs(corners[:, 0].max() - 0.5) < 1e-5
        assert abs(corners[:, 1].max() - 1.0) < 1e-5


class TestRotatedAssignAndLoss:
    def _points(self, rng):
        pts = [jnp.asarray(rng.rand(40, 3) * 4 - 2, jnp.float32),
               jnp.asarray(rng.rand(10, 3) * 4 - 2, jnp.float32)]
        return pts

    def test_assignment_respects_rotation(self):
        cfg = _cfg()
        # a long thin box rotated 90deg: points along y inside, along x not
        boxes = jnp.asarray([[0, 0, 0, 3.0, 0.4, 1.0, np.pi / 2]],
                            jnp.float32)
        boxes = jnp.concatenate([boxes, jnp.zeros((3, 7))])
        labels = jnp.asarray([2, 0, 0, 0])
        mask = jnp.asarray([True, False, False, False])
        pts = jnp.asarray([[0.0, 1.2, 0.0], [1.2, 0.0, 0.0]], jnp.float32)
        scales = jnp.asarray([0, 0])
        c_t, b_t, l_t = head_lib.assign_targets_rotated(
            pts, scales, boxes, labels, mask, cfg)
        l_t = np.asarray(l_t)
        assert l_t[0] == 2   # inside the rotated box
        assert l_t[1] == -1  # outside

    def test_loss_and_predict_run(self):
        cfg = _cfg()
        rng = np.random.RandomState(0)
        head = head_lib.DetectionHead(cfg)
        levels = [jnp.asarray(rng.rand(4, 4, 2, 8), jnp.float32),
                  jnp.asarray(rng.rand(2, 2, 1, 8), jnp.float32)]
        variables = head.init(jax.random.PRNGKey(0), levels)
        outs = head.apply(variables, levels)
        assert outs[0][1].shape[-1] == 7
        # yaw channel is linear (can be negative), distances positive
        reg = np.asarray(outs[0][1])
        assert np.all(reg[:, :6] > 0)

        pts = [jnp.asarray(rng.rand(32, 3) * 2, jnp.float32),
               jnp.asarray(rng.rand(4, 3) * 2, jnp.float32)]
        valid = [jnp.ones(32, bool), jnp.ones(4, bool)]
        boxes = jnp.asarray([[1, 1, 1, 1.5, 1.0, 1.0, 0.3],
                             [0.5, 0.5, 0.5, 1, 1, 1, -0.2],
                             [0, 0, 0, 0, 0, 0, 0],
                             [0, 0, 0, 0, 0, 0, 0]], jnp.float32)
        labels = jnp.asarray([1, 2, 0, 0])
        mask = jnp.asarray([True, True, False, False])
        losses, aux = head_lib.head_loss_rotated(
            outs, pts, valid, boxes, labels, mask, cfg)
        for v in losses.values():
            assert np.isfinite(float(v)) and float(v) >= 0
        pred = head_lib.head_predict_rotated(outs, pts, valid, cfg)
        assert pred["boxes"].shape == (16, 7)
        assert pred["mask"].dtype == bool

    def test_rotated_loss_differentiable(self):
        cfg = _cfg()
        rng = np.random.RandomState(1)
        head = head_lib.DetectionHead(cfg)
        levels = [jnp.asarray(rng.rand(4, 4, 2, 8), jnp.float32),
                  jnp.asarray(rng.rand(2, 2, 1, 8), jnp.float32)]
        variables = head.init(jax.random.PRNGKey(0), levels)
        pts = [jnp.asarray(rng.rand(32, 3) * 2, jnp.float32),
               jnp.asarray(rng.rand(4, 3) * 2, jnp.float32)]
        valid = [jnp.ones(32, bool), jnp.ones(4, bool)]
        boxes = jnp.asarray([[1, 1, 1, 1.5, 1.0, 1.0, 0.3]] * 4, jnp.float32)
        labels = jnp.asarray([1, 1, 1, 1])
        mask = jnp.asarray([True, False, False, False])

        def loss_fn(params):
            outs = head.apply({"params": params}, levels)
            losses, _ = head_lib.head_loss_rotated(outs, pts, valid, boxes,
                                                   labels, mask, cfg)
            return sum(losses.values())

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
