"""Evaluation metric tests (reference pattern: exact-value checks,
tests/test_evaluation/test_metrics/test_indoor_metric.py)."""

import numpy as np

from mvsdet_tpu.evaluation.indoor_eval import (aligned_iou_numpy, box_iou,
                                               indoor_map, rotated_iou_numpy)
from mvsdet_tpu.evaluation.nvs_metrics import depth_rmse, psnr, ssim


def _scene(boxes, labels, scores=None):
    out = {"boxes": np.asarray(boxes, np.float32),
           "labels": np.asarray(labels)}
    if scores is not None:
        out["scores"] = np.asarray(scores, np.float32)
    return out


class TestIndoorMap:
    def test_perfect_predictions_give_map_one(self):
        gt = [_scene([[0, 0, 0, 1, 1, 1], [3, 3, 0, 2, 1, 1]], [0, 1])]
        pred = [_scene([[0, 0, 0, 1, 1, 1], [3, 3, 0, 2, 1, 1]], [0, 1],
                       [0.9, 0.8])]
        out = indoor_map(pred, gt)
        assert out["mAP_0.25"] == 1.0
        assert out["mAP_0.50"] == 1.0
        assert out["mAR_0.25"] == 1.0

    def test_wrong_class_is_fp(self):
        gt = [_scene([[0, 0, 0, 1, 1, 1]], [0])]
        pred = [_scene([[0, 0, 0, 1, 1, 1]], [1], [0.9])]
        out = indoor_map(pred, gt)
        assert out["mAP_0.25"] == 0.0

    def test_duplicate_detection_is_fp(self):
        gt = [_scene([[0, 0, 0, 1, 1, 1]], [0])]
        pred = [_scene([[0, 0, 0, 1, 1, 1], [0.01, 0, 0, 1, 1, 1]],
                       [0, 0], [0.9, 0.8])]
        out = indoor_map(pred, gt)
        # AP stays 1 (TP found first), recall 1
        assert out["mAP_0.25"] == 1.0

    def test_missed_box_halves_recall(self):
        gt = [_scene([[0, 0, 0, 1, 1, 1], [5, 5, 5, 1, 1, 1]], [0, 0])]
        pred = [_scene([[0, 0, 0, 1, 1, 1]], [0], [0.9])]
        out = indoor_map(pred, gt)
        assert abs(out["mAR_0.25"] - 0.5) < 1e-6
        assert abs(out["mAP_0.25"] - 0.5) < 1e-6

    def test_iou_threshold_splits(self):
        gt = [_scene([[0, 0, 0, 1, 1, 1]], [0])]
        # box shifted by 0.5: IoU = 0.5/1.5 ~ 0.33 -> TP @0.25, FP @0.5
        pred = [_scene([[0.5, 0, 0, 1, 1, 1]], [0], [0.9])]
        iou = aligned_iou_numpy(np.asarray([[0.5, 0, 0, 1, 1, 1]], np.float32),
                                np.asarray([[0, 0, 0, 1, 1, 1]], np.float32))
        assert 0.25 < iou[0, 0] < 0.5
        out = indoor_map(pred, gt)
        assert out["mAP_0.25"] == 1.0
        assert out["mAP_0.50"] == 0.0


class TestRotatedIoU:
    """ARKit 7-dim box eval (ref indoor_eval.py with rotated overlaps)."""

    def test_identical_boxes_iou_one(self):
        b = np.array([[1, 2, 0.5, 2, 1, 1, 0.7]], np.float32)
        assert abs(rotated_iou_numpy(b, b)[0, 0] - 1.0) < 1e-5

    def test_45_degree_octagon_value(self):
        # unit cube vs itself rotated 45 deg about z: BEV intersection is
        # the regular octagon of area 2*(sqrt(2)-1); full z overlap
        a = np.array([[0, 0, 0, 1, 1, 1, 0.0]], np.float32)
        b = np.array([[0, 0, 0, 1, 1, 1, np.pi / 4]], np.float32)
        inter = 2 * (np.sqrt(2) - 1)
        expect = inter / (2 - inter)
        assert abs(rotated_iou_numpy(a, b)[0, 0] - expect) < 1e-4

    def test_yaw_invariant_to_joint_rotation(self):
        a = np.array([[0, 0, 0, 2, 1, 1, 0.0]], np.float32)
        b = np.array([[0.5, 0, 0, 2, 1, 1, 0.0]], np.float32)
        base = rotated_iou_numpy(a, b)[0, 0]
        for ang in (0.3, 1.1, 2.5):
            c, s = np.cos(ang), np.sin(ang)
            rot = np.array([[c, -s], [s, c]])

            def spin(x):
                y = x.copy()
                y[:, :2] = x[:, :2] @ rot.T
                y[:, 6] += ang
                return y

            assert abs(rotated_iou_numpy(spin(a), spin(b))[0, 0]
                       - base) < 1e-4

    def test_disjoint_z_is_zero(self):
        a = np.array([[0, 0, 0, 1, 1, 1, 0.3]], np.float32)
        b = np.array([[0, 0, 5, 1, 1, 1, 0.3]], np.float32)
        assert rotated_iou_numpy(a, b)[0, 0] == 0.0

    def test_matches_sampled_iou(self):
        from mvsdet_tpu.ops.nms import rotated_iou_bev_sampled

        rng = np.random.RandomState(0)
        a = np.concatenate([rng.uniform(-1, 1, (12, 3)),
                            rng.uniform(0.5, 2.0, (12, 3)),
                            rng.uniform(-np.pi, np.pi, (12, 1))],
                           -1).astype(np.float32)
        b = np.concatenate([rng.uniform(-1, 1, (10, 3)),
                            rng.uniform(0.5, 2.0, (10, 3)),
                            rng.uniform(-np.pi, np.pi, (10, 1))],
                           -1).astype(np.float32)
        exact = rotated_iou_numpy(a, b)
        sampled = np.asarray(rotated_iou_bev_sampled(a, b, grid=64))
        assert np.max(np.abs(exact - sampled)) < 0.05

    def test_box_iou_dispatch_zero_yaw_matches_aligned(self):
        rng = np.random.RandomState(1)
        a6 = np.concatenate([rng.uniform(-1, 1, (5, 3)),
                             rng.uniform(0.5, 2.0, (5, 3))],
                            -1).astype(np.float32)
        b7 = np.concatenate([a6, np.zeros((5, 1), np.float32)], -1)
        np.testing.assert_allclose(box_iou(a6, b7), aligned_iou_numpy(a6, a6),
                                   atol=1e-5)

    def test_indoor_map_rotated_perfect_is_one(self):
        gt = [_scene([[0, 0, 0, 1, 1, 1, 0.5], [3, 3, 0, 2, 1, 1, -0.9]],
                     [0, 1])]
        pred = [_scene([[0, 0, 0, 1, 1, 1, 0.5], [3, 3, 0, 2, 1, 1, -0.9]],
                       [0, 1], [0.9, 0.8])]
        out = indoor_map(pred, gt)
        assert out["mAP_0.25"] == 1.0
        assert out["mAP_0.50"] == 1.0

    def test_indoor_map_rotated_yaw_miss_is_fp_at_05(self):
        # pi/4 yaw error on a long thin box: IoU well below 0.5
        gt = [_scene([[0, 0, 0, 4, 0.5, 1, 0.0]], [0])]
        pred = [_scene([[0, 0, 0, 4, 0.5, 1, np.pi / 4]], [0], [0.9])]
        iou = rotated_iou_numpy(
            np.asarray(pred[0]["boxes"], np.float32),
            np.asarray(gt[0]["boxes"], np.float32))[0, 0]
        assert iou < 0.5
        out = indoor_map(pred, gt)
        assert out["mAP_0.50"] == 0.0


class TestNVSMetrics:
    def test_psnr_identical_infinite(self):
        img = np.random.rand(16, 16, 3)
        assert psnr(img, img) == float("inf")

    def test_psnr_known_value(self):
        a = np.zeros((8, 8))
        b = np.full((8, 8), 0.1)
        assert abs(psnr(a, b) - 20.0) < 1e-6  # 10*log10(1/0.01)

    def test_ssim_identical_is_one(self):
        img = np.random.rand(32, 32, 3)
        assert abs(ssim(img, img) - 1.0) < 1e-9

    def test_ssim_noise_lowers(self):
        rng = np.random.RandomState(0)
        img = rng.rand(32, 32, 3)
        noisy = np.clip(img + rng.randn(32, 32, 3) * 0.2, 0, 1)
        assert ssim(img, noisy) < 0.9

    def test_ssim_matches_skimage_default_oracle(self):
        """ssim == the reference's skimage structural_similarity formula.

        The oracle is the skimage default algorithm re-typed literally
        (scipy uniform_filter, crop pad, sample covariance) from
        skimage.metrics._structural_similarity — the exact call the
        reference makes (save_rendered_img.py:42-44: channel_axis=-1,
        data_range=1 on float images); skimage itself is not installed
        in this container.
        """
        from scipy.ndimage import uniform_filter

        def skimage_oracle(im1, im2, data_range=1.0, win_size=7):
            chans = []
            for c in range(im1.shape[-1]):
                x = im1[..., c].astype(np.float64)
                y = im2[..., c].astype(np.float64)
                np_ = win_size**2
                cov_norm = np_ / (np_ - 1)
                ux = uniform_filter(x, size=win_size)
                uy = uniform_filter(y, size=win_size)
                uxx = uniform_filter(x * x, size=win_size)
                uyy = uniform_filter(y * y, size=win_size)
                uxy = uniform_filter(x * y, size=win_size)
                vx = cov_norm * (uxx - ux * ux)
                vy = cov_norm * (uyy - uy * uy)
                vxy = cov_norm * (uxy - ux * uy)
                r = data_range
                c1, c2 = (0.01 * r) ** 2, (0.03 * r) ** 2
                a1, a2 = 2 * ux * uy + c1, 2 * vxy + c2
                b1, b2 = ux**2 + uy**2 + c1, vx + vy + c2
                s = (a1 * a2) / (b1 * b2)
                pad = (win_size - 1) // 2
                chans.append(s[pad:-pad, pad:-pad].mean())
            return float(np.mean(chans))

        rng = np.random.RandomState(3)
        for shape in [(24, 31, 3), (120, 160, 3)]:
            a = rng.rand(*shape)
            b = np.clip(a + rng.randn(*shape) * 0.15, 0, 1)
            golden = skimage_oracle(a, b)
            assert abs(ssim(a, b) - golden) < 1e-10, (
                f"ssim deviates from skimage formula at {shape}")
        # data_range propagates into C1/C2
        a255 = a * 255
        b255 = b * 255
        golden = skimage_oracle(a255, b255, data_range=255.0)
        assert abs(ssim(a255, b255, data_range=255.0) - golden) < 1e-10

    def test_depth_rmse_masked(self):
        gt = np.array([[1.0, 0.0], [2.0, 3.0]])
        pred = np.array([[1.5, 9.0], [2.0, 3.0]])
        # only gt>0 pixels count -> errors (0.5, 0, 0)
        assert abs(depth_rmse(pred, gt) - np.sqrt(0.25 / 3)) < 1e-9
