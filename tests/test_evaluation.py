"""Evaluation metric tests (reference pattern: exact-value checks,
tests/test_evaluation/test_metrics/test_indoor_metric.py)."""

import numpy as np

from mvsdet_tpu.evaluation.indoor_eval import aligned_iou_numpy, indoor_map
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

    def test_depth_rmse_masked(self):
        gt = np.array([[1.0, 0.0], [2.0, 3.0]])
        pred = np.array([[1.5, 9.0], [2.0, 3.0]])
        # only gt>0 pixels count -> errors (0.5, 0, 0)
        assert abs(depth_rmse(pred, gt) - np.sqrt(0.25 / 3)) < 1e-9
