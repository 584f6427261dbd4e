"""Torch-golden parity, stage 2: the last unverified core stages.

Closes the round-4 parity gaps (VERDICT missing-1/2/6):

  * `backproject_Weigh` (ref: projects/NeRF-Det/nerfdet/mvsdet.py:1372-1492)
    re-typed in torch (debug branches stripped) vs
    `mvsdet_tpu.ops.voxel_lift.lift_features_to_voxels` + `finalize_volume`
    — the subtlest detector stage, and the one where a real-TPU
    miscompile was found in round 4.
  * The ACTUAL `GaussianAdapter` (ref: gs_src/model/encoder/common/
    gaussian_adapter.py:32-119) imported with `sh_rotation` stubbed to
    the identity (exact for identity rotations at any degree, and for
    any rotation at degree 0; the repo's own SH rotation is
    property-tested separately in tests/test_geometry.py) vs
    `mvsdet_tpu.models.gaussian_head.adapt_gaussians`.
  * The ACTUAL `indoor_eval` greedy AP (ref: mmdet3d/evaluation/
    functional/indoor_eval.py:8-302) imported with `mmengine.logging`
    and `terminaltables` stubbed, vs
    `mvsdet_tpu.evaluation.indoor_eval.indoor_map`.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

REF_ROOT = "/root/reference"
GS = f"{REF_ROOT}/gs_src"


def _load_module(dotted: str, path: str):
    spec = importlib.util.spec_from_file_location(dotted, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    spec.loader.exec_module(mod)
    return mod


# ---------------------------------------------------------------------------
# backproject_Weigh — reference math re-typed in torch (mvsdet.py:1372-1492,
# debug/GT-depth branches stripped; they only produce diagnostics)
# ---------------------------------------------------------------------------

def _ref_backproject_weigh(features, points, projection, depth,
                           voxel_size_z, prob):
    """Faithful re-type of the reference voxel lift.

    features: (n_img, C, h, w); points: (3, nx, ny, nz);
    projection: (n_img, 3, 4); depth/prob: (n_img, h, w, K).
    Returns (volume (n_img, C, nx, ny, nz), valid (n_img, 1, nx, ny, nz)).
    """
    n_images, n_channels, height, width = features.shape
    n_x, n_y, n_z = points.shape[-3:]
    n_vox = n_x * n_y * n_z
    pts = points.reshape(1, 3, -1).expand(n_images, 3, -1)
    pts = torch.cat((pts, torch.ones_like(pts[:, :1])), dim=1)
    points_2d_3 = torch.bmm(projection, pts)                    # :1386

    x = (points_2d_3[:, 0] / points_2d_3[:, 2]).round().long()  # :1388
    y = (points_2d_3[:, 1] / points_2d_3[:, 2]).round().long()
    z = points_2d_3[:, 2]
    valid = (x >= 0) & (y >= 0) & (x < width) & (y < height) & (z > 0)

    depth = depth.reshape(n_images, height, width, -1)          # :1394
    prob_norm = prob.clone().reshape(n_images, height, width, -1)
    prob_norm /= prob_norm.sum(dim=-1, keepdim=True)            # :1396

    prob_volume = []
    for i in range(n_images):                                   # :1401
        per_img_prob = []
        final_mask = None
        for j in range(depth.shape[-1]):                        # :1403
            cur_depth = depth[:, :, :, j]
            cur_mask = valid.clone()
            cur_mask[i, valid[i]] = \
                (z[i, valid[i]] > cur_depth[i, y[i, valid[i]],
                                            x[i, valid[i]]] - voxel_size_z) & \
                (z[i, valid[i]] < cur_depth[i, y[i, valid[i]],
                                            x[i, valid[i]]] + voxel_size_z)
            cur_prob = torch.zeros((1, n_vox))
            cur_prob[:, cur_mask[i]] = prob_norm[i, y[i, cur_mask[i]],
                                                 x[i, cur_mask[i]], j]
            per_img_prob.append(cur_prob)
            final_mask = cur_mask if j == 0 else (final_mask | cur_mask)
        per_img_prob = torch.cat(per_img_prob, dim=0)
        per_img_prob = torch.max(per_img_prob, dim=0, keepdim=True)[0]  # :1422
        prob_volume.append(per_img_prob)
        valid = valid & final_mask                              # :1427
    prob_volume = torch.stack(prob_volume, dim=0)               # :1430

    volume = torch.zeros((n_images, n_channels, n_vox))
    for i in range(n_images):                                   # :1458
        volume[i, :, valid[i]] = features[i, :, y[i, valid[i]], x[i, valid[i]]]
        volume[i] *= prob_volume[i]
    volume = volume.reshape(n_images, n_channels, n_x, n_y, n_z)
    valid = valid.reshape(n_images, 1, n_x, n_y, n_z)
    return volume, valid


def _look_at_w2c(eye, target, up=(0.0, 1.0, 0.0)):
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, np.asarray(up, np.float64))
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return np.linalg.inv(c2w).astype(np.float32)


def _lift_scene(rng, n_views, c, h, w, grid, n_hyp=3, per_view_k=False):
    """A plausible lift workload: a voxel box watched by cameras behind it."""
    nx, ny, nz = grid
    voxel_size = np.array([0.16, 0.16, 0.2], np.float32)
    origin = np.array([0.0, 0.0, 1.5], np.float32)
    idx = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                               indexing="ij")).astype(np.float32)
    new_origin = origin - np.array(grid, np.float32) / 2.0 * voxel_size
    points = idx * voxel_size.reshape(3, 1, 1, 1) + new_origin.reshape(3, 1, 1, 1)

    projs = []
    for _ in range(n_views):
        eye = np.array([rng.uniform(-1.5, 1.5), rng.uniform(-1.5, 1.5),
                        rng.uniform(-2.5, -1.5)])
        target = origin + rng.uniform(-0.3, 0.3, 3)
        w2c = _look_at_w2c(eye, target)
        fx = (rng.uniform(0.7, 1.3) if per_view_k else 0.9) * w
        fy = (rng.uniform(0.7, 1.3) if per_view_k else 0.9) * h
        k = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float32)
        projs.append(k @ w2c[:3])
    projection = np.stack(projs).astype(np.float32)

    features = rng.standard_normal((n_views, c, h, w)).astype(np.float32)
    est_depth = rng.uniform(1.0, 6.0, (n_views, h, w, n_hyp)).astype(np.float32)
    est_prob = rng.uniform(0.05, 1.0, (n_views, h, w, n_hyp)).astype(np.float32)
    return features, points, projection, est_depth, est_prob, float(voxel_size[-1])


def _lift_parity(n_views, c, h, w, grid, seed, per_view_k=False):
    from mvsdet_tpu.ops.voxel_lift import (finalize_volume,
                                           lift_features_to_voxels)

    rng = np.random.default_rng(seed)
    features, points, projection, est_depth, est_prob, vz = _lift_scene(
        rng, n_views, c, h, w, grid, per_view_k=per_view_k)

    with torch.no_grad():
        vol_t, valid_t = _ref_backproject_weigh(
            torch.from_numpy(features), torch.from_numpy(points),
            torch.from_numpy(projection), torch.from_numpy(est_depth),
            vz, torch.from_numpy(est_prob))
    # reference aggregation (mvsdet.py:511-515)
    vol_sum_ref = vol_t.sum(dim=0).numpy()                      # (C, nx, ny, nz)
    cnt_ref = valid_t.sum(dim=0).numpy()[0]                     # (nx, ny, nz)
    mean_ref = vol_sum_ref / (cnt_ref[None] + 1e-8)
    mean_ref[:, cnt_ref == 0] = 0.0

    points_vc = jnp.asarray(points.reshape(3, -1).T)            # (V, 3)
    vol, cnt = lift_features_to_voxels(
        jnp.asarray(features.transpose(0, 2, 3, 1)),
        jnp.asarray(projection), jnp.asarray(est_depth),
        jnp.asarray(est_prob), points_vc, vz)

    cnt_ours = np.asarray(cnt).reshape(grid)
    np.testing.assert_array_equal(cnt_ours, cnt_ref.astype(np.float32),
                                  err_msg="per-voxel valid view counts differ")
    assert cnt_ref.sum() > 0, "degenerate scene: no voxel seen by any view"

    vol_ours = np.asarray(vol).T.reshape((c,) + tuple(grid))
    err = np.max(np.abs(vol_ours - vol_sum_ref))
    assert err <= 1e-4, f"volume sum max abs err {err:.2e}"

    mean_ours = np.asarray(
        finalize_volume(vol, cnt)).T.reshape((c,) + tuple(grid))
    err = np.max(np.abs(mean_ours - mean_ref))
    assert err <= 1e-4, f"volume mean max abs err {err:.2e}"


def test_backproject_weigh_parity_small():
    _lift_parity(n_views=6, c=16, h=30, w=40, grid=(12, 12, 8), seed=0)


def test_backproject_weigh_parity_per_view_k():
    """ARKit-style per-view intrinsics enter the lift via the projections."""
    _lift_parity(n_views=5, c=8, h=24, w=32, grid=(10, 10, 6), seed=1,
                 per_view_k=True)


@pytest.mark.slow
def test_backproject_weigh_parity_scannet_shape():
    """Full ScanNet voxel grid (40x40x16) and feature size (60x80)."""
    _lift_parity(n_views=8, c=32, h=60, w=80, grid=(40, 40, 16), seed=2)


# ---------------------------------------------------------------------------
# GaussianAdapter — the actual reference module, sh_rotation stubbed
# ---------------------------------------------------------------------------

def _load_ref_adapter():
    name = "refgs.model.encoder.common.gaussian_adapter"
    if name in sys.modules:
        return sys.modules[name]
    for pkg_name, path in [
        ("refgs", GS),
        ("refgs.geometry", f"{GS}/geometry"),
        ("refgs.misc", f"{GS}/misc"),
        ("refgs.model", f"{GS}/model"),
        ("refgs.model.encoder", f"{GS}/model/encoder"),
        ("refgs.model.encoder.common", f"{GS}/model/encoder/common"),
    ]:
        pkg = types.ModuleType(pkg_name)
        pkg.__path__ = [path]
        sys.modules[pkg_name] = pkg
    _load_module("refgs.geometry.projection", f"{GS}/geometry/projection.py")

    # e3nn is absent in this container; stub rotate_sh with the identity.
    # Exact whenever the rotation is identity (any degree) or the degree
    # is 0 (wigner_D(0) == 1); the tests below only use those regimes.
    stub = types.ModuleType("refgs.misc.sh_rotation")

    def rotate_sh(sh_coefficients, rotations):
        shape = torch.broadcast_shapes(sh_coefficients.shape[:-1],
                                       rotations.shape[:-2])
        return sh_coefficients.broadcast_to(
            shape + sh_coefficients.shape[-1:]).clone()

    stub.rotate_sh = rotate_sh
    sys.modules["refgs.misc.sh_rotation"] = stub

    _load_module("refgs.model.encoder.common.gaussians",
                 f"{GS}/model/encoder/common/gaussians.py")
    return _load_module(name, f"{GS}/model/encoder/common/gaussian_adapter.py")


try:
    _ADAPTER_OK = bool(_load_ref_adapter())
except Exception:  # pragma: no cover - reference checkout absent
    _ADAPTER_OK = False

needs_adapter = pytest.mark.skipif(
    not _ADAPTER_OK, reason="reference gaussian_adapter not importable")


def _random_c2w(rng, n, identity_rotation):
    c2w = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        if not identity_rotation:
            a, b, g = rng.uniform(-np.pi, np.pi, 3)

            def rz(t):
                c, s = np.cos(t), np.sin(t)
                return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

            def ry(t):
                c, s = np.cos(t), np.sin(t)
                return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

            c2w[i, :3, :3] = (rz(a) @ ry(b) @ rz(g)).astype(np.float32)
        c2w[i, :3, 3] = rng.uniform(-2, 2, 3).astype(np.float32)
    return c2w


def _adapter_parity(sh_degree, identity_rotation, seed, atol=2e-5):
    ga = _load_ref_adapter()
    from mvsdet_tpu.config import GaussianAdapterConfig
    from mvsdet_tpu.models.gaussian_head import adapt_gaussians

    rng = np.random.default_rng(seed)
    v, r = 3, 17
    h, w = 30, 40
    d_sh = (sh_degree + 1) ** 2
    d_in = 7 + 3 * d_sh

    c2w = _random_c2w(rng, v, identity_rotation)
    intr = np.tile(np.eye(3, dtype=np.float32), (v, 1, 1))
    for i in range(v):
        intr[i, 0, 0] = rng.uniform(0.8, 1.2)
        intr[i, 1, 1] = rng.uniform(0.8, 1.2)
        intr[i, 0, 2] = rng.uniform(0.45, 0.55)
        intr[i, 1, 2] = rng.uniform(0.45, 0.55)
    coords = rng.uniform(0.05, 0.95, (v, r, 2)).astype(np.float32)
    depths = rng.uniform(0.8, 4.0, (v, r)).astype(np.float32)
    opac = rng.uniform(0.1, 1.0, (v, r)).astype(np.float32)
    raw = rng.standard_normal((v, r, d_in)).astype(np.float32)

    cfg_t = ga.GaussianAdapterCfg(gaussian_scale_min=0.5,
                                  gaussian_scale_max=15.0,
                                  sh_degree=sh_degree)
    adapter = ga.GaussianAdapter(cfg_t)
    with torch.no_grad():
        # per-view tensors get a singleton per-gaussian dim, matching the
        # broadcast layout at the reference call site (mvsdet.py:586-600)
        golden = adapter(
            torch.from_numpy(c2w)[:, None], torch.from_numpy(intr)[:, None],
            torch.from_numpy(coords), torch.from_numpy(depths),
            torch.from_numpy(opac), torch.from_numpy(raw),
            image_shape=(h, w))

    cfg_j = GaussianAdapterConfig(gaussian_scale_min=0.5,
                                  gaussian_scale_max=15.0,
                                  sh_degree=sh_degree)
    ours = adapt_gaussians(
        jnp.asarray(c2w), jnp.asarray(intr), jnp.asarray(coords),
        jnp.asarray(depths), jnp.asarray(opac), jnp.asarray(raw),
        (h, w), cfg_j)

    for key, ref_val in (("means", golden.means),
                         ("covariances", golden.covariances),
                         ("harmonics", golden.harmonics),
                         ("opacities", golden.opacities)):
        ours_val = np.asarray(getattr(ours, key))
        ref_np = ref_val.numpy()
        assert ours_val.shape == ref_np.shape, (
            f"{key}: shape {ours_val.shape} vs ref {ref_np.shape}")
        err = np.max(np.abs(ours_val - ref_np))
        assert err <= atol, f"{key}: max abs err {err:.2e} > {atol}"


@needs_adapter
def test_gaussian_adapter_parity_identity_rotation_deg2():
    """Identity camera rotation, SH degree 2: scale-range, intrinsic
    multiplier, quaternion->covariance, SH mask, means (all but the
    rotation-to-world paths) vs the actual reference adapter."""
    _adapter_parity(sh_degree=2, identity_rotation=True, seed=3)


@needs_adapter
def test_gaussian_adapter_parity_full_rotation_deg0():
    """Full camera rotations, SH degree 0 (identity SH rotation is
    exact): exercises covariance world-rotation and ray-based means."""
    _adapter_parity(sh_degree=0, identity_rotation=False, seed=4)


# ---------------------------------------------------------------------------
# indoor_eval — the actual reference AP function, two modules stubbed
# ---------------------------------------------------------------------------

def _load_ref_indoor_eval():
    name = "ref_indoor_eval"
    if name in sys.modules:
        return sys.modules[name]
    logging_stub = types.ModuleType("mmengine.logging")
    logging_stub.print_log = lambda *a, **k: None
    mmengine_stub = types.ModuleType("mmengine")
    mmengine_stub.logging = logging_stub
    sys.modules.setdefault("mmengine", mmengine_stub)
    sys.modules["mmengine.logging"] = logging_stub

    tt_stub = types.ModuleType("terminaltables")

    class AsciiTable:
        def __init__(self, *a, **k):
            self.table = ""
            self.inner_footing_row_border = False

    tt_stub.AsciiTable = AsciiTable
    sys.modules["terminaltables"] = tt_stub
    return _load_module(
        name, f"{REF_ROOT}/mmdet3d/evaluation/functional/indoor_eval.py")


try:
    _INDOOR_OK = bool(_load_ref_indoor_eval())
except Exception:  # pragma: no cover
    _INDOOR_OK = False

needs_indoor = pytest.mark.skipif(
    not _INDOOR_OK, reason="reference indoor_eval not importable")


class _AlignedBoxes:
    """Minimal DepthInstance3DBoxes stand-in for the aligned protocol:
    (cx, cy, cz, dx, dy, dz, yaw=0) rows; overlaps = exact axis-aligned
    IoU (the reference's overlaps for with_yaw=False boxes)."""

    def __init__(self, tensor):
        self.tensor = torch.as_tensor(tensor, dtype=torch.float32).reshape(-1, 7)

    def __len__(self):
        return self.tensor.shape[0]

    def __getitem__(self, i):
        return _AlignedBoxes(self.tensor[i])

    def new_box(self, tensor):
        return _AlignedBoxes(tensor)

    def convert_to(self, mode):
        return self

    @staticmethod
    def overlaps(a, b):
        from mvsdet_tpu.evaluation.indoor_eval import aligned_iou_numpy
        return aligned_iou_numpy(a.tensor.numpy()[:, :6],
                                 b.tensor.numpy()[:, :6])


def _random_eval_case(rng, n_scenes=4, n_classes=5):
    gt_annos, dt_annos = [], []
    preds_mine, gts_mine = [], []
    for _ in range(n_scenes):
        n_gt = int(rng.integers(2, 8))
        centers = rng.uniform(-3, 3, (n_gt, 3)).astype(np.float32)
        sizes = rng.uniform(0.4, 1.8, (n_gt, 3)).astype(np.float32)
        gt_boxes = np.concatenate([centers, sizes], -1)
        gt_labels = rng.integers(0, n_classes, n_gt)

        # predictions: jittered GT (some good, some poor) + pure noise
        rows, scores, labels = [], [], []
        for b, l in zip(gt_boxes, gt_labels):
            for _ in range(int(rng.integers(0, 3))):
                jit = b + rng.normal(0, rng.choice([0.03, 0.4]), 6)
                rows.append(jit)
                scores.append(rng.uniform(0.05, 1.0))
                labels.append(l if rng.uniform() < 0.8
                              else rng.integers(0, n_classes))
        for _ in range(int(rng.integers(1, 4))):
            c = rng.uniform(-3, 3, 3)
            s = rng.uniform(0.4, 1.8, 3)
            rows.append(np.concatenate([c, s]))
            scores.append(rng.uniform(0.05, 1.0))
            labels.append(rng.integers(0, n_classes))
        pred_boxes = np.asarray(rows, np.float32).reshape(-1, 6)
        scores = np.asarray(scores, np.float32)
        labels = np.asarray(labels, np.int64)

        pad = np.zeros((len(pred_boxes), 1), np.float32)
        dt_annos.append({
            "labels_3d": torch.from_numpy(labels),
            "bboxes_3d": _AlignedBoxes(np.concatenate([pred_boxes, pad], -1)),
            "scores_3d": torch.from_numpy(scores),
        })
        gt_pad = np.zeros((n_gt, 1), np.float32)
        gt_annos.append({
            "gt_bboxes_3d": _AlignedBoxes(np.concatenate([gt_boxes, gt_pad], -1)),
            "gt_labels_3d": gt_labels,
        })
        preds_mine.append({"boxes": pred_boxes, "scores": scores,
                           "labels": labels})
        gts_mine.append({"boxes": gt_boxes, "labels": gt_labels})
    return gt_annos, dt_annos, preds_mine, gts_mine


@needs_indoor
def test_indoor_eval_ap_parity():
    """indoor_map == the reference's greedy AP on random multi-scene sets."""
    ref = _load_ref_indoor_eval()
    from mvsdet_tpu.evaluation.indoor_eval import indoor_map

    n_classes = 5
    label2cat = {i: f"c{i}" for i in range(n_classes)}
    for seed in range(4):
        rng = np.random.default_rng(100 + seed)
        gt_annos, dt_annos, preds, gts = _random_eval_case(
            rng, n_classes=n_classes)

        golden = ref.indoor_eval(gt_annos, dt_annos, [0.25, 0.5],
                                 label2cat, box_mode_3d=None)
        ours = indoor_map(preds, gts, (0.25, 0.5), num_classes=n_classes)

        for thr in (0.25, 0.5):
            np.testing.assert_allclose(
                ours[f"mAP_{thr:.2f}"], golden[f"mAP_{thr:.2f}"], atol=1e-6,
                err_msg=f"mAP@{thr} mismatch seed {seed}")
            np.testing.assert_allclose(
                ours[f"mAR_{thr:.2f}"], golden[f"mAR_{thr:.2f}"], atol=1e-6,
                err_msg=f"mAR@{thr} mismatch seed {seed}")
            for cls in range(n_classes):
                key_ref = f"c{cls}_AP_{thr:.2f}"
                key_ours = f"AP_{cls}_{thr:.2f}"
                if key_ref in golden and key_ours in ours:
                    np.testing.assert_allclose(
                        ours[key_ours], golden[key_ref], atol=1e-6,
                        err_msg=f"AP class {cls}@{thr} seed {seed}")
                else:
                    assert (key_ref in golden) == (key_ours in ours), (
                        f"class {cls}@{thr}: present in one impl only")
