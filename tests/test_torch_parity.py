"""Torch-golden parity: our JAX re-implementation vs the reference's torch code.

The reference's hot modules are pure torch and import cleanly with the
CPU torch in this container, so we can check numerical agreement against
the *actual* reference math instead of internal oracles:

  * `homo_warping` (ref: projects/NeRF-Det/nerfdet/mvs_models/module.py:105-146)
    vs `mvsdet_tpu.ops.plane_sweep.homography_warp` — exact (<=1e-4) in
    torch-compat mode; the default (corrected align_corners) path is
    asserted to differ only by the documented sub-pixel skew.
  * `CostRegNet_3DGS` (ref: mvs_models/mvsnet.py:73-113) in eval mode vs
    `mvsdet_tpu.models.cost_reg.CostRegNet(norm='batch')` with ported
    weights — <=1e-4 at ScanNet shapes.
  * `_get_targets` FCOS-3D assignment (ref: nerfdet_head.py:473-562) and
    `aligned_3d_nms` (ref: nerfdet_head.py:581-629), re-typed in
    torch/numpy here from the reference's published math, vs
    `assign_targets` / `aligned_3d_nms`.

The reference head file itself imports mmdet3d (not installed), which is
why the assignment/NMS math is re-typed rather than imported.
"""

from __future__ import annotations

import importlib.util
import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF_MVS = "/root/reference/projects/NeRF-Det/nerfdet/mvs_models"


def _load_ref_mvs():
    """Import the reference's pure-torch mvs_models as a standalone package."""
    if "refmvs.mvsnet" in sys.modules:
        return sys.modules["refmvs.module"], sys.modules["refmvs.mvsnet"]
    pkg = types.ModuleType("refmvs")
    pkg.__path__ = [REF_MVS]
    sys.modules["refmvs"] = pkg
    mods = {}
    for name in ("module", "mvsnet"):
        spec = importlib.util.spec_from_file_location(
            f"refmvs.{name}", f"{REF_MVS}/{name}.py")
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmvs.{name}"] = mod
        spec.loader.exec_module(mod)
        mods[name] = mod
    return mods["module"], mods["mvsnet"]


try:
    _REF_AVAILABLE = bool(_load_ref_mvs())
except Exception:  # pragma: no cover - reference checkout absent
    _REF_AVAILABLE = False

needs_ref = pytest.mark.skipif(
    not _REF_AVAILABLE, reason="reference torch modules not importable")


# ---------------------------------------------------------------------------
# plane sweep: homo_warping
# ---------------------------------------------------------------------------

def _random_proj(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """A plausible K @ w2c 4x4 projection at feature resolution."""
    fx = rng.uniform(0.8, 1.2) * w
    fy = rng.uniform(0.8, 1.2) * h
    k = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1.0]])
    # small rotation + translation (views on a loose trajectory)
    angles = rng.uniform(-0.2, 0.2, size=3)

    def rot(axis, a):
        c, s = np.cos(a), np.sin(a)
        m = np.eye(3)
        i, j = [(1, 2), (0, 2), (0, 1)][axis]
        m[i, i] = c
        m[j, j] = c
        m[i, j] = -s if axis != 1 else s
        m[j, i] = s if axis != 1 else -s
        return m

    r = rot(0, angles[0]) @ rot(1, angles[1]) @ rot(2, angles[2])
    t = rng.uniform(-0.3, 0.3, size=3)
    proj = np.eye(4)
    proj[:3, :3] = k @ r
    proj[:3, 3] = k @ t
    return proj


@needs_ref
def test_homo_warping_torch_compat_exact():
    """homography_warp(torch_compat=True) == reference homo_warping."""
    module, _ = _load_ref_mvs()
    rng = np.random.default_rng(0)
    h, w, c, d = 30, 40, 8, 6
    feat = rng.standard_normal((h, w, c)).astype(np.float32)
    ref_proj = _random_proj(rng, h, w)
    src_proj = _random_proj(rng, h, w)
    depths = np.linspace(0.5, 4.0, d).astype(np.float32)

    with torch.no_grad():
        out_t = module.homo_warping(
            torch.from_numpy(feat.transpose(2, 0, 1))[None].float(),
            torch.from_numpy(src_proj)[None].float(),
            torch.from_numpy(ref_proj)[None].float(),
            torch.from_numpy(depths)[None].float(),
        )  # (1, C, D, H, W)
    golden = out_t.numpy()[0].transpose(1, 2, 3, 0)            # (D, H, W, C)

    from mvsdet_tpu.ops.plane_sweep import homography_warp
    rel = jnp.asarray(src_proj @ np.linalg.inv(ref_proj), jnp.float32)
    ours = np.asarray(homography_warp(
        jnp.asarray(feat), rel, jnp.asarray(depths), torch_compat=True))

    assert ours.shape == golden.shape
    assert np.max(np.abs(ours - golden)) <= 1e-4


@needs_ref
def test_homo_warping_default_differs_only_by_skew():
    """The corrected default equals the torch-compat path once the
    documented align_corners skew (x -> x*W/(W-1) - 0.5, ops/sampling.py
    `torch_grid_sample_skew`) is folded into the projection — i.e. the
    deviation IS that affine skew on the source sampling coordinates,
    nothing else.  The skew acts on post-division pixel coords, so it
    lifts to a left-multiplication of the relative projection's x/y rows
    by the z row."""
    rng = np.random.default_rng(1)
    h, w, c, d = 24, 32, 4, 5
    feat = rng.standard_normal((h, w, c)).astype(np.float32)
    ref_proj = _random_proj(rng, h, w)
    src_proj = _random_proj(rng, h, w)
    depths = np.linspace(0.5, 4.0, d).astype(np.float32)

    from mvsdet_tpu.ops.plane_sweep import homography_warp
    rel = src_proj @ np.linalg.inv(ref_proj)
    skew = np.eye(4)
    skew[0, 0] = w / (w - 1)
    skew[0, 2] = -0.5
    skew[1, 1] = h / (h - 1)
    skew[1, 2] = -0.5
    default_on_skewed = np.asarray(homography_warp(
        jnp.asarray(feat), jnp.asarray(skew @ rel, jnp.float32),
        jnp.asarray(depths)))
    compat = np.asarray(homography_warp(
        jnp.asarray(feat), jnp.asarray(rel, jnp.float32),
        jnp.asarray(depths), torch_compat=True))

    # they must genuinely differ without the fold ...
    default = np.asarray(homography_warp(
        jnp.asarray(feat), jnp.asarray(rel, jnp.float32),
        jnp.asarray(depths)))
    assert np.abs(default - compat).max() > 1e-3
    # ... and agree exactly with it
    assert np.max(np.abs(default_on_skewed - compat)) <= 1e-4


# ---------------------------------------------------------------------------
# CostRegNet_3DGS
# ---------------------------------------------------------------------------

def _port_costreg_weights(ref_net) -> dict:
    """Map reference CostRegNet_3DGS weights onto our flax CostRegNet.

    Conventions (verified numerically in models/layers.py):
      Conv3d (out,in,kd,kh,kw) -> flax (kd,kh,kw,in,out);
      ConvTranspose3d (in,out,kd,kh,kw) -> spatial flip + (kd,kh,kw,in,out).
    """
    sd = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}

    def conv_k(w):
        return jnp.asarray(w.transpose(2, 3, 4, 1, 0))

    def deconv_k(w):
        return jnp.asarray(
            np.ascontiguousarray(w[:, :, ::-1, ::-1, ::-1]).transpose(
                2, 3, 4, 0, 1))

    params, stats = {}, {}
    for name in ("conv0", "conv1", "conv2", "conv3", "conv4"):
        params[name] = {
            "Conv_0": {"kernel": conv_k(sd[f"{name}.conv.weight"])},
            "BatchNorm_0": {
                "scale": jnp.asarray(sd[f"{name}.bn.weight"]),
                "bias": jnp.asarray(sd[f"{name}.bn.bias"]),
            },
        }
        stats[name] = {"BatchNorm_0": {
            "mean": jnp.asarray(sd[f"{name}.bn.running_mean"]),
            "var": jnp.asarray(sd[f"{name}.bn.running_var"]),
        }}
    for name in ("conv9", "conv11"):
        params[name] = {
            "ConvTranspose_0": {"kernel": deconv_k(sd[f"{name}.0.weight"])},
            "BatchNorm_0": {
                "scale": jnp.asarray(sd[f"{name}.1.weight"]),
                "bias": jnp.asarray(sd[f"{name}.1.bias"]),
            },
        }
        stats[name] = {"BatchNorm_0": {
            "mean": jnp.asarray(sd[f"{name}.1.running_mean"]),
            "var": jnp.asarray(sd[f"{name}.1.running_var"]),
        }}
    params["prob"] = {
        "kernel": conv_k(sd["prob.weight"]),
        "bias": jnp.asarray(sd["prob.bias"]),
    }
    return {"params": params, "batch_stats": stats}


def _randomize_bn(ref_net, rng):
    """Non-trivial BN affine + running stats so eval-mode parity is strong."""
    for mod in ref_net.modules():
        if isinstance(mod, torch.nn.BatchNorm3d):
            mod.weight.data = torch.from_numpy(
                rng.uniform(0.5, 1.5, mod.weight.shape).astype(np.float32))
            mod.bias.data = torch.from_numpy(
                rng.normal(0, 0.1, mod.bias.shape).astype(np.float32))
            mod.running_mean.data = torch.from_numpy(
                rng.normal(0, 0.1, mod.running_mean.shape).astype(np.float32))
            mod.running_var.data = torch.from_numpy(
                rng.uniform(0.5, 1.5, mod.running_var.shape).astype(
                    np.float32))


def _costreg_parity(d, h, w, seed, atol):
    _, mvsnet = _load_ref_mvs()
    rng = np.random.default_rng(seed)
    torch.manual_seed(seed)
    ref_net = mvsnet.CostRegNet_3DGS()
    _randomize_bn(ref_net, rng)
    ref_net.eval()

    x = rng.standard_normal((1, 256, d, h, w)).astype(np.float32) * 0.5
    with torch.no_grad():
        golden = ref_net(torch.from_numpy(x)).numpy()          # (1, 2, D, H, W)

    from mvsdet_tpu.models.cost_reg import CostRegNet
    net = CostRegNet(norm="batch")
    variables = _port_costreg_weights(ref_net)
    xj = jnp.asarray(x.transpose(0, 2, 3, 4, 1))               # (1, D, H, W, 256)
    ours = np.asarray(net.apply(variables, xj, train=False))
    ours = ours.transpose(0, 4, 1, 2, 3)

    assert ours.shape == golden.shape
    err = np.max(np.abs(ours - golden))
    assert err <= atol, f"max abs err {err:.2e} > {atol}"


@needs_ref
def test_costreg_parity_small():
    _costreg_parity(d=4, h=12, w=16, seed=2, atol=1e-4)


@needs_ref
@pytest.mark.slow
def test_costreg_parity_scannet_shape():
    """Full ScanNet-scale volume (D=12, 60x80) — the real operating point."""
    _costreg_parity(d=12, h=60, w=80, seed=3, atol=3e-4)


# ---------------------------------------------------------------------------
# FCOS-3D target assignment (_get_targets) — reference math re-typed in torch
# ---------------------------------------------------------------------------

N_LEVELS = 3
ASSIGN_THR = 27
CENTER_THR = 18


def _ref_face_distances(points, boxes):
    """nerfdet_head.py:434-452 semantics (torch)."""
    dx_min = points[..., 0] - boxes[..., 0] + boxes[..., 3] / 2
    dx_max = boxes[..., 0] + boxes[..., 3] / 2 - points[..., 0]
    dy_min = points[..., 1] - boxes[..., 1] + boxes[..., 4] / 2
    dy_max = boxes[..., 1] + boxes[..., 4] / 2 - points[..., 1]
    dz_min = points[..., 2] - boxes[..., 2] + boxes[..., 5] / 2
    dz_max = boxes[..., 2] + boxes[..., 5] / 2 - points[..., 2]
    return torch.stack((dx_min, dx_max, dy_min, dy_max, dz_min, dz_max), -1)


def _ref_centerness(fd):
    """nerfdet_head.py:454-471 semantics (torch)."""
    x = fd[..., [0, 1]]
    y = fd[..., [2, 3]]
    z = fd[..., [4, 5]]
    v = (x.min(-1)[0] / x.max(-1)[0] * y.min(-1)[0] / y.max(-1)[0]
         * z.min(-1)[0] / z.max(-1)[0])
    return torch.sqrt(v)


def _ref_get_targets(points_per_level, gt_boxes, gt_labels):
    """Reference `_get_targets` (nerfdet_head.py:473-562) re-typed in torch.

    points_per_level: list of (Vi, 3); gt_boxes: (B, 6) gravity-centred;
    gt_labels: (B,).  Returns (centerness, corner bbox targets, labels).
    """
    float_max = 1e8
    scales = torch.cat([
        torch.full((len(p),), i, dtype=torch.long)
        for i, p in enumerate(points_per_level)])
    points = torch.cat(points_per_level, 0)
    n_points = len(points)
    n_boxes = len(gt_boxes)
    volumes = (gt_boxes[:, 3] * gt_boxes[:, 4] * gt_boxes[:, 5]).expand(
        n_points, n_boxes).contiguous()
    boxes_e = gt_boxes.expand(n_points, n_boxes, 6)
    points_e = points.unsqueeze(1).expand(n_points, n_boxes, 3)
    fd = _ref_face_distances(points_e, boxes_e)

    inside = fd.min(-1)[0] > 0

    n_pos_per_scale = torch.stack(
        [inside[scales == i].sum(0) for i in range(N_LEVELS)], 0)
    lower = n_pos_per_scale < ASSIGN_THR
    extra = torch.arange(N_LEVELS, 0, -1).unsqueeze(1).expand(
        N_LEVELS, n_boxes)
    lower_index = torch.argmax(lower.int() * extra, dim=0) - 1
    lower_index = torch.where(lower_index < 0,
                              torch.zeros_like(lower_index), lower_index)
    all_upper = torch.all(torch.logical_not(lower), dim=0)
    best_scale = torch.where(
        all_upper, torch.ones_like(all_upper) * N_LEVELS - 1, lower_index)
    inside_best = best_scale.unsqueeze(0).expand(n_points, n_boxes) \
        == scales.unsqueeze(1).expand(n_points, n_boxes)

    cness = _ref_centerness(fd)
    cness = torch.where(inside, cness, torch.ones_like(cness) * -1)
    cness = torch.where(inside_best, cness, torch.ones_like(cness) * -1)
    top = torch.topk(cness, CENTER_THR + 1, dim=0).values[-1]
    inside_top = cness > top.unsqueeze(0)

    volumes = torch.where(inside, volumes, torch.ones_like(volumes) * float_max)
    volumes = torch.where(inside_best, volumes,
                          torch.ones_like(volumes) * float_max)
    volumes = torch.where(inside_top, volumes,
                          torch.ones_like(volumes) * float_max)
    min_area, min_inds = volumes.min(dim=1)

    labels = gt_labels[min_inds]
    labels = torch.where(min_area == float_max,
                         torch.ones_like(labels) * -1, labels)
    fd_sel = fd[range(n_points), min_inds]
    cness_t = _ref_centerness(fd_sel)
    bbox_t = torch.stack([
        points[:, 0] - fd_sel[:, 0], points[:, 1] - fd_sel[:, 2],
        points[:, 2] - fd_sel[:, 4], points[:, 0] + fd_sel[:, 1],
        points[:, 1] + fd_sel[:, 3], points[:, 2] + fd_sel[:, 5]], -1)
    return cness_t, bbox_t, labels


def _level_points(rng, grid, voxel, origin):
    nx, ny, nz = grid
    xs = (np.arange(nx) + 0.5) * voxel[0] + origin[0]
    ys = (np.arange(ny) + 0.5) * voxel[1] + origin[1]
    zs = (np.arange(nz) + 0.5) * voxel[2] + origin[2]
    g = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"), -1)
    return g.reshape(-1, 3).astype(np.float32)


def test_get_targets_parity():
    """assign_targets == reference FCOS-3D assignment on random scenes."""
    from mvsdet_tpu.config import HeadConfig
    from mvsdet_tpu.models.head import assign_targets

    rng = np.random.default_rng(7)
    for trial in range(5):
        pts = [
            _level_points(rng, (8, 8, 4), (0.4, 0.4, 0.5), (-1.6, -1.6, -1.0)),
            _level_points(rng, (4, 4, 2), (0.8, 0.8, 1.0), (-1.6, -1.6, -1.0)),
            _level_points(rng, (2, 2, 1), (1.6, 1.6, 2.0), (-1.6, -1.6, -1.0)),
        ]
        n_boxes = int(rng.integers(1, 6))
        centers = rng.uniform(-1.2, 1.2, (n_boxes, 3)).astype(np.float32)
        sizes = rng.uniform(0.3, 2.0, (n_boxes, 3)).astype(np.float32)
        boxes = np.concatenate([centers, sizes], -1)
        labels = rng.integers(0, 5, n_boxes).astype(np.int32)

        ct, bt, lt = _ref_get_targets(
            [torch.from_numpy(p) for p in pts],
            torch.from_numpy(boxes), torch.from_numpy(labels).long())

        cfg = HeadConfig(n_levels=N_LEVELS, pts_assign_threshold=ASSIGN_THR,
                         pts_center_threshold=CENTER_THR)
        points = jnp.asarray(np.concatenate(pts))
        scales = jnp.concatenate([
            jnp.full((p.shape[0],), i, jnp.int32) for i, p in enumerate(pts)])
        c_j, b_j, l_j = assign_targets(
            points, scales, jnp.asarray(boxes), jnp.asarray(labels),
            jnp.ones((n_boxes,), bool), cfg)

        l_ref = lt.numpy()
        l_ours = np.asarray(l_j)
        np.testing.assert_array_equal(l_ours, l_ref,
                                      err_msg=f"labels mismatch trial {trial}")
        pos = l_ref >= 0
        if pos.any():
            np.testing.assert_allclose(
                np.asarray(c_j)[pos], ct.numpy()[pos], atol=1e-5,
                err_msg=f"centerness mismatch trial {trial}")
            np.testing.assert_allclose(
                np.asarray(b_j)[pos], bt.numpy()[pos], atol=1e-5,
                err_msg=f"bbox targets mismatch trial {trial}")


# ---------------------------------------------------------------------------
# aligned_3d_nms — reference greedy loop re-typed in numpy
# ---------------------------------------------------------------------------

def _ref_aligned_3d_nms(boxes, scores, classes, thresh):
    """Reference greedy NMS (nerfdet_head.py:581-629) re-typed in numpy."""
    x1, y1, z1, x2, y2, z2 = [boxes[:, i] for i in range(6)]
    area = (x2 - x1) * (y2 - y1) * (z2 - z1)
    order = np.argsort(scores)
    pick = []
    while order.size:
        i = order[-1]
        pick.append(i)
        rest = order[:-1]
        xx1 = np.maximum(x1[i], x1[rest])
        yy1 = np.maximum(y1[i], y1[rest])
        zz1 = np.maximum(z1[i], z1[rest])
        xx2 = np.minimum(x2[i], x2[rest])
        yy2 = np.minimum(y2[i], y2[rest])
        zz2 = np.minimum(z2[i], z2[rest])
        inter = (np.maximum(0, xx2 - xx1) * np.maximum(0, yy2 - yy1)
                 * np.maximum(0, zz2 - zz1))
        iou = inter / (area[i] + area[rest] - inter)
        iou = iou * (classes[i] == classes[rest])
        order = rest[iou <= thresh]
    return np.asarray(pick, np.int64)


def test_aligned_3d_nms_parity():
    from mvsdet_tpu.ops.nms import aligned_3d_nms

    rng = np.random.default_rng(11)
    for trial in range(5):
        m = 60
        centers = rng.uniform(-2, 2, (m, 3))
        # clustered boxes so suppression actually fires
        centers[m // 2:] = centers[:m - m // 2] + rng.normal(0, 0.15, (m // 2, 3))
        sizes = rng.uniform(0.4, 1.2, (m, 3))
        boxes = np.concatenate([centers - sizes / 2, centers + sizes / 2],
                               -1).astype(np.float32)
        scores = rng.uniform(0.01, 1.0, m).astype(np.float32)
        classes = rng.integers(0, 3, m).astype(np.int32)

        ref_pick = _ref_aligned_3d_nms(boxes, scores, classes, 0.25)

        keep_idx, keep_mask = aligned_3d_nms(
            jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(classes),
            0.25, jnp.ones((m,), bool), m)
        ours = np.asarray(keep_idx)[np.asarray(keep_mask)]

        np.testing.assert_array_equal(ours, ref_pick,
                                      err_msg=f"NMS picks mismatch trial {trial}")
