"""Anchor-free 3D detection head: convs, FCOS-3D assignment, losses, decode.

Functional flax re-design of `NerfDetHead` (ref:
projects/NeRF-Det/nerfdet/nerfdet_head.py):
  - per-level shared Conv3d towers + per-level scale   (:90-118)
  - FCOS-style scale-assigned target generation        (:473-562)
  - focal / BCE / axis-aligned-IoU losses              (:206-257)
  - score decode + top-k + greedy NMS prediction       (:333-390)

Everything is fixed-shape: GT boxes are padded to ``max_boxes`` with a
mask, predictions are padded to ``max_detections``.  The ARKit yaw head
(`ImVoxelHead_ARKit`, ref :634-1243) shares this module with
``n_reg_outs=7``/``with_yaw=True``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvsdet_tpu.config import HeadConfig
from mvsdet_tpu.ops.nms import (aligned_3d_nms, corner_to_center,
                                rotated_3d_nms)

Dtype = Any

FLOAT_MAX = 1e8


class DetectionHead(nn.Module):
    """Shared-weight per-level conv towers (nerfdet_head.py:90-118).

    Input: list of (nx, ny, nz, C) voxel feature levels (single scene).
    Output per level: center (V, 1) logits, bbox (V, n_reg) distances
    (exp-activated, scaled per level), cls (V, n_classes) logits.
    """

    cfg: HeadConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, levels: Sequence[jnp.ndarray]):
        cfg = self.cfg
        conv_center = nn.Conv(1, (3, 3, 3), padding="SAME", use_bias=False,
                              dtype=self.dtype, name="conv_center")
        conv_reg = nn.Conv(cfg.n_reg_outs, (3, 3, 3), padding="SAME",
                           use_bias=False, dtype=self.dtype, name="conv_reg")
        conv_cls = nn.Conv(
            cfg.n_classes, (3, 3, 3), padding="SAME", dtype=self.dtype,
            bias_init=nn.initializers.constant(-4.595),  # prior prob 0.01
            name="conv_cls")
        scales = self.param("scales", nn.initializers.ones, (cfg.n_levels,))
        outs = []
        for i, x in enumerate(levels):
            x4 = x[None] if x.ndim == 4 else x
            center = conv_center(x4)
            reg = conv_reg(x4)
            if cfg.with_yaw:
                # distances exp-scaled, yaw channel left linear
                # (ImVoxelHead_ARKit._forward_single, nerfdet_head.py:687-691)
                dist = jnp.exp(scales[i] * reg[..., :6])
                reg = jnp.concatenate([dist, reg[..., 6:]], axis=-1)
            else:
                reg = jnp.exp(scales[i] * reg)
            cls = conv_cls(x4)
            flat = lambda t: t.reshape(-1, t.shape[-1])
            outs.append((flat(center), flat(reg), flat(cls)))
        return outs


def face_distances(points: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Distances from points to the 6 faces of gravity-centred boxes.

    Matches `_get_face_distances` (nerfdet_head.py:433-452).

    Args:
      points: (P, 3).
      boxes: (B, 6) (cx, cy, cz, dx, dy, dz).

    Returns:
      (P, B, 6) (dx_min, dx_max, dy_min, dy_max, dz_min, dz_max).
    """
    p = points[:, None, :]
    c = boxes[None, :, :3]
    h = boxes[None, :, 3:6] / 2.0
    lo = p - (c - h)
    hi = (c + h) - p
    return jnp.stack([lo[..., 0], hi[..., 0], lo[..., 1], hi[..., 1],
                      lo[..., 2], hi[..., 2]], axis=-1)


def centerness_from_faces(fd: jnp.ndarray) -> jnp.ndarray:
    """FCOS centerness (nerfdet_head.py:454-471)."""
    x_min = jnp.minimum(fd[..., 0], fd[..., 1])
    x_max = jnp.maximum(fd[..., 0], fd[..., 1])
    y_min = jnp.minimum(fd[..., 2], fd[..., 3])
    y_max = jnp.maximum(fd[..., 2], fd[..., 3])
    z_min = jnp.minimum(fd[..., 4], fd[..., 5])
    z_max = jnp.maximum(fd[..., 4], fd[..., 5])
    prod = (x_min / jnp.maximum(x_max, 1e-12)
            * y_min / jnp.maximum(y_max, 1e-12)
            * z_min / jnp.maximum(z_max, 1e-12))
    return jnp.sqrt(jnp.maximum(prod, 0.0))


def decode_bbox(points: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Face distances -> corner boxes (`_bbox_pred_to_bbox`, :422-427)."""
    return jnp.stack([
        points[:, 0] - pred[:, 0], points[:, 1] - pred[:, 2],
        points[:, 2] - pred[:, 4], points[:, 0] + pred[:, 1],
        points[:, 1] + pred[:, 3], points[:, 2] + pred[:, 5],
    ], axis=-1)


def assign_targets(points: jnp.ndarray, scales: jnp.ndarray,
                   gt_boxes: jnp.ndarray, gt_labels: jnp.ndarray,
                   gt_mask: jnp.ndarray, cfg: HeadConfig):
    """FCOS-3D target assignment with fixed shapes.

    Matches `_get_targets` (nerfdet_head.py:473-562):
      cond1 inside box; cond2 best scale (first level where the box has
      fewer than pts_assign_threshold inside-points, minus one); cond3
      top-``pts_center_threshold`` centerness; ties by min volume.

    Args:
      points: (P, 3) all-level points concatenated.
      scales: (P,) int level index per point.
      gt_boxes: (B, 6) gravity-centred boxes (padded).
      gt_labels: (B,) int labels (padded).
      gt_mask: (B,) bool valid-box mask.
      cfg: head config.

    Returns:
      centerness_t: (P,), bbox_t: (P, 6) corner boxes, labels_t: (P,)
      with -1 for background.
    """
    n_levels = cfg.n_levels
    p_cnt, b_cnt = points.shape[0], gt_boxes.shape[0]
    fd = face_distances(points, gt_boxes)                     # (P, B, 6)
    inside = (jnp.min(fd, axis=-1) > 0) & gt_mask[None, :]    # (P, B)

    # cond2: best scale per box
    scale_onehot = jax.nn.one_hot(scales, n_levels, dtype=jnp.float32)
    n_pos_per_scale = jnp.einsum("pl,pb->lb", scale_onehot,
                                 inside.astype(jnp.float32))  # (L, B)
    lower = n_pos_per_scale < cfg.pts_assign_threshold        # (L, B)
    extra = jnp.arange(n_levels, 0, -1, dtype=jnp.int32)[:, None]
    lower_index = jnp.argmax(lower.astype(jnp.int32) * extra, axis=0) - 1
    lower_index = jnp.maximum(lower_index, 0)
    all_upper = jnp.all(~lower, axis=0)
    best_scale = jnp.where(all_upper, n_levels - 1, lower_index)  # (B,)
    inside_best = best_scale[None, :] == scales[:, None]      # (P, B)

    # cond3: top-k centerness per box
    cness = centerness_from_faces(fd)                         # (P, B)
    cness_m = jnp.where(inside & inside_best, cness, -1.0)
    k = min(cfg.pts_center_threshold + 1, p_cnt)
    top_vals = jax.lax.top_k(cness_m.T, k)[0]                 # (B, k)
    thresh = top_vals[:, -1]                                  # (B,)
    inside_top = cness_m > thresh[None, :]

    volumes = jnp.prod(jnp.maximum(gt_boxes[:, 3:6], 0.0), axis=-1)
    vol = jnp.broadcast_to(volumes[None, :], (p_cnt, b_cnt))
    vol = jnp.where(inside & inside_best & inside_top, vol, FLOAT_MAX)
    min_vol = jnp.min(vol, axis=1)
    min_inds = jnp.argmin(vol, axis=1)                        # (P,)

    labels_t = jnp.where(min_vol >= FLOAT_MAX, -1, gt_labels[min_inds])
    fd_sel = jnp.take_along_axis(
        fd, min_inds[:, None, None], axis=1)[:, 0]            # (P, 6)
    centerness_t = centerness_from_faces(fd_sel)
    bbox_t = decode_bbox(points, fd_sel)
    return centerness_t, bbox_t, labels_t


def sigmoid_focal_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       gamma: float, alpha: float) -> jnp.ndarray:
    """Per-point summed sigmoid focal loss (mmdet FocalLoss semantics).

    Args:
      logits: (P, C); labels: (P,) with -1/out-of-range = background.

    Returns:
      (P,) loss summed over classes.
    """
    c = logits.shape[-1]
    y = jax.nn.one_hot(labels, c, dtype=logits.dtype)         # bg -> zeros
    p = jax.nn.sigmoid(logits)
    ce = (jax.nn.softplus(-logits) * y
          + jax.nn.softplus(logits) * (1 - y))
    p_t = p * y + (1 - p) * (1 - y)
    alpha_t = alpha * y + (1 - alpha) * (1 - y)
    return jnp.sum(alpha_t * (1 - p_t) ** gamma * ce, axis=-1)


def axis_aligned_iou(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """Aligned IoU of corner boxes, elementwise (iou3d_calculator.py:180)."""
    lt = jnp.maximum(pred[..., :3], target[..., :3])
    rb = jnp.minimum(pred[..., 3:], target[..., 3:])
    whd = jnp.maximum(rb - lt, 0.0)
    inter = jnp.prod(whd, axis=-1)
    v1 = jnp.prod(jnp.maximum(pred[..., 3:] - pred[..., :3], 0.0), axis=-1)
    v2 = jnp.prod(jnp.maximum(target[..., 3:] - target[..., :3], 0.0), axis=-1)
    return inter / jnp.maximum(v1 + v2 - inter, 1e-12)


def head_loss(head_outs, points_per_level, valid_per_level,
              gt_boxes, gt_labels, gt_mask, cfg: HeadConfig,
              n_pos_override: Optional[jnp.ndarray] = None,
              axis_name: Optional[str] = None):
    """Single-scene head loss (`_loss_by_feat_single`, nerfdet_head.py:206-257).

    Args:
      head_outs: list of (center (V,1), reg (V,6), cls (V,C)) per level.
      points_per_level: list of (V, 3) per level.
      valid_per_level: list of (V,) bool (upsampled lift validity).
      gt_boxes: (B, 6); gt_labels: (B,); gt_mask: (B,).
      cfg: head config.
      n_pos_override: cross-replica-averaged positive count (the
        reference `reduce_mean` at :231); defaults to the local count.

    Returns:
      dict(center_loss, bbox_loss, cls_loss), aux dict.
    """
    center = jnp.concatenate([o[0][:, 0] for o in head_outs])
    reg = jnp.concatenate([o[1] for o in head_outs])
    cls = jnp.concatenate([o[2] for o in head_outs])
    valid = jnp.concatenate(valid_per_level)
    points = jnp.concatenate(points_per_level)
    scales = jnp.concatenate([
        jnp.full((p.shape[0],), i, jnp.int32)
        for i, p in enumerate(points_per_level)])

    cness_t, bbox_t, labels_t = assign_targets(
        points, scales, gt_boxes, gt_labels, gt_mask, cfg)

    pos = (labels_t >= 0) & valid
    n_pos_local = jnp.sum(pos.astype(jnp.float32))
    if n_pos_override is not None:
        n_pos = n_pos_override
    elif axis_name is not None:
        # cross-replica averaged positive count, the reference's
        # `reduce_mean` (nerfdet_head.py:231)
        n_pos = jax.lax.pmean(n_pos_local, axis_name)
    else:
        n_pos = n_pos_local
    n_pos = jnp.maximum(n_pos, 1.0)

    # cls: focal over valid points (background included)
    cls_labels = jnp.where(valid, labels_t, -1)
    focal = sigmoid_focal_loss(cls, cls_labels, cfg.focal_gamma,
                               cfg.focal_alpha)
    cls_loss = jnp.sum(jnp.where(valid, focal, 0.0)) / n_pos

    # centerness: BCE with logits on positives
    bce = (jax.nn.softplus(-center) * cness_t
           + jax.nn.softplus(center) * (1 - cness_t))
    center_loss = jnp.sum(jnp.where(pos, bce, 0.0)) / n_pos

    # bbox: (1 - IoU) weighted by centerness target
    pred_boxes = decode_bbox(points, reg)
    iou_loss = 1.0 - axis_aligned_iou(pred_boxes, bbox_t)
    w = jnp.where(pos, cness_t, 0.0)
    bbox_loss = jnp.sum(iou_loss * w) / jnp.maximum(jnp.sum(w), 1e-6)

    losses = dict(center_loss=center_loss * cfg.center_loss_weight,
                  bbox_loss=bbox_loss * cfg.bbox_loss_weight,
                  cls_loss=cls_loss * cfg.cls_loss_weight)
    aux = dict(n_pos=n_pos_local)
    return losses, aux


def rotate_z(points: jnp.ndarray, angle) -> jnp.ndarray:
    """Rotate (..., 3) points around +z by angle (broadcastable).

    Matches `rotation_3d_in_axis(..., axis=2)` used by the ARKit head
    (nerfdet_head.py:1049, 1074-1075).
    """
    c, s = jnp.cos(angle), jnp.sin(angle)
    x = points[..., 0] * c - points[..., 1] * s
    y = points[..., 0] * s + points[..., 1] * c
    return jnp.stack([x, y, points[..., 2]], axis=-1)


def decode_bbox_rotated(points: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """7-dim distances+yaw -> (cx cy cz dx dy dz yaw)
    (`ImVoxelHead_ARKit._bbox_pred_to_bbox`, nerfdet_head.py:1029-1055)."""
    shift = jnp.stack([(pred[:, 1] - pred[:, 0]) / 2,
                       (pred[:, 3] - pred[:, 2]) / 2,
                       (pred[:, 5] - pred[:, 4]) / 2], axis=-1)
    shift = rotate_z(shift, pred[:, 6])
    center = points + shift
    size = jnp.stack([pred[:, 0] + pred[:, 1], pred[:, 2] + pred[:, 3],
                      pred[:, 4] + pred[:, 5]], axis=-1)
    return jnp.concatenate([center, size, pred[:, 6:7]], axis=-1)


def box7_corners(boxes7: jnp.ndarray) -> jnp.ndarray:
    """8 world-space corners of yaw boxes, (..., 8, 3)."""
    half = boxes7[..., 3:6] / 2.0
    signs = jnp.asarray(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        jnp.float32)                                          # (8, 3)
    local = signs[None, :, :] * half[..., None, :]
    rotated = rotate_z(local, boxes7[..., None, 6])
    return rotated + boxes7[..., None, :3]


def assign_targets_rotated(points: jnp.ndarray, scales: jnp.ndarray,
                           gt_boxes7: jnp.ndarray, gt_labels: jnp.ndarray,
                           gt_mask: jnp.ndarray, cfg: HeadConfig):
    """FCOS-3D assignment for yaw boxes (`ImVoxelHead_ARKit._get_targets`,
    nerfdet_head.py:1107-1185): same 4 conditions as the aligned head but
    with rotated face distances; targets are the matched boxes
    themselves (not face distances).

    Returns (centerness_t (P,), box_t (P, 7), labels_t (P,)).
    """
    n_levels = cfg.n_levels
    p_cnt, b_cnt = points.shape[0], gt_boxes7.shape[0]
    shift = points[:, None, :] - gt_boxes7[None, :, :3]
    shift = rotate_z(shift, -gt_boxes7[None, :, 6])
    centers = gt_boxes7[None, :, :3] + shift                  # (P, B, 3)
    h = gt_boxes7[None, :, 3:6] / 2.0
    lo = centers - (gt_boxes7[None, :, :3] - h)
    hi = (gt_boxes7[None, :, :3] + h) - centers
    fd = jnp.stack([lo[..., 0], hi[..., 0], lo[..., 1], hi[..., 1],
                    lo[..., 2], hi[..., 2]], axis=-1)         # (P, B, 6)
    inside = (jnp.min(fd, axis=-1) > 0) & gt_mask[None, :]

    scale_onehot = jax.nn.one_hot(scales, n_levels, dtype=jnp.float32)
    n_pos_per_scale = jnp.einsum("pl,pb->lb", scale_onehot,
                                 inside.astype(jnp.float32))
    lower = n_pos_per_scale < cfg.pts_assign_threshold
    lower_index = jnp.argmax(lower.astype(jnp.int32), axis=0) - 1
    lower_index = jnp.maximum(lower_index, 0)
    all_upper = jnp.all(~lower, axis=0)
    best_scale = jnp.where(all_upper, n_levels - 1, lower_index)
    inside_best = best_scale[None, :] == scales[:, None]

    cness = centerness_from_faces(fd)
    cness_m = jnp.where(inside & inside_best, cness, -1.0)
    k = min(cfg.pts_center_threshold + 1, p_cnt)
    top_vals = jax.lax.top_k(cness_m.T, k)[0]
    thresh = top_vals[:, -1]
    inside_top = cness_m > thresh[None, :]

    volumes = jnp.prod(jnp.maximum(gt_boxes7[:, 3:6], 0.0), axis=-1)
    vol = jnp.broadcast_to(volumes[None, :], (p_cnt, b_cnt))
    vol = jnp.where(inside & inside_best & inside_top, vol, FLOAT_MAX)
    min_vol = jnp.min(vol, axis=1)
    min_inds = jnp.argmin(vol, axis=1)

    labels_t = jnp.where(min_vol >= FLOAT_MAX, -1, gt_labels[min_inds])
    centerness_t = jnp.take_along_axis(cness_m, min_inds[:, None],
                                       axis=1)[:, 0]
    box_t = gt_boxes7[min_inds]
    return centerness_t, box_t, labels_t


def head_loss_rotated(head_outs, points_per_level, valid_per_level,
                      gt_boxes7, gt_labels, gt_mask, cfg: HeadConfig,
                      axis_name: Optional[str] = None):
    """ARKit-head loss: focal cls + BCE centerness + a rotated box loss.

    Box-loss modes (cfg.rotated_bbox_loss):
      - "rotated_iou" (default): 1 - soft sampled rotated 3D IoU
        (ops/nms.py `rotated_iou_3d_soft_pairs`), centerness-weighted —
        the analogue of the reference's `RotatedIoU3DLoss`
        (nerfdet_head.py:71,647, mmcv `diff_iou_rotated_3d`).
      - "decoupled": smooth-L1 over (target-frame centre error / target
        size, log size ratio, sin/1-cos of the yaw difference).
    Neither is the corner-distance surrogate: with a mis-rotated box
    the corner loss is reduced by shrinking the box, and training
    collapses all sizes to ~0 (observed: overfit mAP stuck at 0 with
    predicted dx,dy ~ 1e-5).
    """
    center = jnp.concatenate([o[0][:, 0] for o in head_outs])
    reg = jnp.concatenate([o[1] for o in head_outs])
    cls = jnp.concatenate([o[2] for o in head_outs])
    valid = jnp.concatenate(valid_per_level)
    points = jnp.concatenate(points_per_level)
    scales = jnp.concatenate([
        jnp.full((p.shape[0],), i, jnp.int32)
        for i, p in enumerate(points_per_level)])

    cness_t, box_t, labels_t = assign_targets_rotated(
        points, scales, gt_boxes7, gt_labels, gt_mask, cfg)

    pos = (labels_t >= 0) & valid
    n_pos_local = jnp.sum(pos.astype(jnp.float32))
    n_pos = (jax.lax.pmean(n_pos_local, axis_name)
             if axis_name is not None else n_pos_local)
    n_pos = jnp.maximum(n_pos, 1.0)

    cls_labels = jnp.where(valid, labels_t, -1)
    focal = sigmoid_focal_loss(cls, cls_labels, cfg.focal_gamma,
                               cfg.focal_alpha)
    cls_loss = jnp.sum(jnp.where(valid, focal, 0.0)) / n_pos

    bce = (jax.nn.softplus(-center) * cness_t
           + jax.nn.softplus(center) * (1 - cness_t))
    center_loss = jnp.sum(jnp.where(pos, bce, 0.0)) / n_pos

    pred7 = decode_bbox_rotated(points, reg)
    if cfg.rotated_bbox_loss == "rotated_iou":
        from mvsdet_tpu.ops.nms import rotated_iou_3d_soft_pairs
        per_point = 1.0 - rotated_iou_3d_soft_pairs(pred7, box_t)
    elif cfg.rotated_bbox_loss == "decoupled":
        size_t = jnp.maximum(box_t[:, 3:6], 1e-4)
        d_center = rotate_z(pred7[:, :3] - box_t[:, :3], -box_t[:, 6]) / size_t
        e_size = jnp.log(jnp.maximum(pred7[:, 3:6], 1e-4) / size_t)
        dyaw = pred7[:, 6] - box_t[:, 6]
        e_yaw = jnp.stack([jnp.sin(dyaw), 1.0 - jnp.cos(dyaw)], axis=-1)
        err = jnp.concatenate([d_center, e_size, e_yaw], axis=-1)  # (P, 8)
        dist = jnp.abs(err)
        beta = 1.0
        smooth = jnp.where(dist < beta, 0.5 * dist**2 / beta,
                           dist - 0.5 * beta)
        per_point = jnp.mean(smooth, axis=-1)
    else:
        raise ValueError(
            f"unknown rotated_bbox_loss {cfg.rotated_bbox_loss!r}")
    w = jnp.where(pos, cness_t, 0.0)
    bbox_loss = jnp.sum(per_point * w) / jnp.maximum(jnp.sum(w), 1e-6)

    losses = dict(center_loss=center_loss * cfg.center_loss_weight,
                  bbox_loss=bbox_loss * cfg.bbox_loss_weight,
                  cls_loss=cls_loss * cfg.cls_loss_weight)
    return losses, dict(n_pos=n_pos_local)


def head_predict_rotated(head_outs, points_per_level, valid_per_level,
                         cfg: HeadConfig):
    """ARKit-head prediction with per-class rotated NMS
    (`_single_scene_multiclass_nms` + `nms3d`, nerfdet_head.py:1190-1243,
    here class-aware greedy NMS with sampled rotated IoU in one pass).
    """
    all_boxes, all_scores = [], []
    for (center, reg, cls), pts, valid in zip(head_outs, points_per_level,
                                              valid_per_level):
        score = (jax.nn.sigmoid(cls) * jax.nn.sigmoid(center)
                 * valid[:, None].astype(cls.dtype))
        max_score = jnp.max(score, axis=1)
        k = min(cfg.nms_pre, score.shape[0])
        _, ids = jax.lax.top_k(max_score, k)
        boxes = decode_bbox_rotated(pts[ids], reg[ids])
        all_boxes.append(boxes)
        all_scores.append(score[ids])
    boxes = jnp.concatenate(all_boxes)
    scores = jnp.concatenate(all_scores)
    best_score = jnp.max(scores, axis=1)
    labels = jnp.argmax(scores, axis=1)
    valid = best_score > cfg.score_thr
    keep_idx, keep_mask = rotated_3d_nms(
        boxes, best_score, labels, cfg.iou_thr, valid, cfg.max_detections)
    return dict(boxes=boxes[keep_idx],
                scores=best_score[keep_idx] * keep_mask,
                labels=labels[keep_idx],
                mask=keep_mask)


def head_predict(head_outs, points_per_level, valid_per_level,
                 cfg: HeadConfig):
    """Single-scene box prediction (`_predict_by_feat_single`, :333-390).

    Per level: score = sigmoid(cls) * sigmoid(center) * valid, top
    ``nms_pre`` by max score, decode, then class-aware greedy NMS.

    Returns:
      dict with fixed-shape arrays:
        boxes: (max_detections, 6) center-format (cx cy cz dx dy dz),
        scores / labels: (max_detections,), mask: (max_detections,) bool.
    """
    all_boxes, all_scores = [], []
    for (center, reg, cls), pts, valid in zip(head_outs, points_per_level,
                                              valid_per_level):
        score = (jax.nn.sigmoid(cls) * jax.nn.sigmoid(center)
                 * valid[:, None].astype(cls.dtype))          # (V, C)
        max_score = jnp.max(score, axis=1)
        k = min(cfg.nms_pre, score.shape[0])
        _, ids = jax.lax.top_k(max_score, k)
        boxes = decode_bbox(pts[ids], reg[ids])
        all_boxes.append(boxes)
        all_scores.append(score[ids])
    boxes = jnp.concatenate(all_boxes)                        # (M, 6)
    scores = jnp.concatenate(all_scores)                      # (M, C)

    best_score = jnp.max(scores, axis=1)
    labels = jnp.argmax(scores, axis=1)
    valid = best_score > cfg.score_thr
    keep_idx, keep_mask = aligned_3d_nms(
        boxes, best_score, labels, cfg.iou_thr, valid, cfg.max_detections)
    out_boxes = corner_to_center(boxes[keep_idx])
    return dict(boxes=out_boxes,
                scores=best_score[keep_idx] * keep_mask,
                labels=labels[keep_idx],
                mask=keep_mask)
