"""MVSDet: the flagship multi-view 3D detector (flax).

TPU-native re-design of `MVSDet` (ref:
projects/NeRF-Det/nerfdet/mvsdet.py:122-698).  The reference's per-scene
python loops become fixed-shape, jit-compiled batched computation:

  images (N, H, W, 3)
    -> ResNet-50 + FPN[0]                  (mvsdet.py:372-376)
    -> kNN neighbour views                 (:432-434)
    -> [scanned view-chunks] plane-sweep variance -> CostRegNet
       -> softmax depth prob + sigmoid offsets      (:438-475)
    -> top-k probabilistic depth + expectation      (:478-482)
    -> depth-weighted voxel lifting (scan + reduce) (:499-515)
    -> IndoorImVoxelNeck -> DetectionHead           (:695-697)
  and, in parallel, the Gaussian branch             (:519-677):
    top-3 src per render target -> per-pixel raw Gaussians ->
    GaussianAdapter -> splatting renderer -> NVS RGB loss.

Single-scene module; the train step vmaps/shard_maps over scenes and
view shards.  All shapes static: views, targets, GT boxes are padded
with masks.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvsdet_tpu.config import ModelConfig
from mvsdet_tpu.geometry.cameras import (full_projection, knn_camera_neighbors,
                                         nearest_pose_ids, scale_intrinsics)
from mvsdet_tpu.geometry.rays import depth_scale_map, sample_image_grid
from mvsdet_tpu.geometry.voxels import (depth_plane_values,
                                        multiscale_voxel_points, voxel_points)
from mvsdet_tpu.models.cost_reg import CostRegNet
from mvsdet_tpu.models.fpn import FPN
from mvsdet_tpu.models.gaussian_head import (Gaussians, ToGaussians,
                                             adapt_gaussians)
from mvsdet_tpu.models.head import (DetectionHead, head_loss,
                                    head_loss_rotated, head_predict,
                                    head_predict_rotated)
from mvsdet_tpu.models.neck3d import IndoorImVoxelNeck
from mvsdet_tpu.models.resnet import ResNet50
from mvsdet_tpu.ops.plane_sweep import plane_sweep_variance_for_refs
from mvsdet_tpu.ops.plane_sweep_mxu import plane_sweep_variance_mxu
from mvsdet_tpu.ops.sampling import bilinear_resize
from mvsdet_tpu.ops.splat import render_view
from mvsdet_tpu.ops.splat_tiles import render_views_tiled
from mvsdet_tpu.ops.voxel_lift import (finalize_volume,
                                       lift_features_to_voxels,
                                       lift_features_to_voxels_pallas)

Dtype = Any


def _upsample_valid(valid_count: jnp.ndarray, shape3) -> jnp.ndarray:
    """Trilinear-upsampled lift validity per head level.

    Matches `_upsample_valid_preds` (nerfdet_head.py:392-407): the view
    count volume is resized and thresholded at 0.5.
    """
    v = jax.image.resize(valid_count, shape3, method="trilinear")
    return v >= 0.5


class MVSDet(nn.Module):
    """Single-scene MVSDet forward/loss/predict."""

    cfg: ModelConfig
    sweep_chunk: int = 8          # views per sweep+costreg scan step
    # 'mxu': two-pass shear-matmul warp (TPU fast path);
    # 'gather': direct bilinear gather (the correctness oracle)
    sweep_method: str = "mxu"
    # rematerialise the sweep+costreg chunks in backward (saves the
    # ~chunk x (D, h, w, C) variance volume + U-Net activations at the
    # cost of recomputing the chunk forward during backprop).  False
    # keeps activations live — faster backward where HBM allows.
    sweep_remat: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        mc = self.cfg
        self.backbone = ResNet50(depth=mc.backbone.depth,
                                 frozen_stages=mc.backbone.frozen_stages,
                                 dtype=self.dtype)
        self.fpn = FPN(out_channels=mc.backbone.fpn_out_channels,
                       dtype=self.dtype)
        self.cost_reg = CostRegNet(in_channels=mc.backbone.fpn_out_channels,
                                   norm=mc.cost_reg_norm, dtype=self.dtype)
        self.neck3d = IndoorImVoxelNeck(
            in_channels=mc.backbone.fpn_out_channels,
            out_channels=mc.neck3d_out_channels, dtype=self.dtype)
        self.head = DetectionHead(mc.head, dtype=self.dtype)
        # gaussian input: feat + depth-expectation (+ rgb); Dense infers it
        self.to_gaussians = ToGaussians(
            out_features=mc.gs.num_surfaces * (2 + mc.gs.adapter.d_in),
            dtype=self.dtype)

    # ------------------------------------------------------------------
    # feature extraction
    # ------------------------------------------------------------------

    def image_features(self, images: jnp.ndarray) -> jnp.ndarray:
        """Per-view 2D features: ResNet-50 -> FPN level 0 (stride 4)."""
        feats = self.backbone(images)
        return self.fpn(feats)[0]                             # (N, h, w, C)

    def depth_probabilities(self, features: jnp.ndarray, proj44: jnp.ndarray,
                            neighbor_ids: jnp.ndarray, train: bool,
                            ref_ids: jnp.ndarray = None):
        """Chunk-scanned plane sweep + cost regularisation.

        The full variance volume is ~2.5 GB fp32 at ScanNet scale; views
        are processed in rematerialised chunks so only one chunk's volume
        (and none of its U-Net activations) stays live.

        Returns (prob, offset): both (N, D, h, w); prob softmaxed over D,
        offset sigmoided (mvsdet.py:470-475).
        """
        mc = self.cfg
        n = features.shape[0] if ref_ids is None else ref_ids.shape[0]
        depths = depth_plane_values(*mc.near_far_range,
                                    mc.gs.num_depth_planes)
        chunk = self.sweep_chunk
        if mc.cost_reg_norm == "batch" and train:
            # Faithful-training BN: the reference's BatchNorm3d sees the
            # FULL view batch in one call (mvsnet.py:73-113 applied at
            # mvsdet.py:470).  Under a view-chunked scan each chunk
            # would compute its own batch stats and the running averages
            # diverge from anything eval applies — trains but evals at
            # mAP 0 (on-chip A/B: experiments/costreg_norm_ab.md).  So
            # train-mode BN collapses the scan to a single full-batch
            # chunk; remat still bounds the U-Net activation memory, and
            # fewer graph copies also shrink the remote-compile payload.
            # Eval keeps the configured chunking (running stats only).
            chunk = n
        if n % chunk != 0:
            chunk = 1 if n < chunk else max(
                c for c in range(1, chunk + 1) if n % c == 0)

        def step(mdl, ref_ids):
            if self.sweep_method == "mxu":
                var = plane_sweep_variance_mxu(
                    features, proj44, ref_ids, neighbor_ids[ref_ids],
                    depths, compute_dtype=self.dtype)
            else:
                var = plane_sweep_variance_for_refs(
                    features, proj44, ref_ids, neighbor_ids[ref_ids], depths)
            out = mdl.cost_reg(var.astype(self.dtype), train)
            prob = jax.nn.softmax(out[..., 0].astype(jnp.float32), axis=1)
            off = jax.nn.sigmoid(out[..., 1].astype(jnp.float32))
            return prob, off

        remat_step = (nn.remat(step, prevent_cse=False)
                      if self.sweep_remat else step)
        ids = (jnp.arange(n) if ref_ids is None else ref_ids).reshape(-1, chunk)
        probs, offs = [], []
        for i in range(ids.shape[0]):
            p, o = remat_step(self, ids[i])
            probs.append(p)
            offs.append(o)
        probs = jnp.concatenate(probs)
        offs = jnp.concatenate(offs)
        return probs, offs

    def sample_depth(self, prob: jnp.ndarray, off: jnp.ndarray):
        """Top-k depth hypotheses + expectation.

        Matches `sample_depth_prob` (mvsdet.py:266-283) and
        `compute_avg_depth` (:298-317).

        Args:
          prob/off: (N, D, h, w).

        Returns:
          est_depth: (N, h, w, K) z-depths; est_prob: (N, h, w, K);
          depth_expect: (N, h, w) expectation over all planes.
        """
        mc = self.cfg
        near = mc.near_far_range[0]
        interval = mc.depth_interval
        p = jnp.moveaxis(prob, 1, -1)                         # (N, h, w, D)
        o = jnp.moveaxis(off, 1, -1)
        top_p, top_idx = jax.lax.top_k(p, mc.topk)            # (N, h, w, K)
        top_off = jnp.take_along_axis(o, top_idx, axis=-1)
        est_depth = top_idx * interval + near + top_off * interval
        plane_depth = (jnp.arange(p.shape[-1]) * interval + near
                       + o * interval)                        # (N, h, w, D)
        depth_expect = jnp.sum(plane_depth * p, axis=-1)
        return est_depth, top_p, depth_expect

    # ------------------------------------------------------------------
    # gaussian branch
    # ------------------------------------------------------------------

    def gaussian_branch(self, features, denorm_images, prob, depth_expect,
                        src_c2w, feat_intrinsic, tgt_c2w):
        """Per-pixel Gaussians from the top-3 src views per render target.

        Matches mvsdet.py:519-677.  The reference's variable-size
        ``unique(render_src_id)`` becomes a fixed (T*3,) slot array with
        duplicate slots' opacities zeroed (same rendered image, static
        shape).

        Returns a flattened `Gaussians` (S*h*w,).
        """
        mc = self.cfg
        n, h, w, c = features.shape
        k_sel = min(mc.gs.render_src_per_target, n - 1)
        src_ids = nearest_pose_ids(tgt_c2w, src_c2w, k_sel)   # (T, k)
        flat_ids = jnp.sort(src_ids.reshape(-1))              # (S,)
        first = jnp.concatenate([
            jnp.asarray([True]), flat_ids[1:] != flat_ids[:-1]])
        sel = flat_ids                                        # (S,)
        s = sel.shape[0]

        feat_sel = features[sel].reshape(s, h * w, c)         # (S, hw, C)
        depth_code = depth_expect[sel].reshape(s, h * w, 1)
        gs_feat = jnp.concatenate([feat_sel, depth_code], axis=-1)
        if mc.gs.use_rgb_gaussian:
            rgb = jax.vmap(lambda im: bilinear_resize(im, (h, w)))(
                denorm_images[sel])                           # (S, h, w, 3)
            gs_feat = jnp.concatenate([gs_feat, rgb.reshape(s, h * w, 3)],
                                      axis=-1)

        raw = self.to_gaussians(gs_feat)                      # (S, hw, 2+d_in)
        offset_xy = jax.nn.sigmoid(raw[..., :2])
        raw_adapter = raw[..., 2:]

        xy, _ = sample_image_grid((h, w))                     # (h, w, 2)
        pixel_size = jnp.asarray([1.0 / w, 1.0 / h], jnp.float32)
        coords = (xy.reshape(1, h * w, 2)
                  + (offset_xy - 0.5) * pixel_size)           # (S, hw, 2)

        # opacity = max depth probability (mvsdet.py:581-582); duplicate
        # slots zeroed so each unique src contributes once
        opacity = jnp.max(prob, axis=1)[sel].reshape(s, h * w)
        opacity = opacity * first[:, None].astype(opacity.dtype)

        # normalised context intrinsics (mvsdet.py:543-553; the 3D branch
        # handles both the shared-K ScanNet case and the per-view-K
        # ARKit case, mvsdet.py:549-553)
        norm = jnp.asarray([[w], [h], [1.0]], jnp.float32)
        if feat_intrinsic.ndim == 2:
            k_norm = feat_intrinsic[:3, :3] / norm
            k_norm = jnp.broadcast_to(k_norm[None], (s, 3, 3))
            scale = depth_scale_map(h, w, feat_intrinsic[:3, :3])  # (hw, 1)
            scale_sel = scale[None, :, 0]
        else:
            k_norm = feat_intrinsic[sel, :3, :3] / norm[None]
            scale = depth_scale_map(h, w, feat_intrinsic[:, :3, :3])
            scale_sel = scale[sel, :, 0]                      # (S, hw)

        # ray depth (mvsdet.py:583): z-depth / per-pixel z of unit ray
        ray_depth = depth_code[..., 0] / (scale_sel + 1e-8)

        g = adapt_gaussians(src_c2w[sel], k_norm, coords, ray_depth,
                            opacity, raw_adapter, (h, w), mc.gs.adapter)
        flat = lambda t: t.reshape((s * h * w,) + t.shape[2:])
        return Gaussians(means=flat(g.means), covariances=flat(g.covariances),
                         harmonics=flat(g.harmonics),
                         opacities=flat(g.opacities))

    # ------------------------------------------------------------------
    # full forward
    # ------------------------------------------------------------------

    def extract_feat(self, batch: Dict[str, jnp.ndarray], train: bool,
                     view_axis: str = None):
        """Backbone -> sweep -> depth -> lift -> neck; gaussian branch.

        `batch` (single scene, static shapes):
          images: (N, H, W, 3) normalised; denorm_images: (N, H, W, 3);
          w2c: (N, 4, 4); intrinsic: (4, 4) K at image resolution
          (host pipeline pre-scales the original K to the resized
          image); origin: (3,); tgt_c2w: (T, 4, 4); tgt_intrinsic:
          (4, 4) K at target-image resolution.
        """
        mc = self.cfg
        # under view sharding, batch["images"] holds this shard's views
        # while camera arrays (w2c, intrinsics) stay replicated full-size
        images = batch["images"].astype(self.dtype)
        stride = mc.feature_stride

        local_feats = self.image_features(images)             # (Nl, h, w, C)
        h, w = local_feats.shape[1], local_feats.shape[2]
        if view_axis is not None:
            # view-parallel: pool all shards' feature maps over ICI
            # (the TPU-native form of the reference's per-view loop —
            # SURVEY §2c: neighbours may live on any shard)
            feats32 = jax.lax.all_gather(
                local_feats.astype(jnp.float32), view_axis, axis=0,
                tiled=True)                                   # (N, h, w, C)
            local_n = images.shape[0]
            shard = jax.lax.axis_index(view_axis)
            ref_ids = shard * local_n + jnp.arange(local_n)
        else:
            feats32 = local_feats.astype(jnp.float32)
            ref_ids = None
        n = feats32.shape[0]

        feat_intrinsic = scale_intrinsics(batch["intrinsic"], float(stride))
        proj44 = full_projection(batch["w2c"], feat_intrinsic)
        proj34 = proj44[:, :3, :4]

        src_c2w = jnp.linalg.inv(batch["w2c"])
        k_nb = min(mc.plane_sweep_neighbors, n - 1)
        neighbor_ids = knn_camera_neighbors(src_c2w[:, :3, 3], k_nb)

        prob_l, off_l = self.depth_probabilities(feats32, proj44,
                                                 neighbor_ids, train,
                                                 ref_ids=ref_ids)
        if view_axis is not None:
            prob = jax.lax.all_gather(prob_l, view_axis, axis=0, tiled=True)
            off = jax.lax.all_gather(off_l, view_axis, axis=0, tiled=True)
        else:
            prob, off = prob_l, off_l
        est_depth, est_prob, depth_expect = self.sample_depth(prob, off)

        points = voxel_points(mc.n_voxels, mc.voxel_size,
                              batch["origin"]).reshape(3, -1).T  # (V, 3)
        lift_fn = (lift_features_to_voxels_pallas
                   if mc.lift_impl == "pallas" else lift_features_to_voxels)
        # gather in the compute dtype: on TPU the features ARE the
        # backbone's bf16 values, so re-narrowing is lossless and halves
        # the (V, C)-per-view gather traffic; the lift accumulates fp32
        lift_feats = feats32.astype(self.dtype)
        if view_axis is not None:
            # each shard lifts its own views; voxel volume + view counts
            # reduce over ICI (the reference's volume.sum(dim=0),
            # mvsdet.py:511-513, as a psum)
            vol_sum, valid_cnt = lift_fn(
                lift_feats[ref_ids], proj34[ref_ids], est_depth[ref_ids],
                est_prob[ref_ids], points, mc.voxel_size[2])
            vol_sum = jax.lax.psum(vol_sum, view_axis)
            valid_cnt = jax.lax.psum(valid_cnt, view_axis)
        else:
            vol_sum, valid_cnt = lift_fn(
                lift_feats, proj34, est_depth, est_prob, points,
                mc.voxel_size[2])
        volume = finalize_volume(vol_sum, valid_cnt)          # (V, C)
        nx, ny, nz = mc.n_voxels
        volume = volume.reshape(nx, ny, nz, -1)
        valid_cnt = valid_cnt.reshape(nx, ny, nz)

        levels = self.neck3d(volume[None].astype(self.dtype), train)
        levels = [l[0] for l in levels]                       # drop batch dim

        gaussians = None
        if "tgt_c2w" in batch:
            denorm = batch["denorm_images"]
            if view_axis is not None:
                denorm = jax.lax.all_gather(denorm, view_axis, axis=0,
                                            tiled=True)
            gaussians = self.gaussian_branch(
                feats32, denorm, prob, depth_expect,
                src_c2w, feat_intrinsic, batch["tgt_c2w"])

        return dict(levels=levels, valid_count=valid_cnt, est_depth=est_depth,
                    est_prob=est_prob, depth_expect=depth_expect,
                    gaussians=gaussians, prob=prob, proj44=proj44)

    def render_targets(self, gaussians: Gaussians, batch, image_shape):
        """Splat the scene gaussians into every render target view.

        Handles a shared target K (ScanNet) or per-target Ks
        (ARKit, mvsdet.py:645-658).
        """
        tgt_k = batch["tgt_intrinsic"]
        ht, wt = image_shape
        n_tgt = batch["tgt_c2w"].shape[0]
        norm = jnp.asarray([[wt], [ht], [1.0]], jnp.float32)
        bg = jnp.asarray(self.cfg.gs.background_color, jnp.float32)
        if tgt_k.ndim == 2:
            ks = jnp.broadcast_to(tgt_k[:3, :3] / norm, (n_tgt, 3, 3))
        else:
            ks = tgt_k[:, :3, :3] / norm
        if self.cfg.gs.splat_impl == "tiled":
            # every target's tiles in one Pallas launch
            return render_views_tiled(
                gaussians.means, gaussians.covariances,
                gaussians.harmonics, gaussians.opacities,
                batch["tgt_c2w"], ks, image_shape, background=bg,
                capacity=self.cfg.gs.splat_capacity)
        imgs = []
        for t in range(n_tgt):
            imgs.append(render_view(
                gaussians.means, gaussians.covariances,
                gaussians.harmonics, gaussians.opacities,
                batch["tgt_c2w"][t], ks[t], image_shape, background=bg))
        return jnp.stack(imgs)                                # (T, Ht, Wt, 3)

    def render_target_depth(self, gaussians: Gaussians, batch, image_shape):
        """Splat per-gaussian camera depth into each target view.

        The reference's DecoderSplattingCUDA depth mode
        (gs_src/model/decoder/decoder_splatting_cuda.py render_depth →
        cuda_splatting.py:render_cuda with per-gaussian z), consumed by
        GaussianDepthMetric (Indoor_NVS.py:231-283).  Composites the
        gaussian z-depth in the target frame through the same
        alpha-blending as color (value_override), background depth 0.

        Returns (T, H, W) float32.
        """
        tgt_k = batch["tgt_intrinsic"]
        ht, wt = image_shape
        n_tgt = batch["tgt_c2w"].shape[0]
        norm = jnp.asarray([[wt], [ht], [1.0]], jnp.float32)
        if tgt_k.ndim == 2:
            ks = jnp.broadcast_to(tgt_k[:3, :3] / norm, (n_tgt, 3, 3))
        else:
            ks = tgt_k[:, :3, :3] / norm
        w2cs = jnp.linalg.inv(batch["tgt_c2w"])               # (T, 4, 4)
        z = (jnp.einsum("gi,ti->tg", gaussians.means, w2cs[:, 2, :3])
             + w2cs[:, 2, 3][:, None])[..., None]            # (T, G, 1)
        if self.cfg.gs.splat_impl == "tiled":
            d = render_views_tiled(
                gaussians.means, gaussians.covariances,
                gaussians.harmonics, gaussians.opacities,
                batch["tgt_c2w"], ks, image_shape,
                capacity=self.cfg.gs.splat_capacity,
                values_override=z)
            return d[..., 0]
        depths = []
        for t in range(n_tgt):
            d = render_view(
                gaussians.means, gaussians.covariances,
                gaussians.harmonics, gaussians.opacities,
                batch["tgt_c2w"][t], ks[t], image_shape,
                value_override=z[t])
            depths.append(d[..., 0])
        return jnp.stack(depths)

    def _head_points_and_valid(self, valid_count, origin):
        mc = self.cfg
        nx, ny, nz = mc.n_voxels
        sizes = [(nx >> i, ny >> i, nz >> i) for i in range(mc.head.n_levels)]
        pts = multiscale_voxel_points(sizes, mc.voxel_size, origin)
        valids = [
            _upsample_valid(valid_count, s).reshape(-1) for s in sizes
        ]
        return pts, valids

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False,
                 view_axis: str = None):
        """Full forward: losses (train) or raw outputs."""
        out = self.extract_feat(batch, train, view_axis=view_axis)
        head_outs = self.head(out["levels"])
        pts, valids = self._head_points_and_valid(out["valid_count"],
                                                  batch["origin"])
        result = dict(head_outs=head_outs, points=pts, valids=valids,
                      **out)
        if out["gaussians"] is not None and "gt_images" in batch:
            image_shape = batch["gt_images"].shape[1:3]
            result["rendered"] = self.render_targets(out["gaussians"], batch,
                                                     image_shape)
        return result

    def loss(self, batch: Dict[str, jnp.ndarray],
             axis_name=None, view_axis=None) -> Tuple[jnp.ndarray, Dict]:
        """Training losses (`MVSDet.loss`, mvsdet.py:771-843).

        ``axis_name``: mesh axis for the cross-replica positive-count
        average (the reference's DDP `reduce_mean`); None single-device.
        """
        mc = self.cfg
        result = self(batch, train=True, view_axis=view_axis)
        loss_fn = head_loss_rotated if mc.head.with_yaw else head_loss
        losses, aux = loss_fn(
            result["head_outs"], result["points"], result["valids"],
            batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"],
            mc.head, axis_name=axis_name)

        if "rendered" in result and mc.rgb_supervision:
            # plain MSE (use_nerf_mask=False in the flagship config,
            # mvsdet_res50_2x_low_res.py:13; loss at mvsdet.py:878-890)
            rgb = result["rendered"]
            gt = batch["gt_images"]
            losses["loss_nvs"] = jnp.mean((rgb - gt) ** 2)

        if mc.depth_supervision and "depth" in batch:
            # L1 vs source-view GT depth resized to the feature grid
            # (`depth_loss_func_new`, mvsdet.py:893-915)
            est = result["depth_expect"]                      # (N, h, w)
            gt = jax.vmap(lambda d: bilinear_resize(d[..., None],
                                                    est.shape[1:3])[..., 0])(
                batch["depth"])
            mask = gt > 0
            diff = jnp.abs(est - gt)
            losses["loss_depth"] = (jnp.sum(jnp.where(mask, diff, 0.0))
                                    / jnp.maximum(jnp.sum(mask), 1.0))

        total = sum(losses.values())
        aux.update(losses)
        return total, aux

    def predict(self, batch: Dict[str, jnp.ndarray],
                diagnostics: bool = False) -> Dict:
        """Inference: NMS'd boxes + rendered target views
        (`MVSDet.predict`, mvsdet.py:917-1061).

        With ``diagnostics=True`` (static), additionally returns:
          rendered_depth: (T, Ht, Wt) splatted target depth
            (the GaussianDepthMetric input, mvsdet.py:1022-1024);
          weight_gap / src_rmse: GT-depth-assisted lift diagnostics
            (mvsdet.py:984-991, 1053-1058) — requires ``batch["depth"]``.
        """
        result = self(batch, train=False)
        predict_fn = (head_predict_rotated if self.cfg.head.with_yaw
                      else head_predict)
        pred = predict_fn(result["head_outs"], result["points"],
                          result["valids"], self.cfg.head)
        if "rendered" in result:
            pred["rendered"] = result["rendered"]
        pred["depth_expect"] = result["depth_expect"]
        if diagnostics and result["gaussians"] is not None:
            image_shape = (batch["gt_images"].shape[1:3]
                           if "gt_images" in batch
                           else self.cfg.target_size)
            pred["rendered_depth"] = self.render_target_depth(
                result["gaussians"], batch, image_shape)
            # flat gaussian arrays for PLY export (ply_export.py; ref
            # visualization_dump -> save_pcd, mvsdet.py:976-982)
            g = result["gaussians"]
            pred["gs_means"] = g.means
            pred["gs_covariances"] = g.covariances
            pred["gs_harmonics"] = g.harmonics
            pred["gs_opacities"] = g.opacities
        if diagnostics and "depth" in batch:
            from mvsdet_tpu.ops.voxel_lift import lift_diagnostics

            est = result["depth_expect"]
            gt_feat = jax.vmap(
                lambda d: bilinear_resize(d[..., None], est.shape[1:3])
                [..., 0])(batch["depth"])
            points = voxel_points(self.cfg.n_voxels, self.cfg.voxel_size,
                                  batch["origin"]).reshape(3, -1).T
            wg, sr = lift_diagnostics(
                result["proj44"][:, :3, :4], result["est_depth"],
                result["est_prob"], points, self.cfg.voxel_size[2],
                gt_feat, est)
            pred["weight_gap"] = wg
            pred["src_rmse"] = sr
        return pred
