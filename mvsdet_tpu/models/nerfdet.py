"""Legacy NeRF-Det detector (flax) — the reference's second model family.

TPU-native re-design of `NerfDet` (ref:
projects/NeRF-Det/nerfdet/nerfdet.py:20-632): same lift-splat detection
backbone as MVSDet but with *unweighted* voxel lifting and a NeRF-MLP
volume-rendering supervision branch instead of Gaussian splatting:

  images -> ResNet50+FPN[0]
    -> simple backproject (all in-frustum voxels, nerfdet.py:570-632)
    -> mean volume + exp(-variance) volume       (:220-231)
    -> [nerf_density] NeRF density query at voxel centres scales the
       mean volume                                (:281-318)
    -> IndoorImVoxelNeck -> NerfDetHead
  NeRF branch ('image' mode, the configured path — nerfdet config
  nerf_mode='image', mvsdet_res50_2x_low_res_depth.py:54):
    sample N_rand target rays -> stratified points -> project into all
    source views -> bilinear rgb+mapped-feature sampling -> masked
    mean/exp(-var) pooling -> VanillaNeRF -> composite -> masked MSE
    (+ optional depth loss)                       (render_ray.py:231-305)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvsdet_tpu.config import ModelConfig
from mvsdet_tpu.geometry.cameras import scale_intrinsics
from mvsdet_tpu.geometry.rays import pixel_ray_dirs
from mvsdet_tpu.geometry.voxels import multiscale_voxel_points, voxel_points
from mvsdet_tpu.models.fpn import FPN
from mvsdet_tpu.models.head import DetectionHead, head_loss, head_predict
from mvsdet_tpu.models.mvsdet import _upsample_valid
from mvsdet_tpu.models.neck3d import IndoorImVoxelNeck
from mvsdet_tpu.models.nerf_mlp import VanillaNeRF
from mvsdet_tpu.models.resnet import ResNet50
from mvsdet_tpu.ops import ray_render
from mvsdet_tpu.utils.precision import feinsum

Dtype = Any


def simple_backproject(features: jnp.ndarray, proj34: jnp.ndarray,
                       points: jnp.ndarray):
    """Unweighted nearest-pixel voxel lifting (`backproject`,
    nerfdet.py:570-632 with depth=None).

    Args:
      features: (N, h, w, C); proj34: (N, 3, 4); points: (V, 3).

    Returns:
      per-view volume (N, V, C) and valid (N, V) bool.
    """
    n, h, w, c = features.shape

    def one(feat, proj):
        homo = jnp.concatenate([points, jnp.ones_like(points[:, :1])], -1)
        p = feinsum("ij,vj->vi", proj, homo)
        z = p[:, 2]
        z_safe = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        x = jnp.round(p[:, 0] / z_safe).astype(jnp.int32)
        y = jnp.round(p[:, 1] / z_safe).astype(jnp.int32)
        valid = (x >= 0) & (y >= 0) & (x < w) & (y < h) & (z > 0)
        pix = jnp.clip(y, 0, h - 1) * w + jnp.clip(x, 0, w - 1)
        vals = jnp.take(feat.reshape(h * w, -1), pix, axis=0)
        return vals * valid[:, None], valid

    # scan, not vmap: the real-TPU backend miscompiles batched gathers
    # whose indices are produced in-graph (project->round->clip->take);
    # diagnosed on-chip for the identical pattern in ops/voxel_lift.py
    # (see its comment) — the scanned lowering matches a float64 oracle.
    def body(_, xs):
        feat, proj = xs
        return None, one(feat, proj)

    _, out = jax.lax.scan(body, None, (features, proj34))
    return out


def mean_cov_volumes(per_view: jnp.ndarray, valid: jnp.ndarray):
    """Mean volume + exp(-variance) volume over views (nerfdet.py:220-231).

    Args:
      per_view: (N, V, C); valid: (N, V).

    Returns:
      mean (V, C) zeroed outside, cov (V, C) = exp(-var), ~0 outside.
    """
    cnt = jnp.sum(valid.astype(jnp.float32), axis=0)          # (V,)
    mean = jnp.sum(per_view, axis=0) / (cnt[:, None] + 1e-8)
    mean = jnp.where(cnt[:, None] > 0, mean, 0.0)
    var = jnp.sum((per_view - mean[None]) ** 2, axis=0) / (cnt[:, None] + 1e-8)
    var = jnp.where(cnt[:, None] > 0, var, 1e6)
    return mean, jnp.exp(-var), cnt


class NerfDetLegacy(nn.Module):
    """Single-scene legacy NeRF-Det forward/loss/predict."""

    cfg: ModelConfig
    n_samples: int = 64           # ray samples (N_samples, nerfdet.py:89)
    n_rand: int = 2048            # rays per step (N_rand, :90)
    squeeze_scale: int = 4        # nerf_feature_dim = C/4 (:96)
    nerf_density: bool = True     # density-scaled volume (:281-318)
    use_nerf_mask: bool = True
    depth_supervision: bool = True
    dtype: Dtype = jnp.float32

    def setup(self):
        mc = self.cfg
        c = mc.backbone.fpn_out_channels
        self.nerf_feature_dim = c // self.squeeze_scale
        self.backbone = ResNet50(depth=mc.backbone.depth,
                                 frozen_stages=mc.backbone.frozen_stages,
                                 dtype=self.dtype)
        self.fpn = FPN(out_channels=c, dtype=self.dtype)
        self.neck3d = IndoorImVoxelNeck(in_channels=c,
                                        out_channels=mc.neck3d_out_channels,
                                        dtype=self.dtype)
        self.head = DetectionHead(mc.head, dtype=self.dtype)
        # feature_dim = nerf_feature_dim + 6 == 2 * (dim/2 + 3)
        # (nerfdet.py:101: mapped features + rgb, mean & exp(-var) halves)
        self.nerf_mlp = VanillaNeRF(net_depth=4, net_width=256, skip_layer=3,
                                    feature_dim=self.nerf_feature_dim + 6,
                                    dtype=self.dtype)
        self.mapping = nn.Dense(self.nerf_feature_dim // 2, name="mapping",
                                dtype=self.dtype)

    def extract_feat(self, batch: Dict[str, jnp.ndarray], train: bool,
                     rays_key: Optional[jax.Array] = None):
        mc = self.cfg
        images = batch["images"].astype(self.dtype)
        stride = mc.feature_stride
        feats = self.fpn(self.backbone(images))[0]            # (N, h, w, C)
        feats32 = feats.astype(jnp.float32)
        n, h, w, c = feats32.shape

        feat_k = scale_intrinsics(batch["intrinsic"], float(stride))
        proj34 = feinsum("ij,njk->nik", feat_k[:3, :3],
                         batch["w2c"][:, :3, :4])

        points = voxel_points(mc.n_voxels, mc.voxel_size,
                              batch["origin"]).reshape(3, -1).T
        per_view, valid = simple_backproject(feats32, proj34, points)
        mean, cov, cnt = mean_cov_volumes(per_view, valid)

        render = None
        if rays_key is not None and "gt_images" in batch:
            render = self.nerf_branch(batch, feats32, per_view, valid, cnt,
                                      points, rays_key, train)

        volume = mean
        if self.nerf_density:
            # density scaling is part of extract_feat in BOTH modes in
            # the reference (nerfdet.py:281-318 runs under
            # `if ray_batch is not None`, and the test pipeline supplies
            # rays too) — gating it on the training-only ray branch
            # would train the head on alpha-scaled volumes but evaluate
            # it on unscaled ones
            alpha = self.voxel_density(batch, per_view, cnt, points)
            volume = alpha[:, None] * mean
            volume = jnp.where(cnt[:, None] > 0, volume, 0.0)

        nx, ny, nz = mc.n_voxels
        levels = self.neck3d(volume.reshape(1, nx, ny, nz, c)
                             .astype(self.dtype), train)
        levels = [l[0] for l in levels]
        return dict(levels=levels, valid_count=cnt.reshape(nx, ny, nz),
                    render=render)

    def nerf_branch(self, batch, feats32, per_view, valid, cnt, points,
                    rays_key, train):
        """Image-mode NeRF supervision (render_rays, render_ray.py:231-305)
        + voxel density query (nerfdet.py:281-318)."""
        mc = self.cfg
        n, h, w, c = feats32.shape
        tgt_imgs = batch["gt_images"]                         # (T, Ht, Wt, 3)
        t_cnt, ht, wt = tgt_imgs.shape[:3]

        # --- sample N_rand target rays (train) over all targets
        k1, k2, k3 = jax.random.split(rays_key, 3)
        margin = 4
        ys = jax.random.randint(k1, (self.n_rand,), margin, ht - margin)
        xs = jax.random.randint(k2, (self.n_rand,), margin, wt - margin)
        ts = jax.random.randint(k3, (self.n_rand,), 0, t_cnt)
        pixel = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)
        tgt_k = batch["tgt_intrinsic"][:3, :3]
        dirs = jax.vmap(lambda pc, ti: pixel_ray_dirs(
            pc, tgt_k, batch["tgt_c2w"][ti][:3, :3]))(pixel, ts)
        origins = batch["tgt_c2w"][ts][:, :3, 3]
        gt_rgb = tgt_imgs[ts, ys, xs]                         # (R, 3)

        pts, z_vals = ray_render.sample_along_rays(
            jax.random.fold_in(rays_key, 7), origins, dirs,
            *mc.near_far_range, self.n_samples, det=not train)

        # --- multi-view rgb + mapped-feature aggregation
        feat_map = self.mapping(feats32)                      # (N, h, w, C/8)
        flat_pts = pts.reshape(-1, 3)
        sampled, mask = ray_render.sample_views_at_points(
            flat_pts, batch["denorm_images"], feat_map, batch["w2c"],
            batch["intrinsic"])
        mean_f, var_f = ray_render.masked_mean_var(sampled, mask)
        globalfeat = jnp.concatenate([mean_f, var_f], axis=-1)
        globalfeat = globalfeat.reshape(self.n_rand, self.n_samples, -1)
        view_count = mask.sum(axis=1).reshape(self.n_rand, self.n_samples)

        rgb_pts, sigma = self.nerf_mlp(pts, dirs, globalfeat)
        out = ray_render.raw2outputs(rgb_pts, sigma[..., 0], z_vals)
        # pixel mask: rays whose samples see >1 view at least 8 times
        # (raw2outputs mask semantics, render_ray.py:214-216)
        ray_mask = (view_count > 1).sum(axis=1) > 8

        return dict(rgb=out["rgb"], depth=out["depth"], gt_rgb=gt_rgb,
                    ray_mask=ray_mask, ray_ts=ts, ray_ys=ys, ray_xs=xs)

    def voxel_density(self, batch, per_view, cnt, points):
        """NeRF-MLP density query at voxel centres -> alpha (V,)
        (the nerf_density path, nerfdet.py:281-318): rgb + mapped
        feature volumes pooled to mean / exp(-var), density through the
        shared MLP.  Runs in train AND predict."""
        rgb_per_view, _ = simple_backproject(
            batch["denorm_images"].astype(jnp.float32),
            feinsum("ij,njk->nik", batch["intrinsic"][:3, :3],
                    batch["w2c"][:, :3, :4]),
            points)                                           # (N, V, 3)
        mapped = self.mapping(per_view)                       # (N, V, C/8)
        mapped = jnp.concatenate([rgb_per_view, mapped], axis=-1)
        m_mean = jnp.sum(mapped, axis=0) / (cnt[:, None] + 1e-8)
        m_var = (jnp.sum((mapped - m_mean[None]) ** 2, axis=0)
                 / (cnt[:, None] + 1e-8))
        m_var = jnp.where(cnt[:, None] > 0, m_var, 1e6)
        glob = jnp.concatenate([m_mean, jnp.exp(-m_var)], axis=-1)
        density = self.nerf_mlp.query_density(points, glob)[:, 0]
        return 1.0 - jnp.exp(-density)

    def __call__(self, batch: Dict[str, jnp.ndarray], train: bool = False,
                 rays_key: Optional[jax.Array] = None):
        out = self.extract_feat(batch, train, rays_key)
        head_outs = self.head(out["levels"])
        mc = self.cfg
        nx, ny, nz = mc.n_voxels
        sizes = [(nx >> i, ny >> i, nz >> i) for i in range(mc.head.n_levels)]
        pts = multiscale_voxel_points(sizes, mc.voxel_size, batch["origin"])
        valids = [_upsample_valid(out["valid_count"], s).reshape(-1)
                  for s in sizes]
        return dict(head_outs=head_outs, points=pts, valids=valids, **out)

    def loss(self, batch: Dict[str, jnp.ndarray],
             axis_name=None) -> Tuple[jnp.ndarray, Dict]:
        """Detection + NeRF losses (`NerfDet.loss`, nerfdet.py:327-405)."""
        rays_key = self.make_rng("rays")
        result = self(batch, train=True, rays_key=rays_key)
        losses, aux = head_loss(
            result["head_outs"], result["points"], result["valids"],
            batch["gt_boxes"], batch["gt_labels"], batch["gt_mask"],
            self.cfg.head, axis_name=axis_name)
        render = result["render"]
        if render is not None:
            diff = (render["rgb"] - render["gt_rgb"]) ** 2
            if self.use_nerf_mask:
                m = render["ray_mask"].astype(jnp.float32)
                losses["loss_nvs"] = (jnp.sum(m[:, None] * diff)
                                      / (jnp.sum(m) + 1e-6))
            else:
                losses["loss_nvs"] = jnp.mean(diff)
            if self.depth_supervision and "gt_depth" in batch:
                gt_d = batch["gt_depth"][render["ray_ts"], render["ray_ys"],
                                         render["ray_xs"]]
                dm = (gt_d > 0).astype(jnp.float32)
                losses["loss_depth"] = (
                    jnp.sum(dm * jnp.abs(render["depth"] - gt_d))
                    / (jnp.sum(dm) + 1e-6))
        total = sum(losses.values())
        aux.update(losses)
        return total, aux

    def predict(self, batch: Dict[str, jnp.ndarray]) -> Dict:
        result = self(batch, train=False)
        return head_predict(result["head_outs"], result["points"],
                            result["valids"], self.cfg.head)
