"""Pallas fused voxel-lift kernel vs the XLA scan oracle.

Exactness of forward, valid counts, view masking, and gradients (to
features AND to est_prob through the custom VJP).  Runs in interpret
mode on CPU (ops/pallas/lift_kernel.py picks interpret automatically).
"""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mvsdet_tpu.ops import voxel_lift


def _inputs(seed=3, n=3, h=6, w=8, c=4, kk=2, v=48):
    rng = np.random.RandomState(seed)
    feats = rng.rand(n, h, w, c).astype(np.float32)
    # forward-facing cameras with some rotation jitter
    proj = np.zeros((n, 3, 4), np.float32)
    for i in range(n):
        ang = rng.uniform(-0.3, 0.3)
        rot = np.array([[np.cos(ang), -np.sin(ang), 0],
                        [np.sin(ang), np.cos(ang), 0],
                        [0, 0, 1]], np.float32)
        kmat = np.array([[6.0, 0, w / 2], [0, 6.0, h / 2], [0, 0, 1]],
                        np.float32)
        proj[i, :, :3] = kmat @ rot
        proj[i, :, 3] = kmat @ rng.uniform(-0.2, 0.2, 3)
    pts = (rng.rand(v, 3) * 2 - 1).astype(np.float32)
    pts[:, 2] += 1.5
    est_depth = (rng.rand(n, h, w, kk) * 3 + 0.3).astype(np.float32)
    est_prob = rng.rand(n, h, w, kk).astype(np.float32)
    return feats, proj, est_depth, est_prob, pts


class TestLiftPallas:
    def test_forward_matches_xla_oracle(self):
        feats, proj, est_depth, est_prob, pts = _inputs()
        args = [jnp.asarray(a) for a in
                (feats, proj, est_depth, est_prob, pts)]
        vol_x, cnt_x = voxel_lift.lift_features_to_voxels(*args, 0.4)
        vol_p, cnt_p = voxel_lift.lift_features_to_voxels_pallas(*args, 0.4)
        np.testing.assert_allclose(np.asarray(cnt_p), np.asarray(cnt_x))
        np.testing.assert_allclose(np.asarray(vol_p), np.asarray(vol_x),
                                   atol=1e-5, rtol=1e-5)
        assert float(jnp.abs(jnp.asarray(vol_p)).max()) > 0  # non-trivial

    def test_forward_matches_at_nondivisible_v(self):
        # V=37 exercises the TILE padding path
        feats, proj, est_depth, est_prob, pts = _inputs(v=37)
        args = [jnp.asarray(a) for a in
                (feats, proj, est_depth, est_prob, pts)]
        vol_x, cnt_x = voxel_lift.lift_features_to_voxels(*args, 0.4)
        vol_p, cnt_p = voxel_lift.lift_features_to_voxels_pallas(*args, 0.4)
        np.testing.assert_allclose(np.asarray(vol_p), np.asarray(vol_x),
                                   atol=1e-5, rtol=1e-5)

    def test_view_mask(self):
        feats, proj, est_depth, est_prob, pts = _inputs()
        args = [jnp.asarray(a) for a in
                (feats, proj, est_depth, est_prob, pts)]
        mask = jnp.asarray([True, False, True])
        vol_x, cnt_x = voxel_lift.lift_features_to_voxels(
            *args, 0.4, view_mask=mask)
        vol_p, cnt_p = voxel_lift.lift_features_to_voxels_pallas(
            *args, 0.4, view_mask=mask)
        np.testing.assert_allclose(np.asarray(cnt_p), np.asarray(cnt_x))
        np.testing.assert_allclose(np.asarray(vol_p), np.asarray(vol_x),
                                   atol=1e-5, rtol=1e-5)

    @pytest.mark.slow
    def test_model_level_lift_impl_flag(self):
        """MVSDet with cfg.model.lift_impl='pallas' produces a volume
        close to the default XLA lift (same params, same batch)."""
        import dataclasses

        from mvsdet_tpu.config import tiny_test_config
        from mvsdet_tpu.data.synthetic import make_synthetic_scene
        from mvsdet_tpu.models.mvsdet import MVSDet

        cfg = tiny_test_config()
        batch = {k: jnp.asarray(v) for k, v in
                 make_synthetic_scene(cfg, seed=0, n_views=3,
                                      n_targets=1).items()}
        model_x = MVSDet(cfg.model, sweep_chunk=1)
        variables = model_x.init(jax.random.PRNGKey(0), batch,
                                 method=MVSDet.loss)
        cfg_p = dataclasses.replace(cfg.model, lift_impl="pallas")
        model_p = MVSDet(cfg_p, sweep_chunk=1)
        out_x = model_x.apply(variables, batch, False,
                              method=MVSDet.extract_feat)
        out_p = model_p.apply(variables, batch, False,
                              method=MVSDet.extract_feat)
        np.testing.assert_allclose(np.asarray(out_p["valid_count"]),
                                   np.asarray(out_x["valid_count"]))
        np.testing.assert_allclose(np.asarray(out_p["levels"][0]),
                                   np.asarray(out_x["levels"][0]),
                                   atol=1e-3, rtol=1e-3)

    def test_gradients_match_oracle(self):
        feats, proj, est_depth, est_prob, pts = _inputs()
        proj_j, depth_j, pts_j = (jnp.asarray(proj), jnp.asarray(est_depth),
                                  jnp.asarray(pts))

        def loss(fn, feats_, prob_):
            vol, cnt = fn(feats_, proj_j, depth_j, prob_, pts_j, 0.4)
            out = voxel_lift.finalize_volume(vol, cnt)
            return jnp.sum(out * jnp.cos(jnp.arange(out.size)
                                         .reshape(out.shape)))

        gx = jax.grad(lambda f, p: loss(
            voxel_lift.lift_features_to_voxels, f, p), argnums=(0, 1))(
            jnp.asarray(feats), jnp.asarray(est_prob))
        gp = jax.grad(lambda f, p: loss(
            voxel_lift.lift_features_to_voxels_pallas, f, p), argnums=(0, 1))(
            jnp.asarray(feats), jnp.asarray(est_prob))
        for a, b, name in [(gx[0], gp[0], "dfeat"), (gx[1], gp[1], "dprob")]:
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       atol=1e-4, rtol=1e-4, err_msg=name)
        assert float(jnp.abs(gp[0]).max()) > 0
        assert float(jnp.abs(gp[1]).max()) > 0
