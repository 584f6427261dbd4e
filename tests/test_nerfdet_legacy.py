"""Tests for the legacy NeRF-Det model family and its ray-render ops."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsdet_tpu.config import tiny_test_config
from mvsdet_tpu.data.synthetic import make_synthetic_scene
from mvsdet_tpu.models.nerfdet import (NerfDetLegacy, mean_cov_volumes,
                                       simple_backproject)
from mvsdet_tpu.ops import ray_render


class TestRayRenderOps:
    def test_stratified_samples_in_range(self):
        key = jax.random.PRNGKey(0)
        o = jnp.zeros((5, 3))
        d = jnp.tile(jnp.asarray([[0.0, 0, 1]]), (5, 1))
        pts, z = ray_render.sample_along_rays(key, o, d, 0.5, 4.0, 16)
        z = np.asarray(z)
        assert z.shape == (5, 16)
        assert z.min() >= 0.5 - 1e-5 and z.max() <= 4.0 + 1e-5
        assert np.all(np.diff(z, axis=1) > 0)

    def test_det_sampling_is_linspace(self):
        o = jnp.zeros((2, 3))
        d = jnp.ones((2, 3))
        _, z = ray_render.sample_along_rays(None, o, d, 1.0, 2.0, 5,
                                            det=True)
        np.testing.assert_allclose(np.asarray(z)[0],
                                   np.linspace(1, 2, 5), atol=1e-6)

    def test_sample_pdf_concentrates_on_peak(self):
        key = jax.random.PRNGKey(1)
        bins = jnp.broadcast_to(jnp.linspace(0, 1, 8), (4, 8))
        w = jnp.zeros((4, 8)).at[:, 5].set(100.0)
        samples = np.asarray(ray_render.sample_pdf(key, bins, w, 32))
        # nearly all samples near bin 5 (~0.714)
        assert np.mean(np.abs(samples - 5 / 7) < 0.15) > 0.9

    def test_raw2outputs_opaque_surface(self):
        r, s = 3, 10
        z = jnp.broadcast_to(jnp.linspace(1, 2, s), (r, s))
        sigma = jnp.zeros((r, s)).at[:, 4].set(50.0)
        rgb = jnp.zeros((r, s, 3)).at[:, 4, 0].set(1.0)
        out = ray_render.raw2outputs(rgb, sigma, z)
        np.testing.assert_allclose(np.asarray(out["rgb"][:, 0]), 1.0,
                                   atol=1e-3)
        np.testing.assert_allclose(np.asarray(out["depth"]),
                                   float(z[0, 4]), atol=1e-2)

    def test_volume_trilinear_border_and_inside(self):
        vol = jnp.arange(8.0).reshape(2, 2, 2, 1)
        pts = jnp.asarray([[0.5, 0.5, 0.5], [-5.0, 0.5, 0.5]])
        out, inside = ray_render.volume_sample_trilinear(
            vol, pts, (0, 0, 0), (1, 1, 1))
        assert bool(inside[0]) and not bool(inside[1])
        np.testing.assert_allclose(float(out[0, 0]), 3.5, atol=1e-5)

    def test_masked_mean_var(self):
        feat = jnp.asarray([[[1.0], [3.0], [100.0]]])  # (1, 3 views, 1)
        mask = jnp.asarray([[1.0, 1.0, 0.0]])
        mean, var = ray_render.masked_mean_var(feat, mask)
        np.testing.assert_allclose(float(mean[0, 0]), 2.0, atol=1e-5)
        np.testing.assert_allclose(float(var[0, 0]), np.exp(-1.0), rtol=1e-4)

    def test_sample_views_at_points_center_pixel(self):
        # one camera at origin looking +z with identity-ish K
        img = jnp.zeros((1, 8, 8, 3)).at[4, 4].set(0)  # dummy
        img = jnp.ones((1, 8, 8, 3)) * jnp.arange(8).reshape(1, 1, 8, 1)
        k = jnp.eye(4).at[0, 0].set(4.0).at[1, 1].set(4.0) \
            .at[0, 2].set(4.0).at[1, 2].set(4.0)
        w2c = jnp.eye(4)[None]
        pts = jnp.asarray([[0.0, 0.0, 2.0]])  # projects to (4, 4)
        out, mask = ray_render.sample_views_at_points(pts, img, None, w2c, k)
        assert float(mask[0, 0]) == 1.0
        np.testing.assert_allclose(np.asarray(out[0, 0]), 4.0, atol=1e-5)


class TestSimpleBackproject:
    def test_valid_and_values(self):
        rng = np.random.RandomState(0)
        feats = jnp.asarray(rng.rand(2, 4, 6, 3), jnp.float32)
        proj = jnp.asarray(np.tile(np.eye(3, 4, dtype=np.float32)[None],
                                   (2, 1, 1)))
        pts = jnp.asarray([[2.0, 1.0, 1.0], [100.0, 0, 1.0]], jnp.float32)
        vols, valid = simple_backproject(feats, proj, pts)
        assert vols.shape == (2, 2, 3)
        v = np.asarray(valid)
        assert v[0, 0] and not v[0, 1]
        np.testing.assert_allclose(np.asarray(vols[0, 0]),
                                   np.asarray(feats[0, 1, 2]), atol=1e-6)

    def test_mean_cov(self):
        pv = jnp.asarray([[[2.0]], [[4.0]]])   # 2 views, 1 voxel, 1 ch
        valid = jnp.asarray([[True], [True]])
        mean, cov, cnt = mean_cov_volumes(pv, valid)
        np.testing.assert_allclose(float(mean[0, 0]), 3.0, atol=1e-5)
        np.testing.assert_allclose(float(cov[0, 0]), np.exp(-1.0), rtol=1e-4)
        assert float(cnt[0]) == 2


@pytest.fixture(scope="module")
def legacy_setup():
    cfg = tiny_test_config()
    batch_np = make_synthetic_scene(cfg, seed=0, n_views=4, n_targets=2)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = NerfDetLegacy(cfg.model, n_samples=8, n_rand=64)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "rays": jax.random.PRNGKey(1)},
        batch, method=NerfDetLegacy.loss)
    return cfg, model, variables, batch


class TestNerfDetLegacy:
    def test_loss_terms(self, legacy_setup):
        cfg, model, variables, batch = legacy_setup
        (total, aux), _ = model.apply(
            variables, batch, method=NerfDetLegacy.loss,
            mutable=["batch_stats"], rngs={"rays": jax.random.PRNGKey(2)})
        assert np.isfinite(float(total))
        for k in ("cls_loss", "loss_nvs", "loss_depth"):
            assert k in aux and np.isfinite(float(aux[k]))

    def test_predict_runs(self, legacy_setup):
        cfg, model, variables, batch = legacy_setup
        pred = model.apply(variables, batch, method=NerfDetLegacy.predict)
        assert pred["boxes"].shape == (cfg.model.head.max_detections, 6)

    @pytest.mark.slow
    def test_gradients_reach_nerf_mlp(self, legacy_setup):
        cfg, model, variables, batch = legacy_setup
        params = variables["params"]
        others = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            (total, _), _ = model.apply(
                {"params": p, **others}, batch, method=NerfDetLegacy.loss,
                mutable=["batch_stats"],
                rngs={"rays": jax.random.PRNGKey(3)})
            return total

        g = jax.grad(loss_fn)(params)
        flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(g)}
        for sub in ("nerf_mlp", "mapping", "head"):
            norm = sum(float(jnp.sum(jnp.abs(v)))
                       for k, v in flat.items() if sub in k)
            assert norm > 0, f"no grad into {sub}"
