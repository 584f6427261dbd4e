"""Property tests for the Gaussian adapter and splatting renderer."""

import numpy as np

import jax
import jax.numpy as jnp

from mvsdet_tpu.config import GaussianAdapterConfig
from mvsdet_tpu.models import gaussian_head
from mvsdet_tpu.ops import splat

SH_DC = 0.28209479177387814


def look_at_c2w(eye, target, up=(0, 0, 1)):
    eye = np.asarray(eye, np.float64)
    fwd = np.asarray(target, np.float64) - eye
    fwd /= np.linalg.norm(fwd)
    up = np.asarray(up, np.float64)
    if abs(fwd @ up) > 0.99:  # degenerate: camera looks along up
        up = np.array([0.0, -1.0, 0.0])
    right = np.cross(fwd, up)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
    return jnp.asarray(c2w, jnp.float32)


def norm_k(fx=1.0, fy=1.0, cx=0.5, cy=0.5):
    return jnp.asarray([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], jnp.float32)


def dc_gaussian(pos, color, scale=0.05, opacity=0.95):
    """Single isotropic gaussian with DC-only SH for the given color."""
    mean = jnp.asarray([pos], jnp.float32)
    cov = jnp.asarray([np.eye(3) * scale**2], jnp.float32)
    # eval_sh_color returns C0*dc + 0.5 -> dc = (c - 0.5)/C0
    dc = (np.asarray(color) - 0.5) / SH_DC
    harm = jnp.asarray(dc, jnp.float32).reshape(1, 3, 1)
    op = jnp.asarray([opacity], jnp.float32)
    return mean, cov, harm, op


class TestRenderView:
    def test_gaussian_centre_lands_on_projected_pixel(self):
        c2w = look_at_c2w([0, 0, 0], [0, 0, 1])  # camera at origin facing +z
        k = norm_k()
        m, c, h, o = dc_gaussian([0.2, 0.1, 2.0], [1.0, 0.0, 0.0])
        img = np.asarray(splat.render_view(m, c, h, o, c2w, k, (32, 32)))
        # expected pixel: x = fx*W*(0.2/2) + 0.5*W = 32*0.1+16 = 19.2
        #                 y = 32*0.05+16 = 17.6
        yy, xx = np.unravel_index(img[..., 0].argmax(), (32, 32))
        assert abs(xx - 19.2) <= 1.0 and abs(yy - 17.6) <= 1.0
        # red channel dominates
        assert img[yy, xx, 0] > 0.5 and img[yy, xx, 1] < 0.2

    def test_zero_opacity_gives_background(self):
        c2w = look_at_c2w([0, 0, 0], [0, 0, 1])
        m, c, h, o = dc_gaussian([0, 0, 2.0], [1.0, 1.0, 1.0], opacity=0.0)
        bg = jnp.asarray([0.1, 0.2, 0.3])
        img = np.asarray(splat.render_view(m, c, h, o, c2w, norm_k(), (8, 8),
                                           background=bg))
        np.testing.assert_allclose(img, np.broadcast_to([0.1, 0.2, 0.3],
                                                        (8, 8, 3)), atol=1e-5)

    def test_behind_camera_is_culled(self):
        c2w = look_at_c2w([0, 0, 0], [0, 0, 1])
        m, c, h, o = dc_gaussian([0, 0, -2.0], [1.0, 1.0, 1.0])
        img = np.asarray(splat.render_view(m, c, h, o, c2w, norm_k(), (8, 8)))
        np.testing.assert_allclose(img, 0.0, atol=1e-6)

    def test_occlusion_order(self):
        c2w = look_at_c2w([0, 0, 0], [0, 0, 1])
        m1, c1, h1, o1 = dc_gaussian([0, 0, 1.5], [1.0, 0.0, 0.0],
                                     scale=0.3, opacity=0.99)
        m2, c2, h2, o2 = dc_gaussian([0, 0, 3.0], [0.0, 1.0, 0.0],
                                     scale=0.6, opacity=0.99)
        # feed far-first to prove sorting, not input order, decides
        m = jnp.concatenate([m2, m1])
        c = jnp.concatenate([c2, c1])
        h = jnp.concatenate([h2, h1])
        o = jnp.concatenate([o2, o1])
        img = np.asarray(
            splat.render_view(m, c, h, o, c2w, norm_k(), (16, 16)))
        centre = img[8, 8]
        assert centre[0] > 0.8 and centre[1] < 0.1  # near red wins

    def test_gradients_flow_to_all_gaussian_params(self):
        c2w = look_at_c2w([0, 0, 0], [0, 0, 1])
        m, c, h, o = dc_gaussian([0.05, 0.0, 2.0], [0.9, 0.4, 0.2],
                                 scale=0.2)
        target = jnp.zeros((8, 8, 3))

        def loss(means, covs, harm, op):
            img = splat.render_view(means, covs, harm, op, c2w, norm_k(),
                                    (8, 8))
            return jnp.mean((img - target) ** 2)

        grads = jax.grad(loss, argnums=(0, 1, 2, 3))(m, c, h, o)
        for g in grads:
            arr = np.asarray(g)
            assert np.all(np.isfinite(arr))
            assert np.abs(arr).max() > 0

    def test_depth_render_mode(self):
        c2w = look_at_c2w([0, 0, 0], [0, 0, 1])
        m, c, h, o = dc_gaussian([0, 0, 2.5], [1.0, 1.0, 1.0], scale=0.4,
                                 opacity=0.99)
        depth_vals = jnp.asarray([[2.5]], jnp.float32)
        img = np.asarray(splat.render_view(
            m, c, h, o, c2w, norm_k(), (16, 16), value_override=depth_vals))
        assert abs(img[8, 8, 0] - 2.5) < 0.2

    def test_render_views_batch(self):
        c2w = jnp.stack([look_at_c2w([0, 0, 0], [0, 0, 1]),
                         look_at_c2w([0.5, 0, 0], [0.5, 0, 1])])
        ks = jnp.stack([norm_k(), norm_k()])
        m, c, h, o = dc_gaussian([0, 0, 2.0], [1.0, 0.5, 0.25], scale=0.3)
        imgs = np.asarray(splat.render_views(m, c, h, o, c2w, ks, (8, 8)))
        assert imgs.shape == (2, 8, 8, 3)
        assert not np.allclose(imgs[0], imgs[1])


class TestGaussianAdapter:
    def _cfg(self):
        return GaussianAdapterConfig(sh_degree=1)

    def test_means_on_pixel_rays(self):
        cfg = self._cfg()
        v, r = 2, 6
        rng = np.random.RandomState(0)
        c2w = jnp.stack([look_at_c2w([1, 0, 0], [0, 0, 1]),
                         look_at_c2w([0, 1.5, 0.5], [0, 0, 0.5])])
        k = jnp.stack([norm_k(), norm_k()])
        coords = jnp.asarray(rng.rand(v, r, 2), jnp.float32)
        depths = jnp.asarray(rng.rand(v, r) * 2 + 0.5, jnp.float32)
        op = jnp.asarray(rng.rand(v, r), jnp.float32)
        raw = jnp.asarray(rng.randn(v, r, cfg.d_in), jnp.float32)
        g = gaussian_head.adapt_gaussians(c2w, k, coords, depths, op, raw,
                                          (16, 16), cfg)
        assert g.means.shape == (v, r, 3)
        assert g.covariances.shape == (v, r, 3, 3)
        assert g.harmonics.shape == (v, r, 3, cfg.d_sh)
        # each mean at distance `depth` from its camera centre
        for i in range(v):
            cam = np.asarray(c2w[i][:3, 3])
            dist = np.linalg.norm(np.asarray(g.means[i]) - cam, axis=-1)
            np.testing.assert_allclose(dist, np.asarray(depths[i]),
                                       rtol=1e-4, atol=1e-4)

    def test_covariance_scale_range(self):
        cfg = self._cfg()
        c2w = look_at_c2w([0, 0, 0], [0, 0, 1])[None]
        k = norm_k()[None]
        coords = jnp.full((1, 4, 2), 0.5)
        depths = jnp.ones((1, 4))
        op = jnp.ones((1, 4))
        raw = jnp.zeros((1, 4, cfg.d_in))
        g = gaussian_head.adapt_gaussians(c2w, k, coords, depths, op, raw,
                                          (16, 16), cfg)
        cov = np.asarray(g.covariances)[0, 0]
        eig = np.linalg.eigvalsh(cov)
        # sigmoid(0)=0.5 -> scale = (0.5+15)/2 * depth * mult; mult = 0.1*2/16
        expected_scale = (0.5 + (15 - 0.5) * 0.5) * 1.0 * (0.1 * 2 / 16)
        np.testing.assert_allclose(np.sqrt(eig), expected_scale, rtol=1e-3)

    def test_sh_mask_damps_higher_degrees(self):
        cfg = self._cfg()
        m = np.asarray(gaussian_head.sh_mask(cfg))
        np.testing.assert_allclose(m[0], 1.0)
        np.testing.assert_allclose(m[1:4], 0.1 * 0.25)
