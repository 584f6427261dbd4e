"""Tiled Pallas rasterizer vs the XLA oracle (ops/splat.py).

The tile path must be *exact* (not approximate) whenever per-tile
capacity covers every overlapping splat — same projection, same alpha
cutoff rules, same compositing order.  On CPU the kernel runs in
interpret mode (identical semantics to the compiled TPU kernel).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsdet_tpu.ops import splat, splat_tiles
from mvsdet_tpu.ops.pallas.splat_kernel import (composite_tiles,
                                                composite_tiles_xla)

from test_splat import dc_gaussian, look_at_c2w, norm_k


def random_cloud(g=96, seed=0, spread=0.8, depth_range=(1.0, 4.0)):
    rng = np.random.RandomState(seed)
    means = np.zeros((g, 3), np.float32)
    means[:, 0] = rng.uniform(-spread, spread, g)
    means[:, 1] = rng.uniform(-spread, spread, g)
    means[:, 2] = rng.uniform(*depth_range, g)
    a = rng.randn(g, 3, 3).astype(np.float32) * 0.05
    covs = np.einsum("gij,gkj->gik", a, a) + \
        0.01 ** 2 * np.eye(3, dtype=np.float32)
    harm = rng.randn(g, 3, 4).astype(np.float32) * 0.3
    op = rng.uniform(0.2, 0.95, g).astype(np.float32)
    return (jnp.asarray(means), jnp.asarray(covs), jnp.asarray(harm),
            jnp.asarray(op))


class TestKernelVsXlaTwin:
    def test_composite_matches_xla_twin(self):
        rng = np.random.RandomState(1)
        n_tiles, k, c = 6, 128, 3
        data = np.zeros((n_tiles, 8, k), np.float32)
        data[:, 0] = rng.uniform(0, 48, (n_tiles, k))      # mx
        data[:, 1] = rng.uniform(0, 32, (n_tiles, k))      # my
        data[:, 2] = rng.uniform(0.05, 0.5, (n_tiles, k))  # conic a
        data[:, 3] = rng.uniform(-0.05, 0.05, (n_tiles, k))
        data[:, 4] = rng.uniform(0.05, 0.5, (n_tiles, k))
        data[:, 5] = rng.uniform(0.0, 0.95, (n_tiles, k))  # opacity
        vals = rng.randn(n_tiles, c, k).astype(np.float32)
        out_k = composite_tiles(jnp.asarray(data), jnp.asarray(vals), 3,
                                16, 16, 64)
        out_x = composite_tiles_xla(jnp.asarray(data), jnp.asarray(vals), 3,
                                    16, 16)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_x),
                                   atol=1e-5, rtol=1e-5)

    def test_custom_vjp_matches_xla_grad(self):
        rng = np.random.RandomState(2)
        n_tiles, k, c = 2, 64, 3
        data = np.zeros((n_tiles, 8, k), np.float32)
        data[:, 0] = rng.uniform(0, 32, (n_tiles, k))
        data[:, 1] = rng.uniform(0, 16, (n_tiles, k))
        data[:, 2] = rng.uniform(0.1, 0.4, (n_tiles, k))
        data[:, 4] = rng.uniform(0.1, 0.4, (n_tiles, k))
        data[:, 5] = rng.uniform(0.1, 0.9, (n_tiles, k))
        vals = rng.randn(n_tiles, c, k).astype(np.float32)
        d, v = jnp.asarray(data), jnp.asarray(vals)

        g_k = jax.grad(lambda d, v: jnp.sum(
            composite_tiles(d, v, 2, 16, 16, 64) ** 2), argnums=(0, 1))(d, v)
        g_x = jax.grad(lambda d, v: jnp.sum(
            composite_tiles_xla(d, v, 2, 16, 16) ** 2), argnums=(0, 1))(d, v)
        for a, b in zip(g_k, g_x):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)


class TestTiledVsOracle:
    def _render_pair(self, shape=(32, 48), g=96, capacity=128, seed=0,
                     **kw):
        m, c, h, o = random_cloud(g, seed)
        c2w = look_at_c2w([0, 0, 0], [0, 0.05, 2.5])
        k = norm_k()
        bg = jnp.asarray([0.1, 0.2, 0.3])
        img_o = splat.render_view(m, c, h, o, c2w, k, shape, background=bg,
                                  **kw)
        img_t = splat_tiles.render_view_tiled(m, c, h, o, c2w, k, shape,
                                              background=bg,
                                              capacity=capacity, **kw)
        return np.asarray(img_o), np.asarray(img_t)

    def test_exact_at_full_capacity(self):
        img_o, img_t = self._render_pair()
        assert img_t.shape == img_o.shape
        err = np.max(np.abs(img_o - img_t))
        assert err < 1e-3, f"max abs err {err}"

    def test_nonmultiple_image_size(self):
        """H, W not multiples of 16 exercise the pad/crop path."""
        img_o, img_t = self._render_pair(shape=(30, 41), seed=3)
        assert img_t.shape == (30, 41, 3)
        np.testing.assert_allclose(img_t, img_o, atol=1e-3)

    def test_depth_value_override(self):
        m, c, h, o = random_cloud(48, seed=4)
        c2w = look_at_c2w([0, 0, 0], [0, 0, 2.5])
        depth_vals = m[:, 2:3]
        img_o = splat.render_view(m, c, h, o, c2w, norm_k(), (32, 32),
                                  value_override=depth_vals)
        img_t = splat_tiles.render_view_tiled(
            m, c, h, o, c2w, norm_k(), (32, 32), capacity=64,
            value_override=depth_vals)
        np.testing.assert_allclose(np.asarray(img_t), np.asarray(img_o),
                                   atol=1e-3)

    def test_gradients_match_oracle(self):
        m, c, h, o = random_cloud(32, seed=5)
        c2w = look_at_c2w([0, 0, 0], [0, 0, 2.5])
        target = jnp.zeros((32, 32, 3))

        def loss(render):
            def f(m_, c_, h_, o_):
                img = render(m_, c_, h_, o_)
                return jnp.mean((img - target) ** 2)
            return jax.grad(f, argnums=(0, 1, 2, 3))(m, c, h, o)

        g_o = loss(lambda *a: splat.render_view(*a, c2w, norm_k(), (32, 32)))
        g_t = loss(lambda *a: splat_tiles.render_view_tiled(
            *a, c2w, norm_k(), (32, 32), capacity=64))
        for a, b in zip(g_o, g_t):
            a, b = np.asarray(a), np.asarray(b)
            assert np.all(np.isfinite(b))
            np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-3)

    def test_overflow_drops_far_gaussians_only(self):
        """With capacity 16 << G the near splats still composite first:
        the tiled image stays close to the oracle where transmittance is
        saturated and never *adds* energy."""
        img_o, img_t = self._render_pair(g=256, capacity=16, seed=6)
        # tiled never brighter than oracle + tolerance (it only drops
        # occluded tail gaussians)
        assert np.percentile(img_t - img_o, 99) < 0.15

    def test_render_views_tiled_batch(self):
        m, c, h, o = random_cloud(40, seed=7)
        c2ws = jnp.stack([look_at_c2w([0, 0, 0], [0, 0, 2.5]),
                          look_at_c2w([0.4, 0, 0], [0, 0, 2.5])])
        ks = jnp.stack([norm_k(), norm_k()])
        imgs_t = splat_tiles.render_views_tiled(m, c, h, o, c2ws, ks,
                                                (32, 32), capacity=64)
        imgs_o = splat.render_views(m, c, h, o, c2ws, ks, (32, 32))
        np.testing.assert_allclose(np.asarray(imgs_t), np.asarray(imgs_o),
                                   atol=1e-3)

    def test_batched_views_equal_per_view_launches(self):
        """The single-launch multi-view path (stacked virtual canvas,
        y-shifted tile tables) must reproduce per-view render_view_tiled
        launches exactly — the y shift cancels in the kernel's dx/dy."""
        m, c, h, o = random_cloud(40, seed=11)
        c2ws = jnp.stack([look_at_c2w([0, 0, 0], [0, 0, 2.5]),
                          look_at_c2w([0.4, 0.2, 0], [0, 0, 2.5]),
                          look_at_c2w([-0.3, 0, 0.1], [0, 0, 2.5])])
        ks = jnp.stack([norm_k()] * 3)
        batched = splat_tiles.render_views_tiled(m, c, h, o, c2ws, ks,
                                                 (32, 48), capacity=64)
        for t in range(3):
            single = splat_tiles.render_view_tiled(m, c, h, o, c2ws[t],
                                                   ks[t], (32, 48),
                                                   capacity=64)
            np.testing.assert_allclose(np.asarray(batched[t]),
                                       np.asarray(single), atol=1e-5,
                                       err_msg=f"view {t}")

    def test_batched_values_override_depth_mode(self):
        """values_override (per-view camera z) composites per view."""
        m, c, h, o = random_cloud(30, seed=13)
        c2ws = jnp.stack([look_at_c2w([0, 0, 0], [0, 0, 2.5]),
                          look_at_c2w([0.5, 0, 0], [0, 0, 2.5])])
        ks = jnp.stack([norm_k()] * 2)
        w2cs = jnp.linalg.inv(c2ws)
        z = (jnp.einsum("gi,ti->tg", m, w2cs[:, 2, :3])
             + w2cs[:, 2, 3][:, None])[..., None]
        batched = splat_tiles.render_views_tiled(
            m, c, h, o, c2ws, ks, (32, 32), capacity=64,
            values_override=z)
        for t in range(2):
            single = splat_tiles.render_view_tiled(
                m, c, h, o, c2ws[t], ks[t], (32, 32), capacity=64,
                value_override=z[t])
            np.testing.assert_allclose(np.asarray(batched[t]),
                                       np.asarray(single), atol=1e-5,
                                       err_msg=f"view {t}")
