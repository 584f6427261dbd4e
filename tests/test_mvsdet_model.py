"""End-to-end tests of the flagship MVSDet model on synthetic scenes."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsdet_tpu.config import tiny_test_config
from mvsdet_tpu.data.synthetic import make_synthetic_scene
from mvsdet_tpu.models.mvsdet import MVSDet


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    batch_np = make_synthetic_scene(cfg, seed=0, n_views=4, n_targets=2)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    model = MVSDet(cfg.model, sweep_chunk=2)
    variables = model.init(jax.random.PRNGKey(0), batch, method=MVSDet.loss)
    return cfg, model, variables, batch


class TestForward:
    def test_loss_finite_with_all_terms(self, setup):
        cfg, model, variables, batch = setup
        (total, aux), _ = model.apply(variables, batch, method=MVSDet.loss,
                                      mutable=["batch_stats"])
        assert np.isfinite(float(total))
        for key in ("center_loss", "bbox_loss", "cls_loss", "loss_nvs"):
            assert key in aux, aux.keys()
            assert np.isfinite(float(aux[key]))
        assert float(aux["loss_nvs"]) > 0

    def test_predict_shapes(self, setup):
        cfg, model, variables, batch = setup
        pred = model.apply(variables, batch, method=MVSDet.predict)
        md = cfg.model.head.max_detections
        assert pred["boxes"].shape == (md, 6)
        assert pred["scores"].shape == (md,)
        assert pred["rendered"].shape == (2,) + cfg.model.target_size + (3,)
        n = batch["images"].shape[0]
        h, w = cfg.model.feature_size
        assert pred["depth_expect"].shape == (n, h, w)

    def test_loss_is_jittable_and_differentiable(self, setup):
        cfg, model, variables, batch = setup
        params = variables["params"]
        others = {k: v for k, v in variables.items() if k != "params"}

        @jax.jit
        def loss_fn(p):
            (total, _), _ = model.apply({"params": p, **others}, batch,
                                        method=MVSDet.loss,
                                        mutable=["batch_stats"])
            return total

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # gradient reaches every major subsystem
        flat = {jax.tree_util.keystr(k): v for k, v in
                jax.tree_util.tree_leaves_with_path(g)}
        for sub in ("cost_reg", "to_gaussians", "head", "neck3d", "fpn"):
            total_norm = sum(
                float(jnp.sum(jnp.abs(v))) for k, v in flat.items()
                if sub in k)
            assert total_norm > 0, f"no gradient into {sub}"

    def test_sweep_chunking_invariance(self, setup):
        """Chunk size must not change the result (pure reshaping)."""
        cfg, model, variables, batch = setup
        model1 = MVSDet(cfg.model, sweep_chunk=1)
        out1 = model1.apply(variables, batch, train=False)
        out2 = model.apply(variables, batch, train=False)
        np.testing.assert_allclose(np.asarray(out1["prob"]),
                                   np.asarray(out2["prob"]), rtol=2e-3,
                                   atol=2e-4)

    def test_valid_count_nonzero(self, setup):
        cfg, model, variables, batch = setup
        out = model.apply(variables, batch, train=False)
        assert float(jnp.sum(out["valid_count"])) > 0


class TestDepthSupervision:
    def test_depth_loss_appears(self, setup):
        cfg, model, variables, batch = setup
        import dataclasses
        mc = dataclasses.replace(cfg.model, depth_supervision=True)
        model_d = MVSDet(mc, sweep_chunk=2)
        (total, aux), _ = model_d.apply(variables, batch,
                                        method=MVSDet.loss,
                                        mutable=["batch_stats"])
        assert "loss_depth" in aux
        assert np.isfinite(float(aux["loss_depth"]))


@pytest.mark.slow
class TestFullBatchBN:
    """Faithful-training BatchNorm: when cost_reg_norm='batch' and
    train=True, the sweep scan collapses to one full-view-batch chunk so
    BN statistics match the reference's full-batch BatchNorm3d
    (mvsnet.py:73-113) regardless of the configured sweep_chunk.
    (slow lane: three model inits + train steps, ~3 min on 1 CPU)"""

    def test_train_outputs_and_stats_chunk_invariant(self):
        import dataclasses

        from mvsdet_tpu.config import tiny_test_config

        cfg = tiny_test_config()
        mc = dataclasses.replace(cfg.model, cost_reg_norm="batch")
        batch_np = make_synthetic_scene(cfg, seed=3, n_views=4, n_targets=2)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        outs, stats = [], []
        for chunk in (1, 2, 4):
            model = MVSDet(mc, sweep_chunk=chunk)
            variables = model.init(jax.random.PRNGKey(1), batch,
                                   method=MVSDet.loss)
            (_, aux), mut = model.apply(variables, batch,
                                        method=MVSDet.loss,
                                        mutable=["batch_stats"])
            out = model.apply(variables, batch, train=True,
                              mutable=["batch_stats"])[0]
            outs.append(np.asarray(out["prob"]))
            stats.append(mut["batch_stats"])
        for i in (1, 2):
            np.testing.assert_allclose(outs[i], outs[0], rtol=2e-3,
                                       atol=2e-4)
            a = jax.tree_util.tree_leaves(stats[0])
            b = jax.tree_util.tree_leaves(stats[i])
            for x, y in zip(a, b):
                np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                                           rtol=2e-3, atol=2e-4)

    def test_bn_train_step_differentiable(self):
        import dataclasses

        from mvsdet_tpu.config import tiny_test_config

        cfg = tiny_test_config()
        mc = dataclasses.replace(cfg.model, cost_reg_norm="batch")
        batch_np = make_synthetic_scene(cfg, seed=4, n_views=4, n_targets=2)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        model = MVSDet(mc, sweep_chunk=2)
        variables = model.init(jax.random.PRNGKey(2), batch,
                               method=MVSDet.loss)
        others = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            (total, _), _ = model.apply({"params": p, **others}, batch,
                                        method=MVSDet.loss,
                                        mutable=["batch_stats"])
            return total

        g = jax.grad(loss_fn)(variables["params"])
        costreg_norm = sum(
            float(jnp.sum(jnp.abs(l)))
            for k, l in jax.tree_util.tree_leaves_with_path(g)
            if "cost_reg" in jax.tree_util.keystr(k))
        assert np.isfinite(costreg_norm) and costreg_norm > 0
