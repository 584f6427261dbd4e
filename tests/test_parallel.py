"""Multi-device tests on the virtual 8-device CPU mesh.

What the reference never had (SURVEY §4: "no distributed test"):
correctness of the sharded path is checked against the unsharded
computation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvsdet_tpu.config import tiny_test_config
from mvsdet_tpu.data.synthetic import make_synthetic_scene
from mvsdet_tpu.models.mvsdet import MVSDet
from mvsdet_tpu.parallel.mesh import make_mesh
from mvsdet_tpu.parallel.sharding import make_sharded_train_step, shard_batch
from mvsdet_tpu.training.loop import create_train_state


def _scene_batch(cfg, seed, n_views=4, n_targets=2):
    return {k: jnp.asarray(v) for k, v in
            make_synthetic_scene(cfg, seed=seed, n_views=n_views,
                                 n_targets=n_targets).items()}


def _stack_scenes(scenes):
    return {k: jnp.stack([s[k] for s in scenes]) for k in scenes[0]}


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8
    cfg = tiny_test_config()
    scenes = [_scene_batch(cfg, seed) for seed in (0, 1)]
    model, state, tx = create_train_state(
        cfg, jax.random.PRNGKey(0), scenes[0], steps_per_epoch=100,
        sweep_chunk=2)
    return cfg, scenes, model, state, tx


class TestMesh:
    def test_make_mesh_shape(self):
        mesh = make_mesh(data=2, view=4)
        assert mesh.shape == {"data": 2, "view": 4}

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(data=8, view=4)


class TestDataParallel:
    def test_two_scene_step_runs_and_matches_mean(self, setup):
        cfg, scenes, model, state, tx = setup
        mesh = make_mesh(data=2, view=1)
        batch = _stack_scenes(scenes)
        step = make_sharded_train_step(model, tx, mesh, batch)
        new_state, metrics = step(state, shard_batch(batch, mesh))
        assert np.isfinite(float(metrics["loss"]))

        # reference: mean of per-scene losses with cross-replica n_pos
        def single_loss(scene, n_pos_override):
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats,
                         "frozen": state.frozen}
            (total, aux), _ = model.apply(variables, scene,
                                          method=MVSDet.loss,
                                          mutable=["batch_stats"])
            return total, aux

        # compute n_pos per scene first, then re-evaluate with the mean
        from mvsdet_tpu.models.head import head_loss
        totals = []
        n_pos = []
        for s in scenes:
            _, aux = single_loss(s, None)
            n_pos.append(float(aux["n_pos"]))
        mean_npos = jnp.asarray(np.mean(n_pos))
        for s in scenes:
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats,
                         "frozen": state.frozen}
            result = model.apply(variables, s, train=True,
                                 mutable=["batch_stats"])[0]
            losses, _ = head_loss(result["head_outs"], result["points"],
                                  result["valids"], s["gt_boxes"],
                                  s["gt_labels"], s["gt_mask"],
                                  cfg.model.head,
                                  n_pos_override=jnp.maximum(mean_npos, 1.0))
            nvs = jnp.mean((result["rendered"] - s["gt_images"]) ** 2)
            totals.append(float(sum(losses.values()) + nvs))
        np.testing.assert_allclose(float(metrics["loss"]), np.mean(totals),
                                   rtol=2e-3)


class TestViewParallel:
    def test_view_sharded_loss_matches_unsharded(self, setup):
        cfg, scenes, model, state, tx = setup
        mesh = make_mesh(data=1, view=2)
        batch = _stack_scenes(scenes[:1])
        step = make_sharded_train_step(model, tx, mesh, batch)
        _, metrics = step(state, shard_batch(batch, mesh))

        variables = {"params": state.params,
                     "batch_stats": state.batch_stats,
                     "frozen": state.frozen}
        (want, _), _ = model.apply(variables, scenes[0],
                                   method=MVSDet.loss,
                                   mutable=["batch_stats"])
        np.testing.assert_allclose(float(metrics["loss"]), float(want),
                                   rtol=2e-3)

    def test_data_x_view_step_updates_params(self, setup):
        cfg, scenes, model, state, tx = setup
        mesh = make_mesh(data=2, view=2)
        batch = _stack_scenes(scenes)
        step = make_sharded_train_step(model, tx, mesh, batch)
        new_state, metrics = step(state, shard_batch(batch, mesh))
        assert np.isfinite(float(metrics["loss"]))
        # a trainable parameter with a guaranteed gradient must move
        # (conv_cls: background focal loss is always nonzero; conv_center/
        # conv_reg only receive gradient when positives exist)
        before = state.params["head"]["conv_cls"]["kernel"]
        after = new_state.params["head"]["conv_cls"]["kernel"]
        assert not np.allclose(np.asarray(before), np.asarray(after))
        # frozen stem stays put
        b0 = jax.tree_util.tree_leaves(state.params["backbone"]["stem_conv"])[0]
        a0 = jax.tree_util.tree_leaves(
            new_state.params["backbone"]["stem_conv"])[0]
        np.testing.assert_allclose(np.asarray(b0), np.asarray(a0))
