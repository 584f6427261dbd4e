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

    @pytest.mark.slow
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


class TestMultiHost:
    """Single-process coverage of the multi-host helpers (VERDICT r1
    item 9): initialize() is a no-op here, the global mesh and
    process-local batch assembly are exercised for real."""

    def test_initialize_single_host_noop(self):
        from mvsdet_tpu.parallel import multihost

        multihost.initialize()  # no env vars -> returns without dist init
        assert jax.process_count() == 1

    def test_make_global_mesh(self):
        from mvsdet_tpu.parallel import multihost

        mesh = multihost.make_global_mesh(data=2, view=4)
        assert mesh.shape == {"data": 2, "view": 4}
        with pytest.raises(ValueError):
            multihost.make_global_mesh(data=16, view=4)

    def test_host_local_batch_to_global_shards_match(self):
        from jax.sharding import PartitionSpec as P

        from mvsdet_tpu.parallel import multihost
        from mvsdet_tpu.parallel.sharding import batch_pspecs

        mesh = multihost.make_global_mesh(data=2, view=4)
        batch = {
            "images": np.arange(2 * 8 * 4 * 4 * 3,
                                dtype=np.float32).reshape(2, 8, 4, 4, 3),
            "origin": np.zeros((2, 3), np.float32),
        }
        specs = batch_pspecs(batch)
        assert specs["images"] == P("data", "view")
        out = multihost.host_local_batch_to_global(batch, mesh, specs)
        # globally-shaped arrays with the right sharding, same contents
        assert out["images"].shape == (2, 8, 4, 4, 3)
        np.testing.assert_array_equal(np.asarray(out["images"]),
                                      batch["images"])
        assert out["images"].sharding.spec == specs["images"]

    @pytest.mark.slow
    def test_global_batch_drives_sharded_step(self, setup):
        from mvsdet_tpu.parallel import multihost
        from mvsdet_tpu.parallel.sharding import batch_pspecs

        cfg, scenes, model, state, tx = setup
        mesh = multihost.make_global_mesh(data=2, view=1)
        batch = _stack_scenes(scenes)
        step = make_sharded_train_step(model, tx, mesh, batch)
        global_batch = multihost.host_local_batch_to_global(
            {k: np.asarray(v) for k, v in batch.items()}, mesh,
            batch_pspecs(batch))
        _, metrics = step(state, global_batch)
        assert np.isfinite(float(metrics["loss"]))


class TestScanNetScaleAOT:
    def test_sharded_step_lowers_at_reference_scale(self):
        """AOT-trace the data x view sharded train step at full ScanNet
        scale (40 views, 240x320, 40x40x16 voxels) on the CPU mesh —
        catches shape/sharding bugs without paying a full compile
        (VERDICT r1 weak-10)."""
        from mvsdet_tpu.config import scannet_config
        from mvsdet_tpu.data.synthetic import make_synthetic_scene
        from mvsdet_tpu.training.loop import create_train_state

        cfg = scannet_config()
        batch_np = make_synthetic_scene(
            cfg, seed=0, n_views=cfg.data.n_src_train,
            n_targets=cfg.data.nerf_target_views_train)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        model = MVSDet(cfg.model, sweep_chunk=8)
        # eval_shape-style init: abstract variables, no real compute
        variables = jax.eval_shape(
            lambda rng: model.init(rng, batch, method=MVSDet.loss),
            jax.random.PRNGKey(0))
        from mvsdet_tpu.training.optim import build_optimizer
        from mvsdet_tpu.training.loop import TrainState

        params = variables["params"]
        tx = build_optimizer(cfg.optim, params, steps_per_epoch=100)
        state = TrainState(
            step=jnp.zeros((), jnp.int32), params=params,
            batch_stats=variables.get("batch_stats", {}),
            frozen=variables.get("frozen", {}),
            opt_state=jax.eval_shape(tx.init, params))
        mesh = make_mesh(data=2, view=4)
        stacked = {k: jnp.stack([v, v]) for k, v in batch.items()}
        step = make_sharded_train_step(model, tx, mesh, stacked)
        lowered = jax.jit(step).lower(state, stacked)
        assert lowered is not None
