"""Training-loop and optimizer tests."""

import pytest
import numpy as np

import jax
import jax.numpy as jnp

from mvsdet_tpu.config import tiny_test_config
from mvsdet_tpu.data.synthetic import make_synthetic_scene
from mvsdet_tpu.training.loop import (create_train_state,
                                      load_checkpoint,
                                      make_jitted_train_step,
                                      save_checkpoint)
from mvsdet_tpu.training.optim import build_optimizer, lr_schedule, param_labels


class TestOptim:
    def test_param_labels_partition(self):
        params = {
            "backbone": {"stem_conv": {"kernel": jnp.zeros(1)},
                         "layer1_block0": {"conv1": {"kernel": jnp.zeros(1)}},
                         "layer2_block0": {"conv1": {"kernel": jnp.zeros(1)}}},
            "head": {"conv_cls": {"kernel": jnp.zeros(1)}},
        }
        labels = param_labels(params)
        assert labels["backbone"]["stem_conv"]["kernel"] == "frozen"
        assert labels["backbone"]["layer1_block0"]["conv1"]["kernel"] == "frozen"
        assert labels["backbone"]["layer2_block0"]["conv1"]["kernel"] == "backbone"
        assert labels["head"]["conv_cls"]["kernel"] == "default"

    def test_lr_schedule_milestones(self):
        from mvsdet_tpu.config import OptimConfig
        cfg = OptimConfig()
        sched = lr_schedule(cfg, steps_per_epoch=10)
        assert abs(float(sched(0)) - 2e-4) < 1e-9
        assert abs(float(sched(79)) - 2e-4) < 1e-9
        assert abs(float(sched(80)) - 2e-5) < 1e-9   # epoch 8
        assert abs(float(sched(110)) - 2e-6) < 1e-9  # epoch 11

    def test_frozen_params_get_zero_updates(self):
        from mvsdet_tpu.config import OptimConfig
        params = {"backbone": {"stem_conv": {"kernel": jnp.ones(3)},
                               "layer3_block0": {"kernel": jnp.ones(3)}},
                  "head": {"kernel": jnp.ones(3)}}
        tx = build_optimizer(OptimConfig(), params, steps_per_epoch=10)
        opt_state = tx.init(params)
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = tx.update(grads, opt_state, params)
        assert float(jnp.abs(updates["backbone"]["stem_conv"]["kernel"]).max()) == 0
        assert float(jnp.abs(updates["head"]["kernel"]).max()) > 0
        # backbone lr x0.1 relative to head
        bb = float(jnp.abs(updates["backbone"]["layer3_block0"]["kernel"]).max())
        hd = float(jnp.abs(updates["head"]["kernel"]).max())
        assert bb < hd


class TestTrainStep:
    @pytest.mark.slow
    def test_loss_decreases_on_repeated_scene(self, tmp_path):
        import dataclasses
        cfg = tiny_test_config()
        # gentle lr: with the default 2e-4 Adam's first normalised steps
        # shock the randomly-initialised gaussian branch
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, lr=2e-5))
        batch = {k: jnp.asarray(v) for k, v in
                 make_synthetic_scene(cfg, seed=0, n_views=4,
                                      n_targets=2).items()}
        model, state, tx = create_train_state(
            cfg, jax.random.PRNGKey(0), batch, steps_per_epoch=100,
            sweep_chunk=2)
        step = make_jitted_train_step(model, tx)
        losses, nvs, n_pos = [], [], []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
            nvs.append(float(metrics["loss_nvs"]))
            n_pos.append(float(metrics["n_pos"]))
        assert all(np.isfinite(losses))
        # The total loss is NOT monotone: detection losses switch on
        # abruptly once the depth estimate places voxels in some GT box
        # (n_pos 0 -> k), so assert the trends that are monotone-ish:
        # the NVS loss overfits steadily...
        assert nvs[-1] < nvs[1], nvs
        # ...and after the positive-assignment regime settles, the total
        # loss trends down (last step below the regime's first step).
        regime = [l for l, p in zip(losses, n_pos) if p == n_pos[-1]]
        assert regime[-1] < regime[0] * 1.05, (losses, n_pos)
        assert int(state.step) == 8

        # checkpoint round-trip
        ckpt = str(tmp_path / "ckpt")
        save_checkpoint(ckpt, state)
        restored = load_checkpoint(ckpt, state)
        np.testing.assert_allclose(
            np.asarray(jax.tree_util.tree_leaves(restored.params)[0]),
            np.asarray(jax.tree_util.tree_leaves(state.params)[0]))

        # predict-only state: eval_shape (zero-compile) abstract target,
        # orbax restores the trained params exactly, no optimizer built
        from mvsdet_tpu.training.loop import create_predict_state
        _, variables = create_predict_state(
            cfg, jax.random.PRNGKey(0), batch, sweep_chunk=2,
            checkpoint=ckpt)
        for ours, theirs in zip(
                jax.tree_util.tree_leaves(variables["params"]),
                jax.tree_util.tree_leaves(state.params)):
            np.testing.assert_allclose(np.asarray(ours), np.asarray(theirs))
